"""ViT encoder: shapes + hermetic parity vs HF torch + converter roundtrip."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vltk_tpu.models.vit import ViT, ViTConfig
from vltk_tpu.models.convert import jax_vit_to_torch, torch_vit_to_jax

TINY = ViTConfig(
    hidden_size=24,
    num_heads=2,
    num_layers=2,
    intermediate_size=48,
    image_size=32,
    patch_size=16,
)


def test_forward_shapes(rng):
    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    model = ViT(TINY)
    params = model.init(jax.random.PRNGKey(0), imgs)["params"]
    seq, pooled = model.apply({"params": params}, imgs)
    assert seq.shape == (2, 5, 24)  # 4 patches + CLS
    assert pooled.shape == (2, 24)


def test_flash_config_cpu_fallback_bit_identical(rng):
    """attention_impl='flash' must be a transparent no-op where the fused
    kernel does not apply (CPU backend here): same param tree,
    bit-identical outputs to the XLA formulation."""
    import dataclasses

    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    cfg_f = dataclasses.replace(TINY, attention_impl="flash")
    params = ViT(TINY).init(jax.random.PRNGKey(0), imgs)["params"]
    seq_x, pooled_x = ViT(TINY).apply({"params": params}, imgs)
    seq_f, pooled_f = ViT(cfg_f).apply({"params": params}, imgs)
    np.testing.assert_array_equal(np.asarray(seq_x), np.asarray(seq_f))
    np.testing.assert_array_equal(np.asarray(pooled_x), np.asarray(pooled_f))


def test_parity_vs_hf_torch(rng):
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.ViTConfig(
        hidden_size=TINY.hidden_size,
        num_hidden_layers=TINY.num_layers,
        num_attention_heads=TINY.num_heads,
        intermediate_size=TINY.intermediate_size,
        image_size=TINY.image_size,
        patch_size=TINY.patch_size,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        layer_norm_eps=TINY.layer_norm_eps,
    )
    torch.manual_seed(0)
    hf = transformers.ViTModel(hf_cfg).eval()

    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(imgs).permute(0, 3, 1, 2))

    params = torch_vit_to_jax(hf.state_dict())
    seq, pooled = ViT(TINY).apply({"params": params}, imgs)
    np.testing.assert_allclose(
        np.asarray(seq), out.last_hidden_state.numpy(), atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooler_output.numpy(), atol=3e-5
    )


def test_converter_roundtrip(rng):
    imgs = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    model = ViT(TINY)
    params = model.init(jax.random.PRNGKey(1), imgs)["params"]
    back = torch_vit_to_jax(jax_vit_to_torch(params))

    import flax.traverse_util as tu

    a = tu.flatten_dict(params, sep="/")
    b = tu.flatten_dict(back, sep="/")
    assert set(a) == set(b), set(a) ^ set(b)
    for k in a:
        np.testing.assert_allclose(np.asarray(a[k]), np.asarray(b[k]), rtol=1e-6)


def test_patch_feats_feed_vl_encoder(rng):
    """ViT patch features slot into the VL encoders as visual_feats."""
    from vltk_tpu.models import LxmertConfig, LxmertForVQA

    imgs = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    vit = ViT(TINY)
    vparams = vit.init(jax.random.PRNGKey(0), imgs)["params"]
    seq, _ = vit.apply({"params": vparams}, imgs)
    patches = np.asarray(seq[:, 1:])  # (2, 4, 24)
    pos = np.tile(
        np.asarray([[0, 0, 0.5, 0.5], [0.5, 0, 1, 0.5],
                    [0, 0.5, 0.5, 1], [0.5, 0.5, 1, 1]], np.float32),
        (2, 1, 1),
    )
    lx_cfg = LxmertConfig(
        vocab_size=50, hidden_size=16, num_heads=2, intermediate_size=32,
        l_layers=1, x_layers=1, r_layers=1, visual_feat_dim=24,
        max_position_embeddings=16, num_answers=3,
    )
    ids = rng.integers(0, 50, (2, 5)).astype(np.int32)
    model = LxmertForVQA(lx_cfg)
    params = model.init(jax.random.PRNGKey(0), ids, patches, pos)["params"]
    logits = model.apply({"params": params}, ids, patches, pos)
    assert logits.shape == (2, 3)
