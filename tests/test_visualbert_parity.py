"""Hermetic HF parity for the VisualBERT single-stream VL encoder.

Random-init ``transformers.VisualBertModel`` (no downloads) vs
vltk_tpu.models.visualbert.VisualBert through torch_visualbert_to_jax —
completing the HF-weight-compatibility matrix (LXMERT/ViT/LayoutLM have
the same treatment). The reference's only working training artifact was a
VisualBERT hateful-memes finetune via mmf (reference:
vltk/legacy/legacy_train.py:19-150); this makes the build a drop-in
consumer of uclanlp/visualbert-* checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

from vltk_tpu.models import torch_visualbert_to_jax
from vltk_tpu.models.visualbert import VisualBert, VisualBertConfig


def _small_pair(seed=0):
    hf_cfg = transformers.VisualBertConfig(
        vocab_size=99,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        visual_embedding_dim=16,
        max_position_embeddings=64,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
        special_visual_initialize=False,
    )
    torch.manual_seed(seed)
    tmodel = transformers.VisualBertModel(hf_cfg)
    tmodel.eval()

    jcfg = VisualBertConfig(
        vocab_size=99,
        hidden_size=32,
        num_heads=4,
        intermediate_size=64,
        l_layers=2,
        visual_feat_dim=16,
        max_position_embeddings=64,
        type_vocab_size=2,
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    return tmodel, VisualBert(jcfg)


class TestVisualBertHFParity:
    def test_forward_matches_hf(self):
        tmodel, jmodel = _small_pair()
        rng = np.random.default_rng(0)
        n, s, v = 3, 10, 5
        ids = rng.integers(0, 99, (n, s)).astype(np.int64)
        feats = rng.normal(size=(n, v, 16)).astype(np.float32)
        mask = np.ones((n, s), np.int64)
        mask[2, 7:] = 0
        vmask = np.ones((n, v), np.int64)
        vmask[0, 3:] = 0
        types = rng.integers(0, 2, (n, s)).astype(np.int64)

        with torch.no_grad():
            out = tmodel(
                input_ids=torch.from_numpy(ids),
                attention_mask=torch.from_numpy(mask),
                token_type_ids=torch.from_numpy(types),
                visual_embeds=torch.from_numpy(feats),
                visual_attention_mask=torch.from_numpy(vmask),
                visual_token_type_ids=torch.ones((n, v), dtype=torch.long),
            )
        ref_seq = out.last_hidden_state.numpy()
        ref_pool = out.pooler_output.numpy()

        params = torch_visualbert_to_jax(tmodel.state_dict())
        seq, pooled = jmodel.apply(
            {"params": params},
            ids.astype(np.int32),
            feats,
            None,
            mask.astype(np.float32),
            vmask.astype(np.float32),
            types.astype(np.int32),
        )
        np.testing.assert_allclose(np.asarray(seq), ref_seq, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(
            np.asarray(pooled), ref_pool, rtol=2e-4, atol=2e-5
        )

    def test_converter_covers_every_flax_param(self):
        from flax.traverse_util import flatten_dict

        tmodel, jmodel = _small_pair(seed=1)
        params = torch_visualbert_to_jax(tmodel.state_dict())
        init = jmodel.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 4), np.int32),
            np.zeros((1, 2, 16), np.float32),
        )["params"]
        fi, fc = flatten_dict(init), flatten_dict(params)
        assert set(fi) == set(fc), (
            f"missing={sorted(set(fi) - set(fc))[:5]} "
            f"extra={sorted(set(fc) - set(fi))[:5]}"
        )
        for key in fi:
            assert fi[key].shape == np.asarray(fc[key]).shape, key

    def test_headed_prefix_variant(self):
        from flax.traverse_util import flatten_dict

        tmodel, _ = _small_pair(seed=2)
        sd = tmodel.state_dict()
        prefixed = {"visual_bert." + k: v for k, v in sd.items()}
        a = flatten_dict(torch_visualbert_to_jax(sd))
        b = flatten_dict(torch_visualbert_to_jax(prefixed))
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


class TestVisualBertRoundtrip:
    def test_jax_to_torch_roundtrip(self):
        from flax.traverse_util import flatten_dict

        from vltk_tpu.models.convert import (
            jax_visualbert_to_torch,
            torch_visualbert_to_jax,
        )

        tmodel, _ = _small_pair(seed=3)
        params = torch_visualbert_to_jax(tmodel.state_dict())
        back = torch_visualbert_to_jax(jax_visualbert_to_torch(params))
        a, b = flatten_dict(params), flatten_dict(back)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))

    def test_torch_reload_matches(self):
        """Exported state_dict loads back into a fresh HF model with no
        missing/unexpected keys (pooler + encoder + embeddings complete)."""
        tmodel, _ = _small_pair(seed=4)
        from vltk_tpu.models.convert import (
            jax_visualbert_to_torch,
            torch_visualbert_to_jax,
        )

        params = torch_visualbert_to_jax(tmodel.state_dict())
        exported = {
            k: torch.tensor(v) for k, v in jax_visualbert_to_torch(params).items()
        }
        fresh, _ = _small_pair(seed=5)
        missing, unexpected = fresh.load_state_dict(exported, strict=False)
        assert not unexpected, unexpected
        # position_ids buffers are non-persistent; everything real loads
        assert all("position_ids" in k for k in missing), missing
