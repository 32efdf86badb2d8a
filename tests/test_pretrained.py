"""Checkpoint resolution + loading (models/pretrained.py)."""

import os
import pickle

import numpy as np
import pytest

from vltk_tpu.models.pretrained import (
    from_pretrained,
    load_state_dict,
    resolve_checkpoint,
)


def test_resolve_file_and_dir(tmp_path):
    f = tmp_path / "model.pt"
    f.write_bytes(b"x")
    assert resolve_checkpoint(str(f)) == str(f)
    assert resolve_checkpoint(str(tmp_path)) == str(f)
    with pytest.raises(FileNotFoundError):
        resolve_checkpoint(str(tmp_path / "missing"))


def test_load_detectron_pkl_with_gamma_beta(tmp_path):
    path = tmp_path / "weights.pkl"
    model = {
        "backbone.res2.norm.gamma": np.ones(3, np.float32),
        "backbone.res2.norm.beta": np.zeros(3, np.float32),
        "head.weight": np.ones((2, 2), np.float32),
    }
    with open(path, "wb") as f:
        pickle.dump({"model": model}, f)
    sd = load_state_dict(str(path))
    assert "backbone.res2.norm.weight" in sd
    assert "backbone.res2.norm.bias" in sd
    assert "head.weight" in sd


def test_load_torch_checkpoint(tmp_path):
    torch = pytest.importorskip("torch")
    path = tmp_path / "model.pt"
    torch.save({"layer.gamma": torch.ones(2), "layer.bias": torch.zeros(2)}, path)
    sd = load_state_dict(str(path))
    assert "layer.weight" in sd and "layer.bias" in sd


def test_from_pretrained_lxmert_end_to_end(tmp_path):
    """HF torch checkpoint on disk -> resolve -> convert -> forward parity."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax

    from vltk_tpu.models import Lxmert, LxmertConfig

    hf_cfg = transformers.LxmertConfig(
        vocab_size=60, hidden_size=16, num_attention_heads=2,
        intermediate_size=32, l_layers=1, x_layers=1, r_layers=1,
        visual_feat_dim=8, visual_pos_dim=4, max_position_embeddings=32,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.LxmertModel(hf_cfg).eval()
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    torch.save(hf.state_dict(), ckpt_dir / "pytorch_model.bin")

    params = from_pretrained("lxmert", str(ckpt_dir))

    cfg = LxmertConfig(
        vocab_size=60, hidden_size=16, num_heads=2, intermediate_size=32,
        l_layers=1, x_layers=1, r_layers=1, visual_feat_dim=8,
        max_position_embeddings=32,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 60, (2, 5)).astype(np.int32)
    feats = rng.normal(size=(2, 3, 8)).astype(np.float32)
    pos = rng.uniform(0, 1, (2, 3, 4)).astype(np.float32)
    lang, visn, pooled = Lxmert(cfg).apply({"params": params}, ids, feats, pos)
    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids.astype(np.int64)),
            visual_feats=torch.tensor(feats),
            visual_pos=torch.tensor(pos),
        )
    np.testing.assert_allclose(
        np.asarray(pooled), out.pooled_output.numpy(), atol=2e-5
    )


def test_from_pretrained_layoutlm_end_to_end(tmp_path):
    """HF LayoutLM checkpoint on disk -> resolve -> convert -> forward
    parity (microsoft/layoutlm-base weight scheme)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from vltk_tpu.models.layoutlm import LayoutLM, LayoutLMConfig

    hf_cfg = transformers.LayoutLMConfig(
        vocab_size=60, hidden_size=16, num_hidden_layers=1,
        num_attention_heads=2, intermediate_size=32,
        max_position_embeddings=32, max_2d_position_embeddings=64,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    hf = transformers.LayoutLMModel(hf_cfg).eval()
    ckpt_dir = tmp_path / "ckpt"
    ckpt_dir.mkdir()
    torch.save(hf.state_dict(), ckpt_dir / "pytorch_model.bin")

    params = from_pretrained("layoutlm", str(ckpt_dir))

    cfg = LayoutLMConfig(
        vocab_size=60, hidden_size=16, num_heads=2, intermediate_size=32,
        l_layers=1, max_position_embeddings=32, coord_vocab=64,
        hidden_dropout=0.0, attention_dropout=0.0,
    )
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 60, (2, 6)).astype(np.int64)
    boxes = rng.integers(0, 30, (2, 6, 4)).astype(np.int64)
    boxes[..., 2:] += boxes[..., :2] % 30
    boxes = np.clip(boxes, 0, 63)
    with torch.no_grad():
        ref = hf(
            input_ids=torch.from_numpy(ids), bbox=torch.from_numpy(boxes)
        ).last_hidden_state.numpy()
    got = LayoutLM(cfg).apply(
        {"params": params}, ids.astype(np.int32), boxes.astype(np.int32)
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)
