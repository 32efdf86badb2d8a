"""Hermetic HF parity for the LayoutLM OCR encoder.

Random-init ``transformers.LayoutLMModel`` (no downloads) vs
vltk_tpu.models.layoutlm.LayoutLM through torch_layoutlm_to_jax — the same
parity pattern the LXMERT family has (tests/test_lxmert.py). The reference
framework prepared LayoutLM-shaped inputs (OCRBoxFixed 0-1000 boxes,
reference: vltk/processing/visn.py:167-195) but shipped no model; weight
compatibility with microsoft/layoutlm-base makes the build a drop-in
consumer of real checkpoints."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax

from vltk_tpu.models import torch_layoutlm_to_jax
from vltk_tpu.models.layoutlm import LayoutLM, LayoutLMConfig


def _small_pair(seed=0):
    hf_cfg = transformers.LayoutLMConfig(
        vocab_size=99,
        hidden_size=32,
        num_hidden_layers=2,
        num_attention_heads=4,
        intermediate_size=64,
        max_position_embeddings=64,
        max_2d_position_embeddings=128,
        type_vocab_size=2,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(seed)
    tmodel = transformers.LayoutLMModel(hf_cfg)
    tmodel.eval()

    jcfg = LayoutLMConfig(
        vocab_size=99,
        hidden_size=32,
        num_heads=4,
        intermediate_size=64,
        l_layers=2,
        max_position_embeddings=64,
        coord_vocab=128,
        type_vocab_size=2,
        hidden_dropout=0.0,
        attention_dropout=0.0,
    )
    return tmodel, LayoutLM(jcfg)


class TestLayoutLMHFParity:
    def test_forward_matches_hf(self):
        tmodel, jmodel = _small_pair()
        rng = np.random.default_rng(0)
        n, s = 3, 12
        ids = rng.integers(0, 99, (n, s)).astype(np.int64)
        x0 = rng.integers(0, 100, (n, s))
        y0 = rng.integers(0, 100, (n, s))
        boxes = np.stack(
            [x0, y0, x0 + rng.integers(1, 27, (n, s)),
             y0 + rng.integers(1, 27, (n, s))],
            axis=-1,
        ).astype(np.int64)
        mask = np.ones((n, s), np.int64)
        mask[1, 8:] = 0
        types = rng.integers(0, 2, (n, s)).astype(np.int64)

        with torch.no_grad():
            ref = tmodel(
                input_ids=torch.from_numpy(ids),
                bbox=torch.from_numpy(boxes),
                attention_mask=torch.from_numpy(mask),
                token_type_ids=torch.from_numpy(types),
            ).last_hidden_state.numpy()

        params = torch_layoutlm_to_jax(tmodel.state_dict())
        got = jmodel.apply(
            {"params": params},
            ids.astype(np.int32),
            boxes.astype(np.int32),
            mask.astype(np.float32),
            types.astype(np.int32),
        )
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-5)

    def test_converter_covers_every_flax_param(self):
        from flax.traverse_util import flatten_dict

        tmodel, jmodel = _small_pair(seed=1)
        params = torch_layoutlm_to_jax(tmodel.state_dict())
        init = jmodel.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 4), np.int32),
            np.zeros((1, 4, 4), np.int32),
        )["params"]
        fi, fc = flatten_dict(init), flatten_dict(params)
        assert set(fi) == set(fc), (
            f"missing={sorted(set(fi) - set(fc))[:5]} "
            f"extra={sorted(set(fc) - set(fi))[:5]}"
        )
        for key in fi:
            assert fi[key].shape == np.asarray(fc[key]).shape, key

    def test_headed_prefix_variant(self):
        """ForTokenClassification state_dicts carry the layoutlm. prefix;
        the encoder converts identically."""
        from flax.traverse_util import flatten_dict

        tmodel, _ = _small_pair(seed=2)
        sd = tmodel.state_dict()
        prefixed = {"layoutlm." + k: v for k, v in sd.items()}
        a = flatten_dict(torch_layoutlm_to_jax(sd))
        b = flatten_dict(torch_layoutlm_to_jax(prefixed))
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))


class TestLayoutLMRoundtrip:
    def test_jax_to_torch_roundtrip(self):
        """jax -> torch names -> jax is the identity (the reverse
        converter completes the bidirectional story the other families
        have)."""
        from flax.traverse_util import flatten_dict

        from vltk_tpu.models.convert import (
            jax_layoutlm_to_torch,
            torch_layoutlm_to_jax,
        )

        tmodel, jmodel = _small_pair(seed=3)
        params = torch_layoutlm_to_jax(tmodel.state_dict())
        back = torch_layoutlm_to_jax(jax_layoutlm_to_torch(params))
        a, b = flatten_dict(params), flatten_dict(back)
        assert set(a) == set(b)
        for k in a:
            np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]))
