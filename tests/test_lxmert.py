"""LXMERT-style encoder: shapes, losses, and hermetic parity vs the
HuggingFace torch implementation (random-init — no network needed)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vltk_tpu.models import (
    Lxmert,
    LxmertConfig,
    LxmertForPretraining,
    LxmertForVQA,
    torch_lxmert_to_jax,
)
from vltk_tpu.models import lxmert as L

TINY = LxmertConfig(
    vocab_size=100,
    hidden_size=24,
    num_heads=2,
    intermediate_size=48,
    l_layers=2,
    x_layers=1,
    r_layers=1,
    visual_feat_dim=8,
    max_position_embeddings=64,
    num_answers=7,
    num_objects=5,
    num_attrs=3,
)


def _batch(rng, n=2, s=9, v=4, cfg=TINY):
    ids = rng.integers(0, cfg.vocab_size, (n, s)).astype(np.int32)
    mask = np.ones((n, s), np.float32)
    mask[:, -2:] = 0
    feats = rng.normal(size=(n, v, cfg.visual_feat_dim)).astype(np.float32)
    pos = rng.uniform(0, 1, (n, v, 4)).astype(np.float32)
    return ids, mask, feats, pos


def test_forward_shapes(rng):
    ids, mask, feats, pos = _batch(rng)
    model = Lxmert(TINY)
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos, mask)["params"]
    lang, visn, pooled = model.apply({"params": params}, ids, feats, pos, mask)
    assert lang.shape == (2, 9, 24)
    assert visn.shape == (2, 4, 24)
    assert pooled.shape == (2, 24)


def test_vqa_head_shapes(rng):
    ids, mask, feats, pos = _batch(rng)
    model = LxmertForVQA(TINY)
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos, mask)["params"]
    logits = model.apply({"params": params}, ids, feats, pos, mask)
    assert logits.shape == (2, TINY.num_answers)


def test_pretrain_heads(rng):
    ids, mask, feats, pos = _batch(rng)
    model = LxmertForPretraining(TINY)
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos, mask)["params"]
    out = model.apply({"params": params}, ids, feats, pos, mask)
    assert out["mlm_logits"].shape == (2, 9, TINY.vocab_size)
    assert out["matched_logits"].shape == (2, 2)
    assert out["obj_logits"].shape == (2, 4, TINY.num_objects)
    assert out["attr_logits"].shape == (2, 4, TINY.num_attrs)
    assert out["feat_pred"].shape == (2, 4, TINY.visual_feat_dim)
    assert out["qa_logits"].shape == (2, TINY.num_answers)


def test_losses_finite_and_sane(rng):
    logits = jnp.asarray(rng.normal(size=(4, 6, 11)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, 11, (4, 6)).astype(np.int32))
    labels = labels.at[:, 3:].set(-100)
    mlm = L.masked_lm_loss(logits, labels)
    assert np.isfinite(float(mlm)) and float(mlm) > 0

    # all-ignored labels must not NaN
    assert np.isfinite(float(L.masked_lm_loss(logits, jnp.full((4, 6), -100))))

    qa_logits = jnp.asarray(rng.normal(size=(4, 7)).astype(np.float32))
    scores = jnp.zeros((4, 7)).at[:, 2].set(0.9)
    assert float(L.vqa_soft_loss(qa_logits, scores)) > 0

    m = L.matched_loss(
        jnp.asarray(rng.normal(size=(4, 2)).astype(np.float32)),
        jnp.asarray([0, 1, 1, 0]),
    )
    assert np.isfinite(float(m))

    pred = jnp.asarray(rng.normal(size=(4, 5, 8)).astype(np.float32))
    target = jnp.asarray(rng.normal(size=(4, 5, 8)).astype(np.float32))
    vmask = jnp.zeros((4, 5)).at[:, 0].set(1.0)
    assert float(L.visual_feat_loss(pred, target, vmask)) > 0
    assert np.isfinite(float(L.visual_feat_loss(pred, target, jnp.zeros((4, 5)))))


def test_masked_lm_loss_matches_manual(rng):
    logits = jnp.asarray(rng.normal(size=(2, 4, 9)).astype(np.float32))
    labels = np.full((2, 4), -100)
    labels[0, 1] = 3
    labels[1, 2] = 7
    got = float(L.masked_lm_loss(logits, jnp.asarray(labels)))
    lp = jax.nn.log_softmax(logits, axis=-1)
    want = -(lp[0, 1, 3] + lp[1, 2, 7]) / 2
    np.testing.assert_allclose(got, float(want), rtol=1e-6)


@pytest.mark.parametrize("model_kind", ["base", "pretrain"])
def test_parity_vs_hf_torch(rng, model_kind):
    """Hermetic parity: random-init HF torch LXMERT vs our flax model fed
    the converted weights must agree to float tolerance."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    hf_cfg = transformers.LxmertConfig(
        vocab_size=TINY.vocab_size,
        hidden_size=TINY.hidden_size,
        num_attention_heads=TINY.num_heads,
        intermediate_size=TINY.intermediate_size,
        l_layers=TINY.l_layers,
        x_layers=TINY.x_layers,
        r_layers=TINY.r_layers,
        visual_feat_dim=TINY.visual_feat_dim,
        visual_pos_dim=4,
        num_qa_labels=TINY.num_answers,
        num_object_labels=TINY.num_objects,
        num_attr_labels=TINY.num_attrs,
        max_position_embeddings=TINY.max_position_embeddings,
        hidden_dropout_prob=0.0,
        attention_probs_dropout_prob=0.0,
    )
    torch.manual_seed(0)
    if model_kind == "base":
        hf = transformers.LxmertModel(hf_cfg).eval()
    else:
        hf = transformers.LxmertForPreTraining(hf_cfg).eval()

    ids, mask, feats, pos = _batch(rng)
    with torch.no_grad():
        out = hf(
            input_ids=torch.tensor(ids.astype(np.int64)),
            visual_feats=torch.tensor(feats),
            visual_pos=torch.tensor(pos),
            attention_mask=torch.tensor(mask),
        )

    params = torch_lxmert_to_jax(hf.state_dict())
    if model_kind == "base":
        model = Lxmert(TINY)
        lang, visn, pooled = model.apply(
            {"params": params}, ids, feats, pos, mask
        )
        np.testing.assert_allclose(
            np.asarray(lang), out.language_output.numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(visn), out.vision_output.numpy(), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(pooled), out.pooled_output.numpy(), atol=2e-5
        )
    else:
        model = LxmertForPretraining(TINY)
        mine = model.apply({"params": params}, ids, feats, pos, mask)
        np.testing.assert_allclose(
            np.asarray(mine["mlm_logits"]),
            out.prediction_logits.numpy(),
            atol=3e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mine["matched_logits"]),
            out.cross_relationship_score.numpy(),
            atol=2e-5,
        )
        np.testing.assert_allclose(
            np.asarray(mine["qa_logits"]),
            out.question_answering_score.numpy(),
            atol=2e-5,
        )


class TestVisualBert:
    def _cfg(self):
        from vltk_tpu.models.visualbert import VisualBertConfig

        return VisualBertConfig(
            vocab_size=80, hidden_size=16, num_heads=2, intermediate_size=32,
            l_layers=2, visual_feat_dim=8, max_position_embeddings=32,
            num_labels=3,
        )

    def test_forward_shapes(self, rng):
        from vltk_tpu.models.visualbert import VisualBert

        cfg = self._cfg()
        model = VisualBert(cfg)
        ids = rng.integers(0, 80, (2, 6)).astype(np.int32)
        feats = rng.normal(size=(2, 4, 8)).astype(np.float32)
        pos = rng.uniform(0, 1, (2, 4, 4)).astype(np.float32)
        params = model.init(jax.random.PRNGKey(0), ids, feats, pos)["params"]
        seq, pooled = model.apply({"params": params}, ids, feats, pos)
        assert seq.shape == (2, 10, 16)  # S + V tokens
        assert pooled.shape == (2, 16)

    def test_classifier_learns(self, rng):
        """Tiny overfit: the classification loss must drop."""
        import optax

        from vltk_tpu.models.visualbert import (
            VisualBertForClassification,
            classification_loss,
        )

        cfg = self._cfg()
        model = VisualBertForClassification(cfg)
        ids = rng.integers(0, 80, (8, 6)).astype(np.int32)
        feats = rng.normal(size=(8, 4, 8)).astype(np.float32)
        labels = jnp.asarray(rng.integers(0, 3, 8).astype(np.int32))
        params = model.init(jax.random.PRNGKey(0), ids, feats)["params"]
        tx = optax.adam(5e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt):
            def lf(p):
                logits = model.apply({"params": p}, ids, feats)
                return classification_loss(logits, labels)

            loss, grads = jax.value_and_grad(lf)(params)
            updates, opt = tx.update(grads, opt, params)
            return optax.apply_updates(params, updates), opt, loss

        losses = []
        for _ in range(30):
            params, opt, loss = step(params, opt)
            losses.append(float(loss))
        assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    def test_tp_rules_cover_visualbert(self):
        """The shared LXMERT TP rules shard VisualBERT's blocks too."""
        from jax.sharding import PartitionSpec as P

        from vltk_tpu.config import MeshConfig
        from vltk_tpu.models.visualbert import VisualBert
        from vltk_tpu.parallel import LXMERT_RULES, infer_shardings, make_mesh

        if len(jax.devices()) < 8:
            pytest.skip("needs 8 devices")
        cfg = self._cfg()
        model = VisualBert(cfg)
        params = model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, 4), np.int32),
            np.zeros((1, 2, 8), np.float32),
        )["params"]
        mesh = make_mesh(MeshConfig(axes=(("data", 4), ("model", 2))))
        sh = infer_shardings(params, LXMERT_RULES, mesh)
        assert sh["layer_0"]["att"]["query"]["kernel"].spec == P(None, "model")
        assert sh["layer_0"]["ffn"]["mlp_out"]["kernel"].spec == P("model", None)


class TestFlashAttention:
    """The fused Pallas flash-attention path (cfg.attention_impl="flash").

    Hermetic coverage: the kernel itself is verified in Pallas interpret
    mode against the model's XLA score/softmax formulation (forward AND
    grad), and the eligibility gate is verified to fall back to the XLA
    path (bit-identical outputs) whenever flash does not apply — which
    includes this CPU test environment itself.
    """

    def _qkv(self, rng, n=2, s=128, nh=2, dh=64, pad=24):
        q = rng.normal(size=(n, s, nh, dh)).astype(np.float32)
        k = rng.normal(size=(n, s, nh, dh)).astype(np.float32)
        v = rng.normal(size=(n, s, nh, dh)).astype(np.float32)
        mask = np.ones((n, s), np.float32)
        mask[:, s - pad:] = 0.0
        return q, k, v, mask

    @staticmethod
    def _xla_attention(q, k, v, mask, dh):
        scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) / jnp.sqrt(
            jnp.asarray(dh, q.dtype)
        )
        bias = (1.0 - mask[:, None, None, :]) * L.NEG_INF
        scores = scores + bias.astype(scores.dtype)
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1)
        return jnp.einsum("nhqk,nkhd->nqhd", probs.astype(q.dtype), v)

    def test_interpret_forward_parity(self, rng):
        import jax.experimental.pallas.tpu as pltpu

        q, k, v, mask = self._qkv(rng)
        with pltpu.force_tpu_interpret_mode():
            got = L._flash_self_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(mask), 64,
            )
        ref = self._xla_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask), 64,
        )
        real = np.broadcast_to(
            mask.astype(bool)[:, :, None, None], ref.shape
        )
        d = np.abs(np.asarray(got) - np.asarray(ref))[real]
        assert d.max() < 2e-5, d.max()

    def test_interpret_grad_parity(self, rng):
        """jax.grad flows through the kernel's custom VJP and matches the
        XLA formulation's gradient at real positions (pad-query rows of
        the cotangent are zeroed on both sides — their outputs are
        defined to differ, see _flash_eligible)."""
        import jax.experimental.pallas.tpu as pltpu

        q, k, v, mask = self._qkv(rng)
        w = (rng.normal(size=q.shape).astype(np.float32)
             * mask[:, :, None, None])
        w = jnp.asarray(w)

        def loss_flash(q_, k_, v_):
            out = L._flash_self_attention(q_, k_, v_, jnp.asarray(mask), 64)
            return jnp.sum(out * w)

        def loss_xla(q_, k_, v_):
            out = self._xla_attention(q_, k_, v_, jnp.asarray(mask), 64)
            return jnp.sum(out * w)

        args = (jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
        with pltpu.force_tpu_interpret_mode():
            gf = jax.grad(loss_flash, argnums=(0, 1, 2))(*args)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2))(*args)
        for a, b, name in zip(gf, gx, "qkv"):
            d = np.abs(np.asarray(a) - np.asarray(b))
            # pad keys/values still receive ~0 grad via the NEG_INF
            # softmax on the XLA side and exactly 0 via segment ids
            assert d.max() < 5e-4, (name, d.max())

    def test_interpret_forward_parity_padded_seq(self, rng):
        """Non-multiple-of-128 lengths (ViT's 197-token patch stream)
        are padded to the kernel block inside _flash_self_attention and
        sliced back — parity at real positions, exact output shape."""
        import jax.experimental.pallas.tpu as pltpu

        q, k, v, mask = self._qkv(rng, s=197, pad=13)
        with pltpu.force_tpu_interpret_mode():
            got = L._flash_self_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                jnp.asarray(mask), 64,
            )
        assert got.shape == q.shape
        ref = self._xla_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
            jnp.asarray(mask), 64,
        )
        real = np.broadcast_to(
            mask.astype(bool)[:, :, None, None], ref.shape
        )
        d = np.abs(np.asarray(got) - np.asarray(ref))[real]
        assert d.max() < 2e-5, d.max()

    def test_interpret_forward_parity_padded_no_mask(self, rng):
        """mask=None with an odd length (the ViT call shape): the pad
        tail must be synthesized as segment-id 0 so real queries never
        attend into the padding."""
        import jax.experimental.pallas.tpu as pltpu

        q, k, v, _ = self._qkv(rng, s=197, pad=0)
        full = jnp.ones((q.shape[0], 197), jnp.float32)
        with pltpu.force_tpu_interpret_mode():
            got = L._flash_self_attention(
                jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), None, 64
            )
        ref = self._xla_attention(
            jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), full, 64
        )
        d = np.abs(np.asarray(got) - np.asarray(ref))
        assert d.max() < 2e-5, d.max()

    def test_eligibility_gate(self):
        cfg = LxmertConfig(attention_impl="flash")
        x = object()
        other = object()
        # cross-attention, sub-block seq, active dropout: all ineligible
        assert not L._flash_eligible(x, other, 128, True, cfg)
        assert not L._flash_eligible(x, x, 100, True, cfg)
        assert not L._flash_applicable(36, True, 0.0)
        # CPU backend (this suite): never eligible even when shapes fit
        assert not L._flash_eligible(x, x, 128, True, cfg)
        assert not L._flash_applicable(197, True, 0.0)

    def test_auto_impl_routing(self):
        """attention_impl='auto' asks for flash exactly at the measured
        win threshold — padded length >= 1024 (BASELINE.md r4) — and for
        xla below it; 'flash'/'xla' remain unconditional. (The hardware
        gate _flash_applicable still composes on top, so auto on CPU is
        always the xla path.)"""
        auto = LxmertConfig(attention_impl="auto")
        assert L._impl_wants_flash(auto, 1024)
        assert L._impl_wants_flash(auto, 4096)
        assert L._impl_wants_flash(auto, 1000)  # pads to 1024
        assert not L._impl_wants_flash(auto, 512)
        assert not L._impl_wants_flash(auto, 197)  # ViT: pads to 256
        assert L._impl_wants_flash(LxmertConfig(attention_impl="flash"), 20)
        assert not L._impl_wants_flash(LxmertConfig(attention_impl="xla"), 4096)
        # LayoutLM — the long-document model — defaults to auto
        from vltk_tpu.models.layoutlm import LayoutLMConfig

        assert LayoutLMConfig().attention_impl == "auto"

    def test_cpu_fallback_bit_identical(self, rng):
        """attention_impl='flash' must be a no-op where flash does not
        apply: same params tree, bit-identical forward to 'xla'."""
        cfg_x = TINY
        cfg_f = LxmertConfig(
            **{**TINY.__dict__, "attention_impl": "flash"}
        )
        ids, mask, feats, pos = _batch(rng)
        m_x, m_f = Lxmert(cfg_x), Lxmert(cfg_f)
        params = m_x.init(
            jax.random.PRNGKey(0), ids, feats, pos, mask
        )["params"]
        out_x = m_x.apply({"params": params}, ids, feats, pos, mask)
        out_f = m_f.apply({"params": params}, ids, feats, pos, mask)
        for a, b in zip(out_x, out_f):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_tuned_block_sizes_routing(self):
        """Lock the measured v5e block-size table (BASELINE.md r4:
        tools/probe_flash.py --sweep/--sweep-bwd + the pass-7/8
        model-level rows): forward blocks are the largest divisor up to
        1024; the backward tile is length-conditional — capped at 512
        for padded lengths <= 1024 (flips seq-1024 training to a flash
        win), uniform with the forward above (bwd-512 regressed
        4096/8192 model-level). A regression here silently reverts the
        kernel to a measured-slower configuration."""
        bs = L._tuned_block_sizes(1024)
        assert bs.block_q == bs.block_k_major == bs.block_k == 1024
        assert bs.block_q_dq == bs.block_k_major_dkv == 512  # capped
        bs = L._tuned_block_sizes(512)
        assert bs.block_q == 512 and bs.block_q_dq == 512
        bs = L._tuned_block_sizes(256)
        assert bs.block_q == 256 and bs.block_q_dq == 256
        for s in (4096, 8192):
            bs = L._tuned_block_sizes(s)
            assert bs.block_q == 1024  # largest tile that divides s
            assert bs.block_q_dq == bs.block_q_dkv == 1024  # uniform
        # 1152 = 9*128: largest dividing block is 128; <=1024 cap
        # does not apply past 1024
        bs = L._tuned_block_sizes(1152)
        assert bs.block_q == 128 and bs.block_q_dq == 128
        assert bs.block_b == 1
        with pytest.raises(AssertionError):
            L._tuned_block_sizes(1000)  # not a 128 multiple
