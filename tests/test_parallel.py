"""Mesh + sharding rules on the virtual 8-device CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from vltk_tpu.config import MeshConfig
from vltk_tpu.models import Lxmert, LxmertConfig, LxmertForVQA
from vltk_tpu.parallel import (
    LXMERT_RULES,
    batch_sharding,
    infer_shardings,
    make_mesh,
    shard_batch,
    shard_params,
)

CFG = LxmertConfig(
    vocab_size=64,
    hidden_size=16,
    num_heads=2,
    intermediate_size=32,
    l_layers=1,
    x_layers=1,
    r_layers=1,
    visual_feat_dim=8,
    max_position_embeddings=32,
    num_answers=6,
    num_objects=5,
    num_attrs=3,
)


def _need_devices(n):
    if len(jax.devices()) < n:
        pytest.skip(f"needs {n} devices")


def test_make_mesh_free_axis():
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", -1),)))
    assert mesh.shape == {"data": 8}
    mesh = make_mesh(MeshConfig(axes=(("data", -1), ("model", 2))))
    assert mesh.shape == {"data": 4, "model": 2}


def test_make_mesh_errors():
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(axes=(("data", -1), ("model", -1))))
    with pytest.raises(ValueError):
        make_mesh(MeshConfig(axes=(("data", 3),)), devices=jax.devices()[:2])


def test_infer_shardings_rules():
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 4), ("model", 2))))
    model = Lxmert(CFG)
    ids = np.zeros((2, 6), np.int32)
    feats = np.zeros((2, 4, CFG.visual_feat_dim), np.float32)
    pos = np.zeros((2, 4, 4), np.float32)
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos)["params"]
    sh = infer_shardings(params, LXMERT_RULES, mesh)

    q = sh["layer_0"]["att"]["query"]["kernel"]
    assert q.spec == P(None, "model")
    out = sh["layer_0"]["att"]["att_out"]["kernel"]
    assert out.spec == P("model", None)
    inter = sh["x_layer_0"]["lang_ffn"]["intermediate"]["kernel"]
    assert inter.spec == P(None, "model")
    emb = sh["embeddings"]["word_embeddings"]["embedding"]
    assert emb.spec == P("model", None)
    # LayerNorms replicate
    assert sh["layer_0"]["att"]["ln"]["scale"].spec == P()


def test_tp_forward_matches_replicated():
    """DP+TP sharded forward must equal the single-device forward."""
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 2), ("model", 4))))
    rng = np.random.default_rng(0)
    n, s, v = 4, 8, 4
    ids = rng.integers(0, CFG.vocab_size, (n, s)).astype(np.int32)
    mask = np.ones((n, s), np.float32)
    feats = rng.normal(size=(n, v, CFG.visual_feat_dim)).astype(np.float32)
    pos = rng.uniform(0, 1, (n, v, 4)).astype(np.float32)

    model = LxmertForVQA(CFG)
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos, mask)["params"]
    ref = model.apply({"params": params}, ids, feats, pos, mask)

    sharded_params = shard_params(params, LXMERT_RULES, mesh)
    data = batch_sharding(mesh)
    batch = shard_batch({"ids": ids, "mask": mask, "feats": feats, "pos": pos}, mesh)

    @jax.jit
    def fwd(p, b):
        return model.apply({"params": p}, b["ids"], b["feats"], b["pos"], b["mask"])

    with mesh:
        got = fwd(sharded_params, batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_seq_sharded_forward():
    """activation_sharding=True constrains lang activations over the seq
    axis; result must still match the unsharded forward."""
    _need_devices(8)
    mesh = make_mesh(
        MeshConfig(axes=(("data", 2), ("seq", 2), ("model", 2)))
    )
    sp_cfg = LxmertConfig(
        **{**CFG.__dict__, "activation_sharding": True}
    )
    rng = np.random.default_rng(1)
    n, s, v = 4, 16, 4
    ids = rng.integers(0, CFG.vocab_size, (n, s)).astype(np.int32)
    mask = np.ones((n, s), np.float32)
    feats = rng.normal(size=(n, v, CFG.visual_feat_dim)).astype(np.float32)
    pos = rng.uniform(0, 1, (n, v, 4)).astype(np.float32)

    ref_model = Lxmert(CFG)
    params = ref_model.init(jax.random.PRNGKey(0), ids, feats, pos, mask)["params"]
    ref_lang, ref_visn, ref_pool = ref_model.apply(
        {"params": params}, ids, feats, pos, mask
    )

    sp_model = Lxmert(sp_cfg)
    sharded_params = shard_params(params, LXMERT_RULES, mesh)
    batch = shard_batch({"ids": ids, "mask": mask, "feats": feats, "pos": pos}, mesh)

    @jax.jit
    def fwd(p, b):
        return sp_model.apply(
            {"params": p}, b["ids"], b["feats"], b["pos"], b["mask"]
        )

    with mesh:
        lang, visn, pool = fwd(sharded_params, batch)
    np.testing.assert_allclose(np.asarray(lang), np.asarray(ref_lang), atol=1e-5)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(ref_pool), atol=1e-5)


def test_shard_batch_places_leading_dim():
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 8),)))
    x = np.zeros((16, 3), np.float32)
    out = shard_batch({"x": x}, mesh)
    assert out["x"].sharding.spec == P("data")


def test_infer_shardings_missing_axis_replicates():
    """Rules naming an axis the mesh lacks fall back to replication."""
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", -1),)))  # no 'model' axis
    model = Lxmert(CFG)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 4), np.int32),
        np.zeros((1, 2, CFG.visual_feat_dim), np.float32),
        np.zeros((1, 2, 4), np.float32),
    )["params"]
    sh = infer_shardings(params, LXMERT_RULES, mesh)
    assert sh["layer_0"]["att"]["query"]["kernel"].spec == P()


def test_ulysses_seq2048_matches_replicated():
    """Real sequence parallelism (SURVEY §5.7): Ulysses head-sharded
    attention over the seq axis at seq length 2048 — far past the
    reference's 512 truncation ceiling (reference: configs.py:113-114) —
    must match the replicated forward, AND the lang activations must be
    physically sequence-sharded (per-device memory actually drops)."""
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 2), ("seq", 2), ("model", 2))))
    base = LxmertConfig(
        vocab_size=64,
        hidden_size=16,
        num_heads=4,  # divisible by model*seq = 4
        intermediate_size=32,
        l_layers=1,
        x_layers=1,
        r_layers=1,
        visual_feat_dim=8,
        max_position_embeddings=2048,  # long-OCR cap raised via config
        num_answers=6,
        num_objects=5,
        num_attrs=3,
    )
    ul_cfg = LxmertConfig(
        **{**base.__dict__, "activation_sharding": True,
           "seq_attention_sharding": True}
    )
    rng = np.random.default_rng(3)
    n, s, v = 4, 2048, 4
    ids = rng.integers(0, base.vocab_size, (n, s)).astype(np.int32)
    mask = np.ones((n, s), np.float32)
    feats = rng.normal(size=(n, v, base.visual_feat_dim)).astype(np.float32)
    pos = rng.uniform(0, 1, (n, v, 4)).astype(np.float32)

    ref_model = Lxmert(base)
    params = ref_model.init(
        jax.random.PRNGKey(0), ids[:1, :8], feats[:1], pos[:1]
    )["params"]
    ref_lang, _, ref_pool = ref_model.apply(
        {"params": params}, ids, feats, pos, mask
    )

    ul_model = Lxmert(ul_cfg)
    sharded_params = shard_params(params, LXMERT_RULES, mesh)
    batch = shard_batch({"ids": ids, "mask": mask, "feats": feats, "pos": pos}, mesh)
    lang_sharding = NamedSharding(mesh, P("data", "seq", None))

    @jax.jit
    def fwd(p, b):
        lang, visn, pool = ul_model.apply(
            {"params": p}, b["ids"], b["feats"], b["pos"], b["mask"]
        )
        return jax.lax.with_sharding_constraint(lang, lang_sharding), pool

    with mesh:
        lowered = fwd.lower(sharded_params, batch)
        hlo = lowered.compile().as_text()
        lang, pool = fwd(sharded_params, batch)
        jax.block_until_ready(lang)

    # numerics match the replicated forward
    np.testing.assert_allclose(np.asarray(lang), np.asarray(ref_lang), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(ref_pool), atol=2e-5)

    # activations are PHYSICALLY seq-sharded: each device holds s/2 rows of
    # n/2 examples, i.e. 1/4 of the lang activation memory
    shard_shape = lang.addressable_shards[0].data.shape
    assert shard_shape == (n // 2, s // 2, base.hidden_size), shard_shape

    # the Ulysses layout switch lowered to real all-to-all collectives
    assert "all-to-all" in hlo or "AllToAll" in hlo, "no all-to-all in HLO"

    # collective-quality bound (VERDICT r2 weak #7): no full-sequence KV /
    # activation all-gather in the forward — every all-gather result must
    # stay strictly smaller than one full lang activation
    full_act_bytes = 4 * n * s * base.hidden_size
    for dims, nb in _all_gather_result_bytes(hlo):
        assert nb < full_act_bytes, (
            f"forward all-gather materializes a full activation: "
            f"f32[{dims}] = {nb}B >= {full_act_bytes}B"
        )


def _all_gather_result_bytes(hlo: str):
    """(dims, result_bytes) for every all-gather in an HLO dump."""
    import math
    import re

    out = []
    for m in re.finditer(r"all-gather[^\n]*?f32\[([0-9,]*)\]", hlo):
        dims = m.group(1)
        nb = 4 * math.prod(int(x) for x in dims.split(",") if x) if dims else 4
        out.append((dims, nb))
    return out


class _CaptureStderrFd:
    """Capture OS-level fd 2 (XLA's C++ spmd_partitioner warnings bypass
    Python's sys.stderr)."""

    def __enter__(self):
        import os
        import tempfile

        self._file = tempfile.TemporaryFile(mode="w+b")
        self._saved = os.dup(2)
        os.dup2(self._file.fileno(), 2)
        return self

    def __exit__(self, *exc):
        import os

        os.dup2(self._saved, 2)
        os.close(self._saved)
        self._file.seek(0)
        self.text = self._file.read().decode(errors="replace")
        self._file.close()
        return False


def test_ulysses_train_backward_hlo_clean():
    """The compiled ``value_and_grad`` train step over the dp x sp x tp
    mesh must have a CLEAN backward (VERDICT r2 weak #3): the forward
    Ulysses constraints are placed so the transposed program reshards
    with all-to-alls — no SPMD "involuntary full rematerialization"
    (which replicates whole activation tensors), and no all-gather at
    full-activation size in either direction."""
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 2), ("seq", 2), ("model", 2))))
    base = LxmertConfig(
        vocab_size=64,
        hidden_size=16,
        num_heads=4,
        intermediate_size=32,
        l_layers=1,
        x_layers=1,
        r_layers=1,
        visual_feat_dim=8,
        max_position_embeddings=256,
        num_answers=6,
        num_objects=5,
        num_attrs=3,
    )
    ul_cfg = LxmertConfig(
        **{**base.__dict__, "activation_sharding": True,
           "seq_attention_sharding": True}
    )
    rng = np.random.default_rng(0)
    n, s, v = 4, 256, 4
    ids = rng.integers(0, base.vocab_size, (n, s)).astype(np.int32)
    mask = np.ones((n, s), np.float32)
    feats = rng.normal(size=(n, v, base.visual_feat_dim)).astype(np.float32)
    pos = rng.uniform(0, 1, (n, v, 4)).astype(np.float32)

    model = Lxmert(base)
    params = model.init(
        jax.random.PRNGKey(0), ids[:1, :8], feats[:1], pos[:1]
    )["params"]
    ul_model = Lxmert(ul_cfg)
    sharded_params = shard_params(params, LXMERT_RULES, mesh)
    batch = shard_batch(
        {"ids": ids, "mask": mask, "feats": feats, "pos": pos}, mesh
    )

    def loss_fn(p, b):
        lang, visn, pool = ul_model.apply(
            {"params": p}, b["ids"], b["feats"], b["pos"], b["mask"]
        )
        return jnp.sum(lang**2) + jnp.sum(pool**2)

    step = jax.jit(jax.value_and_grad(loss_fn))
    with mesh, _CaptureStderrFd() as cap:
        compiled = step.lower(sharded_params, batch).compile()
    hlo = compiled.as_text()

    assert "Involuntary full rematerialization" not in cap.text, (
        "SPMD partitioner fell back to replicating an activation in the "
        "train step:\n" + cap.text[:2000]
    )
    # backward must reshard via all-to-all, and never materialize a full
    # activation through an all-gather (the remat signature)
    assert hlo.count("all-to-all") >= 4, "Ulysses all-to-alls missing"
    full_act_bytes = 4 * n * s * base.hidden_size
    for dims, nb in _all_gather_result_bytes(hlo):
        assert nb < full_act_bytes, (
            f"train-step all-gather materializes a full activation: "
            f"f32[{dims}] = {nb}B >= {full_act_bytes}B"
        )

    # the step actually runs and produces finite grads
    with mesh:
        loss, grads = step(sharded_params, batch)
    assert np.isfinite(float(loss))


def test_zero1_optimizer_state_sharding():
    """ZeRO stage 1 (SURVEY §5.8 depth): with ``zero1_axis="data"`` the
    Adam moments are PHYSICALLY sharded over the data axis (each DP
    device stores 1/dp of the optimizer state) while training remains
    numerically identical to the replicated-optimizer run."""
    import optax

    from vltk_tpu.parallel import zero1_state_shardings
    from vltk_tpu.train import create_state, make_train_step
    from vltk_tpu.train.steps import TrainState

    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 4), ("model", 2))))
    model = Lxmert(CFG)
    rng = np.random.default_rng(0)
    n, s, v = 8, 6, 3
    batch = {
        "ids": rng.integers(0, CFG.vocab_size, (n, s)).astype(np.int32),
        "mask": np.ones((n, s), np.float32),
        "feats": rng.normal(size=(n, v, CFG.visual_feat_dim)).astype(np.float32),
        "pos": rng.uniform(0, 1, (n, v, 4)).astype(np.float32),
    }
    params = model.init(
        jax.random.PRNGKey(0), batch["ids"][:1], batch["feats"][:1],
        batch["pos"][:1],
    )["params"]
    tx = optax.adamw(1e-2)

    def loss_fn(p, b, step_rng):
        lang, visn, pool = model.apply(
            {"params": p}, b["ids"], b["feats"], b["pos"], b["mask"]
        )
        return jnp.sum(lang**2) + jnp.sum(pool**2), {}

    sharded = shard_batch(batch, mesh)

    # ZeRO-1 run
    z_state = create_state(
        model.apply, params, tx, mesh, LXMERT_RULES, zero1_axis="data"
    )
    abstract = jax.eval_shape(
        lambda p: TrainState.create(apply_fn=model.apply, params=p, tx=tx),
        z_state.params,
    )
    out_sh = zero1_state_shardings(abstract, LXMERT_RULES, mesh, "data")
    z_step = make_train_step(loss_fn, mesh, state_shardings=out_sh)

    # moments are physically sharded: a replicated (h, h)-kernel's mu
    # shard holds 1/4 of the rows; a TP column-kernel's mu adds data on
    # its free dim
    mu = z_state.opt_state[0].mu
    ln_kernel_mu = mu["pooler"]["dense"]["kernel"] if "pooler" in mu else None
    some = mu["layer_0"]["att"]["att_out"]["kernel"]  # P("model", None) base
    h = CFG.hidden_size
    assert some.sharding.spec == P("model", "data"), some.sharding.spec
    assert some.addressable_shards[0].data.shape == (h // 2, h // 4)
    q_mu = mu["layer_0"]["att"]["query"]["kernel"]  # P(None, "model") base
    assert q_mu.sharding.spec == P("data", "model")
    # params themselves keep their rule shardings (no data axis)
    q_p = z_state.params["layer_0"]["att"]["query"]["kernel"]
    assert q_p.sharding.spec == P(None, "model")

    # replicated-optimizer reference run
    r_state = create_state(model.apply, params, tx, mesh, LXMERT_RULES)
    r_step = make_train_step(loss_fn, mesh)

    key = jax.random.PRNGKey(7)
    for _ in range(2):
        z_state, zm = z_step(z_state, sharded, key)
        r_state, rm = r_step(r_state, sharded, key)
    np.testing.assert_allclose(
        float(zm["loss"]), float(rm["loss"]), rtol=1e-6
    )
    za = jax.tree_util.tree_leaves(z_state.params)
    ra = jax.tree_util.tree_leaves(r_state.params)
    for a, b in zip(za, ra):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )


def test_zero1_state_checkpoint_roundtrip(tmp_path):
    """A ZeRO-sharded TrainState survives the orbax sharded checkpoint
    path (train/checkpoint.py): values identical after restore and the
    moment shardings preserved — resume does not silently replicate the
    optimizer state."""
    import optax

    from vltk_tpu.train import create_state
    from vltk_tpu.train.checkpoint import (
        load_checkpoint_sharded,
        save_checkpoint_sharded,
    )

    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 4), ("model", 2))))
    model = Lxmert(CFG)
    params = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 4), np.int32),
        np.zeros((1, 2, CFG.visual_feat_dim), np.float32),
        np.zeros((1, 2, 4), np.float32),
    )["params"]
    state = create_state(
        model.apply, params, optax.adamw(1e-3), mesh, LXMERT_RULES,
        zero1_axis="data",
    )
    tree = {"params": state.params, "opt_state": state.opt_state,
            "step": state.step}
    save_checkpoint_sharded(str(tmp_path), "zero1", 0, tree)
    restored = load_checkpoint_sharded(str(tmp_path), "zero1", tree)

    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(tree),
        jax.tree_util.tree_leaves_with_path(restored),
    ):
        assert pa == pb
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        if hasattr(a, "sharding") and hasattr(b, "sharding"):
            assert a.sharding == b.sharding, (pa, a.sharding, b.sharding)
    # spot-check a moment leaf really is data-sharded after restore
    mu = restored["opt_state"][0].mu
    q_mu = mu["layer_0"]["att"]["query"]["kernel"]
    assert "data" in str(q_mu.sharding.spec)


def test_layoutlm_ulysses_long_ocr():
    """LayoutLM (single-stream OCR encoder) rides the same Ulysses path:
    seq-1024 forward matches replicated — FUNSD/DocVQA streams beyond the
    512 ceiling are shardable, not just truncatable."""
    _need_devices(8)
    from vltk_tpu.models.layoutlm import LayoutLM, LayoutLMConfig

    mesh = make_mesh(MeshConfig(axes=(("data", 2), ("seq", 2), ("model", 2))))
    base = LayoutLMConfig(
        vocab_size=64,
        hidden_size=16,
        num_heads=4,
        intermediate_size=32,
        l_layers=2,
        max_position_embeddings=1024,
        num_labels=3,
    )
    ul = LayoutLMConfig(
        **{**base.__dict__, "activation_sharding": True,
           "seq_attention_sharding": True}
    )
    rng = np.random.default_rng(4)
    n, s = 4, 1024
    ids = rng.integers(0, base.vocab_size, (n, s)).astype(np.int32)
    boxes = rng.integers(0, 1000, (n, s, 4)).astype(np.int32)
    mask = np.ones((n, s), np.float32)

    ref_model = LayoutLM(base)
    params = ref_model.init(
        jax.random.PRNGKey(0), ids[:1, :8], boxes[:1, :8]
    )["params"]
    ref = ref_model.apply({"params": params}, ids, boxes, mask)

    ul_model = LayoutLM(ul)
    sharded_params = shard_params(params, LXMERT_RULES, mesh)
    batch = shard_batch({"ids": ids, "boxes": boxes, "mask": mask}, mesh)

    @jax.jit
    def fwd(p, b):
        return ul_model.apply({"params": p}, b["ids"], b["boxes"], b["mask"])

    with mesh:
        got = fwd(sharded_params, batch)
        jax.block_until_ready(got)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)
    shard_shape = got.addressable_shards[0].data.shape
    assert shard_shape == (n // 2, s // 2, base.hidden_size), shard_shape


def test_longdoc_seq4096_dryrun_both_backends():
    """VERDICT r3 task 7: the >=4k-token document stream the SP story
    exists for — seq-4096 LayoutLM sharded seq=8, Ulysses AND ring, each
    asserted against the replicated forward (the same check the driver's
    dryrun_multichip runs; shared implementation)."""
    _need_devices(8)
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod._dryrun_longdoc_seq_parallel(8)  # asserts parity internally


def test_visualbert_ulysses_matches_replicated():
    """VisualBERT's single (S+V) stream rides the same Ulysses path."""
    _need_devices(8)
    from vltk_tpu.models.visualbert import VisualBert, VisualBertConfig

    mesh = make_mesh(MeshConfig(axes=(("data", 2), ("seq", 2), ("model", 2))))
    base = VisualBertConfig(
        vocab_size=64,
        hidden_size=16,
        num_heads=4,
        intermediate_size=32,
        l_layers=2,
        visual_feat_dim=8,
        max_position_embeddings=512,
    )
    ul = VisualBertConfig(
        **{**base.__dict__, "activation_sharding": True,
           "seq_attention_sharding": True}
    )
    rng = np.random.default_rng(5)
    n, s, v = 4, 252, 4  # S+V = 256, divisible over the seq axis
    ids = rng.integers(0, base.vocab_size, (n, s)).astype(np.int32)
    feats = rng.normal(size=(n, v, base.visual_feat_dim)).astype(np.float32)
    mask = np.ones((n, s), np.float32)

    ref_model = VisualBert(base)
    params = ref_model.init(
        jax.random.PRNGKey(0), ids[:1, :8], feats[:1]
    )["params"]
    ref_seq, ref_pool = ref_model.apply({"params": params}, ids, feats, None, mask)

    ul_model = VisualBert(ul)
    sharded_params = shard_params(params, LXMERT_RULES, mesh)
    batch = shard_batch({"ids": ids, "feats": feats, "mask": mask}, mesh)

    @jax.jit
    def fwd(p, b):
        return ul_model.apply({"params": p}, b["ids"], b["feats"], None, b["mask"])

    with mesh:
        seq, pool = fwd(sharded_params, batch)
        jax.block_until_ready(pool)
    np.testing.assert_allclose(np.asarray(seq), np.asarray(ref_seq), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(ref_pool), atol=2e-5)


# ---------------------------------------------------------------------------
# Ring attention (SURVEY §5.7's second backend: KV rotation over ppermute)
# ---------------------------------------------------------------------------


def _dense_attention(q, k, v, mask, dh):
    sc = jnp.einsum("nqhd,nkhd->nhqk", q, k) / np.sqrt(dh)
    sc = sc + (1.0 - mask)[:, None, None, :] * -10000.0
    p = jax.nn.softmax(sc, axis=-1)
    return jnp.einsum("nhqk,nkhd->nqhd", p, v)


def test_ring_attention_matches_dense():
    """ring_self_attention (forward AND grads) must match dense softmax
    attention on a dp x sp x tp mesh, including a ragged key mask that
    rotates around the ring with K/V."""
    from vltk_tpu.parallel import ring_self_attention

    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 2), ("seq", 2), ("model", 2))))
    rng = np.random.default_rng(0)
    n, s, nh, dh = 2, 32, 4, 8
    q = rng.normal(size=(n, s, nh, dh)).astype(np.float32)
    k = rng.normal(size=(n, s, nh, dh)).astype(np.float32)
    v = rng.normal(size=(n, s, nh, dh)).astype(np.float32)
    mask = (rng.uniform(size=(n, s)) > 0.2).astype(np.float32)

    ref = _dense_attention(q, k, v, mask, dh)
    with mesh:
        got = jax.jit(
            lambda q, k, v, m: ring_self_attention(q, k, v, m, mesh=mesh)
        )(q, k, v, mask)
        hlo = (
            jax.jit(lambda q, k, v, m: ring_self_attention(q, k, v, m, mesh=mesh))
            .lower(q, k, v, mask).compile().as_text()
        )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
    # the ring rotation lowers to neighbour collective-permutes, not
    # all-to-alls or full KV all-gathers
    assert "collective-permute" in hlo, "no collective-permute in ring HLO"

    def loss_ring(q, k, v):
        with mesh:
            return jnp.sum(ring_self_attention(q, k, v, mask, mesh=mesh) ** 2)

    def loss_dense(q, k, v):
        return jnp.sum(_dense_attention(q, k, v, mask, dh) ** 2)

    g_ring = jax.grad(loss_ring, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ring, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_ring_dropout_masks_independent_across_shards():
    """Attention-dropout draws must differ across data shards and model
    shards, not just across ring (q-shard, kv-shard) pairs: the mask
    tensor only spans the local (nl, nhl, ...) dims, so the key must be
    folded with the data/model axis indices too (parallel/ring.py).
    Identical inputs tiled across examples and heads expose any shared
    mask as bit-identical outputs."""
    from vltk_tpu.parallel import ring_self_attention

    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 2), ("seq", 2), ("model", 2))))
    rng = np.random.default_rng(1)
    n, s, nh, dh = 4, 32, 4, 8
    # one (s, dh) block tiled over every example and head: without
    # dropout all (example, head) slices of the output are identical
    base_q = rng.normal(size=(1, s, 1, dh)).astype(np.float32)
    base_k = rng.normal(size=(1, s, 1, dh)).astype(np.float32)
    base_v = rng.normal(size=(1, s, 1, dh)).astype(np.float32)
    q = np.tile(base_q, (n, 1, nh, 1))
    k = np.tile(base_k, (n, 1, nh, 1))
    v = np.tile(base_v, (n, 1, nh, 1))
    mask = np.ones((n, s), np.float32)
    key = jax.random.PRNGKey(7)

    def run():
        with mesh:
            return np.asarray(
                jax.jit(
                    lambda q, k, v, m: ring_self_attention(
                        q, k, v, m, mesh=mesh,
                        dropout_rate=0.5, dropout_rng=key,
                    )
                )(q, k, v, mask)
            )

    out = run()
    # examples 0 and 2 live on different data shards; heads 0 and 2 on
    # different model shards — each must see an independent draw
    assert not np.array_equal(out[0], out[2]), (
        "dropout masks duplicated across data shards")
    assert not np.array_equal(out[0, :, 0], out[0, :, 2]), (
        "dropout masks duplicated across model shards")
    # but the draw stays reproducible for a fixed rng
    np.testing.assert_array_equal(out, run())


def test_ring_backend_lxmert_matches_replicated():
    """Lxmert with seq_attention_backend='ring' must match the replicated
    forward; lang activations stay physically seq-sharded and the lang
    self-attention lowers to collective-permutes."""
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 2), ("seq", 2), ("model", 2))))
    base = LxmertConfig(
        vocab_size=64,
        hidden_size=16,
        num_heads=4,
        intermediate_size=32,
        l_layers=1,
        x_layers=1,
        r_layers=1,
        visual_feat_dim=8,
        max_position_embeddings=512,
        num_answers=6,
        num_objects=5,
        num_attrs=3,
    )
    ring_cfg = LxmertConfig(
        **{**base.__dict__, "activation_sharding": True,
           "seq_attention_sharding": True, "seq_attention_backend": "ring"}
    )
    rng = np.random.default_rng(7)
    n, s, v = 4, 512, 4
    ids = rng.integers(0, base.vocab_size, (n, s)).astype(np.int32)
    mask = np.ones((n, s), np.float32)
    feats = rng.normal(size=(n, v, base.visual_feat_dim)).astype(np.float32)
    pos = rng.uniform(0, 1, (n, v, 4)).astype(np.float32)

    ref_model = Lxmert(base)
    params = ref_model.init(
        jax.random.PRNGKey(0), ids[:1, :8], feats[:1], pos[:1]
    )["params"]
    ref_lang, _, ref_pool = ref_model.apply(
        {"params": params}, ids, feats, pos, mask
    )

    ring_model = Lxmert(ring_cfg)
    sharded_params = shard_params(params, LXMERT_RULES, mesh)
    batch = shard_batch({"ids": ids, "mask": mask, "feats": feats, "pos": pos}, mesh)
    lang_sharding = NamedSharding(mesh, P("data", "seq", None))

    @jax.jit
    def fwd(p, b):
        lang, visn, pool = ring_model.apply(
            {"params": p}, b["ids"], b["feats"], b["pos"], b["mask"]
        )
        return jax.lax.with_sharding_constraint(lang, lang_sharding), pool

    with mesh:
        hlo = fwd.lower(sharded_params, batch).compile().as_text()
        lang, pool = fwd(sharded_params, batch)
        jax.block_until_ready(lang)

    np.testing.assert_allclose(np.asarray(lang), np.asarray(ref_lang), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(ref_pool), atol=2e-5)
    shard_shape = lang.addressable_shards[0].data.shape
    assert shard_shape == (n // 2, s // 2, base.hidden_size), shard_shape
    assert "collective-permute" in hlo, "ring rotation missing from HLO"
    # no full-sequence KV/activation all-gather in the forward
    full_act_bytes = 4 * n * s * base.hidden_size
    for dims, nb in _all_gather_result_bytes(hlo):
        assert nb < full_act_bytes, (
            f"ring forward all-gather materializes a full activation: "
            f"f32[{dims}] = {nb}B >= {full_act_bytes}B"
        )


def test_ring_seq_degree_beyond_head_count():
    """The ring backend's reason to exist: a sequence-parallel degree
    LARGER than the head count (impossible for Ulysses, which re-shards
    heads over seq). 2 heads over an 8-way seq axis must still match."""
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 1), ("seq", 8))))
    base = LxmertConfig(
        vocab_size=64,
        hidden_size=16,
        num_heads=2,  # < seq axis size 8
        intermediate_size=32,
        l_layers=1,
        x_layers=1,
        r_layers=1,
        visual_feat_dim=8,
        max_position_embeddings=512,
        num_answers=6,
        num_objects=5,
        num_attrs=3,
    )
    ring_cfg = LxmertConfig(
        **{**base.__dict__, "activation_sharding": True,
           "seq_attention_sharding": True, "seq_attention_backend": "ring"}
    )
    rng = np.random.default_rng(11)
    n, s, v = 2, 128, 4
    ids = rng.integers(0, base.vocab_size, (n, s)).astype(np.int32)
    mask = np.ones((n, s), np.float32)
    feats = rng.normal(size=(n, v, base.visual_feat_dim)).astype(np.float32)
    pos = rng.uniform(0, 1, (n, v, 4)).astype(np.float32)

    ref_model = Lxmert(base)
    params = ref_model.init(
        jax.random.PRNGKey(0), ids[:1, :8], feats[:1], pos[:1]
    )["params"]
    ref_lang, _, ref_pool = ref_model.apply(
        {"params": params}, ids, feats, pos, mask
    )

    ring_model = Lxmert(ring_cfg)
    sharded_params = shard_params(params, LXMERT_RULES, mesh)
    batch = shard_batch({"ids": ids, "mask": mask, "feats": feats, "pos": pos}, mesh)

    @jax.jit
    def fwd(p, b):
        return ring_model.apply(
            {"params": p}, b["ids"], b["feats"], b["pos"], b["mask"]
        )

    with mesh:
        lang, visn, pool = fwd(sharded_params, batch)
        jax.block_until_ready(pool)
    np.testing.assert_allclose(np.asarray(lang), np.asarray(ref_lang), atol=2e-5)
    np.testing.assert_allclose(np.asarray(pool), np.asarray(ref_pool), atol=2e-5)


def test_ring_train_backward_hlo_clean():
    """Same hygiene bar as the Ulysses backward (VERDICT r2 weak #3): the
    compiled value_and_grad step with the ring backend must emit no SPMD
    involuntary-full-rematerialization warnings and no full-activation
    all-gather; the ring rotation must appear as collective-permutes."""
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 2), ("seq", 2), ("model", 2))))
    base = LxmertConfig(
        vocab_size=64,
        hidden_size=16,
        num_heads=4,
        intermediate_size=32,
        l_layers=1,
        x_layers=1,
        r_layers=1,
        visual_feat_dim=8,
        max_position_embeddings=256,
        num_answers=6,
        num_objects=5,
        num_attrs=3,
    )
    ring_cfg = LxmertConfig(
        **{**base.__dict__, "activation_sharding": True,
           "seq_attention_sharding": True, "seq_attention_backend": "ring"}
    )
    rng = np.random.default_rng(0)
    n, s, v = 4, 256, 4
    ids = rng.integers(0, base.vocab_size, (n, s)).astype(np.int32)
    mask = np.ones((n, s), np.float32)
    feats = rng.normal(size=(n, v, base.visual_feat_dim)).astype(np.float32)
    pos = rng.uniform(0, 1, (n, v, 4)).astype(np.float32)

    model = Lxmert(base)
    params = model.init(
        jax.random.PRNGKey(0), ids[:1, :8], feats[:1], pos[:1]
    )["params"]
    ring_model = Lxmert(ring_cfg)
    sharded_params = shard_params(params, LXMERT_RULES, mesh)
    batch = shard_batch(
        {"ids": ids, "mask": mask, "feats": feats, "pos": pos}, mesh
    )

    def loss_fn(p, b):
        lang, visn, pool = ring_model.apply(
            {"params": p}, b["ids"], b["feats"], b["pos"], b["mask"]
        )
        return jnp.sum(lang**2) + jnp.sum(pool**2)

    step = jax.jit(jax.value_and_grad(loss_fn))
    with mesh, _CaptureStderrFd() as cap:
        compiled = step.lower(sharded_params, batch).compile()
    hlo = compiled.as_text()

    assert "Involuntary full rematerialization" not in cap.text, (
        "SPMD partitioner replicated an activation in the ring train "
        "step:\n" + cap.text[:2000]
    )
    assert "collective-permute" in hlo, "ring rotation missing from HLO"
    full_act_bytes = 4 * n * s * base.hidden_size
    for dims, nb in _all_gather_result_bytes(hlo):
        assert nb < full_act_bytes, (
            f"ring train-step all-gather materializes a full activation: "
            f"f32[{dims}] = {nb}B >= {full_act_bytes}B"
        )

    with mesh:
        loss, grads = step(sharded_params, batch)
    assert np.isfinite(float(loss))
