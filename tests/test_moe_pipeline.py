"""MoE expert parallelism (models/moe.py) + GPipe pipeline parallelism
(parallel/pipeline.py) on the virtual 8-device CPU mesh.

Oracles: numpy loop implementation of the top-k routing plan; exact
equality of a 1-expert MoE vs the dense FFN with copied weights; exact
equality of the pipelined layer stack vs its sequential application.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from vltk_tpu.config import MeshConfig
from vltk_tpu.models import LxmertConfig, LxmertForVQA
from vltk_tpu.models.lxmert import FeedForward, TransformerLayer
from vltk_tpu.models.moe import MoEFeedForward, moe_capacity, top_k_routing
from vltk_tpu.parallel import (
    LXMERT_MOE_RULES,
    gpipe_spmd,
    infer_shardings,
    make_mesh,
    shard_batch,
    shard_params,
    stack_layer_params,
)
from vltk_tpu.parallel.pipeline import unstack_layer_params

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


# ---------------------------------------------------------------------------
# MoE routing
# ---------------------------------------------------------------------------


def _routing_oracle(probs, top_k, capacity):
    """Loop implementation of the GShard static dispatch plan."""
    t, e = probs.shape
    dispatch = np.zeros((t, e, capacity), np.float32)
    gates = np.zeros((t, top_k), np.float32)
    choices = np.full((t, top_k), -1, np.int64)
    slots = np.full((t, top_k), -1, np.int64)
    used = np.zeros(e, np.int64)
    masked = probs.copy()
    for k in range(top_k):
        idx = masked.argmax(axis=-1)
        for tok in range(t):
            ex = idx[tok]
            pos = used[ex]
            used[ex] += 1
            gates[tok, k] = probs[tok, ex]
            choices[tok, k] = ex
            if pos < capacity:
                dispatch[tok, ex, pos] = 1.0
                slots[tok, k] = pos
            masked[tok, ex] = -np.inf
    combine = np.zeros_like(dispatch)
    for tok in range(t):
        denom = sum(
            gates[tok, k] for k in range(top_k) if slots[tok, k] >= 0
        )
        if denom <= 0:
            continue
        for k in range(top_k):
            if slots[tok, k] >= 0:
                combine[tok, choices[tok, k], slots[tok, k]] = (
                    gates[tok, k] / denom
                )
    fraction = np.bincount(choices[:, 0], minlength=e) / t
    return dispatch, combine, fraction.astype(np.float32)


@pytest.mark.parametrize("top_k,cap_factor", [(1, 2.0), (2, 1.0), (2, 0.25)])
def test_top_k_routing_matches_oracle(top_k, cap_factor):
    rng = np.random.default_rng(3)
    t, e = 24, 4
    logits = rng.normal(size=(t, e)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    cap = moe_capacity(t, e, top_k, cap_factor)
    dispatch, combine, fraction = jax.jit(
        top_k_routing, static_argnums=(1, 2)
    )(jnp.asarray(probs), top_k, cap)
    ref_d, ref_c, ref_f = _routing_oracle(probs, top_k, cap)
    np.testing.assert_allclose(np.asarray(dispatch), ref_d, atol=1e-6)
    np.testing.assert_allclose(np.asarray(combine), ref_c, atol=1e-6)
    np.testing.assert_allclose(np.asarray(fraction), ref_f, atol=1e-6)


def test_moe_capacity_is_static_and_aligned():
    assert moe_capacity(256, 8, 2, 1.25) % 8 == 0
    assert moe_capacity(8, 8, 1, 1.0) == 8  # floor at one sublane block
    assert moe_capacity(256, 8, 2, 1.25) >= 2 * 256 // 8


def test_moe_single_expert_equals_dense_ffn():
    """E=1/k=1 at ample capacity routes every token through the one
    expert with weight 1.0 — must reproduce the dense FFN exactly."""
    cfg = dataclasses.replace(
        CFG, moe_experts=1, moe_top_k=1, moe_capacity_factor=1.5
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 8, CFG.hidden_size)), jnp.float32)

    dense = FeedForward(CFG)
    dp = dense.init(jax.random.PRNGKey(0), x)["params"]
    ref = dense.apply({"params": dp}, x)

    moe = MoEFeedForward(cfg)
    mp = moe.init(jax.random.PRNGKey(1), x)["params"]
    mp = dict(mp)
    mp["wi"] = dp["intermediate"]["kernel"][None]
    mp["bi"] = dp["intermediate"]["bias"][None]
    mp["wo"] = dp["mlp_out"]["kernel"][None]
    mp["bo"] = dp["mlp_out"]["bias"][None]
    mp["ln"] = dp["ln"]
    got = moe.apply({"params": mp}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_moe_dropped_tokens_keep_residual():
    """Capacity 8 with 64 tokens on one hot expert: overflowed tokens
    contribute zero expert output — their result is LN(x)."""
    cfg = dataclasses.replace(
        CFG, moe_experts=2, moe_top_k=1, moe_capacity_factor=0.25
    )
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(4, 16, CFG.hidden_size)), jnp.float32)
    moe = MoEFeedForward(cfg)
    p = moe.init(jax.random.PRNGKey(0), x)["params"]
    out = np.asarray(moe.apply({"params": p}, x))
    assert np.isfinite(out).all()
    # 64 tokens, cap factor 0.25 -> capacity 8 per expert, <=16 kept:
    # dropped tokens get zero expert output, so their row is exactly
    # LN(x) — recompute it and count matches
    xe = np.asarray(x, np.float64)
    mu = xe.mean(-1, keepdims=True)
    var = xe.var(-1, keepdims=True)
    ln = (xe - mu) / np.sqrt(var + CFG.layer_norm_eps)
    ln = ln * np.asarray(p["ln"]["scale"]) + np.asarray(p["ln"]["bias"])
    row_is_ln = np.all(np.abs(out - ln) < 1e-4, axis=-1)
    assert row_is_ln.sum() >= 64 - 16, row_is_ln.sum()


def test_moe_lxmert_forward_and_aux_loss():
    cfg = dataclasses.replace(CFG, moe_experts=4, moe_top_k=2)
    rng = np.random.default_rng(2)
    n, s, v = 2, 8, 4
    ids = rng.integers(0, cfg.vocab_size, (n, s)).astype(np.int32)
    feats = rng.normal(size=(n, v, cfg.visual_feat_dim)).astype(np.float32)
    pos = rng.uniform(0, 1, (n, v, 4)).astype(np.float32)
    model = LxmertForVQA(cfg)
    params = model.init(jax.random.PRNGKey(0), ids, feats, pos)["params"]
    logits, mut = model.apply(
        {"params": params}, ids, feats, pos, mutable=["losses"]
    )
    assert logits.shape == (n, cfg.num_answers)
    aux_leaves = jax.tree_util.tree_leaves(mut["losses"])
    # every FFN site sows one aux term: l + r + 2*x (lang_ffn + visn_ffn)
    assert len(aux_leaves) == cfg.l_layers + cfg.r_layers + 2 * cfg.x_layers
    total_aux = sum(jnp.asarray(a).sum() for a in aux_leaves)
    assert np.isfinite(float(total_aux)) and float(total_aux) > 0.0

    def loss_fn(p):
        lg, m = model.apply({"params": p}, ids, feats, pos, mutable=["losses"])
        aux = sum(jnp.asarray(a).sum() for a in jax.tree_util.tree_leaves(m["losses"]))
        return jnp.mean(lg.astype(jnp.float32) ** 2) + aux

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    gnorm = sum(
        float(jnp.sum(jnp.abs(g))) for g in jax.tree_util.tree_leaves(grads)
    )
    assert np.isfinite(gnorm) and gnorm > 0.0
    # the router only gets gradient through aux/combine — check it moves
    router_g = grads["lxmert"]["layer_0"]["ffn"]["router"]["kernel"]
    assert float(jnp.sum(jnp.abs(router_g))) > 0.0


def test_moe_ep_sharded_matches_replicated():
    """dp x ep sharded forward == replicated forward; expert kernels are
    physically sharded over the expert axis."""
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("data", 2), ("expert", 4))))
    cfg = dataclasses.replace(
        CFG, moe_experts=4, moe_top_k=2, activation_sharding=True
    )
    plain = dataclasses.replace(cfg, activation_sharding=False)
    rng = np.random.default_rng(4)
    n, s, v = 4, 8, 4
    ids = rng.integers(0, cfg.vocab_size, (n, s)).astype(np.int32)
    mask = np.ones((n, s), np.float32)
    feats = rng.normal(size=(n, v, cfg.visual_feat_dim)).astype(np.float32)
    pos = rng.uniform(0, 1, (n, v, 4)).astype(np.float32)

    ref_model = LxmertForVQA(plain)
    params = ref_model.init(jax.random.PRNGKey(0), ids, feats, pos, mask)["params"]
    ref = ref_model.apply({"params": params}, ids, feats, pos, mask)

    sh = infer_shardings(params, LXMERT_MOE_RULES, mesh)
    wi_spec = sh["lxmert"]["layer_0"]["ffn"]["wi"].spec
    assert wi_spec[0] == "expert", wi_spec
    sharded = shard_params(params, LXMERT_MOE_RULES, mesh)
    batch = shard_batch(
        {"ids": ids, "mask": mask, "feats": feats, "pos": pos}, mesh
    )
    model = LxmertForVQA(cfg)

    @jax.jit
    def fwd(p, b):
        return model.apply({"params": p}, b["ids"], b["feats"], b["pos"], b["mask"])

    with mesh:
        got = fwd(sharded, batch)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


# ---------------------------------------------------------------------------
# GPipe pipeline
# ---------------------------------------------------------------------------


def _toy_layer(p, x):
    return jnp.tanh(x @ p["w"] + p["b"])


def _toy_stack(rng, layers, width):
    return {
        "w": jnp.asarray(
            rng.normal(size=(layers, width, width)) * 0.3, jnp.float32
        ),
        "b": jnp.asarray(rng.normal(size=(layers, width)) * 0.1, jnp.float32),
    }


def test_gpipe_matches_sequential():
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("pipe", 4), ("data", 2))))
    rng = np.random.default_rng(0)
    layers, width, m, mb = 8, 8, 6, 4
    stacked = _toy_stack(rng, layers, width)
    x = jnp.asarray(rng.normal(size=(m, mb, width)), jnp.float32)

    ref = x
    for i in range(layers):
        ref = _toy_layer({"w": stacked["w"][i], "b": stacked["b"][i]}, ref)

    got = gpipe_spmd(_toy_layer, stacked, x, mesh=mesh)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)


def test_gpipe_data_sharded_stream():
    """data_axis= shards the microbatch dim over the data axis (each
    data slice runs its own pipeline), matching the replicated result
    exactly — and the stream is physically sharded, not replicated."""
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("pipe", 4), ("data", 2))))
    rng = np.random.default_rng(2)
    layers, width, m, mb = 8, 8, 6, 4
    stacked = _toy_stack(rng, layers, width)
    x = jnp.asarray(rng.normal(size=(m, mb, width)), jnp.float32)

    ref = x
    for i in range(layers):
        ref = _toy_layer({"w": stacked["w"][i], "b": stacked["b"][i]}, ref)

    fn = jax.jit(
        lambda p, xx: gpipe_spmd(
            _toy_layer, p, xx, mesh=mesh, data_axis="data"
        )
    )
    got = fn(stacked, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-6)
    # the output (like the stream) must be batch-sharded over data:
    # each device addresses mb/dp = 2 of the 4 microbatch rows
    shard_shapes = {s.data.shape for s in got.addressable_shards}
    assert shard_shapes == {(m, mb // 2, width)}, shard_shapes

    # grads flow through the data-sharded stream too
    def pipe_loss(p):
        return jnp.sum(
            gpipe_spmd(_toy_layer, p, x, mesh=mesh, data_axis="data") ** 2
        )

    def seq_loss(p):
        h = x
        for i in range(layers):
            h = _toy_layer({"w": p["w"][i], "b": p["b"][i]}, h)
        return jnp.sum(h**2)

    with mesh:
        got_g = jax.grad(pipe_loss)(stacked)
    ref_g = jax.grad(seq_loss)(stacked)
    for k in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(got_g[k]), np.asarray(ref_g[k]), atol=1e-5
        )

    # validation: microbatch size not divisible by the data axis
    bad = jnp.zeros((m, 3, width))
    with pytest.raises(ValueError):
        gpipe_spmd(_toy_layer, stacked, bad, mesh=mesh, data_axis="data")


def test_gpipe_grad_matches_sequential():
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("pipe", 4),)))
    rng = np.random.default_rng(1)
    layers, width, m, mb = 4, 4, 4, 2
    stacked = _toy_stack(rng, layers, width)
    x = jnp.asarray(rng.normal(size=(m, mb, width)), jnp.float32)

    def seq_loss(p):
        h = x
        for i in range(layers):
            h = _toy_layer({"w": p["w"][i], "b": p["b"][i]}, h)
        return jnp.sum(h**2)

    def pipe_loss(p):
        return jnp.sum(gpipe_spmd(_toy_layer, p, x, mesh=mesh) ** 2)

    ref_l, ref_g = jax.value_and_grad(seq_loss)(stacked)
    with mesh:
        got_l, got_g = jax.value_and_grad(pipe_loss)(stacked)
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
    for k in ("w", "b"):
        np.testing.assert_allclose(
            np.asarray(got_g[k]), np.asarray(ref_g[k]), atol=1e-5
        )


def test_gpipe_lxmert_lang_layers():
    """Pipeline the real TransformerLayer stack: stack the per-layer
    params of a 4-l_layer Lxmert encoder and run them GPipe-style;
    must equal the sequential stack."""
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("pipe", 4), ("data", 2))))
    cfg = dataclasses.replace(CFG, l_layers=4)
    rng = np.random.default_rng(5)
    n, s = 8, 8
    mb, m = 2, 4  # 4 microbatches of 2
    x = jnp.asarray(rng.normal(size=(n, s, cfg.hidden_size)), jnp.float32)
    mask = jnp.ones((n, s), jnp.float32)

    layer = TransformerLayer(cfg)
    per_layer = [
        layer.init(jax.random.PRNGKey(i), x[:mb], mask[:mb])["params"]
        for i in range(cfg.l_layers)
    ]
    params = {f"layer_{i}": p for i, p in enumerate(per_layer)}
    stacked = stack_layer_params(params, "layer_", cfg.l_layers)
    # roundtrip sanity
    rt = unstack_layer_params(stacked, "layer_", cfg.l_layers)
    ref_leaf = per_layer[2]["att"]["query"]["kernel"]
    np.testing.assert_array_equal(
        np.asarray(rt["layer_2"]["att"]["query"]["kernel"]),
        np.asarray(ref_leaf),
    )

    ref = x
    for i in range(cfg.l_layers):
        ref = layer.apply({"params": per_layer[i]}, ref, mask)

    def layer_fn(p, xm):
        h, mk = xm
        return layer.apply({"params": p}, h, mk), mk

    xm = (x.reshape(m, mb, s, cfg.hidden_size), mask.reshape(m, mb, s))
    out, _ = gpipe_spmd(layer_fn, stacked, xm, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(out.reshape(n, s, cfg.hidden_size)),
        np.asarray(ref),
        atol=1e-5,
    )


def test_gpipe_validations():
    _need_devices(8)
    mesh = make_mesh(MeshConfig(axes=(("pipe", 4),)))
    stacked = {"w": jnp.zeros((6, 2, 2))}  # 6 layers, 4 stages
    x = jnp.zeros((2, 2, 2))
    with pytest.raises(ValueError):
        gpipe_spmd(_toy_layer, stacked, x, mesh=mesh)
    no_axis = make_mesh(MeshConfig(axes=(("data", 8),)))
    with pytest.raises(ValueError):
        gpipe_spmd(_toy_layer, {"w": jnp.zeros((4, 2, 2))}, x, mesh=no_axis)
