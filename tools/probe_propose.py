#!/usr/bin/env python
"""Decompose the RPN `propose` stage (the one stage the r5 roofline left
open: 14.78 ms at B=16, 0 FLOPs, 65.7% of its HBM SOL — BASELINE.md
roofline table) and race exact NMS variants at RPN geometry.

Hypothesis under test: the cost is not bandwidth but the 300 sequential
scan iterations of `nms_fixed` (each a tiny argmax + one IoU row; TPU
loop overhead dominates arithmetic at this size). Variants, all exact
greedy NMS (parity: tests/test_ops.py::test_blocked_and_unrolled_match_scan):

  * scan            — the shipped `nms_fixed` (300 iterations)
  * scan unroll=u   — same algorithm, 300/u loop iterations
  * blocked m       — `nms_fixed_blocked`: top-m live prefix per step,
                      in-block unrolled greedy (data-dependent trip count,
                      typically 300/m_eff steps)

Timing: in-jit fori protocol (CLAUDE.md — never trust per-call timings
over the axon tunnel). Box distribution matters for the blocked variant's
trip count, so NMS variants run on BOTH uniform-random boxes (optimistic:
little overlap) and clustered boxes (proposals concentrated on ~12
object centers — the realistic RPN case).

Usage: python tools/probe_propose.py [--batch 16]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/vltk_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def timed(fn, args_, iters=12):
    @jax.jit
    def loop(args_, n):
        def body(i, acc):
            eps = i * jnp.asarray(1e-9, jnp.float32)
            out = fn(*[
                a + eps.astype(a.dtype)
                if jnp.issubdtype(a.dtype, jnp.floating) else a
                for a in args_
            ])
            leaf = jax.tree_util.tree_leaves(out)[0]
            flat = leaf.reshape(-1)[:1].astype(jnp.float32)
            return acc + jnp.sum(flat)

        return jax.lax.fori_loop(0, n, body, 0.0)

    float(loop(args_, jnp.asarray(1)))
    t0 = time.perf_counter(); float(loop(args_, jnp.asarray(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(loop(args_, jnp.asarray(iters)))
    tk = time.perf_counter() - t0
    return (tk - t1) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=12)
    ap.add_argument(
        "--parity", action="store_true",
        help="instead of timing, run propose() on-device under every NMS "
             "execution strategy and assert bit-identical boxes/scores/"
             "valid (guards against TPU-side miscompiles of the "
             "while_loop/unroll variants; the CPU tests already pin "
             "algorithmic parity)",
    )
    args = ap.parse_args()
    b = args.batch

    from vltk_tpu.models import FRCNNConfig
    from vltk_tpu.models.anchors import grid_anchors
    from vltk_tpu.models.rpn import propose
    from vltk_tpu.ops.boxes import apply_deltas, clip_boxes, nonempty_mask
    from vltk_tpu.ops.nms import nms_fixed, nms_fixed_blocked

    cfg = FRCNNConfig(post_nms_topk=300, dtype="bfloat16")
    hf, wf, a = 52, 84, cfg.num_anchors  # 832x1344 canvas / stride 16
    rng = np.random.default_rng(0)
    logits = jnp.asarray(rng.normal(size=(b, hf, wf, a)).astype(np.float32))
    deltas = jnp.asarray(
        (rng.normal(size=(b, hf, wf, a * 4)) * 0.2).astype(np.float32)
    )
    sizes = jnp.asarray([[800.0, 1307.0]] * b, jnp.float32)
    anchors = grid_anchors(
        (hf, wf), stride=cfg.feature_stride, sizes=cfg.anchor_sizes,
        aspect_ratios=cfg.aspect_ratios, offset=cfg.anchor_offset,
    )
    k = cfg.pre_nms_topk
    rows = []

    def rep(name, dt, extra=None):
        row = {"stage": name, "ms": round(dt * 1e3, 2)}
        if extra:
            row.update(extra)
        rows.append(row)
        print(f"{name:34s}: {row['ms']:8.2f} ms")

    # --- full propose (the shipped path) ---
    def full(lg, dl, **kw):
        return propose(
            lg, dl, anchors, sizes, nms_thresh=cfg.rpn_nms_thresh,
            pre_nms_topk=cfg.pre_nms_topk, post_nms_topk=cfg.post_nms_topk,
            min_box_side_len=cfg.min_box_side_len,
            bbox_reg_weights=cfg.rpn_bbox_reg_weights, **kw,
        )

    if args.parity:
        base = [np.asarray(x) for x in jax.jit(full)(logits, deltas)]
        checked = []
        for kw in (dict(nms_unroll=4), dict(nms_block=32),
                   dict(nms_block=64), dict(nms_block=128),
                   dict(nms_block=64, nms_chunk=b // 2),
                   dict(nms_unroll=4, nms_chunk=b // 2)):
            got = jax.jit(lambda lg, dl: full(lg, dl, **kw))(logits, deltas)
            for g, want in zip(got, base):
                np.testing.assert_array_equal(np.asarray(g), want)
            checked.append("+".join(f"{k}={v}" for k, v in kw.items()))
        print(json.dumps({
            "metric": "propose_tpu_parity", "batch": b,
            "value": 1.0, "unit": "bit_identical",
            "variants": checked,
            "platform": jax.devices()[0].platform, "vs_baseline": 0,
        }))
        return

    rep("propose(full)", timed(full, (logits, deltas), args.iters))

    # --- substages ---
    def s_topk(lg):
        return jax.lax.top_k(lg.reshape(b, -1), k)

    rep("top_k(65520->6000)", timed(s_topk, (logits,), args.iters))

    top_scores, top_idx = jax.jit(s_topk)(logits)

    def s_gather_decode(dl, idx):
        fd = dl.reshape(b, -1, 4)
        td = jnp.take_along_axis(fd, idx[..., None], axis=1)
        ta = anchors[idx]
        bx = apply_deltas(td, ta, weights=tuple(cfg.rpn_bbox_reg_weights))
        bx = jax.vmap(clip_boxes)(bx, sizes)
        return bx, jax.vmap(
            lambda B: nonempty_mask(B, threshold=cfg.min_box_side_len)
        )(bx)

    rep("gather+decode+clip", timed(s_gather_decode, (deltas, top_idx), args.iters))
    boxes, valid = jax.jit(s_gather_decode)(deltas, top_idx)

    def final_gather(keep, bx, sc):
        safe = jnp.maximum(keep, 0)
        return jnp.take_along_axis(bx, safe[..., None], axis=1), jnp.take_along_axis(sc, safe, axis=1)

    # --- NMS variants on the decoded boxes (realistic distribution) and on
    # clustered synthetic boxes (worst-ish case for blocked trip count) ---
    centers = rng.uniform(100, 1200, size=(12, 2))
    ci = rng.integers(0, 12, size=k)
    cw = rng.uniform(40, 300, size=(k, 2))
    jit_xy = rng.normal(size=(k, 2)) * 30
    cl = np.stack([
        centers[ci][:, 0] + jit_xy[:, 0] - cw[:, 0] / 2,
        centers[ci][:, 1] + jit_xy[:, 1] - cw[:, 1] / 2,
        centers[ci][:, 0] + jit_xy[:, 0] + cw[:, 0] / 2,
        centers[ci][:, 1] + jit_xy[:, 1] + cw[:, 1] / 2,
    ], axis=1).astype(np.float32)
    cl_boxes = jnp.asarray(np.broadcast_to(cl, (b, k, 4)).copy())
    cl_scores = jnp.asarray(rng.normal(size=(b, k)).astype(np.float32))

    variants = [
        ("nms scan (shipped)", lambda B, S, V: jax.vmap(
            lambda bi, si, vi: nms_fixed(bi, si, cfg.rpn_nms_thresh, cfg.post_nms_topk, vi)
        )(B, S, V)),
        ("nms scan unroll=4", lambda B, S, V: jax.vmap(
            lambda bi, si, vi: nms_fixed(bi, si, cfg.rpn_nms_thresh, cfg.post_nms_topk, vi, unroll=4)
        )(B, S, V)),
        ("nms scan unroll=16", lambda B, S, V: jax.vmap(
            lambda bi, si, vi: nms_fixed(bi, si, cfg.rpn_nms_thresh, cfg.post_nms_topk, vi, unroll=16)
        )(B, S, V)),
        ("nms blocked m=32", lambda B, S, V: jax.vmap(
            lambda bi, si, vi: nms_fixed_blocked(bi, si, cfg.rpn_nms_thresh, cfg.post_nms_topk, vi, block=32)
        )(B, S, V)),
        ("nms blocked m=64", lambda B, S, V: jax.vmap(
            lambda bi, si, vi: nms_fixed_blocked(bi, si, cfg.rpn_nms_thresh, cfg.post_nms_topk, vi, block=64)
        )(B, S, V)),
        ("nms blocked m=128", lambda B, S, V: jax.vmap(
            lambda bi, si, vi: nms_fixed_blocked(bi, si, cfg.rpn_nms_thresh, cfg.post_nms_topk, vi, block=128)
        )(B, S, V)),
    ]
    for dist, (B_, S_, V_) in (
        ("decoded", (boxes, top_scores, valid)),
        ("clustered", (cl_boxes, cl_scores, jnp.ones((b, k), bool))),
    ):
        for name, fn in variants:
            rep(f"{name} [{dist}]", timed(fn, (B_, S_, V_), args.iters))

    print(json.dumps({"metric": "propose_decomposition", "batch": b,
                      "rows": rows, "vs_baseline": 0}))


if __name__ == "__main__":
    main()
