#!/usr/bin/env python
"""Bytes-based speed-of-light (roofline) per extraction stage on TPU.

VERDICT r4 task 1: the two sub-53%-MXU stages of the parity extraction
step — stem+res2-4 (52.6% MXU) and RPN head+propose (17.6%) — carried a
"lane-starved / formulation-bound" claim resting on one failed
alternative. This probe computes the roofline bound per (sub)stage the
way tools/probe_roipool_ablation.py cracked the RoIPool "floor":

  t_sol = max(FLOPs / MXU_peak, bytes / HBM_BW)

with FLOPs and bytes taken from the COMPILED executable's own cost
analysis (post-fusion), and the measured time from the in-jit fori
protocol (CLAUDE.md — never trust per-call timings over the tunnel).
A stage running at >=~80% of its roofline is bound by physics at this
formulation's byte/FLOP footprint — further gains need a formulation
that moves fewer bytes, not scheduling. A stage well under its roofline
has harvestable headroom.

Substage split: stem / res2 / res3 / res4 individually (is the 52.6%
blend hiding one bad stage?), and rpn_head convs vs propose
(decode+topk+NMS) separately.

v5e single-chip peaks: 197 TFLOP/s bf16 MXU, 819 GB/s HBM.

Usage: python tools/probe_roofline.py [--batch 16] [--iters 12]
"""

import argparse
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/vltk_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

V5E_BF16_PEAK = 197e12  # FLOP/s
V5E_HBM_BW = 819e9      # B/s


def stage_cost(fn, args_):
    """(flops, bytes accessed) from the compiled executable's cost
    analysis. Post-fusion, so bytes reflect what the schedule actually
    reads/writes per HLO — an estimate (XLA counts operand bytes per op,
    so a value both produced and consumed on-chip may still be counted),
    which makes t_hbm an UPPER bound and %SOL conservative."""
    try:
        cost = jax.jit(fn).lower(*args_).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        return (
            float(cost.get("flops", 0.0)),
            float(cost.get("bytes accessed", 0.0)),
        )
    except Exception:
        return 0.0, 0.0


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
            return acc + jnp.sum(
                leaf[(0,) * (leaf.ndim - 1)][:1].astype(jnp.float32)
            )

        return jax.lax.fori_loop(0, n, body, 0.0)

    float(loop(args_, jnp.asarray(1)))
    t0 = time.perf_counter(); float(loop(args_, jnp.asarray(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(loop(args_, jnp.asarray(iters)))
    tk = time.perf_counter() - t0
    return (tk - t1) / (iters - 1)


def report(name, dt, fl, by, rows):
    t_mxu = fl / V5E_BF16_PEAK
    t_hbm = by / V5E_HBM_BW
    sol = max(t_mxu, t_hbm)
    bound = "MXU" if t_mxu >= t_hbm else "HBM"
    pct = sol / dt * 100 if dt > 0 else 0.0
    row = {
        "stage": name,
        "ms": round(dt * 1e3, 2),
        "tflop": round(fl / 1e12, 2),
        "gb": round(by / 1e9, 2),
        "mxu_pct": round(fl / dt / V5E_BF16_PEAK * 100, 1) if dt else 0.0,
        "hbm_gbps": round(by / dt / 1e9, 1) if dt else 0.0,
        "sol_ms": round(sol * 1e3, 2),
        "sol_bound": bound,
        "pct_of_sol": round(pct, 1),
    }
    rows.append(row)
    print(
        f"{name:22s}: {row['ms']:8.2f} ms  {row['tflop']:6.2f} TF "
        f"{row['gb']:6.2f} GB  mxu {row['mxu_pct']:5.1f}%  "
        f"hbm {row['hbm_gbps']:6.1f} GB/s  SOL {row['sol_ms']:7.2f} ms "
        f"({bound})  -> {row['pct_of_sol']:5.1f}% of SOL"
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    from vltk_tpu.models import FRCNN, FRCNNConfig
    from vltk_tpu.models.anchors import grid_anchors
    from vltk_tpu.models.backbone import BasicStem, ResNetC4, ResStage
    from vltk_tpu.models.rpn import RPNHead, propose
    from vltk_tpu.ops.image_ops import preprocess_batch

    cfg = FRCNNConfig(post_nms_topk=300, dtype="bfloat16")
    model = FRCNN(cfg=cfg)
    b = args.batch
    canvas, short, maximum, raw_hw = (832, 1344), 800.0, 1333.0, (480, 640)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(rng.integers(0, 256, (b, 512, 672, 3)).astype(np.uint8))
    raw_sizes = jnp.asarray([raw_hw] * b, jnp.int32)
    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *canvas, 3), jnp.float32),
        jnp.asarray([[float(canvas[0]), float(canvas[1])]]),
    )["params"]
    dtype = cfg.compute_dtype
    bb = params["backbone"]

    pre = jax.jit(
        lambda r, s: preprocess_batch(
            r, s, canvas_hw=canvas, short=short, maximum=maximum
        )
    )(raw, raw_sizes)
    images, sizes, scales = pre["img"], pre["sizes"], pre["scales_yx"]

    # submodules with the full model's params (same names by design)
    stem = BasicStem(
        cfg.stem_out_channels, caffe_maxpool=cfg.caffe_maxpool, dtype=dtype
    )
    blocks = {101: [3, 4, 23, 3]}[cfg.depth]
    stages = {}
    out_ch, bneck = cfg.res2_out_channels, cfg.num_groups * cfg.width_per_group
    for idx, si in enumerate((2, 3, 4)):
        stages[si] = ResStage(
            num_blocks=blocks[idx], out_channels=out_ch,
            bottleneck_channels=bneck,
            first_stride=1 if idx == 0 else 2,
            num_groups=cfg.num_groups, stride_in_1x1=cfg.stride_in_1x1,
            dtype=dtype,
        )
        out_ch *= 2
        bneck *= 2

    x_stem = jax.jit(lambda x: stem.apply({"params": bb["stem"]}, x))(images)
    x2 = jax.jit(lambda x: stages[2].apply({"params": bb["res2"]}, x))(x_stem)
    x3 = jax.jit(lambda x: stages[3].apply({"params": bb["res3"]}, x))(x2)

    backbone = ResNetC4(
        depth=cfg.depth, stem_out_channels=cfg.stem_out_channels,
        res2_out_channels=cfg.res2_out_channels, num_groups=cfg.num_groups,
        width_per_group=cfg.width_per_group, stride_in_1x1=cfg.stride_in_1x1,
        caffe_maxpool=cfg.caffe_maxpool, dtype=dtype,
    )
    feats = jax.jit(
        lambda x: backbone.apply({"params": bb}, x)
    )(images)

    rpn = RPNHead(
        num_anchors=cfg.num_anchors, hidden_channels=cfg.rpn_hidden_channels
    )
    rpn_params = {"params": params["rpn_head"]}
    logits, deltas = jax.jit(lambda f: rpn.apply(rpn_params, f))(feats)
    anchors = grid_anchors(
        (feats.shape[1], feats.shape[2]), stride=cfg.feature_stride,
        sizes=cfg.anchor_sizes, aspect_ratios=cfg.aspect_ratios,
        offset=cfg.anchor_offset,
    )

    def run_propose(lg, dl):
        return propose(
            lg.astype(jnp.float32), dl.astype(jnp.float32), anchors, sizes,
            nms_thresh=cfg.rpn_nms_thresh, pre_nms_topk=cfg.pre_nms_topk,
            post_nms_topk=cfg.post_nms_topk,
            min_box_side_len=cfg.min_box_side_len,
            bbox_reg_weights=cfg.rpn_bbox_reg_weights,
            ignorey=None, scales_yx=scales,
        )

    probes = [
        ("stem", lambda x: stem.apply({"params": bb["stem"]}, x), (images,)),
        ("res2", lambda x: stages[2].apply({"params": bb["res2"]}, x), (x_stem,)),
        ("res3", lambda x: stages[3].apply({"params": bb["res3"]}, x), (x2,)),
        ("res4", lambda x: stages[4].apply({"params": bb["res4"]}, x), (x3,)),
        ("backbone(total)", lambda x: backbone.apply({"params": bb}, x), (images,)),
        ("rpn_head", lambda f: rpn.apply(rpn_params, f), (feats,)),
        ("propose", run_propose, (logits, deltas)),
        ("rpn_head+propose", lambda f: run_propose(*rpn.apply(rpn_params, f)), (feats,)),
    ]

    rows = []
    print(f"batch={b}, canvas={canvas}, dtype={cfg.dtype}")
    for name, fn, a in probes:
        dt = timed(fn, a, iters=args.iters)
        fl, by = stage_cost(fn, a)
        report(name, dt, fl, by, rows)
    print(json.dumps({"metric": "roofline_stages", "batch": b,
                      "rows": rows, "vs_baseline": 0}))


if __name__ == "__main__":
    main()
