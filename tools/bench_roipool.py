#!/usr/bin/env python
"""RoIPool kernel micro-benchmark (shipped pallas kernel vs XLA path).

Protocol (CLAUDE.md): the axon tunnel makes per-call timings meaningless,
so run K iterations inside one jitted lax.fori_loop, perturb the input by
+ i*1e-9 each iteration so nothing hoists, fetch once, and report
(t_K - t_1) / (K - 1).

Usage: python tools/bench_roipool.py [--b 8] [--p 300] [--iters 20]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/vltk_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)


def timed(fn, feat, boxes, iters):
    @jax.jit
    def loop(feat, boxes, n):
        def body(i, acc):
            out = fn(feat + i * jnp.asarray(1e-9, feat.dtype), boxes)
            return acc + jnp.sum(out[0, 0, 0, 0, :8].astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, 0.0)

    n1 = jnp.asarray(1)
    nk = jnp.asarray(iters)
    float(loop(feat, boxes, n1))  # compile + warm
    t0 = time.perf_counter()
    float(loop(feat, boxes, n1))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter()
    float(loop(feat, boxes, nk))
    tk = time.perf_counter() - t0
    return (tk - t1) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--b", type=int, default=8)
    ap.add_argument("--h", type=int, default=52)
    ap.add_argument("--w", type=int, default=84)
    ap.add_argument("--c", type=int, default=1024)
    ap.add_argument("--p", type=int, default=300)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--cb", type=int, default=0, help="channel_block override")
    ap.add_argument(
        "--kernels", default="pallas", help="comma list from {pallas,xla}"
    )
    args = ap.parse_args()

    from vltk_tpu.ops.pallas_kernels import _roi_pool_xla, roi_pool_pallas

    rng = np.random.default_rng(0)
    feat = jnp.asarray(
        rng.standard_normal((args.b, args.h, args.w, args.c)), jnp.bfloat16
    )
    boxes = np.zeros((args.b, args.p, 4), np.float32)
    boxes[..., 0] = rng.uniform(0, args.w * 16 - 2, (args.b, args.p))
    boxes[..., 1] = rng.uniform(0, args.h * 16 - 2, (args.b, args.p))
    boxes[..., 2] = np.minimum(
        boxes[..., 0] + rng.uniform(1, args.w * 16, (args.b, args.p)),
        args.w * 16 - 1,
    )
    boxes[..., 3] = np.minimum(
        boxes[..., 1] + rng.uniform(1, args.h * 16, (args.b, args.p)),
        args.h * 16 - 1,
    )
    boxes = jnp.asarray(boxes)

    kernels = {
        "pallas": lambda f, b: roi_pool_pallas(
            f, b, 14, 1.0 / 16, channel_block=args.cb
        ),
        "xla": lambda f, b: _roi_pool_xla(f, b, 14, 1.0 / 16),
    }
    for name in args.kernels.split(","):
        dt = timed(kernels[name], feat, boxes, args.iters)
        print(
            f"{name}: {dt*1e3:.2f} ms for ({args.b}, {args.p}) RoIs over "
            f"({args.h}, {args.w}, {args.c}) bf16"
        )


if __name__ == "__main__":
    main()
