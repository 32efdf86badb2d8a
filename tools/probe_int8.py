#!/usr/bin/env python
"""int8 MXU probe: does XLA map int8 convs to the v5e 2x-rate MXU path?

v5e lists ~394 TOPS int8 vs ~197 TFLOP/s bf16. res5 dominates the parity
extraction step (bf16 measured ~96% MXU, probe_res5.py), so the only
remaining single-chip compute lever is a lower-precision MXU mode. This
probe times the res5 bottleneck conv stack (1x1 1024->512, 3x3 d2
512->512, 1x1 512->2048, the C4-head shapes at roi_chunk RoIs) in:

  - bf16 (the shipped preset numerics)
  - int8 inputs + int8 weights, preferred_element_type=int32 (AQT-style
    quantized compute; rescale modeled by one f32 multiply per conv)

If int8 lands near 2x, a quantized-res5 preset is worth building and
Pareto-scoring with bench.py --preset-drift. In-jit fori protocol per
CLAUDE.md (axon tunnel: never trust per-call timings).
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

jax.config.update("jax_compilation_cache_dir", "/root/.cache/vltk_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

DIMS = lax.conv_dimension_numbers((1, 14, 14, 1), (3, 3, 1, 1), ("NHWC", "HWIO", "NHWC"))


def conv(x, w, dilation=(1, 1), pad="SAME", prefer=None):
    return lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding=pad,
        rhs_dilation=dilation, dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=prefer,
    )


def stack_bf16(x, ws):
    w1, w2, w3 = ws
    h = conv(x, w1)
    h = conv(h, w2, dilation=(2, 2))
    return conv(h, w3)


def stack_int8(x, ws):
    # int8 compute with int32 accumulation; one f32 scale per conv models
    # the AQT dequant (cost is negligible vs the matmul).
    w1, w2, w3 = ws
    s = jnp.float32(1 / 127.0)

    def q(v):
        return jnp.clip(jnp.round(v * 16.0), -127, 127).astype(jnp.int8)

    h = conv(x, w1, prefer=jnp.int32).astype(jnp.float32) * s
    h = conv(q(h), w2, dilation=(2, 2), prefer=jnp.int32).astype(jnp.float32) * s
    h = conv(q(h), w3, prefer=jnp.int32).astype(jnp.float32) * s
    return h


def timed(fn, x, ws, iters=200):
    @jax.jit
    def loop(x, ws, n):
        def body(i, acc):
            if x.dtype == jnp.int8:
                xi = x + (i % 2).astype(jnp.int8)
            else:
                xi = x + i * jnp.asarray(1e-9, x.dtype)
            out = fn(xi, ws)
            return acc + jnp.sum(out[0, 0, 0, :4].astype(jnp.float32))

        return lax.fori_loop(0, n, body, 0.0)

    float(loop(x, ws, jnp.asarray(1)))
    t0 = time.perf_counter(); float(loop(x, ws, jnp.asarray(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(loop(x, ws, jnp.asarray(iters)))
    tk = time.perf_counter() - t0
    return (tk - t1) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=2400)
    args = ap.parse_args()
    n = args.rois
    rng = np.random.default_rng(0)

    shapes = [(1, 1, 1024, 512), (3, 3, 512, 512), (1, 1, 512, 2048)]
    x = jnp.asarray(rng.standard_normal((n, 14, 14, 1024)) * 0.05, jnp.bfloat16)
    ws_bf = tuple(jnp.asarray(rng.standard_normal(s) * 0.05, jnp.bfloat16) for s in shapes)
    xi8 = jnp.asarray(rng.integers(-127, 128, (n, 14, 14, 1024)), jnp.int8)
    ws_i8 = tuple(jnp.asarray(rng.integers(-127, 128, s), jnp.int8) for s in shapes)

    # FLOPs for one bottleneck conv stack at n RoIs of 14x14
    flops = 2 * n * 14 * 14 * (1024 * 512 + 9 * 512 * 512 + 512 * 2048)

    for rep in range(2):  # tunnel variance: report twice
        t_bf = timed(stack_bf16, x, ws_bf)
        print(f"bf16 stack:  {t_bf*1e3:8.2f} ms  {flops/t_bf/1e12:6.1f} TFLOP/s")
        t_i8 = timed(stack_int8, xi8, ws_i8)
        print(f"int8 stack:  {t_i8*1e3:8.2f} ms  {flops/t_i8/1e12:6.1f} TOP/s  (x{t_bf/t_i8:.2f} vs bf16)")


if __name__ == "__main__":
    main()
