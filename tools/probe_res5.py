#!/usr/bin/env python
"""res5 formulation probe: XLA dilated conv vs 9-shift matmul.

res5 dominates the parity extraction step (163 ms of 279 at B=16, ~87%
MXU). Its conv2 is 3x3 dilation-2 pad-2 on 14x14 — this probe times the
res5 bottleneck stack as shipped (flax ConvNorm -> lax dilated conv)
against an algebraically identical 9-shift formulation (pad to 18x18,
nine 1x1 matmuls accumulated), which XLA sometimes schedules better for
tiny spatial extents. Timing-only (random weights, frozen-norm modeled
as bias). In-jit fori protocol per CLAUDE.md.
"""

import argparse
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
            out = fn(args_[0] + i * jnp.asarray(1e-9, args_[0].dtype), *args_[1:])
            return acc + jnp.sum(out[0, 0, 0, :4].astype(jnp.float32))

        return jax.lax.fori_loop(0, n, body, 0.0)

    float(loop(args_, jnp.asarray(1)))
    t0 = time.perf_counter(); float(loop(args_, jnp.asarray(1)))
    t1 = time.perf_counter() - t0
    t0 = time.perf_counter(); float(loop(args_, jnp.asarray(iters)))
    tk = time.perf_counter() - t0
    return (tk - t1) / (iters - 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rois", type=int, default=2400)
    args = ap.parse_args()

    n = args.rois
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16
    x = jnp.asarray(rng.standard_normal((n, 14, 14, 1024)) * 0.05, dt)

    # --- A: shipped flax res5 (3 bottleneck blocks, dilated conv2) ---
    from vltk_tpu.models.backbone import Res5Head

    head = Res5Head(dtype=jnp.bfloat16)
    params = head.init(jax.random.PRNGKey(0), x[:8].astype(jnp.float32))

    dtA = timed(lambda xx: head.apply(params, xx), (x,))
    print(f"flax dilated res5: {dtA*1e3:.2f} ms for {n} RoIs")

    # --- B: 9-shift matmul formulation (identical FLOPs/structure) ---
    def make_w(cin, cout, k=None):
        if k:
            return jnp.asarray(rng.standard_normal((k, cin, cout)) * 0.02, dt)
        return jnp.asarray(rng.standard_normal((cin, cout)) * 0.02, dt)

    blocks = []
    cin = 1024
    for bi in range(3):
        blocks.append(
            {
                "w1": make_w(cin, 512),
                "w2": make_w(512, 512, k=9),
                "w3": make_w(512, 2048),
                "ws": make_w(cin, 2048) if cin != 2048 else None,
            }
        )
        cin = 2048

    shifts = [(dy, dx) for dy in (-2, 0, 2) for dx in (-2, 0, 2)]

    def conv2_9shift(h, w9):
        # h (n, 14, 14, 512); pad 2 each side, nine shifted 1x1 matmuls
        hp = jnp.pad(h, ((0, 0), (2, 2), (2, 2), (0, 0)))
        out = None
        for k, (dy, dx) in enumerate(shifts):
            sl = hp[:, 2 + dy : 16 + dy, 2 + dx : 16 + dx, :]
            t = jnp.einsum("nhwc,cd->nhwd", sl, w9[k])
            out = t if out is None else out + t
        return out

    def res5_9shift(xx):
        h = xx
        for blk in blocks:
            y = jax.nn.relu(jnp.einsum("nhwc,cd->nhwd", h, blk["w1"]))
            y = jax.nn.relu(conv2_9shift(y, blk["w2"]))
            y = jnp.einsum("nhwc,cd->nhwd", y, blk["w3"])
            s = (
                jnp.einsum("nhwc,cd->nhwd", h, blk["ws"])
                if blk["ws"] is not None
                else h
            )
            h = jax.nn.relu(y + s)
        return h

    dtB = timed(res5_9shift, (x,))
    print(f"9-shift matmul res5: {dtB*1e3:.2f} ms for {n} RoIs")


if __name__ == "__main__":
    main()
