"""Probe: Pallas flash attention vs the XLA einsum path, on the real TPU.

Parity (masked positions excluded — see models/lxmert.py:_flash_eligible
for the pad-query semantic difference) and per-call timing at the
LayoutLM serving geometry, using the in-jit fori protocol (CLAUDE.md:
never trust per-call timings over the axon tunnel).
"""

import time

import numpy as np

import jax
import jax.numpy as jnp

from vltk_tpu.models.lxmert import NEG_INF, _flash_self_attention


def xla_attention(q, k, v, mask, dh):
    scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) / jnp.sqrt(
        jnp.asarray(dh, q.dtype)
    )
    if mask is not None:
        bias = (1.0 - mask[:, None, None, :]) * NEG_INF
        scores = scores + bias.astype(scores.dtype)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("nhqk,nkhd->nqhd", probs, v)


def timed(fn, args, iters=30):
    """(t_K - t_1)/(K-1) via two fori lengths, one fetch each."""

    def loop(k):
        @jax.jit
        def run(q, kk, v, m):
            def body(i, acc):
                o = fn(q + i * 1e-9, kk, v, m)
                return acc + o.astype(jnp.float32).mean()

            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        return run

    r1, rk = loop(1), loop(iters)
    float(r1(*args))  # compile+warm both
    float(rk(*args))
    t0 = time.perf_counter()
    float(r1(*args))
    t1 = time.perf_counter()
    float(rk(*args))
    t2 = time.perf_counter()
    return ((t2 - t1) - (t1 - t0)) / (iters - 1) * 1e3


def _uniform_blocks(b: int):
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    return _fa.BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b, block_k_dkv=b,
        block_q_dkv=b, block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
    )


def sweep():
    """Block-size sweep (JSON lines, run()-framework compatible): the
    upstream kernel defaults to 128-blocks everywhere — at dh=64 that is
    a (128, 64)x(64, 128) matmul per grid step, far below MXU-amortizing
    size, and the leading suspect for flash's measured losses. Sweeps
    uniform 128/256/512/1024 blocks at the seq-1024 serving geometry and
    the seq-4096 document geometry, forward AND forward+grad, against
    the XLA path on identical inputs."""
    import json

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/vltk_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    rng = np.random.default_rng(0)
    for n, s, nh, dh in [(32, 1024, 12, 64), (4, 4096, 12, 64)]:
        q = jnp.asarray(rng.normal(size=(n, s, nh, dh)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(n, s, nh, dh)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(n, s, nh, dh)), jnp.bfloat16)
        mask_np = np.ones((n, s), np.float32)
        mask_np[:, int(s * 0.8):] = 0.0
        mask = jnp.asarray(mask_np)
        geom = f"n{n}_s{s}_h{nh}x{dh}"

        def grad_of(attn):
            def loss(q, k, v, m):
                return attn(q, k, v, m).astype(jnp.float32).mean()

            g = jax.grad(loss, argnums=(0, 1, 2))

            return lambda q, k, v, m: g(q, k, v, m)[0]

        t_xla = timed(lambda q, k, v, m: xla_attention(q, k, v, m, dh),
                      (q, k, v, mask))
        t_xla_g = timed(grad_of(
            lambda q, k, v, m: xla_attention(q, k, v, m, dh)
        ), (q, k, v, mask))
        print(json.dumps({
            "metric": "flash_block_sweep", "geom": geom, "impl": "xla",
            "fwd_ms": round(t_xla, 3), "fwd_grad_ms": round(t_xla_g, 3),
        }), flush=True)
        for b in (None, 128, 256, 512, 1024):
            if b is not None and b > s:
                continue
            bs = None if b is None else _uniform_blocks(b)
            label = "default128" if b is None else str(b)
            try:
                fl = lambda q, k, v, m, _bs=bs: _flash_self_attention(  # noqa: E731
                    q, k, v, m, dh, block_sizes=_bs
                )
                t_f = timed(fl, (q, k, v, mask))
                t_f_g = timed(grad_of(fl), (q, k, v, mask))
                print(json.dumps({
                    "metric": "flash_block_sweep", "geom": geom,
                    "impl": f"flash_b{label}",
                    "fwd_ms": round(t_f, 3), "fwd_grad_ms": round(t_f_g, 3),
                    "fwd_speedup_vs_xla": round(t_xla / t_f, 3),
                    "grad_speedup_vs_xla": round(t_xla_g / t_f_g, 3),
                }), flush=True)
            except Exception as e:  # per-config compile failures are data
                print(json.dumps({
                    "metric": "flash_block_sweep", "geom": geom,
                    "impl": f"flash_b{label}", "failed": str(e)[:160],
                }), flush=True)


def _mixed_blocks(fwd: int, bwd: int):
    """Forward blocks pinned at ``fwd``; both backward passes (dkv + dq)
    at ``bwd``."""
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    return _fa.BlockSizes(
        block_q=fwd, block_k_major=fwd, block_k=fwd, block_b=1,
        block_q_major_dkv=bwd, block_k_major_dkv=bwd, block_k_dkv=bwd,
        block_q_dkv=bwd, block_k_major_dq=bwd, block_k_dq=bwd,
        block_q_dq=bwd,
    )


def sweep_bwd():
    """Backward-block sweep: the uniform-1024 sweep left the seq-1024
    GRAD at 0.92x XLA (fwd won at 2.41x) — the backward's two passes
    (dkv, dq) may want a different tile than the forward. Pin the fwd
    blocks at the measured 1024 winner and sweep the bwd blocks."""
    import json

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/vltk_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    rng = np.random.default_rng(0)
    for n, s, nh, dh in [(32, 1024, 12, 64), (4, 4096, 12, 64)]:
        q = jnp.asarray(rng.normal(size=(n, s, nh, dh)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(n, s, nh, dh)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(n, s, nh, dh)), jnp.bfloat16)
        mask_np = np.ones((n, s), np.float32)
        mask_np[:, int(s * 0.8):] = 0.0
        mask = jnp.asarray(mask_np)
        geom = f"n{n}_s{s}_h{nh}x{dh}"

        def grad_of(attn):
            def loss(q, k, v, m):
                return attn(q, k, v, m).astype(jnp.float32).mean()

            g = jax.grad(loss, argnums=(0, 1, 2))
            return lambda q, k, v, m: g(q, k, v, m)[0]

        t_xla_g = timed(grad_of(
            lambda q, k, v, m: xla_attention(q, k, v, m, dh)
        ), (q, k, v, mask))
        print(json.dumps({
            "metric": "flash_bwd_sweep", "geom": geom, "impl": "xla",
            "fwd_grad_ms": round(t_xla_g, 3),
        }), flush=True)
        for bwd in (128, 256, 512, 1024):
            if bwd > s:
                continue
            bs = _mixed_blocks(min(1024, s), bwd)
            try:
                fl = lambda q, k, v, m, _bs=bs: _flash_self_attention(  # noqa: E731
                    q, k, v, m, dh, block_sizes=_bs
                )
                t_f_g = timed(grad_of(fl), (q, k, v, mask))
                print(json.dumps({
                    "metric": "flash_bwd_sweep", "geom": geom,
                    "impl": f"flash_fwd1024_bwd{bwd}",
                    "fwd_grad_ms": round(t_f_g, 3),
                    "grad_speedup_vs_xla": round(t_xla_g / t_f_g, 3),
                }), flush=True)
            except Exception as e:  # per-config compile failures are data
                print(json.dumps({
                    "metric": "flash_bwd_sweep", "geom": geom,
                    "impl": f"flash_fwd1024_bwd{bwd}", "failed": str(e)[:160],
                }), flush=True)


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/.cache/vltk_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    print("backend:", jax.default_backend(), flush=True)
    rng = np.random.default_rng(0)
    for (n, s, nh, dh), dtype in [
        ((8, 256, 4, 64), jnp.bfloat16),
        ((32, 1024, 12, 64), jnp.bfloat16),
    ]:
        q = jnp.asarray(rng.normal(size=(n, s, nh, dh)), dtype)
        k = jnp.asarray(rng.normal(size=(n, s, nh, dh)), dtype)
        v = jnp.asarray(rng.normal(size=(n, s, nh, dh)), dtype)
        mask_np = np.ones((n, s), np.float32)
        mask_np[:, int(s * 0.8):] = 0.0  # 20% pad tail
        mask = jnp.asarray(mask_np)

        ref = jax.jit(lambda q, k, v, m: xla_attention(q, k, v, m, dh))(
            q, k, v, mask
        )
        got = jax.jit(lambda q, k, v, m: _flash_self_attention(q, k, v, m, dh))(
            q, k, v, mask
        )
        real = mask_np.astype(bool)
        diff = np.abs(
            np.asarray(ref, np.float32)[real] - np.asarray(got, np.float32)[real]
        )
        print(
            f"n{n} s{s} h{nh}x{dh} {np.dtype(dtype).name}: "
            f"max|diff| (real positions) = {diff.max():.5f}", flush=True
        )
        t_xla = timed(lambda q, k, v, m: xla_attention(q, k, v, m, dh),
                      (q, k, v, mask))
        t_fl = timed(lambda q, k, v, m: _flash_self_attention(q, k, v, m, dh),
                     (q, k, v, mask))
        print(f"  xla {t_xla:.3f} ms  flash {t_fl:.3f} ms  "
              f"speedup {t_xla / t_fl:.2f}x", flush=True)


if __name__ == "__main__":
    import sys

    if "--sweep-bwd" in sys.argv:
        sweep_bwd()
    elif "--sweep" in sys.argv:
        sweep()
    else:
        main()
