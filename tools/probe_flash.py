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
    main()
