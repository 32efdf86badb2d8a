"""Ring attention over the ``seq`` mesh axis (SURVEY §5.7).

The second sequence-parallel backend next to Ulysses head-sharding
(models/lxmert.py:MultiHeadAttention). The reference has no sequence
parallelism at all — it truncates long OCR streams at 512 tokens
(reference: vltk/configs.py:113-114, vltk/utils/adapters.py:393-396);
§5.7 names both backends ("Ulysses-style head-sharding or ring
attention over ICI") and this file supplies the second.

Why a second backend: Ulysses re-lays activations out head-sharded, so
its sequence-parallel degree is capped by ``num_heads // tp`` and every
layer pays two all-to-alls. Ring attention keeps queries sequence-
sharded and *rotates the K/V shards around the ring* (`lax.ppermute`
over ICI neighbours — blockwise/ring attention, arXiv 2310.01889), so:

* the seq axis can grow past the head count (a 12-head model can run
  seq=64-way),
* per-device attention memory is O(S/sp * S/sp) per step instead of
  O(S * S/sp),
* the collective is a neighbour ``collective-permute`` — the cheapest
  pattern ICI has — and XLA can overlap it with the per-block matmuls.

Numerics: the softmax is computed *online* (running row-max ``m``,
normalizer ``l``, unnormalized accumulator ``o`` — the flash-attention
recurrence) in f32 regardless of compute dtype, so the result matches
dense attention up to reduction-order rounding. Attention dropout is
supported blockwise (keyed by the global (q-shard, kv-shard) pair plus
the data/model shard indices, so every logical score position on every
shard gets an independent, reproducible draw);
it is *valid* dropout but not bit-identical to the dense path's single
full-matrix draw — parity tests run deterministic.

Autodiff: the scan-over-ring is reverse-differentiable as-is
(``ppermute``'s transpose is the inverted permutation); the saved scan
carries hold one K/V shard per ring step, i.e. the backward's KV
footprint is the full sequence per device — the same O(S) the Ulysses
backward holds, so ring's *forward* memory win is what it adds.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

NEG_INF = -10000.0  # additive-mask value; matches models/lxmert.py


def ring_self_attention(
    q,
    k,
    v,
    mask,
    *,
    mesh: Mesh,
    seq_axis: str = "seq",
    data_axis: str = "data",
    model_axis: str = "model",
    dropout_rate: float = 0.0,
    dropout_rng=None,
    compute_dtype=jnp.float32,
):
    """Full (bidirectional) self-attention, sequence-sharded via a ring.

    Args:
      q, k, v: ``(n, s, nh, dh)`` global arrays; ``s`` must divide the
        ``seq_axis`` mesh size.
      mask: ``(n, s)`` float key-validity mask (1=attend, 0=pad) or None.
      mesh: the physical/abstract mesh to shard_map over; axes named by
        ``data_axis``/``model_axis`` are used only if the mesh has them.
      dropout_rate/dropout_rng: blockwise attention dropout (see module
        docstring); rng required when rate > 0.
      compute_dtype: dtype of the two block matmuls (scores and p@v);
        the softmax state is always f32.

    Returns ``(n, s, nh, dh)`` attention output in ``compute_dtype``,
    sequence-sharded like ``q``.
    """
    n, s, nh, dh = q.shape
    axes = mesh.axis_names
    if seq_axis not in axes:
        raise ValueError(f"mesh {axes} has no {seq_axis!r} axis")
    sp = mesh.shape[seq_axis]
    if s % sp != 0:
        raise ValueError(f"seq len {s} not divisible by {seq_axis}={sp}")
    da = data_axis if data_axis in axes else None
    ma = model_axis if model_axis in axes else None
    if dropout_rate > 0.0 and dropout_rng is None:
        raise ValueError("dropout_rate > 0 needs dropout_rng")
    if mask is None:
        mask = jnp.ones((n, s), jnp.float32)
    # dummy replicated key when dropout is off keeps one shard_map arity
    rng = dropout_rng if dropout_rng is not None else jax.random.PRNGKey(0)

    spec_qkv = P(da, seq_axis, ma, None)
    scale = 1.0 / float(dh) ** 0.5
    perm = [(i, (i + 1) % sp) for i in range(sp)]

    def shard_fn(qb, kb, vb, mb, key):
        # local blocks: qb (nl, sq, nhl, dh); kb/vb (nl, sk, nhl, dh)
        my = jax.lax.axis_index(seq_axis)
        if dropout_rate > 0.0:
            # distinct draws per data/model shard too: the mask tensor only
            # spans the *local* (nl, nhl, ...) dims, so without this fold
            # examples on different data shards (and head groups on
            # different model shards) would share bit-identical masks
            for ax in (da, ma):
                if ax is not None:
                    key = jax.random.fold_in(key, jax.lax.axis_index(ax))
        nl, sq, nhl, _ = qb.shape
        qb = qb.astype(compute_dtype)
        m0 = jnp.full((nl, nhl, sq), -jnp.inf, jnp.float32)
        l0 = jnp.zeros((nl, nhl, sq), jnp.float32)
        o0 = jnp.zeros((nl, nhl, sq, dh), jnp.float32)

        def body(carry, step):
            kc, vc, mc, m, l, o = carry
            sc = jnp.einsum(
                "nqhd,nkhd->nhqk", qb, kc.astype(compute_dtype)
            ).astype(jnp.float32) * scale
            sc = sc + (1.0 - mc.astype(jnp.float32))[:, None, None, :] * NEG_INF
            m_new = jnp.maximum(m, sc.max(axis=-1))
            p = jnp.exp(sc - m_new[..., None])
            corr = jnp.exp(m - m_new)
            l_new = l * corr + p.sum(axis=-1)
            if dropout_rate > 0.0:
                # the kv block at ring step t came from shard (my - t) % sp:
                # key the draw by the global (q-shard, kv-shard) pair so the
                # mask for each logical score position is draw-independent
                # of the ring schedule
                src = (my - step) % sp
                kd = jax.random.fold_in(jax.random.fold_in(key, my), src)
                keep = jax.random.bernoulli(kd, 1.0 - dropout_rate, p.shape)
                p_av = jnp.where(keep, p / (1.0 - dropout_rate), 0.0)
            else:
                p_av = p
            o_new = o * corr[..., None] + jnp.einsum(
                "nhqk,nkhd->nhqd",
                p_av.astype(compute_dtype),
                vc.astype(compute_dtype),
            ).astype(jnp.float32)
            kc = jax.lax.ppermute(kc, seq_axis, perm)
            vc = jax.lax.ppermute(vc, seq_axis, perm)
            mc = jax.lax.ppermute(mc, seq_axis, perm)
            return (kc, vc, mc, m_new, l_new, o_new), None

        (_, _, _, _, l, o), _ = jax.lax.scan(
            body, (kb, vb, mb, m0, l0, o0), jnp.arange(sp)
        )
        out = (o / l[..., None]).astype(compute_dtype)  # (nl, nhl, sq, dh)
        return jnp.transpose(out, (0, 2, 1, 3))  # (nl, sq, nhl, dh)

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(spec_qkv, spec_qkv, spec_qkv, P(da, seq_axis), P()),
        out_specs=spec_qkv,
        check_vma=False,
    )
    return fn(q, k, v, mask, rng)
