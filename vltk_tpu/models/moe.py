"""Mixture-of-Experts FFN with expert parallelism (SURVEY §5.8).

The reference framework has no MoE and no expert parallelism — its
modeling layer ends at the single-GPU FRCNN (reference:
vltk/modeling/frcnn.py) and its distributed story is torch DataParallel
at best (reference: vltk/abc/simple.py:576-682). This module supplies
the ``ep`` leg of the framework's tp/pp/dp/sp/ep sharding matrix: a
drop-in MoE replacement for the dense BERT FFN (models/lxmert.py:
FeedForward), built the TPU way:

* **Static shapes end-to-end** (GShard dense-einsum dispatch,
  arXiv 2006.16668): routing is expressed as fixed-size one-hot
  dispatch/combine tensors ``(T, E, C)`` — no gather/scatter with
  data-dependent sizes, so the whole layer jits once and tiles onto
  the MXU. Tokens beyond an expert's static capacity ``C`` are
  dropped (contribute zero; the post-LN residual still carries them).
* **Expert parallelism over the ``expert`` mesh axis**: the stacked
  expert kernels ``(E, h, f)`` shard their leading dim over ``expert``
  (parallel/sharding.py:LXMERT_MOE_RULES) and the dispatched
  activations ``(E, C, h)`` are constrained likewise, so XLA lowers
  the dispatch/combine einsums to all-to-alls over ICI and each device
  runs only its E/ep experts. Composes with the Megatron TP rules
  (each expert's FFN is column/row-sharded over ``model``).
* **Top-k routing with a Switch-style load-balance aux loss**
  (arXiv 2101.03961 eq. 4), sown into the ``"losses"`` collection so
  training reads it with ``mutable=["losses"]`` and inference ignores
  it for free.

Numerics: router softmax and the combine weights are f32 regardless of
compute dtype; the expert matmuls run in ``cfg.compute_dtype`` (bf16 on
the MXU), matching the dense FFN's policy.
"""

from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


def moe_capacity(tokens: int, num_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Static per-expert token capacity: ``ceil(k*T/E * factor)``,
    rounded up to a multiple of 8 so the (E, C, h) block keeps full
    sublanes on TPU."""
    cap = math.ceil(top_k * tokens / num_experts * capacity_factor)
    return max(8, ((cap + 7) // 8) * 8)


def top_k_routing(router_probs: jnp.ndarray, top_k: int, capacity: int):
    """GShard-style static dispatch plan from router probabilities.

    Args:
      router_probs: (T, E) f32 softmax outputs.
      top_k: experts per token (1 = Switch, 2 = GShard default).
      capacity: static per-expert slot count C.

    Returns:
      dispatch: (T, E, C) f32 0/1 — token t occupies slot c of expert e.
      combine:  (T, E, C) f32 — dispatch scaled by the (renormalized)
        router weight, so ``einsum('tec,ech->th', combine, expert_out)``
        is the weighted mixture.
      fraction: (E,) f32 fraction of tokens whose *first* choice was e
        (the load-balance statistic).
    """
    t, e = router_probs.shape
    probs = router_probs
    dispatch_parts = []
    weight_parts = []
    # slots already used per expert by earlier choices (T->E cumulative)
    used = jnp.zeros((e,), jnp.int32)
    first_choice = None
    masked = probs
    for k in range(top_k):
        idx = jnp.argmax(masked, axis=-1)                      # (T,)
        if k == 0:
            first_choice = idx
        onehot = jax.nn.one_hot(idx, e, dtype=jnp.float32)     # (T, E)
        gate = jnp.sum(probs * onehot, axis=-1)                # (T,)
        # position of each token within its chosen expert's queue,
        # offset by slots consumed in earlier k-rounds
        pos = jnp.cumsum(onehot, axis=0) - onehot              # (T, E)
        pos_in_expert = jnp.sum(pos * onehot, axis=-1) + jnp.sum(
            used[None, :].astype(jnp.float32) * onehot, axis=-1
        )                                                      # (T,)
        fits = pos_in_expert < capacity
        slot = jax.nn.one_hot(
            jnp.where(fits, pos_in_expert, capacity).astype(jnp.int32),
            capacity + 1, dtype=jnp.float32,
        )[..., :capacity]                                      # (T, C)
        dispatch_parts.append(onehot[:, :, None] * slot[:, None, :])
        weight_parts.append(gate)
        used = used + jnp.sum(onehot, axis=0).astype(jnp.int32)
        masked = jnp.where(onehot > 0, -jnp.inf, masked)
    dispatch = sum(dispatch_parts)                             # (T, E, C)
    # renormalize the kept gates so the k weights sum to 1 per token
    # (tokens whose choice overflowed keep weight 0 for that expert)
    kept = [jnp.sum(d, axis=(1, 2)) for d in dispatch_parts]   # (T,) each
    denom = sum(w * kp for w, kp in zip(weight_parts, kept))
    denom = jnp.maximum(denom, 1e-9)
    combine = sum(
        (w / denom)[:, None, None] * d
        for w, d in zip(weight_parts, dispatch_parts)
    )
    fraction = jnp.mean(
        jax.nn.one_hot(first_choice, e, dtype=jnp.float32), axis=0
    )
    return dispatch, combine, fraction


class MoEFeedForward(nn.Module):
    """Post-LN residual MoE block: drop-in for models/lxmert.py:FeedForward.

    ``cfg`` is an ``LxmertConfig`` with ``moe_experts > 0``. Expert
    kernels are stacked on a leading (E,) dim so the ``expert`` mesh
    axis shards them (LXMERT_MOE_RULES); the load-balance aux loss is
    sown into the ``"losses"`` collection under ``"moe_aux"``.
    """

    cfg: object  # LxmertConfig (typed loosely to avoid a circular import)

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        from vltk_tpu.models.lxmert import _constrain, _dense_init

        cfg = self.cfg
        dt = cfg.compute_dtype
        n, s, h = x.shape
        e, k = cfg.moe_experts, cfg.moe_top_k
        f = cfg.intermediate_size
        tokens = n * s
        cap = moe_capacity(tokens, e, k, cfg.moe_capacity_factor)

        xt = x.reshape(tokens, h)
        # router in f32 — tiny matmul, precision matters for argmax ties
        logits = nn.Dense(
            e, kernel_init=_dense_init(cfg), dtype=jnp.float32, name="router"
        )(xt.astype(jnp.float32))
        probs = jax.nn.softmax(logits, axis=-1)
        dispatch, combine, fraction = top_k_routing(probs, k, cap)

        # Switch aux loss: E * sum_e(load_fraction_e * mean_prob_e)
        aux = e * jnp.sum(fraction * jnp.mean(probs, axis=0))
        self.sow(
            "losses", "moe_aux",
            cfg.moe_aux_loss_weight * aux,
            reduce_fn=lambda a, b: a + b, init_fn=lambda: jnp.float32(0.0),
        )

        init = _dense_init(cfg)
        wi = self.param("wi", init, (e, h, f))
        bi = self.param("bi", nn.initializers.zeros, (e, f))
        wo = self.param("wo", init, (e, f, h))
        bo = self.param("bo", nn.initializers.zeros, (e, h))

        # dispatch -> (E, C, h): XLA lowers this to an all-to-all over the
        # expert axis when xt is data-sharded and wi is expert-sharded
        xe = jnp.einsum("tec,th->ech", dispatch.astype(dt), xt.astype(dt))
        xe = _constrain(xe, cfg, ("expert", None, None))
        y = jnp.einsum("ech,ehf->ecf", xe, wi.astype(dt)) + bi[:, None, :].astype(dt)
        y = nn.gelu(y, approximate=False)
        y = jnp.einsum("ecf,efh->ech", y, wo.astype(dt)) + bo[:, None, :].astype(dt)
        y = _constrain(y, cfg, ("expert", None, None))
        # combine in f32: the mixture weights are f32 and dropped tokens
        # must come back exactly zero
        yt = jnp.einsum(
            "tec,ech->th", combine, y.astype(jnp.float32)
        ).astype(dt)
        y = yt.reshape(n, s, h)
        y = nn.Dropout(cfg.hidden_dropout, name="drop")(
            y, deterministic=deterministic
        )
        return nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln"
        )(x + y)
