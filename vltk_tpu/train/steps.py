"""Jitted train/eval step builders over an optional device mesh.

The reference's step is imperative (scaler.scale(loss).backward -> clip ->
optim.step -> scheduler.step, vltk/abc/simple.py:665-682). Here it is one
compiled XLA program: value_and_grad + optax update, with the train state
donated so parameters update in place in HBM. Under a mesh, shardings
propagate from the committed inputs (params placed by
parallel.shard_params, batch by parallel.shard_batch) and XLA inserts the
DP gradient psum / TP collectives.
"""

from __future__ import annotations

from typing import Callable

import jax
from flax.training import train_state


class TrainState(train_state.TrainState):
    """flax TrainState (params, opt_state, step, apply_fn, tx)."""


def create_state(
    apply_fn, params, tx, mesh=None, rules=None, zero1_axis=None
) -> TrainState:
    """Build a TrainState; under a mesh, params are placed by ``rules`` and
    the optimizer state inherits their shardings through jit propagation.

    ``zero1_axis`` (e.g. ``"data"``) additionally shards every optimizer
    moment over that mesh axis — ZeRO stage 1 (1910.02054): each DP
    device stores 1/dp of the Adam state and XLA all-gathers the final
    updates. Pass the same axis to make_train_step(state_shardings=...)
    via zero1_state_shardings to pin the layout across steps (input
    sharding propagation alone also works — the explicit pin just makes
    the layout contract visible)."""
    if mesh is not None and rules is not None:
        from vltk_tpu.parallel import shard_params
        from vltk_tpu.parallel.sharding import zero1_state_shardings

        params = shard_params(params, rules, mesh)

        def init(p):
            return TrainState.create(apply_fn=apply_fn, params=p, tx=tx)

        if zero1_axis is not None:
            abstract = jax.eval_shape(init, params)
            out_sh = zero1_state_shardings(abstract, rules, mesh, zero1_axis)
            with mesh:
                return jax.jit(init, out_shardings=out_sh)(params)
        with mesh:
            return jax.jit(init)(params)
    return TrainState.create(apply_fn=apply_fn, params=params, tx=tx)


def make_train_step(
    loss_fn: Callable, mesh=None, donate: bool = True, state_shardings=None,
    accum_steps: int = 1,
):
    """``loss_fn(params, batch, rng) -> (loss, aux_dict)`` -> jitted
    ``step(state, batch, rng) -> (state, metrics)``.

    ``state_shardings`` (e.g. from parallel.zero1_state_shardings) pins
    the output state layout so a ZeRO-sharded optimizer state stays
    sharded across steps instead of depending on propagation.

    ``accum_steps > 1`` = gradient accumulation: every batch array's
    leading dim is split into ``accum_steps`` microbatches, a
    ``lax.scan`` runs value_and_grad per microbatch (peak activation HBM
    drops to one microbatch's worth), and ONE optimizer update applies
    the mean gradient. Exactly equals the full-batch step whenever the
    loss is a mean over examples (all losses in models/ are); the rng is
    folded per microbatch, so dropout draws differ from the full-batch
    run the way any two dropout schedules do."""

    def accum_grad_fn(params, batch, rng):
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        micro = jax.tree_util.tree_map(
            lambda x: x.reshape(accum_steps, x.shape[0] // accum_steps,
                                *x.shape[1:]),
            batch,
        )
        rngs = jax.random.split(rng, accum_steps)

        def body(carry, inp):
            acc_g, acc_loss = carry
            mb, r = inp
            (loss, aux), g = grad_fn(params, mb, r)
            acc_g = jax.tree_util.tree_map(jax.numpy.add, acc_g, g)
            return (acc_g, acc_loss + loss), aux

        zeros = jax.tree_util.tree_map(jax.numpy.zeros_like, params)
        (g, loss), auxs = jax.lax.scan(
            body, (zeros, jax.numpy.asarray(0.0)), (micro, rngs)
        )
        grads = jax.tree_util.tree_map(lambda x: x / accum_steps, g)
        aux = jax.tree_util.tree_map(lambda a: a.mean(axis=0), auxs)
        return (loss / accum_steps, aux), grads

    def step(state: TrainState, batch, rng):
        if accum_steps > 1:
            (loss, aux), grads = accum_grad_fn(state.params, batch, rng)
        else:
            grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
            (loss, aux), grads = grad_fn(state.params, batch, rng)
        state = state.apply_gradients(grads=grads)
        metrics = {"loss": loss, **aux}
        return state, metrics

    jitted = jax.jit(
        step,
        donate_argnums=(0,) if donate else (),
        **(
            {"out_shardings": (state_shardings, None)}
            if state_shardings is not None
            else {}
        ),
    )
    if mesh is None:
        return jitted

    def run(state, batch, rng):
        with mesh:
            return jitted(state, batch, rng)

    return run


def make_eval_step(metric_fn: Callable, mesh=None):
    """``metric_fn(params, batch) -> dict`` -> jitted eval step."""
    jitted = jax.jit(metric_fn)
    if mesh is None:
        return jitted

    def run(params, batch):
        with mesh:
            return jitted(params, batch)

    return run
