"""Pipeline parallelism over the ``pipe`` mesh axis (SURVEY §5.8).

The reference's only notion of model placement is a static
model->device-id map consumed by ``nn.DataParallel``-era code
(reference: vltk/configs.py:36-60, vltk/abc/logic/models.py:10-95); it
has no pipeline schedule. This module supplies the ``pp`` leg of the
framework's tp/pp/dp/sp/ep matrix the TPU way: a GPipe schedule
(arXiv 1811.06965) expressed as one SPMD program under ``shard_map`` —
every device runs the same scan; stage identity comes from
``lax.axis_index``; inter-stage handoff is a neighbour
``lax.ppermute``, the cheapest collective ICI has.

Design notes:

* **Layer-stacked parameters.** The L homogeneous layers' param trees
  are stacked on a leading (L,) dim (``stack_layer_params``) and that
  dim is sharded over ``pipe`` — each device physically holds only its
  L/P contiguous layers, which is the entire point of PP: a model whose
  layer stack exceeds one chip's HBM trains on P chips. Within a stage
  the layer chunk is applied by ``lax.scan`` (one compiled layer body,
  not L unrolled copies).
* **Static schedule.** The scan runs exactly ``M + P - 1`` ticks
  (M microbatches, P stages); warm-up/drain bubbles compute on zeros
  and their results are discarded by predicated writes — no dynamic
  control flow, so the whole pipeline jits once.
* **Reverse-differentiable as-is**: ``ppermute``'s transpose is the
  inverted permutation and the scan transposes to the reverse-order
  scan, so ``jax.grad`` through ``gpipe_spmd`` yields the standard
  GPipe backward schedule automatically — no hand-written backward.
* The microbatch stream ``x`` is a pytree (e.g. ``(hidden, mask)``)
  with a leading (M, microbatch, ...) shape; non-hidden leaves simply
  ride along so per-example state (attention masks) stays paired with
  its microbatch.

Cost notes:

* The finished microbatch outputs accumulate on the last stage only
  and are returned replicated via a ``psum`` over ``pipe`` (all other
  stages contribute zeros). That is one output-sized all-reduce per
  call — negligible next to the per-tick compute, and it keeps the
  primitive composable (callers see a replicated result regardless of
  stage count).
* The microbatch stream ``x`` (and the output accumulator) is
  **replicated over the pipe axis** (``x_specs = P()``): every device
  holds the full (M, mb, ...) stream, O(global batch) activation input
  memory per device. What PP partitions here is the *layer stack* —
  params, layer activations-in-flight, and the backward's saved
  residuals scale as L/P — which is the HBM term that caps model size.
  If the input stream itself is the bottleneck, pass ``data_axis=``:
  the microbatch dim is then sharded over that axis (each data slice
  runs an independent pipeline), cutting the stream's per-device
  footprint to 1/dp.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P


def stack_layer_params(params: dict, prefix: str, count: int):
    """Stack ``params[f"{prefix}{i}"]`` for i in [0, count) into one tree
    whose leaves carry a leading (count,) layer dim.

    The layers must be homogeneous (same param structure/shapes) — true
    for the LXMERT lang/visn stacks (models/lxmert.py:Lxmert names them
    ``layer_0..``/``r_layer_0..``).
    """
    layers = [params[f"{prefix}{i}"] for i in range(count)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def unstack_layer_params(stacked, prefix: str, count: int) -> dict:
    """Inverse of :func:`stack_layer_params` (checkpoint interop)."""
    return {
        f"{prefix}{i}": jax.tree_util.tree_map(lambda x, i=i: x[i], stacked)
        for i in range(count)
    }


def gpipe_spmd(
    layer_fn: Callable,
    stacked_params,
    x,
    *,
    mesh: Mesh,
    axis: str = "pipe",
    data_axis: str | None = None,
):
    """Run ``layer_fn`` L times over ``x``'s microbatches, GPipe-style.

    Args:
      layer_fn: ``(layer_params, x_mb) -> x_mb`` — applies ONE layer to
        one microbatch pytree and returns the same structure. Must be
        traceable under ``lax.scan`` (deterministic; no data-dependent
        Python control flow).
      stacked_params: layer-stacked param tree, leaves shaped
        ``(L, ...)``; ``L`` must divide by the ``axis`` mesh size.
      x: microbatch pytree, every leaf shaped ``(M, mb, ...)``.
      mesh: mesh containing ``axis``; other axes pass through untouched
        (compose DP/TP by sharding inside ``layer_fn``'s arrays as
        usual — this function only partitions layers and time).
      data_axis: optional mesh axis to shard every leaf's microbatch
        dim (dim 1) over — each data slice runs an independent pipeline
        over the same layer shards, so the stream costs 1/dp per device
        instead of being fully replicated. The microbatch size must
        divide the axis size.

    Returns the processed microbatch pytree, same structure/shape as
    ``x``, replicated over ``axis`` (and sharded over ``data_axis`` if
    given).
    """
    if axis not in mesh.axis_names:
        raise ValueError(f"mesh {mesh.axis_names} has no {axis!r} axis")
    stages = mesh.shape[axis]
    leaves = jax.tree_util.tree_leaves(stacked_params)
    if not leaves:
        raise ValueError("stacked_params is empty")
    n_layers = leaves[0].shape[0]
    if n_layers % stages != 0:
        raise ValueError(
            f"{n_layers} layers not divisible by {stages} pipeline stages"
        )
    m = jax.tree_util.tree_leaves(x)[0].shape[0]

    param_specs = jax.tree_util.tree_map(lambda _: P(axis), stacked_params)
    if data_axis is not None:
        if data_axis not in mesh.axis_names:
            raise ValueError(
                f"mesh {mesh.axis_names} has no {data_axis!r} axis"
            )
        dp = mesh.shape[data_axis]
        for leaf in jax.tree_util.tree_leaves(x):
            if leaf.ndim < 2 or leaf.shape[1] % dp != 0:
                raise ValueError(
                    f"every x leaf needs a dim-1 microbatch size divisible "
                    f"by {data_axis}={dp}; got shape {leaf.shape}"
                )
        x_specs = jax.tree_util.tree_map(lambda _: P(None, data_axis), x)
    else:
        x_specs = jax.tree_util.tree_map(lambda _: P(), x)

    def shard_fn(p_stage, xm):
        stage = jax.lax.axis_index(axis)
        shift = [(i, i + 1) for i in range(stages - 1)]

        def apply_stage(h):
            def body(carry, layer_p):
                return layer_fn(layer_p, carry), None

            out, _ = jax.lax.scan(body, h, p_stage)
            return out

        state0 = jax.tree_util.tree_map(
            lambda a: jnp.zeros_like(a[0]), xm
        )
        out0 = jax.tree_util.tree_map(jnp.zeros_like, xm)

        def tick(carry, t):
            state, outputs = carry
            t_in = jnp.minimum(t, m - 1)
            inp = jax.tree_util.tree_map(
                lambda a, s: jnp.where(stage == 0, a[t_in], s), xm, state
            )
            y = apply_stage(inp)
            t_out = t - (stages - 1)
            valid = jnp.logical_and(stage == stages - 1, t_out >= 0)
            idx = jnp.maximum(t_out, 0)
            outputs = jax.tree_util.tree_map(
                lambda o, yl: jnp.where(valid, o.at[idx].set(yl), o),
                outputs, y,
            )
            nxt = jax.tree_util.tree_map(
                lambda yl: jax.lax.ppermute(yl, axis, shift), y
            )
            return (nxt, outputs), None

        (_, outputs), _ = jax.lax.scan(
            tick, (state0, out0), jnp.arange(m + stages - 1)
        )
        # only the last stage wrote outputs; psum replicates them
        return jax.tree_util.tree_map(
            lambda o: jax.lax.psum(o, axis), outputs
        )

    fn = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(param_specs, x_specs),
        out_specs=x_specs,
        check_vma=False,
    )
    return fn(stacked_params, x)
