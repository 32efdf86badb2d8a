"""Path-rule parameter shardings (tensor parallelism).

A rule set is a sequence of ``(path_regex, PartitionSpec)`` pairs matched
against the ``/``-joined flax param path (e.g.
``"encoder/x_layers_0/cross_att/query/kernel"``). First match wins;
unmatched params replicate.

The LXMERT rule set implements Megatron-style column-then-row sharding of
every transformer block over the ``model`` axis: q/k/v and the MLP
up-projection split their *output* features (one column shard per device),
the attention output projection and MLP down-projection split their
*input* features (row shard), so each block incurs exactly one
all-reduce — which XLA inserts automatically from these annotations.
"""

from __future__ import annotations

import re
from typing import Sequence, Tuple

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Rules = Sequence[Tuple[str, P]]

# Megatron-style TP for the LXMERT-style encoder (models/lxmert.py).
LXMERT_RULES: Rules = (
    # column-parallel: split output features
    (r".*(query|key|value)/kernel$", P(None, "model")),
    (r".*(query|key|value)/bias$", P("model")),
    (r".*intermediate/kernel$", P(None, "model")),
    (r".*intermediate/bias$", P("model")),
    # row-parallel: split input features (psum on output)
    (r".*att_out/kernel$", P("model", None)),
    (r".*mlp_out/kernel$", P("model", None)),
    # embeddings: shard vocab rows over model axis (gather is cheap on ICI)
    (r".*word_embeddings/embedding$", P("model", None)),
)

# Expert parallelism on top of TP: the MoE block's stacked expert kernels
# (models/moe.py — (E, h, f) / (E, f, h)) shard their leading expert dim
# over the ``expert`` mesh axis and keep Megatron column/row sharding of
# each expert's FFN over ``model``. The router stays replicated (it is a
# tiny h x E matmul every device needs). On meshes without an ``expert``
# axis, _fit_spec falls back to the TP-only spec automatically.
LXMERT_MOE_RULES: Rules = (
    (r".*ffn/wi$", P("expert", None, "model")),
    (r".*ffn/bi$", P("expert", "model")),
    (r".*ffn/wo$", P("expert", "model", None)),
    (r".*ffn/bo$", P("expert", None)),
) + tuple(LXMERT_RULES)


def _spec_for(path: str, shape, rules: Rules) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            # drop trailing axes the param doesn't have
            if len(spec) > len(shape):
                spec = P(*spec[: len(shape)])
            return spec
    return P()


def _fit_spec(spec: P, shape, mesh: Mesh) -> P:
    """Degrade gracefully per dimension: axes the mesh lacks, or dims the
    mesh size doesn't divide, fall back to replication for that dim only
    (keeps tiny test configs working on any mesh, and lets composed rule
    sets — e.g. expert+model — keep the axes the mesh does have)."""
    entries = []
    for dim, axis in enumerate(spec):
        if axis is None:
            entries.append(None)
            continue
        axes = (axis,) if isinstance(axis, str) else tuple(axis)
        kept = tuple(a for a in axes if a in mesh.shape)
        size = 1
        for a in kept:
            size *= mesh.shape[a]
        if not kept or dim >= len(shape) or shape[dim] % size != 0:
            entries.append(None)
        else:
            entries.append(kept if len(kept) > 1 else kept[0])
    if tuple(entries) == tuple(spec):
        return spec
    while entries and entries[-1] is None:
        entries.pop()
    return P(*entries)


def infer_shardings(params, rules: Rules, mesh: Mesh):
    """Tree of ``NamedSharding`` matching ``params``' structure."""

    def one(path_tuple, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_tuple)
        spec = _spec_for(path, leaf.shape, rules)
        return NamedSharding(mesh, _fit_spec(spec, leaf.shape, mesh))

    return jax.tree_util.tree_map_with_path(one, params)


def _add_axis_to_spec(spec: P, shape, mesh: Mesh, axis: str) -> P:
    """Insert ``axis`` on the first free dim it divides (ZeRO sharding of
    an optimizer-moment leaf on top of its param's TP spec)."""
    if axis not in mesh.shape:
        return spec
    size = mesh.shape[axis]
    entries = list(spec) + [None] * (len(shape) - len(spec))
    for dim, used in enumerate(entries):
        if used is not None:
            continue
        if shape[dim] % size == 0 and shape[dim] > 0:
            entries[dim] = axis
            return P(*entries)
    return spec


def zero1_state_shardings(abstract_state, rules: Rules, mesh: Mesh,
                          axis: str = "data"):
    """ZeRO-1 sharding tree for a flax TrainState (DeepSpeed ZeRO stage 1,
    1910.02054): parameters keep their TP rule shardings, but every
    optimizer *moment* leaf (``mu``/``nu`` subtrees — same structure as
    params) is additionally sharded over the data axis on its first free
    divisible dim. Each data-parallel device then stores only 1/dp of the
    Adam state; XLA's partitioner derives the update-compute sharding and
    the all-gather of the final updates automatically from these
    annotations (SPMD — no hand-written reduce-scatter needed).

    Pass the result as ``out_shardings`` when jitting state creation, and
    thread it through the train step's ``out_shardings`` so the layout is
    stable across steps.
    """

    def one(path_tuple, leaf):
        keys = [str(p).strip(".[]'\"") for p in path_tuple]
        shape = getattr(leaf, "shape", ())
        if not shape:
            return NamedSharding(mesh, P())  # step / count scalars
        for marker in ("mu", "nu"):
            if marker in keys:
                tail = "/".join(keys[keys.index(marker) + 1:])
                base = _fit_spec(_spec_for(tail, shape, rules), shape, mesh)
                return NamedSharding(
                    mesh, _add_axis_to_spec(base, shape, mesh, axis)
                )
        if "params" in keys:
            tail = "/".join(keys[keys.index("params") + 1:])
            base = _fit_spec(_spec_for(tail, shape, rules), shape, mesh)
            return NamedSharding(mesh, base)
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(one, abstract_state)


def shard_params(params, rules: Rules, mesh: Mesh):
    """device_put the param tree according to ``rules``."""
    shardings = infer_shardings(params, rules, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
