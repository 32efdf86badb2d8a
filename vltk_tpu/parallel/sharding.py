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


def _spec_for(path: str, shape, rules: Rules) -> P:
    for pattern, spec in rules:
        if re.match(pattern, path):
            # drop trailing axes the param doesn't have
            if len(spec) > len(shape):
                spec = P(*spec[: len(shape)])
            return spec
    return P()


def infer_shardings(params, rules: Rules, mesh: Mesh):
    """Tree of ``NamedSharding`` matching ``params``' structure.

    Any rule axis whose size would not divide the param dim falls back to
    replication for that param (keeps tiny test configs working on any
    mesh).
    """

    def one(path_tuple, leaf):
        path = "/".join(str(getattr(p, "key", p)) for p in path_tuple)
        spec = _spec_for(path, leaf.shape, rules)
        # replicate when the mesh lacks a named axis or a dim doesn't divide
        for dim, axis in enumerate(spec):
            if axis is None:
                continue
            axes = (axis,) if isinstance(axis, str) else tuple(axis)
            if any(a not in mesh.shape for a in axes):
                spec = P()
                break
            size = 1
            for a in axes:
                size *= mesh.shape[a]
            if dim >= leaf.ndim or leaf.shape[dim] % size != 0:
                spec = P()
                break
        return NamedSharding(mesh, spec)

    return jax.tree_util.tree_map_with_path(one, params)


def shard_params(params, rules: Rules, mesh: Mesh):
    """device_put the param tree according to ``rules``."""
    shardings = infer_shardings(params, rules, mesh)
    return jax.tree_util.tree_map(jax.device_put, params, shardings)
