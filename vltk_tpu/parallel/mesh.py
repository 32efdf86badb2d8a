"""Mesh construction + batch sharding helpers."""

from __future__ import annotations

from typing import  Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_config=None, *, devices=None) -> Mesh:
    """Build a :class:`jax.sharding.Mesh` from a ``MeshConfig``.

    ``axes`` is ``((name, size), ...)``; exactly one size may be ``-1``
    ("all remaining devices"). Replaces the reference's runtime GPU pick
    (reference: vltk/memory.py:24-45, vltk/configs.py:258-266).
    """
    if devices is None:
        devices = jax.devices()
    devices = list(devices)
    axes: Sequence[Tuple[str, int]] = (
        (("data", -1),) if mesh_config is None else tuple(mesh_config.axes)
    )
    names = [a[0] for a in axes]
    sizes = [int(a[1]) for a in axes]
    n_free = sizes.count(-1)
    if n_free > 1:
        raise ValueError(f"at most one mesh axis may be -1, got {axes}")
    fixed = int(np.prod([s for s in sizes if s != -1])) if sizes else 1
    total = len(devices)
    if n_free == 1:
        if total % fixed != 0:
            raise ValueError(
                f"{total} devices not divisible by fixed axes product {fixed}"
            )
        sizes[sizes.index(-1)] = total // fixed
    else:
        total = int(np.prod(sizes))
        if total > len(devices):
            raise ValueError(
                f"mesh {dict(axes)} needs {total} devices, have {len(devices)}"
            )
        devices = devices[:total]
    grid = np.array(devices[: int(np.prod(sizes))]).reshape(sizes)
    return Mesh(grid, axis_names=tuple(names))


def current_mesh():
    """The mesh active at trace time, or ``None``.

    Honors both entry styles: ``jax.sharding.use_mesh(mesh)`` (the new
    context) and the classic ``with mesh:`` block the train-step builder
    uses (train/steps.py) — the latter still registers through the
    legacy thread-resources slot, so read it with the deprecation
    warning suppressed; this helper is the single point of contact.
    """
    m = jax.sharding.get_abstract_mesh()
    if m is not None and getattr(m, "axis_names", ()):
        return m
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore", DeprecationWarning)
        from jax.interpreters import pxla

        pm = pxla.thread_resources.env.physical_mesh
    return None if pm.empty else pm


def batch_sharding(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Sharding for a batch-leading array: first dim over ``axis``."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """device_put every array in a (possibly nested) batch dict with its
    leading dim sharded over ``axis``; scalars/objects replicate."""
    data = batch_sharding(mesh, axis)
    repl = replicated(mesh)

    def put(x):
        if hasattr(x, "ndim") and getattr(x, "ndim", 0) >= 1:
            return jax.device_put(x, data)
        return jax.device_put(x, repl)

    return jax.tree_util.tree_map(put, batch)
