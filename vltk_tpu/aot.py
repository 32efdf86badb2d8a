"""AOT compiled-artifact export / serving bundles (``jax.export``).

Reference gap this fills: upstream vltk deploys by importing the full
Python model class plus the torch checkpoint on every serving host (its
eval path, reference vltk/abc/simple.py:576-682, needs model source +
weights + a trace per process). The TPU-native story inverts that: lower
the jitted forward ONCE into a serialized StableHLO artifact
(``jax.export``), with the trained params baked in as constants, and
optionally cross-lowered for TPU from a CPU-only build box
(``platforms=("cpu", "tpu")``). Serving hosts ``deserialize`` and call —
no model source, no checkpoint file, no retrace; the artifact pins the
exact numerics that were validated at export time.

Bundle layout (one zip file):

    manifest.json      {"format": 1, "meta": {...},
                        "artifacts": [names], "files": [names]}
    <name>.jaxexp      serialized ``jax.export.Exported``, one per step
    files/<name>       opaque side files (e.g. the tokenizer vocab)

``VQAPredictor.export_bundle`` / ``VQAPredictor.from_bundle``
(vltk_tpu/predict.py) ride this to make the composed VQA pipeline a
single self-contained deployable file.
"""

from __future__ import annotations

import dataclasses
import json
import zipfile
from typing import Any, Callable, Dict, Optional, Sequence, Tuple

import numpy as np

_FORMAT = 1


def _specs(example_args: Sequence[Any]):
    """Shape/dtype specs from example arrays (values are ignored); each
    argument may be a pytree (e.g. a params dict)."""
    import jax

    def leaf_spec(x):
        # read metadata without materializing: np.asarray on a
        # device-resident leaf would transfer the whole buffer to host
        # (minutes for full params over a slow link) just to drop it
        shape = getattr(x, "shape", None)
        dtype = getattr(x, "dtype", None)
        if shape is None or dtype is None:
            arr = np.asarray(x)
            shape, dtype = arr.shape, arr.dtype
        return jax.ShapeDtypeStruct(shape, dtype)

    return tuple(jax.tree.map(leaf_spec, a) for a in example_args)


def export_jitted(
    fn: Callable,
    example_args: Sequence[Any],
    *,
    platforms: Optional[Sequence[str]] = None,
):
    """Lower ``fn`` (jitted or plain-jittable) at the example shapes and
    return the ``jax.export.Exported`` artifact.

    ``platforms``: lowering targets, e.g. ``("cpu", "tpu")`` to build one
    artifact servable on both; ``None`` = the current default backend.
    """
    import jax
    from jax import export as jex

    jfn = fn if hasattr(fn, "lower") else jax.jit(fn)
    kwargs = {}
    if platforms is not None:
        kwargs["platforms"] = tuple(str(p) for p in platforms)
    return jex.export(jfn, **kwargs)(*_specs(example_args))


def save_bundle(
    path: str,
    exported: Dict[str, Any],
    meta: Optional[Dict[str, Any]] = None,
    files: Optional[Dict[str, bytes]] = None,
) -> str:
    """Write artifacts (+ metadata + opaque side files) as one zip."""
    meta = dict(meta or {})
    files = dict(files or {})
    manifest = {
        "format": _FORMAT,
        "meta": meta,
        "artifacts": sorted(exported),
        "files": sorted(files),
    }
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("manifest.json", json.dumps(manifest, indent=1))
        for name, exp in exported.items():
            data = exp if isinstance(exp, (bytes, bytearray)) else exp.serialize()
            zf.writestr(f"{name}.jaxexp", bytes(data))
        for name, data in files.items():
            zf.writestr(f"files/{name}", data)
    return path


@dataclasses.dataclass
class AotBundle:
    """A loaded bundle: ``fns[name](*args)`` runs the deserialized
    artifact on the current backend (which must be one of the platforms
    it was lowered for)."""

    fns: Dict[str, Callable]
    meta: Dict[str, Any]
    files: Dict[str, bytes]
    platforms: Dict[str, Tuple[str, ...]]

    def __getitem__(self, name: str) -> Callable:
        return self.fns[name]


def load_bundle(path: str) -> AotBundle:
    from jax import export as jex

    with zipfile.ZipFile(path) as zf:
        manifest = json.loads(zf.read("manifest.json"))
        if manifest.get("format") != _FORMAT:
            raise ValueError(
                f"{path}: unsupported bundle format "
                f"{manifest.get('format')!r} (want {_FORMAT})"
            )
        fns: Dict[str, Callable] = {}
        platforms: Dict[str, Tuple[str, ...]] = {}
        for name in manifest["artifacts"]:
            exp = jex.deserialize(zf.read(f"{name}.jaxexp"))
            fns[name] = exp.call
            platforms[name] = tuple(exp.platforms)
        files = {
            name: zf.read(f"files/{name}") for name in manifest["files"]
        }
    return AotBundle(
        fns=fns, meta=manifest["meta"], files=files, platforms=platforms
    )


def bundle_manifest(path: str) -> Dict[str, Any]:
    """Read just the manifest (cheap inspection, no deserialization)."""
    with zipfile.ZipFile(path) as zf:
        return json.loads(zf.read("manifest.json"))
