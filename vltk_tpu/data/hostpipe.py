"""Multi-core host ETL: process-pool decode -> collate -> arrow shards ->
deterministic merge, with per-stage accounting.

Re-designs the torch-DataLoader worker-process plane (reference:
vltk/dataset/loader.py:281-296 — ``num_workers`` forked decoders feeding a
collate in the parent) for the ETL/extraction side of a TPU host. The
thread pools in ``data/loader.py`` and ``adapters/extraction.py`` overlap
host decode with device compute, but a single Python process tops out at
roughly one core of decode throughput; BASELINE.md's host-plane row
(166-175 img/s on this box's single core) extrapolates "~N_cores x the
per-core number, with the arrow writer shardable per worker". This module
is that mechanism, as a tested code path:

* the sorted ``(imgid, path)`` work list is split into ``num_workers``
  CONTIGUOUS shards; each worker *process* decodes, collates, and builds
  entries for its shard and streams them into its own arrow shard file
  (via the same ``Adapter._write_entries`` writer the single-process path
  uses — img_to_row_map + counters land in each shard's metadata);
* the parent concatenates the shard tables in shard order — row order is
  therefore IDENTICAL to the single-process run by construction — merges
  the per-shard metadata (row maps re-offset, counters summed), and
  writes the final arrow with the same crash-atomic temp-file + replace
  discipline as ``_write_entries``;
* every worker reports per-stage wall-clock (decode / collate / forward /
  write) so host capacity planning rests on measured stage costs.

``num_workers <= 1`` runs the identical worker function inline — the
single-process oracle the tests diff the 2-worker output against
(tests/test_hostpipe.py validates ordering/equality on a 1-core box).

Constraints (by construction of ``multiprocessing`` spawn): the adapter
class must be importable at module scope (children re-import it; locally
defined classes won't resolve), and must be HOST-ONLY — ``setup()`` must
not build device programs, since each child would otherwise try to claim
the accelerator. Device-model extraction keeps the threaded
double-buffered pipeline in ``adapters/extraction.py``; this module is
for the pure host plane (decode caches, host-feed benchmarking, CPU-side
feature ETL).
"""

from __future__ import annotations

import importlib
import os
import time
import types
from multiprocessing import get_context
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa

from vltk_tpu import vars as V
from vltk_tpu.adapters.frcnn import FRCNN as FRCNNAdapter
from vltk_tpu.config import VisionConfig
from vltk_tpu.utils.base import set_metadata


# ---------------------------------------------------------------------------
# host-only stub adapters (module scope: spawned children re-import them)
# ---------------------------------------------------------------------------


class HostDecodeFRCNN(FRCNNAdapter):
    """The production FRCNN host plane with the device step stubbed:
    jpeg decode -> pad-to-raw-canvas uint8 collate -> packed rows of the
    real output shape (zero-filled). Everything the host pays for is
    real; only the TPU compute is replaced. Used by ``bench.py --host
    --host-workers N`` and the hostpipe mechanism tests."""

    _name = "hostdecodefrcnn"
    host_only = True
    # packed row geometry (matches the real extractor's writer shape)
    stub_detections: int = 36
    stub_dim: int = 2048

    @classmethod
    def setup(cls, **kwargs):
        dim = cls.stub_dim + 6  # features + box(4) + obj id + attr id

        def step(variables, raw_images, raw_sizes):
            return np.zeros(
                (raw_images.shape[0], cls.stub_detections, dim), np.float32
            )

        bundle = {
            "step": step,
            "variables": {"params": None},
            "cfg": types.SimpleNamespace(int8=False),
        }
        return bundle, {"model": "host-decode-stub"}

    @staticmethod
    def schema(max_detections: int = 36, visual_dim: int = 2048):
        return FRCNNAdapter.schema(max_detections, visual_dim)

    @classmethod
    def full_schema(cls, **kwargs):
        kwargs.setdefault("max_detections", cls.stub_detections)
        kwargs.setdefault("visual_dim", cls.stub_dim)
        return super().full_schema(**kwargs)


class TinyHostDecodeFRCNN(HostDecodeFRCNN):
    """Small-canvas variant of the stub for fast mechanism tests."""

    _name = "tinyhostdecodefrcnn"
    raw_canvas = (96, 96)
    stub_detections = 4
    stub_dim = 16
    model_batch_size = 4


# ---------------------------------------------------------------------------
# worker
# ---------------------------------------------------------------------------


def _resolve_adapter(spec: str):
    mod_name, _, qualname = spec.partition(":")
    obj = importlib.import_module(mod_name)
    for part in qualname.split("."):
        obj = getattr(obj, part)
    return obj


def _adapter_spec(cls) -> str:
    spec = f"{cls.__module__}:{cls.__qualname__}"
    if cls.__module__ == "__main__" or "<locals>" in cls.__qualname__:
        raise ValueError(
            f"hostpipe adapters must be importable at module scope "
            f"(got {spec}); spawned workers re-import the class"
        )
    return spec


def _shard_worker(payload: Tuple) -> Dict[str, Any]:
    """One shard: decode -> collate -> host forward -> arrow shard file.
    Runs in a child process (or inline for num_workers<=1). Returns the
    shard path plus per-stage wall-clock."""
    (spec, items, shard_path, batch_size, setup_kwargs, schema_kwargs) = payload
    cls = _resolve_adapter(spec)
    processor = (cls.default_processor or VisionConfig()).build()
    model, _ = cls.setup(**setup_kwargs)
    schema = cls.full_schema(**schema_kwargs)

    stats = {
        "decode_s": 0.0,
        "collate_s": 0.0,
        "forward_s": 0.0,
        "n_images": len(items),
        "n_batches": 0,
    }

    def entries():
        bs = batch_size
        for i in range(0, len(items), bs):
            chunk = items[i : i + bs]
            n_real = len(chunk)
            # same final-partial-batch padding convention as
            # extraction._run_split (fixed shapes end-to-end)
            padded = list(chunk) + [chunk[-1]] * (bs - n_real)
            t0 = time.perf_counter()
            batch_entries = []
            for imgid, path in padded:
                entry = processor(path)
                entry[V.imgid] = imgid
                batch_entries.append(entry)
            stats["decode_s"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            batch = cls.collate(batch_entries)
            stats["collate_s"] += time.perf_counter() - t0

            t0 = time.perf_counter()
            outs = cls.forward(model, batch)
            stats["forward_s"] += time.perf_counter() - t0
            stats["n_batches"] += 1
            yield from outs[:n_real]

    t0 = time.perf_counter()
    cls._write_entries(entries(), schema, shard_path)
    total = time.perf_counter() - t0
    stats["write_s"] = max(
        total - stats["decode_s"] - stats["collate_s"] - stats["forward_s"],
        0.0,
    )
    stats["wall_s"] = total
    return {"shard_path": shard_path, "stats": stats}


# ---------------------------------------------------------------------------
# parent: shard, run, merge
# ---------------------------------------------------------------------------


def _merge_shards(
    cls,
    shard_paths: Sequence[str],
    out_path: str,
    extra_metadata: Optional[Dict[str, Any]] = None,
):
    """Concatenate shard tables in shard order and merge metadata:
    img_to_row_map re-offset per shard (first occurrence wins, matching
    ``_write_entries``' setdefault), ``*_frequencies`` counters summed."""
    tables = []
    img_to_row_map: Dict[str, int] = {}
    freqs: Dict[str, Dict[str, int]] = {}
    offset = 0
    for path in shard_paths:
        shard = cls._load_one_arrow(path)
        for imgid, row in sorted(
            shard.metadata.get("img_to_row_map", {}).items(),
            key=lambda kv: kv[1],
        ):
            img_to_row_map.setdefault(imgid, row + offset)
        for key, value in shard.metadata.items():
            if key.endswith("_frequencies") and isinstance(value, dict):
                merged = freqs.setdefault(key, {})
                for s, n in value.items():
                    merged[s] = merged.get(s, 0) + n
        tables.append(shard.table.replace_schema_metadata(None))
        offset += shard.num_rows

    table = pa.concat_tables(tables)
    meta: Dict[str, Any] = {"img_to_row_map": img_to_row_map}
    meta.update(freqs)
    if extra_metadata:
        meta.update(extra_metadata)
    table = set_metadata(table, meta)

    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    tmp_path = f"{out_path}.{os.getpid()}.tmp"
    try:
        with pa.OSFile(tmp_path, "wb") as f:
            with pa.ipc.new_stream(f, table.schema) as writer:
                writer.write_table(table)
        os.replace(tmp_path, out_path)
    except BaseException:
        try:
            os.remove(tmp_path)
        except OSError:
            pass
        raise
    return cls._load_one_arrow(out_path)


def run_sharded_split(
    cls,
    id2path: Mapping[str, str],
    out_path: str,
    num_workers: int = 0,
    batch_size: Optional[int] = None,
    setup_kwargs: Optional[Dict[str, Any]] = None,
    schema_kwargs: Optional[Dict[str, Any]] = None,
    extra_metadata: Optional[Dict[str, Any]] = None,
    start_method: str = "spawn",
) -> Tuple[Any, Dict[str, Any]]:
    """Run one split's host ETL across ``num_workers`` processes.

    Returns ``(adapter, stats)`` where ``stats`` carries the aggregated
    and per-worker stage accounting. ``num_workers <= 1`` runs inline
    (the single-process oracle, same code path minus the pool)."""
    spec = _adapter_spec(cls)
    items = sorted(id2path.items())
    if not items:
        raise ValueError("run_sharded_split: empty id2path")
    bs = int(batch_size or cls.model_batch_size)
    workers = max(int(num_workers), 1)
    workers = min(workers, len(items))
    setup_kwargs = dict(setup_kwargs or {})
    schema_kwargs = dict(schema_kwargs or {})

    # contiguous shards preserve the sorted global row order under an
    # in-order concat
    bounds = np.linspace(0, len(items), workers + 1).astype(int)
    payloads = []
    for w in range(workers):
        shard_items = items[bounds[w] : bounds[w + 1]]
        if not shard_items:
            continue
        payloads.append(
            (
                spec,
                shard_items,
                f"{out_path}.shard{w:04d}",
                bs,
                setup_kwargs,
                schema_kwargs,
            )
        )

    t0 = time.perf_counter()
    if num_workers <= 1:
        results = [_shard_worker(p) for p in payloads]
    else:
        ctx = get_context(start_method)
        with ctx.Pool(processes=len(payloads)) as pool:
            results = pool.map(_shard_worker, payloads)  # order preserved
    wall = time.perf_counter() - t0

    shard_paths = [r["shard_path"] for r in results]
    try:
        adapter = _merge_shards(cls, shard_paths, out_path, extra_metadata)
    finally:
        for p in shard_paths:
            try:
                os.remove(p)
            except OSError:
                pass

    per_worker: List[Dict[str, Any]] = [r["stats"] for r in results]
    agg = {
        k: round(sum(s[k] for s in per_worker), 4)
        for k in ("decode_s", "collate_s", "forward_s", "write_s")
    }
    agg.update(
        n_images=len(items),
        n_batches=sum(s["n_batches"] for s in per_worker),
        workers=len(per_worker),
        wall_s=round(wall, 4),
        img_per_s=round(len(items) / wall, 2) if wall > 0 else float("inf"),
    )
    return adapter, {"aggregate": agg, "per_worker": per_worker}
