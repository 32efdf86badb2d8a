"""VisnExtraction — adapter for model-computed features.

Re-design of reference vltk/abc/extraction.py. Subclasses declare
``schema()``, ``setup()`` (build the model) and ``forward(model, batch)``
(run it); ``extract()`` walks the image files of a vision dataset and streams
feature rows into per-split arrow files with ``model_config`` /
``processor_args`` / ``dataset`` metadata (reference: extraction.py:20-24,
230-233 — visible in the golden fixture tests/visualgenome/frcnn/train.arrow).

TPU redesign (the single biggest perf change vs the reference): the reference
ran the extractor one image at a time (reference: extraction.py:142-199,
batch size 1). Here extraction is *batched and pipelined*:

* image decode + resize happen host-side in a thread pool while the device
  computes the previous batch (double buffering);
* every batch is a fixed-shape (B, H, W, 3) tensor — the processor pads to
  the configured canvas so one XLA program serves the entire run;
* ``forward`` receives the whole batch and returns per-image feature dicts.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict,  Iterator, List, Mapping, Optional, Sequence

import numpy as np

from vltk_tpu import vars as V
from vltk_tpu.adapters.base import Adapter
from vltk_tpu.adapters.visn import VisnDataset
from vltk_tpu.config import VisionConfig
from vltk_tpu.inspection import collect_args_to_func


class VisnExtraction(Adapter):
    """Model-in-the-loop feature extraction adapter (is_feature=True)."""

    is_feature = True
    # subclass knobs
    default_processor: Optional[VisionConfig] = None
    dataset: Optional[str] = None  # name of the VisnDataset whose images we read
    model_batch_size: int = 8
    prefetch_depth: int = 2
    decode_workers: int = 8  # parallel host jpeg decode (PIL drops the GIL)

    @classmethod
    def full_schema(cls, **kwargs) -> Dict[str, Any]:
        from vltk_tpu.features import Features

        schema = super().full_schema(**kwargs)
        schema.setdefault(V.imgid, Features.Imgid())
        return schema

    @classmethod
    def collate(cls, entries: List[Dict[str, Any]]) -> Dict[str, Any]:
        """Stack per-image processor outputs into one fixed-shape host
        batch; subclasses override to pad to their raw canvas."""
        return _stack_entries(entries)

    # ------------------------------------------------------------------
    # subclass surface
    # ------------------------------------------------------------------
    @classmethod
    def setup(cls, **kwargs):  # pragma: no cover - abstract
        """Return (model, model_config). Called once per extract()."""
        raise NotImplementedError

    @classmethod
    def forward(cls, model, batch: Mapping[str, Any], **kwargs):  # pragma: no cover
        """Run the model on a host batch; return a list of per-image entry
        dicts (keys must match schema())."""
        raise NotImplementedError

    # Optional two-phase forward: if a subclass defines BOTH
    # ``forward_dispatch(model, batch, **kw) -> state`` (enqueue device
    # work, return async outputs) and ``forward_collect(model, state) ->
    # entries`` (fetch to host), the extraction driver overlaps batch k+1's
    # device compute with batch k's host fetch + arrow write — the device
    # never idles on the host<->device roundtrip (N8 feed, SURVEY §2.10).
    forward_dispatch = None
    forward_collect = None

    # ------------------------------------------------------------------
    # extraction driver
    # ------------------------------------------------------------------
    @classmethod
    def extract(
        cls,
        datadir: str,
        dataset_name: Optional[str] = None,
        splits: Optional[Sequence[str]] = None,
        img_format: str = "jpg",
        host_workers: int = 0,
        **kwargs,
    ) -> Dict[str, Adapter]:
        from vltk_tpu.adapters import Adapters

        dataset_name = dataset_name or cls.dataset
        if dataset_name is None:
            raise ValueError(f"{cls.name()}.extract needs a dataset name")
        if host_workers > 1 and not getattr(cls, "host_only", False):
            raise ValueError(
                f"{cls.name()}: host_workers={host_workers} requires a "
                "host-only adapter (setup() must not build device "
                "programs — each worker process would claim the "
                "accelerator). Device extraction keeps the threaded "
                "double-buffered pipeline; see data/hostpipe.py."
            )
        vdset = Adapters.get(dataset_name)

        processor_cfg = cls.default_processor or VisionConfig()
        processor = processor_cfg.build()
        model, model_config = cls.setup(
            **collect_args_to_func(cls.setup, kwargs)
        )
        schema = cls.full_schema(**kwargs)
        fwd_kwargs = collect_args_to_func(cls.forward, kwargs)

        # discover image files per split
        base = os.path.join(datadir, dataset_name)
        split_files: Dict[str, Dict[str, str]] = {}
        if splits is None:
            if not os.path.isdir(base):
                raise FileNotFoundError(
                    f"dataset directory {base!r} does not exist"
                )
            splits = [
                d
                for d in sorted(os.listdir(base))
                if os.path.isdir(os.path.join(base, d)) and d in _known_splits()
            ] or [None]
        for split in splits:
            id2path = vdset.load_imgid2path(datadir, split)
            if img_format:
                id2path = {
                    k: p
                    for k, p in id2path.items()
                    if p.lower().endswith(img_format.lower())
                }
            if id2path:
                split_files[split or "train"] = id2path

        if not split_files:
            raise FileNotFoundError(
                f"no images found for dataset {dataset_name} under {base}"
            )

        out: Dict[str, Adapter] = {}
        outdir = os.path.join(datadir, dataset_name, cls.name())
        for split, id2path in split_files.items():
            meta = {
                "model_config": model_config,
                "processor_args": processor_cfg.to_dict(),
                "dataset": os.path.join(datadir, dataset_name),
            }
            out_path = os.path.join(outdir, f"{split}.arrow")
            if host_workers > 1:
                # multi-core host plane: process-pool shards + merge
                # (per-stage accounting lands on adapter.host_stats)
                from vltk_tpu.data.hostpipe import run_sharded_split

                adapter, stats = run_sharded_split(
                    cls,
                    id2path,
                    out_path,
                    num_workers=host_workers,
                    batch_size=cls.model_batch_size,
                    setup_kwargs=collect_args_to_func(cls.setup, kwargs),
                    schema_kwargs=kwargs,
                    extra_metadata=meta,
                )
                adapter.host_stats = stats
            else:
                entries = cls._run_split(
                    id2path, processor, model, fwd_kwargs
                )
                adapter = cls._write_entries(entries, schema, out_path, meta)
            adapter._split = split
            out[split] = adapter
        return out

    # ------------------------------------------------------------------
    # batched, double-buffered pipeline
    # ------------------------------------------------------------------
    @classmethod
    def _run_split(
        cls,
        id2path: Mapping[str, str],
        processor,
        model,
        fwd_kwargs: Mapping[str, Any],
    ) -> Iterator[Dict[str, Any]]:
        """Host decode pipeline -> device batches -> per-image entries."""
        items = sorted(id2path.items())
        bs = cls.model_batch_size
        decode_pool = ThreadPoolExecutor(max_workers=max(cls.decode_workers, 1))

        def decode_one(item):
            imgid, path = item
            entry = processor(path)
            entry[V.imgid] = imgid
            return entry

        def load_batch(chunk):
            # pad the final partial chunk by repeating the last item so the
            # jitted step keeps its single compiled shape (one stray image
            # would otherwise cost a minutes-long recompile on the tunnel);
            # the padded copies are dropped after forward via n_real
            n_real = len(chunk)
            padded = list(chunk) + [chunk[-1]] * (bs - n_real)
            batch_entries = list(decode_pool.map(decode_one, padded))
            batch = cls.collate(batch_entries)
            batch["n_real"] = n_real
            return batch

        # producer thread decodes images ahead of the device; exceptions
        # travel through the queue (a dead producer would otherwise hang
        # the consumer on q.get forever and swallow the traceback). The
        # stop event + put timeout let a failed forward / abandoned
        # generator reap the producer instead of leaking it blocked on a
        # full queue (same pattern as data/loader.py _BaseLoader.__iter__)
        q: "queue.Queue" = queue.Queue(maxsize=cls.prefetch_depth)
        stop = threading.Event()

        def offer(item) -> bool:
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.1)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            try:
                for i in range(0, len(items), bs):
                    if stop.is_set():
                        return
                    if not offer(load_batch(items[i : i + bs])):
                        return
                offer(None)
            except BaseException as exc:
                offer(exc)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        pipelined = cls.forward_dispatch is not None and cls.forward_collect is not None
        pending = None  # (device_state, n_real) — one batch in flight
        try:
            while True:
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, BaseException):
                    raise batch
                n_real = batch.pop("n_real")
                if not pipelined:
                    for entry in cls.forward(model, batch, **fwd_kwargs)[:n_real]:
                        yield entry
                    continue
                state = cls.forward_dispatch(model, batch, **fwd_kwargs)
                if pending is not None:
                    prev_state, prev_n = pending
                    for entry in cls.forward_collect(model, prev_state)[:prev_n]:
                        yield entry
                pending = (state, n_real)
            if pending is not None:
                prev_state, prev_n = pending
                for entry in cls.forward_collect(model, prev_state)[:prev_n]:
                    yield entry
        finally:
            stop.set()
            while True:  # drain so a blocked put wakes immediately
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join()
            decode_pool.shutdown(wait=True)


def _stack_entries(entries: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack per-image processor outputs into one host batch. Every array key
    must already be fixed-shape (the processor pads to its canvas)."""
    if not entries:
        return {}
    out: Dict[str, Any] = {}
    for key in entries[0]:
        vals = [e[key] for e in entries]
        if isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = vals
    return out


def _known_splits():
    years = ("2014", "2015", "2017")
    return V.SPLITALIASES | {
        s + y for s in V.SPLITALIASES for y in years
    }
