"""Batch loaders — fixed-shape numpy batches with background prefetch.

Re-design of the reference's torch-DataLoader subclasses (reference:
vltk/dataset/loader.py). The torch machinery (worker processes, per-batch
max-shape padding, BatchInfo key partitioning) is replaced by:

  * entries that are *already* fixed-shape (padding happened at entry/write
    time), so collate is a plain ``np.stack`` — every batch of a run has
    identical shapes and hits one compiled XLA program;
  * a thread-pool fetch + bounded prefetch queue (decode/tokenize overlap
    the device step);
  * ``transpose_vl`` — the img_first batch (B images x T sentences) flattens
    to a sentence-major batch, statically (reference:
    visnlangdataset.py:287-353 did this raggedly post-collate);
  * ``device_put_iter`` — an optional double-buffered host->device feed.

Eval loaders never shuffle (reference: loader.py:250-258, 302-308).
"""

from __future__ import annotations

import queue
import threading
import warnings
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Dict, FrozenSet, Iterator, List, Optional

import numpy as np


def collate(entries: List[Dict[str, Any]]) -> Dict[str, Any]:
    """Stack fixed-shape entries; string/object keys become lists
    (reference: loader.py:85-149 — minus the ragged paths, by design)."""
    batch: Dict[str, Any] = {}
    keys = set(entries[0])
    for e in entries[1:]:
        keys &= set(e)  # min-spanning keys (reference: BatchInfo loader.py:15-82)
    for k in sorted(keys):
        vals = [e[k] for e in entries]
        first = vals[0]
        if isinstance(first, str):
            batch[k] = vals
        elif isinstance(first, np.ndarray) or np.isscalar(first):
            arrs = [np.asarray(v) for v in vals]
            if all(a.shape == arrs[0].shape and a.dtype == arrs[0].dtype for a in arrs):
                batch[k] = np.stack(arrs)
            else:
                # in a fixed-shape pipeline a ragged key is a bug upstream
                # (pad at write/entry time, never at collate time) — keep
                # the list so debugging can proceed, but say so loudly
                shapes = sorted({(a.shape, str(a.dtype)) for a in arrs})
                warnings.warn(
                    f"collate: key '{k}' is not fixed-shape across the batch "
                    f"({shapes[:4]}); yielding a list. Pad this key at entry "
                    f"time (vltk_tpu convention) — list-valued batch keys "
                    f"cannot be fed to the device.",
                    RuntimeWarning,
                    stacklevel=2,
                )
                batch[k] = vals
        else:
            batch[k] = vals
    return batch


#: fallback name table of image-side keys that must never be flattened as
#: per-sentence even when their second dim coincidentally equals T — used
#: only for raw dict batches; loaders pass the dataset's schema-derived set
_IMAGE_SIDE_KEYS = frozenset({
    "features", "boxes", "boxes_mask", "image", "gt_boxes", "gt_boxes_mask",
    "tokenbox", "visual_attention_mask",
})


def transpose_vl(
    batch: Dict[str, Any],
    max_size: int = 512,
    image_side_keys: Optional[FrozenSet[str]] = None,
) -> Dict[str, Any]:
    """img_first batch (B, T, ...) -> sentence-major batch with a STATIC
    leading dim ``min(B*T, max_size)`` plus a ``sentence_mask`` marking the
    real rows (padded slots repeat row 0) — a per-batch valid count would
    recompile XLA every batch. Static counterpart of the reference's
    transpose (reference: visnlangdataset.py:287-353, max_size cap at 287).

    ``image_side_keys`` (schema-driven, from
    ``VisionLanguageDataset.image_side_keys``) names the keys that are
    per-image and must be repeated rather than flattened; when None the
    module fallback table is used.
    """
    if image_side_keys is None:
        image_side_keys = _IMAGE_SIDE_KEYS
    text_mask = np.asarray(batch["text_mask"])  # (B, T)
    b, t = text_mask.shape
    out_size = min(b * t, max_size)
    flat_keep = text_mask.reshape(-1).astype(bool)
    valid_idx = np.flatnonzero(flat_keep)[:out_size]
    n_valid = valid_idx.shape[0]
    idx = np.zeros((out_size,), np.int64)
    idx[:n_valid] = valid_idx
    img_idx = idx // t

    out: Dict[str, Any] = {}
    for k, v in batch.items():
        if k in ("text_mask", "n_texts"):
            continue
        if isinstance(v, np.ndarray):
            if (
                v.ndim >= 2
                and v.shape[:2] == (b, t)
                and k not in image_side_keys
            ):
                out[k] = v.reshape(b * t, *v.shape[2:])[idx]
            elif v.shape[:1] == (b,):
                out[k] = v[img_idx]
            else:
                out[k] = v
        elif isinstance(v, list) and len(v) == b:
            out[k] = [v[i] for i in img_idx]
        else:
            out[k] = v
    mask = np.zeros((out_size,), np.int32)
    mask[:n_valid] = 1
    out["sentence_mask"] = mask
    return out


class _BaseLoader:
    """Iterator over dataset entries in fixed-size batches."""

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool,
        num_workers: int = 0,
        drop_last: bool = True,
        seed: int = 0,
        prefetch_depth: int = 2,
        shard: Optional[tuple] = None,
    ):
        self.dataset = dataset
        self.batch_size = int(batch_size)
        self.shuffle = shuffle
        self.num_workers = int(num_workers)
        self.drop_last = drop_last
        self.seed = seed
        self.prefetch_depth = prefetch_depth
        # multi-host input pipeline: (process_index, process_count) strides
        # the (seed-synchronized) global order so each host reads a disjoint
        # slice — per-host feeding for pmap/pjit (SURVEY §5.8; the reference
        # had a single-process torch DataLoader only)
        self.shard = shard
        self._epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self._epoch = int(epoch)

    def iter_from(self, skip_batches: int) -> Iterator[Dict[str, Any]]:
        """Resume this epoch's deterministic order at batch index
        ``skip_batches`` WITHOUT fetching/decoding the skipped entries —
        mid-epoch resume must not replay the host decode cost of
        everything already trained (the skip happens at the index level,
        before any ``dataset[i]`` access). The offset belongs to the
        RETURNED iterator only; plain ``iter(loader)`` is unaffected."""
        return self._iterate(int(skip_batches))

    def _shard_size(self) -> int:
        n = len(self.dataset)
        if self.shard is None:
            return n
        _, world = self.shard
        return -(-n // world)  # wrap-padded: every host sees the same count

    def __len__(self) -> int:
        n = self._shard_size()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _order(self) -> np.ndarray:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        if self.shard is not None:
            rank, world = self.shard
            # wrap-pad so every host yields the SAME number of batches —
            # unequal counts deadlock multi-host lockstep collectives
            padded = -(-n // world) * world
            if padded > n:
                order = np.concatenate([order, order[: padded - n]])
            order = order[rank::world]
        return order

    def _batches(self, start_batch: int = 0) -> Iterator[List[int]]:
        order = self._order()
        bs = self.batch_size
        end = len(order) - (len(order) % bs) if self.drop_last else len(order)
        for i in range(start_batch * bs, end, bs):
            chunk = order[i : i + bs]
            if len(chunk):
                yield list(chunk)

    def __iter__(self) -> Iterator[Dict[str, Any]]:
        return self._iterate(0)

    def _iterate(self, start: int) -> Iterator[Dict[str, Any]]:
        if self.num_workers <= 0:
            for chunk in self._batches(start):
                yield collate([self.dataset[i] for i in chunk])
            return
        # threaded fetch with bounded prefetch; the stop event + put
        # timeouts let an abandoned iteration (break / islice) unblock and
        # reap the producer instead of leaking it on a full queue
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch_depth)
        pool = ThreadPoolExecutor(max_workers=self.num_workers)
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
                for chunk in self._batches(start):
                    if stop.is_set():
                        return
                    entries = list(pool.map(self.dataset.__getitem__, chunk))
                    if not offer(collate(entries)):
                        return
                offer(None)
            except BaseException as exc:  # propagate to the consumer
                offer(exc)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while True:  # drain so a blocked put wakes immediately
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            t.join()
            pool.shutdown(wait=True)  # producer is joined; workers are idle


def _config_shard(config, shard: Optional[tuple]) -> Optional[tuple]:
    """Resolve the loader's (rank, world) slice: an explicit ``shard=``
    wins, else DataConfig.shard_count/shard_rank (rank auto-detected from
    ``jax.process_index()`` when unset) — so config-built loaders shard
    without any manual plumbing (SURVEY §5.8 per-host feeding)."""
    if shard is not None:
        return shard
    count = getattr(config, "shard_count", None)
    if not count or int(count) <= 1:
        return None
    rank = getattr(config, "shard_rank", None)
    if rank is None:
        import jax

        rank = jax.process_index()
    rank, count = int(rank), int(count)
    if not 0 <= rank < count:
        raise ValueError(f"shard_rank {rank} outside [0, {count})")
    return (rank, count)


class VisionLanguageLoader(_BaseLoader):
    """(reference: loader.py:250-296)"""

    def __init__(self, config, dataset, train: bool = True, shard: Optional[tuple] = None):
        super().__init__(
            dataset,
            batch_size=config.train_batch_size if train else config.eval_batch_size,
            shuffle=config.shuffle if train else False,
            num_workers=config.num_workers if train else 0,
            drop_last=config.drop_last if train else False,
            prefetch_depth=config.prefetch_depth,
            shard=_config_shard(config, shard),
        )
        self.config = config
        self.train = train

    def transposed(self, max_size: int = 512) -> Iterator[Dict[str, Any]]:
        """Iterate sentence-major batches from an img_first dataset. The
        dataset's schema decides which keys are image-side (never
        flattened); datasets without the property fall back to the name
        table."""
        keys = getattr(self.dataset, "image_side_keys", None)
        for batch in self:
            yield transpose_vl(batch, max_size=max_size, image_side_keys=keys)


class VisionLoader(_BaseLoader):
    """(reference: loader.py:302-345)"""

    def __init__(self, config, dataset, train: bool = True, shard: Optional[tuple] = None):
        super().__init__(
            dataset,
            batch_size=config.train_batch_size if train else config.eval_batch_size,
            shuffle=config.shuffle if train else False,
            num_workers=config.num_workers if train else 0,
            drop_last=config.drop_last if train else False,
            prefetch_depth=config.prefetch_depth,
            shard=_config_shard(config, shard),
        )
        self.config = config
        self.train = train


def device_put_iter(
    loader,
    sharding=None,
    keys: Optional[List[str]] = None,
) -> Iterator[Dict[str, Any]]:
    """Double-buffered host->device feed: the next batch transfers while the
    caller computes on the current one (SURVEY §2.10 N8 replacement for the
    torch pinned-memory worker pool)."""
    import jax

    def put(batch):
        out = {}
        for k, v in batch.items():
            if keys is not None and k not in keys:
                continue
            if isinstance(v, np.ndarray) and v.dtype != object:
                out[k] = (
                    jax.device_put(v, sharding) if sharding is not None else jax.device_put(v)
                )
            else:
                out[k] = v
        return out

    it = iter(loader)
    try:
        pending = put(next(it))
    except StopIteration:
        return
    for batch in it:
        nxt = put(batch)  # transfer overlaps consumer compute
        yield pending
        pending = nxt
    yield pending
