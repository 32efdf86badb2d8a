"""Cross-request micro-batching for serving the predictors.

The predictors (vltk_tpu/predict.py) run fixed-shape compiled programs:
every call pads to a static ``batch_size`` bucket, so a single-item
request pays the whole bucket's compute. Production serving has many
concurrent single-item callers — the classic TPU answer is to coalesce
them: a background worker drains a queue into full buckets, runs ONE
compiled step, and fans results back out. Throughput approaches the
batch-dense number while per-request latency is bounded by
``max_delay_ms`` (the window the worker waits to fill a bucket).

The reference has no serving story at all — its eval path was a bs=1
Python loop (reference vltk/abc/simple.py:576-682). This module is the
deployment-side complement of the framework's fixed-shape thesis: the
same static bucket that makes XLA compile once is what makes cross-user
batching trivially correct (no shape bucketing tiers needed).

Works with any callable that maps a list of requests to a list of
results (one per request, in order); ``for_vqa`` / ``for_doc`` /
``for_span`` adapt the three predictors.
"""

from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from typing import Any, Callable, List, Optional, Sequence, Tuple


class MicroBatchServer:
    """Coalesce concurrent single requests into batched predictor calls.

    Args:
      batch_fn: ``List[request] -> List[result]`` (same length/order).
      batch_size: bucket capacity per call — the predictor's static
        ``batch_size`` (larger wastes padding, smaller wastes capacity).
      max_delay_ms: how long the worker waits for more requests after the
        first one arrives before running a partial bucket. The knee of
        the latency/throughput trade: 0 serves immediately (bs=1-like),
        a few ms rides bursts into full buckets.

    Thread-safe; ``submit`` returns a ``concurrent.futures.Future``,
    ``__call__`` blocks for the result. Use as a context manager or call
    ``close()`` — pending requests are drained before shutdown.
    """

    def __init__(
        self,
        batch_fn: Callable[[List[Any]], Sequence[Any]],
        batch_size: int,
        max_delay_ms: float = 5.0,
        workers: int = 1,
        slow_batch_warn_s: float = 30.0,
    ):
        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        if workers < 1:
            raise ValueError(f"workers must be >= 1, got {workers}")
        self._batch_fn = batch_fn
        self._batch_size = int(batch_size)
        self._max_delay = max(float(max_delay_ms), 0.0) / 1e3
        # observability: a batch that silently takes minutes (backend
        # stall, in-flight recompile) strands every queued caller with no
        # signal — warn post-hoc when one exceeds this (0 disables).
        # Motivated by a measured ~17-minute one-off stall in a bench run
        # (BASELINE.md r4 serving note).
        self._slow_batch_warn = max(float(slow_batch_warn_s), 0.0)
        self._slowest_batch = 0.0
        self._queue: "queue.Queue[Optional[Tuple[Any, Future, float]]]" = (
            queue.Queue()
        )
        self._batches_run = 0  # observability: how often we hit the device
        self._requests_served = 0
        # submit->result latencies, bounded ring (production meaning: the
        # number users feel; batches_run/requests_served is the fill rate)
        self._latencies: List[float] = []
        self._lat_cap = 4096
        self._stats_lock = threading.Lock()
        self._closed = False
        # orders every submit's enqueue against close()'s sentinel, so no
        # request can land behind the sentinel and hang its caller
        self._submit_lock = threading.Lock()
        # workers > 1 overlaps bucket i+1's host prep + dispatch with
        # bucket i's device step + result fetch (the single-worker loop
        # leaves the device idle during every fetch). Requires a
        # thread-safe batch_fn — the built-in predictors are (jit calls
        # are thread-safe; their one mutation, lazy int8 calibration, is
        # locked). Per-bucket result order is unaffected.
        self._workers = [
            threading.Thread(
                target=self._run, daemon=True, name=f"vltk-serve-{i}"
            )
            for i in range(int(workers))
        ]
        for t in self._workers:
            t.start()

    # ------------------------------------------------------------- api ----
    def submit(self, request: Any) -> "Future":
        fut: Future = Future()
        with self._submit_lock:
            if self._closed:
                raise RuntimeError("server is closed")
            self._queue.put((request, fut, time.monotonic()))
        return fut

    def __call__(self, request: Any) -> Any:
        return self.submit(request).result()

    def close(self) -> None:
        """Drain pending requests, then stop the workers."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            for _ in self._workers:
                self._queue.put(None)  # sentinel: drain-and-exit
        for t in self._workers:
            t.join()

    def __enter__(self) -> "MicroBatchServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    @property
    def stats(self) -> dict:
        with self._stats_lock:
            out = {
                "batches_run": self._batches_run,
                "requests_served": self._requests_served,
                "slowest_batch_ms": round(self._slowest_batch * 1e3, 3),
            }
            lats = sorted(self._latencies)
        if lats:
            pick = lambda q: lats[  # noqa: E731
                min(int(q * len(lats)), len(lats) - 1)
            ]
            out["latency_ms"] = {
                "p50": round(pick(0.50) * 1e3, 3),
                "p95": round(pick(0.95) * 1e3, 3),
                "p99": round(pick(0.99) * 1e3, 3),
                "max": round(lats[-1] * 1e3, 3),
            }
        return out

    # ---------------------------------------------------------- worker ----
    def _run(self) -> None:
        while True:
            head = self._queue.get()
            if head is None:
                return
            bucket = [head]
            # the first request opens a window: wait up to max_delay for
            # the bucket to fill (past the deadline, still drain whatever
            # is already queued — a burst should ride one bucket)
            deadline = time.monotonic() + self._max_delay
            while len(bucket) < self._batch_size:
                remaining = deadline - time.monotonic()
                try:
                    if remaining > 0:
                        item = self._queue.get(timeout=remaining)
                    else:
                        item = self._queue.get_nowait()
                except queue.Empty:
                    break
                if item is None:
                    self._serve(bucket)
                    return
                bucket.append(item)
            self._serve(bucket)

    def _serve(self, bucket: List[Tuple[Any, Future, float]]) -> None:
        # claim each future: a caller-cancelled one (e.g. a timeout
        # wrapper) is dropped here — set_result on it would raise
        # InvalidStateError and kill the worker; once claimed, cancel()
        # can no longer succeed, so the sets below are safe
        bucket = [
            item for item in bucket if item[1].set_running_or_notify_cancel()
        ]
        if not bucket:
            return
        requests = [r for r, _, _ in bucket]
        _bt0 = time.monotonic()
        try:
            results = list(self._batch_fn(requests))
        except BaseException as exc:
            if len(bucket) == 1:
                bucket[0][1].set_exception(exc)
                return
            # one poisoned request (bad path, malformed dict) must not
            # fail its co-batched peers: retry each request alone — the
            # fixed-bucket batch_fn pads a single-item list into the same
            # program — and fan out only the individual failures
            for req, fut, t0 in bucket:
                try:
                    solo = list(self._batch_fn([req]))
                except BaseException as solo_exc:
                    fut.set_exception(solo_exc)
                else:
                    if len(solo) == 1:
                        self._finish(fut, t0, solo[0])
                    else:
                        fut.set_exception(RuntimeError(
                            f"batch_fn returned {len(solo)} results for "
                            "1 request"
                        ))
            return
        if len(results) != len(requests):
            # an adapter contract bug, not a poisoned request: solo
            # retries would mask it (a constant-length return looks fine
            # at batch size 1), so it fans out to the whole bucket
            exc: BaseException = RuntimeError(
                f"batch_fn returned {len(results)} results for "
                f"{len(requests)} requests"
            )
            for _, fut, _ in bucket:
                fut.set_exception(exc)
            return
        dur = time.monotonic() - _bt0
        for (_, fut, t0), res in zip(bucket, results):
            self._finish(fut, t0, res)
        with self._stats_lock:
            self._batches_run += 1
            self._slowest_batch = max(self._slowest_batch, dur)
        if self._slow_batch_warn and dur > self._slow_batch_warn:
            import warnings

            warnings.warn(
                f"MicroBatchServer: one batch of {len(bucket)} took "
                f"{dur:.1f}s (threshold {self._slow_batch_warn:.0f}s) — "
                "backend stall or in-flight recompile; every queued "
                "caller waited behind it",
                stacklevel=2,
            )

    def _finish(self, fut: "Future", t0: float, res: Any) -> None:
        with self._stats_lock:
            self._requests_served += 1
            if len(self._latencies) >= self._lat_cap:
                del self._latencies[: self._lat_cap // 2]
            self._latencies.append(time.monotonic() - t0)
        fut.set_result(res)


# ------------------------------------------------------------ adapters ----


def for_vqa(
    predictor, max_delay_ms: float = 5.0, top_k: int = 5, workers: int = 1
) -> MicroBatchServer:
    """Serve a VQAPredictor: request = (image, question) -> result dict."""
    return MicroBatchServer(
        lambda reqs: predictor(
            [r[0] for r in reqs], [r[1] for r in reqs], top_k=top_k
        ),
        batch_size=predictor.batch_size,
        max_delay_ms=max_delay_ms,
        workers=workers,
    )


def for_doc(
    classifier, max_delay_ms: float = 5.0, workers: int = 1
) -> MicroBatchServer:
    """Serve a DocTokenClassifier: request = document dict -> word labels."""
    return MicroBatchServer(
        lambda reqs: classifier(list(reqs)),
        batch_size=classifier.batch_size,
        max_delay_ms=max_delay_ms,
        workers=workers,
    )


def for_span(
    span_qa, max_delay_ms: float = 5.0, workers: int = 1
) -> MicroBatchServer:
    """Serve a DocSpanQA: request = (document, question) -> span dict."""
    return MicroBatchServer(
        lambda reqs: span_qa([r[0] for r in reqs], [r[1] for r in reqs]),
        batch_size=span_qa.batch_size,
        max_delay_ms=max_delay_ms,
        workers=workers,
    )
