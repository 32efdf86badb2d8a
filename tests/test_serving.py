"""Micro-batch serving layer (vltk_tpu/serving.py): coalescing
correctness, ordering, error fan-out, and the VQA predictor adapter.
The reference served with a bs=1 Python loop (vltk/abc/simple.py:576-682)
— this layer is what makes the fixed-shape buckets pay off across
concurrent callers."""

import threading
import time

import numpy as np
import pytest

from vltk_tpu.serving import MicroBatchServer, for_vqa


class _Recorder:
    """batch_fn that records call sizes and echoes request -> f(request)."""

    def __init__(self, fn=lambda r: r * 10, delay=0.0):
        self.sizes = []
        self.fn = fn
        self.delay = delay
        self.lock = threading.Lock()

    def __call__(self, requests):
        if self.delay:
            time.sleep(self.delay)
        with self.lock:
            self.sizes.append(len(requests))
        return [self.fn(r) for r in requests]


def test_single_request_roundtrip():
    rec = _Recorder()
    with MicroBatchServer(rec, batch_size=4, max_delay_ms=1) as srv:
        assert srv(7) == 70
    assert rec.sizes == [1]


def test_burst_coalesces_into_buckets():
    """32 concurrent callers over batch_size=8 must land in far fewer
    device calls than 32 — the whole point of the layer."""
    rec = _Recorder(delay=0.01)  # a slow step lets the queue build up
    results = {}

    with MicroBatchServer(rec, batch_size=8, max_delay_ms=50) as srv:
        def caller(i):
            results[i] = srv(i)

        threads = [
            threading.Thread(target=caller, args=(i,)) for i in range(32)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    assert results == {i: i * 10 for i in range(32)}
    assert sum(rec.sizes) == 32
    assert len(rec.sizes) <= 8  # at least 4x coalescing
    assert max(rec.sizes) == 8  # full buckets under sustained load
    stats = srv.stats
    assert stats["requests_served"] == 32
    lat = stats["latency_ms"]
    assert 0 < lat["p50"] <= lat["p95"] <= lat["p99"] <= lat["max"]


def test_results_keep_request_order_within_bucket():
    rec = _Recorder()
    srv = MicroBatchServer(rec, batch_size=16, max_delay_ms=100)
    futs = [srv.submit(i) for i in range(10)]
    assert [f.result() for f in futs] == [i * 10 for i in range(10)]
    srv.close()


def test_error_fans_out_to_all_callers():
    def boom(requests):
        raise ValueError("device fell over")

    with MicroBatchServer(boom, batch_size=4, max_delay_ms=20) as srv:
        futs = [srv.submit(i) for i in range(3)]
        for f in futs:
            with pytest.raises(ValueError, match="fell over"):
                f.result(timeout=5)


def test_poisoned_request_fails_alone():
    """One bad request sharing a bucket must fail only itself — peers get
    their results via the solo-retry path, not the old whole-bucket
    exception fan-out."""
    def fragile(requests):
        if any(r == "bad" for r in requests):
            raise ValueError("poisoned")
        return [r * 10 for r in requests]

    with MicroBatchServer(fragile, batch_size=4, max_delay_ms=200) as srv:
        futs = [srv.submit(r) for r in (1, "bad", 2)]
        assert futs[0].result(timeout=5) == 10
        with pytest.raises(ValueError, match="poisoned"):
            futs[1].result(timeout=5)
        assert futs[2].result(timeout=5) == 20
    assert srv.stats["requests_served"] == 2


def test_wrong_result_count_is_an_error():
    with MicroBatchServer(
        lambda reqs: [0], batch_size=4, max_delay_ms=20
    ) as srv:
        futs = [srv.submit(i) for i in range(2)]
        for f in futs:
            with pytest.raises(RuntimeError, match="results"):
                f.result(timeout=5)


def test_cancelled_future_does_not_kill_worker():
    """fut.cancel() before the bucket is served (e.g. a caller timeout)
    must drop that request, not InvalidStateError the worker thread —
    a dead worker would hang every later caller forever."""
    rec = _Recorder(delay=0.05)
    # batch_size=1: the first request claims the worker for 50 ms, so the
    # second sits unclaimed in the queue where cancel() must succeed
    with MicroBatchServer(rec, batch_size=1, max_delay_ms=0) as srv:
        warm = srv.submit(0)
        doomed = srv.submit(1)
        assert doomed.cancel()
        assert warm.result(timeout=5) == 0
        # worker must still be alive and serving
        assert srv(2) == 20
    assert doomed.cancelled()
    assert srv.stats["requests_served"] == 2  # the cancelled one dropped
    assert sum(rec.sizes) == 2  # ...and never reached batch_fn


def test_close_drains_pending_and_refuses_new():
    rec = _Recorder()
    srv = MicroBatchServer(rec, batch_size=4, max_delay_ms=500)
    futs = [srv.submit(i) for i in range(6)]
    srv.close()  # must serve all 6, not abandon the window
    assert [f.result(timeout=5) for f in futs] == [i * 10 for i in range(6)]
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(0)


def test_slow_batch_warns_and_is_tracked():
    """A batch that stalls (backend hiccup, in-flight recompile) strands
    every queued caller — it must surface in stats and warn, not pass
    silently (motivated by a measured ~17-min stall, BASELINE.md r4)."""
    rec = _Recorder(delay=0.05)
    with pytest.warns(UserWarning, match="MicroBatchServer: one batch"):
        with MicroBatchServer(
            rec, batch_size=2, max_delay_ms=1, slow_batch_warn_s=0.01
        ) as srv:
            assert srv(3) == 30
            stats = srv.stats
    assert stats["slowest_batch_ms"] >= 50.0

    # default threshold (30 s) stays quiet for normal batches
    import warnings

    rec2 = _Recorder()
    with warnings.catch_warnings(record=True) as caught:
        warnings.simplefilter("always")
        with MicroBatchServer(rec2, batch_size=2, max_delay_ms=1) as srv:
            assert srv(1) == 10
    assert not [w for w in caught if "MicroBatchServer" in str(w.message)]


def test_bad_batch_size_rejected():
    with pytest.raises(ValueError, match="batch_size"):
        MicroBatchServer(lambda r: r, batch_size=0)


def _tiny_predictor(tmp_path, batch_size=2):
    from tests.test_predict import ANSWERS, TINY_FRCNN, TINY_LXMERT
    from vltk_tpu.data.tokenizer import Tokenizer
    from vltk_tpu.predict import VQAPredictor

    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "what", "is", "the", "cat"]) + "\n")
    return VQAPredictor(
        ANSWERS,
        frcnn_config=TINY_FRCNN,
        lxmert_config=TINY_LXMERT,
        tokenizer=Tokenizer(
            name="NativeWordPiece", vocab_path=str(vocab), max_seq_length=8
        ),
        batch_size=batch_size,
        raw_canvas=(64, 64),
        resized_canvas=(64, 64),
        short=32.0,
        maximum=64.0,
    )


def test_cli_serve_jsonl_from_bundle(tmp_path, capsys, monkeypatch):
    """`vltk serve --bundle=` reads JSONL requests from stdin and writes
    in-order JSONL results; bad lines fail in sequence without killing
    the stream."""
    import io
    import json

    from PIL import Image

    from vltk_tpu.cli import main

    predictor = _tiny_predictor(tmp_path)
    bundle = str(tmp_path / "vqa.zip")
    predictor.export_bundle(bundle)

    rng = np.random.default_rng(0)
    imgs = []
    for i in range(3):
        p = tmp_path / f"img{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (48, 56, 3)).astype(np.uint8)
        ).save(p)
        imgs.append(str(p))
    lines = [
        json.dumps({"image": imgs[0], "question": "what is the cat"}),
        "this is not json",
        json.dumps({"image": imgs[1], "question": "what"}),
        json.dumps({"wrong": "keys"}),
        json.dumps({"image": imgs[2], "question": "the cat is what"}),
    ]
    monkeypatch.setattr("sys.stdin", io.StringIO("\n".join(lines) + "\n"))
    rc = main(["serve", f"--bundle={bundle}", "--max-delay-ms=20"])
    assert rc == 0
    out = [json.loads(ln) for ln in capsys.readouterr().out.splitlines()]
    assert len(out) == 5
    from tests.test_predict import ANSWERS

    assert out[0]["answer"] in ANSWERS
    assert "bad request" in out[1]["error"]
    assert out[2]["answer"] in ANSWERS
    assert "bad request" in out[3]["error"]
    assert out[4]["answer"] in ANSWERS
    # in-order parity with direct calls
    direct = predictor(
        [imgs[0], imgs[1], imgs[2]],
        ["what is the cat", "what", "the cat is what"],
    )
    assert [out[0]["answer"], out[2]["answer"], out[4]["answer"]] == [
        d["answer"] for d in direct
    ]


def test_cli_serve_request_response_client(tmp_path, monkeypatch):
    """A client that WAITS for each reply before sending its next request
    (the normal interactive protocol on a pipe) must not deadlock: results
    have to flush the moment they complete, not when the next stdin line
    happens to arrive."""
    import json
    import time

    from PIL import Image

    from vltk_tpu.cli import main

    predictor = _tiny_predictor(tmp_path)
    bundle = str(tmp_path / "vqa.zip")
    predictor.export_bundle(bundle)

    rng = np.random.default_rng(1)
    imgs = []
    for i in range(2):
        p = tmp_path / f"rr{i}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (48, 56, 3)).astype(np.uint8)
        ).save(p)
        imgs.append(str(p))
    lines = [
        json.dumps({"image": imgs[0], "question": "what is the cat"}),
        json.dumps({"image": imgs[1], "question": "what"}),
    ]

    written = []

    class _Out:
        def write(self, s):
            written.append(s)
            return len(s)

        def flush(self):
            pass

    def _responses():
        return "".join(written).count("\n")

    class _Stdin:
        """Yields request i+1 only after response i was written."""

        def __iter__(self):
            for i, ln in enumerate(lines):
                if i:
                    deadline = time.time() + 120
                    while _responses() < i:
                        if time.time() > deadline:
                            raise AssertionError(
                                "serve never flushed the previous result — "
                                "request-response client deadlock"
                            )
                        time.sleep(0.01)
                yield ln + "\n"

    monkeypatch.setattr("sys.stdin", _Stdin())
    monkeypatch.setattr("sys.stdout", _Out())
    rc = main(["serve", f"--bundle={bundle}", "--max-delay-ms=5"])
    assert rc == 0
    out = [json.loads(ln) for ln in "".join(written).splitlines()]
    assert len(out) == 2
    from tests.test_predict import ANSWERS

    assert out[0]["answer"] in ANSWERS and out[1]["answer"] in ANSWERS


def test_vqa_adapter_end_to_end(tmp_path):
    """Concurrent single (image, question) callers through the real tiny
    VQAPredictor match the direct batched call."""
    predictor = _tiny_predictor(tmp_path, batch_size=4)
    rng = np.random.default_rng(0)
    images = [
        rng.integers(0, 255, (48, 56, 3)).astype(np.uint8) for _ in range(6)
    ]
    questions = [f"what is the cat {i}" for i in range(6)]
    want = predictor(images, questions, top_k=2)

    results = {}
    with for_vqa(predictor, max_delay_ms=100) as srv:
        def caller(i):
            results[i] = srv((images[i], questions[i]))

        threads = [
            threading.Thread(target=caller, args=(i,)) for i in range(6)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert srv.stats["batches_run"] <= 3  # coalesced, not 6 bs=1 calls
    for i in range(6):
        assert results[i]["answer"] == want[i]["answer"]
        np.testing.assert_allclose(
            results[i]["score"], want[i]["score"], rtol=1e-5
        )


def test_multi_worker_overlap_correctness():
    """workers=2 overlaps bucket host prep with the previous bucket's
    step; every result must still be right and fully accounted."""
    rec = _Recorder(delay=0.02)
    results = {}
    with MicroBatchServer(
        rec, batch_size=4, max_delay_ms=10, workers=2
    ) as srv:
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(i, srv(i))
            )
            for i in range(24)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert results == {i: i * 10 for i in range(24)}
    assert srv.stats["requests_served"] == 24
    assert sum(rec.sizes) == 24


def test_multi_worker_close_drains_everything():
    rec = _Recorder()
    srv = MicroBatchServer(rec, batch_size=4, max_delay_ms=500, workers=3)
    futs = [srv.submit(i) for i in range(10)]
    srv.close()
    assert [f.result(timeout=5) for f in futs] == [
        i * 10 for i in range(10)
    ]
    with pytest.raises(RuntimeError, match="closed"):
        srv.submit(0)


def test_bad_workers_rejected():
    with pytest.raises(ValueError, match="workers"):
        MicroBatchServer(lambda r: r, batch_size=1, workers=0)
