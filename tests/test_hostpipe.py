"""Mechanism tests for the multi-core host ETL (data/hostpipe.py).

The BASELINE.md host-plane row extrapolates "~N_cores x the per-core
number, with the arrow writer shardable per worker"; these tests make
that claim rest on a tested code path (VERDICT r4 task 8): a 2-worker
process-pool run must produce EXACTLY the single-process pipeline's
output — same rows, same order, same metadata — even on a 1-core box
(correctness is scheduling-independent; only throughput needs cores).

Reference counterpart: torch DataLoader worker processes
(reference: vltk/dataset/loader.py:281-296).
"""

import os

import numpy as np
import pytest
from PIL import Image

from vltk_tpu import vars as V
from vltk_tpu.data.hostpipe import (
    HostDecodeFRCNN,
    TinyHostDecodeFRCNN,
    run_sharded_split,
)

N_IMAGES = 11  # odd: exercises the ragged final batch in every shard split


@pytest.fixture(scope="module")
def img_dir(tmp_path_factory):
    """Synthetic jpgs with varied sub-canvas sizes (decode + pad is real)."""
    root = tmp_path_factory.mktemp("hostpipe_imgs")
    rng = np.random.default_rng(0)
    sizes = [(40, 64), (64, 48), (96, 96), (32, 80)]
    for i in range(N_IMAGES):
        h, w = sizes[i % len(sizes)]
        arr = rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        Image.fromarray(arr).save(root / f"img_{i:04d}.jpg")
    return root


@pytest.fixture(scope="module")
def id2path(img_dir):
    return {
        f"img_{i:04d}": str(img_dir / f"img_{i:04d}.jpg")
        for i in range(N_IMAGES)
    }


def _rows(adapter):
    t = adapter.table
    return {
        "imgids": t[V.imgid].to_pylist(),
        "rawsize": t[V.rawsize].to_pylist(),
        "boxes": t[V.boxes].to_pylist(),
    }


def test_two_workers_match_inline(id2path, tmp_path):
    inline, _ = run_sharded_split(
        TinyHostDecodeFRCNN, id2path, str(tmp_path / "inline.arrow"),
        num_workers=0,
    )
    pooled, stats = run_sharded_split(
        TinyHostDecodeFRCNN, id2path, str(tmp_path / "pooled.arrow"),
        num_workers=2,
    )
    assert pooled.num_rows == inline.num_rows == N_IMAGES
    # identical rows in identical order (contiguous shards + in-order merge)
    assert _rows(pooled) == _rows(inline)
    assert pooled.img_to_row_map == inline.img_to_row_map
    # row map indexes the merged table correctly
    for imgid, row in pooled.img_to_row_map.items():
        assert pooled.table[V.imgid][row].as_py() == imgid
    assert stats["aggregate"]["workers"] == 2


def test_stage_accounting(id2path, tmp_path):
    _, stats = run_sharded_split(
        TinyHostDecodeFRCNN, id2path, str(tmp_path / "acct.arrow"),
        num_workers=2,
    )
    agg = stats["aggregate"]
    assert agg["n_images"] == N_IMAGES
    assert agg["decode_s"] > 0.0
    assert agg["wall_s"] > 0.0
    assert agg["img_per_s"] > 0.0
    assert {"decode_s", "collate_s", "forward_s", "write_s"} <= set(agg)
    assert len(stats["per_worker"]) == 2
    # contiguous split of 11 over 2 workers: ceil(11*1/2)=5/6 images
    per_counts = sorted(s["n_images"] for s in stats["per_worker"])
    assert sum(per_counts) == N_IMAGES
    assert all(s["n_batches"] >= 1 for s in stats["per_worker"])


def test_worker_count_clamped_to_items(id2path, tmp_path):
    adapter, stats = run_sharded_split(
        TinyHostDecodeFRCNN,
        {k: id2path[k] for k in sorted(id2path)[:2]},
        str(tmp_path / "clamp.arrow"),
        num_workers=8,
    )
    assert adapter.num_rows == 2
    assert stats["aggregate"]["workers"] <= 2


def test_extract_integration(img_dir, tmp_path):
    """VisnExtraction.extract(host_workers=2) routes through hostpipe and
    matches the single-process extract byte-for-byte on the row level."""
    datadir = tmp_path / "data"
    coco_train = datadir / "coco2014" / "train"
    coco_train.mkdir(parents=True)
    for i in range(N_IMAGES):
        os.link(
            img_dir / f"img_{i:04d}.jpg",
            coco_train / f"COCO_train2014_{i:012d}.jpg",
        )

    single = TinyHostDecodeFRCNN.extract(
        str(datadir), dataset_name="coco2014"
    )["train"]
    rows_single = _rows(single)

    pooled = TinyHostDecodeFRCNN.extract(
        str(datadir), dataset_name="coco2014", host_workers=2
    )["train"]
    assert _rows(pooled) == rows_single
    assert pooled.img_to_row_map == single.img_to_row_map
    # extra metadata survives the merge path
    assert pooled.metadata["model_config"] == {"model": "host-decode-stub"}
    # stage accounting is attached for capacity planning
    assert pooled.host_stats["aggregate"]["n_images"] == N_IMAGES


def test_device_adapter_rejected(tmp_path):
    from vltk_tpu.adapters.frcnn import FRCNN

    with pytest.raises(ValueError, match="host-only"):
        FRCNN.extract(str(tmp_path), dataset_name="coco2014", host_workers=2)


def test_local_class_rejected(id2path, tmp_path):
    class Local(HostDecodeFRCNN):
        pass

    with pytest.raises(ValueError, match="module scope"):
        run_sharded_split(
            Local, id2path, str(tmp_path / "x.arrow"), num_workers=2
        )
