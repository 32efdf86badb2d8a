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


def test_build_real_batch(tmp_path):
    """--pareto's image plane: staged jpgs decode through the extraction
    adapter's own uint8 pipeline into one padded raw batch."""
    vc = _load_script()
    from PIL import Image

    src = tmp_path / "vg" / "VG_100K"
    src.mkdir(parents=True)
    rng = np.random.default_rng(0)
    for imgid, hw in (("1002", (32, 48)), ("1006", (40, 36))):
        Image.fromarray(
            rng.integers(0, 256, (*hw, 3)).astype(np.uint8)
        ).save(src / f"{imgid}.jpg")
    work = tmp_path / "work"
    work.mkdir()
    raw, raw_sizes = vc.build_real_batch(
        ["1002", "1006"], str(tmp_path / "vg"), str(work)
    )
    assert raw.dtype == np.uint8 and raw.shape[0] == 2 and raw.shape[3] == 3
    np.testing.assert_array_equal(raw_sizes, [[32, 48], [40, 36]])
    # padding beyond each image's true extent is zero
    assert raw[0, 32:, :, :].max() == 0 and raw[1, :, 36:, :].max() == 0


def test_preset_drift_accepts_supplied_weights_and_images(capsys):
    """The harness half of --pareto: run_preset_drift with supplied params
    and real (here: synthetic) uint8 images skips init/taming and labels
    the output as a checkpoint run."""
    import json as _json
    import sys as _sys
    import types

    _sys.path.insert(0, REPO)
    try:
        import bench
    finally:
        _sys.path.pop(0)
    import jax
    import jax.numpy as jnp
    import numpy as np_
    from vltk_tpu.models import FRCNN, FRCNNConfig

    tiny = dict(
        depth=50, stem_out_channels=8, res2_out_channels=16,
        width_per_group=4, rpn_hidden_channels=16, anchor_sizes=(16, 32),
        num_classes=7, num_attrs=5, pooler_resolution=7,
        min_detections=4, max_detections=4,
    )
    cfg = FRCNNConfig(dtype="bfloat16", post_nms_topk=16, pre_nms_topk=64,
                      **tiny)
    params = bench._tame_params(
        FRCNN(cfg=cfg).init(
            jax.random.PRNGKey(7),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            jnp.asarray([[64.0, 64.0]]),
        )["params"]
    )  # a real checkpoint detects; bare random init does not
    rng = np_.random.default_rng(3)
    raw = rng.integers(0, 256, (2, 64, 64, 3)).astype(np_.uint8)
    bench.run_preset_drift(
        types.SimpleNamespace(smoke=True, batch=2, steps=1, roi_chunk=None),
        params=params, raw=raw, raw_sizes=np_.asarray([[48, 64], [64, 48]]),
    )
    out = _json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["weights"] == "supplied-checkpoint"
    assert out["note"] == "real-weight production budget"
    rows = {r["preset"]: r for r in out["rows"]}
    assert rows["parity_300"]["box_agreement@iou0.5"] == 1.0


@pytest.mark.skipif(
    not (os.environ.get("VLTK_TPU_FRCNN_CKPT") and os.environ.get("VLTK_TPU_VG_IMAGES")),
    reason="real-weight closure needs VLTK_TPU_FRCNN_CKPT (local "
    "unc-nlp/frcnn-vg-finetuned state_dict) and VLTK_TPU_VG_IMAGES "
    "(directory with the VG fixture images)",
)
def test_real_checkpoint_pareto():
    """One command replaces every random-init asterisk: the preset Pareto
    measured with the real checkpoint on the fixture's images."""
    vc = _load_script()
    assert vc.run_pareto(
        os.environ["VLTK_TPU_FRCNN_CKPT"],
        os.environ["VLTK_TPU_VG_IMAGES"],
        FIXTURE,
    ) == 0


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
