"""Core layer: vars, features, config, utils."""

import json
import os

import numpy as np
import pytest

import vltk_tpu as vltk
from vltk_tpu import vars as V
from vltk_tpu.config import Config, DataConfig, unflatten_dict
from vltk_tpu.features import Features
from vltk_tpu.utils import adapters as A
from vltk_tpu.utils import base as B


class TestVars:
    def test_canonical_keys(self):
        assert vltk.imgid == "imgid"
        assert vltk.boxes == "boxes"
        assert vltk.features == "features"
        assert vltk.scale == "wh_scale"
        assert vltk.img == "image"

    def test_overlap_renames(self):
        assert V.VLOVERLAP[V.text] == "vtext"
        assert V.VLOVERLAP[V.labels] == "vlabels"


class TestConfig:
    def test_defaults_and_iteration(self):
        cfg = Config()
        d = cfg.to_dict()
        assert d["data"]["train_batch_size"] == 32
        assert d["data"]["lang"]["max_seq_length"] == 128

    def test_recursive_update_and_coercion(self):
        cfg = Config()
        cfg.update({"data": {"train_batch_size": "64", "img_first": "true"}})
        assert cfg.data.train_batch_size == 64
        assert cfg.data.img_first is True
        assert "train_batch_size" in cfg.data.overwritten

    def test_unknown_key_raises(self):
        with pytest.raises(KeyError):
            Config().update({"nope": 1})

    def test_dot_flags(self):
        cfg = Config.from_flags(**{"data.eval_batch_size": "16",
                                   "train.learning_rate": "3e-5"})
        assert cfg.data.eval_batch_size == 16
        assert cfg.train.learning_rate == pytest.approx(3e-5)

    def test_unflatten(self):
        assert unflatten_dict({"a.b.c": 1, "a.d": 2}) == {
            "a": {"b": {"c": 1}, "d": 2}
        }

    def test_yaml_roundtrip(self, tmp_path):
        cfg = Config()
        cfg.data.train_batch_size = 8
        p = str(tmp_path / "c.yaml")
        cfg.dump_yaml(p)
        cfg2 = Config.from_yaml(p)
        assert cfg2.data.train_batch_size == 8


class TestFeatures:
    def test_fixed_shape_types(self):
        from datasets import Array2D, Array3D

        assert isinstance(Features.Boxtensor(36), Array2D)
        assert Features.Boxtensor(36).shape == (36, 4)
        assert isinstance(Features.Features3D(36, 64), Array3D)
        assert Features.FeaturesMatrix(36, 2048).shape == (36, 2048)


class TestUtilsBase:
    def test_set_get_metadata(self):
        import pyarrow as pa

        t = pa.table({"x": [1, 2, 3]})
        t2 = B.set_metadata(t, {"img_to_row_map": {"a": 0}, "note": [1, 2]})
        meta = B.get_metadata(t2)
        assert meta["img_to_row_map"] == {"a": 0}
        assert meta["note"] == [1, 2]

    def test_try_load(self, tmp_path):
        p = tmp_path / "x.json"
        p.write_text(json.dumps({"a": 1}))
        assert B.try_load(str(p)) == {"a": 1}
        assert B.try_load(str(tmp_path / "missing.json")) is None

    def test_batcher(self):
        assert list(B.batcher(range(5), 2)) == [[0, 1], [2, 3], [4]]

    def test_mergedicts(self):
        assert B.mergedicts({"a": {"b": 1}, "c": 2}, {"a": {"d": 3}}) == {
            "a": {"b": 1, "d": 3},
            "c": 2,
        }

    def test_convertids_recursive(self):
        ids = {"labels": {"cat": 0, "dog": 1}}
        out = B.convertids_recursive(
            {"labels": ["cat", "dog", "bird"], "text": "hi"}, ids
        )
        assert out["labels"] == [0, 1, -1]
        assert out["text"] == "hi"


class TestUtilsAdapters:
    def test_pad_tensor(self):
        arr = np.ones((3, 4), np.float32)
        out = A.pad_tensor(arr, 5)
        assert out.shape == (5, 4) and out[3:].sum() == 0
        assert A.pad_tensor(arr, 2).shape == (2, 4)

    def test_polygon_to_mask(self):
        # unit square from (2,2) to (6,6)
        mask = A.polygon_to_mask([[2, 2, 6, 2, 6, 6, 2, 6]], 8, 8)
        assert mask.shape == (8, 8)
        assert mask[4, 4] == 1 and mask[0, 0] == 0

    def test_rle_roundtrip(self):
        m = np.zeros((4, 6), np.uint8)
        m[1:3, 2:5] = 1
        counts = A.rle_encode(m)
        back = A.rle_decode(counts, 4, 6)
        np.testing.assert_array_equal(m, back)

    def test_imagepoints_to_mask(self):
        mask = A.imagepoints_to_mask([0, 3, 10, 2], (4, 4))
        assert mask.reshape(-1)[:3].all()
        assert mask.reshape(-1)[10:12].all()
        assert mask.sum() == 5

    def test_resize_binary_mask(self):
        m = np.zeros((4, 4), np.uint8)
        m[:2] = 1
        out = A.resize_binary_mask(m, (8, 8))
        assert out.shape == (8, 8) and out[:3].all()

    def test_rescale_box_and_conversions(self):
        b = np.array([[10, 20, 30, 40]], np.float32)
        out = A.rescale_box(b, (2.0, 0.5))
        np.testing.assert_allclose(out, [[20, 10, 60, 20]])
        xyxy = A.xywh_to_xyxy(b)
        np.testing.assert_allclose(xyxy, [[10, 20, 40, 60]])
        np.testing.assert_allclose(A.xyxy_to_xywh(xyxy), b)

    def test_clean_label(self):
        assert A.clean_label("The CAT!") == "cat"
        assert A.clean_label("a dog.") == "dog"

    def test_soft_score(self):
        assert A.soft_score(0) == 0.0
        assert A.soft_score(1) == 0.3
        assert A.soft_score(3) == 0.9
        assert A.soft_score(10) == 1.0

    def test_jaccard_span(self):
        words = ["the", "total", "amount", "due", "is", "fifty"]
        span, sim = A.get_span_via_jaccard(words, "amount due")
        assert span == (2, 3)
        assert sim > 0.56
        none_span, _ = A.get_span_via_jaccard(words, "zzzzqqqq")
        assert none_span is None

    def test_truncate_and_pad_list(self):
        assert A.truncate_and_pad_list([1, 2, 3], 5) == [1, 2, 3, 0, 0]
        assert A.truncate_and_pad_list([1, 2, 3], 2) == [1, 2]

    def test_map_ocr_predictions(self):
        preds = [1, 1, 2, 3, 3, 3]
        tokenmap = [2, 1, 3]
        assert A.map_ocr_predictions(preds, tokenmap) == [1, 2, 3]
        assert A.map_ocr_predictions(preds, tokenmap, mode="first") == [1, 2, 3]


class TestInspection:
    def test_collect_args(self):
        from vltk_tpu.inspection import collect_args_to_func

        def f(a, b=2):
            return a + b

        assert collect_args_to_func(f, {"a": 1, "z": 9}) == {"a": 1}
        with pytest.raises(ValueError):
            collect_args_to_func(f, {"z": 9}, mandatory=True)


def test_package_root_mirrors_reference_exports():
    """Every name the reference exposed at its package root
    (vltk/__init__.py:3-13) resolves here, so `from vltk import X` ports
    mechanically to `from vltk_tpu import X`."""
    for name in (
        "VisnExtraction", "VisnDataset", "VisnLangDataset", "Adapters",
        "DataConfig", "LangConfig", "VisionConfig", "Features",
        "Processors", "VisnProcessor", "LangProcessor",
        "VisnLangProcessor", "build",
    ):
        assert getattr(vltk, name) is not None, name
    # canonical key strings ride along via `from vltk_tpu.vars import *`
    assert isinstance(vltk.imgid, str) and isinstance(vltk.features, str)
