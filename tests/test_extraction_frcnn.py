"""End-to-end batched FRCNN extraction pipeline + device preprocess tests."""

import json
import os

import numpy as np
import pytest
from PIL import Image

jax = pytest.importorskip("jax")
import jax.numpy as jnp

import vltk_tpu.vars as V
from vltk_tpu.ops.image_ops import preprocess_batch, shortest_edge_scale
from vltk_tpu.processing.image import shortest_edge_size


class TestDevicePreprocess:
    def test_size_bookkeeping_matches_host(self, rng):
        raw = jnp.asarray([[480, 640], [640, 480], [1024, 300]], jnp.int32)
        _, new_hw = shortest_edge_scale(raw, 800.0, 1333.0)
        got = np.asarray(new_hw)
        for i, (h, w) in enumerate([(480, 640), (640, 480), (1024, 300)]):
            np.testing.assert_allclose(
                got[i], shortest_edge_size(h, w, 800, 1333)
            )

    def test_identity_scale_matches_normalize_pad(self, rng):
        img = rng.uniform(0, 255, size=(32, 48, 3)).astype(np.float32)
        canvas = np.zeros((64, 64, 3), np.float32)
        canvas[:32, :48] = img
        out = preprocess_batch(
            jnp.asarray(canvas[None]),
            jnp.asarray([[32, 48]], jnp.int32),
            canvas_hw=(64, 64),
            short=32.0,
            maximum=48.0,
        )
        got = np.asarray(out["img"])[0]
        mean = np.asarray([102.9801, 115.9465, 122.7717], np.float32)
        expected = img[..., ::-1] - mean
        np.testing.assert_allclose(got[:32, :48], expected, atol=1e-3, rtol=1e-5)
        assert np.abs(got[32:]).sum() == 0 and np.abs(got[:, 48:]).sum() == 0
        np.testing.assert_allclose(np.asarray(out["sizes"])[0], [32, 48])
        np.testing.assert_allclose(np.asarray(out["scales_yx"])[0], [1.0, 1.0])

    def test_upscale_scales_yx(self):
        img = np.full((16, 16, 3), 128.0, np.float32)
        canvas = np.zeros((64, 64, 3), np.float32)
        canvas[:16, :16] = img
        out = preprocess_batch(
            jnp.asarray(canvas[None]),
            jnp.asarray([[16, 16]], jnp.int32),
            canvas_hw=(64, 64),
            short=32.0,
            maximum=64.0,
        )
        np.testing.assert_allclose(np.asarray(out["sizes"])[0], [32, 32])
        np.testing.assert_allclose(np.asarray(out["scales_yx"])[0], [0.5, 0.5])
        got = np.asarray(out["img"])[0]
        # interior of the doubled region is constant 128 (BGR-mean shifted)
        mean = np.asarray([102.9801, 115.9465, 122.7717], np.float32)
        np.testing.assert_allclose(
            got[2:30, 2:30], np.broadcast_to(128.0 - mean, (28, 28, 3)), atol=1e-3
        )


@pytest.fixture
def coco_images(tmp_path, rng):
    img_dir = tmp_path / "coco2014" / "train"
    ann_dir = tmp_path / "coco2014" / "annotations"
    img_dir.mkdir(parents=True)
    ann_dir.mkdir(parents=True)
    ids = []
    for i in range(5):
        imgid = 7000 + i
        h, w = (40 + 4 * i, 56)
        arr = (rng.random((h, w, 3)) * 255).astype("uint8")
        Image.fromarray(arr).save(img_dir / f"COCO_train2014_{imgid:012d}.jpg")
        ids.append(f"COCO_train2014_{imgid:012d}")
    (ann_dir / "instances_train2014.json").write_text(
        json.dumps({"images": [], "annotations": [], "categories": []})
    )
    return str(tmp_path), ids


class TestFRCNNExtraction:
    def test_extract_writes_fixed_shape_features(self, coco_images):
        datadir, ids = coco_images
        from vltk_tpu.adapters import Adapters
        from vltk_tpu.adapters.frcnn import FRCNN as FRCNNAdapter

        class TinyFRCNN(FRCNNAdapter):
            _name = "tinyfrcnn"
            model_batch_size = 2
            raw_canvas = (64, 64)
            resized_canvas = (64, 64)
            short = 48.0
            maximum = 64.0

        Adapters.add(TinyFRCNN)
        out = TinyFRCNN.extract(
            datadir,
            "coco2014",
            splits=["train"],
            # tiny model (FRCNNConfig overrides flow through setup kwargs)
            depth=50,
            stem_out_channels=8,
            res2_out_channels=16,
            width_per_group=4,
            rpn_hidden_channels=16,
            anchor_sizes=(16, 32),
            pre_nms_topk=64,
            post_nms_topk=16,
            num_classes=7,
            num_attrs=5,
            pooler_resolution=7,
            min_detections=4,
            max_detections=4,
            visual_dim=16 * 8,
        )
        adapter = out["train"]
        assert adapter.num_rows == 5
        assert set(ids) == set(adapter.imgids)
        entry = adapter.get(ids[0])
        feats = np.asarray(entry[V.features])
        assert feats.shape == (4, 128)
        boxes = np.asarray(entry[V.boxes])
        assert boxes.shape == (4, 4)
        # boxes are in raw-image coordinates: within the raw canvas bounds
        assert (boxes <= 64).all() and (boxes >= 0).all()
        assert len(entry["object_ids"]) == 4
        # raw extent rides with every row so consumers can normalize the
        # raw-coordinate boxes (experiments/lxmert_vqa.prepare_batch)
        rawsize = [int(x) for x in entry[V.rawsize]]
        assert len(rawsize) == 2 and all(0 < x <= 64 for x in rawsize)
        # metadata captured the model config
        assert adapter.metadata["model_config"]["max_detections"] == 4

    def test_extract_int8_lazy_calibration(self, coco_images):
        """int8=True flows through setup; the first batch triggers the
        one-time static-PTQ calibration (adapters/frcnn.py
        forward_dispatch) and extraction completes with fixed shapes."""
        datadir, ids = coco_images
        from vltk_tpu.adapters import Adapters
        from vltk_tpu.adapters.frcnn import FRCNN as FRCNNAdapter

        class TinyInt8FRCNN(FRCNNAdapter):
            _name = "tinyint8frcnn"
            model_batch_size = 2
            raw_canvas = (64, 64)
            resized_canvas = (64, 64)
            short = 48.0
            maximum = 64.0

        Adapters.add(TinyInt8FRCNN)
        out = TinyInt8FRCNN.extract(
            datadir,
            "coco2014",
            splits=["train"],
            depth=50,
            stem_out_channels=8,
            res2_out_channels=16,
            width_per_group=4,
            rpn_hidden_channels=16,
            anchor_sizes=(16, 32),
            pre_nms_topk=64,
            post_nms_topk=16,
            num_classes=7,
            num_attrs=5,
            pooler_resolution=7,
            min_detections=4,
            max_detections=4,
            visual_dim=16 * 8,
            int8=True,
            roi_chunk=8,  # scan path must accept the quant collection
        )
        adapter = out["train"]
        assert adapter.num_rows == 5
        feats = np.asarray(adapter.get(ids[0])[V.features])
        assert feats.shape == (4, 128)
        assert np.isfinite(feats).all()


class TestPresetResolution:
    def test_setup_preset_merge_rules(self):
        """`vltk extract frcnn <ds> --preset=NAME`: the named preset sets
        the config; explicit dtype and explicit overrides win over it;
        non-config kwargs (extraction-driver knobs) are dropped."""
        from vltk_tpu.adapters.frcnn import _resolve_config

        cfg = _resolve_config("int8_200", None, {})
        assert cfg.int8 and cfg.post_nms_topk == 200 and cfg.dtype == "bfloat16"
        # explicit override beats the preset field
        cfg = _resolve_config("int8_200", "float32", {"post_nms_topk": 77})
        assert cfg.dtype == "float32" and cfg.post_nms_topk == 77 and cfg.int8
        # no preset: prior behavior (defaults + overrides)
        cfg = _resolve_config(None, None, {"post_nms_topk": 300,
                                           "batch_hint": 9})
        assert cfg.post_nms_topk == 300 and cfg.dtype is None
        import pytest as _pytest

        with _pytest.raises(ValueError, match="unknown preset"):
            _resolve_config("nope", None, {})


class TestHostPipelineGate:
    def test_device_fused_pipeline_does_not_pad(self, tmp_path, rng):
        """The extractor's host pipeline only decodes: padding before the
        device-side shortest-edge resize would bake pad into content and
        destroy raw-size bookkeeping."""
        from PIL import Image

        from vltk_tpu.adapters.frcnn import FRCNN as FRCNNAdapter
        from vltk_tpu import vars as V

        path = str(tmp_path / "img.jpg")
        Image.fromarray(
            (rng.uniform(0, 255, (48, 64, 3))).astype("uint8")
        ).save(path)
        pipe = FRCNNAdapter.default_processor.build()
        entry = pipe({V.filepath: path})
        assert entry[V.img].shape[:2] == (48, 64)  # untouched raw shape

    def test_host_pipeline_defaults_to_fixed_canvas(self, tmp_path, rng):
        """Loader-side pipelines (device_fused=False default) still end on
        the fixed canvas."""
        from PIL import Image

        import vltk_tpu as vltk
        from vltk_tpu import vars as V

        path = str(tmp_path / "img.jpg")
        Image.fromarray(
            (rng.uniform(0, 255, (30, 40, 3))).astype("uint8")
        ).save(path)
        pipe = vltk.VisionConfig(size=(32, 48)).build()
        entry = pipe({V.filepath: path})
        from vltk_tpu.processing.image import canvas_for

        assert entry[V.img].shape[:2] == canvas_for((32, 48))
        assert tuple(entry[V.rawsize]) == (30, 40)


class TestProducerReaping:
    def test_early_close_reaps_producer_and_pool(self, coco_images):
        """Abandoning (or erroring out of) _run_split must not leak the
        decode pool or a producer blocked on the bounded queue."""
        import threading

        from vltk_tpu.adapters.extraction import VisnExtraction
        from vltk_tpu.config import VisionConfig

        datadir, ids = coco_images

        class Passthrough(VisnExtraction):
            _name = "passthrough_probe"
            model_batch_size = 2
            prefetch_depth = 1
            decode_workers = 2

            @classmethod
            def forward(cls, model, batch, **kwargs):
                return [{"imgid": i} for i in batch["imgid"]]

        import os

        img_dir = os.path.join(datadir, "coco2014", "train")
        id2path = {i: os.path.join(img_dir, i + ".jpg") for i in ids}
        processor = VisionConfig(transforms=("fromfile",)).build()

        before = threading.active_count()
        for _ in range(4):
            gen = Passthrough._run_split(id2path, processor, None, {})
            next(gen)
            gen.close()  # GeneratorExit -> finally reaps producer + pool
        assert threading.active_count() <= before + 2
