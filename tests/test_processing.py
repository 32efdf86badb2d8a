"""Processing layer: image pipeline, processors, lang corruptions, tokenizer."""

import numpy as np
import pytest
from PIL import Image

from vltk_tpu import vars as V
from vltk_tpu.config import VisionConfig
from vltk_tpu.data.tokenizer import Tokenizer
from vltk_tpu.processing import Processors, build_image_pipeline
from vltk_tpu.processing import lang as L
from vltk_tpu.processing.image import shortest_edge_size


@pytest.fixture(scope="module")
def tok():
    return Tokenizer(max_seq_length=16)


class TestImagePipeline:
    def test_shortest_edge(self):
        # landscape: short side to 800 unless long side would exceed 1333
        assert shortest_edge_size(480, 640, 800, 1333) == (800, 1067)
        # long side clamp
        assert shortest_edge_size(400, 1200, 800, 1333) == (444, 1333)

    def test_pipeline_fixed_canvas(self, tmp_path):
        p = str(tmp_path / "img.jpg")
        Image.new("RGB", (640, 480), (200, 100, 50)).save(p)
        cfg = VisionConfig(size=(96, 160))
        pipe = build_image_pipeline(cfg)
        entry = pipe(p)
        ch, cw = entry[V.padsize]
        assert entry[V.img].shape == (ch, cw, 3)
        assert ch % 32 == 0 and cw % 32 == 0
        assert entry[V.rawsize] == (480, 640)
        h, w = entry[V.size]
        assert min(h, w) == 96 or max(h, w) == 160
        # scale maps raw -> resized
        sw, sh = entry[V.scale]
        assert np.isclose(w, 640 * sw, atol=1) and np.isclose(h, 480 * sh, atol=1)

    def test_bgr_caffe_normalize(self, tmp_path):
        p = str(tmp_path / "img.png")
        Image.new("RGB", (32, 32), (10, 20, 30)).save(p)
        cfg = VisionConfig(size=(32, 32), mean=(1.0, 2.0, 3.0), sdev=(1, 1, 1))
        pipe = build_image_pipeline(cfg)
        entry = pipe(p)
        # BGR swap: channel 0 is blue(30) - mean 1
        assert np.isclose(entry[V.img][0, 0, 0], 29.0)
        assert np.isclose(entry[V.img][0, 0, 2], 10.0 - 3.0)

    def test_rand_feats(self):
        cfg = VisionConfig(transforms=("randfeats",), size=(32, 32))
        cfg_d = cfg.to_dict()
        cfg_d["shape"] = (32, 32, 3)
        from vltk_tpu.processing.image import RandFeats

        entry = RandFeats((32, 32, 3))("fake/path.jpg")
        assert entry[V.img].shape == (32, 32, 3)


class TestTokenizer:
    def test_fixed_length_encode(self, tok):
        out = tok.encode("the quick brown fox")
        assert out[V.input_ids].shape == (16,)
        assert out[V.input_ids][0] == tok.cls_id
        assert out[V.text_attention_mask].sum() > 0
        # batch
        batch = tok.encode_batch(["hi there", "a much longer sentence " * 10])
        assert all(b[V.input_ids].shape == (16,) for b in batch)

    def test_encode_words(self, tok):
        pieces = tok.encode_words(["hello", "unbelievable"])
        assert len(pieces) == 2
        assert all(len(p) >= 1 for p in pieces)


class TestVisnProcessors:
    def test_auxtokenize(self, tok):
        proc = Processors.get("auxtokenize")(
            tokenizer=tok, max_visual_seq_length=16
        )
        entry = {V.text: ["total", "amount", "due"], V.rawsize: (100, 200)}
        out = proc(entry)
        assert out[V.text].shape == (16,)
        assert out[V.text][-1] == tok.sep_id
        assert out[V.tokenmap].shape == (16,)
        assert out[V.visual_attention_mask].shape == (16,)
        assert int(out[V.tokenmap][0]) >= 1

    def test_ocrboxfixed_chain(self, tok):
        aux = Processors.get("auxtokenize")(tokenizer=tok, max_visual_seq_length=16)
        boxproc = Processors.get("ocrboxfixed")(max_visual_seq_length=16)
        entry = {
            V.text: ["word", "another"],
            V.tokenbox: [[10, 10, 50, 20], [60, 10, 40, 20]],
            V.rawsize: (200, 400),
        }
        entry = aux(entry)
        entry = boxproc(entry)
        assert entry[V.tokenbox].shape == (16, 4)
        assert entry[V.tokenbox].max() <= 1000

    def test_xywh_to_xyxy(self):
        proc = Processors.get("xywhtoxyxy")()
        entry = {V.box: [[10, 20, 30, 40]]}
        out = proc(entry)
        np.testing.assert_allclose(out[V.box], [[10, 20, 40, 60]])

    def test_polygon_processor(self):
        proc = Processors.get("polygonprocessor")(max_visual_seq_length=4)
        entry = {
            V.polygons: [[[2, 2, 14, 2, 14, 14, 2, 14]]],
            V.size: (8, 8),
            V.rawsize: (16, 16),
        }
        out = proc(entry)
        assert out[V.segmentation].shape == (4, 8, 8)
        assert out[V.segmentation][0].sum() > 0


class TestLangCorruptions:
    def test_mlm_shapes_and_ratio(self, tok, rng):
        ids = np.full((512,), 7777, np.int64)
        mask = np.ones_like(ids)
        corrupted, labels = L.masked_language_modeling(
            ids, mask, rng, tok.mask_id, tok.vocab_size, special_ids=tok.special_ids
        )
        chosen = labels != -100
        rate = chosen.mean()
        assert 0.08 < rate < 0.25
        assert (labels[chosen] == 7777).all()
        # ~80% of chosen become [MASK]
        assert (corrupted[chosen] == tok.mask_id).mean() > 0.6

    def test_feature_masking(self, rng):
        feats = np.ones((36, 8), np.float32)
        out, chosen = L.masked_feature_modeling(feats, None, rng)
        assert out.shape == (36, 8)
        assert chosen.dtype == bool

    def test_one_hot_label(self, rng):
        lab = L.one_hot_label([3, 5], [1.0, 0.0], rng)
        assert lab == 3
        assert L.one_hot_label([], [], rng) == -100

    def test_matched_sentence(self, rng):
        entry = {V.text: "real"}
        out = L.matched_sentence_modeling(entry, "fake", rng, sentence_match_rate=1.0)
        assert out[V.text] == "fake" and out["is_matched"] == 0
        out2 = L.matched_sentence_modeling(entry, "fake", rng, sentence_match_rate=0.0)
        assert out2[V.text] == "real" and out2["is_matched"] == 1


class TestSpanProcessor:
    def test_span_expansion(self):
        proc = Processors.get("span")(max_visual_seq_length=32)
        # words with (2,1,3) subtokens; span over words 1..2
        entry = {
            V.span: [1, 2],
            V.tokenmap: np.array([2, 1, 3, -100, -100]),
        }
        out = proc(entry)
        assert int(out["span_start"]) == 2
        assert int(out["span_end"]) == 5


def test_uint8_decode_pipeline_matches_f32(tmp_path):
    """decode_dtype="uint8" (the device-fused fast path) must produce the
    exact same collated device batch as the float32 decode it replaces."""
    from PIL import Image

    from vltk_tpu.adapters.frcnn import FRCNN
    from vltk_tpu.config import VisionConfig

    rng = np.random.default_rng(5)
    p = tmp_path / "x.jpg"
    Image.fromarray(
        rng.integers(0, 256, (48, 56, 3)).astype(np.uint8)
    ).save(p)
    f32 = VisionConfig(
        transforms=("fromfile",), device_fused=True
    ).build()(str(p))
    u8 = VisionConfig(
        transforms=("fromfile",), device_fused=True, decode_dtype="uint8"
    ).build()(str(p))
    assert u8[V.img].dtype == np.uint8
    assert f32[V.img].dtype == np.float32
    np.testing.assert_array_equal(u8[V.img], f32[V.img].astype(np.uint8))
    assert u8[V.rawsize] == f32[V.rawsize]

    e1 = dict(f32)
    e1[V.imgid] = "a"
    e2 = dict(u8)
    e2[V.imgid] = "a"
    b1, b2 = FRCNN.collate([e1]), FRCNN.collate([e2])
    np.testing.assert_array_equal(b1[V.img], b2[V.img])
    np.testing.assert_array_equal(b1[V.rawsize], b2[V.rawsize])
