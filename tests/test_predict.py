"""End-to-end VQA predictor tests (vltk_tpu/predict.py): the composed
image+question -> answer path at tiny geometry, hermetic random init.
The reference's closest artifact is the manual demo in
tests/frcnn_test.py:11-31 (features only, bs=1, no composition)."""

import json
import os

import numpy as np
import pytest
from PIL import Image

pytest.importorskip("jax")

from vltk_tpu.models import FRCNNConfig, LxmertConfig

TINY_FRCNN = FRCNNConfig(
    depth=50,
    stem_out_channels=8,
    res2_out_channels=16,
    width_per_group=4,
    rpn_hidden_channels=16,
    anchor_sizes=(16, 32),
    aspect_ratios=(0.5, 1.0, 2.0),
    pre_nms_topk=64,
    post_nms_topk=16,
    num_classes=7,
    num_attrs=5,
    pooler_resolution=7,
    min_detections=4,
    max_detections=4,
)

TINY_LXMERT = LxmertConfig(
    vocab_size=64,
    hidden_size=24,
    num_heads=2,
    intermediate_size=48,
    l_layers=2,
    x_layers=1,
    r_layers=1,
    visual_feat_dim=128,  # res2_out_channels * 8
    max_position_embeddings=32,
    num_answers=3,
    num_objects=7,
    num_attrs=5,
)

ANSWERS = ["yes", "no", "red", "2", "cat"]


@pytest.fixture(scope="module")
def tiny_vocab(tmp_path_factory):
    path = tmp_path_factory.mktemp("vocab") / "vocab.txt"
    tokens = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
              "what", "is", "the", "color", "cat", "on", "box", "##s"]
    path.write_text("\n".join(tokens) + "\n")
    return str(path)


@pytest.fixture(scope="module")
def predictor(tiny_vocab):
    from vltk_tpu.data.tokenizer import Tokenizer
    from vltk_tpu.predict import VQAPredictor

    tok = Tokenizer(
        name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=12
    )
    return VQAPredictor(
        ANSWERS,
        frcnn_config=TINY_FRCNN,
        lxmert_config=TINY_LXMERT,
        tokenizer=tok,
        batch_size=2,
        raw_canvas=(64, 64),
        resized_canvas=(64, 64),
        short=32.0,
        maximum=64.0,
    )


def _images(tmp_path):
    rng = np.random.default_rng(0)
    arr1 = rng.integers(0, 255, (48, 56, 3)).astype(np.uint8)
    arr2 = rng.integers(0, 255, (40, 64, 3)).astype(np.uint8)
    jpg = os.path.join(str(tmp_path), "img.jpg")
    Image.fromarray(arr1).save(jpg)
    return [arr1, jpg, arr2]


class TestVQAPredictor:
    def test_end_to_end_shapes_and_ranking(self, predictor, tmp_path):
        # 3 pairs at batch_size=2 exercises the padded final chunk
        images = _images(tmp_path)
        questions = ["what is the color", "is the cat on the box", "what"]
        results = predictor(images, questions, top_k=3)
        assert len(results) == 3
        for res in results:
            assert res["answer"] in ANSWERS
            assert res["answer"] == res["topk"][0][0]
            scores = [s for _, s in res["topk"]]
            assert scores == sorted(scores, reverse=True)
            assert all(0.0 <= s <= 1.0 for s in scores)
            assert res["boxes"].shape == (TINY_FRCNN.max_detections, 4)
            assert res["objects"].shape == (TINY_FRCNN.max_detections,)
            assert 0 <= res["num_boxes"] <= TINY_FRCNN.max_detections

    def test_deterministic(self, predictor, tmp_path):
        images = _images(tmp_path)[:1]
        a = predictor(images, ["what is the color"])
        b = predictor(images, ["what is the color"])
        assert a[0]["answer"] == b[0]["answer"]
        np.testing.assert_array_equal(a[0]["boxes"], b[0]["boxes"])
        assert a[0]["topk"] == b[0]["topk"]

    def test_length_mismatch_raises(self, predictor):
        with pytest.raises(ValueError):
            predictor([np.zeros((8, 8, 3), np.uint8)], ["q1", "q2"])

    def test_empty_request(self, predictor):
        assert predictor([], []) == []

    def test_bad_image_shape_raises(self, predictor):
        with pytest.raises(ValueError):
            predictor([np.zeros((8, 8), np.uint8)], ["q"])

    def test_oversized_image_boxes_in_original_frame(self, predictor):
        # collate host pre-shrinks raws past raw_canvas (64x64 here); the
        # returned boxes must be mapped BACK to the caller's pixel frame —
        # identical to predicting on the pre-shrunk image, scaled 2x
        rng = np.random.default_rng(3)
        big = rng.integers(0, 255, (128, 96, 3)).astype(np.uint8)
        small = np.asarray(
            Image.fromarray(big).resize((48, 64))  # PIL takes (w, h)
        )
        q = ["what is the color"]
        res_big = predictor([big], q)[0]
        res_small = predictor([small], q)[0]
        assert res_big["answer"] == res_small["answer"]
        assert res_big["num_boxes"] == res_small["num_boxes"]
        np.testing.assert_allclose(
            res_big["boxes"], res_small["boxes"] * 2.0, rtol=1e-5, atol=1e-3
        )

    def test_mismatched_head_width_raises(self, predictor, tiny_vocab):
        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.predict import VQAPredictor

        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=12
        )
        with pytest.raises(ValueError, match="head is"):
            VQAPredictor(
                ANSWERS + ["extra"],  # 6 labels vs the 5-wide trained head
                frcnn_config=TINY_FRCNN,
                lxmert_config=TINY_LXMERT,
                lxmert_params=predictor.lxmert_params,
                tokenizer=tok,
                raw_canvas=(64, 64),
                resized_canvas=(64, 64),
                short=32.0,
                maximum=64.0,
            )

    def test_int8_preset_lazily_calibrates(self, tiny_vocab, tmp_path):
        """frcnn_config(int8=True): the first real request records static
        PTQ activation scales (the adapter's recipe, adapters/frcnn.py
        forward_dispatch) so Int8Conv runs its calibrated fast path, and
        later requests reuse them."""
        import dataclasses as _dc

        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.predict import VQAPredictor

        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=12
        )
        p = VQAPredictor(
            ANSWERS,
            frcnn_config=_dc.replace(TINY_FRCNN, int8=True),
            lxmert_config=TINY_LXMERT,
            tokenizer=tok,
            batch_size=2,
            raw_canvas=(64, 64),
            resized_canvas=(64, 64),
            short=32.0,
            maximum=64.0,
        )
        assert "quant" not in p._frcnn_variables
        img = np.random.default_rng(0).integers(
            0, 255, (48, 56, 3)
        ).astype(np.uint8)
        (res,) = p([img], ["what is the cat"], top_k=2)
        assert "quant" in p._frcnn_variables  # calibrated on first request
        quant_before = p._frcnn_variables["quant"]
        assert res["answer"] in ANSWERS
        assert np.isfinite(res["score"])
        (res2,) = p([img], ["what is the cat"], top_k=2)
        assert p._frcnn_variables["quant"] is quant_before  # reused
        np.testing.assert_allclose(res2["score"], res["score"], rtol=1e-6)

    def test_full_int8_calibrates_both_models(self, tiny_vocab):
        """lxmert_config(int8=True) stacks the transformer Int8Dense
        preset on the FRCNN one: the first real request calibrates BOTH
        quant collections (LXMERT's on the actual extracted features),
        later requests reuse them deterministically."""
        import dataclasses as _dc

        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.predict import VQAPredictor

        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=12
        )
        p = VQAPredictor(
            ANSWERS,
            frcnn_config=_dc.replace(TINY_FRCNN, int8=True),
            lxmert_config=_dc.replace(TINY_LXMERT, int8=True),
            tokenizer=tok,
            batch_size=2,
            raw_canvas=(64, 64),
            resized_canvas=(64, 64),
            short=32.0,
            maximum=64.0,
        )
        assert "quant" not in p._lxmert_variables
        img = np.random.default_rng(1).integers(
            0, 255, (48, 56, 3)
        ).astype(np.uint8)
        (res,) = p([img], ["what is the cat"], top_k=2)
        assert "quant" in p._frcnn_variables
        assert "quant" in p._lxmert_variables
        lquant = p._lxmert_variables["quant"]
        # encoder-only coverage: every recorded act_max is positive
        import jax

        leaves = [float(x) for x in jax.tree_util.tree_leaves(lquant)]
        # every scale finite and non-negative; most positive (a leaf CAN
        # legitimately be 0.0 — e.g. a dense whose calibration input is a
        # fully-masked stream of zeros; Int8Dense clamps the scale)
        assert leaves and all(np.isfinite(x) and x >= 0.0 for x in leaves)
        assert sum(1 for x in leaves if x > 0.0) > len(leaves) // 2
        assert res["answer"] in ANSWERS and np.isfinite(res["score"])
        (res2,) = p([img], ["what is the cat"], top_k=2)
        assert p._lxmert_variables["quant"] is lquant  # reused
        np.testing.assert_allclose(res2["score"], res["score"], rtol=1e-6)

    def test_conflicting_seq_budget_raises(self, tiny_vocab):
        """tokenizer=12 + an explicit max_seq_length=20 is a geometry the
        checkpoint never saw — refuse; omitting max_seq_length adopts the
        tokenizer's budget (every other test here relies on that)."""
        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.predict import VQAPredictor

        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=12
        )
        with pytest.raises(ValueError, match="max_seq_length"):
            VQAPredictor(
                ANSWERS,
                frcnn_config=TINY_FRCNN,
                lxmert_config=TINY_LXMERT,
                tokenizer=tok,
                max_seq_length=20,
                raw_canvas=(64, 64),
                resized_canvas=(64, 64),
                short=32.0,
                maximum=64.0,
            )

    def test_vocab_overflow_raises(self, tiny_vocab):
        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.predict import VQAPredictor

        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=12
        )
        import dataclasses

        small = dataclasses.replace(TINY_LXMERT, vocab_size=4)
        with pytest.raises(ValueError, match="vocab"):
            VQAPredictor(
                ANSWERS,
                frcnn_config=TINY_FRCNN,
                lxmert_config=small,
                tokenizer=tok,
                raw_canvas=(64, 64),
                resized_canvas=(64, 64),
                short=32.0,
                maximum=64.0,
            )


class TestAnswerLoading:
    def test_json_list_and_map(self, tmp_path):
        from vltk_tpu.predict import _load_answer_list

        lst = tmp_path / "answers_list.json"
        lst.write_text(json.dumps(["a", "b", "c"]))
        assert _load_answer_list(str(lst)) == ["a", "b", "c"]
        # {answer: id} map form (the experiment layer's labels.json shape)
        mp = tmp_path / "answers_map.json"
        mp.write_text(json.dumps({"b": 1, "a": 0, "c": 2}))
        assert _load_answer_list(str(mp)) == ["a", "b", "c"]
        assert _load_answer_list(("x", "y")) == ["x", "y"]

    def test_sparse_or_duplicate_map_raises(self, tmp_path):
        # ids index head logits directly: a pruned map would silently
        # misalign every returned answer string
        from vltk_tpu.predict import _load_answer_list

        sparse = tmp_path / "sparse.json"
        sparse.write_text(json.dumps({"yes": 0, "maybe": 3, "no": 5}))
        with pytest.raises(ValueError, match="0..2"):
            _load_answer_list(str(sparse))
        dup = tmp_path / "dup.json"
        dup.write_text(json.dumps({"yes": 0, "no": 0, "cat": 1}))
        with pytest.raises(ValueError):
            _load_answer_list(str(dup))

    def test_head_width_check(self):
        from vltk_tpu.predict import _check_head_width

        tree = {"answer_head": {"logit": {"kernel": np.zeros((4, 7))}}}
        _check_head_width(tree, ("answer_head", "logit", "kernel"), 7, "answer")
        with pytest.raises(ValueError, match="7-wide but 5"):
            _check_head_width(
                tree, ("answer_head", "logit", "kernel"), 5, "answer"
            )
        # unexpected tree shapes defer to flax's own structure check
        _check_head_width({}, ("answer_head", "logit", "kernel"), 5, "answer")


class TestPredictCLI:
    def test_usage_errors(self, capsys):
        from vltk_tpu.cli import main

        assert main(["predict"]) == 2
        assert main(["predict", "img.jpg"]) == 2
        # --frcnn without --lxmert
        assert main(
            ["predict", "img.jpg", "what", "--frcnn=x.pt"]
        ) == 2
        # checkpoints without an answer vocabulary
        assert main(
            ["predict", "img.jpg", "what", "--frcnn=x.pt", "--lxmert=y.pt"]
        ) == 2

    def test_happy_path_with_stub(self, monkeypatch, capsys, tmp_path):
        """CLI glue only — the real pipeline is covered above; the full
        default model is too big for a CPU unit test."""
        import vltk_tpu.predict as P
        from vltk_tpu.cli import main

        class Stub:
            def __init__(self, answers, **kw):
                self.answers = list(answers)

            def __call__(self, images, questions, top_k=5):
                return [
                    {
                        "answer": "yes",
                        "score": 0.9,
                        "topk": [("yes", 0.9), ("no", 0.1)],
                        "boxes": np.zeros((4, 4)),
                        "objects": np.zeros((4,)),
                        "object_probs": np.zeros((4,)),
                        "num_boxes": 4,
                    }
                ]

        monkeypatch.setattr(P, "VQAPredictor", Stub)
        rc = main(["predict", str(tmp_path / "img.jpg"), "is", "it", "a", "cat"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip())
        assert out["answer"] == "yes"
        assert out["question"] == "is it a cat"
        assert out["num_boxes"] == 4


# ---------------------------------------------------------------------------
# DocTokenClassifier (LayoutLM per-word labeling)
# ---------------------------------------------------------------------------

DOC_LABELS = ["other", "question", "answer", "header"]


@pytest.fixture(scope="module")
def doc_classifier(tiny_vocab):
    from vltk_tpu.data.tokenizer import Tokenizer
    from vltk_tpu.models.layoutlm import LayoutLMConfig
    from vltk_tpu.predict import DocTokenClassifier

    cfg = LayoutLMConfig(
        vocab_size=64,
        hidden_size=24,
        num_heads=2,
        intermediate_size=48,
        l_layers=2,
        max_position_embeddings=16,
        coord_vocab=1024,
    )
    tok = Tokenizer(
        name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=16
    )
    return DocTokenClassifier(
        DOC_LABELS, config=cfg, tokenizer=tok, batch_size=2, max_seq_length=16
    )


class TestDocTokenClassifier:
    def test_per_word_labels(self, doc_classifier):
        docs = [
            {
                "words": ["what", "is", "cats"],  # "cats" -> 2 sub-tokens
                "boxes": [[10, 10, 50, 20], [60, 10, 80, 20], [10, 30, 90, 40]],
                "size": (200, 300),
            },
            {
                # 20 one-piece words vs a 15-sub-token budget -> truncation
                "words": ["box"] * 20,
                "boxes": [[i, i, i + 5, i + 5] for i in range(20)],
            },
        ]
        out = doc_classifier(docs)
        assert len(out) == 2
        assert [r["word"] for r in out[0]] == ["what", "is", "cats"]
        for r in out[0]:
            assert r["label"] in DOC_LABELS
            assert 0.0 <= r["score"] <= 1.0
        assert len(out[1]) == 15  # max_seq_length-1 budget, 1 piece/word

    def test_deterministic_and_empty(self, doc_classifier):
        doc = {"words": ["what"], "boxes": [[0, 0, 10, 10]]}
        a = doc_classifier([doc])
        b = doc_classifier([doc])
        assert a == b
        assert doc_classifier([]) == []

    def test_word_box_mismatch_raises(self, doc_classifier):
        with pytest.raises(ValueError):
            doc_classifier([{"words": ["a", "b"], "boxes": [[0, 0, 1, 1]]}])

    def test_int8_preset_lazily_calibrates(self, tiny_vocab):
        """config(int8=True): the LayoutLM encoder's Int8Dense scales
        calibrate on the first real document batch and are reused."""
        import dataclasses as _dc

        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.models.layoutlm import LayoutLMConfig
        from vltk_tpu.predict import DocTokenClassifier

        cfg = LayoutLMConfig(
            vocab_size=64, hidden_size=24, num_heads=2, intermediate_size=48,
            l_layers=2, max_position_embeddings=16, coord_vocab=1024,
            int8=True,
        )
        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=16
        )
        clf = DocTokenClassifier(
            DOC_LABELS, config=cfg, tokenizer=tok, batch_size=2,
            max_seq_length=16,
        )
        assert clf._quant is None
        doc = {"words": ["what", "is"], "boxes": [[0, 0, 9, 9], [10, 0, 19, 9]]}
        (out,) = clf([doc])
        assert clf._quant is not None  # calibrated on first request
        q = clf._quant
        for r in out:
            assert r["label"] in DOC_LABELS and np.isfinite(r["score"])
        (out2,) = clf([doc])
        assert clf._quant is q  # reused
        assert out == out2

        # numerics stay close to the bf16 path on the same params (scores
        # only: at random init the top-1 label can legitimately flip on a
        # near-tie, which is accuracy-Pareto territory, not a bug)
        ref = DocTokenClassifier(
            DOC_LABELS, config=_dc.replace(cfg, int8=False), tokenizer=tok,
            batch_size=2, max_seq_length=16,
        )
        ref.params = clf.params
        (ref_out,) = ref([doc])
        for r_q, r_f in zip(out, ref_out):
            assert abs(r_q["score"] - r_f["score"]) < 0.15

    def test_position_budget_guard(self, tiny_vocab):
        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.models.layoutlm import LayoutLMConfig
        from vltk_tpu.predict import DocTokenClassifier

        cfg = LayoutLMConfig(vocab_size=64, max_position_embeddings=8)
        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=16
        )
        with pytest.raises(ValueError, match="position"):
            DocTokenClassifier(
                DOC_LABELS, config=cfg, tokenizer=tok, max_seq_length=16
            )

    def test_from_pretrained_head_and_encoder(self, tiny_vocab, tmp_path):
        """A torch ForTokenClassification checkpoint loads end-to-end:
        encoder through torch_layoutlm_to_jax, classifier head mapped,
        and the jitted step matches the torch forward numerically."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")

        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.models.layoutlm import LayoutLMConfig
        from vltk_tpu.predict import DocTokenClassifier

        hf_cfg = transformers.LayoutLMConfig(
            vocab_size=99,
            hidden_size=32,
            num_hidden_layers=2,
            num_attention_heads=4,
            intermediate_size=64,
            max_position_embeddings=64,
            max_2d_position_embeddings=128,
            type_vocab_size=2,
            hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
            num_labels=len(DOC_LABELS),
        )
        torch.manual_seed(0)
        tmodel = transformers.LayoutLMForTokenClassification(hf_cfg)
        tmodel.eval()
        ckpt = str(tmp_path / "layoutlm.pt")
        torch.save(tmodel.state_dict(), ckpt)

        jcfg = LayoutLMConfig(
            vocab_size=99,
            hidden_size=32,
            num_heads=4,
            intermediate_size=64,
            l_layers=2,
            max_position_embeddings=64,
            coord_vocab=128,
            type_vocab_size=2,
            hidden_dropout=0.0,
            attention_dropout=0.0,
        )
        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=16
        )
        clf = DocTokenClassifier.from_pretrained(
            ckpt, DOC_LABELS, config=jcfg, tokenizer=tok,
            batch_size=1, max_seq_length=16,
        )
        # head actually mapped (not random)
        np.testing.assert_allclose(
            np.asarray(clf.params["classifier"]["bias"]),
            tmodel.classifier.bias.detach().numpy(),
        )

        rng = np.random.default_rng(0)
        ids = rng.integers(0, 99, (1, 16)).astype(np.int32)
        boxes = np.sort(
            rng.integers(0, 120, (1, 16, 2, 2)), axis=2
        ).reshape(1, 16, 4).astype(np.int32)
        mask = np.ones((1, 16), np.float32)
        got = np.asarray(clf._step({"params": clf.params}, ids, boxes, mask))
        with torch.no_grad():
            ref = torch.softmax(
                tmodel(
                    input_ids=torch.tensor(ids, dtype=torch.long),
                    bbox=torch.tensor(boxes, dtype=torch.long),
                    attention_mask=torch.tensor(mask),
                ).logits,
                dim=-1,
            ).numpy()
        np.testing.assert_allclose(got, ref, atol=2e-5)


# ---------------------------------------------------------------------------
# DocSpanQA (DocVQA extractive span QA)
# ---------------------------------------------------------------------------


class TestSpanDecodeHelpers:
    def test_best_span_rigged(self):
        from vltk_tpu.predict import _best_span

        start = np.full(10, -5.0)
        end = np.full(10, -5.0)
        start[4], end[6] = 3.0, 2.0
        s, e, score = _best_span(start, end, lo=2, hi=10, max_span=8)
        assert (s, e) == (4, 6)
        assert score == pytest.approx(5.0)
        # end before start can't win even if its sum is higher
        start[:] = -5.0
        end[:] = -5.0
        start[7], end[3] = 10.0, 10.0
        s, e, _ = _best_span(start, end, lo=2, hi=10, max_span=8)
        assert s <= e
        # max_span caps the pair distance
        start[:] = -5.0
        end[:] = -5.0
        start[2], end[9] = 4.0, 4.0
        s, e, _ = _best_span(start, end, lo=2, hi=10, max_span=3)
        assert e - s < 3

    def test_subtoken_word_index(self):
        from vltk_tpu.predict import _subtoken_word_index

        tokenmap = np.asarray([1, 3, 2, -100, -100], np.int32)
        got = _subtoken_word_index(tokenmap, budget=8)
        np.testing.assert_array_equal(
            got, [0, 1, 1, 1, 2, 2, -1, -1]
        )
        # budget truncation mid-word
        got = _subtoken_word_index(tokenmap, budget=3)
        np.testing.assert_array_equal(got, [0, 1, 1])


@pytest.fixture(scope="module")
def span_qa(tiny_vocab):
    from vltk_tpu.data.tokenizer import Tokenizer
    from vltk_tpu.models.layoutlm import LayoutLMConfig
    from vltk_tpu.predict import DocSpanQA

    cfg = LayoutLMConfig(
        vocab_size=64,
        hidden_size=24,
        num_heads=2,
        intermediate_size=48,
        l_layers=2,
        max_position_embeddings=32,
        coord_vocab=1024,
    )
    tok = Tokenizer(
        name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=8
    )
    return DocSpanQA(
        config=cfg, tokenizer=tok, batch_size=2,
        question_len=8, doc_len=16, max_span=6,
    )


class TestDocSpanQA:
    DOCS = [
        {
            "words": ["the", "cat", "is", "on", "the", "box"],
            "boxes": [[i * 10, 5, i * 10 + 8, 15] for i in range(6)],
            "size": (100, 200),
        },
        {
            "words": ["cats", "on", "boxes"],  # multi-sub-token words
            "boxes": [[0, 0, 20, 10], [25, 0, 40, 10], [45, 0, 70, 10]],
        },
        {"words": ["what"], "boxes": [[0, 0, 10, 10]]},
    ]

    def test_span_extraction_structure(self, span_qa):
        questions = ["what is on the box", "what is on", "what"]
        out = span_qa(self.DOCS, questions)  # 3 pairs, batch 2: padded chunk
        assert len(out) == 3
        for res, doc in zip(out, self.DOCS):
            words = doc["words"]
            assert 0 <= res["start_word"] <= res["end_word"] < len(words)
            assert res["answer"] == " ".join(
                words[res["start_word"]:res["end_word"] + 1]
            )
            assert np.isfinite(res["score"])

    def test_deterministic(self, span_qa):
        a = span_qa(self.DOCS[:1], ["what is the cat on"])
        b = span_qa(self.DOCS[:1], ["what is the cat on"])
        assert a == b

    def test_mismatch_and_empty(self, span_qa):
        with pytest.raises(ValueError):
            span_qa(self.DOCS[:2], ["only one"])
        assert span_qa([], []) == []

    def test_rigged_head_finds_the_span(self, tiny_vocab):
        """With a QA head rigged to fire on specific sub-token positions,
        the decode must return exactly the corresponding words — pinning
        the q_len offset and tokenmap word-mapping arithmetic."""
        import jax
        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.models.layoutlm import LayoutLMConfig
        from vltk_tpu.predict import DocSpanQA

        cfg = LayoutLMConfig(
            vocab_size=64, hidden_size=24, num_heads=2, intermediate_size=48,
            l_layers=2, max_position_embeddings=32, coord_vocab=1024,
        )
        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=8
        )
        qa = DocSpanQA(
            config=cfg, tokenizer=tok, batch_size=1,
            question_len=8, doc_len=16, max_span=6,
        )
        doc = self.DOCS[1]  # ["cats", "on", "boxes"]
        # target words 1..2 ("on boxes"): compute their sub-token range
        # from the tokenizer (e.g. "cats" -> ["cat", "##s"])
        counts = [len(p) or 1 for p in tok.encode_words(doc["words"])]
        sub_s = sum(counts[:1])            # first sub-token of word 1
        sub_e = sum(counts[:3]) - 1        # last sub-token of word 2
        target_s, target_e = qa.q_len + sub_s, qa.q_len + sub_e

        orig_step = qa._step

        def rigged(p, ids, boxes, mask):
            s_lp, e_lp = orig_step(p, ids, boxes, mask)
            s = np.full(np.asarray(s_lp).shape, -100.0, np.float32)
            e = np.full(np.asarray(e_lp).shape, -100.0, np.float32)
            s[:, target_s] = 0.0
            e[:, target_e] = 0.0
            return s, e

        qa._step = rigged
        (res,) = qa([doc], ["what is on"])
        assert (res["start_word"], res["end_word"]) == (1, 2)
        assert res["answer"] == "on boxes"


class TestPredictCLIDocTasks:
    def test_doc_task_with_stub(self, monkeypatch, capsys, tmp_path):
        import vltk_tpu.predict as P
        from vltk_tpu.cli import main

        doc = tmp_path / "doc.json"
        doc.write_text(json.dumps(
            {"words": ["a", "b"], "boxes": [[0, 0, 1, 1], [2, 2, 3, 3]],
             "size": [100, 100]}
        ))

        class StubClf:
            def __init__(self, labels, **kw):
                pass

            def __call__(self, docs):
                return [[{"word": "a", "label": "header", "score": 0.7}]]

        monkeypatch.setattr(P, "DocTokenClassifier", StubClf)
        rc = main(["predict", str(doc), "--task=doc"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip())
        assert out == [{"word": "a", "label": "header", "score": 0.7}]

    def test_span_task_with_stub(self, monkeypatch, capsys, tmp_path):
        import vltk_tpu.predict as P
        from vltk_tpu.cli import main

        doc = tmp_path / "doc.json"
        doc.write_text(json.dumps(
            {"words": ["a", "b"], "boxes": [[0, 0, 1, 1], [2, 2, 3, 3]]}
        ))

        class StubQA:
            def __init__(self, **kw):
                pass

            def __call__(self, docs, questions):
                return [{"answer": "a b", "start_word": 0, "end_word": 1,
                         "score": -1.25}]

        monkeypatch.setattr(P, "DocSpanQA", StubQA)
        rc = main(["predict", str(doc), "what", "is", "b", "--task=span"])
        assert rc == 0
        out = json.loads(capsys.readouterr().out.strip())
        assert out["answer"] == "a b" and out["end_word"] == 1

    def test_task_usage_errors(self, capsys, tmp_path):
        from vltk_tpu.cli import main

        assert main(["predict", "--task=doc"]) == 2         # no doc
        assert main(["predict", "x.json", "--task=span"]) == 2  # no question
        assert main(["predict", "x.jpg", "q", "--task=nope"]) == 2


class TestDocSpanQAFromPretrained:
    def test_encoder_and_qa_head_load(self, tiny_vocab, tmp_path):
        """A torch LayoutLMForQuestionAnswering checkpoint loads: encoder
        via torch_layoutlm_to_jax + qa_outputs head mapped; the jitted
        step matches the torch start/end logits (log-softmaxed)."""
        torch = pytest.importorskip("torch")
        transformers = pytest.importorskip("transformers")

        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.models.layoutlm import LayoutLMConfig
        from vltk_tpu.predict import DocSpanQA

        hf_cfg = transformers.LayoutLMConfig(
            vocab_size=99, hidden_size=32, num_hidden_layers=2,
            num_attention_heads=4, intermediate_size=64,
            max_position_embeddings=64, max_2d_position_embeddings=128,
            type_vocab_size=2, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0,
        )
        torch.manual_seed(1)
        tmodel = transformers.LayoutLMForQuestionAnswering(hf_cfg)
        tmodel.eval()
        ckpt = str(tmp_path / "layoutlm_qa.pt")
        torch.save(tmodel.state_dict(), ckpt)

        jcfg = LayoutLMConfig(
            vocab_size=99, hidden_size=32, num_heads=4,
            intermediate_size=64, l_layers=2, max_position_embeddings=64,
            coord_vocab=128, type_vocab_size=2, hidden_dropout=0.0,
            attention_dropout=0.0,
        )
        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=tiny_vocab, max_seq_length=8
        )
        qa = DocSpanQA.from_pretrained(
            ckpt, config=jcfg, tokenizer=tok, batch_size=1,
            question_len=8, doc_len=16,
        )
        np.testing.assert_allclose(
            np.asarray(qa.params["qa_outputs"]["bias"]),
            tmodel.qa_outputs.bias.detach().numpy(),
        )

        rng = np.random.default_rng(1)
        seq = 24
        ids = rng.integers(0, 99, (1, seq)).astype(np.int32)
        boxes = np.sort(
            rng.integers(0, 120, (1, seq, 2, 2)), axis=2
        ).reshape(1, seq, 4).astype(np.int32)
        mask = np.ones((1, seq), np.float32)
        got_s, got_e = (np.asarray(x) for x in qa._step(
            {"params": qa.params}, ids, boxes, mask))
        with torch.no_grad():
            out = tmodel(
                input_ids=torch.tensor(ids, dtype=torch.long),
                bbox=torch.tensor(boxes, dtype=torch.long),
                attention_mask=torch.tensor(mask),
            )
            ref_s = torch.log_softmax(out.start_logits, -1).numpy()
            ref_e = torch.log_softmax(out.end_logits, -1).numpy()
        np.testing.assert_allclose(got_s, ref_s, atol=3e-5)
        np.testing.assert_allclose(got_e, ref_e, atol=3e-5)
