"""AOT export/serving bundles (vltk_tpu/aot.py + VQAPredictor bundle
round-trip). The reference has no compiled-artifact deployment story at
all (its eval path re-imports model code + torch checkpoint per host,
reference vltk/abc/simple.py:576-682) — these tests pin the replacement:
serialize once, serve from the artifact, numerics identical."""

import numpy as np
import pytest

pytest.importorskip("jax")

import jax
import jax.numpy as jnp

from vltk_tpu.aot import (
    AotBundle,
    bundle_manifest,
    export_jitted,
    load_bundle,
    save_bundle,
)


def _affine(w, x):
    return jnp.tanh(x @ w) + 1.0


class TestAotCore:
    def test_roundtrip_numerics(self, tmp_path):
        """serialize -> file -> deserialize -> call == direct call."""
        rng = np.random.default_rng(0)
        w = rng.normal(size=(6, 4)).astype(np.float32)
        x = rng.normal(size=(3, 6)).astype(np.float32)
        # params baked as constants: the exported fn takes only x
        exp = export_jitted(lambda x_: _affine(w, x_), (x,))
        path = str(tmp_path / "b.zip")
        save_bundle(path, {"fwd": exp}, meta={"kind": "t"}, files={"v": b"ab"})
        bundle = load_bundle(path)
        assert isinstance(bundle, AotBundle)
        assert bundle.meta == {"kind": "t"}
        assert bundle.files["v"] == b"ab"
        np.testing.assert_array_equal(
            np.asarray(bundle["fwd"](x)), np.asarray(_affine(w, x))
        )

    def test_manifest_inspection(self, tmp_path):
        exp = export_jitted(lambda x: x * 2, (np.zeros((2,), np.float32),))
        path = str(tmp_path / "b.zip")
        save_bundle(path, {"double": exp}, meta={"n": 1})
        man = bundle_manifest(path)
        assert man["artifacts"] == ["double"]
        assert man["meta"] == {"n": 1}
        assert man["format"] == 1

    def test_wrong_format_refused(self, tmp_path):
        import json
        import zipfile

        path = str(tmp_path / "b.zip")
        with zipfile.ZipFile(path, "w") as zf:
            zf.writestr("manifest.json", json.dumps({"format": 99}))
        with pytest.raises(ValueError, match="format"):
            load_bundle(path)

    def test_shape_mismatch_raises(self, tmp_path):
        """The artifact pins the exported shapes — a serving-time batch
        of the wrong geometry must fail loudly, not silently pad."""
        exp = export_jitted(lambda x: x + 1, (np.zeros((4, 2), np.float32),))
        path = str(tmp_path / "b.zip")
        save_bundle(path, {"f": exp})
        bundle = load_bundle(path)
        with pytest.raises(Exception, match="[Ss]hape|rank|dtype"):
            bundle["f"](np.zeros((3, 2), np.float32))

    def test_multi_platform_lowering(self, tmp_path):
        """Cross-lowering: one artifact built for cpu+tpu from the CPU
        test platform (the deploy story: build box has no TPU)."""
        exp = export_jitted(
            lambda x: jnp.sum(x * x), (np.zeros((5,), np.float32),),
            platforms=("cpu", "tpu"),
        )
        path = str(tmp_path / "b.zip")
        save_bundle(path, {"f": exp})
        bundle = load_bundle(path)
        assert set(bundle.platforms["f"]) == {"cpu", "tpu"}
        x = np.arange(5, dtype=np.float32)
        np.testing.assert_allclose(np.asarray(bundle["f"](x)), 30.0)


class TestShardedExport:
    def test_dp_extraction_sharded_roundtrip(self, tmp_path):
        """Multi-chip AOT serving: the data-parallel extraction step —
        batch sharded over an 8-device ``data`` mesh, params replicated —
        exports, serializes, and serves with the sharding preserved and
        numerics identical to the unsharded program. (The artifact
        records nr_devices=8; serving needs a same-size mesh.)"""
        import functools

        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        from tests.test_predict import TINY_FRCNN
        from vltk_tpu.models import FRCNN
        from vltk_tpu.ops.image_ops import preprocess_batch

        devices = jax.devices()[:8]
        assert len(devices) == 8  # conftest forces the virtual CPU mesh
        mesh = Mesh(np.array(devices), ("data",))
        data_sh = NamedSharding(mesh, P("data"))
        repl_sh = NamedSharding(mesh, P())

        model = FRCNN(TINY_FRCNN)
        canvas = (64, 64)
        rng = np.random.default_rng(0)
        raw = rng.uniform(0, 255, (16, 64, 64, 3)).astype(np.float32)
        sizes = np.asarray([[48.0, 64.0]] * 16, np.float32)
        params = model.init(
            jax.random.PRNGKey(0),
            jnp.zeros((1, *canvas, 3), jnp.float32),
            jnp.asarray([[64.0, 64.0]]),
        )["params"]

        def fwd(p, img, sz):
            pre = preprocess_batch(
                img, sz, canvas_hw=canvas, short=48.0, maximum=64.0
            )
            out = model.apply(
                {"params": p}, pre["img"], pre["sizes"],
                scales_yx=pre["scales_yx"],
            )
            return out["roi_features"].astype(jnp.float32)

        sharded = jax.jit(
            fwd,
            in_shardings=(repl_sh, data_sh, data_sh),
            out_shardings=data_sh,
        )
        exp = export_jitted(sharded, (params, raw, sizes))
        assert exp.nr_devices == 8
        path = str(tmp_path / "dp.zip")
        save_bundle(path, {"extract": exp})
        bundle = load_bundle(path)

        out = bundle["extract"](
            jax.device_put(params, repl_sh),
            jax.device_put(raw, data_sh),
            jax.device_put(sizes, data_sh),
        )
        assert "data" in getattr(out.sharding, "spec", ())
        want = jax.jit(fwd)(params, raw, sizes)  # unsharded reference
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(want), rtol=1e-5, atol=1e-5
        )


class TestVQABundle:
    def test_export_serve_parity(self, tmp_path):
        """Live predictor vs its own exported bundle: same answers, same
        scores, same boxes — and the bundled side never builds a model."""
        from tests.test_predict import ANSWERS, TINY_FRCNN, TINY_LXMERT
        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.predict import VQAPredictor, _BundledVQAPredictor

        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
             "what", "color", "cat"]) + "\n")
        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=str(vocab), max_seq_length=10
        )
        live = VQAPredictor(
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
        path = str(tmp_path / "vqa.zip")
        live.export_bundle(path)
        served = VQAPredictor.from_bundle(path)
        assert isinstance(served, _BundledVQAPredictor)
        assert served.frcnn_params is None and served.lxmert_params is None
        assert served.answers == list(ANSWERS)
        assert served.tokenizer.max_seq_length == 10

        rng = np.random.default_rng(3)
        images = [rng.integers(0, 255, (48, 56, 3)).astype(np.uint8),
                  rng.integers(0, 255, (40, 64, 3)).astype(np.uint8),
                  rng.integers(0, 255, (64, 64, 3)).astype(np.uint8)]
        questions = ["what color", "cat", "what cat color"]
        want = live(images, questions, top_k=3)
        got = served(images, questions, top_k=3)
        assert len(got) == len(want) == 3
        for g, w in zip(got, want):
            assert g["answer"] == w["answer"]
            assert [a for a, _ in g["topk"]] == [a for a, _ in w["topk"]]
            np.testing.assert_allclose(
                [s for _, s in g["topk"]], [s for _, s in w["topk"]],
                rtol=1e-5, atol=1e-6,
            )
            np.testing.assert_allclose(
                g["boxes"], w["boxes"], rtol=1e-5, atol=1e-4
            )
            assert g["num_boxes"] == w["num_boxes"]

    def test_cli_serves_from_bundle(self, tmp_path, capsys):
        """`vltk predict --bundle=vqa.zip` answers from the artifact —
        the CLI deployment one-liner (no checkpoints, no model build)."""
        import json as _json

        from PIL import Image

        from tests.test_predict import ANSWERS, TINY_FRCNN, TINY_LXMERT
        from vltk_tpu.cli import main
        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.predict import VQAPredictor

        vocab = tmp_path / "vocab.txt"
        vocab.write_text("\n".join(
            ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "what"]) + "\n")
        live = VQAPredictor(
            ANSWERS,
            frcnn_config=TINY_FRCNN,
            lxmert_config=TINY_LXMERT,
            tokenizer=Tokenizer(
                name="NativeWordPiece", vocab_path=str(vocab),
                max_seq_length=8,
            ),
            batch_size=1,
            raw_canvas=(64, 64),
            resized_canvas=(64, 64),
            short=32.0,
            maximum=64.0,
        )
        path = str(tmp_path / "vqa.zip")
        live.export_bundle(path)
        img = tmp_path / "img.jpg"
        Image.fromarray(
            np.random.default_rng(0)
            .integers(0, 255, (48, 56, 3)).astype(np.uint8)
        ).save(img)
        rc = main(["predict", str(img), "what", f"--bundle={path}"])
        assert rc == 0
        out = _json.loads(capsys.readouterr().out.strip())
        assert out["answer"] in ANSWERS

    def test_cli_rejects_bundle_plus_export(self, tmp_path, capsys):
        """A bundled predictor holds opaque artifacts — re-export must be
        a clean usage error, not an AttributeError traceback."""
        from vltk_tpu.cli import main

        rc = main([
            "predict", "img.jpg", "what",
            "--bundle=x.zip", "--export-bundle=y.zip",
        ])
        assert rc == 2
        assert "cannot be combined" in capsys.readouterr().err

    def test_legacy_two_artifact_vqa_bundle_clear_error(self, tmp_path):
        """Bundles exported before the one-program predictor carried
        {extract, answer} artifacts; loading one on a serving host must
        say 're-export', not die with a bare KeyError."""
        from vltk_tpu.predict import VQAPredictor

        exp = export_jitted(lambda x: x, (np.zeros((1,), np.float32),))
        path = str(tmp_path / "legacy_vqa.zip")
        save_bundle(
            path,
            {"extract": exp, "answer": exp},
            meta={
                "kind": "vqa_predictor",
                "answers": ["yes", "no"],
                "batch_size": 1,
                "raw_canvas": [8, 8],
                "tokenizer": {"name": "NativeWordPiece",
                              "max_seq_length": 4},
            },
            files={"vocab.txt": b"[PAD]\n[UNK]\n[CLS]\n[SEP]\n[MASK]\na\n"},
        )
        with pytest.raises(ValueError, match="re-export"):
            VQAPredictor.from_bundle(path)

    def test_bundle_kind_guard(self, tmp_path):
        from vltk_tpu.predict import DocSpanQA, DocTokenClassifier, VQAPredictor

        exp = export_jitted(lambda x: x, (np.zeros((1,), np.float32),))
        path = str(tmp_path / "not_vqa.zip")
        save_bundle(path, {"f": exp}, meta={"kind": "other"})
        for cls in (VQAPredictor, DocTokenClassifier, DocSpanQA):
            with pytest.raises(ValueError, match="kind"):
                cls.from_bundle(path)


def _tiny_vocab(tmp_path):
    vocab = tmp_path / "vocab.txt"
    vocab.write_text("\n".join(
        ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]",
         "what", "is", "the", "cat", "on", "box", "##s"]) + "\n")
    return str(vocab)


def _tiny_layoutlm(max_positions):
    from vltk_tpu.models.layoutlm import LayoutLMConfig

    return LayoutLMConfig(
        vocab_size=64,
        hidden_size=24,
        num_heads=2,
        intermediate_size=48,
        l_layers=2,
        max_position_embeddings=max_positions,
        coord_vocab=1024,
    )


DOCS = [
    {
        "words": ["the", "cat", "is", "on", "the", "box"],
        "boxes": [[i * 10, 5, i * 10 + 8, 15] for i in range(6)],
        "size": (100, 200),
    },
    {
        "words": ["what", "cats"],
        "boxes": [[10, 10, 50, 20], [60, 10, 80, 20]],
        "size": (200, 300),
    },
]


class TestDocBundles:
    def test_doc_token_classifier_roundtrip(self, tmp_path):
        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.predict import DocTokenClassifier

        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=_tiny_vocab(tmp_path),
            max_seq_length=16,
        )
        live = DocTokenClassifier(
            ["other", "question", "answer", "header"],
            config=_tiny_layoutlm(16), tokenizer=tok,
            batch_size=2, max_seq_length=16,
        )
        path = str(tmp_path / "doc.zip")
        live.export_bundle(path)
        served = DocTokenClassifier.from_bundle(path)
        assert served.params is None
        want, got = live(DOCS), served(DOCS)
        assert len(got) == len(want) == 2
        for gdoc, wdoc in zip(got, want):
            assert [g["label"] for g in gdoc] == [w["label"] for w in wdoc]
            np.testing.assert_allclose(
                [g["score"] for g in gdoc], [w["score"] for w in wdoc],
                rtol=1e-5, atol=1e-6,
            )

    def test_doc_span_qa_roundtrip(self, tmp_path):
        from vltk_tpu.data.tokenizer import Tokenizer
        from vltk_tpu.predict import DocSpanQA

        tok = Tokenizer(
            name="NativeWordPiece", vocab_path=_tiny_vocab(tmp_path),
            max_seq_length=8,
        )
        live = DocSpanQA(
            config=_tiny_layoutlm(32), tokenizer=tok, batch_size=2,
            question_len=8, doc_len=16, max_span=6,
        )
        path = str(tmp_path / "span.zip")
        live.export_bundle(path)
        served = DocSpanQA.from_bundle(path)
        assert served.q_len == 8 and served.doc_len == 16
        questions = ["what is on the box", "what cats"]
        want, got = live(DOCS, questions), served(DOCS, questions)
        for g, w in zip(got, want):
            assert g["answer"] == w["answer"]
            assert g["start_word"] == w["start_word"]
            assert g["end_word"] == w["end_word"]
            np.testing.assert_allclose(g["score"], w["score"], rtol=1e-5)
