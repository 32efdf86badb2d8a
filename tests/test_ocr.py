"""LayoutLM-style OCR path: model shapes, FUNSD end-to-end experiment."""

import json
import os

import numpy as np
import pytest

import jax

from vltk_tpu import vars as V
from vltk_tpu.config import Config
from vltk_tpu.experiments import Experiments
from vltk_tpu.models import LayoutLMConfig, LayoutLMForTokenClassification

TINY = LayoutLMConfig(
    vocab_size=30522,  # real vocab: the loader tokenizes real words
    hidden_size=16,
    num_heads=2,
    intermediate_size=32,
    l_layers=1,
    max_position_embeddings=64,
    num_labels=4,
)


def test_model_shapes(rng):
    model = LayoutLMForTokenClassification(TINY)
    ids = rng.integers(0, 100, (2, 12)).astype(np.int32)
    boxes = rng.integers(0, 1000, (2, 12, 4)).astype(np.int32)
    params = model.init(jax.random.PRNGKey(0), ids, boxes)["params"]
    logits = model.apply({"params": params}, ids, boxes)
    assert logits.shape == (2, 12, 4)


def _make_funsd(datadir, n_forms=6):
    words = ["name", "date", "total", "amount", "signature", "address"]
    for f in range(n_forms):
        form = {
            "form": [
                {
                    "label": ["question", "answer", "other"][i % 3],
                    "words": [
                        {
                            "text": words[(f + i + j) % len(words)],
                            "box": [10 * j, 12 * i, 10 * j + 9, 12 * i + 10],
                        }
                        for j in range(3)
                    ],
                }
                for i in range(3)
            ]
        }
        path = os.path.join(datadir, "funsd", V.ANNOTATION_DIR, f"form_{f}.json")
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as fh:
            json.dump(form, fh)


def test_funsd_end_to_end_experiment(tmp_path, rng):
    """FUNSD ETL -> OCR processor chain -> LayoutLM token classification."""
    import vltk_tpu as vltk
    from vltk_tpu.adapters import Adapters

    datadir = str(tmp_path / "raw")
    _make_funsd(datadir)
    Adapters.get("funsd").extract(datadir)

    config = Config()
    config.logdir = str(tmp_path / "logs")
    config.train.update({"epochs": 2, "learning_rate": 0.01})
    config.data.update(
        {
            "train_datasets": [["funsd", "train"]],
            "datadir": datadir,
            "train_batch_size": 3,
            "num_workers": 0,
            "drop_last": False,
            "ignore_image": True,
            "visn_processors": ["auxtokenize", "ocrboxfixed", "tokenlabels"],
        }
    )
    config.data.lang.update({"max_visual_seq_length": 24})
    train_loader, _ = vltk.build(config)
    batch = next(iter(train_loader))
    assert batch["vtext"].shape[-1] == 24  # VLOVERLAP-renamed OCR token ids
    assert batch[V.tokenbox].shape[-2:] == (24, 4)
    assert batch[V.tokenlabels].shape[-1] == 24

    class Tiny(Experiments.get("ocr_tokens")):
        model_config = TINY

    exp = Tiny(config, loaders=(train_loader, None))
    result = exp()
    assert "token_acc" in result["train"]
    records = [
        json.loads(l) for l in open(os.path.join(exp.logdir, "steps_log.json"))
    ]
    k = 2
    first = sum(r["loss"] for r in records[:k]) / k
    last = sum(r["loss"] for r in records[-k:]) / k
    assert last < first, (first, last)


def _make_docvqa(datadir, n_docs=4):
    """Synthetic DocVQA corpus: OCR jsons + QA with groundable answers."""
    words_sets = [
        ["invoice", "total", "amount", "due", "42.00"],
        ["contract", "date", "january", "2020", "signed"],
        ["receipt", "total", "paid", "cash", "9.99"],
        ["form", "name", "john", "smith", "approved"],
    ]
    for i in range(n_docs):
        words = words_sets[i % len(words_sets)]
        ocr = {
            "status": "Succeeded",
            "recognitionResults": [
                {
                    "lines": [
                        {
                            "boundingBox": [0, 0, 100, 0, 100, 12, 0, 12],
                            "words": [
                                {
                                    "text": w,
                                    "boundingBox": [
                                        j * 20, 0, j * 20 + 18, 0,
                                        j * 20 + 18, 12, j * 20, 12,
                                    ],
                                }
                                for j, w in enumerate(words)
                            ],
                        }
                    ]
                }
            ],
        }
        path = os.path.join(
            datadir, "docvqavisn", V.ANNOTATION_DIR, f"doc{i}.json"
        )
        os.makedirs(os.path.dirname(path), exist_ok=True)
        with open(path, "w") as f:
            json.dump(ocr, f)
    qa = {
        "data": [
            {
                "question": f"what is item {i}?",
                "image": f"documents/doc{i}.png",
                "answers": [" ".join(words_sets[i % len(words_sets)][1:3])],
                "docId": i,
            }
            for i in range(n_docs)
        ]
    }
    path = os.path.join(datadir, "docvqa", "docvqa_val.json")
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(qa, f)


def test_docvqa_span_end_to_end(tmp_path, rng):
    """DocVQA ETL -> VL join -> OCR + span processors -> span-QA training."""
    import vltk_tpu as vltk
    from vltk_tpu.adapters import Adapters
    from vltk_tpu.models import LayoutLMConfig

    datadir = str(tmp_path / "raw")
    _make_docvqa(datadir)
    Adapters.get("docvqavisn").extract(datadir)
    Adapters.get("docvqa").extract(datadir)

    config = Config()
    config.logdir = str(tmp_path / "logs")
    config.train.update({"epochs": 8, "learning_rate": 0.05})
    config.data.update(
        {
            "train_datasets": [["docvqa", "val"]],
            "datadir": datadir,
            "train_batch_size": 4,
            "num_workers": 0,
            "drop_last": False,
            "ignore_image": True,
            "ignore_filepath": True,
            "visn_processors": ["auxtokenize", "ocrboxfixed"],
            "visnlang_processors": ["span"],
        }
    )
    config.data.lang.update({"max_visual_seq_length": 20, "max_seq_length": 8})
    train_loader, _ = vltk.build(config)
    batch = next(iter(train_loader))
    assert "span_start" in batch and "span_end" in batch
    assert batch[V.tokenbox].shape[-2:] == (20, 4)

    class Tiny(Experiments.get("docvqa_span")):
        model_config = LayoutLMConfig(
            vocab_size=30522, hidden_size=16, num_heads=2,
            intermediate_size=32, l_layers=1, max_position_embeddings=32,
        )

    exp = Tiny(config, loaders=(train_loader, None))
    result = exp()
    assert "span_acc" in result["train"]
    records = [
        json.loads(l) for l in open(os.path.join(exp.logdir, "steps_log.json"))
    ]
    k = 2
    first = sum(r["loss"] for r in records[:k]) / k
    last = sum(r["loss"] for r in records[-k:]) / k
    assert last < first, (first, last)
