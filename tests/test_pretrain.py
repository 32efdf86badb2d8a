"""LXMERT pretraining experiment: corruptions, toggled losses, overfit."""

import json
import os

import numpy as np
import pytest

import jax

from vltk_tpu import vars as V
from vltk_tpu.config import Config
from vltk_tpu.experiments import Experiments
from vltk_tpu.models import LxmertConfig

TINY = LxmertConfig(
    vocab_size=120,
    hidden_size=16,
    num_heads=2,
    intermediate_size=32,
    l_layers=1,
    x_layers=1,
    r_layers=1,
    visual_feat_dim=8,
    max_position_embeddings=32,
    num_answers=5,
    num_objects=4,
    num_attrs=3,
)


class _ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)

    def set_epoch(self, epoch):
        pass


def _batches(rng, n=3, bs=8, s=10, v=4):
    out = []
    for _ in range(n):
        scores = np.zeros((bs, TINY.num_answers), np.float32)
        scores[np.arange(bs), rng.integers(0, TINY.num_answers, bs)] = 1.0
        out.append(
            {
                V.input_ids: rng.integers(104, 120, (bs, s)).astype(np.int32),
                V.text_attention_mask: np.ones((bs, s), np.int32),
                V.features: rng.normal(size=(bs, v, 8)).astype(np.float32),
                V.boxes: rng.uniform(0, 1, (bs, v, 4)).astype(np.float32),
                V.boxes_mask: np.ones((bs, v), np.float32),
                V.scores: scores,
            }
        )
    return out


def _mk_exp(tmp_path, rng, **task_flags):
    cfg = Config()
    cfg.logdir = str(tmp_path / "logs")
    updates = dict(
        epochs=4,
        learning_rate=0.02,
        task_mask_lm=True,
        task_matched=True,
        task_obj_predict=True,
        task_qa=True,
    )
    updates.update(task_flags)
    cfg.train.update(updates)
    cfg.data.update({"max_detections": 4, "visual_dim": 8})
    cfg.data.lang.update({"max_seq_length": 10})

    class Tiny(Experiments.get("lxmert_pretrain")):
        model_config = TINY

    batches = _batches(rng)
    return Tiny(cfg, loaders=(_ListLoader(batches), None))


def test_prepare_batch_corruptions(tmp_path, rng):
    exp = _mk_exp(tmp_path, rng)
    raw = _batches(rng, n=1)[0]
    prep = exp.prepare_batch(raw)
    # MLM: some positions masked, labels carry originals elsewhere ignore_id
    assert "masked_labels" in prep
    labeled = prep["masked_labels"] != -100
    assert labeled.any()
    # matched: swap flags present, 0/1
    assert set(np.unique(prep["is_matched"])) <= {0, 1}
    # feature masking: targets kept, mask marks corrupted rows
    assert prep["feat_target"].shape == raw[V.features].shape
    assert prep["feat_mask"].shape == raw[V.features].shape[:2]
    # dense qa scores passed through
    assert prep[V.scores].shape == (8, TINY.num_answers)


def test_all_losses_reported_and_drop(tmp_path, rng):
    exp = _mk_exp(tmp_path, rng)
    result = exp()
    train_m = result["train"]
    for key in ("mlm_loss", "matched_loss", "feat_loss", "qa_loss", "loss"):
        assert key in train_m, train_m
    records = [
        json.loads(l) for l in open(os.path.join(exp.logdir, "steps_log.json"))
    ]
    # corruptions are re-sampled per step: compare epoch averages
    k = 3
    first = sum(r["loss"] for r in records[:k]) / k
    last = sum(r["loss"] for r in records[-k:]) / k
    assert last < first, (first, last)


def test_task_toggles(tmp_path, rng):
    exp = _mk_exp(tmp_path, rng, task_matched=False, task_obj_predict=False)
    raw = _batches(rng, n=1)[0]
    prep = exp.prepare_batch(raw)
    assert "is_matched" not in prep and "feat_mask" not in prep
    loss, aux = exp.loss_fn(exp.state.params, prep, jax.random.PRNGKey(0))
    assert "matched_loss" not in aux and "feat_loss" not in aux
    assert "mlm_loss" in aux and "qa_loss" in aux
