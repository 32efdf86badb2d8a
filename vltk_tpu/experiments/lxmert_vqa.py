"""LXMERT VQA finetune experiment (BASELINE.json config 4: end-to-end VQA
with an LXMERT-style encoder over precomputed FRCNN features).

Consumes the canonical loader batch keys (vars.py): ``input_ids``,
``text_attention_mask``, ``features`` (N, D, 2048), ``boxes`` (N, D, 4 —
xyxy raw pixels from the extraction rows, normalized to [0, 1] in
``prepare_batch`` when the row carries its ``rawsize`` extent — the same
convention predict.VQAPredictor serves), ``boxes_mask`` /
``visual_attention_mask``, and the VQA soft ``scores`` written by the
VQA adapter (soft_score semantics, reference:
vltk/utils/adapters.py:285-295).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from vltk_tpu import vars as V
from vltk_tpu.models import LxmertConfig, LxmertForVQA
from vltk_tpu.models import lxmert as L
from vltk_tpu.train import SimpleExperiment, vqa_score


class LxmertVQAExperiment(SimpleExperiment):
    name = "lxmert_vqa"

    #: override (or subclass) to change the architecture
    model_config: LxmertConfig = LxmertConfig()

    def build_model(self):
        cfg = self.model_config
        # auto-size the answer head to the loaders' answer vocabulary (the
        # builder's global string->id table; reference resized via
        # resize_num_qa_labels, vltk/abc/simple.py:135-236)
        answers = getattr(self.train_loader, "metadata_ids", {}).get("answers")
        if answers and len(answers) != cfg.num_answers:
            import dataclasses

            cfg = dataclasses.replace(cfg, num_answers=len(answers))
            self.model_config = cfg
        self.model = LxmertForVQA(cfg)
        d = self.config.data
        ids = np.zeros((1, d.lang.max_seq_length), np.int32)
        feats = np.zeros((1, d.max_detections, cfg.visual_feat_dim), np.float32)
        pos = np.zeros((1, d.max_detections, 4), np.float32)
        params = self.model.init(jax.random.PRNGKey(0), ids, feats, pos)["params"]
        return self.model.apply, params

    # -- batch plumbing ------------------------------------------------------

    def prepare_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        wanted = (
            V.input_ids,
            V.text_attention_mask,
            V.features,
            V.boxes,
            V.boxes_mask,
            V.visual_attention_mask,
            V.scores,
            V.labels,
        )
        out = {}
        for key in wanted:
            if key in batch and hasattr(batch[key], "dtype"):
                out[key] = batch[key]
        # extraction rows store boxes in RAW pixel coords (the reference
        # fixture convention); LXMERT position features are [0, 1]-
        # normalized (the HF convention predict.VQAPredictor serves).
        # Normalize when the row carries its raw extent; legacy tables
        # without the rawsize column keep the raw-coordinate behavior.
        if V.boxes in out and V.rawsize in batch and hasattr(
            batch[V.rawsize], "dtype"
        ):
            from vltk_tpu.utils.adapters import normalize_boxes_xyxy

            out[V.boxes] = normalize_boxes_xyxy(
                out[V.boxes], batch[V.rawsize]
            )
        # loader batches carry sparse (label-id, soft-score) pairs padded
        # with ignore_id (langdataset._attach_labels); the BCE objective
        # needs them dense over the answer vocabulary
        if V.labels in out:
            out[V.scores] = self._densify_scores(out[V.labels], out.get(V.scores))
            out.pop(V.labels)
        return out

    def _densify_scores(self, label_ids, scores) -> np.ndarray:
        """(N, L) sparse answer ids + scores -> (N, num_answers) dense."""
        n_answers = self.model_config.num_answers
        label_ids = np.asarray(label_ids)
        if label_ids.ndim == 1:  # single sampled label per row
            label_ids = label_ids[:, None]
            scores = None if scores is None else np.asarray(scores)[:, None]
        if scores is None:
            scores = np.ones_like(label_ids, np.float32)
        scores = np.asarray(scores, np.float32)
        dense = np.zeros((label_ids.shape[0], n_answers), np.float32)
        valid = (label_ids >= 0) & (label_ids < n_answers)
        rows = np.broadcast_to(
            np.arange(label_ids.shape[0])[:, None], label_ids.shape
        )
        dense[rows[valid], label_ids[valid]] = scores[valid]
        return dense

    def _visual_mask(self, batch):
        for key in (V.boxes_mask, V.visual_attention_mask):
            if key in batch:
                return batch[key]
        return None

    def _logits(self, params, batch, deterministic, rng=None):
        rngs = None if deterministic else {"dropout": rng}
        return self.apply_fn(
            {"params": params},
            batch[V.input_ids],
            batch[V.features],
            batch[V.boxes],
            batch.get(V.text_attention_mask),
            self._visual_mask(batch),
            deterministic=deterministic,
            rngs=rngs,
        )

    # -- objective -----------------------------------------------------------

    def loss_fn(self, params, batch, rng):
        logits = self._logits(params, batch, deterministic=False, rng=rng)
        loss = L.vqa_soft_loss(logits, batch[V.scores])
        return loss, {"vqa_score": vqa_score(logits, batch[V.scores])}

    def eval_metrics(self, params, batch):
        logits = self._logits(params, batch, deterministic=True)
        return {"vqa_score": vqa_score(logits, batch[V.scores])}
