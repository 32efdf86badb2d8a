"""LXMERT pretraining experiment — the reference's task toggles wired up.

The reference prepared LXMERT pretraining batches with host-side
corruptions (reference: vltk/processing/lang.py:53-137) and toggled the
losses by config name (``task_mask_lm / task_matched / task_obj_predict /
task_qa`` — reference: vltk/configs.py:63-96, consumed by the broken
experiment layer). Here:

  * ``prepare_batch`` applies the corruptions (masked LM 80/10/10, ROI
    feature masking, sentence matching) with a per-experiment numpy RNG;
  * ``loss_fn`` sums the toggled objectives over
    :class:`vltk_tpu.models.LxmertForPretraining`'s heads.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from vltk_tpu import vars as V
from vltk_tpu.models import LxmertConfig, LxmertForPretraining
from vltk_tpu.models import lxmert as L
from vltk_tpu.processing.lang import (
    masked_feature_modeling,
    masked_language_modeling,
)
from vltk_tpu.train import SimpleExperiment


class LxmertPretrainExperiment(SimpleExperiment):
    name = "lxmert_pretrain"

    model_config: LxmertConfig = LxmertConfig()
    #: host-side corruption knobs (LangConfig mirrors these)
    mask_token_id: int = 103  # [MASK] in the BERT vocab
    special_ids = (0, 100, 101, 102, 103)

    def __init__(self, config, loaders=None, mesh=None, rules=None):
        self._np_rng = np.random.default_rng(config.train.seed)
        super().__init__(config, loaders=loaders, mesh=mesh, rules=rules)

    def build_model(self):
        cfg = self.model_config
        self.model = LxmertForPretraining(cfg)
        d = self.config.data
        ids = np.zeros((1, d.lang.max_seq_length), np.int32)
        feats = np.zeros((1, d.max_detections, cfg.visual_feat_dim), np.float32)
        pos = np.zeros((1, d.max_detections, 4), np.float32)
        params = self.model.init(jax.random.PRNGKey(0), ids, feats, pos)["params"]
        return self.model.apply, params

    # -- host-side corruptions -----------------------------------------------

    def prepare_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        t = self.config.train
        lang_cfg = self.config.data.lang
        out: Dict[str, Any] = {}
        ids = np.asarray(batch[V.input_ids])
        mask = np.asarray(batch.get(V.text_attention_mask, np.ones_like(ids)))
        feats = np.asarray(batch[V.features], np.float32)
        out[V.boxes] = np.asarray(batch[V.boxes], np.float32)
        if V.rawsize in batch and hasattr(batch[V.rawsize], "dtype"):
            # extraction rows carry raw-pixel boxes + their extent:
            # normalize to the LXMERT [0,1] convention (see lxmert_vqa)
            from vltk_tpu.utils.adapters import normalize_boxes_xyxy

            out[V.boxes] = normalize_boxes_xyxy(
                out[V.boxes], batch[V.rawsize]
            )
        out[V.text_attention_mask] = mask
        vmask = batch.get(V.boxes_mask)
        if vmask is not None:
            out[V.boxes_mask] = np.asarray(vmask, np.float32)

        if t.task_mask_lm:
            corrupted, labels = masked_language_modeling(
                ids,
                mask,
                self._np_rng,
                mask_token_id=self.mask_token_id,
                vocab_size=self.model_config.vocab_size,
                special_ids=self.special_ids,
                mask_rate=lang_cfg.mask_rate,
                mask_token_rate=lang_cfg.mask_token_rate,
                random_token_rate=lang_cfg.random_token_rate,
                ignore_id=lang_cfg.ignore_id,
            )
            out[V.input_ids] = corrupted
            out["masked_labels"] = labels
        else:
            out[V.input_ids] = ids

        if t.task_obj_predict:
            out["feat_target"] = feats
            masked_feats, feat_mask = masked_feature_modeling(
                feats.reshape(-1, feats.shape[-1]),
                None
                if vmask is None
                else np.asarray(vmask).reshape(-1) > 0,
                self._np_rng,
                feature_mask_rate=lang_cfg.feature_mask_rate,
            )
            out[V.features] = masked_feats.reshape(feats.shape)
            out["feat_mask"] = feat_mask.reshape(feats.shape[:2]).astype(np.float32)
        else:
            out[V.features] = feats

        if t.task_matched:
            # batch-level sentence swap: roll the text of half the rows
            n = ids.shape[0]
            swap = self._np_rng.random(n) < lang_cfg.sentence_match_rate
            rolled = np.roll(out[V.input_ids], 1, axis=0)
            rolled_mask = np.roll(mask, 1, axis=0)
            out[V.input_ids] = np.where(swap[:, None], rolled, out[V.input_ids])
            out[V.text_attention_mask] = np.where(
                swap[:, None], rolled_mask, mask
            )
            out["is_matched"] = (~swap).astype(np.int32)
            if "masked_labels" in out:
                # swapped sentences don't contribute to MLM
                out["masked_labels"] = np.where(
                    swap[:, None], lang_cfg.ignore_id, out["masked_labels"]
                )

        if t.task_qa and V.scores in batch:
            scores = np.asarray(batch[V.scores], np.float32)
            if scores.ndim == 2 and scores.shape[1] != self.model_config.num_answers:
                labels_ids = np.asarray(batch.get(V.labels))
                dense = np.zeros(
                    (scores.shape[0], self.model_config.num_answers), np.float32
                )
                valid = (labels_ids >= 0) & (
                    labels_ids < self.model_config.num_answers
                )
                rows = np.broadcast_to(
                    np.arange(scores.shape[0])[:, None], labels_ids.shape
                )
                dense[rows[valid], labels_ids[valid]] = scores[valid]
                scores = dense
            out[V.scores] = scores
        return out

    # -- objective -------------------------------------------------------------

    def loss_fn(self, params, batch, rng):
        t = self.config.train
        heads = self.apply_fn(
            {"params": params},
            batch[V.input_ids],
            batch[V.features],
            batch[V.boxes],
            batch.get(V.text_attention_mask),
            batch.get(V.boxes_mask),
            deterministic=False,
            rngs={"dropout": rng},
        )
        total = 0.0
        aux: Dict[str, Any] = {}
        if t.task_mask_lm and "masked_labels" in batch:
            mlm = L.masked_lm_loss(
                heads["mlm_logits"], batch["masked_labels"],
                self.config.data.lang.ignore_id,
            )
            total = total + mlm
            aux["mlm_loss"] = mlm
        if t.task_matched and "is_matched" in batch:
            m = L.matched_loss(heads["matched_logits"], batch["is_matched"])
            total = total + m
            aux["matched_loss"] = m
        if t.task_obj_predict and "feat_mask" in batch:
            fl = L.visual_feat_loss(
                heads["feat_pred"], batch["feat_target"], batch["feat_mask"]
            )
            total = total + fl
            aux["feat_loss"] = fl
        if t.task_qa and V.scores in batch:
            qa = L.vqa_soft_loss(heads["qa_logits"], batch[V.scores])
            total = total + qa
            aux["qa_loss"] = qa
        return total, aux
