"""DocVQA span-QA experiment: question + OCR tokens -> answer span.

End-to-end for the reference's document-QA chain: DocVQA(+Visn) adapters
-> VL join by image id -> auxtokenize/ocrboxfixed (vision) + span
(visnlang) processors -> LayoutLM-style encoder over the concatenated
``[question tokens | OCR sub-tokens]`` stream -> start/end CE.

The question stream rides the same token embedding with a full-page box
(LayoutLM convention); span labels shift by the question length so they
index the concatenated stream.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp
import numpy as np

from vltk_tpu import vars as V
from vltk_tpu.experiments.layoutlm_base import LayoutLMExperimentBase
from vltk_tpu.models.layoutlm import (
    LayoutLMConfig,
    LayoutLMForSpanQA,
    span_qa_loss,
)


class DocVQASpanExperiment(LayoutLMExperimentBase):
    name = "docvqa_span"

    model_config: LayoutLMConfig = LayoutLMConfig()
    model_cls = LayoutLMForSpanQA

    def _seq_length(self) -> int:
        lang = self.config.data.lang
        return lang.max_seq_length + lang.max_visual_seq_length

    def prepare_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        lang = self.config.data.lang
        q_len = lang.max_seq_length
        ocr_ids = self._ocr_ids(batch)
        q_ids = np.asarray(batch[V.input_ids], np.int32)
        q_mask = np.asarray(
            batch.get(V.text_attention_mask, np.ones_like(q_ids)), np.int32
        )
        n = q_ids.shape[0]

        ids = np.concatenate([q_ids, np.asarray(ocr_ids, np.int32)], axis=1)
        # question tokens carry the full-page box (LayoutLM convention)
        q_boxes = np.zeros((n, q_len, 4), np.float32)
        q_boxes[..., 2:] = 1000.0
        boxes = np.concatenate(
            [q_boxes, np.asarray(batch[V.tokenbox], np.float32)], axis=1
        )
        ocr_mask = np.asarray(batch[V.visual_attention_mask], np.int32)
        mask = np.concatenate([q_mask, ocr_mask], axis=1)

        ignore = lang.ignore_id
        shift = lambda s: np.where(
            np.asarray(s) == ignore, ignore, np.asarray(s) + q_len
        ).astype(np.int32)
        return {
            V.text: ids,
            V.tokenbox: boxes,
            V.visual_attention_mask: mask,
            "span_start": shift(batch["span_start"]),
            "span_end": shift(batch["span_end"]),
        }

    def _span_accuracy(self, start_logits, end_logits, batch):
        ignore = self.config.data.lang.ignore_id
        valid = batch["span_start"] != ignore
        hit = (
            (jnp.argmax(start_logits, -1) == batch["span_start"])
            & (jnp.argmax(end_logits, -1) == batch["span_end"])
            & valid
        )
        return jnp.sum(hit) / jnp.maximum(jnp.sum(valid), 1)

    def loss_fn(self, params, batch, rng):
        start_logits, end_logits = self._logits(
            params, batch, deterministic=False, rng=rng
        )
        loss = span_qa_loss(
            start_logits, end_logits, batch["span_start"], batch["span_end"],
            self.config.data.lang.ignore_id,
        )
        return loss, {
            "span_acc": self._span_accuracy(start_logits, end_logits, batch)
        }

    def eval_metrics(self, params, batch):
        start_logits, end_logits = self._logits(params, batch, deterministic=True)
        return {
            "span_acc": self._span_accuracy(start_logits, end_logits, batch)
        }
