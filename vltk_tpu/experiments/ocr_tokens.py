"""OCR token-classification experiment (FUNSD form understanding).

End-to-end for the reference's document chain: FUNSD adapter -> loader
with processors ["auxtokenize", "ocrboxfixed", "tokenlabels"] (reference:
tests/test_funsd_extract.py:11-30) -> LayoutLM-style encoder -> per-token
CE over question/answer/other labels.

Batch keys consumed (processing/visn.py outputs): ``vtext`` (flattened
sub-token ids, VLOVERLAP-renamed), ``tokenbox`` (0-1000 xyxy),
``tokenlabels``, ``visual_attention_mask``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

from vltk_tpu import vars as V
from vltk_tpu.experiments.layoutlm_base import LayoutLMExperimentBase
from vltk_tpu.models.layoutlm import (
    LayoutLMConfig,
    LayoutLMForTokenClassification,
    token_classification_loss,
)


def _token_accuracy(logits, labels, ignore_id):
    valid = labels != ignore_id
    correct = (jnp.argmax(logits, -1) == labels) & valid
    return jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)


class OCRTokenExperiment(LayoutLMExperimentBase):
    name = "ocr_tokens"

    model_config: LayoutLMConfig = LayoutLMConfig()
    model_cls = LayoutLMForTokenClassification

    def prepare_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        ids = self._ocr_ids(batch)
        if ids is not None:
            out[V.text] = ids
        for key in (V.tokenbox, V.tokenlabels, V.visual_attention_mask):
            if key in batch and hasattr(batch[key], "dtype"):
                out[key] = batch[key]
        return out

    def loss_fn(self, params, batch, rng):
        logits = self._logits(params, batch, deterministic=False, rng=rng)
        ignore = self.config.data.lang.ignore_id
        loss = token_classification_loss(logits, batch[V.tokenlabels], ignore)
        return loss, {
            "token_acc": _token_accuracy(logits, batch[V.tokenlabels], ignore)
        }

    def eval_metrics(self, params, batch):
        logits = self._logits(params, batch, deterministic=True)
        ignore = self.config.data.lang.ignore_id
        return {
            "token_acc": _token_accuracy(logits, batch[V.tokenlabels], ignore)
        }
