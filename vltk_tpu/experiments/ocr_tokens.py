"""OCR token-classification experiment (FUNSD form understanding).

End-to-end for the reference's document chain: FUNSD adapter -> loader
with processors ["auxtokenize", "ocrboxfixed", "tokenlabels"] (reference:
tests/test_funsd_extract.py:11-30) -> LayoutLM-style encoder -> per-token
CE over question/answer/other labels.

Batch keys consumed (processing/visn.py outputs): ``text`` (flattened
sub-token ids), ``tokenbox`` (0-1000 xyxy), ``tokenlabels``,
``visual_attention_mask``.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vltk_tpu import vars as V
from vltk_tpu.models.layoutlm import (
    LayoutLMConfig,
    LayoutLMForTokenClassification,
    token_classification_loss,
)
from vltk_tpu.train import SimpleExperiment


class OCRTokenExperiment(SimpleExperiment):
    name = "ocr_tokens"

    model_config: LayoutLMConfig = LayoutLMConfig()

    def build_model(self):
        cfg = self.model_config
        self.model = LayoutLMForTokenClassification(cfg)
        length = self.config.data.lang.max_visual_seq_length
        ids = np.zeros((1, length), np.int32)
        boxes = np.zeros((1, length, 4), np.int32)
        params = self.model.init(jax.random.PRNGKey(0), ids, boxes)["params"]
        return self.model.apply, params

    def prepare_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        # the vision side renames text -> vtext (VLOVERLAP) so OCR tokens
        # never clash with VL question tokens; accept either
        ids_key = V.VLOVERLAP[V.text] if V.VLOVERLAP[V.text] in batch else V.text
        if ids_key in batch:
            out[V.text] = batch[ids_key]
        for key in (V.tokenbox, V.tokenlabels, V.visual_attention_mask):
            if key in batch and hasattr(batch[key], "dtype"):
                out[key] = batch[key]
        return out

    def _logits(self, params, batch, deterministic, rng=None):
        rngs = None if deterministic else {"dropout": rng}
        return self.apply_fn(
            {"params": params},
            batch[V.text],
            batch[V.tokenbox],
            batch.get(V.visual_attention_mask),
            deterministic=deterministic,
            rngs=rngs,
        )

    def loss_fn(self, params, batch, rng):
        logits = self._logits(params, batch, deterministic=False, rng=rng)
        labels = batch[V.tokenlabels]
        loss = token_classification_loss(
            logits, labels, self.config.data.lang.ignore_id
        )
        valid = labels != self.config.data.lang.ignore_id
        correct = (jnp.argmax(logits, -1) == labels) & valid
        acc = jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)
        return loss, {"token_acc": acc}

    def eval_metrics(self, params, batch):
        logits = self._logits(params, batch, deterministic=True)
        labels = batch[V.tokenlabels]
        valid = labels != self.config.data.lang.ignore_id
        correct = (jnp.argmax(logits, -1) == labels) & valid
        return {"token_acc": jnp.sum(correct) / jnp.maximum(jnp.sum(valid), 1)}
