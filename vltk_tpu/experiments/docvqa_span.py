"""DocVQA span-QA experiment: question + OCR tokens -> answer span.

End-to-end for the reference's document-QA chain: DocVQA(+Visn) adapters
-> VL join by image id -> auxtokenize/ocrboxfixed (vision) + span
(visnlang) processors -> LayoutLM-style encoder -> start/end CE.
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from vltk_tpu import vars as V
from vltk_tpu.models.layoutlm import (
    LayoutLMConfig,
    LayoutLMForSpanQA,
    span_qa_loss,
)
from vltk_tpu.train import SimpleExperiment


class DocVQASpanExperiment(SimpleExperiment):
    name = "docvqa_span"

    model_config: LayoutLMConfig = LayoutLMConfig()

    def build_model(self):
        cfg = self.model_config
        self.model = LayoutLMForSpanQA(cfg)
        length = self.config.data.lang.max_visual_seq_length
        ids = np.zeros((1, length), np.int32)
        boxes = np.zeros((1, length, 4), np.int32)
        params = self.model.init(jax.random.PRNGKey(0), ids, boxes)["params"]
        return self.model.apply, params

    def prepare_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        out = {}
        ids_key = V.VLOVERLAP[V.text] if V.VLOVERLAP[V.text] in batch else V.text
        if ids_key in batch and hasattr(batch[ids_key], "dtype"):
            out[V.text] = batch[ids_key]
        for key in (V.tokenbox, V.visual_attention_mask,
                    "span_start", "span_end"):
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
        start_logits, end_logits = self._logits(
            params, batch, deterministic=False, rng=rng
        )
        ignore = self.config.data.lang.ignore_id
        loss = span_qa_loss(
            start_logits, end_logits, batch["span_start"], batch["span_end"],
            ignore,
        )
        valid = batch["span_start"] != ignore
        hit = (
            (jnp.argmax(start_logits, -1) == batch["span_start"])
            & (jnp.argmax(end_logits, -1) == batch["span_end"])
            & valid
        )
        acc = jnp.sum(hit) / jnp.maximum(jnp.sum(valid), 1)
        return loss, {"span_acc": acc}

    def eval_metrics(self, params, batch):
        start_logits, end_logits = self._logits(params, batch, deterministic=True)
        ignore = self.config.data.lang.ignore_id
        valid = batch["span_start"] != ignore
        hit = (
            (jnp.argmax(start_logits, -1) == batch["span_start"])
            & (jnp.argmax(end_logits, -1) == batch["span_end"])
            & valid
        )
        return {"span_acc": jnp.sum(hit) / jnp.maximum(jnp.sum(valid), 1)}
