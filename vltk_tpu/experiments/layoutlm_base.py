"""Shared plumbing for the LayoutLM-family experiments (OCR token
classification, DocVQA span QA): model init over the document token
stream, VLOVERLAP-aware batch key handling, single logits entry point."""

from __future__ import annotations

from typing import Any, Dict

import jax
import numpy as np

from vltk_tpu import vars as V
from vltk_tpu.train import SimpleExperiment


class LayoutLMExperimentBase(SimpleExperiment):
    """Subclasses set ``model_config``, ``model_cls`` and the objective."""

    model_cls = None  # LayoutLMFor... module class

    #: extra leading tokens (e.g. the question stream) the model sees
    def _seq_length(self) -> int:
        return self.config.data.lang.max_visual_seq_length

    def build_model(self):
        cfg = self.model_config
        self.model = self.model_cls(cfg)
        length = self._seq_length()
        ids = np.zeros((1, length), np.int32)
        boxes = np.zeros((1, length, 4), np.int32)
        params = self.model.init(jax.random.PRNGKey(0), ids, boxes)["params"]
        return self.model.apply, params

    @staticmethod
    def _ocr_ids(batch: Dict[str, Any]):
        """OCR sub-token ids: the vision side renames text -> vtext
        (VLOVERLAP) so they never clash with VL question tokens."""
        key = V.VLOVERLAP[V.text]
        if key not in batch:
            key = V.text
        value = batch.get(key)
        return value if value is not None and hasattr(value, "dtype") else None

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
