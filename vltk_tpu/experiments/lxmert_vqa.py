"""LXMERT VQA finetune experiment (BASELINE.json config 4: end-to-end VQA
with an LXMERT-style encoder over precomputed FRCNN features).

Consumes the canonical loader batch keys (vars.py): ``input_ids``,
``text_attention_mask``, ``features`` (N, D, 2048), ``boxes`` (N, D, 4 —
xyxy, normalized here), ``boxes_mask``/``visual_attention_mask``, and the
VQA soft ``scores`` written by the VQA adapter (soft_score semantics,
reference: vltk/utils/adapters.py:285-295).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
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
        return out

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
