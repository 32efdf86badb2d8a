"""VisualBERT-style single-stream VL encoder — TPU-native (flax/XLA).

The reference's only working end-to-end *training* artifact is a
VisualBERT hateful-memes finetune (reference: vltk/legacy/legacy_train.py:
19-150, via mmf). This module provides that model family natively: a
single-stream BERT encoder over the concatenation [CLS] text [SEP] with
projected region features appended as extra "visual tokens" (Li et al.,
1908.03557), sharing the attention/FFN blocks and TP sharding rules of the
LXMERT implementation (models/lxmert.py, parallel/sharding.py:LXMERT_RULES
match by the same q/k/v / intermediate / *_out names).

Fixed shapes: (N, S) tokens + (N, V) region features -> a (N, S+V) stream;
static segment ids (text=0, visual=1) mirror the torch convention.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vltk_tpu.models.lxmert import (
    Embeddings,
    LxmertConfig,
    Pooler,
    TransformerLayer,
    _dense_init,
)


@dataclasses.dataclass(frozen=True)
class VisualBertConfig(LxmertConfig):
    """Single-stream depth lives in ``l_layers`` (default 12 like
    visualbert-vqa); x_layers/r_layers are unused."""

    l_layers: int = 12
    num_labels: int = 2  # classification head (hateful-memes = 2)


class VisualBert(nn.Module):
    """Single-stream encoder: returns (sequence (N, S+V, H), pooled)."""

    cfg: VisualBertConfig = VisualBertConfig()

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,                 # (N, S) int32
        visual_feats: jnp.ndarray,              # (N, V, visual_feat_dim)
        visual_pos: Optional[jnp.ndarray] = None,   # (N, V, 4) or None
        attention_mask: Optional[jnp.ndarray] = None,  # (N, S)
        visual_mask: Optional[jnp.ndarray] = None,     # (N, V)
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        n, s = input_ids.shape
        v = visual_feats.shape[1]

        text = Embeddings(cfg, name="embeddings")(
            input_ids, token_type_ids, deterministic
        )

        # visual tokens: projected features (+ optional box projection),
        # visual segment embedding, shared LayerNorm convention
        feats = nn.Dense(
            cfg.hidden_size,
            kernel_init=_dense_init(cfg),
            dtype=cfg.compute_dtype,
            name="visual_projection",
        )(visual_feats.astype(cfg.compute_dtype))
        if visual_pos is not None:
            feats = feats + nn.Dense(
                cfg.hidden_size,
                kernel_init=_dense_init(cfg),
                dtype=cfg.compute_dtype,
                name="box_projection",
            )(visual_pos.astype(cfg.compute_dtype))
        seg = nn.Embed(
            cfg.type_vocab_size,
            cfg.hidden_size,
            embedding_init=nn.initializers.normal(stddev=cfg.initializer_range),
            name="visual_token_type",
        )(jnp.ones((n, v), jnp.int32))
        vis = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="visual_ln"
        )(feats + seg)
        vis = nn.Dropout(cfg.hidden_dropout, name="visual_drop")(
            vis, deterministic=deterministic
        )

        x = jnp.concatenate([text, vis.astype(text.dtype)], axis=1)
        if attention_mask is None:
            attention_mask = jnp.ones((n, s), jnp.float32)
        if visual_mask is None:
            visual_mask = jnp.ones((n, v), jnp.float32)
        mask = jnp.concatenate(
            [attention_mask.astype(jnp.float32), visual_mask.astype(jnp.float32)],
            axis=1,
        )

        for i in range(cfg.l_layers):
            x = TransformerLayer(cfg, name=f"layer_{i}")(x, mask, deterministic)

        pooled = Pooler(cfg, name="pooler")(x.astype(jnp.float32))
        return x.astype(jnp.float32), pooled


class VisualBertForClassification(nn.Module):
    """Pooled -> dropout -> linear (the legacy hateful-memes finetune
    objective; reference: legacy_train.py:19-150 trained CE over 2 labels
    and reported accuracy/ROC-AUC)."""

    cfg: VisualBertConfig = VisualBertConfig()

    @nn.compact
    def __call__(self, input_ids, visual_feats, visual_pos=None,
                 attention_mask=None, visual_mask=None, token_type_ids=None,
                 deterministic: bool = True):
        _, pooled = VisualBert(self.cfg, name="visualbert")(
            input_ids, visual_feats, visual_pos, attention_mask, visual_mask,
            token_type_ids, deterministic,
        )
        pooled = nn.Dropout(self.cfg.hidden_dropout, name="drop")(
            pooled, deterministic=deterministic
        )
        return nn.Dense(
            self.cfg.num_labels, kernel_init=_dense_init(self.cfg), name="classifier"
        )(pooled)


def classification_loss(logits, labels):
    """Plain CE (legacy_train.py used BCE-with-logits over one-hot; CE over
    int labels is equivalent for the 2-class case up to a constant)."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))
