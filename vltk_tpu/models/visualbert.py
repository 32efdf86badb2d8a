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
    LxmertConfig,
    Pooler,
    TransformerLayer,
    _constrain,
    _dense_init,
    _encoder_layers,
)


@dataclasses.dataclass(frozen=True)
class VisualBertConfig(LxmertConfig):
    """Single-stream depth lives in ``l_layers`` (default 12 like
    visualbert-vqa); x_layers/r_layers are unused."""

    l_layers: int = 12
    num_labels: int = 2  # classification head (hateful-memes = 2)


class VisualBertEmbeddings(nn.Module):
    """HF-VisualBERT embedding scheme (uclanlp/visualbert-*): text word +
    sequence-position + token-type embeddings; visual tokens are
    projected features + a visual token-type embedding + the visual
    position embedding at id 0; the streams are CONCATENATED and pass one
    shared LayerNorm + dropout — weight-compatible with
    ``transformers.VisualBertModel`` via torch_visualbert_to_jax. (HF
    VisualBERT has no box pathway; region geometry reaches the model only
    if baked into the features.)"""

    cfg: VisualBertConfig

    @nn.compact
    def __call__(self, input_ids, visual_feats, token_type_ids=None,
                 deterministic=True):
        cfg = self.cfg
        n, s = input_ids.shape
        v = visual_feats.shape[1]
        if max(s, v) > cfg.max_position_embeddings:
            # loud, at trace time: past-the-table position ids NaN-fill
            # silently through nn.Embed's gather (jnp.take fill mode)
            raise ValueError(
                f"stream length {max(s, v)} exceeds max_position_embeddings="
                f"{cfg.max_position_embeddings}; raise it in the config"
            )
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        emb_init = nn.initializers.normal(stddev=cfg.initializer_range)

        def table(name, vocab):
            return nn.Embed(
                vocab, cfg.hidden_size, embedding_init=emb_init, name=name
            )

        pos_tab = table("position_embeddings", cfg.max_position_embeddings)
        text = (
            table("word_embeddings", cfg.vocab_size)(input_ids)
            + table("token_type_embeddings", cfg.type_vocab_size)(token_type_ids)
            + pos_tab(jnp.arange(s)[None, :].repeat(n, axis=0))
        )

        vis = nn.Dense(
            cfg.hidden_size,
            kernel_init=_dense_init(cfg),
            dtype=cfg.compute_dtype,
            name="visual_projection",
        )(visual_feats.astype(cfg.compute_dtype)).astype(text.dtype)
        vis = vis + table("visual_token_type_embeddings", cfg.type_vocab_size)(
            jnp.ones((n, v), jnp.int32)
        )
        vis = vis + table(
            "visual_position_embeddings", cfg.max_position_embeddings
        )(jnp.zeros((n, v), jnp.int32))

        x = jnp.concatenate([text, vis], axis=1)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln"
        )(x)
        return nn.Dropout(cfg.hidden_dropout, name="drop")(
            x, deterministic=deterministic
        )


class VisualBert(nn.Module):
    """Single-stream encoder: returns (sequence (N, S+V, H), pooled).
    ``visual_pos`` is accepted for loader-API symmetry with the LXMERT
    family but unused — the HF VisualBERT architecture carries no boxes."""

    cfg: VisualBertConfig = VisualBertConfig()

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,                 # (N, S) int32
        visual_feats: jnp.ndarray,              # (N, V, visual_feat_dim)
        visual_pos: Optional[jnp.ndarray] = None,   # unused (HF scheme)
        attention_mask: Optional[jnp.ndarray] = None,  # (N, S)
        visual_mask: Optional[jnp.ndarray] = None,     # (N, V)
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        n, s = input_ids.shape
        v = visual_feats.shape[1]
        del visual_pos  # no box pathway in VisualBERT (see class docstring)

        x = VisualBertEmbeddings(cfg, name="embeddings")(
            input_ids, visual_feats, token_type_ids, deterministic
        )
        if attention_mask is None:
            attention_mask = jnp.ones((n, s), jnp.float32)
        if visual_mask is None:
            visual_mask = jnp.ones((n, v), jnp.float32)
        mask = jnp.concatenate(
            [attention_mask.astype(jnp.float32), visual_mask.astype(jnp.float32)],
            axis=1,
        )

        # single-stream: the whole (S+V) token stream rides the Ulysses
        # head-sharded attention when enabled (models/lxmert.py) — same
        # mechanism as LayoutLM's long-OCR path
        seq_shard = cfg.activation_sharding and cfg.seq_attention_sharding
        x = _constrain(x, cfg, ("data", "seq", None))
        Layer, _ = _encoder_layers(cfg)
        for i in range(cfg.l_layers):
            x = Layer(cfg, name=f"layer_{i}")(
                x, mask, deterministic, seq_shard
            )
            x = _constrain(x, cfg, ("data", "seq", None))

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
