"""LayoutLM-style OCR document encoder — TPU-native (flax/XLA).

The reference's document path (FUNSD/DocVQA) prepared LayoutLM-shaped
inputs — flattened OCR sub-tokens with 0-1000-normalized token boxes
(reference: vltk/processing/visn.py:59-195 AuxTokenize/OCRBoxFixed/
TokenLabels; tests/test_funsd_extract.py:11-30 exercises the chain) — but
shipped no model to consume them. This is that model: BERT-style token
embeddings plus four quantized-coordinate embeddings (x0/y0/x1/y1, vocab
1001 each, LayoutLM convention), a single-stream transformer (sharing the
block implementation and TP rules with the other encoders), and a
per-token classification head for form understanding.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vltk_tpu.models.lxmert import (
    LxmertConfig,
    TransformerLayer,
    _constrain,
    _dense_init,
    _encoder_layers,
    masked_cross_entropy,
)


@dataclasses.dataclass(frozen=True)
class LayoutLMConfig(LxmertConfig):
    """Single-stream depth in ``l_layers``; ``num_labels`` is the per-token
    class count (FUNSD: question/answer/other + ignore padding).

    ``attention_impl`` defaults to ``"auto"`` here (unlike the short-
    stream models): LayoutLM is the long-document encoder, and on v5e
    the tuned flash kernel is measured faster at every padded length
    >= 1024 (BASELINE.md r4) — auto routes those to flash and shorter
    streams (and every non-TPU backend) to the exact xla path."""

    l_layers: int = 12
    num_labels: int = 4
    coord_vocab: int = 1024  # 2D coordinate table size (HF max_2d_position)
    attention_impl: str = "auto"


class LayoutLMEmbeddings(nn.Module):
    """HF-LayoutLM embedding scheme (microsoft/layoutlm-base): word +
    sequence-position + token-type + shared-x (left/right) + shared-y
    (top/bottom) + height + width coordinate embeddings, all summed BEFORE
    the LayerNorm — weight-compatible with ``transformers.LayoutLMModel``
    via models/convert.py:torch_layoutlm_to_jax."""

    cfg: LayoutLMConfig

    @nn.compact
    def __call__(self, input_ids, boxes, token_type_ids=None, deterministic=True):
        cfg = self.cfg
        n, s = input_ids.shape
        if s > cfg.max_position_embeddings:
            # loud, at trace time: past-the-table position ids NaN-fill
            # silently through nn.Embed's gather (jnp.take fill mode)
            raise ValueError(
                f"sequence length {s} exceeds max_position_embeddings="
                f"{cfg.max_position_embeddings}; raise it in the config"
            )
        if token_type_ids is None:
            token_type_ids = jnp.zeros_like(input_ids)
        emb_init = nn.initializers.normal(stddev=cfg.initializer_range)

        def table(name, vocab):
            return nn.Embed(
                vocab, cfg.hidden_size, embedding_init=emb_init, name=name
            )

        b = jnp.clip(boxes.astype(jnp.int32), 0, cfg.coord_vocab - 1)
        x_tab = table("x_position_embeddings", cfg.coord_vocab)
        y_tab = table("y_position_embeddings", cfg.coord_vocab)
        h = jnp.clip(b[..., 3] - b[..., 1], 0, cfg.coord_vocab - 1)
        w = jnp.clip(b[..., 2] - b[..., 0], 0, cfg.coord_vocab - 1)
        emb = (
            table("word_embeddings", cfg.vocab_size)(input_ids)
            + table("position_embeddings", cfg.max_position_embeddings)(
                jnp.arange(s)[None, :].repeat(n, axis=0)
            )
            + table("token_type_embeddings", cfg.type_vocab_size)(token_type_ids)
            + x_tab(b[..., 0])
            + y_tab(b[..., 1])
            + x_tab(b[..., 2])
            + y_tab(b[..., 3])
            + table("h_position_embeddings", cfg.coord_vocab)(h)
            + table("w_position_embeddings", cfg.coord_vocab)(w)
        )
        emb = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln"
        )(emb)
        return nn.Dropout(cfg.hidden_dropout, name="drop")(
            emb, deterministic=deterministic
        )


class LayoutLM(nn.Module):
    """(ids, boxes) -> (sequence (N, L, H)). Boxes are (N, L, 4) ints in
    [0, 1000] — xyxy, the OCRBoxFixed output."""

    cfg: LayoutLMConfig = LayoutLMConfig()

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,
        token_boxes: jnp.ndarray,
        attention_mask: Optional[jnp.ndarray] = None,
        token_type_ids: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ):
        cfg = self.cfg
        x = LayoutLMEmbeddings(cfg, name="embeddings")(
            input_ids, token_boxes, token_type_ids, deterministic
        )
        if attention_mask is None:
            attention_mask = jnp.ones(input_ids.shape, jnp.float32)
        # single-stream = the whole model is the "lang" stream: the Ulysses
        # head-sharded attention (models/lxmert.py) applies to every layer,
        # which is exactly the long-OCR-document case (FUNSD/DocVQA token
        # streams beyond 512, SURVEY §5.7)
        seq_shard = cfg.activation_sharding and cfg.seq_attention_sharding
        x = _constrain(x, cfg, ("data", "seq", None))
        Layer, _ = _encoder_layers(cfg)
        for i in range(cfg.l_layers):
            x = Layer(cfg, name=f"layer_{i}")(
                x, attention_mask.astype(jnp.float32), deterministic,
                seq_shard,
            )
            x = _constrain(x, cfg, ("data", "seq", None))
        return x


class LayoutLMForTokenClassification(nn.Module):
    """Per-token logits over form-understanding labels (the reference's
    TokenLabels processor output, vltk/processing/visn.py:144-164)."""

    cfg: LayoutLMConfig = LayoutLMConfig()

    @nn.compact
    def __call__(self, input_ids, token_boxes, attention_mask=None,
                 token_type_ids=None, deterministic: bool = True):
        x = LayoutLM(self.cfg, name="layoutlm")(
            input_ids, token_boxes, attention_mask, token_type_ids,
            deterministic,
        )
        x = nn.Dropout(self.cfg.hidden_dropout, name="drop")(
            x, deterministic=deterministic
        )
        return nn.Dense(
            self.cfg.num_labels, kernel_init=_dense_init(self.cfg),
            name="classifier",
        )(x)


def token_classification_loss(logits, labels, ignore_id: int = -100):
    """Token-level CE ignoring padded/unlabeled positions."""
    return masked_cross_entropy(logits, labels, ignore_id)


class LayoutLMForSpanQA(nn.Module):
    """Extractive span QA over OCR sub-tokens — the DocVQA objective
    (answer spans grounded via Jaccard at ETL time, reference:
    vltk/adapters/docvqa.py:92-105; sub-token expansion by the Span
    processor, vltk/processing/visnlang.py:9-29)."""

    cfg: LayoutLMConfig = LayoutLMConfig()

    @nn.compact
    def __call__(self, input_ids, token_boxes, attention_mask=None,
                 token_type_ids=None, deterministic: bool = True):
        x = LayoutLM(self.cfg, name="layoutlm")(
            input_ids, token_boxes, attention_mask, token_type_ids,
            deterministic,
        )
        logits = nn.Dense(
            2, kernel_init=_dense_init(self.cfg), name="qa_outputs"
        )(x)
        start, end = logits[..., 0], logits[..., 1]
        if attention_mask is not None:
            bias = (1.0 - attention_mask.astype(jnp.float32)) * -10000.0
            start = start + bias
            end = end + bias
        return start, end


def span_qa_loss(start_logits, end_logits, span_start, span_end,
                 ignore_id: int = -100):
    """Mean CE over start+end positions, rows with ignore_id skipped."""
    return (
        masked_cross_entropy(start_logits, span_start, ignore_id)
        + masked_cross_entropy(end_logits, span_end, ignore_id)
    ) / 2
