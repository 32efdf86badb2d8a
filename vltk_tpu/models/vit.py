"""ViT image encoder — TPU-native (flax/XLA).

The reference carried a Google-ViT JAX->torch checkpoint converter
(reference: vltk/legacy/vit_ckp_convert.py, utils/base.py:191-261) but no
runnable model. Here the model itself is first-class: a standard pre-LN
ViT (patch conv embed + CLS + learned positions, MHA/MLP blocks, final LN,
tanh pooler) usable as an alternative vision encoder to FRCNN region
features — patch embeddings feed the VL encoders' ``visual_feats``
directly. Param naming mirrors HF ``transformers`` ViT so the converters
in models/convert.py (both directions, completing the reference's
one-way legacy converter) are pure path renames. q/k/v, ``att_out``,
``intermediate`` and ``mlp_out`` names match parallel/sharding.py rules,
so the same TP sharding applies.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 768
    num_heads: int = 12
    num_layers: int = 12
    intermediate_size: int = 3072
    image_size: int = 224
    patch_size: int = 16
    num_channels: int = 3
    layer_norm_eps: float = 1e-12
    hidden_dropout: float = 0.0
    attention_dropout: float = 0.0
    initializer_range: float = 0.02
    dtype: Optional[str] = None
    # "flash" routes self-attention through the fused Pallas kernel when
    # eligible (seq >= 128, no active attention dropout, TPU backend);
    # the 197-token patch stream is padded to the kernel's 128 block
    # inside _flash_self_attention. Falls back to the XLA formulation
    # bit-identically otherwise.
    attention_impl: str = "xla"
    # int8 MXU path for the encoder projections + MLPs (layers.Int8Dense,
    # calibrated static PTQ via the "quant" collection — same recipe as
    # the FRCNN extraction presets). Params stay nn.Dense-shaped;
    # serving-only.
    int8: bool = False

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @property
    def compute_dtype(self):
        return jnp.float32 if self.dtype is None else jnp.dtype(self.dtype)


class _PreLNAttention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        n, s, hd = x.shape
        nh = cfg.num_heads
        dh = hd // nh
        y = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln_before"
        )(x)
        q = _proj_vit(cfg, hd, "query", dt)(y)
        k = _proj_vit(cfg, hd, "key", dt)(y)
        v = _proj_vit(cfg, hd, "value", dt)(y)
        q = q.reshape(n, s, nh, dh)
        k = k.reshape(n, s, nh, dh)
        v = v.reshape(n, s, nh, dh)
        from vltk_tpu.models.lxmert import (
            _flash_applicable,
            _flash_self_attention,
            _impl_wants_flash,
        )

        if _impl_wants_flash(cfg, s) and _flash_applicable(
            s, deterministic, cfg.attention_dropout
        ):
            out = _flash_self_attention(q, k, v, None, dh).reshape(n, s, hd)
        else:
            scores = jnp.einsum("nqhd,nkhd->nhqk", q, k) / jnp.sqrt(
                jnp.asarray(dh, dt)
            )
            probs = jax.nn.softmax(
                scores.astype(jnp.float32), axis=-1
            ).astype(dt)
            probs = nn.Dropout(cfg.attention_dropout, name="att_drop")(
                probs, deterministic=deterministic
            )
            out = jnp.einsum("nhqk,nkhd->nqhd", probs, v).reshape(n, s, hd)
        out = _proj_vit(cfg, hd, "att_out", dt)(out)
        out = nn.Dropout(cfg.hidden_dropout, name="out_drop")(
            out, deterministic=deterministic
        )
        return x + out


def _dense_init_vit(cfg):
    return nn.initializers.normal(stddev=cfg.initializer_range)


def _proj_vit(cfg: ViTConfig, features: int, name: str, dt):
    """Encoder projection factory: ``nn.Dense``, or ``Int8Dense`` (same
    param names/shapes — checkpoint-transparent) when ``cfg.int8``."""
    init = _dense_init_vit(cfg)
    if getattr(cfg, "int8", False):
        from vltk_tpu.models.layers import Int8Dense

        return Int8Dense(features, kernel_init=init, dtype=dt, name=name)
    return nn.Dense(features, kernel_init=init, dtype=dt, name=name)


class _PreLNMLP(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x, deterministic=True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        y = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln_after"
        )(x)
        y = _proj_vit(cfg, cfg.intermediate_size, "intermediate", dt)(y)
        y = nn.gelu(y, approximate=False)
        y = _proj_vit(cfg, x.shape[-1], "mlp_out", dt)(y)
        y = nn.Dropout(cfg.hidden_dropout, name="drop")(
            y, deterministic=deterministic
        )
        return x + y


class ViT(nn.Module):
    """(N, H, W, 3) -> (sequence (N, 1+P, H), pooled (N, H))."""

    cfg: ViTConfig = ViTConfig()

    @nn.compact
    def __call__(self, images: jnp.ndarray, deterministic: bool = True):
        cfg = self.cfg
        dt = cfg.compute_dtype
        n = images.shape[0]
        x = nn.Conv(
            cfg.hidden_size,
            kernel_size=(cfg.patch_size, cfg.patch_size),
            strides=(cfg.patch_size, cfg.patch_size),
            padding="VALID",
            dtype=dt,
            name="patch_embed",
        )(images.astype(dt))
        x = x.reshape(n, -1, cfg.hidden_size)  # (N, P, H)
        cls = self.param(
            "cls_token",
            nn.initializers.normal(stddev=cfg.initializer_range),
            (1, 1, cfg.hidden_size),
        )
        x = jnp.concatenate([jnp.broadcast_to(cls, (n, 1, cfg.hidden_size)).astype(dt), x], axis=1)
        pos = self.param(
            "position_embeddings",
            nn.initializers.normal(stddev=cfg.initializer_range),
            (1, x.shape[1], cfg.hidden_size),
        )
        x = x + pos.astype(dt)
        x = nn.Dropout(cfg.hidden_dropout, name="drop")(
            x, deterministic=deterministic
        )
        for i in range(cfg.num_layers):
            x = _PreLNAttention(cfg, name=f"layer_{i}_att")(x, deterministic)
            x = _PreLNMLP(cfg, name=f"layer_{i}_mlp")(x, deterministic)
        x = nn.LayerNorm(
            epsilon=cfg.layer_norm_eps, dtype=jnp.float32, name="ln"
        )(x.astype(jnp.float32))
        pooled = nn.Dense(
            cfg.hidden_size, kernel_init=_dense_init_vit(cfg), name="pooler"
        )(x[:, 0])
        return x, jnp.tanh(pooled)
