"""RoI pooling in pure XLA with static shapes.

The reference used torchvision's C++/CUDA ``RoIPool`` (reference:
vltk/modeling/frcnn.py:30, 1179 — RoIPool, *not* RoIAlign). Data-dependent
bin extents are reformulated as a static loop over a bounded set of in-bin
offsets with masked max — exact torchvision semantics as long as no bin
spans more offsets than the static bound (guaranteed: bound derives from
the static feature-map size).

``roi_align`` (bilinear, sampling_ratio fixed) is also provided as the fast
path for new models. A Pallas kernel backing both lives in
vltk_tpu/ops/pallas/roi_kernels.py and is used automatically on TPU for
large workloads.
"""

from __future__ import annotations

import math
from typing import Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _gather_cells(feat: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """feat (H, W, C); iy/ix (...,) int32 -> (..., C)."""
    h, w, _ = feat.shape
    flat = feat.reshape(h * w, -1)
    idx = iy * w + ix
    return flat[idx]


def roi_pool(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 14,
    spatial_scale: float = 1.0 / 16,
) -> jnp.ndarray:
    """Exact torchvision RoIPool.

    Args:
      features: (H, W, C) one image's feature map (vmap over batch outside).
      boxes: (P, 4) xyxy in *input-image* coordinates.
      output_size: pooled grid side (14 for the C4 heads).
      spatial_scale: feature stride reciprocal (1/16 for res4).

    Returns (P, output_size, output_size, C). Empty bins yield 0.
    """
    h, w, c = features.shape
    p = boxes.shape[0]
    ph = pw = output_size

    # torchvision: scale then std::round (half away from zero) roi corners;
    # width = end - start + 1
    scaled = boxes * spatial_scale
    roi = jnp.where(
        scaled >= 0, jnp.floor(scaled + 0.5), jnp.ceil(scaled - 0.5)
    ).astype(jnp.int32)
    x1, y1, x2, y2 = roi[:, 0], roi[:, 1], roi[:, 2], roi[:, 3]
    roi_w = jnp.maximum(x2 - x1 + 1, 1)  # int32
    roi_h = jnp.maximum(y2 - y1 + 1, 1)

    # Bin edges floor(b*R/P) / ceil((b+1)*R/P) computed in exact integer
    # arithmetic — identical to torchvision's float32 math except where f32
    # rounding crosses an integer boundary (where integer is the correct
    # value of the rational edge).
    grid = jnp.arange(output_size, dtype=jnp.int32)
    hstart = jnp.clip(
        (grid[None, :] * roi_h[:, None]) // ph + y1[:, None], 0, h
    )
    hend = jnp.clip(
        ((grid[None, :] + 1) * roi_h[:, None] + ph - 1) // ph + y1[:, None], 0, h
    )
    wstart = jnp.clip(
        (grid[None, :] * roi_w[:, None]) // pw + x1[:, None], 0, w
    )
    wend = jnp.clip(
        ((grid[None, :] + 1) * roi_w[:, None] + pw - 1) // pw + x1[:, None], 0, w
    )

    # static bound on in-bin extent (bins of a clipped roi never exceed
    # ceil((dim+1)/output) + 1 cells)
    max_bin_h = math.ceil((h + 1) / ph) + 1
    max_bin_w = math.ceil((w + 1) / pw) + 1

    def body(k, acc):
        i = k // max_bin_w
        j = k % max_bin_w
        iy = jnp.clip(hstart + i, 0, h - 1)  # (P, ph)
        ix = jnp.clip(wstart + j, 0, w - 1)  # (P, pw)
        in_y = (hstart + i) < hend  # (P, ph)
        in_x = (wstart + j) < wend  # (P, pw)
        vals = _gather_cells(
            features,
            jnp.broadcast_to(iy[:, :, None], (p, ph, pw)),
            jnp.broadcast_to(ix[:, None, :], (p, ph, pw)),
        )  # (P, ph, pw, C)
        mask = (in_y[:, :, None] & in_x[:, None, :])[..., None]
        return jnp.maximum(acc, jnp.where(mask, vals, NEG_INF))

    acc0 = jnp.full((p, ph, pw, c), NEG_INF, features.dtype)
    acc = jax.lax.fori_loop(0, max_bin_h * max_bin_w, body, acc0)
    # empty bins (after clamping) -> 0, matching torchvision
    return jnp.where(acc <= NEG_INF / 2, 0.0, acc)


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 14,
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 2,
    aligned: bool = False,
) -> jnp.ndarray:
    """torchvision-style RoIAlign (average of bilinear samples).

    features: (H, W, C); boxes: (P, 4) xyxy input-image coords.
    Returns (P, output_size, output_size, C).
    """
    h, w, c = features.shape
    p = boxes.shape[0]
    os = output_size
    offset = 0.5 if aligned else 0.0
    scaled = boxes * spatial_scale - offset
    x1, y1 = scaled[:, 0], scaled[:, 1]
    roi_w = scaled[:, 2] - x1
    roi_h = scaled[:, 3] - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / os
    bin_h = roi_h / os
    grid = jnp.arange(os, dtype=jnp.float32)

    def sample(k, acc):
        sy = k // sampling_ratio
        sx = k % sampling_ratio
        # (P, os): sample point per bin
        py = y1[:, None] + (grid[None, :] + (sy + 0.5) / sampling_ratio) * bin_h[:, None]
        px = x1[:, None] + (grid[None, :] + (sx + 0.5) / sampling_ratio) * bin_w[:, None]
        py = jnp.clip(py, 0.0, h - 1.0)
        px = jnp.clip(px, 0.0, w - 1.0)
        y0 = jnp.floor(py).astype(jnp.int32)
        x0 = jnp.floor(px).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        wy = (py - y0.astype(jnp.float32))[:, :, None]  # (P, os, 1)
        wx = (px - x0.astype(jnp.float32))[:, None, :]  # (P, 1, os)

        def g(iy, ix):
            return _gather_cells(
                features,
                jnp.broadcast_to(iy[:, :, None], (p, os, os)),
                jnp.broadcast_to(ix[:, None, :], (p, os, os)),
            )

        v00 = g(y0, x0)
        v01 = g(y0, x1i)
        v10 = g(y1i, x0)
        v11 = g(y1i, x1i)
        wy_ = wy[..., None]
        wx_ = wx[..., None]
        val = (
            v00 * (1 - wy_) * (1 - wx_)
            + v01 * (1 - wy_) * wx_
            + v10 * wy_ * (1 - wx_)
            + v11 * wy_ * wx_
        )
        return acc + val

    acc0 = jnp.zeros((p, os, os, c), features.dtype)
    acc = jax.lax.fori_loop(0, sampling_ratio * sampling_ratio, sample, acc0)
    return acc / (sampling_ratio * sampling_ratio)
