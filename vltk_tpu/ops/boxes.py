"""Box algebra in JAX — xyxy convention, fully batched, static shapes.

Functional equivalents of the reference's Box2BoxTransform / clip /
nonempty helpers (reference: vltk/modeling/frcnn.py:481-584, 148-160)
designed for vmap/jit: no data-dependent shapes, everything masked.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax.numpy as jnp

# clamp such that exp(dw) maps a 16px anchor to at most ~1000px
# (reference: frcnn.py:520-526)
DEFAULT_SCALE_CLAMP = math.log(1000.0 / 16)


def apply_deltas(
    deltas: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    scale_clamp: float = DEFAULT_SCALE_CLAMP,
) -> jnp.ndarray:
    """Decode (dx, dy, dw, dh) deltas against xyxy ``boxes``.

    deltas: (..., K*4) — K class-specific transforms per box.
    boxes:  (..., 4).
    Returns (..., K*4) decoded xyxy boxes
    (reference: frcnn.py apply_deltas:551-584).
    """
    boxes = boxes.astype(deltas.dtype)
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    ctr_x = boxes[..., 0] + 0.5 * widths
    ctr_y = boxes[..., 1] + 0.5 * heights

    wx, wy, ww, wh = weights
    dx = deltas[..., 0::4] / wx
    dy = deltas[..., 1::4] / wy
    dw = jnp.minimum(deltas[..., 2::4] / ww, scale_clamp)
    dh = jnp.minimum(deltas[..., 3::4] / wh, scale_clamp)

    pred_ctr_x = dx * widths[..., None] + ctr_x[..., None]
    pred_ctr_y = dy * heights[..., None] + ctr_y[..., None]
    pred_w = jnp.exp(dw) * widths[..., None]
    pred_h = jnp.exp(dh) * heights[..., None]

    out = jnp.stack(
        [
            pred_ctr_x - 0.5 * pred_w,
            pred_ctr_y - 0.5 * pred_h,
            pred_ctr_x + 0.5 * pred_w,
            pred_ctr_y + 0.5 * pred_h,
        ],
        axis=-1,
    )  # (..., K, 4)
    return out.reshape(*deltas.shape)


def encode_deltas(
    src: jnp.ndarray,
    target: jnp.ndarray,
    weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Inverse of apply_deltas (reference: frcnn.py get_deltas:528-549)."""
    sw = src[..., 2] - src[..., 0]
    sh = src[..., 3] - src[..., 1]
    scx = src[..., 0] + 0.5 * sw
    scy = src[..., 1] + 0.5 * sh
    tw = target[..., 2] - target[..., 0]
    th = target[..., 3] - target[..., 1]
    tcx = target[..., 0] + 0.5 * tw
    tcy = target[..., 1] + 0.5 * th
    wx, wy, ww, wh = weights
    return jnp.stack(
        [
            wx * (tcx - scx) / sw,
            wy * (tcy - scy) / sh,
            ww * jnp.log(tw / sw),
            wh * jnp.log(th / sh),
        ],
        axis=-1,
    )


def clip_boxes(boxes: jnp.ndarray, size_hw) -> jnp.ndarray:
    """Clamp xyxy boxes into [0, w] x [0, h]
    (reference: frcnn.py _clip_box:148-154). ``size_hw`` may be a traced
    (h, w) array for per-image sizes."""
    h = size_hw[0]
    w = size_hw[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def nonempty_mask(boxes: jnp.ndarray, threshold: float = 0.0) -> jnp.ndarray:
    """True where both sides exceed ``threshold``
    (reference: frcnn.py _nonempty_boxes:157-160)."""
    widths = boxes[..., 2] - boxes[..., 0]
    heights = boxes[..., 3] - boxes[..., 1]
    return (widths > threshold) & (heights > threshold)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    return jnp.maximum(boxes[..., 2] - boxes[..., 0], 0) * jnp.maximum(
        boxes[..., 3] - boxes[..., 1], 0
    )


def box_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: a (..., N, 4), b (..., M, 4) -> (..., N, M)."""
    lt = jnp.maximum(a[..., :, None, :2], b[..., None, :, :2])
    rb = jnp.minimum(a[..., :, None, 2:], b[..., None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = box_area(a)[..., :, None] + box_area(b)[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)
