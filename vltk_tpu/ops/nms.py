"""Fixed-shape greedy NMS for XLA.

The reference called torchvision's C++/CUDA ``nms``/``batched_nms``
(reference: vltk/modeling/frcnn.py:31, 132, 383). On TPU, data-dependent
output sizes don't compile, so NMS is reformulated as *selection under a
static budget*: exactly ``max_out`` greedy selection steps, each picking the
highest-scoring unsuppressed box and masking its overlaps. The result is the
same ordered keep-set as greedy NMS, padded with ``-1`` indices and a
validity mask.

Cost: O(max_out * K) IoU evaluations as a ``fori_loop`` — max_out is small
(300 for RPN, 36-100 for ROI heads), K is the padded candidate count.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from vltk_tpu.ops.boxes import box_area

NEG_INF = -1e10


def _iou_one_vs_all(box: jnp.ndarray, boxes: jnp.ndarray) -> jnp.ndarray:
    """IoU of one (4,) box against (K, 4)."""
    lt = jnp.maximum(box[:2], boxes[:, :2])
    rb = jnp.minimum(box[2:], boxes[:, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[:, 0] * wh[:, 1]
    area1 = jnp.maximum(box[2] - box[0], 0) * jnp.maximum(box[3] - box[1], 0)
    union = area1 + box_area(boxes) - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with a static output budget.

    Args:
      boxes: (K, 4) xyxy.
      scores: (K,).
      iou_threshold: suppress boxes with IoU > threshold vs a kept box
        (strict >, matching torchvision).
      max_out: number of selection steps (static).
      valid: optional (K,) bool — False entries are never selected.

    Returns:
      keep: (max_out,) int32 indices into boxes, -1 where fewer survive.
      keep_valid: (max_out,) bool.
    """
    k = boxes.shape[0]
    live_scores = jnp.where(valid, scores, NEG_INF) if valid is not None else scores

    def step(carry, _):
        live = carry
        idx = jnp.argmax(live)
        best = live[idx]
        ok = best > NEG_INF / 2
        ious = _iou_one_vs_all(boxes[idx], boxes)
        suppress = ious > iou_threshold
        # the selected box is also removed (it suppresses itself at IoU 1,
        # but guard for degenerate zero-area boxes)
        suppress = suppress.at[idx].set(True)
        live = jnp.where(ok & suppress, NEG_INF, live)
        out_idx = jnp.where(ok, idx, -1)
        return live, (out_idx.astype(jnp.int32), ok)

    _, (keep, keep_valid) = jax.lax.scan(
        step, live_scores, None, length=max_out
    )
    return keep, keep_valid


def batched_nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Category-aware NMS via the coordinate-offset trick
    (reference used torchvision batched_nms, frcnn.py:383): boxes of
    different ``idxs`` never overlap after shifting each category to its own
    coordinate island."""
    if boxes.shape[0] == 0:
        return (
            jnp.full((max_out,), -1, jnp.int32),
            jnp.zeros((max_out,), bool),
        )
    max_coord = jnp.max(boxes) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms_fixed(shifted, scores, iou_threshold, max_out, valid)
