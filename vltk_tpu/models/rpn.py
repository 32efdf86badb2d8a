"""Region Proposal Network — fixed-shape, batched, XLA-native.

The reference RPN (reference: vltk/modeling/frcnn.py:1513-1673,
find_top_rpn_proposals:264-390) produces a *ragged* per-image proposal list
via sort + filter + torchvision NMS. Here the whole path is re-designed as
static-shape tensor algebra so it jits once and runs batched on the MXU/VPU:

  * per-level sort        -> ``lax.top_k`` (pre_nms_topk static; in-jit
                             profiling on v5e: 0.6 ms — not a bottleneck)
  * min-side filter       -> validity mask (never drops rows)
  * torchvision NMS       -> ``nms_fixed`` greedy selection under a static
                             ``post_nms_topk`` budget (the scan measures
                             0.7 ms in-jit; the matrix-fixpoint variant in
                             ops/nms.py is slower here and kept for
                             large-max_out regimes)
  * ragged output         -> (N, post_nms_topk, 4) + bool mask

The final re-sort by logit in the reference (frcnn.py:1630-1638) is a no-op
here: greedy NMS already emits in descending score order.
"""

from __future__ import annotations

from typing import Any,  Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vltk_tpu.ops.boxes import apply_deltas, clip_boxes, nonempty_mask
from vltk_tpu.ops.nms import NEG_INF, nms_fixed


class RPNHead(nn.Module):
    """3x3 conv -> (1x1 objectness, 1x1 deltas); the VG model overrides the
    hidden width to 512 (reference: frcnn.py:1537-1542
    PROPOSAL_GENERATOR.HIDDEN_CHANNELS)."""

    num_anchors: int = 15
    hidden_channels: int = 512
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        t = nn.relu(
            nn.Conv(
                self.hidden_channels,
                (3, 3),
                padding=[(1, 1), (1, 1)],
                dtype=self.dtype,
                name="conv",
            )(x)
        )
        logits = nn.Conv(
            self.num_anchors, (1, 1), dtype=self.dtype, name="objectness_logits"
        )(t)
        deltas = nn.Conv(
            self.num_anchors * 4, (1, 1), dtype=self.dtype, name="anchor_deltas"
        )(t)
        return logits, deltas


def propose(
    logits: jnp.ndarray,
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    image_sizes: jnp.ndarray,
    *,
    nms_thresh: float = 0.7,
    pre_nms_topk: int = 6000,
    post_nms_topk: int = 1000,
    min_box_side_len: float = 0.0,
    bbox_reg_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode + select top proposals for a batch (single level, C4).

    Args:
      logits: (N, Hf, Wf, A) objectness.
      deltas: (N, Hf, Wf, A*4).
      anchors: (Hf*Wf*A, 4) from ``grid_anchors`` (same (y, x, a) order as
        the NHWC flatten).
      image_sizes: (N, 2) float (h, w) of each image's real content within
        the padded canvas.

    Returns:
      boxes: (N, post_nms_topk, 4) xyxy, descending objectness.
      scores: (N, post_nms_topk) objectness logits.
      valid: (N, post_nms_topk) bool.
    """
    n = logits.shape[0]
    flat_logits = logits.reshape(n, -1)  # (N, Hf*Wf*A) — NHWC order matches anchors
    flat_deltas = deltas.reshape(n, -1, 4)

    k = min(pre_nms_topk, flat_logits.shape[1])
    top_scores, top_idx = jax.lax.top_k(flat_logits, k)  # (N, k)
    top_deltas = jnp.take_along_axis(flat_deltas, top_idx[..., None], axis=1)
    top_anchors = anchors[top_idx]  # (N, k, 4)

    boxes = apply_deltas(
        top_deltas.astype(jnp.float32),  # (N, k, 4) — single transform per box
        top_anchors,
        weights=tuple(bbox_reg_weights),
    )

    def per_image(boxes_i, scores_i, size_i):
        boxes_i = clip_boxes(boxes_i, size_i)
        valid_i = nonempty_mask(boxes_i, threshold=min_box_side_len)
        keep, keep_valid = nms_fixed(
            boxes_i, scores_i, nms_thresh, post_nms_topk, valid=valid_i
        )
        safe = jnp.maximum(keep, 0)
        return boxes_i[safe], scores_i[safe], keep_valid

    out_boxes, out_scores, out_valid = jax.vmap(per_image)(
        boxes, top_scores.astype(jnp.float32), image_sizes
    )
    out_scores = jnp.where(out_valid, out_scores, NEG_INF)
    return out_boxes, out_scores, out_valid
