"""Detection training objectives — the path the reference never finished.

Every training branch of the reference FRCNN raises NotImplementedError
(reference: vltk/modeling/frcnn.py:1296-1302, 1392-1397, 1612-1613,
1668-1670, 1930-1931); it ships the ``Matcher`` (587-695) and
``subsample_labels`` (393-416) machinery a trainer would need and stops
there. This module finishes the job, static-shape throughout so the whole
train step jits once:

* :func:`subsample_mask` — the fixed-shape counterpart of
  ``subsample_labels``: instead of variable-length index lists it returns
  a boolean sample mask selecting up to ``num_samples`` anchors at the
  requested positive fraction, using per-anchor random priorities.
* :func:`rpn_losses` — objectness BCE + box L1 on anchors matched at
  (0.3, 0.7) with low-quality promotion (Faster R-CNN Sec 3.1.2; reference
  RPN config frcnn.py:1581-1610).
* :func:`fast_rcnn_losses` — classification CE (background = class C) +
  class-specific box L1 on proposals matched at 0.5 (reference
  ROI_HEADS config; detectron2 conventions for normalization).

Ground truth is fixed-shape ``(G, 4)`` + ``gt_valid`` masks, so batches
with any number of real boxes share one compiled program.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from vltk_tpu.ops.boxes import box_iou, encode_deltas
from vltk_tpu.ops.matcher import match_quality


def smooth_l1(diff: jnp.ndarray, beta: float) -> jnp.ndarray:
    """Elementwise smooth-L1; ``beta=0`` is pure L1 (the reference's RPN
    and RoI-head setting, SMOOTH_L1_BETA=0)."""
    if beta <= 0:
        return jnp.abs(diff)
    a = jnp.abs(diff)
    return jnp.where(a < beta, 0.5 * a * a / beta, a - 0.5 * beta)


def _safe_boxes(b: jnp.ndarray) -> jnp.ndarray:
    """Clamp to strictly positive width/height so ``encode_deltas``'s log/
    division stays finite on padded or clip-degenerate boxes — an inf in
    the *unselected* branch of a ``where`` still poisons gradients with
    NaN, so sanitize before the math, not after. No-op on real boxes."""
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [x1, y1, jnp.maximum(x2, x1 + 1e-3), jnp.maximum(y2, y1 + 1e-3)],
        axis=-1,
    )


def _masked_rank(priority: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Rank of each element among ``mask``-selected ones (masked-out rank
    last), fixed shape."""
    score = jnp.where(mask, priority, jnp.inf)
    order = jnp.argsort(score)
    ranks = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
    return ranks


def subsample_mask(
    labels: jnp.ndarray,
    rng: jax.Array,
    num_samples: int,
    positive_fraction: float,
) -> jnp.ndarray:
    """Boolean sample mask over ``labels`` in {-1 ignore, 0 negative,
    1 positive}: up to ``num_samples * positive_fraction`` random
    positives, the remainder random negatives (reference:
    subsample_labels frcnn.py:393-416, ``bg_label=0`` convention folded
    into the label encoding)."""
    n = labels.shape[0]
    pos = labels == 1
    neg = labels == 0
    u = jax.random.uniform(rng, (n,))

    target_pos = int(num_samples * positive_fraction)
    cnt_pos = jnp.sum(pos)
    n_pos = jnp.minimum(target_pos, cnt_pos)
    sel_pos = pos & (_masked_rank(u, pos) < n_pos)

    n_neg = jnp.minimum(num_samples - n_pos, jnp.sum(neg))
    sel_neg = neg & (_masked_rank(u, neg) < n_neg)
    return sel_pos | sel_neg


def rpn_losses(
    anchors: jnp.ndarray,
    objectness_logits: jnp.ndarray,
    anchor_deltas: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    *,
    iou_thresholds: Sequence[float] = (0.3, 0.7),
    iou_labels: Sequence[int] = (0, -1, 1),
    batch_size_per_image: int = 256,
    positive_fraction: float = 0.5,
    bbox_reg_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0),
    smooth_l1_beta: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-batch RPN losses.

    Args:
      anchors: (A, 4).
      objectness_logits: (N, A) — flattened like propose()'s input.
      anchor_deltas: (N, A, 4).
      gt_boxes: (N, G, 4) xyxy; gt_valid (N, G) bool.

    Returns (objectness_loss, localization_loss), each a scalar mean over
    the batch (normalized per image by ``batch_size_per_image``, the
    detectron convention).
    """
    n = objectness_logits.shape[0]
    rngs = jax.random.split(rng, n)

    def per_image(logits_i, deltas_i, gt_i, gtv_i, rng_i):
        iou = box_iou(gt_i, anchors)  # (G, A)
        matches, match_labels = match_quality(
            iou, iou_thresholds, iou_labels,
            allow_low_quality_matches=True, gt_valid=gtv_i,
        )
        sample = subsample_mask(
            match_labels, rng_i, batch_size_per_image, positive_fraction
        )
        pos = sample & (match_labels == 1)

        # objectness BCE over the sampled anchors
        target = (match_labels == 1).astype(jnp.float32)
        logit = logits_i.astype(jnp.float32)
        bce = (
            jnp.maximum(logit, 0) - logit * target
            + jnp.log1p(jnp.exp(-jnp.abs(logit)))
        )
        obj_loss = jnp.sum(jnp.where(sample, bce, 0.0))

        # localization L1 on positive anchors vs their matched gt deltas
        matched_gt = _safe_boxes(gt_i[matches])  # (A, 4)
        target_deltas = encode_deltas(
            _safe_boxes(anchors), matched_gt, tuple(bbox_reg_weights)
        )
        l1 = jnp.sum(
            smooth_l1(deltas_i.astype(jnp.float32) - target_deltas,
                      smooth_l1_beta),
            axis=-1,
        )
        loc_loss = jnp.sum(jnp.where(pos, l1, 0.0))
        return obj_loss, loc_loss

    obj, loc = jax.vmap(per_image)(
        objectness_logits, anchor_deltas, gt_boxes, gt_valid, rngs
    )
    norm = float(batch_size_per_image)
    return jnp.mean(obj) / norm, jnp.mean(loc) / norm


def fast_rcnn_losses(
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    obj_logits: jnp.ndarray,
    box_deltas: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    rng: jax.Array,
    *,
    iou_threshold: float = 0.5,
    batch_size_per_image: int = 512,
    positive_fraction: float = 0.25,
    box_reg_weights: Sequence[float] = (10.0, 10.0, 5.0, 5.0),
    smooth_l1_beta: float = 0.0,
    cls_agnostic_bbox_reg: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """RoI-head classification + box-regression losses.

    Args:
      proposals: (N, P, 4); prop_valid (N, P) bool.
      obj_logits: (N, P, C+1) — background is the LAST class, matching the
        inference path (reference: do_nms drops scores[:, -1]).
      box_deltas: (N, P, C*4) (or (N, P, 4) if class-agnostic).
      gt_boxes (N, G, 4), gt_classes (N, G) int, gt_valid (N, G).

    Returns (cls_loss, box_loss) scalars.
    """
    n, p = obj_logits.shape[:2]
    num_classes = obj_logits.shape[-1] - 1
    # proposals are match/regression TARGET material, never trainable:
    # detectron computes them under no_grad; without this the
    # encode_deltas(proposals, gt) targets would backprop into the RPN
    proposals = jax.lax.stop_gradient(proposals)
    rngs = jax.random.split(rng, n)

    def per_image(props_i, pv_i, logits_i, deltas_i, gt_i, gtc_i, gtv_i, rng_i):
        iou = box_iou(gt_i, props_i)  # (G, P)
        iou = jnp.where(pv_i[None, :], iou, 0.0)  # padded proposals: no match
        matches, match_labels = match_quality(
            iou, (iou_threshold,), (0, 1), gt_valid=gtv_i
        )
        # invalid (padded) proposals never train
        match_labels = jnp.where(pv_i, match_labels, jnp.int8(-1))
        sample = subsample_mask(
            match_labels, rng_i, batch_size_per_image, positive_fraction
        )
        fg = sample & (match_labels == 1)

        # classification: fg -> matched gt class, bg -> background (= C)
        cls_target = jnp.where(fg, gtc_i[matches], num_classes)
        logp = jax.nn.log_softmax(logits_i.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, cls_target[:, None], axis=-1)[:, 0]
        cls_loss = jnp.sum(jnp.where(sample, nll, 0.0))

        # class-specific box regression on fg proposals
        matched_gt = _safe_boxes(gt_i[matches])
        target_deltas = encode_deltas(
            _safe_boxes(props_i), matched_gt, tuple(box_reg_weights)
        )
        if cls_agnostic_bbox_reg:
            sel = deltas_i.reshape(p, 4)
        else:
            flat = deltas_i.reshape(p, num_classes, 4)
            sel = jnp.take_along_axis(
                flat, jnp.clip(cls_target, 0, num_classes - 1)[:, None, None],
                axis=1,
            )[:, 0]
        l1 = jnp.sum(
            smooth_l1(sel.astype(jnp.float32) - target_deltas, smooth_l1_beta),
            axis=-1,
        )
        box_loss = jnp.sum(jnp.where(fg, l1, 0.0))
        return cls_loss, box_loss

    cls, box = jax.vmap(per_image)(
        proposals, prop_valid, obj_logits, box_deltas, gt_boxes, gt_classes,
        gt_valid, rngs,
    )
    norm = float(batch_size_per_image)
    return jnp.mean(cls) / norm, jnp.mean(box) / norm
