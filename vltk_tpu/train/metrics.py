"""Metrics (reference: build/lib/vltk/metrics.py:6-28 shipped `accuracy` +
`soft_score`; live tree deleted them mid-refactor)."""

from __future__ import annotations

import jax.numpy as jnp


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Fraction of argmax hits (reference: metrics.py:6-11)."""
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def vqa_score(logits: jnp.ndarray, target_scores: jnp.ndarray) -> jnp.ndarray:
    """VQA accuracy: the soft score of the predicted answer, averaged.

    ``target_scores`` are the 0.3/0.6/0.9/1.0 soft scores the VQA adapter
    writes (reference: utils/adapters.py:285-295).
    """
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean(jnp.take_along_axis(target_scores, pred[:, None], axis=1))


def detection_map(
    pred_boxes,
    pred_scores,
    pred_classes,
    pred_valid,
    gt_boxes,
    gt_classes,
    gt_valid,
    iou_thresh: float = 0.5,
) -> float:
    """Mean average precision at one IoU threshold — the eval metric for
    the detection fine-tune path (models/detection_loss.py); the reference
    shipped no detection evaluation at all (its only metrics were
    accuracy/soft_score, build/lib/vltk/metrics.py:6-28).

    Host-side numpy (runs on fetched outputs, not inside jit): VOC-style
    all-point interpolated AP per class with greedy score-ordered matching,
    averaged over classes that have ground truth.

    Args (batched fixed-shape arrays):
      pred_boxes (N, D, 4) xyxy, pred_scores (N, D), pred_classes (N, D),
      pred_valid (N, D) bool; gt_boxes (N, G, 4), gt_classes (N, G),
      gt_valid (N, G) bool.
    """
    import numpy as np

    pred_boxes = np.asarray(pred_boxes, np.float32)
    pred_scores = np.asarray(pred_scores, np.float32)
    pred_classes = np.asarray(pred_classes)
    pred_valid = np.asarray(pred_valid).astype(bool)
    gt_boxes = np.asarray(gt_boxes, np.float32)
    gt_classes = np.asarray(gt_classes)
    gt_valid = np.asarray(gt_valid).astype(bool)

    def iou(a, b):
        lt = np.maximum(a[:2], b[:2])
        rb = np.minimum(a[2:], b[2:])
        wh = np.clip(rb - lt, 0, None)
        inter = wh[0] * wh[1]
        ua = max(a[2] - a[0], 0) * max(a[3] - a[1], 0)
        ub = max(b[2] - b[0], 0) * max(b[3] - b[1], 0)
        union = ua + ub - inter
        return inter / union if union > 0 else 0.0

    classes = np.unique(gt_classes[gt_valid])
    if classes.size == 0:
        return 0.0
    aps = []
    for c in classes:
        # every class iterated has >= 1 valid gt by construction of `classes`
        n_gt = int((gt_valid & (gt_classes == c)).sum())
        # all predictions of class c across the batch, score-descending
        entries = []  # (score, image, box)
        for n in range(pred_boxes.shape[0]):
            sel = pred_valid[n] & (pred_classes[n] == c)
            for d in np.flatnonzero(sel):
                entries.append((pred_scores[n, d], n, pred_boxes[n, d]))
        entries.sort(key=lambda e: -e[0])
        matched = [set() for _ in range(gt_boxes.shape[0])]
        tp = np.zeros(len(entries))
        for i, (_, n, box) in enumerate(entries):
            # VOC rule: a detection is judged against its MAX-IoU gt; if
            # that gt is already claimed by a higher-scored detection the
            # detection is a FP (no fallback to a lower-IoU unmatched gt)
            best, best_g = 0.0, -1
            for g in np.flatnonzero(gt_valid[n] & (gt_classes[n] == c)):
                v = iou(box, gt_boxes[n, g])
                if v > best:
                    best, best_g = v, g
            if best >= iou_thresh and best_g >= 0 and best_g not in matched[n]:
                tp[i] = 1.0
                matched[n].add(best_g)
        cum_tp = np.cumsum(tp)
        recall = cum_tp / n_gt
        precision = cum_tp / np.arange(1, len(entries) + 1)
        # all-point interpolation: precision envelope, area under PR
        ap = 0.0
        prev_r = 0.0
        for r, p in zip(recall, np.maximum.accumulate(precision[::-1])[::-1]):
            ap += (r - prev_r) * p
            prev_r = r
        aps.append(ap)
    return float(np.mean(aps)) if aps else 0.0
