"""IoU-threshold matching with low-quality-match promotion.

Re-design of the reference ``Matcher`` (reference: vltk/modeling/frcnn.py:
587-695) for static shapes: instead of the dynamic M==0 early-return and
``torch.nonzero`` tie expansion, padded ground-truth rows are masked out
with a validity vector, so the op jits once for a fixed (M, N) and works
for any actual number of ground truths — the prerequisite for a detection
fine-tuning loop (RPN anchor labels, RoI-head proposal labels).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp


def match_quality(
    quality: jnp.ndarray,
    thresholds: Sequence[float],
    labels: Sequence[int],
    *,
    allow_low_quality_matches: bool = False,
    gt_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Assign each prediction at most one ground truth.

    Args:
      quality: (M, N) non-negative match quality (e.g. IoU), M ground
        truths x N predictions.
      thresholds: ascending stratification thresholds, e.g. (0.3, 0.7).
      labels: per-stratum labels in {-1, 0, 1} (ignore/negative/positive),
        ``len(labels) == len(thresholds) + 1``.
      allow_low_quality_matches: promote, for every ground truth, the
        argmax predictions over it (ties included) to positive — Faster
        R-CNN Sec. 3.1.2 case (i) (reference: frcnn.py:675-695).
      gt_valid: optional (M,) bool marking real (non-padded) ground-truth
        rows. All-False reproduces the reference's empty-gt behavior
        (reference: frcnn.py:644-655): matches 0, labels ``labels[0]``.

    Returns:
      matches: (N,) int32 — best ground-truth index per prediction.
      match_labels: (N,) int8 — stratum label per prediction.
    """
    thresholds = list(thresholds)
    assert thresholds[0] > 0
    assert all(lo <= hi for lo, hi in zip(thresholds, thresholds[1:]))
    assert all(l in (-1, 0, 1) for l in labels)
    assert len(labels) == len(thresholds) + 1
    bounds = [-jnp.inf] + thresholds + [jnp.inf]

    quality = quality.astype(jnp.float32)
    if gt_valid is not None:
        # padded rows get quality -1: below every threshold (first stratum,
        # usually background) and never the argmax when any real gt exists
        quality = jnp.where(gt_valid[:, None], quality, -1.0)

    matched_vals = jnp.max(quality, axis=0)  # (N,)
    matches = jnp.argmax(quality, axis=0).astype(jnp.int32)

    match_labels = jnp.zeros(quality.shape[1], jnp.int8)
    for label, lo, hi in zip(labels, bounds[:-1], bounds[1:]):
        in_stratum = (matched_vals >= lo) & (matched_vals < hi)
        match_labels = jnp.where(in_stratum, jnp.int8(label), match_labels)

    if allow_low_quality_matches:
        highest_per_gt = jnp.max(quality, axis=1, keepdims=True)  # (M, 1)
        is_best = quality == highest_per_gt
        if gt_valid is not None:
            is_best = is_best & gt_valid[:, None]
        promote = jnp.any(is_best, axis=0)
        match_labels = jnp.where(promote, jnp.int8(1), match_labels)

    return matches, match_labels
