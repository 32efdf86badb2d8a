"""Fixed-shape greedy NMS for XLA.

The reference called torchvision's C++/CUDA ``nms``/``batched_nms``
(reference: vltk/modeling/frcnn.py:31, 132, 383). On TPU, data-dependent
output sizes don't compile, so NMS is reformulated as *selection under a
static budget*: exactly ``max_out`` greedy selection steps, each picking the
highest-scoring unsuppressed box and masking its overlaps. The result is the
same ordered keep-set as greedy NMS, padded with ``-1`` indices and a
validity mask.

Cost: O(max_out * K) IoU evaluations as a ``lax.scan`` — max_out is small
(300 for RPN, 36-100 for ROI heads), K is the padded candidate count. On
TPU the scan is LOOP-OVERHEAD-bound, not IoU-bound (r5,
tools/probe_propose.py at 16x6000->300: 12.0 ms plain, 4.27 ms with
``unroll=4``, 2.15 ms for :func:`nms_fixed_blocked` m=64). The RPN
default is blocked greedy m=64: its 32-wide vmapped while_loop
kernel-faulted this TPU runtime inside the full B=32 extraction program
(3/3), but chunking the batch into 16-wide ``lax.map`` steps
(``propose(nms_chunk=16)``, the proven-clean program width) runs the
B=32 headline clean 3/3 at 60.0 img/s — +1.0% over the ``unroll=4``
scan, bit-identical keep-set (TPU probe + CPU tests). Off-TPU,
``propose`` routes ``nms_block`` to the unrolled scan (the while_loop
compile path is also flaky on XLA:CPU 0.9.0 — see rpn.py), so the
blocked strategy is a TPU execution detail, not a semantic switch.
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
    unroll: int = 1,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with a static output budget.

    Args:
      boxes: (K, 4) xyxy.
      scores: (K,).
      iou_threshold: suppress boxes with IoU > threshold vs a kept box
        (strict >, matching torchvision).
      max_out: number of selection steps (static).
      valid: optional (K,) bool — False entries are never selected.
      unroll: ``lax.scan`` unroll factor — same algorithm, fewer loop
        iterations (the per-iteration overhead, not the arithmetic, is
        the TPU cost of this scan; see tools/probe_propose.py).

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
        step, live_scores, None, length=max_out, unroll=unroll
    )
    return keep, keep_valid


def nms_fixed_blocked(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
    block: int = 32,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS processing ``block`` candidates per loop step.

    :func:`nms_fixed` pays ``max_out`` sequential scan iterations, each a
    tiny argmax + one IoU row — on TPU the per-iteration loop overhead, not
    the arithmetic, is the cost (measured: tools/probe_propose.py). This
    variant takes the ``block`` highest-scoring *live* candidates per step
    and resolves them with an in-block unrolled greedy pass. Because the
    block is exactly the score-descending prefix of the live set, in-block
    greedy order equals global greedy order, so the keep-set is identical
    to :func:`nms_fixed` — every block candidate is either accepted or
    suppressed by a higher-scoring accepted box, and the accepted boxes'
    global suppression is applied before the next block is drawn. The loop
    runs until ``max_out`` boxes are kept or no live candidate remains
    (worst case ``max_out`` steps when every block yields one accept; the
    typical detector block yields many).

    Same contract as :func:`nms_fixed` (keep indices in descending score
    order, -1 padded, plus a validity mask).
    """
    live0 = jnp.where(valid, scores, NEG_INF) if valid is not None else scores
    live0 = live0.astype(jnp.float32)
    # a block can't exceed the candidate count (tiny smoke geometries
    # feed K < block; top_k requires k <= size)
    m = min(block, boxes.shape[0])

    def cond(state):
        _, _, count, any_live = state
        return (count < max_out) & any_live

    def body(state):
        live, out_idx, count, _ = state
        bscores, bidx = jax.lax.top_k(live, m)  # score-desc prefix of live
        bboxes = boxes[bidx]  # (m, 4)
        cand = bscores > NEG_INF / 2

        # in-block greedy, unrolled: acc[i] = cand[i] and no earlier
        # accepted block box suppresses it
        iou = _pairwise_iou(bboxes)  # (m, m)
        sup = iou > iou_threshold
        acc = jnp.zeros((m,), bool).at[0].set(cand[0])
        for i in range(1, m):
            hit = jnp.any(sup[i, :i] & acc[:i])
            acc = acc.at[i].set(cand[i] & ~hit)

        # budget: only the first (max_out - count) accepts land this step
        pos = jnp.cumsum(acc) - 1
        take = acc & (pos < max_out - count)
        tgt = jnp.where(take, count + pos, max_out)
        out_idx = out_idx.at[tgt].set(bidx.astype(jnp.int32), mode="drop")

        # global suppression by the taken boxes (removes the taken boxes
        # themselves at IoU 1 and their in-block victims transitively)
        lt = jnp.maximum(bboxes[:, None, :2], boxes[None, :, :2])
        rb = jnp.minimum(bboxes[:, None, 2:], boxes[None, :, 2:])
        wh = jnp.maximum(rb - lt, 0.0)
        inter = wh[..., 0] * wh[..., 1]
        union = box_area(bboxes)[:, None] + box_area(boxes)[None, :] - inter
        iou_all = jnp.where(union > 0, inter / union, 0.0)  # (m, K)
        sup_any = jnp.any((iou_all > iou_threshold) & take[:, None], axis=0)
        live = jnp.where(sup_any, NEG_INF, live)
        # degenerate zero-area taken boxes have IoU 0 with themselves —
        # remove every examined-and-resolved block candidate explicitly
        # (non-taken block candidates are suppressed victims of a taken
        # box, already NEG_INF above, unless the budget truncated — and
        # truncation means count hits max_out, ending the loop)
        live = live.at[bidx].set(jnp.where(take, NEG_INF, live[bidx]))

        count = count + jnp.sum(take.astype(jnp.int32))
        return live, out_idx, count, jnp.max(live) > NEG_INF / 2

    out0 = jnp.full((max_out + 1,), -1, jnp.int32)
    _, out_idx, _, _ = jax.lax.while_loop(
        cond, body, (live0, out0, jnp.int32(0), jnp.max(live0) > NEG_INF / 2)
    )
    keep = out_idx[:max_out]
    return keep, keep >= 0


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


# ---------------------------------------------------------------------------
# matrix-fixpoint NMS — exact greedy keep-set without the sequential scan
# ---------------------------------------------------------------------------


def _pairwise_iou(boxes: jnp.ndarray) -> jnp.ndarray:
    """(K, 4) -> (K, K) IoU, f32."""
    lt = jnp.maximum(boxes[:, None, :2], boxes[None, :, :2])
    rb = jnp.minimum(boxes[:, None, 2:], boxes[None, :, 2:])
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area = box_area(boxes)
    union = area[:, None] + area[None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def nms_fixed_matrix(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Exact greedy NMS via the iterative suppression-matrix fixpoint.

    Greedy NMS is the unique fixpoint of
    ``keep[i] = valid[i] & not OR_{j<i}(iou[i,j] > t & keep[j])`` over
    score-descending order. Iterating from all-kept converges in
    O(longest suppression chain) sweeps (typically 2-5 on detector
    outputs), each sweep one (K, K) masked mat-vec, at the cost of a
    (K, K) IoU matrix + an argsort.

    Measured on v5e with in-jit repetition (see CLAUDE.md on timing):
    at RPN size (8 x 6000 candidates, max_out=300) this runs 10.6 ms vs
    the :func:`nms_fixed` scan (r5 re-measurement at 16 x 6000: scan
    12.0 ms plain / **4.27 ms with unroll=4**, the shipped default —
    the r3 "0.7 ms" scan figure in this docstring's earlier revision
    did not reproduce under the decomposition probe). The unrolled scan
    wins at every ``max_out`` in this framework; this variant is kept
    for large-``max_out`` regimes where the scan's sequential step
    count dominates even unrolled.

    Same contract as :func:`nms_fixed`: (keep indices desc-score, valid).
    """
    k = boxes.shape[0]
    live = jnp.where(valid, scores, NEG_INF) if valid is not None else scores
    order = jnp.argsort(-live)  # descending; invalid sink to the end
    sboxes = boxes[order]
    slive = live[order] > NEG_INF / 2  # (K,) candidate mask

    iou = _pairwise_iou(sboxes)
    tri = jnp.tril(jnp.ones((k, k), bool), k=-1)  # j < i strictly
    sup = (iou > iou_threshold) & tri & slive[None, :]  # j must be a candidate

    def cond(state):
        _, changed, it = state
        return changed & (it < k)

    def body(state):
        keep, _, it = state
        new = slive & ~jnp.any(sup & keep[None, :], axis=1)
        return new, jnp.any(new != keep), it + 1

    keep0 = slive
    keep, _, _ = jax.lax.while_loop(cond, body, (keep0, jnp.bool_(True), 0))

    # first max_out kept entries, in sorted (descending score) order
    pos = jnp.cumsum(keep) - 1  # position among kept
    in_budget = keep & (pos < max_out)
    target = jnp.where(in_budget, pos, max_out)
    slots = jnp.full((max_out + 1,), -1, jnp.int32)
    slots = slots.at[target].set(order.astype(jnp.int32), mode="drop")
    out_idx = slots[:max_out]
    out_valid = out_idx >= 0
    return jnp.where(out_valid, out_idx, -1), out_valid


def nms_fixed_auto(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    valid: Optional[jnp.ndarray] = None,
    matrix_budget: int = 8192,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Scan by default (it wins at every small ``max_out`` per the v5e
    measurements above); matrix fixpoint only when the sequential step
    count is large AND the (K, K) IoU fits the budget."""
    k = boxes.shape[0]
    if max_out > 512 and k <= matrix_budget:
        return nms_fixed_matrix(boxes, scores, iou_threshold, max_out, valid)
    return nms_fixed(boxes, scores, iou_threshold, max_out, valid)


# ---------------------------------------------------------------------------
# sortless exact top-k (membership, not order)
# ---------------------------------------------------------------------------


def kth_largest(scores: jnp.ndarray, k: int, iters: int = 40) -> jnp.ndarray:
    """Exact-to-f32-precision k-th largest value along the last axis via
    value bisection (no sort / no top_k).

    Note: on v5e, ``lax.top_k`` (k=6000 over 82k) measures 0.6 ms with
    in-jit repetition while this + scatter compaction measures 4.3 ms —
    top_k stays the model default; these exist for cases that only need
    a threshold (no indices) or must avoid sorts."""
    lo = jnp.min(scores, axis=-1)
    hi = jnp.max(scores, axis=-1)

    def body(_, state):
        lo, hi = state
        mid = (lo + hi) / 2
        cnt = jnp.sum(scores >= mid[..., None], axis=-1)
        ge = cnt >= k
        return jnp.where(ge, mid, lo), jnp.where(ge, hi, mid)

    lo, hi = jax.lax.fori_loop(0, iters, body, (lo, hi))
    return lo


def topk_mask_compact(
    scores: jnp.ndarray, k: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Indices of the top-k values of a 1D array, in *arbitrary* order
    (threshold + cumsum-scatter compaction; ties beyond k dropped by
    position). Returns (idx (k,), valid (k,)).

    Slower than ``lax.top_k`` on v5e (scatter-bound; see kth_largest
    note) — a library alternative, not the model default."""
    n = scores.shape[0]
    if k >= n:
        idx = jnp.arange(n, dtype=jnp.int32)
        pad = jnp.full((k - n,), -1, jnp.int32)
        full = jnp.concatenate([idx, pad])
        return full, full >= 0
    t = kth_largest(scores, k)
    mask = scores >= t
    pos = jnp.cumsum(mask) - 1
    in_budget = mask & (pos < k)
    target = jnp.where(in_budget, pos, k)
    slots = jnp.full((k + 1,), -1, jnp.int32)
    slots = slots.at[target].set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    out = slots[:k]
    return out, out >= 0
