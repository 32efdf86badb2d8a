"""Region Proposal Network — fixed-shape, batched, XLA-native.

The reference RPN (reference: vltk/modeling/frcnn.py:1513-1673,
find_top_rpn_proposals:264-390) produces a *ragged* per-image proposal list
via sort + filter + torchvision NMS. Here the whole path is re-designed as
static-shape tensor algebra so it jits once and runs batched on the MXU/VPU:

  * per-level sort        -> ``lax.top_k`` (pre_nms_topk static; in-jit
                             profiling on v5e at B=16: 0.87 ms — not a
                             bottleneck, tools/probe_propose.py)
  * min-side filter       -> validity mask (never drops rows)
  * torchvision NMS       -> exact greedy selection under a static
                             ``post_nms_topk`` budget; default execution
                             is ``nms_fixed_blocked`` m=64 chunked into
                             16-wide ``lax.map`` steps (the r5 decomposition
                             measured the 300-iteration scan loop-overhead-
                             bound: 12.0 ms at B=16 plain, 4.27 ms
                             unroll=4, 2.15 ms blocked; the 32-wide
                             blocked vmap kernel-faults the worker but the
                             16-wide chunked program runs the B=32
                             headline clean at 60.0 img/s —
                             BASELINE.md propose-harvest table)
  * ragged output         -> (N, post_nms_topk, 4) + bool mask

The final re-sort by logit in the reference (frcnn.py:1630-1638) is a no-op
here: greedy NMS already emits in descending score order.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vltk_tpu.ops.boxes import apply_deltas, clip_boxes, nonempty_mask
from vltk_tpu.ops.nms import NEG_INF, nms_fixed, nms_fixed_blocked


def apply_ignorey(
    boxes: jnp.ndarray,
    valid: jnp.ndarray,
    ignorey: jnp.ndarray,
    scale_x: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The document-image y-band exclusion/clip of the reference RPN
    (reference: frcnn.py:275, 328-366) as mask algebra, single image.

    Per band ``(y0, y1)`` (raw-image coords, divided by the x-scale as the
    reference does at frcnn.py:331):
      * proposals whose y-extent contains the whole band are dropped
        (``valid`` cleared — the reference removes the rows, 335-340);
      * every other proposal is clipped to whichever band edge is nearer:
        bottom edge pulled up to ``int(y0)`` or top edge pushed down to
        ``int(y1)`` (frcnn.py:342-366; ties clip neither). The reference's
        ``box_ignore_below`` branch (347-350) is ``ymax <= y0 AND
        ymax > y0`` — always false — so only boxes entirely below the band
        escape clipping; reproduced faithfully, quirks included.

    Args:
      boxes: (P, 4) xyxy.
      valid: (P,) bool.
      ignorey: (J, 2) bands, static J.
      scale_x: scalar — ``scales_yx[1]`` for this image.

    Returns updated (boxes, valid).
    """
    ymin, ymax = boxes[:, 1], boxes[:, 3]
    for j in range(ignorey.shape[0]):
        y0 = ignorey[j, 0] / scale_x
        y1 = ignorey[j, 1] / scale_x
        drop = (y1 <= ymax) & (y0 >= ymin)
        valid = valid & ~drop
        below_band = (ymin > y1) & (ymax > y0)  # box entirely past the band
        to_clip = ~below_band
        d_top = jnp.abs(y1 - ymax)
        d_bot = jnp.abs(y0 - ymin)
        ymax = jnp.where(to_clip & (d_top < d_bot), jnp.trunc(y0), ymax)
        ymin = jnp.where(to_clip & (d_bot < d_top), jnp.trunc(y1), ymin)
    return jnp.stack([boxes[:, 0], ymin, boxes[:, 2], ymax], axis=1), valid


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
    ignorey: Optional[jnp.ndarray] = None,
    scales_yx: Optional[jnp.ndarray] = None,
    nms_block: int = 0,
    nms_unroll: int = 1,
    nms_chunk: int = 0,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Decode + select top proposals for a batch (single level, C4).

    Args:
      logits: (N, Hf, Wf, A) objectness.
      deltas: (N, Hf, Wf, A*4).
      anchors: (Hf*Wf*A, 4) from ``grid_anchors`` (same (y, x, a) order as
        the NHWC flatten).
      image_sizes: (N, 2) float (h, w) of each image's real content within
        the padded canvas.
      ignorey: optional (N, J, 2) document y-bands to exclude/clip
        proposals against (reference: frcnn.py:328-366); requires
        ``scales_yx`` (the reference guards on both being present).
      scales_yx: (N, 2) raw/padded scale factors, only consumed by the
        ignorey band math here (box rescale happens in postprocess).
      nms_block: if > 0, use :func:`nms_fixed_blocked` with this block
        size (exact greedy, fewer sequential loop steps — see
        tools/probe_propose.py); 0 keeps the scan.
      nms_unroll: scan unroll factor when ``nms_block == 0``.
      nms_chunk: if > 0 and N > nms_chunk, run the per-image selection
        (clip + NMS) as a ``lax.map`` over batch chunks of ``nms_chunk``
        vmapped images instead of one N-wide vmap (non-multiple batches
        are padded with inert lanes and sliced back). The
        keep-set is identical (per-image math is independent); the point
        is program shape — the blocked-greedy while_loop kernel-faulted
        this TPU runtime at the 32-wide vmap but runs clean at 16
        (tools/probe_propose.py), so chunk=16 reproduces the proven
        program shape inside larger batches.

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

    use_bands = ignorey is not None and scales_yx is not None
    # blocked greedy is a TPU-measured execution strategy (5.6x the scan,
    # BASELINE.md propose table); off-TPU it routes to the unrolled scan
    # — bit-identical keep-set either way (tests/test_ops.py,
    # test_models.py), same pattern as the flash-attention eligibility
    # gate. This also keeps the CPU test/dryrun compile profile on the
    # scan path: XLA:CPU 0.9.0 intermittently segfaults late in
    # long-lived processes that compile many of these while_loop
    # programs (3 distinct suite runs, 3 distinct crash sites, all in
    # backend_compile_and_load — flaky, shape-independent).
    use_blocked = nms_block > 0 and jax.default_backend() == "tpu"

    def per_image(boxes_i, scores_i, size_i, bands_i, scale_x_i):
        valid_i = jnp.ones(boxes_i.shape[0], bool)
        if use_bands:
            boxes_i, valid_i = apply_ignorey(boxes_i, valid_i, bands_i, scale_x_i)
        boxes_i = clip_boxes(boxes_i, size_i)
        valid_i = valid_i & nonempty_mask(boxes_i, threshold=min_box_side_len)
        if use_blocked:
            keep, keep_valid = nms_fixed_blocked(
                boxes_i, scores_i, nms_thresh, post_nms_topk, valid=valid_i,
                block=nms_block,
            )
        else:
            keep, keep_valid = nms_fixed(
                boxes_i, scores_i, nms_thresh, post_nms_topk, valid=valid_i,
                unroll=nms_unroll,
            )
        safe = jnp.maximum(keep, 0)
        return boxes_i[safe], scores_i[safe], keep_valid

    if use_bands:
        bands = ignorey.astype(jnp.float32)
        scale_x = scales_yx[:, 1].astype(jnp.float32)
    else:  # unused placeholders so vmap has uniform inputs
        bands = jnp.zeros((n, 0, 2), jnp.float32)
        scale_x = jnp.ones((n,), jnp.float32)
    vargs = (boxes, top_scores.astype(jnp.float32), image_sizes, bands, scale_x)
    if nms_chunk > 0 and n > nms_chunk:
        # pad the batch to a chunk multiple with inert images (zero boxes
        # + zero image size -> every candidate invalid; the blocked
        # while_loop sees no live candidate and exits immediately, the
        # scan runs its fixed budget on an all-invalid lane) and slice
        # the padding back off — per-image selection is independent, so
        # the real lanes are untouched.
        pad = (-n) % nms_chunk
        padded = tuple(
            jnp.concatenate(
                [a, jnp.zeros((pad, *a.shape[1:]), a.dtype)], axis=0
            ) if pad else a
            for a in vargs
        )
        m_total = n + pad
        chunked = tuple(
            a.reshape(m_total // nms_chunk, nms_chunk, *a.shape[1:])
            for a in padded
        )
        out_boxes, out_scores, out_valid = jax.lax.map(
            lambda c: jax.vmap(per_image)(*c), chunked
        )
        out_boxes, out_scores, out_valid = (
            o.reshape(m_total, *o.shape[2:])[:n]
            for o in (out_boxes, out_scores, out_valid)
        )
    else:
        out_boxes, out_scores, out_valid = jax.vmap(per_image)(*vargs)
    out_scores = jnp.where(out_valid, out_scores, NEG_INF)
    return out_boxes, out_scores, out_valid
