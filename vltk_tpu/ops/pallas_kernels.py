"""Pallas TPU kernels for the detection hot path.

``roi_pool_pallas`` — exact torchvision RoIPool as a Mosaic kernel. The
XLA formulations (ops/roi_pool.py) bottom out in HBM row-gathers, which
profiling on v5e showed run at ~25 GB/s effective (gather-issue bound, not
bandwidth bound). Here the whole per-image feature map block is pinned in
VMEM (52x84x1024 bf16 = 8.9 MB < 16 MB) and each grid step (one RoI)
computes its 14x14 bins with a two-pass separable masked max:

  pass 1: for each of 14 row-bins, load the (MAXBH, W, C) row window with
          one static-size dynamic slice, mask rows outside [hstart, hend),
          reduce -> (W, C) row-max scratch;
  pass 2: for each of 14 col-bins, slice (14, MAXBW, C) from the scratch,
          mask cols outside [wstart, wend), reduce -> (14, C) output col.

Measured 41 ms for (8, 300) RoIs over (52, 84, 1024) bf16 on v5e — 2x the
XLA sparse-table path, 16x the original gather loop. Two further variants
were built and benchmarked at identical speed (in-jit timing), so the
kernel is at a structural floor, likely the strided rowmax-scratch
traffic: (a) in-kernel sliding-window-max tables cutting pass-1 reads
from 5 masked rows to 2 table rows per bin; (b) grouping 10 RoIs per grid
step to amortize step overhead. Both were reverted for simplicity (git
history: "in-kernel tables" experiments).

Round-2 channel-block sweep (same shape, micro-bench): cb=256 (auto
heuristic) 39.6 ms, cb=512 43.6 ms, cb=1024 refuses to compile (scoped
vmem 21.4M > 16M). Halving the grid-step count made it *slower*, so the
kernel is not step-count bound either; at 9600 (image, cb, roi) steps the
measured ~4.1 us/step matches the VMEM read traffic of the 28 serial
masked-slice ops per step — cutting it further needs fewer/larger inner
ops (the bins' unequal heights block a single reshape-reduce), not
different blocking. Re-measure before re-attempting any of the above.

All VMEM traffic, no gathers; bin arithmetic (integer edges identical to
torchvision, see ops/roi_pool.py:_roi_bin_edges) is precomputed in XLA and
fed through SMEM. Grid = (B, P) with the image block reused across the P
inner steps (grid iterates last axis fastest).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _kernel(y1_ref, x1_ref, rh_ref, rw_ref, feat_ref, out_ref, rowmax_ref,
            *, out_size: int, max_bh: int, max_bw: int, h: int, w: int):
    dtype = feat_ref.dtype
    neg = jnp.asarray(_NEG, dtype)
    bi = pl.program_id(0)
    pi = pl.program_id(2)  # grid is (batch, channel-blocks, rois)
    # scalar prefetch carries only 4 ints per RoI (corner + size), flat 1D
    # (SMEM pads the last two dims to (8,128) tiles, and the per-bin edge
    # arrays blew the 1 MB SMEM budget inside the full model) — bin edges
    # are recomputed here with the same integer formulas as
    # ops/roi_pool.py:_roi_bin_edges
    ri = bi * pl.num_programs(2) + pi
    y1 = y1_ref[ri]
    x1 = x1_ref[ri]
    rh = rh_ref[ri]
    rw = rw_ref[ri]

    # pass 1: row bins -> rowmax scratch, laid out (W, out_size, C) so the
    # pass-2 dynamic column slice is on dim 0 (Mosaic only allows dynamic
    # starts outside the last two (sublane, lane) dims)
    for i in range(out_size):
        hs = jnp.clip((i * rh) // out_size + y1, 0, h)
        he = jnp.clip(((i + 1) * rh + out_size - 1) // out_size + y1, 0, h)
        y0 = jnp.clip(hs, 0, h - max_bh)
        rows = feat_ref[0, pl.ds(y0, max_bh), :, :]  # (max_bh, W, C)
        ridx = jax.lax.broadcasted_iota(jnp.int32, (max_bh, 1, 1), 0) + y0
        keep = (ridx >= hs) & (ridx < he)
        rows = jnp.where(keep, rows, neg)
        rowmax_ref[:, i, :] = jnp.max(rows, axis=0)  # (W, C)

    # pass 2: col bins -> output (out_size, out_size, C)
    for j in range(out_size):
        ws = jnp.clip((j * rw) // out_size + x1, 0, w)
        we = jnp.clip(((j + 1) * rw + out_size - 1) // out_size + x1, 0, w)
        x0 = jnp.clip(ws, 0, w - max_bw)
        cols = rowmax_ref[pl.ds(x0, max_bw), :, :]  # (max_bw, out_size, C)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (max_bw, 1, 1), 0) + x0
        keep = (cidx >= ws) & (cidx < we)
        cols = jnp.where(keep, cols, neg)
        m = jnp.max(cols, axis=0).astype(jnp.float32)  # (out_size, C)
        # empty bins (hend<=hstart or wend<=wstart) -> 0 like torchvision;
        # compare in f32 (bf16 compares are unsupported on some Mosaic
        # targets)
        out_ref[0, 0, :, j, :] = jnp.where(m <= _NEG / 2, 0.0, m).astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "interpret", "channel_block"),
)
def roi_pool_pallas(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 14,
    spatial_scale: float = 1.0 / 16,
    interpret: bool = False,
    channel_block: int = 0,
) -> jnp.ndarray:
    """Batched exact RoIPool.

    Args:
      features: (B, H, W, C) feature maps (bf16 recommended; a single
        image block must fit VMEM: H*W*C*itemsize < ~10 MB).
      boxes: (B, P, 4) xyxy input-image coordinates, clipped to the image.
      interpret: run in interpreter mode (CPU tests).

    Returns (B, P, output_size, output_size, C).
    """
    b, h, w, c = features.shape
    p = boxes.shape[1]
    os_ = output_size
    max_bh = min(math.ceil((h + 1) / os_) + 1, h)
    max_bw = min(math.ceil((w + 1) / os_) + 1, w)

    # integer roi corners/sizes, torchvision rounding (std::round half away
    # from zero) — shared with _roi_bin_edges
    scaled = boxes * spatial_scale
    roi = jnp.where(
        scaled >= 0, jnp.floor(scaled + 0.5), jnp.ceil(scaled - 0.5)
    ).astype(jnp.int32)
    y1 = roi[..., 1].reshape(-1)
    x1 = roi[..., 0].reshape(-1)
    rh = jnp.maximum(roi[..., 3] - roi[..., 1] + 1, 1).reshape(-1)
    rw = jnp.maximum(roi[..., 2] - roi[..., 0] + 1, 1).reshape(-1)

    kernel = functools.partial(
        _kernel, out_size=os_, max_bh=max_bh, max_bw=max_bw, h=h, w=w
    )
    # block the channel dim so the (1, H, W, Cb) image block stays well
    # under VMEM even double-buffered (Mosaic pipelines input blocks);
    # channel blocks sit between batch and RoIs in the grid so the image
    # block is reused across all P inner steps. channel_block=0 picks the
    # 4 MB-per-block heuristic; nonzero overrides (perf experiments)
    if channel_block:
        cb = min(channel_block, c)
    else:
        cb = c
        while cb > 128 and (h * w * cb * features.dtype.itemsize) > 4 * 2**20:
            cb //= 2
    n_cb = -(-c // cb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, n_cb, p),
        in_specs=[
            pl.BlockSpec(
                (1, h, w, cb), lambda bi, ci, pi, *_: (bi, 0, 0, ci),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, os_, os_, cb), lambda bi, ci, pi, *_: (bi, pi, 0, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.VMEM((w, os_, cb), features.dtype)],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p, os_, os_, c), features.dtype),
        interpret=interpret,
    )(y1, x1, rh, rw, features)


def _kernel_v2(y1_ref, x1_ref, rh_ref, rw_ref, feat_ref, out_ref, table_ref,
               rowmax_ref, *, out_size: int, max_bh: int, max_bw: int,
               h: int, w: int):
    """Row-range-max-table variant: see ``roi_pool_pallas_v2``."""
    dtype = feat_ref.dtype
    neg = jnp.asarray(_NEG, dtype)
    bi = pl.program_id(0)
    pi = pl.program_id(2)  # grid is (batch, channel-blocks, rois)
    ri = bi * pl.num_programs(2) + pi
    y1 = y1_ref[ri]
    x1 = x1_ref[ri]
    rh = rh_ref[ri]
    rw = rw_ref[ri]

    # Build the per-(image, channel-block) row-range-max table ONCE (the
    # RoI axis iterates fastest, so pi==0 marks a fresh (bi, ci) block) and
    # amortize it over all P RoI steps. T[l][y] = max(rows[y : y+l+1]);
    # level l is built from level l-1 plus one shifted level-0 row, so the
    # whole build is ~max_bh passes over the block.
    @pl.when(pi == 0)
    def _build():
        table_ref[0] = feat_ref[0]
        for li in range(1, max_bh):
            n_valid = h - li
            table_ref[li, :n_valid] = jnp.maximum(
                table_ref[li - 1, :n_valid], table_ref[0, li:]
            )
            # tail rows y > h-1-li are never read (reads satisfy
            # y + len <= h); fill from the previous level for determinism
            table_ref[li, n_valid:] = table_ref[li - 1, n_valid:]

    # pass 1: each row bin is ONE unmasked table read (vs max_bh masked
    # row reads + compare/select in the v1 kernel)
    for i in range(out_size):
        hs = jnp.clip((i * rh) // out_size + y1, 0, h)
        he = jnp.clip(((i + 1) * rh + out_size - 1) // out_size + y1, 0, h)
        ln = he - hs
        li = jnp.clip(ln - 1, 0, max_bh - 1)
        ys = jnp.clip(hs, 0, h - 1)
        val = table_ref[li, ys]  # (w, cb): max over rows [hs, hs+ln)
        rowmax_ref[:, i, :] = jnp.where(ln > 0, val, neg)

    # pass 2: col bins, identical to v1 (the rowmax scratch is per-RoI, so
    # a column table cannot be amortized the same way)
    for j in range(out_size):
        ws = jnp.clip((j * rw) // out_size + x1, 0, w)
        we = jnp.clip(((j + 1) * rw + out_size - 1) // out_size + x1, 0, w)
        x0 = jnp.clip(ws, 0, w - max_bw)
        cols = rowmax_ref[pl.ds(x0, max_bw), :, :]  # (max_bw, out_size, cb)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (max_bw, 1, 1), 0) + x0
        keep = (cidx >= ws) & (cidx < we)
        cols = jnp.where(keep, cols, neg)
        m = jnp.max(cols, axis=0).astype(jnp.float32)
        out_ref[0, 0, :, j, :] = jnp.where(m <= _NEG / 2, 0.0, m).astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=("output_size", "spatial_scale", "interpret", "channel_block"),
)
def roi_pool_pallas_v2(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 14,
    spatial_scale: float = 1.0 / 16,
    interpret: bool = False,
    channel_block: int = 0,
) -> jnp.ndarray:
    """Batched exact RoIPool, v2: persistent row-range-max table.

    Numerically identical to ``roi_pool_pallas``; the difference is pure
    scheduling. A (max_bh, H, W, cb) VMEM scratch holds, for every row y
    and window length l+1 <= max_bh, the running max over rows
    [y, y+l+1) — built once per (image, channel-block) grid entry and
    reused across all P RoI steps. Pass 1 then reads each row bin's exact
    range max with a single dynamically indexed row read, replacing v1's
    max_bh masked row reads + compare/select chain (the measured 4.1
    us/step VPU floor). The table caps the channel block lower (128 at
    parity shape) so table+image+scratch stay within VMEM.
    """
    b, h, w, c = features.shape
    p = boxes.shape[1]
    os_ = output_size
    max_bh = min(math.ceil((h + 1) / os_) + 1, h)
    max_bw = min(math.ceil((w + 1) / os_) + 1, w)

    scaled = boxes * spatial_scale
    roi = jnp.where(
        scaled >= 0, jnp.floor(scaled + 0.5), jnp.ceil(scaled - 0.5)
    ).astype(jnp.int32)
    y1 = roi[..., 1].reshape(-1)
    x1 = roi[..., 0].reshape(-1)
    rh = jnp.maximum(roi[..., 3] - roi[..., 1] + 1, 1).reshape(-1)
    rw = jnp.maximum(roi[..., 2] - roi[..., 0] + 1, 1).reshape(-1)

    kernel = functools.partial(
        _kernel_v2, out_size=os_, max_bh=max_bh, max_bw=max_bw, h=h, w=w
    )
    # channel-block heuristic: the dominant VMEM resident is the table
    # (max_bh * image block); keep it under ~6 MB so table + double-buffered
    # image block + rowmax scratch fit comfortably in 16 MB VMEM
    if channel_block:
        cb = min(channel_block, c)
    else:
        cb = c
        while cb > 128 and (
            max_bh * h * w * cb * features.dtype.itemsize
        ) > 6 * 2**20:
            cb //= 2
    n_cb = -(-c // cb)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(b, n_cb, p),
        in_specs=[
            pl.BlockSpec(
                (1, h, w, cb), lambda bi, ci, pi, *_: (bi, 0, 0, ci),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, os_, os_, cb), lambda bi, ci, pi, *_: (bi, pi, 0, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((max_bh, h, w, cb), features.dtype),
            pltpu.VMEM((w, os_, cb), features.dtype),
        ],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, p, os_, os_, c), features.dtype),
        interpret=interpret,
    )(y1, x1, rh, rw, features)


def _roi_pool_xla(features_b, boxes_b, output_size, spatial_scale):
    from vltk_tpu.ops.roi_pool import roi_pool

    return jax.vmap(
        lambda f, bx: roi_pool(f, bx, output_size, spatial_scale)
    )(features_b, boxes_b)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def roi_pool_pallas_ad(
    features_b, boxes_b, output_size=14, spatial_scale=1.0 / 16,
    interpret=False,
):
    """Differentiable pallas RoIPool: the forward is the Mosaic kernel;
    the backward re-derives the max-pool VJP through the XLA formulation
    (numerically identical bins — tests assert array_equal), which XLA
    differentiates natively. Boxes get zero cotangent: RoIPool is
    piecewise-constant in the (integer-rounded) box coordinates, matching
    torchvision's no-box-grad semantics. This is what lets the detection
    fine-tune step (models/detection_loss.py) train THROUGH the fast
    extraction kernel on TPU instead of falling back to the slow path."""
    return roi_pool_pallas(
        features_b, boxes_b, output_size, spatial_scale, interpret=interpret
    )


def _roi_pool_ad_fwd(features_b, boxes_b, output_size, spatial_scale, interpret):
    out = roi_pool_pallas(
        features_b, boxes_b, output_size, spatial_scale, interpret=interpret
    )
    return out, (features_b, boxes_b)


def _roi_pool_ad_bwd(output_size, spatial_scale, interpret, res, g):
    features_b, boxes_b = res
    _, vjp = jax.vjp(
        lambda f: _roi_pool_xla(f, boxes_b, output_size, spatial_scale),
        features_b,
    )
    return vjp(g)[0], jnp.zeros_like(boxes_b)


roi_pool_pallas_ad.defvjp(_roi_pool_ad_fwd, _roi_pool_ad_bwd)


def roi_pool_auto(features_b, boxes_b, output_size=14, spatial_scale=1.0 / 16):
    """Batched RoIPool dispatcher: pallas kernel on TPU (differentiable
    via the custom VJP above), XLA sparse-table formulation elsewhere.
    features_b (B,H,W,C), boxes_b (B,P,4)."""
    if jax.default_backend() == "tpu":
        return roi_pool_pallas_ad(features_b, boxes_b, output_size, spatial_scale)
    return _roi_pool_xla(features_b, boxes_b, output_size, spatial_scale)
