"""Pallas TPU kernels for the detection hot path.

``roi_pool_pallas`` — exact torchvision RoIPool as a Mosaic kernel. The
XLA formulations (ops/roi_pool.py) bottom out in HBM row-gathers, which
profiling on v5e showed run at ~25 GB/s effective (gather-issue bound, not
bandwidth bound). Here the whole per-image feature map block is pinned in
VMEM and each grid step (one RoI) computes its 14x14 bins in two passes:

  build (once per (image, channel-block), amortized over all P RoIs):
          a row-range-max table T[l][y] = max(rows[y : y+l+1]) for every
          window length l+1 <= MAXBH, built level-by-level with one
          shifted max per level (~MAXBH passes over the block);
  pass 1: each of the 14 row-bins is ONE unmasked table read
          T[len-1][hstart] -> (W, C), written CONTIGUOUSLY into a
          (14, Wpad, C) row-max scratch;
  pass 2: for each of the 14 col-bins, one 8-ALIGNED dynamic-start slice
          (14, WIN, C) of the scratch on the sublane dim, mask cols
          outside [wstart, wend), reduce -> (14, C) output column.

History of this design (all measured on v5e, in-jit fori timing, (8, 300)
RoIs over (52, 84, 1024) bf16 — see tools/probe_roipool_ablation.py):

* v1 (rounds 1-2, 39.5 ms): masked row reads + a (W, 14, C) scratch.
  An ablation with BOTH passes stubbed to trivial copies still took
  32 ms — the kernel was dominated by pass 1's scratch writes
  ``rowmax[:, i, :]``, which in the (W, 14, C) layout are single-sublane
  masked stores into W separate tiles: B*P*14*W*(C/128) ~ 22.6M strided
  stores, invariant under channel-block size and RoI grouping (which is
  why the r2 cb sweep and RoI-grouping experiments moved nothing).
* register-stack variant (46.8 ms): building all 14 row slabs in vregs
  and storing once — the sublane<->leading relayout cost MORE than the
  strided stores. Transposes of this shape are not the escape.
* v3 (current, 19.7 ms): the scratch is (14, Wpad, C) so pass-1 writes
  are contiguous; pass 2 dynamically slices the SUBLANE dim instead —
  legal in current Mosaic when the start is provably 8-aligned
  (pl.multiple_of on 8*(ws//8), window widened to 16 and masked).
  Numerically bit-identical to v1 on TPU.
* int8 variant (dead end on THIS toolchain, r3): pooling the already-
  quantized res4 activations would halve the kernel's traffic in the
  int8 preset. The kernel body is dtype-generic (int8 empty sentinel
  -128, int32-upcast reduce — interpret-mode bit-exact, test_ops) and
  elementwise int8 max / int8 scratch stores / int32-upcast reductions
  all compile, but ANY dynamic sublane slice of int8 data crashes the
  Mosaic remote compiler (probed minimal kernels: 8-aligned and
  32-aligned starts both fail identically). roi_pool_auto therefore
  routes integer dtypes to the XLA path; re-probe when the toolchain
  updates.

All VMEM traffic, no gathers; bin arithmetic (integer edges identical to
torchvision, see ops/roi_pool.py:_roi_bin_edges) is precomputed in XLA and
fed through SMEM. Grid = (B, CB, P) with the image block and range table
reused across the P inner steps (grid iterates last axis fastest).

``roi_pool_pallas_ad`` wraps the kernel in a custom VJP (backward through
the XLA formulation) so detection training differentiates through it.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG = -1e30


def _pass2_window(max_bw: int, align: int) -> int:
    """Window length for pass 2's aligned dynamic slice: an
    align-aligned start offset (<= align-1) plus a [ws, ws+max_bw) bin
    must fit. The align=8 (f32/bf16) formula is the measured v3 one,
    kept bit-for-bit; align=32 (int8 sublane tile) takes the minimal
    cover."""
    if align == 8:
        return 2 * ((max_bw + 7) // 8) * 8
    return -(-(align - 1 + max_bw) // align) * align


def _kernel(y1_ref, x1_ref, rh_ref, rw_ref, feat_ref, out_ref, table_ref,
            rowmax_ref, *, out_size: int, max_bh: int, max_bw: int,
            h: int, w: int, lv0: int = 0):
    dtype = feat_ref.dtype
    # int8 path (quantized extraction preset): data is clipped to
    # [-127, 127] (layers.Int8Conv), so iinfo.min = -128 is a free
    # empty-bin sentinel; everything else (range table, max-reductions,
    # aligned slices) is dtype-generic
    integer = jnp.issubdtype(dtype, jnp.integer)
    neg_val = jnp.iinfo(dtype).min if integer else _NEG
    neg = jnp.asarray(neg_val, dtype)
    bi = pl.program_id(0)
    pi = pl.program_id(2)  # grid is (batch, channel-blocks, rois)
    # scalar prefetch carries only 4 ints per RoI (corner + size), flat 1D
    # (SMEM pads the last two dims to (8,128) tiles, and per-bin edge
    # arrays blew the 1 MB SMEM budget inside the full model) — bin edges
    # are recomputed here with the same integer formulas as
    # ops/roi_pool.py:_roi_bin_edges
    ri = bi * pl.num_programs(2) + pi
    y1 = y1_ref[ri]
    x1 = x1_ref[ri]
    rh = rh_ref[ri]
    rw = rw_ref[ri]

    # Build the per-(image, channel-block) row-range-max table ONCE (the
    # RoI axis iterates fastest, so pi==0 marks a fresh (bi, ci) block) and
    # amortize it over all P RoI steps. T[l][y] = max(rows[y : y+l+1]);
    # level l comes from level l-1 plus one shifted level-0 row.
    # ``lv0=1`` drops the table's level 0 (len-1 ranges ARE the feature
    # rows) — used when itemsize doubles the table past the VMEM budget
    # (f32 path); pass 1 then selects between a feature-row read and a
    # table read per bin.
    n_levels = max(max_bh - lv0, 1)

    @pl.when(pi == 0)
    def _build():
        # level li stores window length li + 1 + lv0; recurrence
        # T_L[y] = max(T_{L-1}[y], rows[y + L - 1])
        for li in range(n_levels):
            length = li + 1 + lv0
            if length == 1:
                table_ref[0] = feat_ref[0]
                continue
            n_valid = h - (length - 1)
            prev = feat_ref[0] if (lv0 and li == 0) else table_ref[li - 1]
            table_ref[li, :n_valid] = jnp.maximum(
                prev[:n_valid], feat_ref[0, length - 1:]
            )
            # tail rows are never read (reads satisfy y + len <= h); fill
            # from the previous level for determinism
            table_ref[li, n_valid:] = prev[n_valid:]

    # pass 1: each row bin is ONE unmasked table read + one CONTIGUOUS
    # (w, cb) store into the (out_size, wpad, cb) scratch
    for i in range(out_size):
        hs = jnp.clip((i * rh) // out_size + y1, 0, h)
        he = jnp.clip(((i + 1) * rh + out_size - 1) // out_size + y1, 0, h)
        ln = he - hs
        li = jnp.clip(ln - 1 - lv0, 0, n_levels - 1)
        ys = jnp.clip(hs, 0, h - 1)
        val = table_ref[li, ys]  # (w, cb): max over rows [hs, hs+ln)
        if lv0:
            val = jnp.where(ln <= 1, feat_ref[0, ys], val)
        rowmax_ref[i, :w, :] = jnp.where(ln > 0, val, neg)

    # pass 2: col bins. Dynamic-start slices on the sublane dim must be
    # provably aligned to the dtype's sublane tile (8 for f32/bf16, 32
    # for int8 — an 8-aligned int8 slice crashes the Mosaic compiler), so
    # slice the aligned window containing [ws, ws+max_bw) and mask within
    # it. Cols beyond w-1 read scratch padding — always masked out
    # (we <= w).
    align = 32 if integer else 8
    win = _pass2_window(max_bw, align)
    for j in range(out_size):
        ws = jnp.clip((j * rw) // out_size + x1, 0, w)
        we = jnp.clip(((j + 1) * rw + out_size - 1) // out_size + x1, 0, w)
        # ws == w is possible for an empty right-edge bin; clamp before
        # aligning so x0a + win never reads past the wpad scratch (the
        # masked result is still empty -> 0)
        x0a = pl.multiple_of(
            (jnp.minimum(ws, w - 1) // align) * align, align
        )
        cols = rowmax_ref[:, pl.ds(x0a, win), :]  # (out_size, win, cb)
        cidx = jax.lax.broadcasted_iota(jnp.int32, (1, win, 1), 1) + x0a
        keep = (cidx >= ws) & (cidx < we)
        cols = jnp.where(keep, cols, neg)
        # Mosaic has no int8 REDUCTIONS (elementwise int8 max in the table
        # build is fine) — upcast the registers for the reduce; the
        # traffic win is storage-side (int8 VMEM/HBM), not register-side
        if integer:
            cols = cols.astype(jnp.int32)
        m = jnp.max(cols, axis=1).astype(jnp.float32)  # (out_size, cb)
        # empty bins (hend<=hstart or wend<=wstart) -> 0 like torchvision;
        # compare in f32 (bf16 compares are unsupported on some Mosaic
        # targets)
        empty = m <= (float(neg_val) if integer else _NEG / 2)
        out_ref[0, 0, :, j, :] = jnp.where(empty, 0.0, m).astype(dtype)


@functools.partial(
    jax.jit,
    static_argnames=(
        "output_size", "spatial_scale", "interpret", "channel_block", "_lv0"
    ),
)
def roi_pool_pallas(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 14,
    spatial_scale: float = 1.0 / 16,
    interpret: bool = False,
    channel_block: int = 0,
    _lv0: int | None = None,
) -> jnp.ndarray:
    """Batched exact RoIPool.

    Args:
      features: (B, H, W, C) feature maps (bf16 recommended; one channel
        block of the image plus its range table must fit VMEM).
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

    # channel-block heuristic: the dominant VMEM resident is the range
    # table (max_bh image blocks); keep it under ~6 MB so table +
    # double-buffered image block + rowmax scratch fit 16 MB VMEM
    if channel_block:
        cb = min(channel_block, c)
    else:
        cb = c
        while cb > 128 and (
            max_bh * h * w * cb * features.dtype.itemsize
        ) > 6 * 2**20:
            cb //= 2
    n_cb = -(-c // cb)
    # the lane dim floors cb at 128; if the full table still blows the
    # budget (f32 at parity shape: 5*52*84*128*4 = 11.2 MB), drop level 0
    # — len-1 rows are read straight from the feature block instead
    lv0 = (
        1
        if max_bh > 1
        and (max_bh * h * w * cb * features.dtype.itemsize) > 8 * 2**20
        else 0
    )
    if _lv0 is not None and max_bh > 1:  # test hook: force either path
        lv0 = _lv0
    kernel = functools.partial(
        _kernel, out_size=os_, max_bh=max_bh, max_bw=max_bw, h=h, w=w,
        lv0=lv0,
    )
    align = 32 if jnp.issubdtype(features.dtype, jnp.integer) else 8
    win = _pass2_window(max_bw, align)
    wpad = align * ((w - 1) // align) + win  # covers the widest aligned slice
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
            pltpu.VMEM((max(max_bh - lv0, 1), h, w, cb), features.dtype),
            pltpu.VMEM((os_, wpad, cb), features.dtype),
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
    # integer dtypes stay on the XLA path on TPU: the kernel's int8
    # formulation is correct (interpret-mode parity-tested) but this
    # Mosaic toolchain crashes on ANY dynamic sublane slice of an int8
    # scratch (probed: 8- and 32-aligned starts both HTTP-500 the remote
    # compiler, even in a minimal kernel) — so pooling quantized res4
    # directly, which would halve the kernel's traffic in the int8
    # preset, is measured-blocked, not untried (2026-08 probes)
    if jax.default_backend() == "tpu" and not jnp.issubdtype(
        features_b.dtype, jnp.integer
    ):
        return roi_pool_pallas_ad(features_b, boxes_b, output_size, spatial_scale)
    return _roi_pool_xla(features_b, boxes_b, output_size, spatial_scale)
