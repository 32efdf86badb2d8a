"""RoI pooling in pure XLA with static shapes.

The reference used torchvision's C++/CUDA ``RoIPool`` (reference:
vltk/modeling/frcnn.py:30, 1179 — RoIPool, *not* RoIAlign). Two exact
formulations are provided:

* :func:`roi_pool` — the fast path: a 2D *sparse table* (sliding-window
  max at power-of-two widths). Clipped RoI bins never span more than
  ``ceil((dim+1)/output)+1`` cells per axis, so every bin max is exactly
  the max of **4 table lookups** (2 per axis, the classic range-max-query
  identity). This replaces a ``max_bin_h*max_bin_w``-iteration gather loop
  (~40 full-output gathers) with 4 gathers + a handful of elementwise max
  streams — ~10x less HBM traffic, which profiling on a v5e chip showed
  was the single dominant cost of the whole FRCNN forward.

* :func:`roi_pool_offsets` — the direct offset-loop formulation (one
  masked-max gather per in-bin offset). Kept as the independently-derived
  parity oracle for tests.

``roi_align`` (bilinear, fixed sampling grid) is also provided for new
models; torchvision-compatible.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _gather_cells(feat: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray) -> jnp.ndarray:
    """feat (H, W, C); iy/ix (...,) int32 -> (..., C)."""
    h, w, _ = feat.shape
    flat = feat.reshape(h * w, -1)
    idx = iy * w + ix
    return flat[idx]


def _roi_bin_edges(boxes, spatial_scale, h, w, output_size):
    """torchvision RoIPool integer bin edges.

    Scale then std::round (half away from zero) the roi corners; width =
    end - start + 1; bin i spans [floor(i*R/P), ceil((i+1)*R/P)) offset by
    the roi corner, clipped to the map.
    Returns (hstart, hend) (P, output) and (wstart, wend) (P, output).
    """
    ph = pw = output_size
    scaled = boxes * spatial_scale
    roi = jnp.where(
        scaled >= 0, jnp.floor(scaled + 0.5), jnp.ceil(scaled - 0.5)
    ).astype(jnp.int32)
    x1, y1, x2, y2 = roi[:, 0], roi[:, 1], roi[:, 2], roi[:, 3]
    roi_w = jnp.maximum(x2 - x1 + 1, 1)
    roi_h = jnp.maximum(y2 - y1 + 1, 1)

    grid = jnp.arange(output_size, dtype=jnp.int32)
    hstart = jnp.clip((grid[None, :] * roi_h[:, None]) // ph + y1[:, None], 0, h)
    hend = jnp.clip(
        ((grid[None, :] + 1) * roi_h[:, None] + ph - 1) // ph + y1[:, None], 0, h
    )
    wstart = jnp.clip((grid[None, :] * roi_w[:, None]) // pw + x1[:, None], 0, w)
    wend = jnp.clip(
        ((grid[None, :] + 1) * roi_w[:, None] + pw - 1) // pw + x1[:, None], 0, w
    )
    return hstart, hend, wstart, wend


def _shift_max(x: jnp.ndarray, shift: int, axis: int) -> jnp.ndarray:
    """max(x[i], x[min(i+shift, n-1)]) along ``axis`` — one doubling step
    of the sliding-window-max table (edge-clamped, so entry i holds the
    max over x[i : min(i+2*shift, n)]). Built from static slices (a
    ``jnp.take`` here lowers to a real gather on TPU — 15x slower)."""
    n = x.shape[axis]
    shift = min(shift, n - 1)
    head = jax.lax.slice_in_dim(x, shift, n, axis=axis)
    tail = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    tail = jnp.concatenate([tail] * shift, axis=axis) if shift > 1 else tail
    return jnp.maximum(x, jnp.concatenate([head, tail], axis=axis))


def roi_pool(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 14,
    spatial_scale: float = 1.0 / 16,
) -> jnp.ndarray:
    """Exact torchvision RoIPool via 2D range-max sparse tables.

    Args:
      features: (H, W, C) one image's feature map (vmap over batch outside).
      boxes: (P, 4) xyxy in *input-image* coordinates.
      output_size: pooled grid side (14 for the C4 heads).
      spatial_scale: feature stride reciprocal (1/16 for res4).

    Returns (P, output_size, output_size, C). Empty bins yield 0.
    """
    h, w, c = features.shape
    p = boxes.shape[0]
    ph = pw = output_size
    hstart, hend, wstart, wend = _roi_bin_edges(boxes, spatial_scale, h, w, ph)

    # static bin-extent bounds (same bound the offset loop uses)
    max_bin_h = min(math.ceil((h + 1) / ph) + 1, h)
    max_bin_w = min(math.ceil((w + 1) / pw) + 1, w)
    kh_levels = int(math.floor(math.log2(max_bin_h))) + 1
    kw_levels = int(math.floor(math.log2(max_bin_w))) + 1

    # tables[kh*Kw + kw][y, x] = max over features[y:y+2^kh, x:x+2^kw]
    w_tables = [features]
    for k in range(1, kw_levels):
        w_tables.append(_shift_max(w_tables[-1], 1 << (k - 1), axis=1))
    tables = []
    for wt in w_tables:
        col = wt
        tables.append(col)
        for k in range(1, kh_levels):
            col = _shift_max(col, 1 << (k - 1), axis=0)
            tables.append(col)
    # layout: index = kw * kh_levels + kh
    stacked = jnp.stack(tables)  # (Kw*Kh, H, W, C)
    flat = stacked.reshape(kw_levels * kh_levels * h * w, c)

    # per-bin levels: k = floor(log2(len))
    log2_lut = jnp.asarray(
        [0] + [int(math.floor(math.log2(l))) for l in range(1, max(h, w) + 2)],
        jnp.int32,
    )
    lh = hend - hstart  # (P, ph)
    lw = wend - wstart  # (P, pw)
    kh = log2_lut[jnp.clip(lh, 1, max_bin_h)]  # (P, ph)
    kw = log2_lut[jnp.clip(lw, 1, max_bin_w)]  # (P, pw)

    ys0 = hstart
    ys1 = jnp.maximum(hend - (1 << kh), 0)
    xs0 = wstart
    xs1 = jnp.maximum(wend - (1 << kw), 0)

    level = kw[:, None, :] * kh_levels + kh[:, :, None]  # (P, ph, pw)
    base = level * (h * w)

    def take(y, x):
        # y: (P, ph) broadcast over j; x: (P, pw) broadcast over i
        idx = base + y[:, :, None] * w + x[:, None, :]
        return flat[idx]  # (P, ph, pw, C)

    out = jnp.maximum(
        jnp.maximum(take(ys0, xs0), take(ys0, xs1)),
        jnp.maximum(take(ys1, xs0), take(ys1, xs1)),
    )

    empty = (lh <= 0)[:, :, None] | (lw <= 0)[:, None, :]
    return jnp.where(empty[..., None], jnp.zeros((), features.dtype), out)


def roi_pool_offsets(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 14,
    spatial_scale: float = 1.0 / 16,
) -> jnp.ndarray:
    """Exact torchvision RoIPool — direct offset-loop formulation (one
    masked-max gather per possible in-bin offset). Parity oracle for
    :func:`roi_pool`; O(max_bin_h*max_bin_w) full-output gathers."""
    h, w, c = features.shape
    p = boxes.shape[0]
    ph = pw = output_size
    hstart, hend, wstart, wend = _roi_bin_edges(boxes, spatial_scale, h, w, ph)

    max_bin_h = math.ceil((h + 1) / ph) + 1
    max_bin_w = math.ceil((w + 1) / pw) + 1

    def body(k, acc):
        i = k // max_bin_w
        j = k % max_bin_w
        iy = jnp.clip(hstart + i, 0, h - 1)  # (P, ph)
        ix = jnp.clip(wstart + j, 0, w - 1)  # (P, pw)
        in_y = (hstart + i) < hend  # (P, ph)
        in_x = (wstart + j) < wend  # (P, pw)
        vals = _gather_cells(
            features,
            jnp.broadcast_to(iy[:, :, None], (p, ph, pw)),
            jnp.broadcast_to(ix[:, None, :], (p, ph, pw)),
        )  # (P, ph, pw, C)
        mask = (in_y[:, :, None] & in_x[:, None, :])[..., None]
        return jnp.maximum(acc, jnp.where(mask, vals, NEG_INF))

    acc0 = jnp.full((p, ph, pw, c), NEG_INF, features.dtype)
    acc = jax.lax.fori_loop(0, max_bin_h * max_bin_w, body, acc0)
    # empty bins (after clamping) -> 0, matching torchvision
    return jnp.where(acc <= NEG_INF / 2, 0.0, acc)


def roi_align(
    features: jnp.ndarray,
    boxes: jnp.ndarray,
    output_size: int = 14,
    spatial_scale: float = 1.0 / 16,
    sampling_ratio: int = 2,
    aligned: bool = False,
) -> jnp.ndarray:
    """torchvision-style RoIAlign (average of bilinear samples).

    features: (H, W, C); boxes: (P, 4) xyxy input-image coords.
    Returns (P, output_size, output_size, C).
    """
    h, w, c = features.shape
    p = boxes.shape[0]
    os = output_size
    offset = 0.5 if aligned else 0.0
    scaled = boxes * spatial_scale - offset
    x1, y1 = scaled[:, 0], scaled[:, 1]
    roi_w = scaled[:, 2] - x1
    roi_h = scaled[:, 3] - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / os
    bin_h = roi_h / os
    grid = jnp.arange(os, dtype=jnp.float32)

    def sample(k, acc):
        sy = k // sampling_ratio
        sx = k % sampling_ratio
        # (P, os): sample point per bin
        py = y1[:, None] + (grid[None, :] + (sy + 0.5) / sampling_ratio) * bin_h[:, None]
        px = x1[:, None] + (grid[None, :] + (sx + 0.5) / sampling_ratio) * bin_w[:, None]
        py = jnp.clip(py, 0.0, h - 1.0)
        px = jnp.clip(px, 0.0, w - 1.0)
        y0 = jnp.floor(py).astype(jnp.int32)
        x0 = jnp.floor(px).astype(jnp.int32)
        y1i = jnp.minimum(y0 + 1, h - 1)
        x1i = jnp.minimum(x0 + 1, w - 1)
        wy = (py - y0.astype(jnp.float32))[:, :, None]  # (P, os, 1)
        wx = (px - x0.astype(jnp.float32))[:, None, :]  # (P, 1, os)

        def g(iy, ix):
            return _gather_cells(
                features,
                jnp.broadcast_to(iy[:, :, None], (p, os, os)),
                jnp.broadcast_to(ix[:, None, :], (p, os, os)),
            ).astype(jnp.float32)

        v00 = g(y0, x0)
        v01 = g(y0, x1i)
        v10 = g(y1i, x0)
        v11 = g(y1i, x1i)
        wy_ = wy[..., None]
        wx_ = wx[..., None]
        val = (
            v00 * (1 - wy_) * (1 - wx_)
            + v01 * (1 - wy_) * wx_
            + v10 * wy_ * (1 - wx_)
            + v11 * wy_ * wx_
        )
        return acc + val

    acc0 = jnp.zeros((p, os, os, c), jnp.float32)
    acc = jax.lax.fori_loop(0, sampling_ratio * sampling_ratio, sample, acc0)
    return (acc / (sampling_ratio * sampling_ratio)).astype(features.dtype)
