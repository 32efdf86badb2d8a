"""Device-side fused image preprocessing — one XLA program per batch.

The reference preprocessed on host, per image: PIL shortest-edge resize,
BGR caffe-mean normalize, pad-to-batch-max (reference:
vltk/legacy/processing.py:29-150 ``Preprocess``/``ResizeShortestEdge``,
vltk/adapters/frcnn.py:13-23). On TPU that work moves on-device and fuses:

  host:   decode jpeg -> raw uint8/float HWC, pad to a static raw canvas
  device: resize(shortest-edge, traced per-image scale) + BGR swap +
          mean/std normalize + zero-pad — a single jitted function over the
          whole batch, HBM-bandwidth bound.

``jax.image.scale_and_translate`` does the resize with *traced* scales onto
a *static* output canvas (the per-image target size is data, not shape), so
one compiled program serves every image size in the run — the key
shape-stability inversion called out in SURVEY.md §3.2.
"""

from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

# caffe BGR pixel means of the VG FRCNN (reference: adapters/frcnn.py:20-22)
CAFFE_BGR_MEAN = (102.9801, 115.9465, 122.7717)


def shortest_edge_scale(
    raw_hw: jnp.ndarray, short: float, maximum: float
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-image resize scale and target (h, w) — traced-value version of
    the host helper (vltk_tpu/processing/image.py:shortest_edge_size;
    reference: legacy/processing.py:29-73)."""
    rh = raw_hw[..., 0].astype(jnp.float32)
    rw = raw_hw[..., 1].astype(jnp.float32)
    scale = short / jnp.minimum(rh, rw)
    over = jnp.maximum(rh, rw) * scale > maximum
    scale = jnp.where(over, maximum / jnp.maximum(rh, rw), scale)
    new_h = jnp.floor(rh * scale + 0.5)
    new_w = jnp.floor(rw * scale + 0.5)
    return scale, jnp.stack([new_h, new_w], axis=-1)


@functools.partial(
    jax.jit,
    static_argnames=("canvas_hw", "short", "maximum", "mean", "std", "bgr"),
)
def preprocess_batch(
    images: jnp.ndarray,
    raw_sizes: jnp.ndarray,
    canvas_hw: Tuple[int, int] = (1344, 1344),
    short: float = 800.0,
    maximum: float = 1333.0,
    mean: Sequence[float] = CAFFE_BGR_MEAN,
    std: Sequence[float] = (1.0, 1.0, 1.0),
    bgr: bool = True,
):
    """Fused resize + normalize + pad for a fixed-shape batch.

    Args:
      images: (N, Hr, Wr, 3) raw RGB pixels (uint8 or float32), each image
        occupying the top-left (raw_h, raw_w) corner of the host canvas.
      raw_sizes: (N, 2) int/float raw (h, w) per image.
      canvas_hw: static output canvas; must cover (short, maximum) targets.

    Returns dict:
      img: (N, ch, cw, 3) float32, BGR caffe-normalized, zero beyond content.
      sizes: (N, 2) float32 resized content (h, w) — FRCNN ``image_sizes``.
      scales_yx: (N, 2) float32 raw/resized ratio — multiplies boxes back to
        raw coordinates (reference: ROIOutputs frcnn.py:1280-1283).
    """
    ch, cw = canvas_hw
    images = images.astype(jnp.float32)
    _, new_hw = shortest_edge_scale(raw_sizes, float(short), float(maximum))

    mean_arr = jnp.asarray(mean, jnp.float32)
    std_arr = jnp.asarray(std, jnp.float32)

    def one(img, raw_hw, new_hw_i):
        rh = raw_hw[0].astype(jnp.float32)
        rw = raw_hw[1].astype(jnp.float32)
        # edge-replicate the content into the host pad region (clamped row/
        # col gather): the linear resize kernel samples one texel past the
        # content edge, and blending the zero pad there darkens the last
        # row/column of every upscaled image (PIL/torch clamp at the edge)
        hr, wr = img.shape[0], img.shape[1]
        row_idx = jnp.minimum(
            jnp.arange(hr), raw_hw[0].astype(jnp.int32) - 1
        )
        col_idx = jnp.minimum(
            jnp.arange(wr), raw_hw[1].astype(jnp.int32) - 1
        )
        img = img[row_idx][:, col_idx]
        sy = new_hw_i[0] / rh
        sx = new_hw_i[1] / rw
        resized = jax.image.scale_and_translate(
            img,
            shape=(ch, cw, 3),
            spatial_dims=(0, 1),
            scale=jnp.stack([sy, sx]),
            translation=jnp.zeros((2,), jnp.float32),
            method="linear",
            antialias=False,
        )
        if bgr:
            resized = resized[..., ::-1]
        out = (resized - mean_arr) / std_arr
        # zero outside the resized content (the reference pads zeros AFTER
        # normalize, legacy/processing.py:120-138)
        rows = jax.lax.broadcasted_iota(jnp.float32, (ch, cw), 0)
        cols = jax.lax.broadcasted_iota(jnp.float32, (ch, cw), 1)
        inside = (rows < new_hw_i[0]) & (cols < new_hw_i[1])
        return jnp.where(inside[..., None], out, 0.0)

    out = jax.vmap(one)(images, raw_sizes, new_hw)
    scales_yx = raw_sizes.astype(jnp.float32) / new_hw
    return {"img": out, "sizes": new_hw, "scales_yx": scales_yx}
