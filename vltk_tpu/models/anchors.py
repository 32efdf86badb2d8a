"""Anchor generation — pure functions, static shapes.

Re-expression of the reference AnchorGenerator (reference:
vltk/modeling/frcnn.py:1406-1510, _create_grid_offsets:176-197). The grid
size is static under jit, so anchors are a trace-time constant XLA folds.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np


def cell_anchors(
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
) -> np.ndarray:
    """(A, 4) xyxy anchors centered at the origin (reference:
    generate_cell_anchors frcnn.py:1479-1497 — size-major, ratio-minor
    ordering; w = sqrt(area/ar), h = ar*w)."""
    out = []
    for size in sizes:
        area = float(size) ** 2
        for ar in aspect_ratios:
            w = math.sqrt(area / ar)
            h = ar * w
            out.append([-w / 2.0, -h / 2.0, w / 2.0, h / 2.0])
    return np.asarray(out, dtype=np.float32)


def grid_anchors(
    feat_hw: Tuple[int, int],
    stride: int = 16,
    sizes: Sequence[float] = (32, 64, 128, 256, 512),
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0),
    offset: float = 0.0,
) -> jnp.ndarray:
    """(H*W*A, 4) anchors for one feature map, ordered (y, x, anchor) —
    matching the reference's ``permute(0, 2, 3, 1)`` flattening
    (reference: grid_anchors frcnn.py:1458-1472)."""
    h, w = feat_hw
    base = cell_anchors(sizes, aspect_ratios)  # (A, 4)
    shifts_x = (np.arange(w, dtype=np.float32) + offset) * stride
    shifts_y = (np.arange(h, dtype=np.float32) + offset) * stride
    sx, sy = np.meshgrid(shifts_x, shifts_y)  # (H, W) each, row-major in y
    shifts = np.stack([sx, sy, sx, sy], axis=-1).reshape(-1, 1, 4)  # (H*W,1,4)
    anchors = (shifts + base[None]).reshape(-1, 4)  # (H*W*A, 4)
    return jnp.asarray(anchors)
