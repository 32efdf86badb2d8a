"""Host-side image transforms.

Numpy/PIL re-implementation of the reference's torchvision-wrapper pipeline
(reference: vltk/processing/image.py:52-185 and the *actual* FRCNN pipeline
legacy/processing.py:29-150): file load, shortest-edge resize with max-side
clamp, caffe-style BGR mean normalization, and pad-to-canvas — each
recording the side-channel state (``rawsize``/``size``/``wh_scale``/
``padsize``) downstream consumers need.

TPU-driven difference: ``Pad`` pads to a *fixed* canvas so that every image
in a run has the same shape — one XLA program serves the whole extraction
(the reference padded per-batch to the batch max, reference:
legacy/processing.py:76-150). The resize itself can also run on-device,
fused with normalize/pad (see vltk_tpu/ops/image_ops.py); the host path here
is the fallback and the data-loading reference implementation.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np
from PIL import Image

from vltk_tpu import vars as V

# ---------------------------------------------------------------------------
# side-channel accessors (reference: processing/image.py:12-49)
# ---------------------------------------------------------------------------


def get_size(entry: Dict[str, Any]) -> Tuple[int, int]:
    return tuple(entry[V.size])


def get_rawsize(entry: Dict[str, Any]) -> Tuple[int, int]:
    return tuple(entry[V.rawsize])


def get_scale(entry: Dict[str, Any]) -> Tuple[float, float]:
    return tuple(entry[V.scale])


def get_pad(entry: Dict[str, Any]) -> Tuple[int, int]:
    return tuple(entry[V.padsize])


# ---------------------------------------------------------------------------
# transforms
# ---------------------------------------------------------------------------


class FromFile:
    """filepath -> HWC array (RGB, or single-channel replicated)
    (reference: processing/image.py:52-73).

    ``decode_dtype="float32"`` (default) matches the reference's tensor
    pipeline. ``"uint8"`` keeps the decoded bytes as-is — the right choice
    for decode-only pipelines feeding a device-fused preprocess
    (``VisionConfig(device_fused=True)``): the fixed-shape collate ships
    uint8 to the device anyway, and skipping the float32 round-trip
    (decode->f32->rint->clip->u8, three extra passes over ~1.2 MB/image)
    measures ~1.6x on host feed throughput (BASELINE.md host rows)."""

    def __init__(self, gray: bool = False, decode_dtype: str = "float32"):
        self.gray = gray
        self.dtype = (
            np.uint8 if str(decode_dtype) == "uint8" else np.float32
        )

    def __call__(self, entry):
        if isinstance(entry, str):
            entry = {V.filepath: entry}
        path = entry[V.filepath]
        img = Image.open(path)
        img = img.convert("L" if self.gray else "RGB")
        arr = np.asarray(img, dtype=self.dtype)
        if arr.ndim == 2:
            arr = np.stack([arr] * 3, axis=-1)
        entry[V.img] = arr
        entry[V.rawsize] = (arr.shape[0], arr.shape[1])
        return entry


class ToTensor:
    """No-op dtype guard kept for pipeline-name parity
    (reference: processing/image.py:76-79)."""

    def __call__(self, entry):
        entry[V.img] = np.asarray(entry[V.img], dtype=np.float32)
        return entry


def shortest_edge_size(
    raw_h: int, raw_w: int, short: int, maximum: int
) -> Tuple[int, int]:
    """Target (h, w) for shortest-edge resize with max-side clamp
    (reference: legacy/processing.py:29-73)."""
    scale = short / min(raw_h, raw_w)
    if max(raw_h, raw_w) * scale > maximum:
        scale = maximum / max(raw_h, raw_w)
    new_h = int(raw_h * scale + 0.5)
    new_w = int(raw_w * scale + 0.5)
    return new_h, new_w


class ResizeTensor:
    """Shortest-edge resize recording rawsize/size/wh_scale
    (reference: processing/image.py:123-145)."""

    def __init__(self, size: Sequence[int] = (800, 1333), mode: str = "bilinear"):
        self.short = int(size[0])
        self.maximum = int(size[1]) if len(size) > 1 else int(size[0])
        self.mode = mode

    def __call__(self, entry):
        arr = entry[V.img]
        raw_h, raw_w = arr.shape[0], arr.shape[1]
        new_h, new_w = shortest_edge_size(raw_h, raw_w, self.short, self.maximum)
        if (new_h, new_w) != (raw_h, raw_w):
            resample = Image.BILINEAR if self.mode == "bilinear" else Image.NEAREST
            if arr.dtype == np.uint8 or (
                arr.dtype == np.float32 and arr.min() >= 0 and arr.max() <= 255
            ):
                # integral pixel range: one 3-channel uint8 resize
                resized = np.asarray(
                    Image.fromarray(arr.astype(np.uint8)).resize(
                        (new_w, new_h), resample=resample
                    ),
                    dtype=np.float32,
                )
            else:
                # arbitrary float values (e.g. already caffe-normalized,
                # negatives present): per-channel mode-"F" resize — a uint8
                # cast would wrap negatives mod 256 into garbage
                resized = np.stack(
                    [
                        np.asarray(
                            Image.fromarray(
                                arr[..., c].astype(np.float32), mode="F"
                            ).resize((new_w, new_h), resample=resample)
                        )
                        for c in range(arr.shape[-1])
                    ],
                    axis=-1,
                ).astype(np.float32)
            arr = resized
        entry[V.img] = arr
        entry[V.rawsize] = (raw_h, raw_w)
        entry[V.size] = (new_h, new_w)
        # (w_scale, h_scale): multiply raw coords by this to land in resized
        entry[V.scale] = (new_w / raw_w, new_h / raw_h)
        return entry


# registry-name alias (the reference exposed a plain "Resize" too)
Resize = ResizeTensor


class Normalize:
    """Channel mean/std normalization with optional RGB->BGR swap
    (caffe-style FRCNN input; reference: processing/image.py:82-99,
    adapters/frcnn.py:13-23)."""

    def __init__(
        self,
        mean: Sequence[float] = (102.9801, 115.9465, 122.7717),
        sdev: Sequence[float] = (1.0, 1.0, 1.0),
        bgr: bool = True,
    ):
        self.mean = np.asarray(mean, dtype=np.float32)
        self.sdev = np.asarray(sdev, dtype=np.float32)
        self.bgr = bgr

    def __call__(self, entry):
        arr = entry[V.img]
        if self.bgr:
            arr = arr[..., ::-1]
        entry[V.img] = (arr - self.mean) / self.sdev
        return entry


class Pad:
    """Pad to a fixed canvas, bottom/right, recording padsize
    (reference: processing/image.py:148-158 — but fixed-canvas here)."""

    def __init__(self, canvas: Optional[Sequence[int]] = None, pad_value: float = 0.0):
        self.canvas = tuple(canvas) if canvas else None
        self.pad_value = float(pad_value)

    def __call__(self, entry):
        if self.canvas is None:
            return entry
        arr = entry[V.img]
        ch, cw = self.canvas
        h, w = arr.shape[0], arr.shape[1]
        if h > ch or w > cw:
            raise ValueError(
                f"image ({h},{w}) exceeds canvas {self.canvas}; resize first"
            )
        out = np.full((ch, cw, arr.shape[-1]), self.pad_value, dtype=np.float32)
        out[:h, :w] = arr
        entry[V.img] = out
        entry[V.padsize] = (ch, cw)
        return entry


class GrayScale:
    def __call__(self, entry):
        arr = entry[V.img]
        gray = arr.mean(axis=-1, keepdims=True)
        entry[V.img] = np.repeat(gray, 3, axis=-1)
        return entry


class RandFeats:
    """Replace image content with random features — lets the full pipeline
    run with no image files (reference: configs.py:164,
    dataset/visndataset.py:168-171)."""

    def __init__(self, shape: Sequence[int], seed: int = 0):
        self.shape = tuple(int(s) for s in shape)
        self.rng = np.random.default_rng(seed)

    def __call__(self, entry):
        if isinstance(entry, str):
            entry = {V.filepath: entry}
        entry[V.img] = self.rng.random(self.shape, dtype=np.float32)
        entry[V.rawsize] = self.shape[:2]
        entry[V.size] = self.shape[:2]
        entry[V.scale] = (1.0, 1.0)
        return entry


def canvas_for(size: Sequence[int], multiple: int = 32) -> Tuple[int, int]:
    """Fixed canvas covering any shortest-edge-resized image: the max side,
    rounded up to an XLA-friendly multiple."""
    longest = max(int(s) for s in size)

    def round_up(x):
        return int(math.ceil(x / multiple) * multiple)

    return (round_up(longest), round_up(longest))
