"""Detection visualization (reference: ``SingleImageViz`` used by
tests/frcnn_test.py:35-64 for eyeball checks — stale import upstream).

Host-side PIL drawing; no matplotlib dependency.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
from PIL import Image, ImageDraw

_PALETTE = [
    (220, 38, 38), (16, 185, 129), (59, 130, 246), (245, 158, 11),
    (139, 92, 246), (236, 72, 153), (20, 184, 166), (234, 88, 12),
]


def draw_boxes(
    image,
    boxes: np.ndarray,
    labels: Optional[Sequence[str]] = None,
    scores: Optional[Sequence[float]] = None,
    mask: Optional[np.ndarray] = None,
    width: int = 2,
) -> Image.Image:
    """Draw xyxy boxes (+labels/scores) on an image.

    ``image``: PIL image, (H, W, 3) uint8/float array, or a path.
    ``mask``: optional validity mask — padded detections are skipped
    (the fixed-shape FRCNN output dict's ``mask`` key).
    """
    if isinstance(image, str):
        img = Image.open(image).convert("RGB")
    elif isinstance(image, Image.Image):
        img = image.convert("RGB")
    else:
        arr = np.asarray(image)
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        img = Image.fromarray(arr)
    draw = ImageDraw.Draw(img)
    boxes = np.asarray(boxes, np.float32).reshape(-1, 4)
    for i, box in enumerate(boxes):
        if mask is not None and not bool(np.asarray(mask).reshape(-1)[i]):
            continue
        color = _PALETTE[i % len(_PALETTE)]
        x1, y1, x2, y2 = [float(v) for v in box]
        draw.rectangle([x1, y1, x2, y2], outline=color, width=width)
        text = ""
        if labels is not None and i < len(labels):
            text = str(labels[i])
        if scores is not None and i < len(scores):
            text = f"{text} {float(scores[i]):.2f}".strip()
        if text:
            draw.text((x1 + 2, max(y1 - 11, 0)), text, fill=color)
    return img


def save_detections(
    path: str,
    image,
    detections: dict,
    id_to_name: Optional[Sequence[str]] = None,
) -> str:
    """Render one image's entries from the FRCNN output dict
    (boxes/obj_ids/obj_probs/mask) and save to ``path``."""
    labels = None
    if id_to_name is not None:
        labels = [
            id_to_name[int(i)] if 0 <= int(i) < len(id_to_name) else "?"
            for i in np.asarray(detections["obj_ids"]).reshape(-1)
        ]
    img = draw_boxes(
        image,
        np.asarray(detections["boxes"]),
        labels=labels,
        scores=np.asarray(detections.get("obj_probs")).reshape(-1)
        if "obj_probs" in detections
        else None,
        mask=detections.get("mask"),
    )
    img.save(path)
    return path
