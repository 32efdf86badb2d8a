"""Adapter-side utilities: padding, masks, label normalization, spans.

Numpy/PIL re-implementations of the reference's utils/adapters.py surface
(pad_tensor:40-62, seg_to_mask:219-224, imagepoints_to_mask:174-192,
resize_binary_mask:234-252, rescale_box:205-216, clean_label:261-282,
soft_score:285-295, get_span_via_jaccard:298-390, truncate_and_pad_list:
393-396, basic_coco_annotations:399-462, map_ocr_predictions:65-127) without
pycocotools/cv2 (not in this environment): polygons rasterize through
PIL.ImageDraw and COCO RLE decodes in numpy.
"""

from __future__ import annotations

import json
import os
import re
from collections import Counter
from typing import Any, Dict, Iterable, List, Mapping, Optional, Sequence, Tuple, Union

import numpy as np
from PIL import Image, ImageDraw

from vltk_tpu import vars as V

# ---------------------------------------------------------------------------
# padding (host-side, numpy)
# ---------------------------------------------------------------------------


def pad_tensor(
    arr: np.ndarray,
    max_len: int,
    value: float = 0.0,
    axis: int = 0,
) -> np.ndarray:
    """Pad (or truncate) ``arr`` along ``axis`` to exactly ``max_len``
    (reference: utils/adapters.py:40-62).

    Unlike the reference this is used at *write/entry* time, not collate
    time, so device batches are always static-shape.
    """
    arr = np.asarray(arr)
    cur = arr.shape[axis]
    if cur == max_len:
        return arr
    if cur > max_len:
        slicer = [slice(None)] * arr.ndim
        slicer[axis] = slice(0, max_len)
        return arr[tuple(slicer)]
    pad_width = [(0, 0)] * arr.ndim
    pad_width[axis] = (0, max_len - cur)
    return np.pad(arr, pad_width, constant_values=value)


def truncate_and_pad_list(lst: Sequence, max_len: int, value: Any = 0) -> List:
    """(reference: utils/adapters.py:393-396)"""
    lst = list(lst)[:max_len]
    return lst + [value] * (max_len - len(lst))


# ---------------------------------------------------------------------------
# segmentation -> mask
# ---------------------------------------------------------------------------


def polygon_to_mask(
    polygons: Sequence[Sequence[float]], height: int, width: int
) -> np.ndarray:
    """Rasterize COCO-style polygons (flat xy lists) into a uint8 binary mask.

    Replaces pycocotools.frPyObjects+decode (reference: utils/adapters.py:
    219-224) with a PIL scanline fill — identical up to boundary-pixel
    rounding, which downstream mask losses are insensitive to.
    """
    from vltk_tpu.native import masks as native_masks

    out = native_masks.polygons_fill(polygons, int(height), int(width))
    if out is not None:
        return out
    img = Image.new("L", (int(width), int(height)), 0)
    draw = ImageDraw.Draw(img)
    for poly in polygons:
        pts = [(float(poly[i]), float(poly[i + 1])) for i in range(0, len(poly) - 1, 2)]
        if len(pts) >= 3:
            draw.polygon(pts, outline=1, fill=1)
    return np.asarray(img, dtype=np.uint8)


# keep the reference's name
def seg_to_mask(segmentation, height: int, width: int) -> np.ndarray:
    """Polygon or RLE segmentation -> (h, w) uint8 mask."""
    if isinstance(segmentation, dict):
        counts = segmentation.get("counts")
        h, w = segmentation.get("size", (height, width))
        if isinstance(counts, list):
            return rle_decode(counts, int(h), int(w))
        raise ValueError("compressed RLE strings are not supported host-side yet")
    return polygon_to_mask(segmentation, height, width)


def rle_decode(counts: Sequence[int], height: int, width: int) -> np.ndarray:
    """Uncompressed COCO RLE (column-major run lengths, starting with 0s)."""
    from vltk_tpu.native import masks as native_masks

    out = native_masks.rle_decode(counts, height, width)
    if out is not None:
        return out
    flat = np.zeros(height * width, dtype=np.uint8)
    pos = 0
    val = 0
    for run in counts:
        # a malformed negative count must not move pos backwards (python
        # negative slicing would silently paint the wrong pixels); treat
        # as a zero-length run, same as the native kernel
        run = max(int(run), 0)
        if val:
            flat[pos : pos + run] = 1
        pos += run
        val ^= 1
    return flat.reshape((width, height)).T  # column-major


def rle_encode(mask: np.ndarray) -> List[int]:
    """Inverse of rle_decode (column-major uncompressed counts)."""
    flat = np.asarray(mask, dtype=np.uint8).T.reshape(-1)
    # run-length encode, first run counts zeros
    changes = np.flatnonzero(np.diff(flat)) + 1
    runs = np.diff(np.concatenate(([0], changes, [flat.size])))
    if flat.size and flat[0] == 1:
        runs = np.concatenate(([0], runs))
    return runs.astype(int).tolist()


def imagepoints_to_mask(points: Sequence[float], size: Tuple[int, int]) -> np.ndarray:
    """CLEVR-ref style flattened-index run pairs -> binary mask
    (reference: utils/adapters.py:174-192)."""
    h, w = int(size[0]), int(size[1])
    from vltk_tpu.native import masks as native_masks

    out = native_masks.points_decode(points, h, w)
    if out is not None:
        return out
    flat = np.zeros(h * w, dtype=np.uint8)
    pts = list(points)
    for i in range(0, len(pts) - 1, 2):
        # clamp malformed pairs like the native kernel: a negative start
        # would python-wrap to the END of the flat mask
        start, run = max(int(pts[i]), 0), int(pts[i + 1])
        if run <= 0:
            continue
        flat[start : start + run] = 1
    return flat.reshape((h, w))


def resize_binary_mask(mask: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    """Nearest-neighbor resize of a binary mask to (h, w)
    (reference: utils/adapters.py:234-252)."""
    h, w = int(size[0]), int(size[1])
    img = Image.fromarray((np.asarray(mask) > 0).astype(np.uint8) * 255)
    img = img.resize((w, h), resample=Image.NEAREST)
    return (np.asarray(img) > 127).astype(np.uint8)


# ---------------------------------------------------------------------------
# boxes
# ---------------------------------------------------------------------------


def normalize_boxes_xyxy(boxes, rawsize_hw) -> np.ndarray:
    """Raw-pixel xyxy boxes -> [0, 1] by each row's raw (h, w) extent —
    the LXMERT position-feature convention. ``boxes`` (N, D, 4),
    ``rawsize_hw`` (N, 2) as (h, w)."""
    hw = np.asarray(rawsize_hw, np.float32)
    wh = np.maximum(hw[:, [1, 0, 1, 0]], 1.0)
    return np.clip(
        np.asarray(boxes, np.float32) / wh[:, None, :], 0.0, 1.0
    )


def rescale_box(boxes: np.ndarray, wh_scale: Sequence[float]) -> np.ndarray:
    """Scale (x, y, w, h) boxes by per-axis (w_scale, h_scale)
    (reference: utils/adapters.py:205-216)."""
    boxes = np.asarray(boxes, dtype=np.float32).copy()
    if boxes.size == 0:
        return boxes
    sw, sh = float(wh_scale[0]), float(wh_scale[1])
    boxes[..., 0] *= sw
    boxes[..., 2] *= sw
    boxes[..., 1] *= sh
    boxes[..., 3] *= sh
    return boxes


def xywh_to_xyxy(boxes: np.ndarray) -> np.ndarray:
    boxes = np.asarray(boxes, dtype=np.float32)
    out = boxes.copy()
    out[..., 2] = boxes[..., 0] + boxes[..., 2]
    out[..., 3] = boxes[..., 1] + boxes[..., 3]
    return out


def xyxy_to_xywh(boxes: np.ndarray) -> np.ndarray:
    boxes = np.asarray(boxes, dtype=np.float32)
    out = boxes.copy()
    out[..., 2] = boxes[..., 2] - boxes[..., 0]
    out[..., 3] = boxes[..., 3] - boxes[..., 1]
    return out


# ---------------------------------------------------------------------------
# VQA answer normalization
# ---------------------------------------------------------------------------

_CONTRACTIONS: Optional[Dict[str, str]] = None
_ANSWER_MAP: Optional[Dict[str, str]] = None
_PUNCT_RE = re.compile(r"[\.\?\!\,\*#:;'\"\(\)\[\]/\\]")
_ARTICLE_RE = re.compile(r"\b(a|an|the)\b")


def _load_label_maps():
    global _CONTRACTIONS, _ANSWER_MAP
    if _CONTRACTIONS is None:
        with open(os.path.join(V.LIBDATA, "contractions.json")) as f:
            _CONTRACTIONS = json.load(f)
        with open(os.path.join(V.LIBDATA, "convert_answers.json")) as f:
            _ANSWER_MAP = json.load(f)
    return _CONTRACTIONS, _ANSWER_MAP


def clean_label(answer: str) -> str:
    """Normalize a VQA-style free-form answer: lowercase, strip punctuation
    and articles, expand contractions, map number words
    (reference: utils/adapters.py:261-282)."""
    contractions, answer_map = _load_label_maps()
    ans = answer.lower().strip()
    ans = _PUNCT_RE.sub("", ans)
    ans = _ARTICLE_RE.sub("", ans)
    words = []
    for w in ans.split():
        w = answer_map.get(w, w)
        w = contractions.get(w, w)
        words.append(w)
    return " ".join(words).strip()


def soft_score(occurrences: int) -> float:
    """VQA-style soft accuracy target from answer count
    (reference: utils/adapters.py:285-295)."""
    if occurrences == 0:
        return 0.0
    if occurrences == 1:
        return 0.3
    if occurrences == 2:
        return 0.6
    if occurrences == 3:
        return 0.9
    return 1.0


# ---------------------------------------------------------------------------
# span matching (DocVQA answers -> OCR token spans)
# ---------------------------------------------------------------------------


def _jaccard(a: str, b: str) -> float:
    sa, sb = set(a), set(b)
    if not sa and not sb:
        return 1.0
    inter = len(sa & sb)
    union = len(sa | sb)
    return inter / union if union else 0.0


def get_span_via_jaccard(
    words: Sequence[str], answer: str, threshold: float = 0.56
) -> Tuple[Optional[Tuple[int, int]], float]:
    """Find the (start, end) word span whose concatenation best matches
    ``answer`` by character-set Jaccard similarity; None below threshold
    (reference: utils/adapters.py:298-390, threshold at adapters/docvqa.py:103).

    Returns ((start, end) inclusive, similarity).
    """
    answer_norm = answer.lower().replace(" ", "")
    n = len(words)
    if n == 0 or not answer_norm:
        return None, 0.0
    ans_words = max(1, len(answer.split()))
    best: Tuple[float, Optional[Tuple[int, int]]] = (0.0, None)
    max_span = min(n, ans_words + 2)
    for start in range(n):
        joined = ""
        for end in range(start, min(n, start + max_span)):
            joined += str(words[end]).lower().replace(" ", "")
            sim = _jaccard(joined, answer_norm)
            # length sanity: heavily mismatched lengths are never spans
            len_ratio = min(len(joined), len(answer_norm)) / max(
                len(joined), len(answer_norm), 1
            )
            sim *= len_ratio ** 0.5
            if sim > best[0]:
                best = (sim, (start, end))
    if best[0] < threshold:
        return None, best[0]
    return best[1], best[0]


# ---------------------------------------------------------------------------
# OCR prediction aggregation
# ---------------------------------------------------------------------------


def map_ocr_predictions(
    predictions: Sequence[int],
    tokenmap: Sequence[int],
    mode: str = "majority",
    ignore_id: int = -100,
) -> List[int]:
    """Aggregate sub-token predictions back to word level using the
    word->n_subtokens map (reference: utils/adapters.py:65-127).

    mode: 'majority' | 'first'. Words with zero sub-tokens (truncated, or
    tokenmap padding value) emit ``ignore_id`` so the output stays aligned
    with the word list; trailing padding entries (ignore_id in the
    tokenmap itself) are dropped.
    """
    out: List[int] = []
    idx = 0
    for n_sub in tokenmap:
        n_sub = int(n_sub)
        if n_sub == ignore_id:
            break  # tokenmap padding — no more words
        if n_sub <= 0:
            out.append(ignore_id)  # keep word alignment
            continue
        chunk = list(predictions[idx : idx + n_sub])
        idx += n_sub
        if not chunk:
            break
        if mode == "first":
            out.append(chunk[0])
        else:
            out.append(Counter(chunk).most_common(1)[0][0])
    return out


# ---------------------------------------------------------------------------
# reusable COCO-style annotation forward
# ---------------------------------------------------------------------------


def basic_coco_annotations(
    json_files: Union[Mapping[str, Dict], Iterable[Tuple[str, Dict]]],
) -> List[Dict[str, Any]]:
    """Shared ETL for COCO-format instance annotations: group per image,
    emit {imgid, boxes, segmentations, labels} entries
    (reference: utils/adapters.py:399-462)."""
    if isinstance(json_files, Mapping):
        json_files = json_files.items()
    entries: Dict[str, Dict[str, Any]] = {}
    for _fname, data in json_files:
        if data is None:
            continue
        categories = {
            c["id"]: c["name"] for c in data.get("categories", [])
        }
        # image ids are the filename stems (COCO_train2014_000000xxxxxx) so
        # they join with VQA's adjusted ids and the image-file glob
        # (reference: adapters/coco2014.py:26-30, utils/adapters.py:425-430)
        id_to_stem = {
            i["id"]: os.path.splitext(i["file_name"])[0]
            for i in data.get("images", [])
            if "file_name" in i
        }
        for ann in data.get("annotations", []):
            imgid = str(id_to_stem.get(ann["image_id"], ann["image_id"]))
            entry = entries.setdefault(
                imgid,
                {V.imgid: imgid, V.boxes: [], V.polygons: [], V.labels: []},
            )
            entry[V.boxes].append([float(x) for x in ann.get("bbox", (0, 0, 0, 0))])
            seg = ann.get("segmentation") or []
            if isinstance(seg, dict):
                seg = []  # RLE instances skipped in the basic path
            entry[V.polygons].append([[float(p) for p in poly] for poly in seg])
            entry[V.labels].append(categories.get(ann.get("category_id"), "unknown"))
    return list(entries.values())


# ---------------------------------------------------------------------------
# observability
# ---------------------------------------------------------------------------


def histogram_from_counter(counter: Counter, top_k: int = 30) -> str:
    """ASCII label-frequency histogram (reference: utils/adapters.py:130-164)."""
    lines = []
    items = counter.most_common(top_k)
    if not items:
        return "(empty)"
    peak = max(v for _, v in items)
    for name, count in items:
        bar = "#" * max(1, int(40 * count / peak))
        lines.append(f"{str(name)[:24]:>24} | {bar} {count}")
    return "\n".join(lines)
