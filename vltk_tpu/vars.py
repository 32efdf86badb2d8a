"""Canonical vocabulary of the framework.

Every column/feature that flows between adapters, processors, loaders and
models is referred to by a constant defined here, never by an inline string.
This mirrors the reference's key registry (reference: vltk/vars.py:29-61) so
that a user of the reference finds the same names, but the module is
re-organized around the TPU data plane: keys are grouped by modality and a
``FIXED_SHAPE_KEYS`` table declares which columns must be padded to static
shapes *at write time* so device feeding never sees ragged data.

Box convention: all boxes at the data layer are ``(x, y, w, h)`` in absolute
pixel coordinates (reference: vltk/vars.py:3-5). Models that need ``xyxy``
convert explicitly via a processor.
"""

from __future__ import annotations

import os

# ---------------------------------------------------------------------------
# paths
# ---------------------------------------------------------------------------
BASEPATH = os.path.abspath(os.path.dirname(__file__))
LIBDATA = os.path.join(BASEPATH, "libdata")
VOCABPATH = os.path.join(LIBDATA, "vocab.txt")
OBJECTSPATH = os.path.join(LIBDATA, "objects.txt")
ATTRIBUTESPATH = os.path.join(LIBDATA, "attributes.txt")
ANNOTATION_DIR = "annotations"

# special delimiter used when joining composite ids
delim = "^"

# ---------------------------------------------------------------------------
# common keys (shared vocabulary across the library)
# ---------------------------------------------------------------------------
# ids & bookkeeping
imgid = "imgid"
qid = "qid"
split = "split"
filepath = "filepath"

# language modality
text = "text"
input_ids = "input_ids"
type_ids = "type_ids"
text_attention_mask = "text_attention_mask"
span = "span"
tokenmap = "tokenmap"
tokenlabels = "tokenlabels"

# vision modality
img = "image"
size = "size"
rawsize = "rawsize"
padsize = "padsize"
scale = "wh_scale"
boxes = "boxes"
box = "box"  # legacy singular
boxtensor = "boxtensor"
tokenbox = "tokenbox"
tokenboxes = "tokenboxes"
polygons = "poly"
RLE = "RLE"
segmentations = "segmentations"
segmentation = "segmentation"  # legacy
area = "area"
features = "features"
n_objects = "n_objects"
objects = "objects"

# supervision
labels = "labels"
label = "label"
scores = "scores"
score = "score"

# model-side validity masks (new in the TPU build: every fixed-shape padded
# tensor travels with a mask so downstream kernels can ignore padding)
boxes_mask = "boxes_mask"
visual_attention_mask = "visual_attention_mask"

SPLITALIASES = {
    "test",
    "dev",
    "eval",
    "val",
    "validation",
    "evaluation",
    "train",
}

# When a vision dataset and a vision-language dataset are joined by image id,
# these text-side keys collide; the vision copy is renamed with a "v" prefix
# (reference: vltk/vars.py:74-80).
VLOVERLAP = {
    text: "vtext",
    labels: "vlabels",
    label: "vlabel",
    scores: "vscores",
    score: "vscore",
}

# dataset-kind enums (reference: vltk/vars.py:84-86)
VLDATA = 0
VDATA = 1
LDATA = 2

SUPPORTEDNAMES = {
    type_ids,
    input_ids,
    text_attention_mask,
    rawsize,
    size,
    segmentation,
    box,
    imgid,
    label,
    text,
    score,
    img,
    filepath,
    features,
    split,
    scale,
    boxtensor,
    area,
}

# ---------------------------------------------------------------------------
# TPU data-plane policy
# ---------------------------------------------------------------------------
# Columns that must be fixed-shape by the time they reach a device batch.
# Maps key -> (pad_axis, default_capacity). Adapters may override capacity in
# their schema; the loader pads/truncates to these capacities so every batch
# of every dataset compiles to the same XLA program.
FIXED_SHAPE_KEYS = {
    input_ids: (0, 128),
    type_ids: (0, 128),
    text_attention_mask: (0, 128),
    boxes: (0, 36),
    features: (0, 36),
    tokenboxes: (0, 128),
    tokenlabels: (0, 128),
    labels: (0, 16),
    scores: (0, 16),
    segmentations: (0, 16),
    visual_attention_mask: (0, 128),
}
