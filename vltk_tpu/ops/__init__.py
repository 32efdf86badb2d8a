from vltk_tpu.ops.boxes import (
    apply_deltas,
    box_area,
    box_iou,
    clip_boxes,
    encode_deltas,
    nonempty_mask,
)
from vltk_tpu.ops.matcher import match_quality
from vltk_tpu.ops.nms import batched_nms_fixed, nms_fixed
from vltk_tpu.ops.roi_pool import roi_align, roi_pool
