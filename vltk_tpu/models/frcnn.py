"""Faster R-CNN (ResNet-C4 + VG attribute head) — TPU-native, fixed shapes.

Re-design of the reference FRCNN (reference: vltk/modeling/frcnn.py:
1743-2004) around XLA's compilation model: one trace, static shapes, no
data-dependent control flow.

The reference's per-image, data-dependent pieces map to:

  reference (torch)                      here (JAX)
  -------------------------------------  --------------------------------
  ragged proposals per image             (N, P, 4) + validity mask
  retry-NMS over a threshold list with   all thresholds evaluated in one
  a Python ``break`` (do_nms 116-143,    batched pass; first threshold
  ROIOutputs.inference 1263-1294)        reaching >= min_detections keeps
                                         is selected with ``argmax`` over
                                         the static list
  per-image box-rescale loop             batched multiply by scales_yx

Default hyper-parameters are the ``unc-nlp/frcnn-vg-finetuned`` ones
(ResNet-101-C4, 1600 classes + 400 attributes, RPN hidden 512, res5
dilation trick); every knob is overridable through :class:`FRCNNConfig`.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from vltk_tpu.models.anchors import grid_anchors
from vltk_tpu.models.backbone import ResNetC4
from vltk_tpu.models.roi_heads import Res5RoIHeads
from vltk_tpu.models.rpn import RPNHead, propose
from vltk_tpu.ops.boxes import apply_deltas, clip_boxes
from vltk_tpu.ops.nms import nms_fixed


@dataclasses.dataclass(frozen=True)
class FRCNNConfig:
    """Static model hyper-parameters (trace-time constants).

    Defaults reproduce the VG extraction setup the reference tests pin
    (reference: tests/frcnn_test.py:16-19 — nms list [0.5, 1.0, 0.1],
    min=max=36 detections; adapters/frcnn.py:34-41 — 36 boxes, 2048-d).
    """

    # backbone (reference: build_backbone frcnn.py:200-261)
    depth: int = 101
    stem_out_channels: int = 64
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    caffe_maxpool: bool = True
    feature_stride: int = 16
    # anchors / RPN (reference: frcnn.py:1406-1510, 1513-1673)
    anchor_sizes: Sequence[float] = (32, 64, 128, 256, 512)
    aspect_ratios: Sequence[float] = (0.5, 1.0, 2.0)
    anchor_offset: float = 0.0
    rpn_hidden_channels: int = 512
    rpn_nms_thresh: float = 0.7
    pre_nms_topk: int = 6000
    post_nms_topk: int = 1000
    min_box_side_len: float = 0.0
    rpn_bbox_reg_weights: Sequence[float] = (1.0, 1.0, 1.0, 1.0)
    # exact-NMS execution strategy (identical keep-set every way; see
    # tools/probe_propose.py + tests/test_ops.py/test_models.py parity
    # tests): rpn_nms_block > 0 runs blocked greedy with that block size,
    # otherwise the selection scan with rpn_nms_unroll-way unrolling.
    # rpn_nms_chunk > 0 additionally runs the per-image NMS vmap as
    # lax.map over batch chunks of that width (padding non-multiple
    # batches with inert lanes) — identical keep-set, different program
    # shape. The r5 story (tools/probe_propose.py + BASELINE.md): the
    # 300-iteration scan is loop-overhead-bound (12.0 ms at B=16;
    # unroll=4 -> 4.27 ms, headline 57.59 -> 59.40); blocked m=64 is
    # 5.6x (2.15 ms) but the 32-wide vmapped while_loop kernel-faulted
    # the TPU worker (3/3) while the 16-wide program runs clean — so the
    # default is blocked-64 CHUNKED to 16-wide map steps, which ran the
    # full B=32 headline clean 3/3 at 60.0 img/s (+1.0% over unroll-4).
    # Off-TPU, propose() routes nms_block to the unrolled scan (same
    # keep-set; see the gate comment in rpn.py — XLA:CPU 0.9.0 compiles
    # of these while_loop programs intermittently segfault long-lived
    # processes), so one config runs everywhere, like attention "auto".
    # Blocked greedy uses lax.while_loop, which reverse-mode AD cannot
    # transpose — but detection training still differentiates fine:
    # propose's outputs reach the loss only through integer bin edges
    # (RoIPool) and stop_gradient (detection_loss.py), so the loop is
    # never transposed (pinned by tests/test_detection_train.py, which
    # runs value_and_grad over the full model at these defaults).
    rpn_nms_block: int = 64
    rpn_nms_unroll: int = 4
    rpn_nms_chunk: int = 16
    # RoI heads (reference: frcnn.py:1305-1403, 1676-1740)
    num_classes: int = 1600
    num_attrs: int = 400
    pooler_resolution: int = 14
    res5_halve: bool = False
    use_attr: bool = True
    cls_agnostic_bbox_reg: bool = False
    box_reg_weights: Sequence[float] = (10.0, 10.0, 5.0, 5.0)
    # detection selection (reference: ROIOutputs frcnn.py:1227-1302)
    nms_thresh_list: Sequence[float] = (0.5, 1.0, 0.1)
    min_detections: int = 36
    max_detections: int = 36
    # compute dtype for convs/matmuls (None -> float32); params stay f32
    dtype: Optional[str] = None
    # int8 MXU path for every bottleneck conv (backbone res2-4 + res5):
    # v5e runs int8 matmuls at ~2x the bf16 rate (tools/probe_int8.py).
    # Post-training dynamic quantization — per-output-channel weight
    # scales, per-tensor activation scales, int32 accumulation
    # (layers.Int8Conv); params stay f32 so checkpoints are untouched.
    # Inference-only (round has zero gradient); accuracy cost is measured
    # by bench.py --preset-drift, so like fast_extraction this is an
    # opt-in preset, never the parity default.
    int8: bool = False
    # res5 RoI chunking: pool+res5 run as a scan over blocks of this many
    # RoIs (roi_heads.PoolRes5Scan), bounding the pooled+res5 HBM working
    # set. Measured a throughput WIN at every batch size, not just a
    # memory cap (BASELINE.md r3: parity B=16 +6.8%, fast preset +14%,
    # and it is what lets B=32 parity extraction fit HBM). The scan only
    # engages when batch * proposals exceeds the chunk. None = 1 pass.
    roi_chunk: Optional[int] = 2400
    # rematerialize backbone blocks in the backward pass (detection
    # TRAINING memory lever — the ~1.4 GB/image parity-canvas backbone
    # activations cap the fine-tune batch at 2 on one v5e chip; remat
    # trades ~1/3 extra backbone FLOPs for storing only block inputs).
    # Lifted transform: the param tree/checkpoints are unchanged.
    # Inference-only paths never see a backward, so this is free there.
    remat: bool = False

    @classmethod
    def vg_extraction(cls, **overrides) -> "FRCNNConfig":
        """The VG 36-box extraction parity geometry (reference
        tests/frcnn_test.py:16-19 / adapters/frcnn.py:30-41): 300
        post-NMS proposals, bf16 compute — the configuration the
        unc-nlp/frcnn-vg-finetuned checkpoint was validated at and the
        bench.py parity rows time. Use this (not the 1000-proposal
        detectron default) when serving that checkpoint
        (predict.VQAPredictor does)."""
        kwargs = dict(
            pre_nms_topk=6000, post_nms_topk=300, dtype="bfloat16",
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @classmethod
    def fast_extraction(cls, **overrides) -> "FRCNNConfig":
        """Throughput preset (NOT detection-parity with the reference):
        100 proposals instead of 300 cut the res5 stage — the FLOPs-
        dominant stage, ~87% MXU-bound — by 3x; bf16 compute. Detection
        quality for 36-box extraction is typically unaffected (the 36
        survivors come from the top of the score distribution), but boxes
        can differ from the torch reference, so the default config stays
        parity-exact."""
        kwargs = dict(
            pre_nms_topk=2000, post_nms_topk=100, dtype="bfloat16",
            roi_chunk=1600,  # measured optimum at the fast RoI count (r3)
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @classmethod
    def int8_extraction(cls, **overrides) -> "FRCNNConfig":
        """Calibrated static-PTQ preset: full parity GEOMETRY (300
        proposals, 36 detections) with every bottleneck conv on the v5e
        int8 MXU path. The best measured accuracy/speed point on the
        preset Pareto (BASELINE.md r3: +18% over bf16 at 97% box
        agreement / 0.93 relative mAP at worst-case random init) —
        unlike fast_extraction it keeps the full proposal set, so
        accuracy cost comes only from score rounding, not candidate
        truncation. Extraction adapters calibrate automatically on the
        first batch (adapters/frcnn.py); direct model users call
        :func:`calibrate_int8`."""
        kwargs = dict(
            dtype="bfloat16", int8=True,
            # the VG extraction parity geometry (reference
            # tests/frcnn_test.py:16-19 / bench.py parity config)
            pre_nms_topk=6000, post_nms_topk=300,
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    #: Named extraction presets on the measured accuracy/speed Pareto
    #: (bench.py --preset-drift; BASELINE.md "preset Pareto" table). Keys
    #: are the names the Pareto rows, ``bench.py --preset`` and the CLI
    #: use; values are (factory, overrides). ``production`` is the
    #: quality-gated default for non-parity deployments: the fastest
    #: preset holding >=0.95 box agreement @IoU0.5 and >=0.99 feature
    #: cosine vs parity at worst-case (random-init) weights — measured
    #: int8_300 (r4 joint sweep: 0.969 agreement, +18% over bf16;
    #: int8_200 misses the gate by 0.006 at worst case and is the
    #: expected knee once the real-weight closure
    #: (verify_checkpoint --pareto) re-measures it).
    PRESETS = {
        "parity_300": ("vg_extraction", {}),
        "props_200": ("vg_extraction", dict(pre_nms_topk=4000, post_nms_topk=200)),
        "props_150": ("vg_extraction", dict(pre_nms_topk=3000, post_nms_topk=150)),
        "props_100": ("fast_extraction", {}),
        "fast": ("fast_extraction", {}),
        "int8_300": ("int8_extraction", {}),
        "int8_200": ("int8_extraction", dict(pre_nms_topk=4000, post_nms_topk=200)),
        "int8_150": ("int8_extraction", dict(pre_nms_topk=3000, post_nms_topk=150)),
        "int8_100": (
            "int8_extraction",
            dict(pre_nms_topk=2000, post_nms_topk=100, roi_chunk=1600),
        ),
        "production": ("int8_extraction", {}),
    }

    @classmethod
    def named_preset(cls, name: str, **overrides) -> "FRCNNConfig":
        """Build a named point on the extraction accuracy/speed Pareto.

        The accuracy cost of every preset vs the parity config is
        measured by ``bench.py --preset-drift`` (box agreement, matched
        IoU, feature cosine, relative mAP@0.5) and recorded in
        BASELINE.md; at random init those numbers are worst-case bounds
        (tools/verify_checkpoint.py --pareto re-measures with real
        weights). int8 presets need calibration (:func:`calibrate_int8`;
        extraction adapters do it automatically on the first batch).
        """
        if name not in cls.PRESETS:
            raise ValueError(
                f"unknown preset {name!r}; known: {sorted(cls.PRESETS)}"
            )
        factory, kw = cls.PRESETS[name]
        return getattr(cls, factory)(**{**kw, **overrides})

    @property
    def num_anchors(self) -> int:
        return len(self.anchor_sizes) * len(self.aspect_ratios)

    @property
    def compute_dtype(self):
        return None if self.dtype is None else jnp.dtype(self.dtype)


def _select_detections(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    nms_thresh_list: Sequence[float],
    min_detections: int,
    max_detections: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """The retry-NMS of do_nms (reference: frcnn.py:116-143, 1274-1278) as a
    static parallel evaluation: run fixed NMS at every threshold in the
    list, then pick the first whose keep-count reaches ``min_detections``
    (falling back to the last, as the reference loop does).

    The thresholds run VMAPPED over one selection scan (T-wide ops per
    greedy step) instead of T sequential scans — the scan's sequential
    step latency dominates at these sizes, so this cuts the
    detection-selection stage roughly T-fold."""
    keeps, valids = jax.vmap(
        lambda t: nms_fixed(boxes, scores, t, max_detections, valid=valid)
    )(jnp.asarray(nms_thresh_list, boxes.dtype))  # (T, D) each
    counts = jnp.sum(valids, axis=1)
    stop = counts >= min_detections
    # first stopping index; if none stop, argmax of all-False is 0 — the
    # reference keeps the *last* attempt in that case
    choice = jnp.where(jnp.any(stop), jnp.argmax(stop), len(nms_thresh_list) - 1)
    return keeps[choice], valids[choice]


class FRCNN(nn.Module):
    """End-to-end batched inference: images -> fixed-D detections
    (reference: FRCNN.inference frcnn.py:1942-2004)."""

    cfg: FRCNNConfig = FRCNNConfig()

    @nn.compact
    def __call__(
        self,
        images: jnp.ndarray,
        image_sizes: jnp.ndarray,
        scales_yx: Optional[jnp.ndarray] = None,
        ignorey: Optional[jnp.ndarray] = None,
        return_raw: bool = False,
    ):
        """Args:
          images: (N, H, W, 3) BGR caffe-normalized, padded to the static
            canvas (reference input convention, adapters/frcnn.py:13-23).
          image_sizes: (N, 2) float (h, w) of real content inside the pad.
          scales_yx: optional (N, 2) — boxes are divided back to raw-image
            coordinates via multiply (reference: ROIOutputs 1280-1283).
          ignorey: optional (N, J, 2) document y-band exclusion ranges for
            the RPN (reference: frcnn.py:275, 328-366); needs scales_yx.
          return_raw: also return the pre-postprocess tensors a detection
            trainer consumes (models/detection_loss.py) under "raw":
            rpn_logits (N, A), rpn_deltas (N, A, 4), anchors (A, 4),
            proposals/prop_scores/prop_valid, obj_logits, attr_logits,
            box_deltas. The reference's training branches all raise
            NotImplementedError (frcnn.py:1296-1302, 1930-1931).

        Returns a dict of fixed-shape tensors:
          boxes (N, D, 4), obj_ids (N, D), obj_probs (N, D),
          attr_ids (N, D), attr_probs (N, D), roi_features (N, D, 2048),
          preds_per_image (N,), mask (N, D) — D = cfg.max_detections.
        """
        cfg = self.cfg
        dtype = cfg.compute_dtype
        feats = ResNetC4(
            depth=cfg.depth,
            stem_out_channels=cfg.stem_out_channels,
            res2_out_channels=cfg.res2_out_channels,
            num_groups=cfg.num_groups,
            width_per_group=cfg.width_per_group,
            stride_in_1x1=cfg.stride_in_1x1,
            caffe_maxpool=cfg.caffe_maxpool,
            dtype=dtype,
            int8=cfg.int8,
            remat=cfg.remat,
            name="backbone",
        )(images)

        logits, deltas = RPNHead(
            num_anchors=cfg.num_anchors,
            hidden_channels=cfg.rpn_hidden_channels,
            name="rpn_head",
        )(feats)
        anchors = grid_anchors(
            (feats.shape[1], feats.shape[2]),
            stride=cfg.feature_stride,
            sizes=cfg.anchor_sizes,
            aspect_ratios=cfg.aspect_ratios,
            offset=cfg.anchor_offset,
        )
        prop_boxes, prop_scores, prop_valid = propose(
            logits.astype(jnp.float32),
            deltas.astype(jnp.float32),
            anchors,
            image_sizes,
            nms_thresh=cfg.rpn_nms_thresh,
            pre_nms_topk=cfg.pre_nms_topk,
            post_nms_topk=cfg.post_nms_topk,
            min_box_side_len=cfg.min_box_side_len,
            bbox_reg_weights=cfg.rpn_bbox_reg_weights,
            ignorey=ignorey,
            scales_yx=scales_yx,
            nms_block=cfg.rpn_nms_block,
            nms_unroll=cfg.rpn_nms_unroll,
            nms_chunk=cfg.rpn_nms_chunk,
        )

        obj_logits, attr_logits, box_deltas, pooled = Res5RoIHeads(
            num_classes=cfg.num_classes,
            num_attrs=cfg.num_attrs,
            res2_out_channels=cfg.res2_out_channels,
            num_groups=cfg.num_groups,
            width_per_group=cfg.width_per_group,
            stride_in_1x1=cfg.stride_in_1x1,
            pooler_resolution=cfg.pooler_resolution,
            feature_stride=cfg.feature_stride,
            res5_halve=cfg.res5_halve,
            use_attr=cfg.use_attr,
            cls_agnostic_bbox_reg=cfg.cls_agnostic_bbox_reg,
            dtype=dtype,
            int8=cfg.int8,
            roi_chunk=cfg.roi_chunk,
            name="roi_heads",
        )(feats, prop_boxes)
        obj_logits = obj_logits.astype(jnp.float32)
        box_deltas = box_deltas.astype(jnp.float32)
        pooled = pooled.astype(jnp.float32)
        if attr_logits is not None:
            attr_logits = attr_logits.astype(jnp.float32)

        out = _postprocess(
            cfg,
            prop_boxes,
            prop_valid,
            obj_logits,
            attr_logits,
            box_deltas,
            pooled,
            image_sizes,
            scales_yx,
        )
        if return_raw:
            out["raw"] = {
                "rpn_logits": logits.astype(jnp.float32).reshape(
                    logits.shape[0], -1
                ),
                "rpn_deltas": deltas.astype(jnp.float32).reshape(
                    deltas.shape[0], -1, 4
                ),
                "anchors": anchors,
                "proposals": prop_boxes,
                "prop_scores": prop_scores,
                "prop_valid": prop_valid,
                "obj_logits": obj_logits,
                "attr_logits": attr_logits,
                "box_deltas": box_deltas,
            }
        return out


def _postprocess(
    cfg: FRCNNConfig,
    prop_boxes: jnp.ndarray,
    prop_valid: jnp.ndarray,
    obj_logits: jnp.ndarray,
    attr_logits: Optional[jnp.ndarray],
    box_deltas: jnp.ndarray,
    pooled: jnp.ndarray,
    image_sizes: jnp.ndarray,
    scales_yx: Optional[jnp.ndarray],
):
    """ROIOutputs.inference (reference: frcnn.py:1263-1294) with static
    shapes throughout."""
    n, p = obj_logits.shape[:2]
    d = cfg.max_detections

    probs = jax.nn.softmax(obj_logits, axis=-1)  # (N, P, C+1)
    fg = probs[..., :-1]  # drop background (do_nms frcnn.py:117)
    max_scores = jnp.max(fg, axis=-1)  # (N, P)
    max_classes = jnp.argmax(fg, axis=-1)  # (N, P)

    # decode only the argmax class's deltas (equivalent to the reference's
    # decode-all-then-select, _predict_boxes frcnn.py:1242-1250)
    if cfg.cls_agnostic_bbox_reg:
        sel_deltas = box_deltas
    else:
        flat = box_deltas.reshape(n, p, cfg.num_classes, 4)
        sel_deltas = jnp.take_along_axis(
            flat, max_classes[..., None, None], axis=2
        ).squeeze(2)  # (N, P, 4)
    decoded = apply_deltas(
        sel_deltas, prop_boxes, weights=tuple(cfg.box_reg_weights)
    )  # (N, P, 4)

    def per_image(boxes_i, scores_i, valid_i, size_i):
        boxes_i = clip_boxes(boxes_i, size_i)  # do_nms frcnn.py:120
        keep, keep_valid = _select_detections(
            boxes_i,
            scores_i,
            valid_i,
            cfg.nms_thresh_list,
            cfg.min_detections,
            cfg.max_detections,
        )
        return keep, keep_valid, boxes_i

    keep, keep_valid, clipped = jax.vmap(per_image)(
        decoded, max_scores, prop_valid, image_sizes
    )  # keep (N, D)

    safe = jnp.maximum(keep, 0)
    take = lambda t: jnp.take_along_axis(
        t, safe.reshape(n, d, *([1] * (t.ndim - 2))), axis=1
    )
    out_boxes = take(clipped)
    out_scores = jnp.take_along_axis(max_scores, safe, axis=1)
    out_classes = jnp.take_along_axis(max_classes, safe, axis=1)
    out_feats = take(pooled)

    if attr_logits is not None:
        attr_fg = jax.nn.softmax(attr_logits[..., :-1], axis=-1)
        attr_probs_all = jnp.max(attr_fg, axis=-1)
        attrs_all = jnp.argmax(attr_fg, axis=-1)
        out_attr_probs = jnp.take_along_axis(attr_probs_all, safe, axis=1)
        out_attrs = jnp.take_along_axis(attrs_all, safe, axis=1)
    else:
        out_attr_probs = jnp.zeros((n, d), jnp.float32)
        out_attrs = jnp.full((n, d), -1, jnp.int32)

    if scales_yx is not None:
        sy = scales_yx[:, 0][:, None]
        sx = scales_yx[:, 1][:, None]
        out_boxes = jnp.stack(
            [
                out_boxes[..., 0] * sx,
                out_boxes[..., 1] * sy,
                out_boxes[..., 2] * sx,
                out_boxes[..., 3] * sy,
            ],
            axis=-1,
        )

    m = keep_valid
    mf = m[..., None].astype(out_boxes.dtype)
    return {
        "boxes": out_boxes * mf,
        "obj_ids": jnp.where(m, out_classes, -1).astype(jnp.int32),
        "obj_probs": jnp.where(m, out_scores, 0.0),
        "attr_ids": jnp.where(m, out_attrs, -1).astype(jnp.int32),
        "attr_probs": jnp.where(m, out_attr_probs, 0.0),
        "roi_features": out_feats * mf,
        "preds_per_image": jnp.sum(m, axis=1).astype(jnp.int32),
        "mask": m,
    }


def calibrate_int8(
    cfg: FRCNNConfig,
    params,
    batches,
) -> dict:
    """Record static int8 activation scales (PTQ calibration).

    Runs each ``(images, image_sizes[, scales_yx])`` batch through an
    int8 FRCNN with the ``"quant"`` collection mutable, accumulating a
    running per-layer ``act_max`` (layers.Int8Conv). The returned
    collection is then passed alongside params —
    ``model.apply({"params": p, "quant": q}, ...)`` — which switches
    every Int8Conv to its static fast path (quantize fused into the
    producer epilogue, no per-step max reduction).

    Calibration itself uses an UNCHUNKED twin config: the res5 chunk
    scan broadcasts "quant" and a broadcast collection cannot be mutated
    inside ``nn.scan``. Param/variable paths are identical between the
    two branches (roi_heads.py), so the recorded scales drop straight
    into the chunked production model. Keep calibration batches small
    enough for the unchunked pooled intermediate (B<=8 at parity
    geometry).

    The reference has no quantized path; this is TPU-native PTQ for the
    v5e int8 MXU (~2x bf16 rate, tools/probe_int8.py).
    """
    calib_cfg = dataclasses.replace(cfg, int8=True, roi_chunk=None)
    model = FRCNN(calib_cfg)
    quant: dict = {}
    for batch in batches:
        images, image_sizes, *rest = batch
        scales_yx = rest[0] if rest else None
        variables = {"params": params}
        if quant:
            variables["quant"] = quant
        _, mutated = model.apply(
            variables,
            images,
            image_sizes,
            scales_yx=scales_yx,
            mutable=["quant"],
        )
        quant = mutated["quant"]
    return quant
