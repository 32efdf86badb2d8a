"""FRCNN detection fine-tune experiment — COCO-style boxes through the
vision loader into the detection losses.

The reference could only run its FRCNN for inference (every training
branch raises NotImplementedError, reference: vltk/modeling/frcnn.py:
1296-1302, 1930-1931); this experiment closes the loop: vision batches
(host-processed images + fixed-shape ``gt_boxes``/``gt_boxes_mask`` +
``vlabels`` from the annotation adapter) drive a jitted value_and_grad
step over RPN + RoI-head objectives (models/detection_loss.py).

Data-layer conventions handled here:
  * boxes are (X, Y, W, H) in raw-image coordinates at the data layer
    (reference: vltk/vars.py:3-5) -> converted to XYXY and rescaled by the
    resize scale;
  * images arrive RGB on the host canvas -> BGR caffe-normalized with the
    pad region re-zeroed (the reference normalizes before padding,
    legacy/processing.py:120-138).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import numpy as np

from vltk_tpu import vars as V
from vltk_tpu.models import FRCNN, FRCNNConfig, fast_rcnn_losses, rpn_losses
from vltk_tpu.ops.image_ops import CAFFE_BGR_MEAN
from vltk_tpu.train import SimpleExperiment


class FRCNNDetectExperiment(SimpleExperiment):
    name = "frcnn_detect"

    #: override for other architectures / tiny test configs
    model_config: FRCNNConfig = FRCNNConfig()
    rpn_batch_per_image: int = 256
    roi_batch_per_image: int = 128

    def build_model(self):
        cfg = self.model_config
        # auto-size the class head to the annotation label table
        table = getattr(self.train_loader, "metadata_ids", {}) or {}
        labels = table.get(V.labels) or table.get(V.objects)
        if labels and len(labels) != cfg.num_classes:
            cfg = dataclasses.replace(cfg, num_classes=len(labels))
            self.model_config = cfg
        self.model = FRCNN(cfg=cfg)
        # static canvas straight from the vision config (same derivation
        # the host pipeline uses) — no need to decode a probe batch
        from vltk_tpu.processing.image import canvas_for

        canvas = canvas_for(self.config.data.vision.size)
        params = self.model.init(
            jax.random.PRNGKey(0),
            np.zeros((1, *canvas, 3), np.float32),
            np.asarray([[float(canvas[0]), float(canvas[1])]], np.float32),
        )["params"]

        def apply_fn(variables, images, sizes, **kw):
            return self.model.apply(variables, images, sizes, **kw)

        return apply_fn, params

    # -- batch plumbing ------------------------------------------------------

    def prepare_batch(self, batch: Dict[str, Any]) -> Dict[str, Any]:
        img = np.asarray(batch[V.img], np.float32)  # (B, Hc, Wc, 3) RGB
        sizes = np.asarray(batch[V.size], np.float32)  # (B, 2) resized (h, w)
        rawsizes = np.asarray(batch[V.rawsize], np.float32)

        # RGB -> BGR, caffe means, zero the pad beyond each image's content
        img = img[..., ::-1] - np.asarray(CAFFE_BGR_MEAN, np.float32)
        rows = np.arange(img.shape[1])[None, :, None]
        cols = np.arange(img.shape[2])[None, None, :]
        inside = (rows < sizes[:, 0][:, None, None]) & (
            cols < sizes[:, 1][:, None, None]
        )
        img = np.where(inside[..., None], img, 0.0)

        # gt: XYWH raw coords -> XYXY resized coords
        xywh = np.asarray(batch["gt_" + V.boxes], np.float32)  # (B, D, 4)
        gtv = np.asarray(batch["gt_" + V.boxes_mask]).astype(bool)
        sw = (sizes[:, 1] / np.maximum(rawsizes[:, 1], 1.0))[:, None]
        sh = (sizes[:, 0] / np.maximum(rawsizes[:, 0], 1.0))[:, None]
        gt = np.stack(
            [
                xywh[..., 0] * sw,
                xywh[..., 1] * sh,
                (xywh[..., 0] + xywh[..., 2]) * sw,
                (xywh[..., 1] + xywh[..., 3]) * sh,
            ],
            axis=-1,
        )

        # annotation label ids: VLOVERLAP renames "labels" -> "vlabels"
        # (reference: vars.py VLOVERLAP; visndataset._finalize_annotations)
        classes = np.asarray(
            batch.get("vlabels", batch.get(V.labels)), np.int32
        )
        classes = np.clip(classes, 0, self.model_config.num_classes - 1)
        return {
            "images": img.astype(np.float32),
            "sizes": sizes,
            "gt_boxes": gt.astype(np.float32),
            "gt_valid": gtv & (gt[..., 2] > gt[..., 0]) & (gt[..., 3] > gt[..., 1]),
            "gt_classes": classes,
        }

    # -- objective -----------------------------------------------------------

    def loss_fn(self, params, batch, rng):
        out = self.apply_fn(
            {"params": params}, batch["images"], batch["sizes"], return_raw=True
        )
        raw = out["raw"]
        r1, r2 = jax.random.split(rng)
        obj, loc = rpn_losses(
            raw["anchors"], raw["rpn_logits"], raw["rpn_deltas"],
            batch["gt_boxes"], batch["gt_valid"], r1,
            batch_size_per_image=self.rpn_batch_per_image,
        )
        # (fast_rcnn_losses detaches the proposals internally — detectron's
        # no_grad proposal semantics)
        cls, box = fast_rcnn_losses(
            raw["proposals"], raw["prop_valid"],
            raw["obj_logits"], raw["box_deltas"],
            batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"], r2,
            batch_size_per_image=self.roi_batch_per_image,
        )
        loss = obj + loc + cls + box
        return loss, {
            "rpn_obj": obj, "rpn_loc": loc, "roi_cls": cls, "roi_box": box,
        }

    def eval_metrics(self, params, batch):
        out = self.apply_fn(
            {"params": params}, batch["images"], batch["sizes"], return_raw=True
        )
        raw = out["raw"]
        obj, loc = rpn_losses(
            raw["anchors"], raw["rpn_logits"], raw["rpn_deltas"],
            batch["gt_boxes"], batch["gt_valid"], jax.random.PRNGKey(0),
            batch_size_per_image=self.rpn_batch_per_image,
        )
        return {"rpn_obj": obj, "rpn_loc": loc}

    def eval_loop(self):
        """Adds mAP@0.5 on top of the jitted loss metrics: detection_map
        is host-side numpy (greedy VOC matching over fetched outputs), so
        it runs outside the compiled eval step on the model's
        postprocessed detections (boxes in the same resized coordinate
        space as the prepared gt)."""
        from vltk_tpu.train import detection_map

        totals = super().eval_loop()
        if self.eval_loader is None:
            return totals
        map_sum, count = 0.0, 0
        for batch in self._device_batches(self.eval_loader):
            out = self.apply_fn(
                {"params": self.state.params}, batch["images"], batch["sizes"]
            )
            out = jax.device_get(out)
            map_sum += detection_map(
                out["boxes"], out["obj_probs"], out["obj_ids"], out["mask"],
                batch["gt_boxes"], batch["gt_classes"], batch["gt_valid"],
            )
            count += 1
            if self.config.test_run:
                break
        totals["map50"] = map_sum / max(count, 1)
        return totals
