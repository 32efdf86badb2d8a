"""RoI heads: pooling + res5 + classification/attribute/box predictors.

Re-design of the reference Res5ROIHeads + FastRCNNOutputLayers (reference:
vltk/modeling/frcnn.py:1305-1403, 1676-1740) for fixed shapes: every image
carries exactly P (=post_nms_topk) proposals with a validity mask, so the
pool->res5->heads pipeline is one big batched matmul workload for the MXU
instead of a ragged per-image loop.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

import flax.linen as linen

from vltk_tpu.models.backbone import Res5Head, res5_blocks


class PoolRes5Scan(nn.Module):
    """Scan body fusing RoIPool + res5 for one RoI chunk: pools its own
    (N, Pc) box slice and immediately reduces it to (N, Pc, 2048) pooled
    features, so the full (N*P, 14, 14, C) pooled tensor — ~2 GB bf16 at
    the parity config, the HBM high-water mark that crashed B=32
    (BASELINE.md) — never materializes. Param layout identical to
    :class:`Res5Head` (children "0"/"1"/"2"), so both branches share one
    checkpoint layout."""

    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    halve: bool = False
    dtype: Any = None
    int8: bool = False
    pooler_resolution: int = 14
    feature_stride: int = 16

    @nn.compact
    def __call__(self, carry, features: jnp.ndarray, boxes: jnp.ndarray):
        from vltk_tpu.ops.pallas_kernels import roi_pool_auto

        n, pc = boxes.shape[0], boxes.shape[1]
        res = self.pooler_resolution
        pooled = roi_pool_auto(
            features,
            boxes,
            output_size=res,
            spatial_scale=1.0 / self.feature_stride,
        )  # (N, Pc, res, res, C)
        x = pooled.reshape(n * pc, res, res, features.shape[-1])
        y = res5_blocks(
            x,
            res2_out_channels=self.res2_out_channels,
            num_groups=self.num_groups,
            width_per_group=self.width_per_group,
            stride_in_1x1=self.stride_in_1x1,
            halve=self.halve,
            dtype=self.dtype,
            int8=self.int8,
        )
        feat = jnp.mean(y, axis=(1, 2))  # frcnn.py:1401 mean pool
        return carry, feat.reshape(n, pc, -1)


class FastRCNNOutputLayers(nn.Module):
    """cls_score (C+1), bbox_pred (C*4), and the VG attribute head:
    argmax-class embedding -> concat -> fc -> attr scores
    (reference: frcnn.py:1676-1740)."""

    num_classes: int = 1600
    num_attrs: int = 400
    input_size: int = 2048
    cls_agnostic_bbox_reg: bool = False
    use_attr: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(
        self, x: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray]:
        scores = nn.Dense(self.num_classes + 1, dtype=self.dtype, name="cls_score")(x)
        num_reg = 1 if self.cls_agnostic_bbox_reg else self.num_classes
        deltas = nn.Dense(num_reg * 4, dtype=self.dtype, name="bbox_pred")(x)
        if not self.use_attr:
            return scores, None, deltas
        # attribute head (VG modification, frcnn.py:1709-1737): embedding of
        # the argmax class (over all C+1 logits, bg included) concatenated
        # onto the pooled feature
        max_class = jnp.argmax(scores, axis=-1)
        emb = nn.Embed(
            self.num_classes + 1,
            self.input_size // 8,
            dtype=self.dtype,
            name="cls_embedding",
        )(max_class)
        attr = jnp.concatenate([x, emb], axis=-1)
        attr = nn.relu(
            nn.Dense(self.input_size // 4, dtype=self.dtype, name="fc_attr")(attr)
        )
        attr_scores = nn.Dense(self.num_attrs + 1, dtype=self.dtype, name="attr_score")(
            attr
        )
        return scores, attr_scores, deltas


class Res5RoIHeads(nn.Module):
    """RoIPool(14x14, 1/16) -> res5 -> global mean -> predictors
    (reference: Res5ROIHeads frcnn.py:1305-1403)."""

    num_classes: int = 1600
    num_attrs: int = 400
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    pooler_resolution: int = 14
    feature_stride: int = 16
    res5_halve: bool = False
    use_attr: bool = True
    cls_agnostic_bbox_reg: bool = False
    dtype: Any = None
    int8: bool = False
    # cap on RoIs materialized through res5 at once: the res5 activation
    # volume is the HBM high-water mark of extraction (B=32 OOMed at 16.2G,
    # BASELINE.md) — chunking scans res5 over RoI blocks and keeps only the
    # pooled (chunk, 2048) outputs live. None = single pass.
    roi_chunk: Optional[int] = None

    @nn.compact
    def __call__(
        self, features: jnp.ndarray, boxes: jnp.ndarray
    ) -> Tuple[jnp.ndarray, Optional[jnp.ndarray], jnp.ndarray, jnp.ndarray]:
        """features (N, Hf, Wf, C); boxes (N, P, 4) xyxy image coords.

        Returns (obj_logits, attr_logits, box_deltas, pooled_features), all
        (N, P, ...) fixed shape.
        """
        n, p = boxes.shape[0], boxes.shape[1]
        from vltk_tpu.ops.pallas_kernels import roi_pool_auto

        res = self.pooler_resolution
        res5_kwargs = dict(
            res2_out_channels=self.res2_out_channels,
            num_groups=self.num_groups,
            width_per_group=self.width_per_group,
            stride_in_1x1=self.stride_in_1x1,
            halve=self.res5_halve,
            dtype=self.dtype,
            int8=self.int8,
        )
        if self.roi_chunk is not None and n * p > self.roi_chunk:
            # pool-inside-scan: each scan step pools ITS OWN (N, Pc) box
            # slice and runs res5 on it, so only one chunk's pooled tensor
            # is ever live (vs the full ~2 GB (N*P, 14, 14, C) bf16
            # intermediate that crashed B=32, VERDICT r2 task 1/5)
            pc = max(int(self.roi_chunk) // n, 1)
            k = -(-p // pc)
            pad = k * pc - p
            boxes_p = (
                jnp.concatenate(
                    [boxes, jnp.zeros((n, pad, 4), boxes.dtype)], axis=1
                )
                if pad
                else boxes
            )
            xs = boxes_p.reshape(n, k, pc, 4).transpose(1, 0, 2, 3)
            scanned = linen.scan(
                PoolRes5Scan,
                # "quant" = static int8 activation scales (layers.Int8Conv);
                # broadcast like params. Calibration (which MUTATES "quant")
                # must run through the unchunked twin — scan cannot mutate a
                # broadcast collection (frcnn.calibrate_int8 does this).
                variable_broadcast=["params", "quant"],
                split_rngs={"params": False},
                in_axes=(linen.broadcast, 0),
                out_axes=0,
            )(
                **res5_kwargs,
                pooler_resolution=res,
                feature_stride=self.feature_stride,
                name="res5",
            )
            _, feat = scanned(None, features, xs)  # (k, n, pc, 2048)
            feat = (
                feat.transpose(1, 0, 2, 3)
                .reshape(n, k * pc, -1)[:, :p]
                .reshape(n * p, -1)
            )
        else:
            pooled = roi_pool_auto(
                features,
                boxes,
                output_size=res,
                spatial_scale=1.0 / self.feature_stride,
            )  # (N, P, 14, 14, C) — pallas kernel on TPU, XLA elsewhere
            pooled = pooled.reshape(n * p, res, res, features.shape[-1])
            x = Res5Head(**res5_kwargs, name="res5")(pooled)
            feat = jnp.mean(x, axis=(1, 2))  # (N*P, 2048) — frcnn.py:1401
        obj_logits, attr_logits, deltas = FastRCNNOutputLayers(
            num_classes=self.num_classes,
            num_attrs=self.num_attrs,
            input_size=self.res2_out_channels * 8,
            cls_agnostic_bbox_reg=self.cls_agnostic_bbox_reg,
            use_attr=self.use_attr,
            dtype=self.dtype,
            name="box_predictor",
        )(feat)
        unflat = lambda t: None if t is None else t.reshape(n, p, *t.shape[1:])
        return unflat(obj_logits), unflat(attr_logits), unflat(deltas), unflat(feat)
