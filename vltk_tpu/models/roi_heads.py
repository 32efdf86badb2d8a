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

from vltk_tpu.models.backbone import Res5Head, Res5HeadPooledScan


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

        pooled = roi_pool_auto(
            features,
            boxes,
            output_size=self.pooler_resolution,
            spatial_scale=1.0 / self.feature_stride,
        )  # (N, P, 14, 14, C) — pallas kernel on TPU, XLA tables elsewhere
        res = self.pooler_resolution
        pooled = pooled.reshape(n * p, res, res, features.shape[-1])
        res5_kwargs = dict(
            res2_out_channels=self.res2_out_channels,
            num_groups=self.num_groups,
            width_per_group=self.width_per_group,
            stride_in_1x1=self.stride_in_1x1,
            halve=self.res5_halve,
            dtype=self.dtype,
        )
        if self.roi_chunk is not None and n * p > self.roi_chunk:
            chunk = int(self.roi_chunk)
            k = -(-(n * p) // chunk)
            pad = k * chunk - n * p
            if pad:
                pooled = jnp.concatenate(
                    [pooled, jnp.zeros((pad, *pooled.shape[1:]), pooled.dtype)]
                )
            xs = pooled.reshape(k, chunk, res, res, features.shape[-1])
            scanned = linen.scan(
                Res5HeadPooledScan,
                variable_broadcast="params",
                split_rngs={"params": False},
                in_axes=0,
                out_axes=0,
            )(**res5_kwargs, name="res5")
            _, feat = scanned(None, xs)  # (K, chunk, 2048)
            feat = feat.reshape(k * chunk, -1)[: n * p]
        else:
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
