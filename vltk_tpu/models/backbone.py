"""ResNet-C4 backbone in flax — the FRCNN trunk, NHWC + MXU convs.

Re-designs the reference's torch ResNet (reference: vltk/modeling/frcnn.py:
857-1144, build_backbone:200-261) as static flax modules. Key caffe-parity
details carried over:
  * stem: 7x7/2 conv + ceil-mode 3x3/2 maxpool (caffe_maxpool flag,
    frcnn.py:875-876)
  * bottleneck ``stride_in_1x1`` (frcnn.py:932-940)
  * VG res5 variant: first-block stride 1, all conv2 dilation/padding 2
    (frcnn.py:1345-1356 "res5_halve=False")

Module/parameter names deliberately mirror the torch attribute names
(stem.conv1, res2.0.conv1 ...) so the checkpoint converter is a pure
path-rename (vltk_tpu/models/convert.py).
"""

from __future__ import annotations

from typing import  Optional

import flax.linen as nn
import jax.numpy as jnp

from vltk_tpu.models.layers import ConvNorm, StemConvNorm, caffe_maxpool, torch_maxpool

NUM_BLOCKS_PER_STAGE = {50: [3, 4, 6, 3], 101: [3, 4, 23, 3], 152: [3, 8, 36, 3]}


class BasicStem(nn.Module):
    """conv1 7x7/2 (+frozen BN, relu) + 3x3/2 maxpool — total stride 4
    (reference: frcnn.py:857-887)."""

    out_channels: int = 64
    caffe_maxpool: bool = True
    s2d: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # optional space-to-depth path (exact; see layers.StemConv).
        # Measured on v5e: 2x SLOWER than the plain conv (41.4 vs 20.9 ms
        # at batch 8, 832x1344) — the input reshuffle outweighs the lane
        # gain on this XLA version, so it defaults off; kept as an option
        # for other generations
        x = StemConvNorm(
            self.out_channels,
            use_s2d=self.s2d,
            dtype=self.dtype,
            name="conv1",
        )(x)
        if self.caffe_maxpool:
            return caffe_maxpool(x)
        return torch_maxpool(x)


class BottleneckBlock(nn.Module):
    """1x1 -> 3x3 -> 1x1 bottleneck with projection shortcut
    (reference: frcnn.py:905-1000)."""

    out_channels: int
    bottleneck_channels: int
    stride: int = 1
    num_groups: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        in_channels = x.shape[-1]
        stride_1x1, stride_3x3 = (
            (self.stride, 1) if self.stride_in_1x1 else (1, self.stride)
        )
        out = ConvNorm(
            self.bottleneck_channels,
            kernel_size=(1, 1),
            strides=(stride_1x1, stride_1x1),
            activation=nn.relu,
            dtype=self.dtype,
            int8=self.int8,
            name="conv1",
        )(x)
        out = ConvNorm(
            self.bottleneck_channels,
            kernel_size=(3, 3),
            strides=(stride_3x3, stride_3x3),
            padding=(self.dilation, self.dilation),
            dilation=(self.dilation, self.dilation),
            groups=self.num_groups,
            activation=nn.relu,
            dtype=self.dtype,
            int8=self.int8,
            name="conv2",
        )(out)
        out = ConvNorm(
            self.out_channels,
            kernel_size=(1, 1),
            dtype=self.dtype,
            int8=self.int8,
            name="conv3",
        )(out)
        if in_channels != self.out_channels:
            shortcut = ConvNorm(
                self.out_channels,
                kernel_size=(1, 1),
                strides=(self.stride, self.stride),
                dtype=self.dtype,
                name="shortcut",
            )(x)
        else:
            shortcut = x
        return nn.relu(out + shortcut)


class ResStage(nn.Module):
    """A sequence of bottleneck blocks; first block may stride
    (reference: ResNet.make_stage frcnn.py:1102-1144)."""

    num_blocks: int
    out_channels: int
    bottleneck_channels: int
    first_stride: int = 2
    num_groups: int = 1
    stride_in_1x1: bool = True
    dilation: int = 1
    dtype: Optional[jnp.dtype] = None
    int8: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        # remat: checkpoint at block boundaries — the backward recomputes
        # each block's internals from its input instead of storing them
        # (detection training's batch ceiling is backbone activations,
        # ~1.4 GB/image at the parity canvas; a lifted transform, so the
        # param tree and checkpoints are IDENTICAL to the plain path)
        block_cls = nn.remat(BottleneckBlock) if self.remat else BottleneckBlock
        for i in range(self.num_blocks):
            x = block_cls(
                out_channels=self.out_channels,
                bottleneck_channels=self.bottleneck_channels,
                stride=self.first_stride if i == 0 else 1,
                num_groups=self.num_groups,
                stride_in_1x1=self.stride_in_1x1,
                dilation=self.dilation,
                dtype=self.dtype,
                int8=self.int8,
                name=str(i),
            )(x)
        return x


class ResNetC4(nn.Module):
    """stem + res2..res4, emitting the stride-16 res4 map the RPN and RoI
    heads consume (reference: build_backbone frcnn.py:200-261 with
    OUT_FEATURES=["res4"])."""

    depth: int = 101
    stem_out_channels: int = 64
    stem_s2d: bool = False
    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    caffe_maxpool: bool = True
    dtype: Optional[jnp.dtype] = None
    int8: bool = False
    remat: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = BasicStem(
            self.stem_out_channels,
            caffe_maxpool=self.caffe_maxpool,
            s2d=self.stem_s2d,
            dtype=self.dtype,
            name="stem",
        )(x)
        blocks = NUM_BLOCKS_PER_STAGE[self.depth]
        bottleneck = self.num_groups * self.width_per_group
        out_channels = self.res2_out_channels
        for idx, stage_idx in enumerate(range(2, 5)):  # res2, res3, res4
            x = ResStage(
                num_blocks=blocks[idx],
                out_channels=out_channels,
                bottleneck_channels=bottleneck,
                first_stride=1 if idx == 0 else 2,
                num_groups=self.num_groups,
                stride_in_1x1=self.stride_in_1x1,
                dtype=self.dtype,
                int8=self.int8,
                remat=self.remat,
                name=f"res{stage_idx}",
            )(x)
            out_channels *= 2
            bottleneck *= 2
        return x  # (N, H/16, W/16, res2_out_channels*4)


def res5_blocks(
    x: jnp.ndarray,
    *,
    res2_out_channels: int = 256,
    num_groups: int = 1,
    width_per_group: int = 64,
    stride_in_1x1: bool = True,
    halve: bool = False,
    dtype: Optional[jnp.dtype] = None,
    int8: bool = False,
) -> jnp.ndarray:
    """The 3 res5 bottleneck blocks, as a helper callable from any compact
    module body — the param children are named "0"/"1"/"2" under the caller
    so :class:`Res5Head` and its chunk-scanned twin share one checkpoint
    layout (reference: Res5ROIHeads._build_res5_block frcnn.py:1365-1385
    + VG modifications 1345-1356)."""
    stage_channel_factor = 2 ** 3
    out_channels = res2_out_channels * stage_channel_factor
    bottleneck = num_groups * width_per_group * stage_channel_factor
    for i in range(3):
        x = BottleneckBlock(
            out_channels=out_channels,
            bottleneck_channels=bottleneck,
            stride=(2 if halve else 1) if i == 0 else 1,
            num_groups=num_groups,
            stride_in_1x1=stride_in_1x1,
            dilation=1 if halve else 2,
            dtype=dtype,
            int8=int8,
            name=str(i),
        )(x)
    return x


class Res5Head(nn.Module):
    """The res5 stage run on pooled RoI features (reference: Res5ROIHeads.
    _build_res5_block frcnn.py:1365-1385 + VG modifications 1345-1356).

    ``halve=False`` (the VG attribute model) keeps 14x14 spatial size:
    stride 1 in block 0, dilation/padding 2 in every conv2.
    """

    res2_out_channels: int = 256
    num_groups: int = 1
    width_per_group: int = 64
    stride_in_1x1: bool = True
    halve: bool = False
    dtype: Optional[jnp.dtype] = None
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        return res5_blocks(
            x,
            res2_out_channels=self.res2_out_channels,
            num_groups=self.num_groups,
            width_per_group=self.width_per_group,
            stride_in_1x1=self.stride_in_1x1,
            halve=self.halve,
            dtype=self.dtype,
            int8=self.int8,
        )


