"""Shared NN building blocks — NHWC, XLA-friendly, inference + training safe.

TPU-first re-expression of the reference's torch layers (reference:
vltk/modeling/frcnn.py:785-887). Convolutions lower to
``lax.conv_general_dilated`` (MXU); frozen batch-norm is a pure affine the
compiler fuses into the neighbouring conv.
"""

from __future__ import annotations

import math
from typing import Callable, Optional,  Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class FrozenBatchNorm(nn.Module):
    """BatchNorm2d permanently in eval mode (the reference loads caffe
    ResNet weights and never trains BN; reference: frcnn.py:165-171
    ``get_norm("BN", ...)`` + ``.eval()``).

    Parameters mirror the torch buffers (scale/bias/mean/var) so checkpoint
    conversion is 1:1; the forward is the usual affine, which XLA folds.
    """

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        scale = self.param("scale", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = self.param("mean", nn.initializers.zeros, (self.features,))
        var = self.param("var", nn.initializers.ones, (self.features,))
        mul = scale * jnp.power(var + self.eps, -0.5)
        add = bias - mean * mul
        return x * mul.astype(x.dtype) + add.astype(x.dtype)


class Int8Conv(nn.Module):
    """Conv2d evaluated on the int8 MXU path (inference-only preset).

    v5e runs int8 matmuls at ~2x the bf16 MXU rate (measured here: 270
    TOP/s vs the 190 TFLOP/s the bf16 res5 sustains — tools/probe_int8.py).
    This module keeps the CANONICAL f32 ``kernel`` param — same shape/path
    as ``nn.Conv`` — and quantizes at apply time, so checkpoints,
    converters, and trainers are untouched and int8 is a pure runtime
    preset flag:

      * weights: symmetric per-output-channel, ``round(w * 127 / max|w|)``
      * activations: symmetric per-tensor. Two modes:
          - CALIBRATED (the fast path): apply with a ``"quant"`` variable
            collection holding per-layer ``act_max`` (recorded by running
            any batch with ``mutable=["quant"]`` — see
            :func:`vltk_tpu.models.frcnn.calibrate_int8`). The scale is
            then a trace-time-constant-shaped scalar, so the quantize is
            one elementwise op XLA fuses into the producer's epilogue and
            the conv reads HALF the bytes of bf16.
          - DYNAMIC (fallback, no "quant" vars): per-input max reduction
            every call. Measured end-to-end NEUTRAL on v5e (56.2 vs 57.5
            img/s parity extraction): the extra max+quantize HBM sweeps
            over every conv input eat the 2x MXU rate. Kept only as the
            zero-setup fallback.
      * conv accumulates in int32 (``preferred_element_type``), then one
        fused f32 rescale by ``s_x * s_w[c]``

    Standard PTQ recipe (per-channel weights + per-tensor activations);
    accuracy cost is measured empirically by ``bench.py --preset-drift``
    rather than assumed. ``jnp.round`` has a zero gradient, so this path
    is for extraction/inference presets, not training."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = False
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (*self.kernel_size, cin // self.groups, self.features),
        )
        out_dt = self.dtype or x.dtype
        w = kernel.astype(jnp.float32)
        s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=(0, 1, 2)), 1e-8) / 127.0
        w_q = jnp.round(w / s_w).astype(jnp.int8)  # (kh,kw,cin/g,F)
        xf = x.astype(jnp.float32)
        obs_max = jnp.max(jnp.abs(xf))
        # NOT during init: init makes every collection mutable, and "quant"
        # must stay out of the init tree (param-layout parity with nn.Conv)
        calibrating = self.is_mutable_collection("quant") and not self.is_initializing()
        if calibrating or self.has_variable("quant", "act_max"):
            act_max = self.variable(
                "quant", "act_max", lambda: jnp.zeros((), jnp.float32)
            )
            if calibrating:
                # running max over calibration batches
                act_max.value = jnp.maximum(act_max.value, obs_max)
            s_x = jnp.maximum(act_max.value, 1e-8) / 127.0
        else:
            s_x = jnp.maximum(obs_max, 1e-8) / 127.0
        x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        y = jax.lax.conv_general_dilated(
            x_q,
            w_q,
            window_strides=self.strides,
            padding=[(p, p) for p in self.padding],
            rhs_dilation=self.dilation,
            feature_group_count=self.groups,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (s_x * s_w)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias
        return y.astype(out_dt)


class Int8Dense(nn.Module):
    """``nn.Dense`` evaluated on the int8 MXU path (inference-only preset).

    The transformer twin of :class:`Int8Conv` — identical recipe
    (symmetric per-output-channel weight quant, per-tensor activations
    with the calibrated-static fast path via the ``"quant"`` collection
    and a dynamic per-input fallback) and the identical checkpoint story:
    the CANONICAL f32 ``kernel``/``bias`` params match ``nn.Dense``'s
    shapes and names exactly, so converters (models/convert.py) and
    trained checkpoints are untouched and int8 stays a pure runtime
    preset flag. Used by the encoder projections + MLPs of
    LXMERT/LayoutLM/ViT when ``cfg.int8`` — v5e runs int8 matmuls at
    ~2x the bf16 MXU rate (tools/probe_int8.py). ``jnp.round`` has a
    zero gradient, so this path is for serving, not training. The
    reference has no quantized path (its eval loops were f32 bs=1,
    reference: vltk/abc/simple.py:576-682)."""

    features: int
    use_bias: bool = True
    dtype: Optional[jnp.dtype] = None
    kernel_init: Callable = nn.initializers.lecun_normal()
    bias_init: Callable = nn.initializers.zeros

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        kernel = self.param("kernel", self.kernel_init, (cin, self.features))
        out_dt = self.dtype or x.dtype
        w = kernel.astype(jnp.float32)
        s_w = jnp.maximum(jnp.max(jnp.abs(w), axis=0), 1e-8) / 127.0
        w_q = jnp.round(w / s_w).astype(jnp.int8)
        xf = x.astype(jnp.float32)
        obs_max = jnp.max(jnp.abs(xf))
        # NOT during init: init makes every collection mutable, and "quant"
        # must stay out of the init tree (param-layout parity with nn.Dense)
        calibrating = (
            self.is_mutable_collection("quant") and not self.is_initializing()
        )
        if calibrating or self.has_variable("quant", "act_max"):
            act_max = self.variable(
                "quant", "act_max", lambda: jnp.zeros((), jnp.float32)
            )
            if calibrating:
                # running max over calibration batches
                act_max.value = jnp.maximum(act_max.value, obs_max)
            s_x = jnp.maximum(act_max.value, 1e-8) / 127.0
        else:
            s_x = jnp.maximum(obs_max, 1e-8) / 127.0
        x_q = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        y = jax.lax.dot_general(
            x_q,
            w_q,
            dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = y.astype(jnp.float32) * (s_x * s_w)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias
        return y.astype(out_dt)


def calibrate_int8_variables(apply_fn, params, batches, **apply_kwargs):
    """Record static int8 activation scales (PTQ calibration), generically.

    Runs ``apply_fn`` (a flax ``Module.apply``) over ``batches`` — an
    iterable of positional-arg tuples — with the ``"quant"`` collection
    mutable, accumulating each :class:`Int8Conv`/:class:`Int8Dense`
    layer's running ``act_max``. Returns the ``quant`` tree to pass as
    ``apply_fn({"params": params, "quant": quant}, ...)``, which switches
    every int8 layer to its static fast path (the quantize fuses into the
    producer epilogue instead of re-reducing the input max per call).
    FRCNN keeps its own :func:`vltk_tpu.models.frcnn.calibrate_int8`
    (its scan axes need special handling); this generic helper serves the
    transformer serving models (LXMERT/LayoutLM/ViT)."""
    quant: dict = {}
    for batch in batches:
        variables = {"params": params}
        if quant:
            variables["quant"] = quant
        _, mutated = apply_fn(
            variables, *batch, mutable=["quant"], **apply_kwargs
        )
        quant = mutated["quant"]
    return quant


class ConvNorm(nn.Module):
    """Conv2d + optional frozen norm + optional activation
    (reference: frcnn.py:785-822 fused Conv2d)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    dilation: Tuple[int, int] = (1, 1)
    groups: int = 1
    use_bias: bool = False
    norm: bool = True
    activation: Optional[Callable] = None
    dtype: Optional[jnp.dtype] = None
    int8: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.int8:
            x = Int8Conv(
                features=self.features,
                kernel_size=self.kernel_size,
                strides=self.strides,
                padding=self.padding,
                dilation=self.dilation,
                groups=self.groups,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        else:
            x = nn.Conv(
                features=self.features,
                kernel_size=self.kernel_size,
                strides=self.strides,
                padding=[(p, p) for p in self.padding],
                kernel_dilation=self.dilation,
                feature_group_count=self.groups,
                use_bias=self.use_bias,
                dtype=self.dtype,
                name="conv",
            )(x)
        if self.norm:
            x = FrozenBatchNorm(self.features, name="norm")(x)
        if self.activation is not None:
            x = self.activation(x)
        return x


def caffe_maxpool(x: jnp.ndarray, window: int = 3, stride: int = 2) -> jnp.ndarray:
    """Caffe-style ceil-mode max pool, padding 0 (reference: frcnn.py:875-876
    ``F.max_pool2d(kernel_size=3, stride=2, padding=0, ceil_mode=True)``).

    Ceil mode is re-expressed as explicit right/bottom -inf padding computed
    from the static trace-time shape, then an ordinary VALID pool.
    """
    h, w = x.shape[1], x.shape[2]

    def pad_for(dim: int) -> int:
        out = math.ceil((dim - window) / stride) + 1
        return max((out - 1) * stride + window - dim, 0)

    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=((0, pad_for(h)), (0, pad_for(w))),
    )


def torch_maxpool(x: jnp.ndarray, window: int = 3, stride: int = 2, pad: int = 1) -> jnp.ndarray:
    """Standard floor-mode max pool with symmetric padding
    (reference: frcnn.py:877 non-caffe branch)."""
    return nn.max_pool(
        x,
        window_shape=(window, window),
        strides=(stride, stride),
        padding=((pad, pad), (pad, pad)),
    )


class StemConv(nn.Module):
    """The 7x7/2 stem conv with an exact space-to-depth fast path.

    A 3-channel conv occupies 3/128 MXU lanes — in-jit profiling on v5e
    put the plain stem at 21.5 ms of a 37 ms backbone (batch 8,
    832x1344). The classic TPU rewrite (MLPerf ResNet "conv0
    space-to-depth"): pad the 7x7 kernel to 8x8 (one zero row/col at the
    top/left), then both kernel and input reshape by 2x2 space-to-depth,
    turning the conv into a 4x4 stride-1 conv over 4C channels —
    identical arithmetic (out[y,x] = sum w7[i,j] x[2y+i-3, 2x+j-3] with
    i = 2a+p-1), 4x the lane utilization.

    The parameter keeps the canonical (7, 7, C, F) "kernel" shape so the
    torch checkpoint converter is untouched; the transform happens at
    apply time (XLA folds it). Falls back to the plain conv for odd
    spatial sizes.
    """

    features: int = 64
    use_s2d: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        import jax

        c = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (7, 7, c, self.features),
        )
        dt = self.dtype or x.dtype
        x = x.astype(dt)
        k = kernel.astype(dt)
        n, h, w, _ = x.shape
        if not self.use_s2d or h % 2 or w % 2:
            return jax.lax.conv_general_dilated(
                x, k, window_strides=(2, 2), padding=((3, 3), (3, 3)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        # kernel: zero row/col in front -> (8,8) -> (4,2,4,2,C,F) -> (4,4,4C,F)
        w8 = jnp.pad(k, ((1, 0), (1, 0), (0, 0), (0, 0)))
        k4 = (
            w8.reshape(4, 2, 4, 2, c, self.features)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, self.features)
        )
        # input: (N,H,W,C) -> (N,H/2,W/2,4C), channel order (p, q, c)
        xs = (
            x.reshape(n, h // 2, 2, w // 2, 2, c)
            .transpose(0, 1, 3, 2, 4, 5)
            .reshape(n, h // 2, w // 2, 4 * c)
        )
        return jax.lax.conv_general_dilated(
            xs, k4, window_strides=(1, 1), padding=((2, 1), (2, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )


class StemConvNorm(nn.Module):
    """StemConv + frozen norm + relu, with the same param paths as the
    ConvNorm it replaces (conv/kernel, norm/*) so checkpoint conversion is
    unchanged."""

    features: int = 64
    use_s2d: bool = True
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = StemConv(
            features=self.features, use_s2d=self.use_s2d, dtype=self.dtype,
            name="conv",
        )(x)
        x = FrozenBatchNorm(self.features, name="norm")(x)
        return nn.relu(x)
