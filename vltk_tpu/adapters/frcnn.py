"""FRCNN feature-extraction adapter — batched TPU pipeline.

Reference counterpart: vltk/adapters/frcnn.py (36-box / 2048-d VG features
for LXMERT-style models). Differences, by design:

* the reference ran one image per forward (reference: abc/extraction.py:142,
  adapters/frcnn.py:49-56); here the host decodes + pads a fixed-shape raw
  batch and a single jitted program does resize -> normalize -> backbone ->
  RPN -> RoI heads -> fixed-D detections for the whole batch;
* weights come from a *local* torch checkpoint (``checkpoint=`` path to the
  ``unc-nlp/frcnn-vg-finetuned`` state_dict) through
  vltk_tpu.models.convert.torch_frcnn_to_jax — there is no hub download in
  the core path (the reference's HF fetch lives in compat.py:140-320);
  without a checkpoint the model runs with random weights (pipeline/perf
  testing).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Tuple

import numpy as np

from vltk_tpu import vars as V
from vltk_tpu.adapters.extraction import VisnExtraction
from vltk_tpu.config import VisionConfig
from vltk_tpu.features import Features


def _resolve_config(preset, dtype, config_overrides):
    """Preset -> FRCNNConfig merge for setup(): the named preset (if any)
    supplies the base fields, an explicit ``dtype`` wins over it, and
    explicit config overrides win over both. Unknown override keys are
    dropped (setup()'s **kwargs carry extraction-driver knobs too)."""
    import dataclasses

    from vltk_tpu.models import FRCNNConfig

    fields = {f.name for f in dataclasses.fields(FRCNNConfig)}
    base = (
        dataclasses.asdict(FRCNNConfig.named_preset(preset)) if preset else {}
    )
    if dtype is not None:
        base["dtype"] = dtype
    base.update({k: v for k, v in config_overrides.items() if k in fields})
    return FRCNNConfig(**{k: v for k, v in base.items() if k in fields})


class FRCNN(VisnExtraction):
    """36-box ResNet-101-C4 VG feature extractor (TPU-native)."""

    _name = "frcnn"
    model_batch_size = 8
    # host side only decodes (as uint8 — the collate ships uint8 to the
    # device, so a float32 decode would round-trip for nothing);
    # resize/normalize are device-fused
    default_processor = VisionConfig(
        transforms=("fromfile",), device_fused=True, decode_dtype="uint8"
    )
    # static canvases: raw decode canvas and post-resize canvas. 1344 covers
    # both orientations of the 800/1333 shortest-edge target.
    raw_canvas: Tuple[int, int] = (1344, 1344)
    resized_canvas: Tuple[int, int] = (1344, 1344)
    # shortest-edge resize targets (reference: adapters/frcnn.py:17-18)
    short: float = 800.0
    maximum: float = 1333.0

    @classmethod
    def setup(
        cls,
        checkpoint: Optional[str] = None,
        batch_size: Optional[int] = None,
        dtype: Optional[str] = None,
        preset: Optional[str] = None,
        **config_overrides,
    ):
        """Build the jitted extraction program.

        Returns (bundle, model_config) where bundle carries the compiled
        step and parameters (reference: adapters/frcnn.py:26-33 setup).

        ``preset`` selects a named point on the extraction accuracy/speed
        Pareto (``FRCNNConfig.PRESETS`` — parity_300, props_*, int8_*,
        production; accuracy budget per preset: BASELINE.md /
        ``bench.py --preset-drift``); explicit ``dtype``/overrides win
        over the preset's fields. CLI:
        ``vltk extract frcnn <dataset> --preset=int8_200``.
        """
        import jax
        import jax.numpy as jnp

        from vltk_tpu.models import FRCNN as FRCNNModel
        from vltk_tpu.models import FRCNNConfig, torch_frcnn_to_jax
        from vltk_tpu.ops.image_ops import preprocess_batch

        cfg = _resolve_config(preset, dtype, config_overrides)
        model = FRCNNModel(cfg=cfg)
        canvas = cls.resized_canvas

        if checkpoint is not None:
            params = cls._load_checkpoint_params(checkpoint)
        else:
            params = model.init(
                jax.random.PRNGKey(0),
                jnp.zeros((1, *canvas, 3), jnp.float32),
                jnp.asarray([[float(canvas[0]), float(canvas[1])]]),
            )["params"]

        short, maximum = cls.short, cls.maximum

        @jax.jit
        def step(variables, raw_images, raw_sizes):
            pre = preprocess_batch(
                raw_images, raw_sizes, canvas_hw=canvas, short=short, maximum=maximum
            )
            out = model.apply(
                variables,
                pre["img"],
                pre["sizes"],
                scales_yx=pre["scales_yx"],
            )
            # pack everything the writer needs into ONE f32 buffer: each
            # separate device->host fetch pays the transport's fixed cost
            # (~0.5 s on the dev tunnel, nontrivial on any link), so one
            # (B, D, 2048+4+1+1) transfer replaces four
            packed = jnp.concatenate(
                [
                    out["roi_features"].astype(jnp.float32),
                    out["boxes"].astype(jnp.float32),
                    out["obj_ids"].astype(jnp.float32)[..., None],
                    out["attr_ids"].astype(jnp.float32)[..., None],
                ],
                axis=-1,
            )
            return packed

        @jax.jit
        def pre_fn(raw_images, raw_sizes):
            return preprocess_batch(
                raw_images, raw_sizes, canvas_hw=canvas, short=short, maximum=maximum
            )

        # "variables" is what step applies; int8 runs lazily calibrate
        # static activation scales from the FIRST data batch
        # (forward_dispatch) and add them here as the "quant" collection
        bundle = {
            "step": step,
            "params": params,
            "cfg": cfg,
            "variables": {"params": params},
            "pre_fn": pre_fn,
        }
        model_config = {
            "model": "frcnn-resnet101-c4-vg",
            "checkpoint": checkpoint,
            "max_detections": cfg.max_detections,
            "visual_dim": cfg.res2_out_channels * 8,
            "dtype": cfg.dtype or "float32",
            "preset": preset,
        }
        return bundle, model_config

    @staticmethod
    def _load_checkpoint_params(path: str):
        import torch

        sd = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(sd, dict) and "model" in sd and not hasattr(sd["model"], "shape"):
            sd = sd["model"]
        from vltk_tpu.models import torch_frcnn_to_jax

        return torch_frcnn_to_jax(sd)

    @staticmethod
    def schema(max_detections: int = 36, visual_dim: int = 2048):
        # reference: adapters/frcnn.py:35-41
        return {
            "attr_ids": Features.Ids(),
            "object_ids": Features.Ids(),
            V.features: Features.FeaturesMatrix(max_detections, visual_dim),
            V.boxes: Features.Boxtensor(max_detections),
            # raw (h, w): boxes are stored in raw-pixel coords (the
            # reference fixture convention) — consumers need the extent
            # to normalize positions for LXMERT-style heads
            V.rawsize: Features.IntList(),
        }

    @classmethod
    def collate(cls, entries: List[Dict[str, Any]]) -> Dict[str, Any]:
        """Pad decoded raw images to the static raw canvas and stack —
        as uint8: decoded pixels are integral, the device preprocess casts
        to f32 anyway, and the host->device transfer (the feed's bandwidth
        bill, ~22 MB/image at the f32 raw canvas) shrinks 4x."""
        ch, cw = cls.raw_canvas
        n = len(entries)
        images = np.zeros((n, ch, cw, 3), np.uint8)
        raw_sizes = np.zeros((n, 2), np.int32)
        imgids = []
        for i, e in enumerate(entries):
            img = e[V.img]
            h, w = img.shape[0], img.shape[1]
            if h > ch or w > cw:  # oversized raw: host pre-shrink
                from PIL import Image

                scale = min(ch / h, cw / w)
                nh, nw = int(h * scale), int(w * scale)
                img = np.asarray(
                    Image.fromarray(img.astype(np.uint8)).resize((nw, nh)),
                    np.float32,
                )
                h, w = nh, nw
            if img.dtype == np.uint8:
                # decode-only pipeline: straight copy into the canvas
                images[i, :h, :w] = img
            else:
                # round+clip before the uint8 cast: a host-side Resize
                # emits interpolated floats that a bare cast would
                # truncate/wrap
                images[i, :h, :w] = np.clip(np.rint(img), 0, 255).astype(
                    np.uint8
                )
            raw_sizes[i] = (h, w)
            imgids.append(e[V.imgid])
        return {V.img: images, V.rawsize: raw_sizes, V.imgid: imgids}

    @classmethod
    def forward_dispatch(cls, model, batch: Mapping[str, Any], **kwargs):
        """Enqueue the device step; no host sync — the driver overlaps the
        fetch of the previous batch with this one's compute."""
        variables = model["variables"]
        cfg = model["cfg"]
        if cfg.int8 and "quant" not in variables:
            # one-time static-PTQ calibration on (up to 4 images of) the
            # first real batch: dynamic per-input scales measured
            # throughput-NEUTRAL (BASELINE.md), so int8 always ships with
            # calibrated scales
            from vltk_tpu.models import calibrate_int8

            pre = model["pre_fn"](batch[V.img][:4], batch[V.rawsize][:4])
            variables["quant"] = calibrate_int8(
                cfg,
                variables["params"],
                [(pre["img"], pre["sizes"], pre["scales_yx"])],
            )
        packed = model["step"](variables, batch[V.img], batch[V.rawsize])
        return (packed, list(batch[V.imgid]), np.asarray(batch[V.rawsize]))

    @classmethod
    def forward_collect(cls, model, state) -> List[Dict[str, Any]]:
        packed, imgids, raw_sizes = state
        packed = np.asarray(packed)  # the ONE device->host fetch
        dim = packed.shape[-1] - 6
        feats = packed[..., :dim]
        boxes = packed[..., dim : dim + 4]
        obj_ids = packed[..., dim + 4].astype(np.int64)
        attr_ids = packed[..., dim + 5].astype(np.int64)
        entries = []
        for i, imgid in enumerate(imgids):
            entries.append(
                {
                    V.imgid: imgid,
                    "object_ids": obj_ids[i].tolist(),
                    "attr_ids": attr_ids[i].tolist(),
                    V.features: feats[i],
                    # boxes already rescaled to raw coords by scales_yx;
                    # round like the reference (adapters/frcnn.py:58)
                    V.boxes: np.round(boxes[i]).tolist(),
                    V.rawsize: [int(x) for x in raw_sizes[i]],
                }
            )
        return entries

    @classmethod
    def forward(cls, model, batch: Mapping[str, Any], **kwargs):
        return cls.forward_collect(
            model, cls.forward_dispatch(model, batch, **kwargs)
        )
