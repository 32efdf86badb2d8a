"""Processing registry + image-pipeline builder.

Explicit-import registry over all processors (reference scanned the package
directory: vltk/processing/__init__.py:7-45). ``build_image_pipeline``
composes the host image transforms configured by a ``VisionConfig``
(reference: configs.py:131-152), injecting only the kwargs each transform's
signature declares.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Type

from vltk_tpu.inspection import collect_args_to_func
from vltk_tpu.processing import image as image_mod
from vltk_tpu.processing.processor import (
    LangProcessor,
    Processor,
    VisnLangProcessor,
    VisnProcessor,
)
from vltk_tpu.processing.visn import (
    AuxTokenize,
    OCRBox,
    OCRBoxFixed,
    PolygonProcessor,
    RLEProcessor,
    RemoveBox,
    TokenLabels,
    XYWHtoXYXY,
)
from vltk_tpu.processing.visnlang import Span


class _ProcessorRegistry:
    def __init__(self):
        self._classes: Dict[str, Type[Processor]] = {}

    def add(self, *classes: Type[Processor]) -> None:
        for cls in classes:
            self._classes[cls.name()] = cls

    def get(self, name: str) -> Type[Processor]:
        key = name.lower()
        if key not in self._classes:
            raise KeyError(
                f"unknown processor {name!r}; available: {sorted(self._classes)}"
            )
        return self._classes[key]

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._classes

    def avail(self) -> List[str]:
        return sorted(self._classes)


Processors = _ProcessorRegistry()
Processors.add(
    AuxTokenize,
    OCRBox,
    OCRBoxFixed,
    PolygonProcessor,
    RLEProcessor,
    RemoveBox,
    Span,
    TokenLabels,
    XYWHtoXYXY,
)


# ---------------------------------------------------------------------------
# image pipeline
# ---------------------------------------------------------------------------

_IMAGE_TRANSFORMS: Dict[str, Callable] = {
    "fromfile": image_mod.FromFile,
    "totensor": image_mod.ToTensor,
    "topilimage": image_mod.ToTensor,  # name parity; arrays stay arrays here
    "resize": image_mod.ResizeTensor,
    "resizetensor": image_mod.ResizeTensor,
    "normalize": image_mod.Normalize,
    "pad": image_mod.Pad,
    "grayscale": image_mod.GrayScale,
    "randfeats": image_mod.RandFeats,
}


def build_image_pipeline(config) -> Callable[[Any], Dict[str, Any]]:
    """VisionConfig -> composed callable filepath/entry -> processed entry.

    Each transform receives only the config fields its constructor declares
    (reference: configs.py:131-152 + inspection.get_args)."""
    cfg = config.to_dict() if hasattr(config, "to_dict") else dict(config)
    # fixed canvas derived from the resize spec unless explicitly given
    if "canvas" not in cfg or cfg.get("canvas") is None:
        cfg["canvas"] = image_mod.canvas_for(cfg.get("size", (800, 1333)))
    stages = []
    for name in cfg.get("transforms", ()):
        cls = _IMAGE_TRANSFORMS.get(str(name).lower())
        if cls is None:
            raise KeyError(
                f"unknown image transform {name!r}; "
                f"available: {sorted(_IMAGE_TRANSFORMS)}"
            )
        stages.append(cls(**collect_args_to_func(cls.__init__, cfg)))
    # the host pipeline must end on a fixed-shape canvas UNLESS the device
    # program owns resize/normalize/pad (device_fused) — padding before a
    # device-side shortest-edge resize would bake the pad into the content
    # and destroy raw-size bookkeeping (the batched FRCNN extractor pads on
    # device from the true raw sizes)
    if not any(isinstance(s, image_mod.Pad) for s in stages) and not cfg.get(
        "device_fused", False
    ):
        stages.append(image_mod.Pad(canvas=cfg["canvas"], pad_value=cfg.get("pad_value", 0.0)))

    def pipeline(entry):
        for stage in stages:
            entry = stage(entry)
        return entry

    pipeline.stages = stages
    return pipeline


__all__ = [
    "Processor",
    "Processors",
    "VisnProcessor",
    "LangProcessor",
    "VisnLangProcessor",
    "build_image_pipeline",
]
