"""Adapter registry.

Explicit-import registry (the reference scanned directories and silently
swallowed import errors — reference: vltk/adapters/__init__.py:13-53,
inspection.py:80-83). ``Adapters.add`` registers user classes at runtime.
"""

from __future__ import annotations

from typing import Dict, List, Type

from vltk_tpu.adapters.base import Adapter
from vltk_tpu.adapters.extraction import VisnExtraction
from vltk_tpu.adapters.visn import VisnDataset
from vltk_tpu.adapters.visnlang import VisnLangDataset

from vltk_tpu.adapters.clevr import CLEVR
from vltk_tpu.adapters.clevrref import CLEVRREF
from vltk_tpu.adapters.coco2014 import Coco2014
from vltk_tpu.adapters.cococaptions import COCOCaptions
from vltk_tpu.adapters.docvqa import DocVQA, DocVQAVisn
from vltk_tpu.adapters.funsd import FUNSD
from vltk_tpu.adapters.gqa import GQA
from vltk_tpu.adapters.vgqa import VGQA
from vltk_tpu.adapters.visualgenome import VisualGenome
from vltk_tpu.adapters.vqa import VQA


class _AdapterRegistry:
    """Name -> adapter class registry with kind predicates
    (reference: vltk/adapters/__init__.py:13-53)."""

    def __init__(self):
        self._classes: Dict[str, Type[Adapter]] = {}

    def add(self, *classes: Type[Adapter]) -> None:
        for cls in classes:
            self._classes[cls.name()] = cls

    def get(self, name: str) -> Type[Adapter]:
        key = name.lower()
        if key not in self._classes and key == "frcnn":
            register_frcnn()  # lazy: pulls in the jax model stack
        if key not in self._classes:
            raise KeyError(
                f"unknown adapter {name!r}; available: {self.avail()}"
            )
        return self._classes[key]

    def __contains__(self, name: str) -> bool:
        return name.lower() in self._classes

    def avail(self) -> List[str]:
        return sorted(self._classes)

    def is_visnlang(self, name: str) -> bool:
        return issubclass(self.get(name), VisnLangDataset)

    def is_extraction(self, name: str) -> bool:
        return issubclass(self.get(name), VisnExtraction)

    def is_visn(self, name: str) -> bool:
        cls = self.get(name)
        return issubclass(cls, VisnDataset) and not issubclass(cls, VisnExtraction)


Adapters = _AdapterRegistry()
Adapters.add(
    CLEVR,
    CLEVRREF,
    Coco2014,
    COCOCaptions,
    DocVQA,
    DocVQAVisn,
    FUNSD,
    GQA,
    VGQA,
    VisualGenome,
    VQA,
)


def register_frcnn():
    """FRCNN extraction adapter registers lazily (it pulls in the model
    stack); importing vltk_tpu.adapters.frcnn triggers this."""
    from vltk_tpu.adapters.frcnn import FRCNN  # noqa: F401

    Adapters.add(FRCNN)
    return FRCNN


__all__ = [
    "Adapter",
    "Adapters",
    "VisnDataset",
    "VisnLangDataset",
    "VisnExtraction",
    "CLEVR",
    "CLEVRREF",
    "Coco2014",
    "COCOCaptions",
    "DocVQA",
    "DocVQAVisn",
    "FUNSD",
    "GQA",
    "VGQA",
    "VisualGenome",
    "VQA",
    "register_frcnn",
]
