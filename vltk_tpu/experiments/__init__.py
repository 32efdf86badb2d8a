"""Experiment registry + concrete experiments.

The reference registered experiments by name for the CLI (``vltk simple
<exp>`` — reference: vltk/future/cli.py:83-101, experiments/example.py:6-27
defines ``Data`` with name="data"). Explicit-import registry here, like
Adapters/Processors.
"""

from __future__ import annotations

from typing import Dict, List, Type

from vltk_tpu.experiments.data import DataExperiment
from vltk_tpu.experiments.frcnn_detect import FRCNNDetectExperiment
from vltk_tpu.experiments.lxmert_pretrain import LxmertPretrainExperiment
from vltk_tpu.experiments.lxmert_vqa import LxmertVQAExperiment
from vltk_tpu.experiments.docvqa_span import DocVQASpanExperiment
from vltk_tpu.experiments.ocr_tokens import OCRTokenExperiment


class _ExperimentRegistry:
    def __init__(self):
        self._classes: Dict[str, type] = {}

    def add(self, *classes: type) -> None:
        for cls in classes:
            self._classes[cls.name.lower()] = cls

    def get(self, name: str) -> type:
        key = name.lower()
        if key not in self._classes:
            raise KeyError(f"unknown experiment {name!r}; available: {self.avail()}")
        return self._classes[key]

    def avail(self) -> List[str]:
        return sorted(self._classes)


Experiments = _ExperimentRegistry()
Experiments.add(
    DataExperiment,
    DocVQASpanExperiment,
    FRCNNDetectExperiment,
    LxmertVQAExperiment,
    LxmertPretrainExperiment,
    OCRTokenExperiment,
)
