"""The "data" experiment: iterate the loaders and print batch keys/shapes
(reference: vltk/experiments/example.py:6-27 — the ``vltk data <ds>``
smoke entry)."""

from __future__ import annotations

from typing import Any, Dict


class DataExperiment:
    """Not a train loop — walks one batch per loader and reports shapes."""

    name = "data"

    def __init__(self, config, loaders=None, mesh=None, rules=None):
        self.config = config
        if loaders is None:
            from vltk_tpu.data.builder import init_datasets

            loaders = init_datasets(config)
        self.train_loader, self.eval_loader = loaders

    def __call__(self) -> Dict[str, Any]:
        report: Dict[str, Any] = {}
        for tag, loader in (("train", self.train_loader), ("eval", self.eval_loader)):
            if loader is None:
                continue
            batch = next(iter(loader))
            shapes = {
                k: getattr(v, "shape", type(v).__name__) for k, v in batch.items()
            }
            report[tag] = shapes
            print(f"[{tag}]")
            for k, s in shapes.items():
                print(f"  {k}: {s}")
        return report
