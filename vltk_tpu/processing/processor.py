"""Processor ABC: per-entry modality transforms.

Re-design of reference vltk/abc/processor.py. A processor declares the entry
``keys`` it needs; ``__call__`` checks presence, filters kwargs to the
subclass ``forward`` signature, and asserts array outputs stay arrays
(reference: abc/processor.py:29-50). The three marker subclasses tag which
stage of the loader runs them (reference: 53-69).

All array work is numpy host-side; processors that want device compute
return jax arrays (the loader ships them as-is).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence


from vltk_tpu.inspection import collect_args_to_func


class Processor:
    _type = "processor"
    keys: Sequence[str] = ()

    def __init__(self, **kwargs):
        cfg = collect_args_to_func(self.setup, kwargs) if hasattr(self, "setup") else {}
        if hasattr(self, "setup"):
            self.setup(**cfg)
        self._kwargs = kwargs

    @classmethod
    def name(cls) -> str:
        return getattr(cls, "_name", None) or cls.__name__.lower()

    def __call__(self, entry: Dict[str, Any], **kwargs) -> Dict[str, Any]:
        for key in self.keys:
            if key not in entry:
                return entry  # contract: skip silently when inputs absent
        merged = dict(self._kwargs)
        merged.update(kwargs)
        out = self.forward(entry, **collect_args_to_func(self.forward, merged))
        assert isinstance(out, dict), (
            f"{type(self).__name__}.forward must return the entry dict"
        )
        return out

    def forward(self, entry: Dict[str, Any], **kwargs) -> Dict[str, Any]:
        raise NotImplementedError


class VisnProcessor(Processor):
    _type = "visn"


class LangProcessor(Processor):
    _type = "lang"


class VisnLangProcessor(Processor):
    _type = "visnlang"
