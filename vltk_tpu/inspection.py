"""Introspection helpers powering the explicit class registries.

The reference auto-discovered classes by scanning directories
(reference: vltk/inspection.py:29-84) which silently swallowed import errors
(inspection.py:80-83). Here registries are explicit-import (see
adapters/__init__.py, processing/__init__.py) and this module only keeps the
genuinely useful piece: signature-filtered kwarg passing, which lets user
``schema()/forward()`` functions receive exactly the kwargs they declare
(reference: vltk/inspection.py:99-117; used at abc/extraction.py:89,198).
"""

from __future__ import annotations

import inspect
from typing import Any, Callable, Dict, Mapping


def get_func_signature(func: Callable) -> inspect.Signature:
    return inspect.signature(func)


def collect_args_to_func(
    func: Callable, kwargs: Mapping[str, Any], mandatory: bool = False
) -> Dict[str, Any]:
    """Filter ``kwargs`` down to the parameters ``func`` declares.

    If ``func`` accepts **kwargs, everything passes through. If ``mandatory``,
    raise when a declared parameter without default is missing.
    """
    sig = inspect.signature(func)
    params = sig.parameters
    accepts_var_kw = any(
        p.kind is inspect.Parameter.VAR_KEYWORD for p in params.values()
    )
    if accepts_var_kw:
        return dict(kwargs)
    out: Dict[str, Any] = {}
    for name, param in params.items():
        if name in ("self", "cls"):
            continue
        if param.kind in (
            inspect.Parameter.VAR_POSITIONAL,
            inspect.Parameter.VAR_KEYWORD,
        ):
            continue
        if name in kwargs:
            out[name] = kwargs[name]
        elif mandatory and param.default is inspect.Parameter.empty:
            raise ValueError(
                f"{func.__qualname__} requires argument {name!r} but it was "
                f"not provided; available: {sorted(kwargs)}"
            )
    return out


def apply_args_to_func(func: Callable, kwargs: Mapping[str, Any], **extra):
    """Call ``func`` with the subset of kwargs it accepts."""
    merged = dict(kwargs)
    merged.update(extra)
    return func(**collect_args_to_func(func, merged))


def is_classmethod_or_static(cls: type, name: str) -> bool:
    attr = inspect.getattr_static(cls, name, None)
    return isinstance(attr, (classmethod, staticmethod))
