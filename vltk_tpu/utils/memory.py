"""Device-memory resilience.

The reference's memory.py had a CUDA pair: nvidia-smi free-memory device
pick (reference: vltk/memory.py:24-45) and an OOM retry generator
(``handle_cuda_oom``, memory.py:9-21). On TPU, device *pick* is a mesh
declaration (parallel/mesh.py) — what remains useful is the retry ladder:
HBM OOM surfaces as RESOURCE_EXHAUSTED at compile/run time, and the
standard mitigations are a smaller batch or remat. ``handle_tpu_oom``
walks a list of fallback kwargs exactly like the reference generator did.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Iterable, Optional


def is_oom_error(exc: BaseException) -> bool:
    msg = str(exc)
    return "RESOURCE_EXHAUSTED" in msg or "Out of memory" in msg or (
        "Allocat" in msg and "bytes" in msg and "exceed" in msg.lower()
    )


def handle_tpu_oom(
    func: Callable,
    *args,
    alternatives: Iterable[Dict[str, Any]] = (),
    **kwargs,
):
    """Call ``func(*args, **kwargs)``; on HBM OOM retry with each
    alternative kwargs dict merged in (reference: memory.py:9-21 semantics).
    Re-raises the last OOM if every alternative fails; non-OOM errors
    propagate immediately."""
    attempts = [dict(kwargs)] + [dict(kwargs, **alt) for alt in alternatives]
    last: Optional[BaseException] = None
    for attempt in attempts:
        try:
            return func(*args, **attempt)
        except Exception as exc:  # noqa: BLE001 — filtered below
            if not is_oom_error(exc):
                raise
            last = exc
    raise last  # type: ignore[misc]


def device_memory_stats(device=None) -> Dict[str, int]:
    """Live/peak HBM bytes for a device (replaces nvidia-smi polling,
    reference: memory.py:24-45). Empty dict if the backend has no stats."""
    import jax

    dev = device or jax.devices()[0]
    try:
        stats = dev.memory_stats() or {}
    except Exception:
        return {}
    return {
        k: int(v)
        for k, v in stats.items()
        if isinstance(v, (int, float)) and "bytes" in k
    }
