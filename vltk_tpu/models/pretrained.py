"""Checkpoint resolution + loading (`from_pretrained`).

Rebuilds the reference's compat layer (reference: vltk/compat.py —
``cached_path/get_from_cache/hf_bucket_url`` plumbing at ~140-320, the
detectron pkl loader ``load_checkpoint`` at 97-108, and
``FRCNN.from_pretrained``'s archive resolution + gamma/beta rewrite,
vltk/modeling/frcnn.py:1757-1922) on today's stack:

  * local file / local dir (picks the first known weight filename)
  * HF hub id — resolved through ``huggingface_hub`` when the environment
    has network access; otherwise a clear error
  * torch zip/pickle checkpoints (``.bin/.pt/.pth``, loaded CPU,
    weights-only) and detectron ``.pkl`` pickles
  * gamma/beta -> weight/bias key rewrite (frcnn.py:1860-1872)
  * conversion into flax params for the named architecture
"""

from __future__ import annotations

import os
import pickle
from typing import Any, Dict, Mapping, Optional

import numpy as np

_WEIGHT_NAMES = (
    "pytorch_model.bin",
    "model.pt",
    "model.pth",
    "model.pkl",
    "weights.pkl",
)


def resolve_checkpoint(name_or_path: str, cache_dir: Optional[str] = None) -> str:
    """-> local file path. Accepts a file, a directory containing a known
    weight file, or a HF hub repo id (network required for the last)."""
    if os.path.isfile(name_or_path):
        return name_or_path
    if os.path.isdir(name_or_path):
        for fname in _WEIGHT_NAMES:
            cand = os.path.join(name_or_path, fname)
            if os.path.isfile(cand):
                return cand
        raise FileNotFoundError(
            f"no known weight file in {name_or_path!r} (looked for {_WEIGHT_NAMES})"
        )
    # hub id — needs network; keep the import local so offline use never pays
    try:
        from huggingface_hub import hf_hub_download
    except ImportError as exc:
        raise FileNotFoundError(
            f"{name_or_path!r} is not a local file/dir and huggingface_hub "
            "is unavailable"
        ) from exc
    last_exc: Optional[Exception] = None
    for fname in _WEIGHT_NAMES:
        try:
            return hf_hub_download(name_or_path, fname, cache_dir=cache_dir)
        except Exception as exc:  # noqa: BLE001 — try the next filename
            last_exc = exc
    raise FileNotFoundError(
        f"could not resolve {name_or_path!r} from the hub"
    ) from last_exc


def _rewrite_gamma_beta(state_dict: Mapping[str, Any]) -> Dict[str, Any]:
    """gamma/beta -> weight/bias (reference: frcnn.py:1860-1872)."""
    out = {}
    for key, value in state_dict.items():
        new = key
        if "gamma" in new:
            new = new.replace("gamma", "weight")
        if "beta" in new:
            new = new.replace("beta", "bias")
        out[new] = value
    return out


def load_state_dict(path: str) -> Dict[str, Any]:
    """Load a torch or detectron-pkl checkpoint into a flat numpy dict."""
    if path.endswith(".pkl"):
        # detectron pickle: {"model": {name: ndarray}} (compat.py:97-108)
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        model = data.get("model", data)
        sd = {
            k: np.asarray(v)
            for k, v in model.items()
            if isinstance(v, np.ndarray) or np.isscalar(v)
        }
    else:
        import torch

        data = torch.load(path, map_location="cpu", weights_only=True)
        if isinstance(data, dict) and "state_dict" in data:
            data = data["state_dict"]
        sd = {k: v.numpy() if hasattr(v, "numpy") else np.asarray(v)
              for k, v in data.items()}
    return _rewrite_gamma_beta(sd)


def from_pretrained(
    arch: str,
    name_or_path: str,
    cache_dir: Optional[str] = None,
) -> Dict:
    """Resolve + load + convert a checkpoint to flax params.

    ``arch``: "frcnn" (the reference's ``unc-nlp/frcnn-vg-finetuned``),
    "lxmert" (HF LXMERT family), "layoutlm" (``microsoft/layoutlm-base``),
    "visualbert" (``uclanlp/visualbert-*``), or "vit" (HF ViTModel).
    """
    path = resolve_checkpoint(name_or_path, cache_dir)
    state_dict = load_state_dict(path)
    converters = {
        "frcnn": "torch_frcnn_to_jax",
        "lxmert": "torch_lxmert_to_jax",
        "layoutlm": "torch_layoutlm_to_jax",
        "visualbert": "torch_visualbert_to_jax",
        "vit": "torch_vit_to_jax",
    }
    if arch not in converters:
        raise ValueError(
            f"unknown arch {arch!r}; expected one of {sorted(converters)}"
        )
    import vltk_tpu.models.convert as convert

    return getattr(convert, converters[arch])(state_dict)
