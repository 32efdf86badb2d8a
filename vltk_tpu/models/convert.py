"""Torch FRCNN checkpoint -> JAX parameter pytree.

The reference ships/loads ``unc-nlp/frcnn-vg-finetuned`` through
``FRCNN.from_pretrained`` (reference: vltk/modeling/frcnn.py:1757-1922,
incl. the gamma/beta key rewrite at 1860-1872 and the detectron pkl loader
compat.py:97-108). This module is the inverse-direction counterpart of the
reference's JAX->torch ViT converter (reference: vltk/utils/base.py:191-261):
it maps the torch ``state_dict`` of the reference FRCNN module tree onto the
flax tree produced by :class:`vltk_tpu.models.FRCNN`.

Layout transforms:
  conv   weight (O, I, kH, kW) -> kernel (kH, kW, I, O)
  linear weight (O, I)         -> kernel (I, O)
  embed  weight (V, D)         -> embedding (V, D)
  batchnorm weight/bias/running_mean/running_var -> scale/bias/mean/var
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np

# torch module path prefix -> flax module path prefix
_PREFIX_MAP = {
    "backbone.": ("backbone",),
    "proposal_generator.rpn_head.": ("rpn_head",),
    "roi_heads.": ("roi_heads",),
}

_NORM_LEAF = {
    "weight": "scale",
    "gamma": "scale",
    "bias": "bias",
    "beta": "bias",
    "running_mean": "mean",
    "running_var": "var",
}


def _to_numpy(v: Any) -> np.ndarray:
    if hasattr(v, "detach"):  # torch tensor without importing torch
        v = v.detach().cpu().numpy()
    return np.asarray(v, dtype=np.float32)


def _set(tree: Dict, path, value) -> None:
    node = tree
    for key in path[:-1]:
        node = node.setdefault(key, {})
    node[path[-1]] = value


def torch_frcnn_to_jax(state_dict: Mapping[str, Any]) -> Dict:
    """Convert the reference FRCNN ``state_dict`` into flax ``params``.

    Unknown keys (anchor buffers, num_batches_tracked) are skipped. Returns
    a nested dict suitable for ``model.apply({"params": params}, ...)``.
    """
    params: Dict = {}
    for key, raw in state_dict.items():
        if "anchor_generator" in key or "num_batches_tracked" in key:
            continue
        for torch_prefix, flax_prefix in _PREFIX_MAP.items():
            if key.startswith(torch_prefix):
                rest = key[len(torch_prefix):].split(".")
                break
        else:
            continue

        value = _to_numpy(raw)
        *mods, leaf = rest

        if mods and mods[-1] == "norm":
            # frozen BN statistics/affine
            path = flax_prefix + tuple(mods) + (_NORM_LEAF[leaf],)
            _set(params, path, value)
            continue

        # ConvNorm layers wrap their nn.Conv in a child named "conv";
        # the RPN head's convs are plain nn.Conv leaves themselves
        conv_wrap = () if flax_prefix == ("rpn_head",) else ("conv",)

        if value.ndim == 4:  # conv weight OIHW -> HWIO
            path = flax_prefix + tuple(mods) + conv_wrap + ("kernel",)
            _set(params, path, np.transpose(value, (2, 3, 1, 0)))
        elif value.ndim == 2 and leaf == "weight":
            if mods and mods[-1] == "cls_embedding":
                path = flax_prefix + tuple(mods) + ("embedding",)
                _set(params, path, value)
            else:  # linear (O, I) -> (I, O)
                path = flax_prefix + tuple(mods) + ("kernel",)
                _set(params, path, value.T)
        elif leaf == "bias":
            _set(params, flax_prefix + tuple(mods) + ("bias",), value)
        else:
            _set(params, flax_prefix + tuple(mods) + (leaf,), value)
    return params
