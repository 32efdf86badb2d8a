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


def torch_lxmert_to_jax(state_dict: Mapping[str, Any]) -> Dict:
    """Convert a HuggingFace ``transformers`` LXMERT ``state_dict``
    (LxmertModel / LxmertForPreTraining / LxmertForQuestionAnswering) into
    the flax ``params`` tree of :class:`vltk_tpu.models.lxmert` models.

    The MLM decoder is weight-tied to the word embeddings in HF
    (``cls.predictions.decoder.weight``); we materialize the tie as an
    untied kernel here.
    """
    import re

    params: Dict = {}

    def put(path: str, value: np.ndarray) -> None:
        _set(params, tuple(path.split("/")), value)

    def linear(flax_path: str, torch_prefix: str) -> None:
        w = state_dict.get(torch_prefix + ".weight")
        if w is None:
            return
        put(flax_path + "/kernel", _to_numpy(w).T)
        b = state_dict.get(torch_prefix + ".bias")
        if b is not None:
            put(flax_path + "/bias", _to_numpy(b))

    def ln(flax_path: str, torch_prefix: str) -> None:
        w = state_dict.get(torch_prefix + ".weight")
        if w is None:
            return
        put(flax_path + "/scale", _to_numpy(w))
        put(flax_path + "/bias", _to_numpy(state_dict[torch_prefix + ".bias"]))

    def att(flax_path: str, self_prefix: str, out_prefix: str) -> None:
        for leaf in ("query", "key", "value"):
            linear(f"{flax_path}/{leaf}", f"{self_prefix}.{leaf}")
        linear(f"{flax_path}/att_out", f"{out_prefix}.dense")
        ln(f"{flax_path}/ln", f"{out_prefix}.LayerNorm")

    def ffn(flax_path: str, inter_prefix: str, out_prefix: str) -> None:
        linear(f"{flax_path}/intermediate", f"{inter_prefix}.dense")
        linear(f"{flax_path}/mlp_out", f"{out_prefix}.dense")
        ln(f"{flax_path}/ln", f"{out_prefix}.LayerNorm")

    # a bare LxmertModel state_dict has no "lxmert." prefix
    root = "lxmert." if any(k.startswith("lxmert.") for k in state_dict) else ""
    enc_root = "lxmert" if root else ""

    def epath(sub: str) -> str:
        return f"{enc_root}/{sub}" if enc_root else sub

    # embeddings
    for name in ("word_embeddings", "position_embeddings", "token_type_embeddings"):
        key = f"{root}embeddings.{name}.weight"
        if key in state_dict:
            put(epath(f"embeddings/{name}/embedding"), _to_numpy(state_dict[key]))
    ln(epath("embeddings/ln"), f"{root}embeddings.LayerNorm")

    # visual feature encoder
    linear(epath("visn_fc/visn_fc"), f"{root}encoder.visn_fc.visn_fc")
    ln(epath("visn_fc/visn_ln"), f"{root}encoder.visn_fc.visn_layer_norm")
    linear(epath("visn_fc/box_fc"), f"{root}encoder.visn_fc.box_fc")
    ln(epath("visn_fc/box_ln"), f"{root}encoder.visn_fc.box_layer_norm")

    # single-modality layers
    indices = set()
    for key in state_dict:
        m = re.search(r"encoder\.(layer|r_layers|x_layers)\.(\d+)\.", key)
        if m:
            indices.add((m.group(1), int(m.group(2))))
    for kind, i in sorted(indices):
        if kind == "layer":
            base, flax = f"{root}encoder.layer.{i}", epath(f"layer_{i}")
        elif kind == "r_layers":
            base, flax = f"{root}encoder.r_layers.{i}", epath(f"r_layer_{i}")
        else:
            base, flax = f"{root}encoder.x_layers.{i}", epath(f"x_layer_{i}")
            att(f"{flax}/cross_att", f"{base}.visual_attention.att",
                f"{base}.visual_attention.output")
            att(f"{flax}/lang_self_att", f"{base}.lang_self_att.self",
                f"{base}.lang_self_att.output")
            att(f"{flax}/visn_self_att", f"{base}.visn_self_att.self",
                f"{base}.visn_self_att.output")
            ffn(f"{flax}/lang_ffn", f"{base}.lang_inter", f"{base}.lang_output")
            ffn(f"{flax}/visn_ffn", f"{base}.visn_inter", f"{base}.visn_output")
            continue
        att(f"{flax}/att", f"{base}.attention.self", f"{base}.attention.output")
        ffn(f"{flax}/ffn", f"{base}.intermediate", f"{base}.output")

    linear(epath("pooler/dense"), f"{root}pooler.dense")

    # pretraining / finetune heads (present only on head-bearing models)
    linear("mlm_head/transform", "cls.predictions.transform.dense")
    ln("mlm_head/ln", "cls.predictions.transform.LayerNorm")
    if "cls.predictions.decoder.weight" in state_dict:
        put("mlm_head/decoder/kernel",
            _to_numpy(state_dict["cls.predictions.decoder.weight"]).T)
        put("mlm_head/decoder/bias", _to_numpy(state_dict["cls.predictions.bias"]))
    linear("matched_head", "cls.seq_relationship")
    linear("visual_head/transform", "obj_predict_head.transform.dense")
    ln("visual_head/ln", "obj_predict_head.transform.LayerNorm")
    for leaf in ("obj", "attr", "feat"):
        linear(f"visual_head/{leaf}", f"obj_predict_head.decoder_dict.{leaf}")
    linear("answer_head/fc", "answer_head.logit_fc.0")
    ln("answer_head/ln", "answer_head.logit_fc.2")
    linear("answer_head/logit", "answer_head.logit_fc.3")
    return params


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
