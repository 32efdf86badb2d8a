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


def _lxmert_pairs(keys, root: str):
    """(kind, flax_path, torch_prefix) correspondence table driving both
    conversion directions. ``kind`` in {linear, ln, embed}."""
    import re

    enc_root = "lxmert" if root else ""

    def epath(sub: str) -> str:
        return f"{enc_root}/{sub}" if enc_root else sub

    pairs = []
    for name in ("word_embeddings", "position_embeddings", "token_type_embeddings"):
        pairs.append(("embed", epath(f"embeddings/{name}"), f"{root}embeddings.{name}"))
    pairs.append(("ln", epath("embeddings/ln"), f"{root}embeddings.LayerNorm"))

    pairs += [
        ("linear", epath("visn_fc/visn_fc"), f"{root}encoder.visn_fc.visn_fc"),
        ("ln", epath("visn_fc/visn_ln"), f"{root}encoder.visn_fc.visn_layer_norm"),
        ("linear", epath("visn_fc/box_fc"), f"{root}encoder.visn_fc.box_fc"),
        ("ln", epath("visn_fc/box_ln"), f"{root}encoder.visn_fc.box_layer_norm"),
    ]

    def att(flax_path, self_prefix, out_prefix):
        for leaf in ("query", "key", "value"):
            pairs.append(("linear", f"{flax_path}/{leaf}", f"{self_prefix}.{leaf}"))
        pairs.append(("linear", f"{flax_path}/att_out", f"{out_prefix}.dense"))
        pairs.append(("ln", f"{flax_path}/ln", f"{out_prefix}.LayerNorm"))

    def ffn(flax_path, inter_prefix, out_prefix):
        pairs.append(("linear", f"{flax_path}/intermediate", f"{inter_prefix}.dense"))
        pairs.append(("linear", f"{flax_path}/mlp_out", f"{out_prefix}.dense"))
        pairs.append(("ln", f"{flax_path}/ln", f"{out_prefix}.LayerNorm"))

    indices = set()
    for key in keys:
        # torch: encoder.layer.0. / encoder.r_layers.0. — flax: layer_0/ /
        # r_layer_0/ (singular). Normalize to the torch plural kind names.
        m = re.search(r"(layer|r_layers?|x_layers?)[._](\d+)[._/]", key)
        if m:
            kind = m.group(1)
            if kind.startswith("r_"):
                kind = "r_layers"
            elif kind.startswith("x_"):
                kind = "x_layers"
            else:
                kind = "layer"
            indices.add((kind, int(m.group(2))))
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

    pairs.append(("linear", epath("pooler/dense"), f"{root}pooler.dense"))

    # heads (present only on head-bearing models — skipped when absent)
    pairs += [
        ("linear", "mlm_head/transform", "cls.predictions.transform.dense"),
        ("ln", "mlm_head/ln", "cls.predictions.transform.LayerNorm"),
        ("linear", "matched_head", "cls.seq_relationship"),
        ("linear", "visual_head/transform", "obj_predict_head.transform.dense"),
        ("ln", "visual_head/ln", "obj_predict_head.transform.LayerNorm"),
        ("linear", "visual_head/obj", "obj_predict_head.decoder_dict.obj"),
        ("linear", "visual_head/attr", "obj_predict_head.decoder_dict.attr"),
        ("linear", "visual_head/feat", "obj_predict_head.decoder_dict.feat"),
        ("linear", "answer_head/fc", "answer_head.logit_fc.0"),
        ("ln", "answer_head/ln", "answer_head.logit_fc.2"),
        ("linear", "answer_head/logit", "answer_head.logit_fc.3"),
    ]
    return pairs


def torch_lxmert_to_jax(state_dict: Mapping[str, Any]) -> Dict:
    """Convert a HuggingFace ``transformers`` LXMERT ``state_dict``
    (LxmertModel / LxmertForPreTraining / LxmertForQuestionAnswering) into
    the flax ``params`` tree of :class:`vltk_tpu.models.lxmert` models.

    The MLM decoder is weight-tied to the word embeddings in HF
    (``cls.predictions.decoder.weight``); we materialize the tie as an
    untied kernel here.
    """
    params: Dict = {}

    def put(path: str, value: np.ndarray) -> None:
        _set(params, tuple(path.split("/")), value)

    root = "lxmert." if any(k.startswith("lxmert.") for k in state_dict) else ""
    for kind, flax_path, torch_prefix in _lxmert_pairs(state_dict.keys(), root):
        w = state_dict.get(torch_prefix + ".weight")
        if w is None:
            continue
        w = _to_numpy(w)
        if kind == "embed":
            put(flax_path + "/embedding", w)
            continue
        if kind == "ln":
            put(flax_path + "/scale", w)
            put(flax_path + "/bias", _to_numpy(state_dict[torch_prefix + ".bias"]))
            continue
        put(flax_path + "/kernel", w.T)
        b = state_dict.get(torch_prefix + ".bias")
        if b is not None:
            put(flax_path + "/bias", _to_numpy(b))

    # MLM decoder: weight tied to word embeddings, bias lives at cls level
    if "cls.predictions.decoder.weight" in state_dict:
        put("mlm_head/decoder/kernel",
            _to_numpy(state_dict["cls.predictions.decoder.weight"]).T)
        put("mlm_head/decoder/bias", _to_numpy(state_dict["cls.predictions.bias"]))
    return params


def jax_lxmert_to_torch(params: Mapping[str, Any], prefixed: bool = True) -> Dict:
    """Export flax LXMERT params as an HF-named ``state_dict`` of numpy
    arrays — the reverse direction the reference only had for ViT
    (reference: vltk/utils/base.py:191-261, legacy/vit_ckp_convert.py).
    Pass the result through ``torch.tensor`` per-value to load into an HF
    module (``prefixed=False`` for a bare LxmertModel)."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params, sep="/")
    root = "lxmert." if prefixed else ""
    out: Dict[str, np.ndarray] = {}
    for kind, flax_path, torch_prefix in _lxmert_pairs(flat.keys(), root):
        if kind == "embed":
            w = flat.get(flax_path + "/embedding")
            if w is not None:
                out[torch_prefix + ".weight"] = np.asarray(w)
            continue
        if kind == "ln":
            s = flat.get(flax_path + "/scale")
            if s is not None:
                out[torch_prefix + ".weight"] = np.asarray(s)
                out[torch_prefix + ".bias"] = np.asarray(flat[flax_path + "/bias"])
            continue
        k = flat.get(flax_path + "/kernel")
        if k is not None:
            out[torch_prefix + ".weight"] = np.asarray(k).T
            b = flat.get(flax_path + "/bias")
            if b is not None:
                out[torch_prefix + ".bias"] = np.asarray(b)

    if "mlm_head/decoder/kernel" in flat:
        out["cls.predictions.decoder.weight"] = np.asarray(
            flat["mlm_head/decoder/kernel"]
        ).T
        out["cls.predictions.bias"] = np.asarray(flat["mlm_head/decoder/bias"])
    return out


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


def torch_layoutlm_to_jax(state_dict: Mapping[str, Any]) -> Dict:
    """HF ``transformers`` LayoutLM state_dict (LayoutLMModel or a headed
    variant with the ``layoutlm.`` prefix) -> flax params for
    :class:`vltk_tpu.models.layoutlm.LayoutLM` (the bare encoder; the
    pooler and task heads are not part of the flax module and are skipped).
    Embedding tables map 1:1 (shared x/y + h/w coordinate scheme,
    microsoft/layoutlm-base); encoder layers are BERT-shaped."""
    import re

    params: Dict = {}

    def put(path: str, value: np.ndarray) -> None:
        _set(params, tuple(path.split("/")), value)

    root = (
        "layoutlm." if any(k.startswith("layoutlm.") for k in state_dict) else ""
    )
    for name in _LAYOUTLM_EMB_TABLES:
        w = state_dict.get(f"{root}embeddings.{name}.weight")
        if w is not None:
            put(f"embeddings/{name}/embedding", _to_numpy(w))
    put(
        "embeddings/ln/scale",
        _to_numpy(state_dict[f"{root}embeddings.LayerNorm.weight"]),
    )
    put(
        "embeddings/ln/bias",
        _to_numpy(state_dict[f"{root}embeddings.LayerNorm.bias"]),
    )

    n_layers = 1 + max(
        (
            int(m.group(1))
            for k in state_dict
            if (m := re.search(r"encoder\.layer\.(\d+)\.", k))
        ),
        default=-1,
    )
    pairs = _bert_layer_pairs(n_layers, root)
    for kind, flax_path, torch_prefix in pairs:
        w = state_dict.get(torch_prefix + ".weight")
        if w is None:
            continue
        w = _to_numpy(w)
        if kind == "ln":
            put(flax_path + "/scale", w)
            put(flax_path + "/bias", _to_numpy(state_dict[torch_prefix + ".bias"]))
        else:
            put(flax_path + "/kernel", w.T)
            b = state_dict.get(torch_prefix + ".bias")
            if b is not None:
                put(flax_path + "/bias", _to_numpy(b))
    return params


def _bert_layer_pairs(n_layers: int, root: str):
    """(kind, flax_path, torch_prefix) for BERT-shaped encoder layers —
    shared by the LayoutLM and VisualBert converters (both directions)."""
    pairs = []
    for i in range(n_layers):
        base, flax = f"{root}encoder.layer.{i}", f"layer_{i}"
        for leaf in ("query", "key", "value"):
            pairs.append(
                ("linear", f"{flax}/att/{leaf}", f"{base}.attention.self.{leaf}")
            )
        pairs += [
            ("linear", f"{flax}/att/att_out", f"{base}.attention.output.dense"),
            ("ln", f"{flax}/att/ln", f"{base}.attention.output.LayerNorm"),
            ("linear", f"{flax}/ffn/intermediate", f"{base}.intermediate.dense"),
            ("linear", f"{flax}/ffn/mlp_out", f"{base}.output.dense"),
            ("ln", f"{flax}/ffn/ln", f"{base}.output.LayerNorm"),
        ]
    return pairs


_LAYOUTLM_EMB_TABLES = (
    "word_embeddings",
    "position_embeddings",
    "token_type_embeddings",
    "x_position_embeddings",
    "y_position_embeddings",
    "h_position_embeddings",
    "w_position_embeddings",
)

_VISUALBERT_EMB_TABLES = (
    "word_embeddings",
    "position_embeddings",
    "token_type_embeddings",
    "visual_token_type_embeddings",
    "visual_position_embeddings",
)


def jax_layoutlm_to_torch(params: Mapping[str, Any]) -> Dict:
    """flax LayoutLM params -> HF-named numpy state_dict (the reverse of
    torch_layoutlm_to_jax; load with torch.tensor per value)."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params, sep="/")
    out: Dict[str, np.ndarray] = {}
    for name in _LAYOUTLM_EMB_TABLES:
        w = flat.get(f"embeddings/{name}/embedding")
        if w is not None:
            out[f"embeddings.{name}.weight"] = np.asarray(w)
    out["embeddings.LayerNorm.weight"] = np.asarray(flat["embeddings/ln/scale"])
    out["embeddings.LayerNorm.bias"] = np.asarray(flat["embeddings/ln/bias"])
    n_layers = 1 + max(
        (int(k.split("_")[1].split("/")[0]) for k in flat if k.startswith("layer_")),
        default=-1,
    )
    for kind, flax_path, torch_prefix in _bert_layer_pairs(n_layers, ""):
        if kind == "ln":
            out[torch_prefix + ".weight"] = np.asarray(flat[flax_path + "/scale"])
            out[torch_prefix + ".bias"] = np.asarray(flat[flax_path + "/bias"])
        else:
            out[torch_prefix + ".weight"] = np.asarray(flat[flax_path + "/kernel"]).T
            out[torch_prefix + ".bias"] = np.asarray(flat[flax_path + "/bias"])
    return out


def jax_visualbert_to_torch(params: Mapping[str, Any]) -> Dict:
    """flax VisualBert params -> HF-named numpy state_dict (reverse of
    torch_visualbert_to_jax)."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params, sep="/")
    out: Dict[str, np.ndarray] = {}
    for name in _VISUALBERT_EMB_TABLES:
        w = flat.get(f"embeddings/{name}/embedding")
        if w is not None:
            out[f"embeddings.{name}.weight"] = np.asarray(w)
    out["embeddings.visual_projection.weight"] = np.asarray(
        flat["embeddings/visual_projection/kernel"]
    ).T
    out["embeddings.visual_projection.bias"] = np.asarray(
        flat["embeddings/visual_projection/bias"]
    )
    out["embeddings.LayerNorm.weight"] = np.asarray(flat["embeddings/ln/scale"])
    out["embeddings.LayerNorm.bias"] = np.asarray(flat["embeddings/ln/bias"])
    n_layers = 1 + max(
        (int(k.split("_")[1].split("/")[0]) for k in flat if k.startswith("layer_")),
        default=-1,
    )
    pairs = _bert_layer_pairs(n_layers, "") + [
        ("linear", "pooler/dense", "pooler.dense")
    ]
    for kind, flax_path, torch_prefix in pairs:
        if flax_path + ("/scale" if kind == "ln" else "/kernel") not in flat:
            continue
        if kind == "ln":
            out[torch_prefix + ".weight"] = np.asarray(flat[flax_path + "/scale"])
            out[torch_prefix + ".bias"] = np.asarray(flat[flax_path + "/bias"])
        else:
            out[torch_prefix + ".weight"] = np.asarray(flat[flax_path + "/kernel"]).T
            out[torch_prefix + ".bias"] = np.asarray(flat[flax_path + "/bias"])
    return out


def torch_visualbert_to_jax(state_dict: Mapping[str, Any]) -> Dict:
    """HF ``transformers`` VisualBert state_dict (VisualBertModel or a
    headed variant with the ``visual_bert.`` prefix) -> flax params for
    :class:`vltk_tpu.models.visualbert.VisualBert`. Embeddings map 1:1
    (text tables + visual_projection + visual token-type/position tables +
    the shared post-concat LayerNorm); encoder layers are BERT-shaped;
    the pooler maps; task heads are skipped."""
    import re

    params: Dict = {}

    def put(path: str, value: np.ndarray) -> None:
        _set(params, tuple(path.split("/")), value)

    root = (
        "visual_bert."
        if any(k.startswith("visual_bert.") for k in state_dict)
        else ""
    )
    for name in _VISUALBERT_EMB_TABLES:
        w = state_dict.get(f"{root}embeddings.{name}.weight")
        if w is not None:
            put(f"embeddings/{name}/embedding", _to_numpy(w))
    put(
        "embeddings/visual_projection/kernel",
        _to_numpy(state_dict[f"{root}embeddings.visual_projection.weight"]).T,
    )
    put(
        "embeddings/visual_projection/bias",
        _to_numpy(state_dict[f"{root}embeddings.visual_projection.bias"]),
    )
    put(
        "embeddings/ln/scale",
        _to_numpy(state_dict[f"{root}embeddings.LayerNorm.weight"]),
    )
    put(
        "embeddings/ln/bias",
        _to_numpy(state_dict[f"{root}embeddings.LayerNorm.bias"]),
    )

    n_layers = 1 + max(
        (
            int(m.group(1))
            for k in state_dict
            if (m := re.search(r"encoder\.layer\.(\d+)\.", k))
        ),
        default=-1,
    )
    pairs = [("linear", "pooler/dense", f"{root}pooler.dense")]
    pairs += _bert_layer_pairs(n_layers, root)
    for kind, flax_path, torch_prefix in pairs:
        w = state_dict.get(torch_prefix + ".weight")
        if w is None:
            continue
        w = _to_numpy(w)
        if kind == "ln":
            put(flax_path + "/scale", w)
            put(flax_path + "/bias", _to_numpy(state_dict[torch_prefix + ".bias"]))
        else:
            put(flax_path + "/kernel", w.T)
            b = state_dict.get(torch_prefix + ".bias")
            if b is not None:
                put(flax_path + "/bias", _to_numpy(b))
    return params


def _vit_pairs(n_layers: int):
    """(kind, flax_path, torch_prefix) for HF ViTModel <-> models/vit.py."""
    pairs = [
        ("linear", "pooler", "pooler.dense"),
        ("ln", "ln", "layernorm"),
    ]
    for i in range(n_layers):
        base = f"encoder.layer.{i}"
        att = f"layer_{i}_att"
        mlp = f"layer_{i}_mlp"
        pairs += [
            ("ln", f"{att}/ln_before", f"{base}.layernorm_before"),
            ("linear", f"{att}/query", f"{base}.attention.attention.query"),
            ("linear", f"{att}/key", f"{base}.attention.attention.key"),
            ("linear", f"{att}/value", f"{base}.attention.attention.value"),
            ("linear", f"{att}/att_out", f"{base}.attention.output.dense"),
            ("ln", f"{mlp}/ln_after", f"{base}.layernorm_after"),
            ("linear", f"{mlp}/intermediate", f"{base}.intermediate.dense"),
            ("linear", f"{mlp}/mlp_out", f"{base}.output.dense"),
        ]
    return pairs


def torch_vit_to_jax(state_dict: Mapping[str, Any]) -> Dict:
    """HF ``transformers`` ViTModel state_dict -> flax params for
    :class:`vltk_tpu.models.vit.ViT` (the inverse completes the
    reference's one-way legacy converter, vltk/legacy/vit_ckp_convert.py)."""
    import re

    params: Dict = {}

    def put(path, value):
        _set(params, tuple(path.split("/")), value)

    put("cls_token", _to_numpy(state_dict["embeddings.cls_token"]))
    put(
        "position_embeddings",
        _to_numpy(state_dict["embeddings.position_embeddings"]),
    )
    proj = _to_numpy(state_dict["embeddings.patch_embeddings.projection.weight"])
    put("patch_embed/kernel", np.transpose(proj, (2, 3, 1, 0)))  # OIHW->HWIO
    put(
        "patch_embed/bias",
        _to_numpy(state_dict["embeddings.patch_embeddings.projection.bias"]),
    )

    n_layers = 1 + max(
        (
            int(m.group(1))
            for k in state_dict
            if (m := re.search(r"encoder\.layer\.(\d+)\.", k))
        ),
        default=-1,
    )
    for kind, flax_path, torch_prefix in _vit_pairs(n_layers):
        w = state_dict.get(torch_prefix + ".weight")
        if w is None:
            continue
        w = _to_numpy(w)
        b = _to_numpy(state_dict[torch_prefix + ".bias"])
        if kind == "ln":
            put(flax_path + "/scale", w)
            put(flax_path + "/bias", b)
        else:
            put(flax_path + "/kernel", w.T)
            put(flax_path + "/bias", b)
    return params


def jax_vit_to_torch(params: Mapping[str, Any]) -> Dict:
    """flax ViT params -> HF-named numpy state_dict (JAX->torch, the
    direction the reference's vit_ckp_convert covered)."""
    import flax.traverse_util as tu

    flat = tu.flatten_dict(params, sep="/")
    out: Dict[str, np.ndarray] = {
        "embeddings.cls_token": np.asarray(flat["cls_token"]),
        "embeddings.position_embeddings": np.asarray(flat["position_embeddings"]),
        "embeddings.patch_embeddings.projection.weight": np.transpose(
            np.asarray(flat["patch_embed/kernel"]), (3, 2, 0, 1)
        ),
        "embeddings.patch_embeddings.projection.bias": np.asarray(
            flat["patch_embed/bias"]
        ),
    }
    n_layers = 1 + max(
        (
            int(k.split("_")[1])
            for k in flat
            if k.startswith("layer_") and k.endswith("att/ln_before/scale")
        ),
        default=-1,
    )
    for kind, flax_path, torch_prefix in _vit_pairs(n_layers):
        if kind == "ln":
            out[torch_prefix + ".weight"] = np.asarray(flat[flax_path + "/scale"])
            out[torch_prefix + ".bias"] = np.asarray(flat[flax_path + "/bias"])
        else:
            out[torch_prefix + ".weight"] = np.asarray(
                flat[flax_path + "/kernel"]
            ).T
            out[torch_prefix + ".bias"] = np.asarray(flat[flax_path + "/bias"])
    return out
