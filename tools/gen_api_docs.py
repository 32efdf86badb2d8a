"""Generate docs/API.md — a compact public-API reference.

The reference's docs were stubs (docsrc/source/*.rst, empty); here the
reference page is generated from the live package so it cannot rot:
every public class/function of the user-facing modules with its
signature and first docstring paragraph. Regenerate with
``python tools/gen_api_docs.py`` (the pre-round check re-runs it).
"""

import inspect
import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

MODULES = [
    ("vltk_tpu", "Package root: build(), vars, lazy namespaces"),
    ("vltk_tpu.config", "Config dataclasses + dot-flag/yaml merge"),
    ("vltk_tpu.features", "Arrow schema feature types"),
    ("vltk_tpu.adapters", "ETL adapters (datasets -> arrow)"),
    ("vltk_tpu.processing", "Processor registry (image/lang/OCR chains)"),
    ("vltk_tpu.data.loader", "Fixed-shape batched loaders"),
    ("vltk_tpu.data.tokenizer", "Tokenizer facade (native WordPiece)"),
    ("vltk_tpu.models", "FRCNN + VL models, converters, int8"),
    ("vltk_tpu.ops", "Detection ops (boxes, NMS, matcher, pooling)"),
    ("vltk_tpu.parallel", "Mesh, sharding rules, SP backends, ZeRO-1"),
    ("vltk_tpu.train", "Experiment base, steps, optim, checkpoints"),
    ("vltk_tpu.predict", "Composed inference: VQA + document predictors"),
    ("vltk_tpu.serving", "Cross-request micro-batching"),
    ("vltk_tpu.aot", "AOT export/serving bundles (jax.export)"),
    ("vltk_tpu.utils.viz", "Box drawing / detection dumps"),
]


def _first_para(doc):
    if not doc:
        return ""
    para = doc.strip().split("\n\n")[0]
    return " ".join(line.strip() for line in para.splitlines())


def _sig(obj):
    try:
        sig = str(inspect.signature(obj))
    except (ValueError, TypeError):
        return "(...)"
    # default-value reprs can embed process-specific addresses (e.g. flax's
    # `<_Sentinel object at 0x7f...>`); strip them so regeneration is
    # deterministic and diffs show only real API changes
    return re.sub(r" at 0x[0-9a-f]+", "", sig)


def _is_public_here(name, obj, mod):
    if name.startswith("_"):
        return False
    owner = getattr(obj, "__module__", None)
    return owner is None or owner.startswith(mod.__name__.rsplit(".", 1)[0])


def render_module(modname, tagline, out):
    import importlib

    mod = importlib.import_module(modname)
    out.append(f"## `{modname}`\n\n{tagline}\n")
    doc = _first_para(inspect.getdoc(mod))
    if doc:
        out.append(f"{doc}\n")
    names = getattr(mod, "__all__", None) or sorted(vars(mod))
    for name in names:
        try:
            obj = getattr(mod, name)
        except AttributeError:
            continue
        if not _is_public_here(name, obj, mod):
            continue
        if inspect.isclass(obj):
            out.append(f"### `{name}{_sig(obj)}`\n")
            d = _first_para(inspect.getdoc(obj))
            if d:
                out.append(f"{d}\n")
            for mname, meth in sorted(vars(obj).items()):
                if mname.startswith("_") and mname != "__call__":
                    continue
                fn = meth.__func__ if isinstance(meth, (classmethod, staticmethod)) else meth
                if not callable(fn):
                    continue
                md = _first_para(inspect.getdoc(fn))
                out.append(f"- `{mname}{_sig(fn)}`" + (f" — {md}" if md else ""))
            out.append("")
        elif inspect.isfunction(obj):
            out.append(f"### `{name}{_sig(obj)}`\n")
            d = _first_para(inspect.getdoc(obj))
            if d:
                out.append(f"{d}\n")


def main():
    out = [
        "# vltk-tpu API reference",
        "",
        "Generated from the live package by `tools/gen_api_docs.py` — do",
        "not edit by hand. One section per user-facing module; signatures",
        "and first docstring paragraphs only (full docs in the source).",
        "",
    ]
    for modname, tagline in MODULES:
        render_module(modname, tagline, out)
    os.makedirs("docs", exist_ok=True)
    path = os.path.join("docs", "API.md")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
    print(f"wrote {path} ({len(out)} blocks)")


if __name__ == "__main__":
    main()
