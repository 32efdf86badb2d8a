"""init_datasets — one config -> (train_loader, eval_loader).

Re-design of reference vltk/dataset/builder.py: parse dataset/split pairs,
classify VL vs vision, idempotently download/extract, assemble adapters +
annotations + the global string->id ``metadata_ids`` tables, and wrap
everything into loaders (reference: builder.py:78-404).
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

from vltk_tpu import vars as V
from vltk_tpu.data.basedataset import CollatedSets
from vltk_tpu.data.langdataset import LangHandler
from vltk_tpu.data.loader import VisionLanguageLoader, VisionLoader
from vltk_tpu.data.visndataset import VisnHandler
from vltk_tpu.data.visnlangdataset import VisionLanguageDataset


# ---------------------------------------------------------------------------
# split aliases (reference: builder.py:391-404)
# ---------------------------------------------------------------------------
_ALIASES = {
    "val": "val",
    "valid": "val",
    "validation": "val",
    "eval": "val",
    "evaluation": "val",
    "dev": "dev",
    "test": "test",
    "train": "train",
}


def split_handler(split: str) -> str:
    return _ALIASES.get(str(split).lower(), str(split).lower())


def parse_datasets(specs) -> List[Tuple[str, str]]:
    """Normalize ``[["vqa", "train"], ("gqa", "val")]``-style specs
    (reference: builder.py:157-195)."""
    out: List[Tuple[str, str]] = []
    if not specs:
        return out
    if isinstance(specs, (list, tuple)) and specs and isinstance(specs[0], str):
        specs = [specs]
    for item in specs:
        name, split = item[0], item[1] if len(item) > 1 else "train"
        out.append((str(name).lower(), split_handler(split)))
    return out


# ---------------------------------------------------------------------------
# loading pieces
# ---------------------------------------------------------------------------


def _load_vl_adapter(cls, datadir: str, split: str, reextract: bool):
    adapter = None if reextract else cls.load(datadir, split=split)
    if isinstance(adapter, dict):
        adapter = adapter.get(split)
    if adapter is None:
        extracted = cls.extract(datadir, splits=[split])
        adapter = extracted.get(split)
    if adapter is None:
        raise FileNotFoundError(
            f"could not load or extract {cls.name()}:{split} under {datadir}"
        )
    return adapter


def _vision_names_for(vl_classes, vl_splits) -> Dict[str, List[str]]:
    """Union of data_info targets for the selected VL splits."""
    out: Dict[str, List[str]] = {}
    for cls, split in zip(vl_classes, vl_splits):
        info = cls.data_info.get(split, {})
        for vname, vsplits in info.items():
            out.setdefault(vname.lower(), [])
            for s in vsplits:
                if s not in out[vname.lower()]:
                    out[vname.lower()].append(s)
    return out


def _build_metadata_ids(
    vl_adapters: Sequence,
    annotation_adapters: Sequence,
    filedict: Optional[Mapping[str, str]] = None,
) -> Dict[str, Dict[str, int]]:
    """Global string->int id tables (reference: builder.py:228-236,
    270-281, with metadata_filedict overrides at 316-320)."""
    ids: Dict[str, Dict[str, int]] = {}

    answers: set = set()
    for adapter in vl_adapters:
        answers |= set(getattr(adapter, "answer_frequencies", {}) or {})
    if answers:
        ids["answers"] = {a: i for i, a in enumerate(sorted(answers))}

    label_strings: set = set()
    for adapter in annotation_adapters:
        for key, value in adapter.metadata.items():
            if key.endswith("_frequencies") and isinstance(value, dict):
                label_strings |= set(value)
    if label_strings:
        table = {s: i for i, s in enumerate(sorted(label_strings))}
        ids[V.labels] = table
        ids[V.objects] = table

    if filedict:
        for key, path in filedict.items():
            with open(path) as f:
                ids[key] = json.load(f)
    return ids


class VisionOnlyDataset:
    """Vision rows (one per image id) for VisionLoader
    (reference: visndataset.py __getitem__:218-226)."""

    def __init__(self, imgids: List[str], visn: VisnHandler):
        self.imgids = list(imgids)
        self.visn = visn

    def __len__(self) -> int:
        return len(self.imgids)

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self.visn.get_entry(self.imgids[idx])


# ---------------------------------------------------------------------------
# main entry
# ---------------------------------------------------------------------------


def init_datasets(config):
    """(train_loader, eval_loader) from a Config or DataConfig
    (reference: builder.py:78-154)."""
    from vltk_tpu.adapters import Adapters

    cfg = getattr(config, "data", config)
    datadir = cfg.datadir

    train_specs = parse_datasets(cfg.train_datasets)
    eval_specs = parse_datasets(cfg.eval_datasets)

    loaders = {}
    shared: Dict[str, Any] = {}
    for tag, specs, train in (("train", train_specs, True), ("eval", eval_specs, False)):
        if not specs:
            loaders[tag] = None
            continue
        loaders[tag] = _build_one(cfg, Adapters, datadir, specs, train, shared)
    return loaders["train"], loaders["eval"]


def _build_one(cfg, Adapters, datadir: str, specs, train: bool, shared: Dict):
    vl_parts: List[Tuple[str, str, Any]] = []
    vl_classes, vl_splits = [], []
    vision_only_parts: List[Tuple[str, str]] = []

    for name, split in specs:
        cls = Adapters.get(name)
        if Adapters.is_visnlang(name):
            adapter = _load_vl_adapter(cls, datadir, split, cfg.reextract)
            vl_parts.append((name, split, adapter))
            vl_classes.append(cls)
            vl_splits.append(split)
        else:
            vision_only_parts.append((name, split))

    # vision sources implied by the VL datasets
    vision_names = _vision_names_for(vl_classes, vl_splits)
    for name, split in vision_only_parts:
        vision_names.setdefault(name, [])
        if split not in vision_names[name]:
            vision_names[name].append(split)

    annotation_parts: List[Tuple[str, str, Any]] = []
    extractor_parts: List[Tuple[str, str, Any]] = []
    imgid2path: Dict[str, str] = {}
    for vname, vsplits in vision_names.items():
        if vname not in Adapters:
            continue
        vcls = Adapters.get(vname)
        loaded = None if cfg.reextract else vcls.load(datadir)
        if loaded is None and not cfg.ignore_annotations:
            try:  # idempotent extract from raw files (reference: builder.py:24-75)
                extracted = vcls.extract(datadir)
                loaded = extracted if extracted else None
            except (FileNotFoundError, NotImplementedError):
                loaded = None
        if loaded is not None:
            if not isinstance(loaded, dict):
                loaded = {loaded.split or "train": loaded}
            for s, a in loaded.items():
                annotation_parts.append((vname, s, a))
        for s in vsplits or [None]:
            if not cfg.ignore_filepath:
                imgid2path.update(vcls.load_imgid2path(datadir, s))
        if cfg.extractor:
            ecls = Adapters.get(cfg.extractor)
            edir = os.path.join(datadir, vname)
            eload = ecls.load(edir)
            if eload is not None:
                if not isinstance(eload, dict):
                    eload = {eload.split or "train": eload}
                for s, a in eload.items():
                    extractor_parts.append((vname, s, a))

    metadata_ids = _build_metadata_ids(
        [a for _, _, a in vl_parts],
        [a for _, _, a in annotation_parts],
        cfg.metadata_filedict,
    )
    # id tables are shared between the train and eval loaders: strings the
    # second loader introduces APPEND at fresh ids — re-enumerating and
    # dict-unioning two independently sorted tables would collide/shift ids
    # (e.g. train {no:0,yes:1} + eval {maybe:0,yes:1} -> maybe==no)
    shared_tables = shared.setdefault("metadata_ids", {})
    for key, table in metadata_ids.items():
        merged = shared_tables.setdefault(key, {})
        for s in sorted(table):
            if s not in merged:
                merged[s] = len(merged)

    from vltk_tpu.processing import Processors

    def build_procs(names, **init_kwargs):
        procs = []
        for n in names:
            pcls = Processors.get(n)
            from vltk_tpu.inspection import collect_args_to_func

            procs.append(pcls(**collect_args_to_func(pcls.__init__, init_kwargs)))
        return procs

    lang = LangHandler(
        cfg.lang,
        metadata_ids=shared["metadata_ids"],
        lang_processors=cfg.lang_processors,
    )
    proc_kwargs = dict(
        tokenizer=lang.tokenizer,
        max_visual_seq_length=cfg.lang.max_visual_seq_length,
        max_seq_length=cfg.lang.max_seq_length,
        metadata_ids=shared["metadata_ids"],
        ignore_id=cfg.lang.ignore_id,
    )
    visn = VisnHandler(
        cfg,
        imgid2path=imgid2path,
        extractor_sets=CollatedSets(extractor_parts) if extractor_parts else None,
        annotation_sets=CollatedSets(annotation_parts) if annotation_parts else None,
        metadata_ids=shared["metadata_ids"],
        visn_processors=build_procs(cfg.visn_processors, **proc_kwargs),
    )

    if vl_parts:
        dataset = VisionLanguageDataset(
            cfg,
            CollatedSets(vl_parts),
            visn,
            lang,
            visnlang_processors=build_procs(cfg.visnlang_processors, **proc_kwargs),
            max_text_per_img=cfg.max_text_per_img,
        )
        loader = VisionLanguageLoader(cfg, dataset, train=train)
    else:
        if imgid2path:
            ids = sorted(imgid2path)
        else:
            ids = sorted(
                {i for _, _, a in annotation_parts for i in a.imgids}
            )
        dataset = VisionOnlyDataset(ids, visn)
        loader = VisionLoader(cfg, dataset, train=train)
    loader.metadata_ids = shared["metadata_ids"]
    loader.tokenizer = lang.tokenizer if vl_parts else None
    return loader
