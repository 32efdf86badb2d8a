"""VisnLangDataset — adapter for text-over-images datasets.

Re-design of reference vltk/abc/visnlangadatper.py. Subclasses declare
``schema()``, ``forward(text_data, split)`` and ``data_info`` — the map from
each language split to the vision dataset/splits whose images it annotates
(reference: visnlangadatper.py:309-312; e.g. adapters/vqa.py:11-15).
``extract()`` locates the split's JSONs (honoring ``filters`` exclusion,
reference: 71-94, 148-192), runs forward, and writes per-split
``{split}.arrow`` with ``answer_frequencies`` + ``img_to_row_map`` metadata.
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, List, Mapping, Optional, Sequence, Tuple

from vltk_tpu import vars as V
from vltk_tpu.adapters.base import Adapter
from vltk_tpu.features import Features
from vltk_tpu.inspection import collect_args_to_func
from vltk_tpu.utils.base import try_load


class VisnLangDataset(Adapter):
    """Vision-language adapter (text entries keyed by image id)."""

    _base_features: Dict[str, Any] = {
        V.imgid: Features.Imgid(),
        V.text: Features.String(),
    }

    # ------------------------------------------------------------------
    # subclass hooks
    # ------------------------------------------------------------------
    # data_info: {lang_split: {vision_dataset_name: [vision_splits]}}
    data_info: Mapping[str, Mapping[str, Sequence[str]]] = {}

    @classmethod
    def adjust_imgid(cls, imgid: str, vdset_name: str = "", vdset_split: str = "") -> str:
        """Rewrite raw ids into the vision dataset's id space (reference:
        visnlangadatper.py:29-37; VQA pads to COCO form at
        adapters/vqa.py:26-30)."""
        return str(imgid)

    # ------------------------------------------------------------------
    # label handling
    # ------------------------------------------------------------------
    @staticmethod
    def _label_handler(
        label: Mapping[str, float]
    ) -> Tuple[List[str], List[float]]:
        """{label: score} dict -> parallel (labels, scores) lists
        (reference: visnlangadatper.py:49-69)."""
        if not label:
            return [""], [0.0]
        labels, scores = zip(*sorted(label.items(), key=lambda kv: -kv[1]))
        return list(labels), [float(s) for s in scores]

    # ------------------------------------------------------------------
    # extraction
    # ------------------------------------------------------------------
    @classmethod
    def extract(
        cls,
        datadir: str,
        splits: Optional[Sequence[str]] = None,
        **kwargs,
    ) -> Dict[str, Adapter]:
        """Per-split JSON discovery -> forward -> {split}.arrow
        (reference: visnlangadatper.py:112-283)."""
        base = os.path.join(datadir, cls.name())
        # forwards that declare a ``datadir`` kwarg get it automatically
        # (DocVQA reads the vision side's OCR jsons for span grounding)
        kwargs.setdefault("datadir", datadir)
        if splits is None:
            splits = sorted(cls.data_info.keys()) or sorted(V.SPLITALIASES)
        out: Dict[str, Adapter] = {}
        for split in splits:
            files = cls._locate_split_files(base, split)
            if not files:
                continue
            text_data: Dict[str, Any] = {}
            for path in files:
                data = try_load(path)
                if data is not None:
                    # key by path relative to base: same-named files in
                    # different subdirectories must not overwrite each other
                    text_data[os.path.relpath(path, base)] = data
            if not text_data:
                continue
            fwd_kwargs = collect_args_to_func(cls.forward, kwargs)
            entries = list(cls.forward(text_data, split, **fwd_kwargs))
            entries = cls._adjust_entries(entries, split)
            schema = cls.full_schema(**kwargs)
            schema = cls._drop_all_none_columns(schema, entries)
            out_path = os.path.join(base, f"{split}.arrow")
            adapter = cls._write_entries(entries, schema, out_path)
            adapter._split = split
            out[split] = adapter
        if not out:
            raise FileNotFoundError(
                f"no text json files found for {cls.name()} under {base} "
                f"(splits tried: {list(splits)})"
            )
        return out

    @classmethod
    def _locate_split_files(cls, base: str, split: str) -> List[str]:
        """Find the JSONs belonging to ``split``, excluding ``filters``
        (reference: visnlangadatper.py:71-94, gqa filters at
        adapters/gqa.py:21).

        The split must appear as a token of the path *relative to base*,
        bounded by non-letters (digits may follow: 'train2014' belongs to
        'train', but 'testdev' does NOT belong to 'test') — substring
        matching ingested testdev files into the test split and matched
        the datadir prefix (a '/mnt/train_data' datadir made every file
        look like 'train')."""
        import re

        token = re.compile(
            r"(?<![a-z])" + re.escape(split.lower()) + r"(?![a-z])"
        )
        candidates = []
        for path in sorted(glob.glob(os.path.join(base, "**"), recursive=True)):
            if not (path.endswith(".json") or path.endswith(".jsonl")):
                continue
            rel = os.path.relpath(path, base).lower()
            if any(f.lower() in os.path.basename(rel) for f in cls.filters):
                continue
            if token.search(rel):
                candidates.append(path)
        return candidates

    @classmethod
    def _adjust_entries(cls, entries: List[Dict], split: str) -> List[Dict]:
        info = cls.data_info.get(split, {})
        vdset_name = next(iter(info), "")
        vdset_split = info.get(vdset_name, [""])[0] if info else ""
        for entry in entries:
            if V.imgid in entry:
                entry[V.imgid] = cls.adjust_imgid(
                    str(entry[V.imgid]), vdset_name, vdset_split
                )
        return entries

    @classmethod
    def _drop_all_none_columns(
        cls, schema: Dict[str, Any], entries: List[Dict]
    ) -> Dict[str, Any]:
        """Drop schema columns no entry populates (the reference checked
        only the first entry — one unannotated question silently discarded
        the label column for the whole split)."""
        if not entries:
            return schema
        keep = set(cls._base_features)
        for entry in entries:
            for k, v in entry.items():
                if v is not None:
                    keep.add(k)
            if keep >= set(schema):
                break
        return {k: v for k, v in schema.items() if k in keep}

    @property
    def answer_frequencies(self) -> Dict[str, int]:
        return getattr(self, "labels_frequencies", {}) or getattr(
            self, "label_frequencies", {}
        )

    # forward signature for documentation
    @classmethod
    def forward(cls, text_data: List, split: str, **kwargs):  # pragma: no cover
        raise NotImplementedError
