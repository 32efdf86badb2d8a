"""VisnDataset — adapter for vision *annotation* datasets.

Re-design of reference vltk/abc/visnadapter.py. Subclasses declare
``schema()`` and ``forward(json_files, splits)``; ``extract()`` globs
annotation JSONs, runs forward, and streams one ``annotations.arrow``.
``files()/load_imgid2path()`` map image ids to image files on disk by
globbing ``{datadir}/{name}/{split}/**.(jpg|png|jpeg)``
(reference: visnadapter.py:41-77).
"""

from __future__ import annotations

import glob
import os
from typing import Any, Dict, Iterable, List, Mapping, Optional, Sequence

from vltk_tpu import vars as V
from vltk_tpu.adapters.base import Adapter
from vltk_tpu.features import Features
from vltk_tpu.inspection import collect_args_to_func
from vltk_tpu.utils.base import try_load

_IMG_EXTS = (".jpg", ".jpeg", ".png")


class VisnDataset(Adapter):
    """Vision annotation adapter (is_annotation=True)."""

    is_annotation = True
    _base_features: Dict[str, Any] = {V.imgid: Features.Imgid()}

    # ------------------------------------------------------------------
    # subclass hooks
    # ------------------------------------------------------------------
    @classmethod
    def adjust_imgid(cls, imgid: str) -> str:
        """Normalize raw ids to canonical form (reference:
        visnadapter.py:27-34)."""
        return str(imgid)

    # ------------------------------------------------------------------
    # image-file discovery
    # ------------------------------------------------------------------
    @classmethod
    def files(cls, datadir: str, split: Optional[str] = None) -> List[str]:
        """All image files under {datadir}/{name}[/{split}]
        (reference: visnadapter.py:41-58)."""
        base = os.path.join(datadir, cls.name())
        pattern = os.path.join(base, split, "**") if split else os.path.join(base, "**")
        out = []
        for path in glob.glob(pattern, recursive=True):
            if path.lower().endswith(_IMG_EXTS):
                out.append(path)
        return sorted(out)

    @classmethod
    def load_imgid2path(
        cls, datadir: str, split: Optional[str] = None
    ) -> Dict[str, str]:
        """imgid -> filepath map (reference: visnadapter.py:59-77)."""
        out: Dict[str, str] = {}
        for path in cls.files(datadir, split):
            stem = os.path.splitext(os.path.basename(path))[0]
            out[cls.adjust_imgid(stem)] = path
        return out

    # ------------------------------------------------------------------
    # extraction
    # ------------------------------------------------------------------
    @classmethod
    def extract(
        cls,
        datadir: str,
        annotation_dir: Optional[str] = None,
        splits: Optional[Sequence[str]] = None,
        **kwargs,
    ) -> Adapter:
        """Glob annotation JSONs -> forward() -> annotations.arrow
        (reference: visnadapter.py:79-214)."""
        base = os.path.join(datadir, cls.name())
        ann_dir = annotation_dir or os.path.join(base, V.ANNOTATION_DIR)
        json_files: Dict[str, Any] = {}
        search = ann_dir if os.path.isdir(ann_dir) else base
        for path in sorted(glob.glob(os.path.join(search, "**"), recursive=True)):
            if not (path.endswith(".json") or path.endswith(".jsonl")):
                continue
            if any(f.lower() in os.path.basename(path).lower() for f in cls.filters):
                continue
            data = try_load(path)
            if data is not None:
                # key by path relative to the annotation dir: same-named
                # files in per-split subdirectories must not overwrite
                json_files[os.path.relpath(path, search)] = data
        if not json_files:
            raise FileNotFoundError(
                f"no annotation json files for {cls.name()} under {search}"
            )
        schema = cls.full_schema(**kwargs)
        fwd_kwargs = collect_args_to_func(cls.forward, kwargs)
        entries = cls.forward(json_files, splits=splits, **fwd_kwargs)
        entries = _normalize_entries(entries, cls.adjust_imgid)
        out_path = os.path.join(base, "annotations.arrow")
        return cls._write_entries(entries, schema, out_path)

    # ------------------------------------------------------------------
    # alignment helpers (reference: visnadapter.py:216-228)
    # ------------------------------------------------------------------
    def check_imgid_alignment(self, imgid2path: Mapping[str, str]) -> bool:
        return set(self.imgids) <= set(imgid2path)

    def align_imgids(self, imgid2path: Mapping[str, str]) -> "Adapter":
        return self.imgid_filter(set(self.imgids) & set(imgid2path))

    @property
    def object_frequencies(self):
        return getattr(self, "labels_frequencies", {})

    # forward signature for documentation
    @classmethod
    def forward(
        cls, json_files: Iterable, splits: Optional[Sequence[str]] = None, **kwargs
    ):  # pragma: no cover - abstract
        raise NotImplementedError


def _normalize_entries(entries, adjust):
    for entry in entries:
        if entry is None:
            continue
        if V.imgid in entry:
            entry[V.imgid] = adjust(str(entry[V.imgid]))
        yield entry
