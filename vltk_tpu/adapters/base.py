"""Adapter base: arrow-backed dataset with deterministic metadata.

Re-design of the reference's ``Adapter`` (reference: vltk/abc/adapter.py).
An adapter is a class-per-dataset ETL unit: subclasses declare ``schema()``
and ``forward()``; the base class owns

* arrow I/O — streaming writes through the HF ``ArrowWriter`` (so tables stay
  readable by HF ``datasets``) re-written with custom schema metadata
  (reference: abc/adapter.py:359-379), and zero-copy loads through
  ``pyarrow.memory_map`` + ``ipc.open_stream`` (reference: 381-409);
* per-table metadata — ``img_to_row_map`` plus a ``Counter`` for every
  string-typed non-id column (reference: 464-477);
* random access by image id (``get/get_idx/has/imgids``, reference: 183-260)
  and subsetting with remapped row maps (``imgid_filter``, reference:
  204-244);
* ``download()`` with temp-dir rollback (reference: 82-157).

TPU-relevant change: adapters are encouraged to declare *fixed-shape*
columns (Features.FeaturesMatrix / Boxtensor) so the loader can build static
device batches without per-batch padding.
"""

from __future__ import annotations

import os
import shutil
import tarfile
import tempfile
import urllib.request
import zipfile
from collections import Counter
from typing import Any, Dict, Iterable, List, Mapping, Optional, Sequence, Union

import pyarrow as pa
from datasets import Features as HFFeatures
from datasets.arrow_writer import ArrowWriter

from vltk_tpu import vars as V
from vltk_tpu.inspection import collect_args_to_func
from vltk_tpu.utils.base import get_metadata, set_metadata

_ID_KEYS = {V.imgid, V.qid, V.filepath, V.split, V.img, V.text}
WRITE_BATCH_SIZE = 1024


class Adapter:
    """An arrow table + metadata, constructed by subclass ETL."""

    # subclass knobs
    urls: Union[None, str, Sequence[str], Mapping[str, str]] = None
    filters: Sequence[str] = ()
    is_annotation: bool = False
    is_feature: bool = False
    _batch_size: int = WRITE_BATCH_SIZE
    _is_cached: bool = False

    def __init__(
        self,
        table: pa.Table,
        split: Optional[str] = None,
        metadata: Optional[Dict[str, Any]] = None,
    ):
        self._table = table
        self._split = split
        meta = metadata if metadata is not None else get_metadata(table)
        self._metadata = meta
        # inject decoded metadata entries as attributes (reference:
        # abc/adapter.py:47-81)
        self._img_to_row_map: Dict[str, int] = dict(
            meta.get("img_to_row_map") or {}
        )
        for key, value in meta.items():
            if key in ("huggingface",):
                continue
            safe = key.replace("-", "_")
            if not hasattr(self, safe):
                setattr(self, safe, value)

    # ------------------------------------------------------------------
    # naming & registry support
    # ------------------------------------------------------------------
    @classmethod
    def name(cls) -> str:
        return getattr(cls, "_name", None) or cls.__name__.lower()

    def __repr__(self) -> str:
        return (
            f"{type(self).__name__}(split={self._split!r}, rows={self.num_rows}, "
            f"columns={self.column_names})"
        )

    # ------------------------------------------------------------------
    # table access
    # ------------------------------------------------------------------
    @property
    def table(self) -> pa.Table:
        return self._table

    @property
    def split(self) -> Optional[str]:
        return self._split

    @property
    def num_rows(self) -> int:
        return self._table.num_rows

    def __len__(self) -> int:
        return self.num_rows

    @property
    def column_names(self) -> List[str]:
        return list(self._table.column_names)

    @property
    def metadata(self) -> Dict[str, Any]:
        return self._metadata

    @property
    def img_to_row_map(self) -> Dict[str, int]:
        return self._img_to_row_map

    @property
    def imgids(self) -> List[str]:
        return list(self._img_to_row_map.keys())

    def __getitem__(self, idx: int) -> Dict[str, Any]:
        return self.get_idx(idx)

    def get_idx(self, idx: int) -> Dict[str, Any]:
        """Row at positional index as a python dict."""
        row = self._table.slice(idx, 1).to_pylist()[0]
        return row

    def has(self, img_id: str) -> bool:
        return str(img_id) in self._img_to_row_map

    def get(self, img_id: str) -> Dict[str, Any]:
        """Row for an image id (reference: abc/adapter.py:183-199)."""
        return self.get_idx(self._img_to_row_map[str(img_id)])

    def __iter__(self):
        for i in range(self.num_rows):
            yield self.get_idx(i)

    # ------------------------------------------------------------------
    # subsetting
    # ------------------------------------------------------------------
    def imgid_filter(self, keep: Iterable[str]) -> "Adapter":
        """Restrict to rows whose imgid is in ``keep``; remaps the row map
        (reference: abc/adapter.py:204-244)."""
        keep = {str(k) for k in keep}
        rows = sorted(
            idx for img, idx in self._img_to_row_map.items() if img in keep
        )
        sub = self._table.take(pa.array(rows, type=pa.int64()))
        old_by_row = {idx: img for img, idx in self._img_to_row_map.items()}
        new_map = {old_by_row[r]: i for i, r in enumerate(rows)}
        meta = dict(self._metadata)
        meta["img_to_row_map"] = new_map
        out = type(self).__new__(type(self))
        Adapter.__init__(out, sub, split=self._split, metadata=meta)
        return out

    # ------------------------------------------------------------------
    # metadata counters
    # ------------------------------------------------------------------
    @classmethod
    def _counter_columns(cls, schema: Mapping[str, Any]) -> List[str]:
        """String-typed non-id columns get frequency counters
        (reference: abc/adapter.py:464-470)."""
        cols = []
        for name, feat in schema.items():
            if name in _ID_KEYS:
                continue
            if _is_stringy(feat):
                cols.append(name)
        return cols

    @staticmethod
    def _update_counters(
        counters: Mapping[str, Counter], entry: Mapping[str, Any]
    ) -> None:
        for col, counter in counters.items():
            value = entry.get(col)
            if value is None:
                continue
            if isinstance(value, str):
                counter[value] += 1
            elif isinstance(value, (list, tuple)):
                for v in _flatten_strings(value):
                    counter[v] += 1

    # ------------------------------------------------------------------
    # arrow write
    # ------------------------------------------------------------------
    @classmethod
    def _write_entries(
        cls,
        entries: Iterable[Mapping[str, Any]],
        schema: Dict[str, Any],
        out_path: str,
        extra_metadata: Optional[Dict[str, Any]] = None,
        label_keys: Sequence[str] = (V.labels, V.label),
    ) -> "Adapter":
        """Stream ``entries`` into an arrow file at ``out_path`` with
        img_to_row_map + counters in the schema metadata, then reload.

        This is the shared core behind VisnDataset/VisnLangDataset/
        VisnExtraction extract() (reference: abc/adapter.py:359-379,
        visnadapter.py:136-182, visnlangadatper.py:239-283).
        """
        feats = HFFeatures(schema)
        counters = {c: Counter() for c in cls._counter_columns(schema)}
        img_to_row_map: Dict[str, int] = {}
        row = 0

        sink = pa.BufferOutputStream()
        writer = ArrowWriter(features=feats, stream=sink)
        batch: Dict[str, List] = {k: [] for k in schema}
        n_batched = 0

        def flush():
            nonlocal n_batched
            if n_batched:
                writer.write_batch(batch)
                for k in batch:
                    batch[k] = []
                n_batched = 0

        for entry in entries:
            if entry is None:
                continue
            imgid_val = str(entry.get(V.imgid, row))
            if V.imgid in schema:
                img_to_row_map.setdefault(imgid_val, row)
            cls._update_counters(counters, entry)
            for k in schema:
                batch[k].append(entry.get(k))
            n_batched += 1
            row += 1
            if n_batched >= cls._batch_size:
                flush()
        flush()
        writer.finalize()

        table = pa.ipc.open_stream(sink.getvalue()).read_all()
        meta: Dict[str, Any] = {"img_to_row_map": img_to_row_map}
        for col, counter in counters.items():
            meta[f"{col}_frequencies"] = dict(counter)
        if extra_metadata:
            meta.update(extra_metadata)
        table = set_metadata(table, meta)

        os.makedirs(os.path.dirname(out_path), exist_ok=True)
        # crash-atomic: a process dying mid-write must neither leave a
        # truncated .arrow where load() expects a dataset nor destroy an
        # existing one being re-extracted — write a same-dir temp file and
        # replace (same durability discipline as train/checkpoint.py)
        tmp_path = f"{out_path}.{os.getpid()}.tmp"
        try:
            with pa.OSFile(tmp_path, "wb") as f:
                with pa.ipc.new_stream(f, table.schema) as stream_writer:
                    stream_writer.write_table(table)
            os.replace(tmp_path, out_path)
        except BaseException:
            try:
                os.remove(tmp_path)
            except OSError:
                pass
            raise
        return cls._load_one_arrow(out_path)

    # ------------------------------------------------------------------
    # arrow load (zero-copy)
    # ------------------------------------------------------------------
    @classmethod
    def _load_one_arrow(cls, path: str, split: Optional[str] = None) -> "Adapter":
        """mmap + ipc stream read — zero-copy load
        (reference: abc/adapter.py:381-409)."""
        mm = pa.memory_map(path)
        table = pa.ipc.open_stream(mm).read_all()
        inst = cls.__new__(cls)
        Adapter.__init__(inst, table, split=split)
        return inst

    @classmethod
    def _split_from_filename(cls, filename: str) -> Optional[str]:
        stem = os.path.splitext(os.path.basename(filename))[0]
        for alias in V.SPLITALIASES:
            if stem == alias or stem.startswith(alias):
                return stem
        return stem

    @classmethod
    def load(
        cls, datadir: str, split: Optional[str] = None
    ) -> Union["Adapter", Dict[str, "Adapter"], None]:
        """Discover and load extracted arrow files for this adapter under
        ``{datadir}/{name}/`` (reference: abc/adapter.py:411-462).

        Returns a single Adapter when ``split`` is given (or only one file
        exists), else a dict split -> Adapter.
        """
        base = os.path.join(datadir, cls.name())
        if not os.path.isdir(base):
            return None
        found: Dict[str, Adapter] = {}
        for fname in sorted(os.listdir(base)):
            if not fname.endswith(".arrow"):
                continue
            fsplit = cls._split_from_filename(fname)
            if split is not None and fsplit != split and not (
                fname == "annotations.arrow"
            ):
                continue
            found[fsplit] = cls._load_one_arrow(
                os.path.join(base, fname), split=fsplit
            )
        if not found:
            return None
        if split is not None:
            # never hand back the annotations table as a missing text
            # split — callers use None to decide to (re)extract
            return found.get(split)
        if len(found) == 1:
            return next(iter(found.values()))
        return found

    # ------------------------------------------------------------------
    # download
    # ------------------------------------------------------------------
    @classmethod
    def download(cls, datadir: str) -> Optional[str]:
        """Fetch ``cls.urls`` into ``{datadir}/{name}`` and unpack archives,
        with temp-dir rollback on failure (reference: abc/adapter.py:82-157)."""
        if not cls.urls:
            return None
        urls = cls.urls
        if isinstance(urls, str):
            urls = [urls]
        if isinstance(urls, Mapping):
            urls = list(urls.values())
        dest = os.path.join(datadir, cls.name())
        os.makedirs(dest, exist_ok=True)
        tmp = tempfile.mkdtemp(prefix="vltk_dl_")
        try:
            for url in urls:
                fname = os.path.join(tmp, os.path.basename(url.split("?")[0]))
                urllib.request.urlretrieve(url, fname)
                _unpack(fname, tmp)
            for item in os.listdir(tmp):
                target = os.path.join(dest, item)
                if os.path.isdir(target):
                    shutil.rmtree(target)  # re-download: replace, don't nest
                elif os.path.exists(target):
                    os.remove(target)
                shutil.move(os.path.join(tmp, item), target)
            return dest
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    # ------------------------------------------------------------------
    # subclass surface
    # ------------------------------------------------------------------
    @classmethod
    def schema(cls, **kwargs) -> Dict[str, Any]:  # pragma: no cover - abstract
        raise NotImplementedError

    @classmethod
    def forward(cls, *args, **kwargs):  # pragma: no cover - abstract
        raise NotImplementedError

    @classmethod
    def full_schema(cls, **kwargs) -> Dict[str, Any]:
        """schema() + base features, with signature-filtered kwargs
        (reference: abc/extraction.py:89)."""
        user = cls.schema(**collect_args_to_func(cls.schema, kwargs))
        base = dict(getattr(cls, "_base_features", {}))
        base.update(user)
        return base


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def _is_stringy(feat: Any) -> bool:
    from datasets import Sequence as HFSequence
    from datasets import Value as HFValue

    if isinstance(feat, HFValue):
        return feat.dtype == "string"
    if isinstance(feat, HFSequence):
        return _is_stringy(feat.feature)
    return False


def _flatten_strings(value) -> Iterable[str]:
    if isinstance(value, str):
        yield value
    elif isinstance(value, (list, tuple)):
        for v in value:
            yield from _flatten_strings(v)


def _unpack(path: str, dest: str) -> None:
    if tarfile.is_tarfile(path):
        with tarfile.open(path) as tf:
            tf.extractall(dest, filter="data")
        os.remove(path)
    elif zipfile.is_zipfile(path):
        with zipfile.ZipFile(path) as zf:
            zf.extractall(dest)
        os.remove(path)
