"""General-purpose utilities: arrow metadata, json loading, dict algebra.

Covers the reference's utils/base.py surface (set_metadata:71-88,
try_load:97-110, batcher:91-94, mergedicts:30-43, get_arrow_primitive:370-374,
convertids_recursive:377-396, tensor_equality:276-287) with numpy/JAX in place
of torch.
"""

from __future__ import annotations

import contextlib
import json
import os
from typing import Any, Dict, Iterable, Iterator, List, Mapping, Optional

import numpy as np
import pyarrow as pa


# ---------------------------------------------------------------------------
# arrow metadata
# ---------------------------------------------------------------------------


def set_metadata(table: pa.Table, tbl_meta: Mapping[str, Any]) -> pa.Table:
    """Attach custom key/value metadata to a table's schema.

    Values are JSON-encoded; existing metadata (e.g. the huggingface features
    blob) is preserved. (reference: vltk/utils/base.py:71-88)
    """
    fields = [table.schema.field(i) for i in range(len(table.schema.names))]
    meta = dict(table.schema.metadata or {})
    for k, v in tbl_meta.items():
        meta[k.encode() if isinstance(k, str) else k] = json.dumps(
            v, default=_json_default
        ).encode()
    schema = pa.schema(fields, metadata=meta)
    return table.cast(schema)


def get_metadata(table: pa.Table) -> Dict[str, Any]:
    """Decode all JSON-parseable schema metadata entries."""
    out: Dict[str, Any] = {}
    for k, v in (table.schema.metadata or {}).items():
        key = k.decode() if isinstance(k, bytes) else k
        raw = v.decode() if isinstance(v, bytes) else v
        try:
            out[key] = json.loads(raw)
        except (json.JSONDecodeError, TypeError):
            out[key] = raw
    return out


def _json_default(obj):
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return obj.tolist()
    if isinstance(obj, set):
        return sorted(obj)
    from collections import Counter

    if isinstance(obj, Counter):
        return dict(obj)
    return str(obj)


# ---------------------------------------------------------------------------
# json / file loading
# ---------------------------------------------------------------------------


def try_load(path: str) -> Optional[Any]:
    """Load a .json or .jsonl file, returning None on failure
    (reference: vltk/utils/base.py:97-110)."""
    try:
        if path.endswith(".jsonl"):
            with open(path) as f:
                return [json.loads(line) for line in f if line.strip()]
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def load_yaml(path: str) -> Dict[str, Any]:
    import yaml

    with open(path) as f:
        return yaml.safe_load(f) or {}


# ---------------------------------------------------------------------------
# iteration / dict algebra
# ---------------------------------------------------------------------------


def batcher(iterable: Iterable, n: int = 64) -> Iterator[List]:
    """Yield successive lists of up to n items (reference: utils/base.py:91-94)."""
    batch: List = []
    for item in iterable:
        batch.append(item)
        if len(batch) == n:
            yield batch
            batch = []
    if batch:
        yield batch


def mergedicts(a: Mapping, b: Mapping) -> Dict:
    """Recursive dict merge, b wins (reference: utils/base.py:30-43)."""
    out = dict(a)
    for k, v in b.items():
        if k in out and isinstance(out[k], Mapping) and isinstance(v, Mapping):
            out[k] = mergedicts(out[k], v)
        else:
            out[k] = v
    return out


@contextlib.contextmanager
def dummy_context():
    yield


# ---------------------------------------------------------------------------
# arrow type helpers
# ---------------------------------------------------------------------------


def get_arrow_primitive(value: Any) -> str:
    """Classify a python value into the arrow primitive family used by
    metadata counters (reference: utils/base.py:370-374)."""
    if isinstance(value, bool):
        return "bool"
    if isinstance(value, str):
        return "string"
    if isinstance(value, int):
        return "int"
    if isinstance(value, float):
        return "float"
    if isinstance(value, (list, tuple)):
        return "list"
    return "other"


def convertids_recursive(entry: Any, metadata_ids: Mapping[str, Mapping[str, int]], key: Optional[str] = None) -> Any:
    """Convert string values to integer ids using per-column vocab maps
    (reference: utils/base.py:377-396)."""
    if isinstance(entry, dict):
        return {k: convertids_recursive(v, metadata_ids, k) for k, v in entry.items()}
    if isinstance(entry, (list, tuple)):
        return [convertids_recursive(v, metadata_ids, key) for v in entry]
    if isinstance(entry, str) and key is not None and key in metadata_ids:
        return metadata_ids[key].get(entry, -1)
    return entry


# ---------------------------------------------------------------------------
# numeric comparison (parity testing)
# ---------------------------------------------------------------------------


def tensor_equality(a, b, rtol: float = 1e-4, atol: float = 1e-5) -> bool:
    """allclose check across numpy / JAX / torch inputs
    (reference: utils/base.py:276-287)."""
    a = np.asarray(a)
    b = np.asarray(b)
    if a.shape != b.shape:
        return False
    return bool(np.allclose(a, b, rtol=rtol, atol=atol))


# ---------------------------------------------------------------------------
# misc
# ---------------------------------------------------------------------------


def ensure_dir(path: str) -> str:
    os.makedirs(path, exist_ok=True)
    return path


def load_labels(path: str = None, kind: str = "objects"):
    """VG class/attribute id -> name lists for FRCNN outputs
    (reference: vltk/compat.py:84-94 load_labels over libdata
    objects.txt/attributes.txt)."""
    from vltk_tpu import vars as V

    if path is None:
        path = V.OBJECTSPATH if kind == "objects" else V.ATTRIBUTESPATH
    with open(path) as f:
        return [line.strip() for line in f if line.strip()]


def send_email(address: str, subject: str, body: str, host: str = "localhost") -> bool:
    """Crash/status notification (reference: vltk/utils/base.py:152-164,
    wired to the CLI's atexit crash handler future/cli.py:18-41). Returns
    False instead of raising when no mail transport is reachable."""
    import smtplib
    from email.message import EmailMessage

    msg = EmailMessage()
    msg["From"] = address
    msg["To"] = address
    msg["Subject"] = subject
    msg.set_content(body)
    try:
        with smtplib.SMTP(host, timeout=5) as server:
            server.send_message(msg)
        return True
    except OSError:
        return False
