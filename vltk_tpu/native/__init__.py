"""Native (C++) host-runtime components.

The reference had zero first-party native code — its native capability came
from dependency kernels (HF tokenizers Rust, pycocotools C; SURVEY §2.10).
Here the host hot paths are first-party C++, compiled on first use with the
system toolchain and bound via ctypes (no pybind11 in the image):

  * wordpiece.cpp — WordPiece tokenizer (threaded batch encode)
  * maskops.cpp   — RLE / point-run / polygon -> mask rasterization

``lib()`` returns the loaded CDLL or None; callers fall back to the pure
NumPy/PIL implementations when the toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import Optional

_SRC_DIR = os.path.join(os.path.dirname(__file__), "src")
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_build")
_SOURCES = ("wordpiece.cpp", "maskops.cpp")

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _source_hash() -> str:
    digest = hashlib.sha256()
    for name in _SOURCES:
        with open(os.path.join(_SRC_DIR, name), "rb") as f:
            digest.update(f.read())
    return digest.hexdigest()[:16]


def _candidate_dirs():
    """Places a built .so may live, in lookup/build-preference order: the
    in-package cache, then a per-user cache for read-only installs (wheel
    into root-owned site-packages) — losing write access must cost a
    one-time rebuild location, not the native fast path."""
    yield _BUILD_DIR
    yield os.path.join(
        os.environ.get(
            "XDG_CACHE_HOME",
            os.path.join(os.path.expanduser("~"), ".cache"),
        ),
        "vltk_tpu",
        "native",
    )


def _build_dir() -> Optional[str]:
    """First candidate dir we can actually write to; None when every
    location is read-only (callers then fall back to pure Python)."""
    for d in _candidate_dirs():
        try:
            os.makedirs(d, exist_ok=True)
            probe = os.path.join(d, f".w{os.getpid()}")
            with open(probe, "w"):
                pass
            os.remove(probe)
            return d
        except OSError:
            continue
    return None


def _build() -> Optional[str]:
    so_name = f"libvltk_native_{_source_hash()}.so"
    # a prebuilt .so anywhere wins BEFORE any writability probing: a
    # read-only install with the library pre-built (the deploy box that
    # may not even have g++) must load it, not rebuild per user
    for d in _candidate_dirs():
        existing = os.path.join(d, so_name)
        if os.path.exists(existing):
            return existing
    build_dir = _build_dir()
    if build_dir is None:
        return None
    so_path = os.path.join(build_dir, so_name)
    # per-process tmp name: concurrent cold-start builds (loader workers)
    # must not truncate each other's output; the atomic replace means the
    # last finisher wins and everyone loads a complete .so
    tmp = f"{so_path}.{os.getpid()}.tmp"
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-pthread",
        *(os.path.join(_SRC_DIR, s) for s in _SOURCES),
        "-o", tmp,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        os.replace(tmp, so_path)
    except (OSError, subprocess.SubprocessError):
        return so_path if os.path.exists(so_path) else None
    return so_path


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    c = ctypes
    i32p, i64p = c.POINTER(c.c_int32), c.POINTER(c.c_int64)
    u8p, f64p = c.POINTER(c.c_uint8), c.POINTER(c.c_double)
    ccharpp = c.POINTER(c.c_char_p)

    lib.vltk_wp_new.restype = c.c_void_p
    lib.vltk_wp_new.argtypes = [c.c_char_p, c.c_int]
    lib.vltk_wp_free.argtypes = [c.c_void_p]
    lib.vltk_wp_vocab_size.restype = c.c_int32
    lib.vltk_wp_vocab_size.argtypes = [c.c_void_p]
    lib.vltk_wp_token_id.restype = c.c_int32
    lib.vltk_wp_token_id.argtypes = [c.c_void_p, c.c_char_p]
    lib.vltk_wp_encode_batch.argtypes = [
        c.c_void_p, ccharpp, c.c_int64, c.c_int32, c.c_int,
        i32p, i32p, i32p, c.c_int32,
    ]
    lib.vltk_wp_encode_words.restype = c.c_int64
    lib.vltk_wp_encode_words.argtypes = [
        c.c_void_p, ccharpp, c.c_int64, i32p, c.c_int64, i32p,
    ]

    lib.vltk_rle_decode.argtypes = [i64p, c.c_int64, u8p, c.c_int64, c.c_int64]
    lib.vltk_points_decode.argtypes = [i64p, c.c_int64, u8p, c.c_int64]
    lib.vltk_polygons_fill.argtypes = [
        f64p, i64p, c.c_int64, u8p, c.c_int64, c.c_int64,
    ]
    return lib


def lib() -> Optional[ctypes.CDLL]:
    """Compile (once) and load the native library; None if unavailable.

    Disable with VLTK_NO_NATIVE=1 (tests the fallback paths)."""
    global _lib, _tried
    if os.environ.get("VLTK_NO_NATIVE") == "1":
        return None
    with _lock:
        if _tried:
            return _lib
        _tried = True
        so_path = _build()
        if so_path is None:
            return None
        try:
            _lib = _bind(ctypes.CDLL(so_path))
        except OSError:
            _lib = None
        return _lib


def available() -> bool:
    return lib() is not None
