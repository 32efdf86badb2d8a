"""Native C++ components: build, WordPiece parity vs HF Rust tokenizers,
mask-op parity vs the NumPy/PIL fallbacks."""

import numpy as np
import pytest

from vltk_tpu import native
from vltk_tpu import vars as V


needs_native = pytest.mark.skipif(
    not native.available(), reason="native toolchain unavailable"
)

SENTENCES = [
    "What color is the man's shirt?",
    "How many zebras are standing near the water?",
    "a close up of a pizza with toppings",
    "Is the UMBRELLA red, or is it blue-green?",
    "词 mixed CJK 语 test",
    "weird   spacing\tand\nnewlines",
    "supercalifragilisticexpialidocious antidisestablishmentarianism",
    "",
    "!!!",
    "numbers 12345 and punct: a,b.c;d",
]


@needs_native
def test_wordpiece_parity_vs_hf():
    from tokenizers import BertWordPieceTokenizer

    from vltk_tpu.native.wordpiece import NativeWordPiece

    hf = BertWordPieceTokenizer(V.VOCABPATH, lowercase=True)
    hf.enable_truncation(32)
    hf.enable_padding(length=32, pad_id=hf.token_to_id("[PAD]"), pad_token="[PAD]")
    nat = NativeWordPiece(V.VOCABPATH, lowercase=True, max_seq_length=32)

    hf_encs = hf.encode_batch(SENTENCES)
    nat_encs = nat.encode_batch(SENTENCES)
    for i, s in enumerate(SENTENCES):
        np.testing.assert_array_equal(
            nat_encs["input_ids"][i],
            np.asarray(hf_encs[i].ids, np.int32),
            err_msg=f"ids mismatch on {s!r}",
        )
        np.testing.assert_array_equal(
            nat_encs["attention_mask"][i],
            np.asarray(hf_encs[i].attention_mask, np.int32),
            err_msg=f"mask mismatch on {s!r}",
        )


@needs_native
def test_wordpiece_encode_words_parity():
    from tokenizers import BertWordPieceTokenizer

    from vltk_tpu.native.wordpiece import NativeWordPiece

    words = ["Header", "unaffordable", "x-ray", "the", "Zürich".encode().decode()]
    hf = BertWordPieceTokenizer(V.VOCABPATH, lowercase=True)
    nat = NativeWordPiece(V.VOCABPATH, lowercase=True)
    got = nat.encode_words(words)
    for w, ids in zip(words, got):
        if not w.isascii():
            continue  # NFD accent-stripping not implemented natively
        want = hf.encode(w, add_special_tokens=False).ids
        assert ids == want, (w, ids, want)


@needs_native
def test_tokenizer_facade_native_backend():
    from vltk_tpu.data.tokenizer import Tokenizer

    tok = Tokenizer(name="NativeWordPiece", max_seq_length=16)
    enc = tok.encode("What color is the sky?")
    assert enc[V.input_ids].shape == (16,)
    assert enc[V.input_ids][0] == tok.cls_id
    assert tok.vocab_size > 30000
    sub = tok.encode_words(["unaffordable", "sky"])
    assert len(sub) == 2 and len(sub[0]) >= 2
    text = tok.decode(enc[V.input_ids])
    assert "color" in text


@needs_native
def test_rle_decode_parity():
    import os

    from vltk_tpu.native import masks

    h, w = 13, 7
    counts = [5, 10, 3, 20, 1, 13, 4, h * w - 56]
    got = masks.rle_decode(counts, h, w)
    # numpy fallback path
    os.environ["VLTK_NO_NATIVE"] = "1"
    try:
        from vltk_tpu.utils.adapters import rle_decode

        want = rle_decode(counts, h, w)
    finally:
        del os.environ["VLTK_NO_NATIVE"]
    np.testing.assert_array_equal(got, want)


@needs_native
def test_points_decode_parity():
    import os

    from vltk_tpu.native import masks

    pts = [0, 4, 10, 3, 30, 5]
    got = masks.points_decode(pts, 6, 8)
    os.environ["VLTK_NO_NATIVE"] = "1"
    try:
        from vltk_tpu.utils.adapters import imagepoints_to_mask

        want = imagepoints_to_mask(pts, (6, 8))
    finally:
        del os.environ["VLTK_NO_NATIVE"]
    np.testing.assert_array_equal(got, want)


@needs_native
def test_polygons_fill_close_to_pil():
    """Scanline fill vs PIL fill agree up to boundary pixels."""
    import os

    from vltk_tpu.native import masks

    rng = np.random.default_rng(0)
    for _ in range(5):
        # random convex-ish polygon
        angles = np.sort(rng.uniform(0, 2 * np.pi, 8))
        r = rng.uniform(12, 22)
        cx, cy = rng.uniform(28, 36, 2)
        poly = np.stack([cx + r * np.cos(angles), cy + r * np.sin(angles)], -1)
        flat = [poly.ravel().tolist()]
        got = masks.polygons_fill(flat, 64, 64)
        os.environ["VLTK_NO_NATIVE"] = "1"
        try:
            from vltk_tpu.utils.adapters import polygon_to_mask

            want = polygon_to_mask(flat, 64, 64)
        finally:
            del os.environ["VLTK_NO_NATIVE"]
        inter = np.sum((got > 0) & (want > 0))
        union = np.sum((got > 0) | (want > 0))
        assert union > 0
        assert inter / union > 0.9, f"IoU {inter/union:.3f}"


@needs_native
def test_polygon_area_sanity():
    """A 10x10 axis-aligned square fills ~100 pixels."""
    from vltk_tpu.native import masks

    square = [[5.0, 5.0, 15.0, 5.0, 15.0, 15.0, 5.0, 15.0]]
    got = masks.polygons_fill(square, 30, 30)
    assert 95 <= int(got.sum()) <= 125
    # fully inside rows are solid
    assert got[10, 6:14].all()


@needs_native
def test_wordpiece_tiny_max_len_no_overflow():
    """max_seq_length < 2 must not write past the row buffer."""
    from vltk_tpu.native.wordpiece import NativeWordPiece

    nat = NativeWordPiece(V.VOCABPATH, max_seq_length=1)
    enc = nat.encode_batch(["hello world", ""])
    assert enc["input_ids"].shape == (2, 1)
    assert (enc["input_ids"][:, 0] == nat.cls_id).all()


def test_build_dir_falls_back_when_package_unwritable(monkeypatch, tmp_path):
    """Wheel installs into root-owned site-packages leave the in-package
    _build dir unwritable; the builder must fall back to the user cache
    instead of losing the native fast path."""
    # a path under /dev/null cannot be created -> makedirs raises OSError
    monkeypatch.setattr(native, "_BUILD_DIR", "/dev/null/_build")
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path))
    got = native._build_dir()
    assert got == str(tmp_path / "vltk_tpu" / "native")
    import os

    assert os.path.isdir(got)


def test_build_dir_prefers_in_package_cache():
    assert native._build_dir() == native._BUILD_DIR


def test_prebuilt_so_found_before_writability_probe(monkeypatch, tmp_path):
    """A .so pre-built into a READ-ONLY install (the deploy box without
    g++) must be found and used — the lookup cannot depend on the package
    dir being writable."""
    pkg = tmp_path / "pkg_build"
    pkg.mkdir()
    so = pkg / f"libvltk_native_{native._source_hash()}.so"
    so.write_bytes(b"")
    monkeypatch.setattr(native, "_BUILD_DIR", str(pkg))
    # simulate every location read-only: if _build still probed
    # writability before looking for the existing .so, it would rebuild
    # (or return None) instead of loading the shipped library
    monkeypatch.setattr(native, "_build_dir", lambda: None)
    assert native._build() == str(so)


def test_everything_unwritable_returns_none(monkeypatch, tmp_path):
    """lib()'s contract is 'CDLL or None': a sandboxed host where both the
    package dir and the cache home are unwritable must degrade to the pure
    Python fallbacks, not crash with PermissionError."""
    import os as _os

    monkeypatch.setattr(native, "_BUILD_DIR", str(tmp_path / "pkg"))
    monkeypatch.setenv("XDG_CACHE_HOME", str(tmp_path / "cache"))
    real_makedirs = _os.makedirs

    def deny(path, *a, **k):
        if str(tmp_path) in str(path):
            raise PermissionError(f"read-only: {path}")
        return real_makedirs(path, *a, **k)

    monkeypatch.setattr(native.os, "makedirs", deny)
    assert native._build_dir() is None
    assert native._build() is None
