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


@needs_native
def test_maskops_fuzz_valid_inputs_match_fallback():
    """Random VALID RLE / point-run inputs: native kernel == numpy
    fallback bit-for-bit across shapes."""
    import os

    from vltk_tpu.native import masks
    from vltk_tpu.utils import adapters as ua

    def fallback(fn, *a):
        os.environ["VLTK_NO_NATIVE"] = "1"
        try:
            return fn(*a)
        finally:
            del os.environ["VLTK_NO_NATIVE"]

    rng = np.random.default_rng(7)
    for _ in range(40):
        h, w = int(rng.integers(1, 40)), int(rng.integers(1, 40))
        runs, left = [], h * w
        while left > 0 and rng.random() > 0.05:
            r = int(rng.integers(1, left + 1))
            runs.append(r)
            left -= r
        got = masks.rle_decode(runs, h, w)
        want = fallback(ua.rle_decode, runs, h, w)
        np.testing.assert_array_equal(got, want, err_msg=f"rle {runs} {h}x{w}")

        pts = []
        for _ in range(int(rng.integers(0, 6))):
            pts += [int(rng.integers(0, h * w)), int(rng.integers(0, h * w))]
        got = masks.points_decode(pts, h, w)
        want = fallback(ua.imagepoints_to_mask, pts, (h, w))
        np.testing.assert_array_equal(got, want, err_msg=f"pts {pts} {h}x{w}")


@needs_native
def test_maskops_adversarial_inputs_are_safe():
    """Malformed decode inputs (negative runs, huge or non-finite
    coordinates, degenerate polygons) must yield a valid {0,1} mask of the
    right shape — never an out-of-bounds write, UB cast, or spin."""
    from vltk_tpu.native import masks

    h, w = 16, 24
    for counts in ([-5, 9999999, -3, 4], [0, -1, 2**40, 3], [-(2**50)] * 8):
        m = masks.rle_decode(counts, h, w)
        assert m.shape == (h, w) and set(np.unique(m)) <= {0, 1}
    # semantics: a negative count is a zero-length run that still toggles
    m = masks.rle_decode([-5, 9999999], h, w)
    assert m.all()

    for pts in ([-100, 5, 10**15, 10**15, 5, -7], [2**62, 2**62]):
        m = masks.points_decode(pts, h, w)
        assert m.shape == (h, w) and set(np.unique(m)) <= {0, 1}
    # negative start must clamp to 0, not wrap to the end of the mask
    m = masks.points_decode([-100, 5], h, w)
    assert m.ravel()[:5].all() and m.sum() == 5

    bad_polys = [
        [[float("nan")] * 8],
        [[float("inf"), 0.0, 5.0, 5.0, 0.0, 5.0]],
        [[1e30, 1e30, -1e30, 1e30, 0.0, -1e30]],
        [[0.0, 0.0]],
        [[0.0, 0.0, 1.0, 1.0]],
        [[]],
        [[5.0, 5.0, 5.0, 5.0, 5.0, 5.0]],
        [[-50.0, -50.0, 100.0, -50.0, 23.5, 100.0]],
    ]
    for polys in bad_polys:
        m = masks.polygons_fill(polys, h, w)
        assert m.shape == (h, w) and set(np.unique(m)) <= {0, 1}
    # the canvas-crossing triangle must still fill real area
    assert masks.polygons_fill(bad_polys[-1], h, w).sum() > 20


@needs_native
def test_wordpiece_fuzz_ascii_parity_vs_hf():
    """200 random ASCII strings + pathological repeats: native WordPiece
    must match HF ids/masks exactly (truncation + padding included)."""
    import random
    import string

    from tokenizers import BertWordPieceTokenizer

    from vltk_tpu.native.wordpiece import NativeWordPiece

    hf = BertWordPieceTokenizer(V.VOCABPATH, lowercase=True)
    hf.enable_truncation(24)
    hf.enable_padding(
        length=24, pad_id=hf.token_to_id("[PAD]"), pad_token="[PAD]"
    )
    nat = NativeWordPiece(V.VOCABPATH, lowercase=True, max_seq_length=24)
    rng = random.Random(99)
    pool = string.ascii_letters + string.digits + string.punctuation + "  \t"
    cases = [
        "".join(rng.choice(pool) for _ in range(rng.randrange(0, 48)))
        for _ in range(200)
    ]
    cases += ["a" * 500, ("ab " * 200).strip(), "-" * 64, "don't stop",
              "x" + "!" * 30, " leading and trailing  "]
    nat_encs = nat.encode_batch(cases)
    hf_encs = hf.encode_batch(cases)
    for i, s in enumerate(cases):
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
def test_wordpiece_unicode_fuzz_well_formed():
    """Arbitrary unicode (CJK, emoji, combining marks, zero-width) must
    never crash the native tokenizer; outputs must be well-formed: CLS
    first, ids within vocab, mask consistent with padding."""
    import random

    from vltk_tpu.native.wordpiece import NativeWordPiece

    nat = NativeWordPiece(V.VOCABPATH, lowercase=True, max_seq_length=16)
    rng = random.Random(3)
    cases = []
    for _ in range(60):
        n = rng.randrange(0, 24)
        cases.append("".join(
            chr(rng.choice([
                rng.randrange(32, 0x2FF),
                rng.randrange(0x4E00, 0x9FFF),
                rng.randrange(0x1F300, 0x1F64F),
            ]))
            for _ in range(n)
        ))
    cases += ["é" * 50, "ü ö ß", "​​zero width", "á mark",
              "مرحبا بالعالم", "здравствуйте"]
    enc = nat.encode_batch(cases)
    ids, mask = enc["input_ids"], enc["attention_mask"]
    assert ids.shape == (len(cases), 16) and mask.shape == ids.shape
    assert (ids[:, 0] == nat.cls_id).all()
    assert ((ids >= 0) & (ids < nat.vocab_size)).all()
    # mask is 1 exactly where ids != pad (pad_id never doubles as content)
    np.testing.assert_array_equal(mask, (ids != nat.pad_id).astype(np.int32))
    # every row ends its real content with SEP (truncated or not)
    lengths = mask.sum(axis=1)
    for r, n in enumerate(lengths):
        assert ids[r, n - 1] == nat.sep_id, (cases[r], ids[r])


@needs_native
def test_wordpiece_encode_words_fuzz_ascii():
    """Random ASCII 'words' (incl. punctuation runs and long tokens):
    per-word sub-token ids must match HF exactly."""
    import random
    import string

    from tokenizers import BertWordPieceTokenizer

    from vltk_tpu.native.wordpiece import NativeWordPiece

    hf = BertWordPieceTokenizer(V.VOCABPATH, lowercase=True)
    nat = NativeWordPiece(V.VOCABPATH, lowercase=True)
    rng = random.Random(41)
    pool = string.ascii_lowercase + string.digits + "-'./"
    words = [
        "".join(rng.choice(pool) for _ in range(rng.randrange(1, 24)))
        for _ in range(150)
    ] + ["x" * 120, "----", "a.b.c", "1-800-cat", "''"]
    got = nat.encode_words(words)
    for w, ids in zip(words, got):
        want = hf.encode(w, add_special_tokens=False).ids
        assert ids == want, (w, ids, want)
