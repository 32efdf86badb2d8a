"""ctypes wrapper over the native WordPiece tokenizer (src/wordpiece.cpp)."""

from __future__ import annotations

import ctypes
import os
from typing import Dict, List, Optional, Sequence

import numpy as np

from vltk_tpu import native


class NativeWordPiece:
    """First-party C++ WordPiece encoder with the Tokenizer-facade surface
    (fixed-length int32 outputs). Raises RuntimeError if the native library
    is unavailable — callers pick the HF backend instead."""

    def __init__(
        self,
        vocab_path: str,
        lowercase: bool = True,
        max_seq_length: int = 128,
        n_threads: Optional[int] = None,
    ):
        self._lib = native.lib()
        if self._lib is None:
            raise RuntimeError("native library unavailable (no g++ or build failed)")
        self._h = self._lib.vltk_wp_new(vocab_path.encode(), int(lowercase))
        if not self._h:
            raise RuntimeError(f"failed to load vocab from {vocab_path!r}")
        self.max_seq_length = int(max_seq_length)
        self.n_threads = n_threads or min(os.cpu_count() or 1, 8)

        tid = lambda t: int(self._lib.vltk_wp_token_id(self._h, t.encode()))
        self.cls_token, self.sep_token = "[CLS]", "[SEP]"
        self.pad_token, self.mask_token, self.unk_token = "[PAD]", "[MASK]", "[UNK]"
        self.cls_id, self.sep_id = tid("[CLS]"), tid("[SEP]")
        self.pad_id, self.mask_id, self.unk_id = (
            tid("[PAD]"), tid("[MASK]"), tid("[UNK]"),
        )
        self.vocab_size = int(self._lib.vltk_wp_vocab_size(self._h))

    def __del__(self):
        if getattr(self, "_h", None) and getattr(self, "_lib", None):
            self._lib.vltk_wp_free(self._h)
            self._h = None

    def token_to_id(self, token: str) -> Optional[int]:
        out = int(self._lib.vltk_wp_token_id(self._h, token.encode()))
        return None if out < 0 else out

    def encode_batch(
        self, texts: Sequence[str], add_special_tokens: bool = True
    ) -> Dict[str, np.ndarray]:
        """-> {input_ids, type_ids, attention_mask}: (N, L) int32."""
        n, L = len(texts), self.max_seq_length
        ids = np.empty((n, L), np.int32)
        mask = np.empty((n, L), np.int32)
        type_ids = np.empty((n, L), np.int32)
        arr = (ctypes.c_char_p * n)(*[t.encode() for t in texts])
        i32p = ctypes.POINTER(ctypes.c_int32)
        self._lib.vltk_wp_encode_batch(
            self._h, arr, n, L, int(add_special_tokens),
            ids.ctypes.data_as(i32p),
            mask.ctypes.data_as(i32p),
            type_ids.ctypes.data_as(i32p),
            self.n_threads,
        )
        return {"input_ids": ids, "type_ids": type_ids, "attention_mask": mask}

    def encode_words(self, words: Sequence[str]) -> List[List[int]]:
        """Per-word sub-token ids, no specials/padding (OCR path)."""
        n = len(words)
        if n == 0:
            return []
        arr = (ctypes.c_char_p * n)(*[w.encode() for w in words])
        lens = np.empty(n, np.int32)
        i32p = ctypes.POINTER(ctypes.c_int32)
        cap = max(16, 8 * n)
        while True:
            flat = np.empty(cap, np.int32)
            total = int(
                self._lib.vltk_wp_encode_words(
                    self._h, arr, n,
                    flat.ctypes.data_as(i32p), cap,
                    lens.ctypes.data_as(i32p),
                )
            )
            if total <= cap:
                break
            cap = total
        out, pos = [], 0
        for ln in lens:
            out.append(flat[pos : pos + int(ln)].tolist())
            pos += int(ln)
        return out
