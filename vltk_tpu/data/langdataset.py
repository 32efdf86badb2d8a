"""Language-side entry handling: tokenize + labels -> fixed-shape arrays.

Re-design of reference vltk/dataset/langdataset.py. Every output is a
static-shape numpy array (ragged token streams and variable label lists are
padded/truncated at entry time, not collate time — the shape-stability
inversion for XLA, SURVEY §3.2).
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Sequence

import threading

import numpy as np

from vltk_tpu import vars as V
from vltk_tpu.data.tokenizer import Tokenizer, build_tokenizer
from vltk_tpu.processing import lang as lang_ops


class LangHandler:
    """Tokenization + label-id mapping + pretraining corruptions
    (reference: langdataset.py:47-221)."""

    def __init__(
        self,
        lang_config,
        metadata_ids: Optional[Mapping[str, Mapping[str, int]]] = None,
        lang_processors: Sequence[str] = (),
        seed: int = 0,
    ):
        self.config = lang_config
        self.tokenizer: Tokenizer = build_tokenizer(lang_config)
        self.metadata_ids = dict(metadata_ids or {})
        self.lang_processors = tuple(p.lower() for p in lang_processors)
        # loader worker threads each get their own Generator — a shared
        # np.random.Generator is not thread-safe and breaks reproducibility
        self._seed_seq = np.random.SeedSequence(seed)
        self._rng_lock = threading.Lock()
        self._tls = threading.local()
        self.max_labels = 16  # FIXED_SHAPE_KEYS[labels]

    @property
    def rng(self) -> np.random.Generator:
        rng = getattr(self._tls, "rng", None)
        if rng is None:
            with self._rng_lock:
                rng = np.random.default_rng(self._seed_seq.spawn(1)[0])
            self._tls.rng = rng
        return rng

    # ------------------------------------------------------------------
    def answer_id(self, label: str) -> int:
        table = self.metadata_ids.get("answers", {})
        return int(table.get(label, self.config.ignore_id))

    def encode_entry(self, entry: Dict[str, Any]) -> Dict[str, Any]:
        """One text row -> fixed-shape token/label arrays."""
        out = dict(entry)
        enc = self.tokenizer.encode(str(entry.get(V.text, "")))
        out.update(enc)
        self._attach_labels(out)
        self._run_processors(out)
        return out

    def encode_batch(self, entries: List[Dict[str, Any]]) -> List[Dict[str, Any]]:
        """img_first path: all sentences of one image in one tokenizer call
        (reference: visnlangdataset.py:253-265)."""
        texts = [str(e.get(V.text, "")) for e in entries]
        encs = self.tokenizer.encode_batch(texts)
        outs = []
        for e, enc in zip(entries, encs):
            o = dict(e)
            o.update(enc)
            self._attach_labels(o)
            self._run_processors(o)
            outs.append(o)
        return outs

    # ------------------------------------------------------------------
    def _attach_labels(self, out: Dict[str, Any]) -> None:
        """label strings + soft scores -> fixed (max_labels,) id/score
        arrays plus a scalar sampled ``label`` (reference:
        langdataset.py:160-221 _handle_text_label)."""
        ignore = self.config.ignore_id
        raw_labels = out.pop(V.label, None)
        raw_scores = out.pop(V.score, None)
        if raw_labels is None:
            raw_labels = out.pop(V.labels, None)
            raw_scores = out.pop(V.scores, raw_scores)
        if raw_labels is None:
            return
        if isinstance(raw_labels, str):
            raw_labels = [raw_labels]
        if raw_scores is None:
            raw_scores = [1.0] * len(raw_labels)
        ids = [self.answer_id(l) for l in raw_labels][: self.max_labels]
        scores = [float(s) for s in raw_scores][: self.max_labels]
        # drop unknown-answer slots
        pairs = [(i, s) for i, s in zip(ids, scores) if i != ignore]
        ids = [i for i, _ in pairs]
        scores = [s for _, s in pairs]
        n = len(ids)
        pad = self.max_labels - n
        out[V.labels] = np.asarray(ids + [ignore] * pad, np.int32)
        out[V.scores] = np.asarray(scores + [0.0] * pad, np.float32)
        out[V.label] = np.int32(
            lang_ops.one_hot_label(ids, scores, self.rng, ignore_id=ignore)
        )

    def _run_processors(self, out: Dict[str, Any]) -> None:
        cfg = self.config
        if "masked_language_modeling" in self.lang_processors:
            ids, masked_labels = lang_ops.masked_language_modeling(
                out[V.input_ids],
                out[V.text_attention_mask],
                self.rng,
                mask_token_id=self.tokenizer.mask_id,
                vocab_size=self.tokenizer.vocab_size,
                special_ids=self.tokenizer.special_ids,
                mask_rate=cfg.mask_rate,
                mask_token_rate=cfg.mask_token_rate,
                random_token_rate=cfg.random_token_rate,
                ignore_id=cfg.ignore_id,
            )
            out[V.input_ids] = ids
            out["masked_labels"] = masked_labels
