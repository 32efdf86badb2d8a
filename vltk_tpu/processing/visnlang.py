"""Cross-modal processors (reference: vltk/processing/visnlang.py)."""

from __future__ import annotations

import numpy as np

from vltk_tpu import vars as V
from vltk_tpu.processing.processor import VisnLangProcessor


class Span(VisnLangProcessor):
    """Expand a word-level (start, end) answer span through the tokenmap to
    sub-token start/end labels (reference: processing/visnlang.py:9-29)."""

    keys = (V.span, V.tokenmap)

    def setup(
        self,
        max_visual_seq_length: int = 128,
        ignore_id: int = -100,
        add_visual_cls: bool = False,
    ):
        self.max_len = max_visual_seq_length
        self.ignore_id = ignore_id
        self.add_visual_cls = add_visual_cls

    def forward(self, entry, **kwargs):
        start, end = (int(x) for x in entry.pop(V.span))
        if self.add_visual_cls:
            # AuxTokenize prepended a CLS word to the tokenmap: word-level
            # annotation indices shift by one
            start += 1
            end += 1
        tokenmap = np.asarray(entry[V.tokenmap])
        valid = tokenmap != self.ignore_id
        counts = np.where(valid, tokenmap, 0)
        # sub-token offset of each word = cumulative count of prior words
        offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
        n_words = int(valid.sum())
        if start >= n_words:
            entry["span_start"] = np.int32(self.ignore_id)
            entry["span_end"] = np.int32(self.ignore_id)
            return entry
        end = min(end, n_words - 1)
        sub_start = int(offsets[start])
        sub_end = int(offsets[end] + counts[end] - 1)
        sub_start = min(sub_start, self.max_len - 1)
        sub_end = min(sub_end, self.max_len - 1)
        entry["span_start"] = np.int32(sub_start)
        entry["span_end"] = np.int32(sub_end)
        return entry
