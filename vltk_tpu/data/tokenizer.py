"""Tokenizer facade.

Normalizes the two tokenizer families the reference supported — HF
``tokenizers`` (Rust, by class name) and ``transformers`` fast tokenizers —
behind one object with uniform special-token ids and fixed-length encode
(reference: vltk/dataset/basedataset.py:221-343).

Tokenization is host-side work (the Rust core is the native data plane
here, exactly as in the reference; see SURVEY §2.10 N5); outputs are always
fixed-shape int32 numpy arrays sized ``max_seq_length`` so device batches
never see ragged token streams.
"""

from __future__ import annotations

from typing import  Dict, List, Optional, Sequence

import numpy as np

from vltk_tpu import vars as V


class Tokenizer:
    """Uniform wrapper: WordPiece via HF tokenizers, or any transformers
    fast tokenizer by class name."""

    def __init__(
        self,
        name: str = "BertWordPieceTokenizer",
        from_transformers: bool = False,
        vocab_path: Optional[str] = None,
        lowercase: bool = True,
        max_seq_length: int = 128,
    ):
        self.name = name
        self.from_transformers = from_transformers
        self.lowercase = bool(lowercase)
        self.max_seq_length = int(max_seq_length)
        vocab_path = vocab_path or V.VOCABPATH
        self._vocab_path = vocab_path

        if name == "NativeWordPiece":
            # first-party C++ WordPiece (vltk_tpu/native/src/wordpiece.cpp)
            # — replaces the Rust `tokenizers` dependency (SURVEY §2.10 N5)
            from vltk_tpu.native.wordpiece import NativeWordPiece

            self._tok = NativeWordPiece(
                vocab_path, lowercase=lowercase, max_seq_length=self.max_seq_length
            )
            self.cls_token, self.sep_token = "[CLS]", "[SEP]"
            self.pad_token, self.mask_token, self.unk_token = (
                "[PAD]", "[MASK]", "[UNK]",
            )
            self.cls_id = self._tok.cls_id
            self.sep_id = self._tok.sep_id
            self.pad_id = self._tok.pad_id
            self.mask_id = self._tok.mask_id
            self.unk_id = self._tok.unk_id
            self.vocab_size = self._tok.vocab_size
            self._id_to_token = None
        elif from_transformers:
            import transformers

            cls = getattr(transformers, name)
            self._tok = cls.from_pretrained(vocab_path)
            self.cls_token = self._tok.cls_token
            self.sep_token = self._tok.sep_token
            self.pad_token = self._tok.pad_token
            self.mask_token = self._tok.mask_token
            self.unk_token = self._tok.unk_token
            conv = self._tok.convert_tokens_to_ids
            self.cls_id = conv(self.cls_token)
            self.sep_id = conv(self.sep_token)
            self.pad_id = conv(self.pad_token)
            self.mask_id = conv(self.mask_token)
            self.unk_id = conv(self.unk_token)
            self.vocab_size = self._tok.vocab_size
        else:
            from tokenizers import BertWordPieceTokenizer

            if name != "BertWordPieceTokenizer":
                raise ValueError(
                    f"unknown tokenizers-class {name!r}; use from_transformers "
                    "for other families"
                )
            self._tok = BertWordPieceTokenizer(vocab_path, lowercase=lowercase)
            # configure once — mutating options per call is not thread-safe
            # with the Rust core ("Already borrowed" under loader threads)
            self._tok.enable_truncation(self.max_seq_length)
            self._tok.enable_padding(
                length=self.max_seq_length,
                pad_id=self._tok.token_to_id("[PAD]"),
                pad_token="[PAD]",
            )
            self._word_tok = BertWordPieceTokenizer(vocab_path, lowercase=lowercase)
            self.cls_token, self.sep_token = "[CLS]", "[SEP]"
            self.pad_token, self.mask_token, self.unk_token = (
                "[PAD]", "[MASK]", "[UNK]",
            )
            t2i = self._tok.token_to_id
            self.cls_id = t2i(self.cls_token)
            self.sep_id = t2i(self.sep_token)
            self.pad_id = t2i(self.pad_token)
            self.mask_id = t2i(self.mask_token)
            self.unk_id = t2i(self.unk_token)
            self.vocab_size = self._tok.get_vocab_size()

    @property
    def special_ids(self) -> List[int]:
        return [self.cls_id, self.sep_id, self.pad_id, self.mask_id, self.unk_id]

    # ------------------------------------------------------------------
    # encoding
    # ------------------------------------------------------------------
    def encode(self, text: str) -> Dict[str, np.ndarray]:
        """One sentence -> fixed-length {input_ids, type_ids,
        text_attention_mask} int32 arrays."""
        return self.encode_batch([text])[0]

    def encode_batch(self, texts: Sequence[str]) -> List[Dict[str, np.ndarray]]:
        L = self.max_seq_length
        out = []
        if self.name == "NativeWordPiece":
            enc = self._tok.encode_batch(list(texts))
            for i in range(len(texts)):
                out.append(
                    {
                        V.input_ids: enc["input_ids"][i],
                        V.type_ids: enc["type_ids"][i],
                        V.text_attention_mask: enc["attention_mask"][i],
                    }
                )
        elif self.from_transformers:
            enc = self._tok(
                list(texts),
                padding="max_length",
                truncation=True,
                max_length=L,
                return_token_type_ids=True,
                return_attention_mask=True,
            )
            for i in range(len(texts)):
                out.append(
                    {
                        V.input_ids: np.asarray(enc["input_ids"][i], np.int32),
                        V.type_ids: np.asarray(enc["token_type_ids"][i], np.int32),
                        V.text_attention_mask: np.asarray(
                            enc["attention_mask"][i], np.int32
                        ),
                    }
                )
        else:
            for enc in self._tok.encode_batch(list(texts)):
                out.append(
                    {
                        V.input_ids: np.asarray(enc.ids, np.int32),
                        V.type_ids: np.asarray(enc.type_ids, np.int32),
                        V.text_attention_mask: np.asarray(
                            enc.attention_mask, np.int32
                        ),
                    }
                )
        return out

    def encode_words(self, words: Sequence[str]) -> List[List[int]]:
        """Per-word sub-token ids, no special tokens, no padding — the
        AuxTokenize OCR path (reference: processing/visn.py:70-89)."""
        if self.name == "NativeWordPiece":
            return self._tok.encode_words(list(words))
        if self.from_transformers:
            enc = self._tok(
                list(words), add_special_tokens=False, return_attention_mask=False
            )
            return [list(ids) for ids in enc["input_ids"]]
        encs = self._word_tok.encode_batch(list(words), add_special_tokens=False)
        return [list(e.ids) for e in encs]

    def decode(self, ids: Sequence[int]) -> str:
        if self.name == "NativeWordPiece":
            if self._id_to_token is None:
                with open(self._vocab_path) as f:
                    self._id_to_token = [l.rstrip("\n") for l in f]
            toks = [
                self._id_to_token[i]
                for i in ids
                if 0 <= i < len(self._id_to_token) and i not in self.special_ids
            ]
            text = " ".join(toks).replace(" ##", "")
            return text
        return self._tok.decode(list(ids), skip_special_tokens=True)


def build_tokenizer(lang_config) -> Tokenizer:
    """LangConfig -> Tokenizer."""
    return Tokenizer(
        name=lang_config.tokenizer,
        from_transformers=lang_config.from_transformers,
        vocab_path=lang_config.vocab_path,
        lowercase=lang_config.lowercase,
        max_seq_length=lang_config.max_seq_length,
    )
