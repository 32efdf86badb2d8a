"""Visual Genome QA adapter.

The reference's VGQA subclassed ``VisnDataset`` even though it is a textual
QA dataset with ``data_info`` — a latent bug (reference: adapters/vgqa.py:
10-13; the demo registers it as a VisnLangDataset). Here it is properly a
``VisnLangDataset``.
"""

from __future__ import annotations

from collections import Counter

from vltk_tpu import vars as V
from vltk_tpu.adapters.visnlang import VisnLangDataset
from vltk_tpu.features import Features
from vltk_tpu.utils.adapters import clean_label


class VGQA(VisnLangDataset):
    data_info = {
        "train": {"visualgenome": ["train"]},
    }

    @staticmethod
    def schema():
        return {
            V.qid: Features.String(),
            V.label: Features.StringList(),
        }

    @staticmethod
    def forward(text_data, split, min_label_frequency: int = 9):
        label_frequencies: Counter = Counter()
        qa_items = []
        for _fname, data in text_data.items():
            for group in data:
                for qa in group.get("qas", []):
                    answer = clean_label(qa.get("answer", ""))
                    label_frequencies[answer] += 1
                    qa_items.append(qa)

        entries = []
        skipped = 0
        for qa in qa_items:
            answer = clean_label(qa.get("answer", ""))
            if label_frequencies[answer] < min_label_frequency:
                skipped += 1
                continue
            entries.append(
                {
                    V.imgid: str(qa["image_id"]),
                    V.text: qa["question"],
                    V.qid: str(qa["qa_id"]),
                    V.label: [answer],
                }
            )
        if skipped:
            print(f"VGQA: skipped {skipped} rare-answer questions")
        return entries
