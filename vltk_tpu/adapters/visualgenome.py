"""Visual Genome image-source stub.

Exists so GQA's data_info resolves image ids to VG image files
(reference: vltk/adapters/visualgenome.py:4-11). Annotation extraction is
not needed — only ``files()/load_imgid2path()`` from VisnDataset.
"""

from __future__ import annotations

from vltk_tpu.adapters.visn import VisnDataset


class VisualGenome(VisnDataset):
    @staticmethod
    def schema():
        return {}

    @staticmethod
    def forward(json_files, splits=None):
        return []
