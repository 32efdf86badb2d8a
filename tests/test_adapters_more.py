"""ETL round-trips for the remaining adapter families: FUNSD, DocVQA(+Visn),
CLEVR, CLEVR-Ref+, COCOCaptions, VGQA — synthetic raw corpora."""

import json
import os

import numpy as np

from vltk_tpu import vars as V
from vltk_tpu.adapters import Adapters


def _write(path, payload):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        json.dump(payload, f)


class TestFUNSD:
    def test_extract_and_reload(self, tmp_datadir):
        ann = {
            "form": [
                {
                    "label": "question",
                    "words": [
                        {"text": "Name:", "box": [10, 10, 60, 24]},
                    ],
                },
                {
                    "label": "weird_label",  # -> "other"
                    "words": [{"text": "X", "box": [0, 0, 8, 8]}],
                },
            ]
        }
        _write(
            os.path.join(tmp_datadir, "funsd", V.ANNOTATION_DIR, "form_00.json"),
            ann,
        )
        Adapters.get("funsd").extract(tmp_datadir)
        ds = Adapters.get("funsd").load(tmp_datadir)
        row = ds.get("form_00")
        assert row[V.text] == ["Name:", "X"]
        assert row[V.label] == ["question", "other"]
        # xyxy -> xywh
        assert row[V.tokenbox][0] == [10.0, 10.0, 50.0, 14.0]


class TestCLEVR:
    def test_extract_positions(self, tmp_datadir):
        scenes = {
            "scenes": [
                {
                    "image_filename": "CLEVR_val_000001.png",
                    "objects": [
                        {
                            "pixel_coords": [100.0, 120.0, 9.5],
                            "color": "red",
                            "shape": "cube",
                            "size": "large",
                            "material": "rubber",
                        },
                        {
                            "pixel_coords": [30.0, 40.0, 5.0],
                            "color": "blue",
                            "shape": "sphere",
                            "size": "small",
                            "material": "metal",
                        },
                    ],
                }
            ]
        }
        _write(
            os.path.join(tmp_datadir, "clevr", V.ANNOTATION_DIR, "scenes_val.json"),
            scenes,
        )
        Adapters.get("clevr").extract(tmp_datadir)
        ds = Adapters.get("clevr").load(tmp_datadir)
        row = ds.get("CLEVR_val_000001")
        assert np.asarray(row["positions"]).shape == (2, 3)
        assert row["colors"] == ["red", "blue"]
        # string columns got frequency counters
        assert ds.metadata["colors_frequencies"]["red"] == 1


class TestCLEVRREF:
    def test_extract_masks_and_boxes(self, tmp_datadir):
        scenes = {
            "scenes": [
                {
                    "image_filename": "CLEVR_ref_000002.png",
                    "objects": [
                        {"color": "red", "shape": "cube", "size": "large",
                         "material": "rubber"},
                    ],
                    "obj_bbox": {"0": [4, 5, 20, 22]},
                    "obj_mask": {"0": "12,4,40,6"},
                }
            ]
        }
        _write(
            os.path.join(
                tmp_datadir, "clevrref", V.ANNOTATION_DIR, "ref_scenes.json"
            ),
            scenes,
        )
        Adapters.get("clevrref").extract(tmp_datadir)
        ds = Adapters.get("clevrref").load(tmp_datadir)
        row = ds.get("CLEVR_ref_000002")
        assert row[V.box] == [[4.0, 5.0, 20.0, 22.0]]
        assert row[V.RLE] == [[12.0, 4.0, 40.0, 6.0]]

        # the RLE points decode into a binary mask
        from vltk_tpu.utils.adapters import imagepoints_to_mask

        mask = imagepoints_to_mask(row[V.RLE][0], (10, 10))
        assert int(mask.sum()) == 10


class TestCOCOCaptions:
    def test_extract(self, tmp_datadir):
        payload = {
            "images": [
                {"id": 1000, "file_name": "COCO_train2014_000000001000.jpg"}
            ],
            "annotations": [
                {"image_id": 1000, "caption": "a cat on a mat"},
                {"image_id": 1000, "caption": "feline resting"},
            ],
        }
        _write(
            os.path.join(tmp_datadir, "cococaptions", "captions_train.json"),
            payload,
        )
        Adapters.get("cococaptions").extract(tmp_datadir)
        ds = Adapters.get("cococaptions").load(tmp_datadir, split="train")
        assert len(ds) == 2
        rows = ds.get("COCO_train2014_000000001000")
        texts = (
            {r[V.text] for r in rows}
            if isinstance(rows, list)
            else {rows[V.text]}
        )
        assert "a cat on a mat" in texts


class TestVGQA:
    def test_extract_with_min_frequency(self, tmp_datadir):
        groups = [
            {
                "qas": [
                    {"qa_id": i, "image_id": 10 + (i % 2),
                     "question": f"what {i}?",
                     "answer": "dog" if i < 10 else f"rare{i}"}
                    for i in range(12)
                ]
            }
        ]
        _write(os.path.join(tmp_datadir, "vgqa", "qa_train.json"), groups)
        Adapters.get("vgqa").extract(tmp_datadir)
        ds = Adapters.get("vgqa").load(tmp_datadir, split="train")
        assert len(ds) == 10  # the two rare answers dropped
        assert Adapters.is_visnlang("vgqa")  # reference bug fixed: VL, not V


class TestDocVQA:
    def _ocr(self, words):
        return {
            "status": "Succeeded",
            "recognitionResults": [
                {
                    "lines": [
                        {
                            "boundingBox": [0, 0, 90, 0, 90, 12, 0, 12],
                            "words": [
                                {
                                    "text": w,
                                    "boundingBox": [
                                        i * 20, 0, i * 20 + 18, 0,
                                        i * 20 + 18, 12, i * 20, 12,
                                    ],
                                }
                                for i, w in enumerate(words)
                            ],
                        }
                    ]
                }
            ],
        }

    def test_visn_and_lang_extract(self, tmp_datadir):
        ocr = self._ocr(["total", "amount", "due", "42.00"])
        _write(
            os.path.join(tmp_datadir, "docvqavisn", V.ANNOTATION_DIR, "doc1.json"),
            ocr,
        )
        Adapters.get("docvqavisn").extract(tmp_datadir)
        vds = Adapters.get("docvqavisn").load(tmp_datadir)
        row = vds.get("doc1")
        assert row[V.text] == ["total", "amount", "due", "42.00"]
        assert row[V.tokenbox][1] == [20.0, 0.0, 18.0, 12.0]  # 8pt -> xywh

        qa = {
            "data": [
                {
                    "question": "What is the amount due?",
                    "image": "documents/doc1.png",
                    "answers": ["amount due"],
                    "docId": 77,
                },
                {
                    "question": "ungroundable?",
                    "image": "documents/doc1.png",
                    "answers": ["zebra stripes"],
                    "docId": 78,
                },
            ]
        }
        _write(os.path.join(tmp_datadir, "docvqa", "docvqa_val.json"), qa)
        Adapters.get("docvqa").extract(tmp_datadir)
        lds = Adapters.get("docvqa").load(tmp_datadir, split="val")
        assert len(lds) == 1  # ungroundable answer skipped
        rows = lds.get("doc1")
        row = rows[0] if isinstance(rows, list) else rows
        assert row["answer"] == "amount due"
        assert row[V.span] == [1, 2]


class TestETLReviewRegressions:
    def test_ragged_features2d_roundtrips(self, tmp_datadir):
        """Dynamic-dim columns must use None (with -1 HF datasets silently
        REDISTRIBUTED ragged rows across images)."""
        scenes = {
            "scenes": [
                {
                    "image_filename": f"CLEVR_val_{i:06d}.png",
                    "objects": [
                        {"pixel_coords": [float(j), 0.0, 0.0], "color": "red",
                         "shape": "cube", "size": "large", "material": "rubber"}
                        for j in range(n)
                    ],
                }
                for i, n in enumerate((2, 4))  # ragged: 2 then 4 objects
            ]
        }
        _write(
            os.path.join(tmp_datadir, "clevr", V.ANNOTATION_DIR, "scenes_val.json"),
            scenes,
        )
        Adapters.get("clevr").extract(tmp_datadir)
        ds = Adapters.get("clevr").load(tmp_datadir)
        a = np.asarray(ds.get("CLEVR_val_000000")["positions"])
        b = np.asarray(ds.get("CLEVR_val_000001")["positions"])
        assert a.shape == (2, 3), a.shape
        assert b.shape == (4, 3), b.shape
        assert a[:, 0].tolist() == [0.0, 1.0]
        assert b[:, 0].tolist() == [0.0, 1.0, 2.0, 3.0]

    def test_split_token_matching(self, tmp_datadir):
        """'test' must take train2014-style names but never testdev files."""
        from vltk_tpu.adapters.gqa import GQA

        base = os.path.join(tmp_datadir, "gqa")
        qa = {"q0": {"question": "?", "answer": "yes", "imageId": "n1",
                     "semantic": []}}
        _write(os.path.join(base, "test_balanced_questions.json"), qa)
        _write(os.path.join(base, "testdev_balanced_questions.json"), qa)
        files = GQA._locate_split_files(base, "test")
        names = [os.path.basename(f) for f in files]
        assert names == ["test_balanced_questions.json"], names
        files = GQA._locate_split_files(base, "testdev")
        assert [os.path.basename(f) for f in files] == [
            "testdev_balanced_questions.json"
        ]

    def test_schema_not_dropped_by_first_unlabeled_entry(self, tmp_datadir):
        """One unannotated first question must not drop the label column."""
        q = [
            {"question_id": 1, "image_id": 7, "question": "unlabeled?"},
            *[
                {"question_id": 10 + i, "image_id": 7, "question": f"q{i}"}
                for i in range(12)
            ],
        ]
        anns = [
            {
                "question_id": 10 + i,
                "image_id": 7,
                "multiple_choice_answer": "cat",
                "answers": [{"answer": "cat"}] * 10,
            }
            for i in range(12)
        ]
        d = os.path.join(tmp_datadir, "vqa", "train")
        _write(os.path.join(d, "v2_questions_train.json"), {"questions": q})
        _write(os.path.join(d, "v2_annotations_train.json"), {"annotations": anns})
        out = Adapters.get("vqa").extract(tmp_datadir, splits=["train"])
        ds = out["train"]
        assert V.label in ds.column_names  # was dropped pre-fix

    def test_map_ocr_predictions_zero_subtoken_alignment(self):
        from vltk_tpu.utils.adapters import map_ocr_predictions

        preds = [1, 1, 3]
        tokenmap = [2, 0, 1, -100, -100]
        out = map_ocr_predictions(preds, tokenmap)
        assert out == [1, -100, 3]
