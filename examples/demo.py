"""End-to-end demo with synthetic data — the reference demo.ipynb flow.

Reproduces the reference's demo sequence (reference: demo.ipynb — extract
adapters, build a multi-dataset loader, iterate batches) against a
synthetic COCO+VQA corpus so it runs anywhere, no downloads:

  1. generate a tiny COCO2014-shaped + VQA-shaped raw dataset
  2. adapter ETL: raw json -> arrow tables with metadata
  3. vltk.build(config) -> loaders; iterate a fixed-shape batch
  4. (optional, --train) finetune the LXMERT VQA head a few steps
  5. (optional, --predict) composed VQA inference at tiny geometry
     (vltk_tpu/predict.py: decode -> FRCNN -> WordPiece -> LXMERT)

Run: ``python examples/demo.py [--train] [--predict]``
"""

import argparse
import json
import os
import sys
import tempfile

# run from a fresh checkout without the editable install: the repo root
# (one level up from examples/) holds the vltk_tpu package
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def make_raw_corpus(datadir: str, n_images: int = 8, n_questions: int = 48):
    # each of the 4 answers must appear > 9 times to clear the VQA
    # adapter's min_label_frequency (reference default)
    from PIL import Image

    rng = np.random.default_rng(0)
    ann_dir = os.path.join(datadir, "coco2014", "annotations")
    img_dir = os.path.join(datadir, "coco2014", "train")
    os.makedirs(ann_dir, exist_ok=True)
    os.makedirs(img_dir, exist_ok=True)

    images, anns = [], []
    for i in range(n_images):
        name = f"COCO_train2014_{i:012d}.jpg"
        arr = (rng.uniform(0, 255, (48, 64, 3))).astype("uint8")
        Image.fromarray(arr).save(os.path.join(img_dir, name))
        images.append({"id": i, "file_name": name, "height": 48, "width": 64})
        anns.append(
            {
                "image_id": i,
                "bbox": [4, 4, 20, 16],
                "category_id": 1,
                "segmentation": [[4, 4, 24, 4, 24, 20, 4, 20]],
                "area": 320,
                "iscrowd": 0,
            }
        )
    cats = [{"id": 1, "name": "thing", "supercategory": "x"}]
    with open(os.path.join(ann_dir, "instances_train2014.json"), "w") as f:
        json.dump({"images": images, "annotations": anns, "categories": cats}, f)

    # VQA-shaped questions/annotations over those images
    vqa_dir = os.path.join(datadir, "vqa")
    os.makedirs(vqa_dir, exist_ok=True)
    questions, annotations = [], []
    answers = ["red", "blue", "two", "yes"]
    for q in range(n_questions):
        img = q % n_images
        questions.append(
            {
                "question_id": q,
                "image_id": img,
                "question": f"What color is object {q}?",
            }
        )
        annotations.append(
            {
                "question_id": q,
                "image_id": img,
                "answers": [
                    {"answer": answers[q % len(answers)]} for _ in range(10)
                ],
                "multiple_choice_answer": answers[q % len(answers)],
            }
        )
    with open(os.path.join(vqa_dir, "v2_OpenEnded_mscoco_train2014_questions.json"), "w") as f:
        json.dump({"questions": questions}, f)
    with open(os.path.join(vqa_dir, "v2_mscoco_train2014_annotations.json"), "w") as f:
        json.dump({"annotations": annotations}, f)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train", action="store_true", help="run a few finetune steps")
    ap.add_argument("--predict", action="store_true",
                    help="run composed VQA inference at tiny geometry")
    ap.add_argument("--datadir", default=None)
    ap.add_argument("--tpu", action="store_true", help="use the default device "
                    "instead of CPU (first compile on a tunneled TPU is slow)")
    args = ap.parse_args()

    if not args.tpu:
        # env var alone is not enough: the environment's sitecustomize may
        # re-point JAX at a tunneled TPU at interpreter start (see
        # tests/conftest.py) — update the config explicitly
        os.environ.setdefault("JAX_PLATFORMS", "cpu")
        import jax

        jax.config.update("jax_platforms", "cpu")

    datadir = args.datadir or tempfile.mkdtemp(prefix="vltk_demo_")
    print(f"[1/4] synthesizing raw corpus under {datadir}")
    make_raw_corpus(datadir)

    print("[2/4] adapter ETL -> arrow")
    from vltk_tpu.adapters import Adapters

    Adapters.get("coco2014").extract(datadir)
    Adapters.get("vqa").extract(datadir)
    coco = Adapters.get("coco2014").load(datadir)
    print(f"    coco2014 annotations: {len(coco)} rows;"
          f" objects: {dict(list(coco.object_frequencies.items())[:3])}")

    print("[3/4] build loaders + one batch")
    import vltk_tpu as vltk

    config = vltk.Config()
    config.data.update(
        {
            "train_datasets": [["vqa", "train"]],
            "datadir": datadir,
            "train_batch_size": 4,
            "num_workers": 0,
            "rand_feats": (36, 64),  # no extractor run: random region feats
        }
    )
    config.data.lang.update({"max_seq_length": 16})
    train_loader, _ = vltk.build(config)
    batch = next(iter(train_loader))
    for key, value in sorted(batch.items()):
        shape = getattr(value, "shape", f"list[{len(value)}]")
        print(f"    {key}: {shape}")

    if args.predict:
        print("[predict] composed VQA inference (tiny geometry, random init)")
        from vltk_tpu.models import FRCNNConfig, LxmertConfig
        from vltk_tpu.predict import VQAPredictor

        predictor = VQAPredictor(
            ["red", "blue", "two", "yes"],
            frcnn_config=FRCNNConfig(
                depth=50, stem_out_channels=8, res2_out_channels=16,
                width_per_group=4, rpn_hidden_channels=16,
                anchor_sizes=(16, 32), aspect_ratios=(0.5, 1.0, 2.0),
                pre_nms_topk=64, post_nms_topk=16, num_classes=7,
                num_attrs=5, pooler_resolution=7, min_detections=4,
                max_detections=4,
            ),
            lxmert_config=LxmertConfig(
                hidden_size=32, num_heads=2, intermediate_size=64,
                l_layers=1, x_layers=1, r_layers=1, visual_feat_dim=128,
                max_position_embeddings=32,
            ),
            batch_size=1, raw_canvas=(64, 64), resized_canvas=(64, 64),
            short=32.0, maximum=64.0,
        )
        img = os.path.join(
            datadir, "coco2014", "train", "COCO_train2014_000000000000.jpg"
        )
        (res,) = predictor([img], ["what color is the thing"], top_k=3)
        print(f"    answer: {res['answer']!r} (random weights) "
              f"topk: {[(a, round(s, 3)) for a, s in res['topk']]} "
              f"boxes: {res['num_boxes']}")

        # deployment: one self-contained AOT file (compiled steps +
        # vocab + geometry), served back without model code or params
        bundle = os.path.join(datadir, "vqa_bundle.zip")
        predictor.export_bundle(bundle)
        (res2,) = VQAPredictor.from_bundle(bundle)(
            [img], ["what color is the thing"], top_k=3
        )
        assert res2["answer"] == res["answer"]
        print(f"    AOT bundle round-trip ok: {os.path.basename(bundle)} "
              f"answer {res2['answer']!r}")

    if not args.train:
        print("[4/4] done (pass --train to finetune the VQA head)")
        return 0

    print("[4/4] LXMERT VQA finetune (tiny, synthetic)")
    from vltk_tpu.experiments import Experiments
    from vltk_tpu.models import LxmertConfig

    n_answers = len(train_loader.dataset.answer_to_id) if hasattr(
        train_loader.dataset, "answer_to_id") else 8

    class DemoVQA(Experiments.get("lxmert_vqa")):
        model_config = LxmertConfig(
            hidden_size=32, num_heads=2, intermediate_size=64,
            l_layers=1, x_layers=1, r_layers=1, visual_feat_dim=64,
            max_position_embeddings=32, num_answers=max(n_answers, 8),
        )

    config.test_run = True
    config.logdir = os.path.join(datadir, "logs")
    config.data.update({"visual_dim": 64, "max_detections": 36})
    exp = DemoVQA(config, loaders=(train_loader, None))
    result = exp()
    print(f"    result: {result}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
