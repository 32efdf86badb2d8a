"""Detection fine-tuning path: losses + a short training loop.

The reference carries Matcher/subsample_labels but every training branch
raises NotImplementedError (reference: vltk/modeling/frcnn.py:1296-1302,
1930-1931); these tests cover the completed trainable path
(vltk_tpu/models/detection_loss.py)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp

from vltk_tpu.models import FRCNN, FRCNNConfig, fast_rcnn_losses, rpn_losses
from vltk_tpu.models.detection_loss import subsample_mask

TINY = FRCNNConfig(
    depth=50,
    stem_out_channels=8,
    res2_out_channels=16,
    width_per_group=4,
    rpn_hidden_channels=16,
    anchor_sizes=(16, 32),
    pre_nms_topk=64,
    post_nms_topk=32,
    num_classes=7,
    num_attrs=5,
    pooler_resolution=7,
    min_detections=4,
    max_detections=4,
)


class TestSubsampleMask:
    def test_counts_and_pools(self):
        labels = jnp.asarray(
            np.array([1] * 10 + [0] * 50 + [-1] * 20, np.int8)
        )
        mask = np.asarray(
            subsample_mask(labels, jax.random.PRNGKey(0), 32, 0.5)
        )
        lab = np.asarray(labels)
        assert mask.sum() == 32
        # positives capped at num_samples * fraction but limited by supply
        assert mask[lab == 1].sum() == 10  # all 10 positives (< 16 target)
        assert mask[lab == 0].sum() == 22  # remainder from negatives
        assert mask[lab == -1].sum() == 0  # ignores never sampled

    def test_respects_positive_fraction(self):
        labels = jnp.asarray(np.array([1] * 100 + [0] * 100, np.int8))
        mask = np.asarray(
            subsample_mask(labels, jax.random.PRNGKey(1), 64, 0.25)
        )
        lab = np.asarray(labels)
        assert mask.sum() == 64
        assert mask[lab == 1].sum() == 16
        assert mask[lab == 0].sum() == 48

    def test_randomness_differs_by_key(self):
        labels = jnp.asarray(np.array([0] * 200, np.int8))
        m1 = np.asarray(subsample_mask(labels, jax.random.PRNGKey(0), 50, 0.5))
        m2 = np.asarray(subsample_mask(labels, jax.random.PRNGKey(1), 50, 0.5))
        assert m1.sum() == m2.sum() == 50
        assert (m1 != m2).any()


def _gt_batch():
    """Two images, fixed (G=3, 4) gt with validity masks."""
    gt_boxes = np.array(
        [
            [[4, 4, 28, 30], [34, 30, 60, 58], [0, 0, 0, 0]],
            [[10, 8, 40, 44], [0, 0, 0, 0], [0, 0, 0, 0]],
        ],
        np.float32,
    )
    gt_valid = np.array([[1, 1, 0], [1, 0, 0]], bool)
    gt_classes = np.array([[2, 5, 0], [1, 0, 0]], np.int32)
    return (
        jnp.asarray(gt_boxes),
        jnp.asarray(gt_valid),
        jnp.asarray(gt_classes),
    )


class TestDetectionLosses:
    @pytest.fixture(scope="class")
    def setup(self):
        model = FRCNN(cfg=TINY)
        rng = np.random.default_rng(0)
        images = jnp.asarray(
            rng.uniform(-40, 40, (2, 64, 64, 3)).astype(np.float32)
        )
        sizes = jnp.asarray([[64.0, 64.0], [64.0, 64.0]])
        params = model.init(jax.random.PRNGKey(0), images, sizes)["params"]
        return model, params, images, sizes

    def test_losses_finite_and_positive(self, setup):
        model, params, images, sizes = setup
        gt_boxes, gt_valid, gt_classes = _gt_batch()
        out = model.apply({"params": params}, images, sizes, return_raw=True)
        raw = out["raw"]
        obj, loc = rpn_losses(
            raw["anchors"], raw["rpn_logits"], raw["rpn_deltas"],
            gt_boxes, gt_valid, jax.random.PRNGKey(2),
            batch_size_per_image=64,
        )
        cls, box = fast_rcnn_losses(
            raw["proposals"], raw["prop_valid"], raw["obj_logits"],
            raw["box_deltas"], gt_boxes, gt_classes, gt_valid,
            jax.random.PRNGKey(3), batch_size_per_image=32,
        )
        for v in (obj, loc, cls, box):
            v = float(v)
            assert np.isfinite(v) and v >= 0

    def test_finetune_step_reduces_loss(self, setup):
        """The actual fine-tune loop: jitted value_and_grad over the full
        model with both loss groups; loss must drop and grads stay finite —
        the capability the reference's NotImplementedError walls off."""
        import optax

        model, params, images, sizes = setup
        gt_boxes, gt_valid, gt_classes = _gt_batch()
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        def loss_fn(p, step_rng):
            out = model.apply({"params": p}, images, sizes, return_raw=True)
            raw = out["raw"]
            r1, r2 = jax.random.split(step_rng)
            obj, loc = rpn_losses(
                raw["anchors"], raw["rpn_logits"], raw["rpn_deltas"],
                gt_boxes, gt_valid, r1, batch_size_per_image=64,
            )
            # (fast_rcnn_losses detaches proposals internally — the
            # regression targets must not backprop into the RPN)
            cls, box = fast_rcnn_losses(
                raw["proposals"], raw["prop_valid"],
                raw["obj_logits"], raw["box_deltas"],
                gt_boxes, gt_classes, gt_valid, r2,
                batch_size_per_image=32,
            )
            return obj + loc + cls + box

        @jax.jit
        def train_step(p, o, step_rng):
            loss, grads = jax.value_and_grad(loss_fn)(p, step_rng)
            updates, o = tx.update(grads, o, p)
            return optax.apply_updates(p, updates), o, loss, grads

        losses = []
        p = params
        for i in range(6):
            p, opt_state, loss, grads = train_step(
                p, opt_state, jax.random.PRNGKey(100)  # fixed sampling rng
            )
            loss = float(loss)
            assert np.isfinite(loss)
            flat, _ = jax.flatten_util.ravel_pytree(grads)
            assert bool(jnp.isfinite(flat).all()), f"non-finite grads at {i}"
            losses.append(loss)
        assert losses[-1] < losses[0], losses


class TestBackboneRemat:
    def test_remat_is_numerically_identical(self):
        """cfg.remat is a pure memory lever: same param tree, same
        forward, same gradients — only the backward's activation storage
        changes (block inputs instead of block internals)."""
        import dataclasses

        model = FRCNN(cfg=TINY)
        model_r = FRCNN(cfg=dataclasses.replace(TINY, remat=True))
        rng = np.random.default_rng(1)
        images = jnp.asarray(
            rng.uniform(-40, 40, (2, 64, 64, 3)).astype(np.float32)
        )
        sizes = jnp.asarray([[64.0, 64.0], [64.0, 64.0]])
        params = model.init(jax.random.PRNGKey(0), images, sizes)["params"]
        # identical param tree: the rematted model accepts the plain one
        gt_boxes, gt_valid, gt_classes = _gt_batch()

        def loss_fn(m):
            def f(p):
                out = m.apply({"params": p}, images, sizes, return_raw=True)
                raw = out["raw"]
                obj, loc = rpn_losses(
                    raw["anchors"], raw["rpn_logits"], raw["rpn_deltas"],
                    gt_boxes, gt_valid, jax.random.PRNGKey(2),
                    batch_size_per_image=64,
                )
                return obj + loc

            return f

        l0, g0 = jax.value_and_grad(loss_fn(model))(params)
        l1, g1 = jax.value_and_grad(loss_fn(model_r))(params)
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
            ),
            g0, g1,
        )


class TestDetectionExperiment:
    def test_e2e_coco_finetune(self, tmp_path, rng):
        """Full path: synthetic COCO dir -> builder -> vision loader
        (gt_boxes/vlabels) -> FRCNNDetectExperiment -> jitted train epoch.
        The XYWH->XYXY + resize-rescale + BGR-normalize plumbing all lives
        in prepare_batch, so a finite decreasing loss here covers it."""
        import json

        from PIL import Image

        import vltk_tpu as vltk
        from vltk_tpu.experiments import Experiments

        img_dir = tmp_path / "coco2014" / "train"
        ann_dir = tmp_path / "coco2014" / "annotations"
        img_dir.mkdir(parents=True)
        ann_dir.mkdir(parents=True)
        images, annos = [], []
        for i in range(4):
            imgid = 9100 + i
            Image.fromarray(
                (rng.random((40, 56, 3)) * 255).astype("uint8")
            ).save(img_dir / f"COCO_train2014_{imgid:012d}.jpg")
            images.append(
                {"id": imgid, "file_name": f"COCO_train2014_{imgid:012d}.jpg",
                 "height": 40, "width": 56}
            )
            annos.append(
                {"image_id": imgid, "bbox": [4 + i, 6, 20, 14],
                 "category_id": 1 + i % 2,
                 "segmentation": [[4, 6, 24, 6, 24, 20, 4, 20]],
                 "area": 280, "iscrowd": 0}
            )
        (ann_dir / "instances_train2014.json").write_text(
            json.dumps({"images": images, "annotations": annos,
                        "categories": [{"id": 1, "name": "thing"},
                                       {"id": 2, "name": "stuff"}]})
        )

        cfg = vltk.Config()
        cfg.logdir = str(tmp_path / "logs")
        cfg.data.update(dict(
            datadir=str(tmp_path),
            train_datasets=(("coco2014", "train"),),
            train_batch_size=2, num_workers=0, shuffle=False,
            drop_last=True, max_detections=6, ignore_segmentation=True,
        ))
        cfg.data.vision.update({"size": (48, 64)})
        cfg.train.update(dict(epochs=2, learning_rate=1e-3))

        class Tiny(Experiments.get("frcnn_detect")):
            model_config = TINY
            rpn_batch_per_image = 32
            roi_batch_per_image = 16

        exp = Tiny(cfg)
        result = exp()
        loss = float(result["train"]["loss"])
        assert np.isfinite(loss) and loss > 0
        for k in ("rpn_obj", "rpn_loc", "roi_cls", "roi_box"):
            assert np.isfinite(float(result["train"][k]))

        # eval loop with mAP@0.5 over fetched detections (host-side VOC);
        # fresh logdir so exp2 does not resume exp's epoch checkpoints
        cfg.logdir = str(tmp_path / "logs2")
        cfg.train.update({"epochs": 1})
        exp2 = Tiny(cfg, loaders=(exp.train_loader, exp.train_loader))
        result2 = exp2()
        m = float(result2["eval"]["map50"])
        assert 0.0 <= m <= 1.0
        assert np.isfinite(float(result2["eval"]["rpn_obj"]))


class TestDetectionMAP:
    def _perfect(self):
        gt_boxes = np.array([[[10, 10, 30, 30], [50, 50, 80, 90]]], np.float32)
        gt_valid = np.array([[True, True]])
        gt_classes = np.array([[1, 2]])
        return gt_boxes, gt_valid, gt_classes

    def test_perfect_predictions_give_1(self):
        from vltk_tpu.train import detection_map

        gt_boxes, gt_valid, gt_classes = self._perfect()
        m = detection_map(
            gt_boxes, np.array([[0.9, 0.8]]), gt_classes,
            np.array([[True, True]]),
            gt_boxes, gt_classes, gt_valid,
        )
        assert m == pytest.approx(1.0)

    def test_all_misses_give_0(self):
        from vltk_tpu.train import detection_map

        gt_boxes, gt_valid, gt_classes = self._perfect()
        off = gt_boxes + 1000.0
        m = detection_map(
            off, np.array([[0.9, 0.8]]), gt_classes,
            np.array([[True, True]]),
            gt_boxes, gt_classes, gt_valid,
        )
        assert m == pytest.approx(0.0)

    def test_half_hits_known_value(self):
        """Class 1: one TP at rank 1 of 1 -> AP 1.0. Class 2: one FP above
        one TP -> precision at recall 1 is 1/2 -> AP 0.5. mAP = 0.75."""
        from vltk_tpu.train import detection_map

        gt_boxes, gt_valid, gt_classes = self._perfect()
        preds = np.array(
            [[[10, 10, 30, 30], [400, 400, 420, 420], [50, 50, 80, 90]]],
            np.float32,
        )
        scores = np.array([[0.9, 0.95, 0.5]])
        classes = np.array([[1, 2, 2]])
        valid = np.array([[True, True, True]])
        m = detection_map(
            preds, scores, classes, valid, gt_boxes, gt_classes, gt_valid
        )
        assert m == pytest.approx(0.75)

    def test_duplicate_detections_penalized(self):
        """Second detection on an already-matched gt is a FP (VOC rule)."""
        from vltk_tpu.train import detection_map

        gt_boxes, gt_valid, gt_classes = self._perfect()
        preds = np.array(
            [[[10, 10, 30, 30], [11, 11, 30, 30]]], np.float32
        )
        scores = np.array([[0.9, 0.8]])
        classes = np.array([[1, 1]])
        valid = np.array([[True, True]])
        m = detection_map(
            preds, scores, classes, valid,
            gt_boxes[:, :1], gt_classes[:, :1], gt_valid[:, :1],
        )
        assert m == pytest.approx(1.0)  # AP for class 1: TP then FP after full recall


    def test_voc_no_fallback_to_unmatched_gt(self):
        """VOC rule: a detection is judged against its MAX-IoU gt; when
        that gt is already matched by a higher-scored detection, the
        detection is a FP — no silent re-assignment to a lower-IoU
        unmatched gt (which would inflate mAP on crowded boxes)."""
        from vltk_tpu.train import detection_map

        gt = np.array([[[0, 0, 20, 20], [8, 0, 28, 20]]], np.float32)
        gtv = np.array([[True, True]])
        gtc = np.array([[1, 1]])
        preds = np.array([[[0, 0, 20, 20], [2, 0, 22, 20]]], np.float32)
        m = detection_map(
            preds, np.array([[0.9, 0.8]]), np.array([[1, 1]]),
            np.array([[True, True]]), gt, gtc, gtv,
        )
        # det1 claims gt1; det2's max-IoU gt is ALSO gt1 (0.82 > 0.54 for
        # gt2) -> FP; recall caps at 0.5 with precision 1 -> AP 0.5
        assert m == pytest.approx(0.5)
