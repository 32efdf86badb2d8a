"""Trained-weights preset drift: measure the DIRECTION real weights move
the extraction Pareto (VERDICT r3 weak #6, the standing random-init
asterisk).

The preset Pareto (``bench.py --preset-drift``) is measured at
tamed-random weights, where RPN objectness is uncorrelated with the
image content — proposal truncation is therefore at its WORST CASE by
construction, and BASELINE.md carries the structural expectation that
trained weights lift props_200/int8_200 over the 0.95 gate. The real
checkpoint (``unc-nlp/frcnn-vg-finetuned``) cannot be fetched in this
environment (no egress; closure: ``tools/verify_checkpoint.py
--pareto``), so this probe tests the MECHANISM with weights trained
in-environment:

1. fine-tune the parity-geometry FRCNN (R101-C4, 832x1344 canvas, RPN +
   RoI losses — the same jitted detection train step as ``bench.py
   --train frcnn``) on a synthetic-but-learnable task: rectangles whose
   fill color encodes the class, on a dark noisy background;
2. re-run the IDENTICAL drift harness (``bench.run_preset_drift``) on
   fresh scenes twice — once with the tamed init, once with the trained
   weights — and diff the box-agreement columns.

The claim under test: once objectness correlates with the true objects,
proposal truncation keeps the RIGHT candidates, so the props_*/int8_*
agreement rows rise above the random-init bound. (It does not measure
the production budget — only the closure with the real checkpoint can —
but it replaces "structural expectation" with a measured direction.)

Reference context: the reference shipped trained-checkpoint extraction
only (/root/reference/tests/frcnn_test.py:11-31) and raised
NotImplementedError on every training branch; it has no counterpart for
this experiment.

Usage:
  python tools/probe_trained_drift.py --smoke          # CPU tiny sanity
  python tools/probe_trained_drift.py --steps 300      # TPU full row
"""

import argparse
import json
import sys
import time
from functools import partial

import numpy as np

sys.path.insert(0, ".")  # run from the repo root (capture does)

import bench  # noqa: E402  (GEOM, _tame_params, run_preset_drift)


def make_scenes(rng, n, raw_canvas, content_hw, n_obj, n_classes, size_rng):
    """Learnable synthetic detection scenes on the raw uint8 canvas.

    Background: dim noise (0..40). Objects: axis-aligned rectangles,
    fill color = a fixed per-class palette entry (+/- small noise) —
    bright vs the background so RPN objectness has signal, class-coded
    so the RoI classifier has signal. Content occupies the top-left
    ``content_hw`` corner (the framework's raw-canvas convention);
    boxes are raw-space XYXY.
    """
    H, W = content_hw
    lo, hi = size_rng
    imgs = np.zeros((n, *raw_canvas, 3), np.uint8)
    boxes = np.zeros((n, n_obj, 4), np.float32)
    classes = np.zeros((n, n_obj), np.int32)
    palette = rng.integers(100, 256, (n_classes, 3))
    for i in range(n):
        img = rng.integers(0, 40, (*raw_canvas, 3)).astype(np.int32)
        img[H:] = 0
        img[:, W:] = 0
        for j in range(n_obj):
            w = int(rng.integers(lo, hi))
            h = int(rng.integers(lo, hi))
            x0 = int(rng.integers(0, max(W - w, 1)))
            y0 = int(rng.integers(0, max(H - h, 1)))
            c = int(rng.integers(0, n_classes))
            img[y0:y0 + h, x0:x0 + w] = palette[c] + rng.integers(
                -12, 12, 3
            )
            boxes[i, j] = (x0, y0, x0 + w, y0 + h)
            classes[i, j] = c
        imgs[i] = np.clip(img, 0, 255).astype(np.uint8)
    return imgs, boxes, classes


def train_frcnn(cfg, canvas, short, maximum, raw_imgs, raw_sizes, gt_boxes,
                gt_classes, batch, steps, lr):
    """Jitted detection fine-tune (same losses/step as ``bench --train
    frcnn``) over S pre-preprocessed batches cycled inside one fori loop.
    Returns (trained_params, first_loss, last_loss)."""
    import jax
    import jax.numpy as jnp
    import optax

    from vltk_tpu.models import (
        FRCNN,
        fast_rcnn_losses,
        rpn_losses,
    )
    from vltk_tpu.ops.image_ops import preprocess_batch

    model = FRCNN(cfg=cfg)
    n = raw_imgs.shape[0]
    assert n % batch == 0
    s_batches = n // batch

    pre = jax.jit(
        partial(
            preprocess_batch, canvas_hw=canvas, short=short, maximum=maximum
        )
    )
    imgs_c, sizes_c, boxes_c = [], [], []
    for k in range(s_batches):
        sl = slice(k * batch, (k + 1) * batch)
        p = pre(jnp.asarray(raw_imgs[sl]), jnp.asarray(raw_sizes[sl]))
        imgs_c.append(np.asarray(p["img"], np.float32))
        sizes_c.append(np.asarray(p["sizes"], np.float32))
        # scales_yx maps resized -> raw (box * scale = raw), so canvas
        # coords = raw coords / scale (image_ops.py:72-73)
        sc = np.asarray(p["scales_yx"], np.float32)  # (B, 2) = (sy, sx)
        bb = gt_boxes[sl].copy()
        bb[..., 0::2] /= sc[:, None, 1:2]  # x / sx
        bb[..., 1::2] /= sc[:, None, 0:1]  # y / sy
        boxes_c.append(bb)
    imgs_all = jnp.asarray(np.stack(imgs_c))          # (S, B, H, W, 3)
    sizes_all = jnp.asarray(np.stack(sizes_c))        # (S, B, 2)
    boxes_all = jnp.asarray(np.stack(boxes_c))        # (S, B, O, 4)
    classes_all = jnp.asarray(
        gt_classes.reshape(s_batches, batch, -1), jnp.int32
    )
    gt_valid = jnp.ones((batch, gt_boxes.shape[1]), bool)

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *canvas, 3), jnp.float32),
        jnp.asarray([[float(canvas[0]), float(canvas[1])]]),
    )["params"]
    params = bench._tame_params(params)
    init_params = params

    warmup = max(steps // 6, 1)
    sched = optax.linear_schedule(lr * 0.1, lr, warmup)
    tx = optax.chain(
        optax.clip_by_global_norm(10.0),
        optax.sgd(sched, momentum=0.9),
    )
    opt_state = tx.init(params)
    key = jax.random.PRNGKey(1)

    def loss_fn(p, step_rng, imgs, sizes, boxes, classes):
        out = model.apply({"params": p}, imgs, sizes, return_raw=True)
        raw = out["raw"]
        r1, r2 = jax.random.split(step_rng)
        obj, loc = rpn_losses(
            raw["anchors"], raw["rpn_logits"], raw["rpn_deltas"],
            boxes, gt_valid, r1, batch_size_per_image=256,
        )
        cls, box = fast_rcnn_losses(
            raw["proposals"], raw["prop_valid"], raw["obj_logits"],
            raw["box_deltas"], boxes, classes, gt_valid, r2,
            batch_size_per_image=128,
        )
        return obj + loc + cls + box

    @jax.jit
    def run_k(carry, n_steps):
        def body(i, c):
            p, o, _ = c
            k = i % s_batches
            loss, grads = jax.value_and_grad(loss_fn)(
                p, jax.random.fold_in(key, i),
                jax.lax.dynamic_index_in_dim(imgs_all, k, keepdims=False),
                jax.lax.dynamic_index_in_dim(sizes_all, k, keepdims=False),
                jax.lax.dynamic_index_in_dim(boxes_all, k, keepdims=False),
                jax.lax.dynamic_index_in_dim(classes_all, k, keepdims=False),
            )
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o, loss)

        p, o, loss = jax.lax.fori_loop(
            0, n_steps, body, (*carry, jnp.asarray(0.0))
        )
        return (p, o), loss

    (carry, first_loss) = run_k((params, opt_state), jnp.asarray(1))
    first_loss = float(first_loss)
    (p, _), last_loss = run_k(carry, jnp.asarray(steps - 1))
    last_loss = float(last_loss)
    assert np.isfinite(last_loss), "training diverged"
    return init_params, jax.device_get(p), first_loss, last_loss


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--train-batch", type=int, default=2)
    ap.add_argument("--lr", type=float, default=5e-3)
    ap.add_argument("--roi_chunk", type=int, default=None)
    args = ap.parse_args()

    from vltk_tpu.models import FRCNNConfig

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")
        raw_canvas, canvas, short, maximum, raw_hw = bench.GEOM["smoke"]
        # keep in sync with run_preset_drift's smoke `tiny` dict — the
        # trained params must fit the smoke variants' module shapes
        tiny = dict(
            depth=50, stem_out_channels=8, res2_out_channels=16,
            width_per_group=4, rpn_hidden_channels=16,
            anchor_sizes=(16, 32), num_classes=7, num_attrs=5,
            pooler_resolution=7, min_detections=4, max_detections=4,
        )
        cfg = FRCNNConfig(
            dtype="bfloat16", post_nms_topk=16, pre_nms_topk=64, **tiny
        )
        n_obj, n_classes, size_rng = 3, 4, (10, 28)
        train_batch, eval_batch = 2, 2
        steps = min(args.steps, 120)
        lr = args.lr
    else:
        raw_canvas, canvas, short, maximum, raw_hw = bench.GEOM["full"]
        cfg = FRCNNConfig(
            post_nms_topk=300, dtype="bfloat16", roi_chunk=args.roi_chunk
        )
        n_obj, n_classes, size_rng = 8, 16, (40, 160)
        train_batch, eval_batch = args.train_batch, 8
        steps = args.steps
        lr = args.lr

    rng = np.random.default_rng(7)
    n_train = train_batch * 8  # 8 distinct batches cycled in-loop
    t_imgs, t_boxes, t_classes = make_scenes(
        rng, n_train, raw_canvas, raw_hw, n_obj, n_classes, size_rng
    )
    t_sizes = np.asarray([raw_hw] * n_train, np.float32)

    t0 = time.perf_counter()
    init_params, trained, first_loss, last_loss = train_frcnn(
        cfg, canvas, short, maximum, t_imgs, t_sizes, t_boxes, t_classes,
        train_batch, steps, lr,
    )
    train_s = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "trained_drift_meta"
                + ("_smoke" if args.smoke else ""),
                "train_steps": steps,
                "train_batch": train_batch,
                "first_step_loss": round(first_loss, 3),
                "last_step_loss": round(last_loss, 3),
                "train_wall_s": round(train_s, 1),
                "note": "synthetic learnable scenes; measures the "
                "trained-weights DIRECTION of the preset Pareto, not "
                "the production budget (closure: verify_checkpoint "
                "--pareto with the real checkpoint)",
                "vs_baseline": 0,
            }
        )
    )

    # fresh eval scenes, same distribution, disjoint rng stream
    e_imgs, _, _ = make_scenes(
        rng, eval_batch, raw_canvas, raw_hw, n_obj, n_classes, size_rng
    )
    e_sizes = np.asarray([raw_hw] * eval_batch, np.float32)

    import types

    dargs = types.SimpleNamespace(
        smoke=args.smoke, batch=eval_batch, roi_chunk=args.roi_chunk,
        batch_explicit=True,
    )
    # identical harness, identical inputs — only the weights differ
    bench.run_preset_drift(
        dargs, params=init_params, raw=e_imgs, raw_sizes=e_sizes,
        label="tamed-init-on-scenes",
    )
    bench.run_preset_drift(
        dargs, params=trained, raw=e_imgs, raw_sizes=e_sizes,
        label="synthetic-trained",
    )


if __name__ == "__main__":
    main()
