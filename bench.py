#!/usr/bin/env python
"""Headline benchmark: FRCNN 36-box feature-extraction throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline north star (BASELINE.json): >= 2000 images/sec/chip on v5e-8 for
36-box FRCNN extraction. The reference itself ran extraction one image at a
time on GPU/CPU (reference: vltk/abc/extraction.py:142) and published no
numbers.

Default config: full ResNet-101-C4 VG model (1600 classes + 400 attrs),
bf16 compute, fused device preprocess (resize 800/1333 + caffe-BGR
normalize + pad), post_nms_topk=300 proposals, 36 detections out —
landscape COCO-shaped inputs on a (832, 1344) canvas.

  --smoke   tiny model on CPU (CI / driver sanity)
  --fast    non-parity throughput preset (100 proposals; see
            FRCNNConfig.fast_extraction)
  --batch   device batch size (default 16)
  --steps   timed steps (default 5)
"""

import argparse
import json
import os
import sys
import time


def build_step(smoke: bool, batch: int, fast: bool = False):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vltk_tpu.models import FRCNN, FRCNNConfig
    from vltk_tpu.ops.image_ops import preprocess_batch

    if smoke:
        cfg = FRCNNConfig(
            depth=50,
            stem_out_channels=8,
            res2_out_channels=16,
            width_per_group=4,
            rpn_hidden_channels=16,
            anchor_sizes=(16, 32),
            pre_nms_topk=64,
            post_nms_topk=16,
            num_classes=7,
            num_attrs=5,
            pooler_resolution=7,
            min_detections=4,
            max_detections=4,
        )
        raw_canvas, canvas = (64, 64), (64, 64)
        short, maximum = 48.0, 64.0
        raw_hw = (48, 64)
    elif fast:
        cfg = FRCNNConfig.fast_extraction()
        raw_canvas, canvas = (512, 672), (832, 1344)
        short, maximum = 800.0, 1333.0
        raw_hw = (480, 640)
    else:
        cfg = FRCNNConfig(post_nms_topk=300, dtype="bfloat16")
        raw_canvas, canvas = (512, 672), (832, 1344)
        short, maximum = 800.0, 1333.0
        raw_hw = (480, 640)

    model = FRCNN(cfg=cfg)
    rng = np.random.default_rng(0)
    raw = jnp.asarray(
        rng.uniform(0, 255, size=(batch, *raw_canvas, 3)).astype(np.float32)
    )
    raw_sizes = jnp.asarray([raw_hw] * batch, jnp.int32)

    params = model.init(
        jax.random.PRNGKey(0),
        jnp.zeros((1, *canvas, 3), jnp.float32),
        jnp.asarray([[float(canvas[0]), float(canvas[1])]]),
    )["params"]

    @jax.jit
    def step(params, raw_images, sizes):
        pre = preprocess_batch(
            raw_images, sizes, canvas_hw=canvas, short=short, maximum=maximum
        )
        out = model.apply(
            {"params": params}, pre["img"], pre["sizes"], scales_yx=pre["scales_yx"]
        )
        return out["roi_features"], out["boxes"], out["preds_per_image"]

    return step, params, raw, raw_sizes


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5)
    args = ap.parse_args()

    if args.smoke:
        os.environ.setdefault("JAX_PLATFORMS", "cpu")

    import jax

    if args.smoke:
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    else:
        # persistent compile cache: repeat runs skip the 20-40s XLA compile
        jax.config.update(
            "jax_compilation_cache_dir", "/root/.cache/vltk_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import jax.numpy as jnp

    batch = 2 if args.smoke else args.batch
    step, params, raw, raw_sizes = build_step(args.smoke, batch, args.fast)

    def fetch(out):
        # force completion with a host transfer — block_until_ready alone
        # under-reports on the tunneled TPU platform
        return float(jnp.sum(out[0]))

    fetch(step(params, raw, raw_sizes))  # warmup / compile

    # dispatch all steps, fetch once at the end: device execution is
    # in-order, so the final transfer bounds all steps while paying the
    # host<->device roundtrip only once
    t0 = time.perf_counter()
    out = None
    for _ in range(args.steps):
        out = step(params, raw, raw_sizes)
    fetch(out)
    dt = time.perf_counter() - t0

    n_chips = max(jax.local_device_count(), 1)
    imgs_per_sec = batch * args.steps / dt / n_chips
    print(
        json.dumps(
            {
                "metric": "frcnn_extraction_throughput"
                + ("_smoke" if args.smoke else "")
                + ("_fast" if args.fast else ""),
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / 2000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
