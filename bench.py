#!/usr/bin/env python
"""Headline benchmark: FRCNN 36-box feature-extraction throughput.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Baseline north star (BASELINE.json): >= 2000 images/sec/chip on v5e-8 for
36-box FRCNN extraction. The reference itself ran extraction one image at a
time on GPU/CPU (reference: vltk/abc/extraction.py:142) and published no
numbers.

Modes (dtype is part of the metric name — bf16 is NOT exact parity with the
f32 torch reference; measured drift is documented in BASELINE.md):

  (default)     parity geometry (R101-C4, 300 proposals, 36 detections),
                bf16 compute, device-resident inputs (device compute only)
                -> frcnn_extraction_throughput_bf16
  --fed         same, but the timed loop re-feeds uint8 host batches via
                double-buffered device_put -> ..._bf16_fed. NOTE: in this
                dev environment the TPU sits behind the axon tunnel whose
                transfer bandwidth is low AND highly variable (measured
                2.5x run-to-run swings on identical configs); the fed
                number benchmarks the tunnel, not the design — on real
                TPU hosts (PCIe/DMA) feed overlap is what the e2e
                adapters/extraction.py pipeline already implements.
  --f32         parity geometry, f32 compute (exact-parity numerics)
                -> frcnn_extraction_throughput_f32_parity
  --fast        non-parity throughput preset (100 proposals, bf16)
                -> frcnn_extraction_throughput_fast
  --e2e         end-to-end: jpegs on disk -> host decode -> device feed ->
                FRCNN -> arrow dataset, via adapters/extraction.py
                -> frcnn_extraction_e2e (tunnel-limited here, see --fed)
  --drift       not a benchmark: runs f32 and bf16 on identical inputs and
                reports box/feature deltas (the bf16 honesty number)
  --smoke       tiny model on CPU (CI / driver sanity)

  --batch N     device batch size (default 16)
  --steps N     timed steps (default 5)
  --roi-chunk N scan res5 over N-RoI chunks (HBM cap; lets batch 32 fit)
"""

import argparse
import json
import os
import sys
import time


def make_config(args, fast=False, smoke=False, dtype="bfloat16"):
    from vltk_tpu.models import FRCNNConfig

    roi_chunk = args.roi_chunk
    if smoke:
        return FRCNNConfig(
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
    if fast:
        return FRCNNConfig.fast_extraction(roi_chunk=roi_chunk)
    return FRCNNConfig(post_nms_topk=300, dtype=dtype, roi_chunk=roi_chunk)


GEOM = {
    # (raw_canvas, canvas, short, maximum, raw_hw)
    "smoke": ((64, 64), (64, 64), 48.0, 64.0, (48, 64)),
    "full": ((512, 672), (832, 1344), 800.0, 1333.0, (480, 640)),
}


def build_step(cfg, batch, smoke):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from vltk_tpu.models import FRCNN
    from vltk_tpu.ops.image_ops import preprocess_batch

    raw_canvas, canvas, short, maximum, raw_hw = GEOM["smoke" if smoke else "full"]

    model = FRCNN(cfg=cfg)
    rng = np.random.default_rng(0)
    # two distinct host batches for the double-buffered feed (uint8: the
    # device preprocess casts; transfers are 4x smaller than f32)
    raws = [
        rng.integers(0, 256, size=(batch, *raw_canvas, 3)).astype(np.uint8)
        for _ in range(2)
    ]
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

    return step, params, raws, raw_sizes


def run_device_bench(args, metric, dtype=None, fast=False, smoke=False):
    import jax
    import jax.numpy as jnp

    batch = 2 if smoke else args.batch
    cfg = make_config(args, fast=fast, smoke=smoke, dtype=dtype)
    step, params, raws, raw_sizes = build_step(cfg, batch, smoke)
    fed = getattr(args, "fed", False)

    def fetch(out):
        # force completion with a host transfer — block_until_ready alone
        # under-reports on the tunneled TPU platform
        return float(jnp.sum(out[0]))

    bufs = [jax.device_put(r) for r in raws]
    fetch(step(params, bufs[0], raw_sizes))  # warmup / compile

    # dispatch all steps, fetch once at the end: device execution is
    # in-order, so the final transfer bounds all steps while paying the
    # host<->device roundtrip only once. In --fed mode each step's input
    # buffer is additionally re-fed from host numpy right after dispatch
    # (double buffering) so the host feed is ON the clock — see the module
    # docstring for why that measures the dev tunnel, not the design.
    import numpy as _np

    t0 = time.perf_counter()
    out = None
    for i in range(args.steps):
        j = i % 2
        out = step(params, bufs[j], raw_sizes)
        if fed:
            bufs[j] = jax.device_put(raws[j])
    fetch(out)
    if fed:
        # fence the trailing re-fed buffers: the last two puts would
        # otherwise still be in flight when the clock stops, undercounting
        # the feed by ~2/steps (1-element fetches force real completion)
        for b in bufs:
            _np.asarray(b[:1, :1, :1, :1])
    dt = time.perf_counter() - t0

    n_chips = max(jax.local_device_count(), 1)
    imgs_per_sec = batch * args.steps / dt / n_chips
    emit(metric + ("_fed" if fed else ""), imgs_per_sec)


def run_e2e_bench(args):
    """jpegs -> decode -> feed -> FRCNN -> arrow, the real extraction path
    (reference: abc/extraction.py:142-248 ran this loop at batch size 1)."""
    import tempfile

    import numpy as np
    from PIL import Image

    from vltk_tpu.adapters import Adapters

    n_images = args.batch * args.steps
    datadir = tempfile.mkdtemp(prefix="vltk_e2e_bench_")
    img_dir = os.path.join(datadir, "coco2014", "train")
    os.makedirs(img_dir)
    rng = np.random.default_rng(0)
    h, w = GEOM["full"][4]
    for i in range(n_images):
        Image.fromarray(
            rng.integers(0, 256, (h, w, 3)).astype(np.uint8)
        ).save(os.path.join(img_dir, f"COCO_train2014_{i:012d}.jpg"))

    from vltk_tpu.adapters.frcnn import FRCNN as FRCNNAdapter

    class BenchFRCNN(FRCNNAdapter):
        """Raw canvas matched to the dataset's (fixed) image size — the
        per-dataset canvas choice a real deployment makes; the default
        adapter canvas (1344x1344, any-orientation COCO) is 6x the host
        bytes for these landscape inputs."""

        _name = "benchfrcnn"
        raw_canvas = (h, w)
        resized_canvas = (832, 1344)

    Adapters.add(BenchFRCNN)
    FR = BenchFRCNN
    FR.model_batch_size = args.batch
    common = dict(
        dataset_name="coco2014",
        dtype="bfloat16",
        post_nms_topk=300,
        pre_nms_topk=2000,
    )
    if args.roi_chunk:
        common["roi_chunk"] = args.roi_chunk

    # warmup run on a copy dir with one batch to absorb the XLA compile
    warm_dir = tempfile.mkdtemp(prefix="vltk_e2e_warm_")
    warm_imgs = os.path.join(warm_dir, "coco2014", "train")
    os.makedirs(warm_imgs)
    for i in range(args.batch):
        os.link(
            os.path.join(img_dir, f"COCO_train2014_{i:012d}.jpg"),
            os.path.join(warm_imgs, f"COCO_train2014_{i:012d}.jpg"),
        )
    FR.extract(warm_dir, **common)

    t0 = time.perf_counter()
    FR.extract(datadir, **common)
    dt = time.perf_counter() - t0

    import jax

    n_chips = max(jax.local_device_count(), 1)
    emit("frcnn_extraction_e2e", n_images / dt / n_chips)


def _tame_params(params):
    """Random-init R101 explodes (residual variance doubles per block, 33
    blocks -> NaN) and NaN boxes mask every detection out — which once made
    a bf16-vs-f32 'drift' of exactly 0.0 on all-zero outputs. Scale conv
    kernels down so activations stay finite and the box-delta heads down so
    decoded boxes stay near the (valid) proposals."""
    import flax.traverse_util as tu
    import numpy as np

    flat = tu.flatten_dict(params, sep="/")
    for k, v in flat.items():
        if k.endswith(("anchor_deltas/kernel", "bbox_pred/kernel")):
            flat[k] = v * 1e-3
        elif k.endswith("kernel") and getattr(v, "ndim", 0) == 4:
            flat[k] = v * 0.5
    return tu.unflatten_dict(flat, sep="/")


def run_drift_report(args):
    """bf16-vs-f32 numeric drift on identical inputs (parity honesty for
    BASELINE.md; not a throughput metric)."""
    import jax
    import numpy as np

    batch = min(args.batch, 4)
    outs = {}
    for dtype in (None, "bfloat16"):
        cfg = make_config(args, dtype=dtype)
        step, params, raws, raw_sizes = build_step(cfg, batch, smoke=False)
        params = _tame_params(params)
        feats, boxes, preds = step(params, jax.device_put(raws[0]), raw_sizes)
        preds = np.asarray(preds)
        assert preds.min() > 0, (
            f"no detections ({preds}) — drift over masked zeros is vacuous"
        )
        outs[dtype or "f32"] = (
            np.asarray(feats, np.float32),
            np.asarray(boxes, np.float32),
            preds,
        )
    f32, bf16 = outs["f32"], outs["bfloat16"]
    box_drift = float(np.max(np.abs(f32[1] - bf16[1])))
    denom = np.maximum(np.abs(f32[0]), 1e-3)
    feat_rel = float(np.max(np.abs(f32[0] - bf16[0]) / denom))
    feat_abs = float(np.max(np.abs(f32[0] - bf16[0])))
    same_counts = bool((f32[2] == bf16[2]).all())
    print(
        json.dumps(
            {
                "metric": "frcnn_bf16_vs_f32_drift",
                "box_max_abs_px": round(box_drift, 4),
                "feat_max_abs": round(feat_abs, 5),
                "feat_max_rel": round(feat_rel, 5),
                "same_detection_counts": same_counts,
                "unit": "drift",
                "vs_baseline": 0,
            }
        )
    )


def emit(metric, imgs_per_sec):
    print(
        json.dumps(
            {
                "metric": metric,
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / 2000.0, 4),
            }
        )
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--fast", action="store_true")
    ap.add_argument("--f32", action="store_true")
    ap.add_argument("--fed", action="store_true")
    ap.add_argument("--e2e", action="store_true")
    ap.add_argument("--drift", action="store_true")
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--roi-chunk", type=int, default=None)
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

    if args.smoke:
        run_device_bench(args, "frcnn_extraction_throughput_smoke", smoke=True)
    elif args.e2e:
        run_e2e_bench(args)
    elif args.drift:
        run_drift_report(args)
    elif args.fast:
        run_device_bench(args, "frcnn_extraction_throughput_fast", fast=True)
    elif args.f32:
        run_device_bench(
            args, "frcnn_extraction_throughput_f32_parity", dtype=None
        )
    else:
        run_device_bench(
            args, "frcnn_extraction_throughput_bf16", dtype="bfloat16"
        )


if __name__ == "__main__":
    main()
