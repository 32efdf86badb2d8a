"""Int8 transformer serving fidelity at TRAINED weights (VERDICT r4 task 3).

TestInt8Dense (tests/test_models.py) pins random-init fidelity and
checkpoint transparency for the int8 MXU serving path
(models/layers.py:Int8Dense), and BASELINE.md carries its throughput
rows (+22% LXMERT VQA serving, +19% LayoutLM seq-1024) — but until this
probe there was no accuracy row at trained weights: answer-flip rate
under quantization is a property of the trained weight/activation
distributions, not of random init. Real checkpoints cannot be fetched
here (no egress), so — the tools/probe_trained_drift.py pattern — we
fine-tune each model on a synthetic LEARNABLE task in-environment and
measure int8-vs-bf16 agreement at the trained weights:

* ``lxmert``: VQA classification where the answer class is encoded in
  the visual features (class mean + per-box noise over the 36 boxes), so
  the model must route signal through the full encoder stack the int8
  path quantizes (q/k/v/output projections + MLPs, 12 language + 5
  cross + 5 visual layers at base size);
* ``layoutlm``: token classification at the seq-1024 production long-doc
  geometry, label = spatial quadrant of the token's box — learnable
  only through the coordinate embeddings and encoder.

Reported per model: bf16 accuracy, int8 accuracy (same trained params +
one-batch calibrated static PTQ scales — the exact serving
configuration bench.py --infer --int8 times), top-1 answer agreement on
identical eval inputs, flip rate, and max logit drift.

Reference context: the reference had no quantized (or any measured)
serving path — its eval loops were f32 bs=1 (vltk/abc/simple.py:576-682).

Usage:
  python tools/probe_int8_fidelity.py --smoke            # CPU tiny sanity
  python tools/probe_int8_fidelity.py --steps 300        # TPU full rows
  python tools/probe_int8_fidelity.py --model lxmert     # one model only
"""

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, ".")  # run from the repo root

import bench  # noqa: E402  (_calibrate_int8_jit)


def _train_fori(model, params, tx, loss_fn, batches, steps, key):
    """Cycle pre-generated batches inside one jitted fori loop (the
    tunnel-safe protocol: one dispatch, one fetch)."""
    import jax
    import jax.numpy as jnp
    import optax

    n_batches = jax.tree_util.tree_leaves(batches)[0].shape[0]
    opt_state = tx.init(params)

    @jax.jit
    def run_k(carry, n):
        def body(i, c):
            p, o, _ = c
            k = i % n_batches
            batch_i = jax.tree_util.tree_map(
                lambda x: jax.lax.dynamic_index_in_dim(x, k, keepdims=False),
                batches,
            )
            loss, grads = jax.value_and_grad(loss_fn)(
                p, jax.random.fold_in(key, i), batch_i
            )
            updates, o = tx.update(grads, o, p)
            return (optax.apply_updates(p, updates), o, loss)

        p, o, loss = jax.lax.fori_loop(0, n, body, (*carry, jnp.asarray(0.0)))
        return (p, o), loss

    (carry, first) = run_k((params, opt_state), jnp.asarray(1))
    (p, _), last = run_k(carry, jnp.asarray(steps - 1))
    first, last = float(first), float(last)
    assert np.isfinite(last), "training diverged"
    return jax.device_get(p), first, last


def _agreement_row(name, bf16_logits, int8_logits, labels, valid=None,
                   extra=None):
    """Top-1 accuracy per path + agreement between the paths."""
    bf16_top = np.argmax(bf16_logits, axis=-1)
    int8_top = np.argmax(int8_logits, axis=-1)
    if valid is None:
        valid = np.ones(bf16_top.shape, bool)
    n = int(valid.sum())
    agree = float((bf16_top == int8_top)[valid].mean())
    row = {
        "metric": f"int8_fidelity_{name}",
        "value": round(agree, 4),
        "unit": "top1_agreement",
        "bf16_acc": round(float((bf16_top == labels)[valid].mean()), 4),
        "int8_acc": round(float((int8_top == labels)[valid].mean()), 4),
        "flip_rate": round(1.0 - agree, 4),
        "n_eval": n,
        "logit_drift_max": round(
            float(
                np.max(
                    np.abs(
                        bf16_logits.astype(np.float32)
                        - int8_logits.astype(np.float32)
                    )[valid]
                )
            ),
            6,
        ),
        "vs_baseline": 0,
    }
    if extra:
        row.update(extra)
    print(json.dumps(row))
    return row


def run_lxmert(args):
    import jax
    import jax.numpy as jnp
    import optax

    from vltk_tpu.models import LxmertConfig, LxmertForVQA
    from vltk_tpu.models import lxmert as L

    if args.smoke:
        dims = dict(
            vocab_size=64, hidden_size=16, num_heads=2,
            intermediate_size=32, l_layers=1, x_layers=1, r_layers=1,
            visual_feat_dim=8, num_answers=8,
        )
        b, s, v, n_classes = 4, 8, 4, 4
        steps, n_eval = min(args.steps, 60), 32
    else:
        dims = {}
        b, s, v, n_classes = 32, 20, 36, 32
        steps, n_eval = args.steps, 256

    cfg = LxmertConfig(dtype="bfloat16", **dims)
    cfg_int8 = LxmertConfig(dtype="bfloat16", int8=True, **dims)
    model = LxmertForVQA(cfg)
    model_int8 = LxmertForVQA(cfg_int8)

    rng = np.random.default_rng(11)
    mu = rng.normal(size=(n_classes, cfg.visual_feat_dim)).astype(np.float32)

    def make(n):
        classes = rng.integers(0, n_classes, n)
        feats = (
            mu[classes][:, None, :]
            + 0.5 * rng.normal(size=(n, v, cfg.visual_feat_dim))
        ).astype(np.float32)
        return {
            "input_ids": rng.integers(0, cfg.vocab_size, (n, s)).astype(
                np.int32
            ),
            "features": feats,
            "boxes": rng.uniform(0, 1, (n, v, 4)).astype(np.float32),
            "mask": np.ones((n, s), np.float32),
            "labels": classes.astype(np.int32),
        }

    s_batches = 8
    train = make(b * s_batches)
    batches = {
        k: jnp.asarray(a.reshape(s_batches, b, *a.shape[1:]))
        for k, a in train.items()
    }
    ev = make(n_eval)

    params = model.init(
        jax.random.PRNGKey(0),
        train["input_ids"][:1], train["features"][:1], train["boxes"][:1],
    )["params"]

    def loss_fn(p, step_rng, batch):
        logits = model.apply(
            {"params": p},
            batch["input_ids"], batch["features"], batch["boxes"],
            batch["mask"], deterministic=False,
            rngs={"dropout": step_rng},
        )
        scores = jax.nn.one_hot(batch["labels"], cfg.num_answers)
        return L.vqa_soft_loss(logits, scores)

    t0 = time.perf_counter()
    trained, first, last = _train_fori(
        model, params, optax.adamw(args.lr), loss_fn, batches, steps,
        jax.random.PRNGKey(1),
    )
    train_s = time.perf_counter() - t0

    eval_args = (
        jnp.asarray(ev["input_ids"]), jnp.asarray(ev["features"]),
        jnp.asarray(ev["boxes"]), jnp.asarray(ev["mask"]),
    )
    bf16_logits = np.asarray(
        jax.jit(
            lambda p, *a: model.apply({"params": p}, *a)
        )(trained, *eval_args),
        np.float32,
    )
    quant = bench._calibrate_int8_jit(
        model_int8, trained, tuple(a[:8] for a in eval_args)
    )
    import jax as _jax

    assert _jax.tree_util.tree_leaves(quant), "int8 path did not engage"
    int8_logits = np.asarray(
        jax.jit(
            lambda p, q, *a: model_int8.apply({"params": p, "quant": q}, *a)
        )(trained, quant, *eval_args),
        np.float32,
    )
    _agreement_row(
        "lxmert_vqa" + ("_smoke" if args.smoke else ""),
        bf16_logits, int8_logits, ev["labels"],
        extra={
            "train_steps": steps,
            "first_step_loss": round(first, 3),
            "last_step_loss": round(last, 3),
            "train_wall_s": round(train_s, 1),
        },
    )


def run_layoutlm(args):
    import jax
    import jax.numpy as jnp
    import optax

    from vltk_tpu.models.layoutlm import (
        LayoutLMConfig,
        LayoutLMForTokenClassification,
        token_classification_loss,
    )

    if args.smoke:
        dims = dict(
            vocab_size=64, hidden_size=16, num_heads=2,
            intermediate_size=32, l_layers=1, max_position_embeddings=64,
        )
        b, s = 4, 64
        steps, n_eval = min(args.steps, 60), 8
    else:
        dims = dict(max_position_embeddings=1024)
        b, s = 8, 1024
        steps, n_eval = args.steps, 32

    n_labels = 4  # spatial quadrant of the token's box
    cfg = LayoutLMConfig(dtype="bfloat16", num_labels=n_labels, **dims)
    cfg_int8 = LayoutLMConfig(
        dtype="bfloat16", num_labels=n_labels, int8=True, **dims
    )
    model = LayoutLMForTokenClassification(cfg)
    model_int8 = LayoutLMForTokenClassification(cfg_int8)

    rng = np.random.default_rng(12)
    half = 512  # coord space is 0..1023 after the embedding clamp

    def make(n):
        ids = rng.integers(0, cfg.vocab_size, (n, s)).astype(np.int32)
        xy0 = rng.integers(0, 900, (n, s, 2))
        wh = rng.integers(1, 100, (n, s, 2))
        boxes = np.concatenate([xy0, xy0 + wh], -1).astype(np.int32)
        cx = (boxes[..., 0] + boxes[..., 2]) // 2
        cy = (boxes[..., 1] + boxes[..., 3]) // 2
        labels = (2 * (cy >= half) + (cx >= half)).astype(np.int32)
        mask = np.ones((n, s), np.float32)
        mask[:, int(s * 0.8):] = 0.0
        train_labels = labels.copy()
        train_labels[mask == 0.0] = -100
        return ids, boxes, mask, labels, train_labels

    s_batches = 4
    ids, boxes, mask, labels, train_labels = make(b * s_batches)
    batches = {
        "ids": jnp.asarray(ids.reshape(s_batches, b, s)),
        "boxes": jnp.asarray(boxes.reshape(s_batches, b, s, 4)),
        "mask": jnp.asarray(mask.reshape(s_batches, b, s)),
        "labels": jnp.asarray(train_labels.reshape(s_batches, b, s)),
    }
    e_ids, e_boxes, e_mask, e_labels, _ = make(n_eval)

    params = model.init(
        jax.random.PRNGKey(0), ids[:1], boxes[:1], mask[:1]
    )["params"]

    def loss_fn(p, step_rng, batch):
        logits = model.apply(
            {"params": p}, batch["ids"], batch["boxes"], batch["mask"],
            deterministic=False, rngs={"dropout": step_rng},
        )
        return token_classification_loss(logits, batch["labels"])

    t0 = time.perf_counter()
    trained, first, last = _train_fori(
        model, params, optax.adamw(args.lr), loss_fn, batches, steps,
        jax.random.PRNGKey(1),
    )
    train_s = time.perf_counter() - t0

    eval_args = (
        jnp.asarray(e_ids), jnp.asarray(e_boxes), jnp.asarray(e_mask)
    )
    bf16_logits = np.asarray(
        jax.jit(
            lambda p, *a: model.apply({"params": p}, *a)
        )(trained, *eval_args),
        np.float32,
    )
    quant = bench._calibrate_int8_jit(
        model_int8, trained, tuple(a[:4] for a in eval_args)
    )
    import jax as _jax

    assert _jax.tree_util.tree_leaves(quant), "int8 path did not engage"
    int8_logits = np.asarray(
        jax.jit(
            lambda p, q, *a: model_int8.apply({"params": p, "quant": q}, *a)
        )(trained, quant, *eval_args),
        np.float32,
    )
    _agreement_row(
        f"layoutlm_seq{s}" + ("_smoke" if args.smoke else ""),
        bf16_logits, int8_logits, e_labels,
        valid=np.asarray(e_mask, bool),
        extra={
            "train_steps": steps,
            "first_step_loss": round(first, 3),
            "last_step_loss": round(last, 3),
            "train_wall_s": round(train_s, 1),
        },
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument(
        "--model", choices=("lxmert", "layoutlm", "both"), default="both"
    )
    args = ap.parse_args()

    if args.smoke:
        import jax

        jax.config.update("jax_platforms", "cpu")

    if args.model in ("lxmert", "both"):
        run_lxmert(args)
    if args.model in ("layoutlm", "both"):
        run_layoutlm(args)


if __name__ == "__main__":
    main()
