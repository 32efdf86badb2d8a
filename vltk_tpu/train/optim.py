"""Optimizer factory: AdamW + linear warmup/decay + grad clipping.

Semantics of the reference's ``_init_optim`` (reference:
vltk/abc/simple.py:298-313, 716-725): torch AdamW over all params with
weight decay, ``transformers.get_linear_schedule_with_warmup`` over
``total_steps``, and clip-grad-norm in ``step`` (simple.py:670). BERT-style
no-decay for biases and LayerNorm params.
"""

from __future__ import annotations


import jax
import optax


def linear_warmup_linear_decay(
    learning_rate: float, total_steps: int, warmup_ratio: float = 0.1
):
    """0 -> lr over the warmup, then lr -> 0 over the remainder."""
    warmup_steps = max(int(total_steps * warmup_ratio), 1)
    return optax.join_schedules(
        [
            optax.linear_schedule(0.0, learning_rate, warmup_steps),
            optax.linear_schedule(
                learning_rate, 0.0, max(total_steps - warmup_steps, 1)
            ),
        ],
        boundaries=[warmup_steps],
    )


def _decay_mask(params):
    """True where weight decay applies: skip biases and norm scales."""

    def one(path, _):
        names = [str(getattr(k, "key", k)) for k in path]
        leaf = names[-1] if names else ""
        if leaf in ("bias", "scale"):
            return False
        if any(n in ("ln", "layernorm", "norm") for n in (s.lower() for s in names)):
            return False
        return True

    return jax.tree_util.tree_map_with_path(one, params)


def make_optimizer(
    train_config,
    total_steps: int,
    schedule=None,
    freeze_patterns=(),
) -> optax.GradientTransformation:
    """optax chain matching the reference step semantics.

    ``freeze_patterns``: regexes over '/'-joined param paths whose matches
    receive zero updates (reference: ``freeze_layers`` gradient masking,
    vltk/abc/complex.py:109-120 — there done by zeroing ``.grad``)."""
    if schedule is None:
        schedule = linear_warmup_linear_decay(
            train_config.learning_rate, total_steps, train_config.warmup_ratio
        )
    parts = []
    clip = getattr(train_config, "clip_grad_norm", 0.0) or 0.0
    if clip > 0:
        parts.append(optax.clip_by_global_norm(clip))
    parts.append(
        optax.adamw(
            learning_rate=schedule,
            weight_decay=train_config.weight_decay,
            mask=_decay_mask,
        )
    )
    tx = optax.chain(*parts)
    if freeze_patterns:
        tx = with_frozen(tx, freeze_patterns)
    return tx


def with_frozen(tx: optax.GradientTransformation, patterns):
    """Route params whose path matches any regex in ``patterns`` to
    ``set_to_zero`` (frozen), everything else to ``tx``."""
    import re

    compiled = [re.compile(p) for p in patterns]

    def labels(params):
        def one(path, _):
            name = "/".join(str(getattr(k, "key", k)) for k in path)
            return "frozen" if any(c.search(name) for c in compiled) else "train"

        return jax.tree_util.tree_map_with_path(one, params)

    return optax.multi_transform(
        {"train": tx, "frozen": optax.set_to_zero()}, labels
    )
