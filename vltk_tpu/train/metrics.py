"""Metrics (reference: build/lib/vltk/metrics.py:6-28 shipped `accuracy` +
`soft_score`; live tree deleted them mid-refactor)."""

from __future__ import annotations

import jax.numpy as jnp


def accuracy(logits: jnp.ndarray, labels: jnp.ndarray) -> jnp.ndarray:
    """Fraction of argmax hits (reference: metrics.py:6-11)."""
    return jnp.mean((jnp.argmax(logits, axis=-1) == labels).astype(jnp.float32))


def vqa_score(logits: jnp.ndarray, target_scores: jnp.ndarray) -> jnp.ndarray:
    """VQA accuracy: the soft score of the predicted answer, averaged.

    ``target_scores`` are the 0.3/0.6/0.9/1.0 soft scores the VQA adapter
    writes (reference: utils/adapters.py:285-295).
    """
    pred = jnp.argmax(logits, axis=-1)
    return jnp.mean(jnp.take_along_axis(target_scores, pred[:, None], axis=1))
