"""Language-side pretraining corruptions (LXMERT-style).

Numpy re-implementations of the reference's free functions
(reference: vltk/processing/lang.py:25-137): soft-score label sampling,
80/10/10 masked language modeling, 15% ROI-feature masking, and 50%
random-sentence matching. All take an explicit ``np.random.Generator`` so
the loader can be deterministic per (seed, epoch, index).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import numpy as np

from vltk_tpu import vars as V


def one_hot_label(
    labels: Sequence[int],
    scores: Sequence[float],
    rng: np.random.Generator,
    ignore_id: int = -100,
) -> int:
    """Sample one label id proportionally to its soft score
    (reference: processing/lang.py:25-46)."""
    scores = np.asarray(scores, dtype=np.float64)
    if scores.size == 0 or scores.sum() <= 0:
        return ignore_id
    probs = scores / scores.sum()
    idx = rng.choice(len(labels), p=probs)
    return int(labels[idx])


def masked_language_modeling(
    input_ids: np.ndarray,
    attention_mask: np.ndarray,
    rng: np.random.Generator,
    mask_token_id: int,
    vocab_size: int,
    special_ids: Sequence[int] = (),
    mask_rate: float = 0.15,
    mask_token_rate: float = 0.8,
    random_token_rate: float = 0.1,
    ignore_id: int = -100,
) -> Tuple[np.ndarray, np.ndarray]:
    """15% token corruption, 80/10/10 mask/random/keep; returns
    (corrupted_ids, masked_labels) where unmasked positions carry ignore_id
    (reference: processing/lang.py:101-137)."""
    input_ids = np.asarray(input_ids).copy()
    labels = np.full_like(input_ids, ignore_id)
    special = np.isin(input_ids, np.asarray(list(special_ids), dtype=input_ids.dtype))
    candidates = (np.asarray(attention_mask) > 0) & ~special
    coin = rng.random(input_ids.shape)
    chosen = candidates & (coin < mask_rate)
    labels[chosen] = input_ids[chosen]
    action = rng.random(input_ids.shape)
    do_mask = chosen & (action < mask_token_rate)
    do_rand = chosen & (action >= mask_token_rate) & (
        action < mask_token_rate + random_token_rate
    )
    input_ids[do_mask] = mask_token_id
    n_rand = int(do_rand.sum())
    if n_rand:
        input_ids[do_rand] = rng.integers(0, vocab_size, size=n_rand)
    return input_ids, labels


def masked_feature_modeling(
    features: np.ndarray,
    mask: Optional[np.ndarray],
    rng: np.random.Generator,
    feature_mask_rate: float = 0.15,
    mask_token_rate: float = 0.8,
    random_token_rate: float = 0.1,
) -> Tuple[np.ndarray, np.ndarray]:
    """ROI-feature masking: 15% of valid rows are corrupted 80/10/10
    (zeroed / swapped with a random row / kept). Returns (features,
    feature_mask_labels boolean) (reference: processing/lang.py:53-78)."""
    features = np.asarray(features, dtype=np.float32).copy()
    n = features.shape[0]
    valid = (
        np.asarray(mask, dtype=bool)
        if mask is not None
        else np.ones((n,), dtype=bool)
    )
    coin = rng.random(n)
    chosen = valid & (coin < feature_mask_rate)
    action = rng.random(n)
    do_zero = chosen & (action < mask_token_rate)
    do_swap = chosen & (action >= mask_token_rate) & (
        action < mask_token_rate + random_token_rate
    )
    features[do_zero] = 0.0
    swap_idx = np.flatnonzero(do_swap)
    if swap_idx.size:
        src = rng.integers(0, n, size=swap_idx.size)
        features[swap_idx] = features[src]
    return features, chosen


def matched_sentence_modeling(
    entry: Dict[str, Any],
    random_text: str,
    rng: np.random.Generator,
    sentence_match_rate: float = 0.5,
) -> Dict[str, Any]:
    """With p=0.5 swap the sentence for a random one and set is_matched=0
    (reference: processing/lang.py:81-98)."""
    if rng.random() < sentence_match_rate:
        entry = dict(entry)
        entry[V.text] = random_text
        entry["is_matched"] = 0
    else:
        entry = dict(entry)
        entry["is_matched"] = 1
    return entry
