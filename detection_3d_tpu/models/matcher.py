"""Target assignment (matcher) and balanced sampling, masked/static-shape.

Semantic parity with the reference Matcher
(/root/reference/maskrcnn_benchmark/modeling/matcher.py:12-197):

  * optional yaw gate: quality *= (|yaw_diff| < yaw_threshold) when the
    threshold is <= 1.58 (matcher.py:51-56);
  * per-anchor argmax over gt; < low -> -1 (background), [low, high) -> -2
    (ignore);
  * allow_low_quality: anchors tying a gt's best quality are rescued to
    their pre-threshold argmax (matcher.py:108-166);
  * IGNORE_HIGHEST_MATCH_NEARBY (on by default, matcher.py:9,168-177):
    negatives whose quality vs ANY gt exceeds max(best_for_gt - 0.05, 0.02)
    become ignores.

BalancedPositiveNegativeSampler
(/root/reference/maskrcnn_benchmark/modeling/
balanced_positive_negative_sampler.py:5-68) becomes a static-shape masked
sampler: random priorities + rank thresholds instead of randperm.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BELOW_LOW = -1
BETWEEN = -2
_NEG = -1e9


def match_boxes(quality, gt_valid, anchor_valid, high: float, low: float,
                allow_low_quality: bool, yaw_diff=None,
                yaw_threshold: float = 10.0,
                ignore_highest_nearby: bool = True):
    """Args:
      quality: (M, N) match quality (gt rows x anchor cols);
      gt_valid: (M,), anchor_valid: (N,).

    Returns matches: (N,) int32 in [0, M) or BELOW_LOW / BETWEEN; padded
    anchors get BELOW_LOW.
    """
    m = quality.shape[0]
    q = jnp.where(gt_valid[:, None] & anchor_valid[None, :], quality, _NEG)
    if yaw_diff is not None and yaw_threshold <= 1.58:
        q = q * (jnp.abs(yaw_diff) < yaw_threshold).astype(q.dtype)
        q = jnp.where(gt_valid[:, None] & anchor_valid[None, :], q, _NEG)

    matched_vals = jnp.max(q, axis=0)
    all_matches = jnp.argmax(q, axis=0).astype(jnp.int32)
    matches = jnp.where(matched_vals < low, BELOW_LOW, all_matches)
    matches = jnp.where((matched_vals >= low) & (matched_vals < high),
                        BETWEEN, matches)

    if allow_low_quality:
        highest_per_gt = jnp.max(q, axis=1)  # (M,)
        # guard: a gt with zero overlap everywhere would tie with EVERY
        # zero-quality anchor and mark the whole anchor set positive (the
        # reference has the same pathology, matcher.py:131-166, but never
        # hits it on its data); require a strictly positive best quality
        tie = (q == highest_per_gt[:, None]) & (highest_per_gt[:, None] > 0) \
            & gt_valid[:, None] & anchor_valid[None, :]
        rescued = jnp.any(tie, axis=0)
        matches = jnp.where(rescued, all_matches, matches)

        if ignore_highest_nearby:
            thr = jnp.maximum(highest_per_gt - 0.05, 0.02)
            near = q > thr[:, None]
            near_any = jnp.any(near & gt_valid[:, None], axis=0)
            matches = jnp.where(near_any & (matches == BELOW_LOW), BETWEEN,
                                matches)

    matches = jnp.where(anchor_valid, matches, BELOW_LOW)
    return matches


def _rank_among(mask, priority):
    """Rank (0-based) of each True element among Trues, ordered by priority
    descending. False elements get a huge rank."""
    n = mask.shape[0]
    p = jnp.where(mask, priority, _NEG)
    order = jnp.argsort(p, descending=True)
    ranks = jnp.zeros((n,), jnp.int32).at[order].set(jnp.arange(n, dtype=jnp.int32))
    return jnp.where(mask, ranks, n)


def balanced_sample(labels, rng, batch_size: int, positive_fraction: float):
    """labels: (N,) float/int — ignore < 0, negative == 0, positive > 0.

    Returns (pos_mask, neg_mask): boolean masks with
    |pos| = min(#pos, batch*frac) and |neg| = min(#neg, batch - |pos|),
    uniformly random — the static-shape equivalent of randperm selection.
    """
    is_pos = labels >= 1
    is_neg = labels == 0
    pri = jax.random.uniform(rng, labels.shape)
    num_pos_cap = int(batch_size * positive_fraction)

    pos_rank = _rank_among(is_pos, pri)
    pos_mask = is_pos & (pos_rank < num_pos_cap)
    n_pos = jnp.sum(pos_mask.astype(jnp.int32))

    neg_rank = _rank_among(is_neg, pri)
    neg_mask = is_neg & (neg_rank < (batch_size - n_pos))
    return pos_mask, neg_mask
