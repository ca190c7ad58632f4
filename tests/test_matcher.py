"""Property tests of the matcher against a numpy oracle implementing the
reference semantics (matcher.py:58-177) directly."""

import numpy as np
import pytest
import jax.numpy as jnp

from detection_3d_tpu.models.matcher import (
    match_boxes, balanced_sample, BELOW_LOW, BETWEEN,
)
import jax


def oracle_match(quality, high, low, allow_low_quality,
                 ignore_nearby=True):
    """Direct numpy transcription of the reference semantics."""
    m, n = quality.shape
    matched_vals = quality.max(0)
    all_matches = quality.argmax(0)
    matches = all_matches.copy()
    matches[matched_vals < low] = BELOW_LOW
    matches[(matched_vals >= low) & (matched_vals < high)] = BETWEEN
    if allow_low_quality:
        highest = quality.max(1)
        for g in range(m):
            if highest[g] <= 0:  # our zero-overlap guard
                continue
            ties = np.where(quality[g] == highest[g])[0]
            matches[ties] = all_matches[ties]
        if ignore_nearby:
            thr = np.maximum(highest - 0.05, 0.02)
            near_any = (quality > thr[:, None]).any(0)
            matches[near_any & (matches == BELOW_LOW)] = BETWEEN
    return matches


@pytest.mark.slow
def test_matcher_matches_oracle_random():
    rng = np.random.RandomState(0)
    for trial in range(10):
        m, n = rng.randint(2, 8), rng.randint(10, 60)
        q = rng.rand(m, n).astype(np.float32) * rng.choice([0.3, 1.0])
        got = np.asarray(match_boxes(
            jnp.asarray(q), jnp.ones(m, bool), jnp.ones(n, bool),
            high=0.55, low=0.2, allow_low_quality=True))
        want = oracle_match(q, 0.55, 0.2, True)
        np.testing.assert_array_equal(got, want, err_msg=f"trial {trial}")


def test_matcher_no_low_quality():
    rng = np.random.RandomState(1)
    q = rng.rand(4, 30).astype(np.float32)
    got = np.asarray(match_boxes(
        jnp.asarray(q), jnp.ones(4, bool), jnp.ones(30, bool),
        high=0.5, low=0.5, allow_low_quality=False))
    want = oracle_match(q, 0.5, 0.5, False)
    np.testing.assert_array_equal(got, want)


def test_matcher_yaw_gate():
    # one gt, two anchors: same iou, different yaw diff
    q = np.array([[0.8, 0.8]], np.float32)
    ydif = np.array([[0.1, 1.0]], np.float32)
    got = np.asarray(match_boxes(
        jnp.asarray(q), jnp.ones(1, bool), jnp.ones(2, bool),
        high=0.55, low=0.2, allow_low_quality=True,
        yaw_diff=jnp.asarray(ydif), yaw_threshold=0.7))
    assert got[0] == 0          # passes gate, above high
    assert got[1] != 0 or True  # gated to 0 quality
    # gated anchor: quality 0 -> below low -> but ignore_nearby may set -2
    assert got[1] in (BELOW_LOW, BETWEEN)


def test_matcher_padded_gt_ignored():
    q = np.array([[0.9, 0.1], [0.95, 0.99]], np.float32)
    gt_valid = jnp.asarray([True, False])
    got = np.asarray(match_boxes(
        jnp.asarray(q), gt_valid, jnp.ones(2, bool),
        high=0.55, low=0.2, allow_low_quality=True))
    assert got[0] == 0  # matches the valid gt only
    # second anchor: its best VALID quality is 0.1 -> below low, but
    # ignore-nearby vs gt0 (thr = 0.85) doesn't catch 0.1 -> stays -1
    assert got[1] == BELOW_LOW


def test_balanced_sample_counts():
    rng = jax.random.PRNGKey(0)
    labels = jnp.asarray(np.array([1] * 10 + [0] * 500 + [-1] * 20,
                                  np.float32))
    pos, neg = balanced_sample(labels, rng, 256, 0.5)
    assert int(pos.sum()) == 10           # all positives (< 128 cap)
    assert int(neg.sum()) == 246          # fill to 256
    assert not bool((pos & neg).any())
    # ignored rows never sampled
    assert not bool(pos[-20:].any() or neg[-20:].any())


def test_balanced_sample_pos_cap():
    rng = jax.random.PRNGKey(1)
    labels = jnp.asarray(np.array([1] * 300 + [0] * 300, np.float32))
    pos, neg = balanced_sample(labels, rng, 256, 0.5)
    assert int(pos.sum()) == 128
    assert int(neg.sum()) == 128
