"""Windowed monotonic-gather conv kernel: interpret-mode parity on CPU.

The TPU-compiled path is exercised by bench.py / the device test runs;
here the same kernel body runs under the Pallas interpreter against the
XLA gather oracle (ops/sparse_conv.gather_conv).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from detection_3d_tpu.ops.sparse import (
    build_sparse_tensor, neighbor_indices, submanifold_offsets,
)
from detection_3d_tpu.ops.sparse_conv import gather_conv
from detection_3d_tpu.ops.pallas.gather_conv_kernel import (
    window_starts, windowed_rulebook, windowed_gather_conv_interpret,
    _group_of, BLOCK, WINDOW,
)


def _table(n=3000, cap=4096, spatial=(64, 48, 32), seed=0):
    rng = np.random.RandomState(seed)
    coords = np.stack([rng.randint(0, spatial[0], n),
                       rng.randint(0, spatial[1], n),
                       rng.randint(0, spatial[2], n),
                       np.zeros(n, np.int64)], -1).astype(np.int32)
    feats = rng.randn(n, 8).astype(np.float32)
    return build_sparse_tensor(jnp.array(coords), jnp.array(feats),
                               jnp.ones((n,), bool), spatial, 1, cap)


def test_interpret_matches_gather_conv():
    t = _table()
    rng = np.random.RandomState(1)
    w = jnp.array(rng.randn(27, 8, 16).astype(np.float32) * 0.2)
    idx = neighbor_indices(t, submanifold_offsets((3, 3, 3)))
    want = np.asarray(gather_conv(t.feats, idx, w, t.row_valid))
    got = np.asarray(windowed_gather_conv_interpret(
        t.feats, idx, w, t.row_valid))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_interpret_cin_padding():
    """Non-128-tiling channel count (9, the input layer) is zero-padded."""
    t = _table()
    rng = np.random.RandomState(2)
    feats9 = jnp.array(rng.randn(t.capacity, 9).astype(np.float32))
    w = jnp.array(rng.randn(27, 9, 16).astype(np.float32) * 0.2)
    idx = neighbor_indices(t, submanifold_offsets((3, 3, 3)))
    want = np.asarray(gather_conv(feats9, idx, w, t.row_valid))
    f16 = jnp.pad(feats9, ((0, 0), (0, 7)))
    w16 = jnp.pad(w, ((0, 0), (0, 7), (0, 0)))
    got = np.asarray(windowed_gather_conv_interpret(
        f16, idx, w16, t.row_valid))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_window_starts_properties():
    t = _table()
    idx = np.asarray(neighbor_indices(t, submanifold_offsets((3, 3, 3))))
    v_in = t.capacity
    # mask invalid rows like the wrapper does
    valid = np.asarray(t.row_valid)
    idx = np.where(valid[None, :], idx, v_in)
    block, window = BLOCK, WINDOW
    starts, local, hi_w = window_starts(jnp.array(idx), v_in)
    starts, local, hi_w = (np.asarray(starts), np.asarray(local),
                           np.asarray(hi_w))
    passes = np.maximum(hi_w // window + 1, 1)
    assert (passes >= 1).all()
    # every real neighbor is covered by some pass of its block
    nb2 = idx.shape[1] // block
    loc2 = local.reshape(27, nb2, block)
    real2 = idx.reshape(27, nb2, block) < v_in
    hi = np.where(real2, loc2, -1).max(2)
    np.testing.assert_array_equal(passes, np.maximum(hi // window + 1, 1))
    # starts 256-aligned (16 sublanes x any group factor) and in range
    assert (starts % 256 == 0).all()
    assert (starts >= 0).all()
    assert (starts + window <= v_in).all() or v_in < window
    # real neighbors resolve inside their window
    nb = idx.shape[1] // block
    for k in range(0, 27, 7):
        for j in range(0, nb, 5):
            blk = idx[k, j * block:(j + 1) * block]
            loc = local[k, j * block:(j + 1) * block]
            real = blk < v_in
            np.testing.assert_array_equal(
                loc[real], blk[real] - starts[k, j])
            assert (loc[real] >= 0).all()


def test_multipass_exact():
    """Blocks whose neighbor span exceeds one window run extra passes —
    result must still match the oracle exactly (fat-span scenes)."""
    v = 4096
    rng = np.random.RandomState(4)
    feats = jnp.array(rng.randn(v, 8).astype(np.float32))
    w = jnp.array(rng.randn(1, 8, 8).astype(np.float32) * 0.2)
    # stride-4 monotone gather: every 512-row block spans 2048 input
    # rows => 2 windows per block
    idx = jnp.minimum(jnp.arange(v, dtype=jnp.int32) * 4, v - 1)[None, :]
    valid = jnp.ones((v,), bool)
    rb = windowed_rulebook(idx, valid, v)
    assert int(np.asarray(rb["hi"]).max()) >= WINDOW  # needs pass 2
    want = np.asarray(gather_conv(feats, idx, w, valid))
    got = np.asarray(windowed_gather_conv_interpret(feats, idx, w, valid))
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def test_group_of():
    assert _group_of(8) == 16
    assert _group_of(32) == 4
    assert _group_of(128) == 1
    assert _group_of(256) == 1
    assert _group_of(9) == 1
