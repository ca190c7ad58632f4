"""Windowed sorted-key match kernel: interpret-mode parity on CPU."""

import numpy as np
import jax.numpy as jnp

from detection_3d_tpu.ops.sparse import (
    build_sparse_tensor, neighbor_indices, submanifold_offsets,
)
from detection_3d_tpu.ops.pallas.match_kernel import neighbor_match_3x3x3


def _table(n, cap, spatial, seed=0):
    rng = np.random.RandomState(seed)
    coords = np.stack([rng.randint(0, spatial[0], n),
                       rng.randint(0, spatial[1], n),
                       rng.randint(0, spatial[2], n),
                       np.zeros(n, np.int64)], -1).astype(np.int32)
    feats = rng.randn(n, 4).astype(np.float32)
    return build_sparse_tensor(jnp.array(coords), jnp.array(feats),
                               jnp.ones((n,), bool), spatial, 1, cap)


def test_match_kernel_parity():
    t = _table(3000, 4096, (64, 48, 32))
    want = np.asarray(neighbor_indices(t, submanifold_offsets((3, 3, 3))))
    got = np.asarray(neighbor_match_3x3x3(t, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_match_kernel_dense_multipass():
    """Dense table (high occupancy): per-block spans exceed one window
    and edge columns wrap — exact parity still required."""
    t = _table(7000, 8192, (16, 24, 24), seed=5)
    want = np.asarray(neighbor_indices(t, submanifold_offsets((3, 3, 3))))
    got = np.asarray(neighbor_match_3x3x3(t, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_match_kernel_partial_table():
    """Half-empty table: pad rows must map to V (missing)."""
    t = _table(900, 4096, (64, 48, 32), seed=2)
    want = np.asarray(neighbor_indices(t, submanifold_offsets((3, 3, 3))))
    got = np.asarray(neighbor_match_3x3x3(t, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_conv_rulebook_match_parity():
    from detection_3d_tpu.ops.sparse import downsample_table, conv_rulebook
    from detection_3d_tpu.ops.pallas.match_kernel import (
        conv_rulebook_match,
    )
    t = _table(2500, 4096, (64, 48, 32), seed=7)
    out = downsample_table(t, (2, 2, 2), (2, 2, 2), 2048)
    want = np.asarray(conv_rulebook(out, t, (2, 2, 2), (2, 2, 2)))
    got = np.asarray(conv_rulebook_match(out, t, (2, 2, 2), (2, 2, 2),
                                         interpret=True))
    np.testing.assert_array_equal(got, want)


def test_deconv_rulebook_match_parity():
    from detection_3d_tpu.ops.sparse import downsample_table
    from detection_3d_tpu.ops.sparse_conv import deconv_rulebook
    from detection_3d_tpu.ops.pallas.match_kernel import (
        deconv_rulebook_match,
    )
    t = _table(2500, 4096, (64, 48, 32), seed=8)
    coarse = downsample_table(t, (2, 2, 2), (2, 2, 2), 2048)
    want = np.asarray(deconv_rulebook(t, coarse, (2, 2, 2), (2, 2, 2)))
    got = np.asarray(deconv_rulebook_match(t, coarse, (2, 2, 2),
                                           (2, 2, 2), interpret=True))
    np.testing.assert_array_equal(got, want)
