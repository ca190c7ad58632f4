import numpy as np
import jax
import jax.numpy as jnp

from detection_3d_tpu.ops.coords import (
    INVALID, pack_key, lex_searchsorted, lex_sort,
)
from detection_3d_tpu.ops.sparse import (
    SparseTensor, build_sparse_tensor, submanifold_offsets, neighbor_indices,
    downsample_table, conv_rulebook,
)
from detection_3d_tpu.ops.sparse_conv import (
    submanifold_conv, strided_conv, deconv, deconv_rulebook,
)


def make_table(coords_np, feats_np, spatial, batch=1, cap=None):
    n = coords_np.shape[0]
    cap = cap or n + 5
    return build_sparse_tensor(
        jnp.array(coords_np, jnp.int32), jnp.array(feats_np, jnp.float32),
        jnp.ones((n,), bool), spatial, batch, cap)


def test_lex_searchsorted():
    hi = jnp.array([0, 0, 1, 3, 3, INVALID], jnp.int32)
    lo = jnp.array([1, 5, 2, 0, 9, INVALID], jnp.int32)
    qh = jnp.array([0, 0, 1, 3, 3, 2, 0], jnp.int32)
    ql = jnp.array([1, 5, 2, 0, 9, 2, 4], jnp.int32)
    idx, found = lex_searchsorted(hi, lo, qh, ql)
    np.testing.assert_array_equal(np.asarray(found),
                                  [True] * 5 + [False, False])
    np.testing.assert_array_equal(np.asarray(idx[:5]), [0, 1, 2, 3, 4])


def test_build_dedup_mean():
    coords = np.array([[1, 2, 3, 0], [1, 2, 3, 0], [0, 0, 0, 0],
                       [5, 5, 5, 0]], np.int32)
    feats = np.array([[2.0], [4.0], [1.0], [7.0]], np.float32)
    t = make_table(coords, feats, (8, 8, 8))
    assert int(t.num) == 3
    c = np.asarray(t.coords[: int(t.num)])
    f = np.asarray(t.feats[: int(t.num)])
    # sorted by key: (0,0,0) < (1,2,3) < (5,5,5)
    np.testing.assert_array_equal(c[:, :3], [[0, 0, 0], [1, 2, 3], [5, 5, 5]])
    np.testing.assert_allclose(f[:, 0], [1.0, 3.0, 7.0])  # mean of dups
    # padding rows zeroed / INVALID
    assert np.all(np.asarray(t.feats[3:]) == 0)
    assert np.all(np.asarray(t.hi[3:]) == INVALID)


def test_out_of_grid_dropped():
    coords = np.array([[0, 0, 0, 0], [9, 0, 0, 0], [-1, 2, 2, 0]], np.int32)
    feats = np.ones((3, 2), np.float32)
    t = make_table(coords, feats, (8, 8, 8))
    assert int(t.num) == 1


def dense_from_table(t):
    """Scatter table to dense [X, Y, Z, C] (batch 0 only)."""
    X, Y, Z = t.spatial_size
    d = np.zeros((X, Y, Z, t.num_channels), np.float32)
    c = np.asarray(t.coords)
    f = np.asarray(t.feats)
    for i in range(int(t.num)):
        x, y, z, b = c[i]
        d[x, y, z] += f[i]
    return d


def test_submanifold_conv_vs_dense():
    rng = np.random.RandomState(0)
    n, cin, cout = 40, 3, 5
    coords = np.unique(rng.randint(0, 10, (n, 3)), axis=0)
    coords = np.c_[coords, np.zeros((coords.shape[0], 1), np.int32)].astype(np.int32)
    feats = rng.randn(coords.shape[0], cin).astype(np.float32)
    t = make_table(coords, feats, (10, 10, 10))

    offs = submanifold_offsets((3, 3, 3))
    nidx = neighbor_indices(t, offs)
    w = rng.randn(27, cin, cout).astype(np.float32) * 0.1
    out = submanifold_conv(t.feats, nidx, jnp.array(w), t.row_valid)

    # dense oracle: full 3^3 conv then mask to active sites
    dense = dense_from_table(t)
    pad = np.pad(dense, ((1, 1), (1, 1), (1, 1), (0, 0)))
    got = np.asarray(out)
    c = np.asarray(t.coords)
    for i in range(int(t.num)):
        x, y, z, _ = c[i]
        acc = np.zeros(cout, np.float32)
        for k, (dx, dy, dz) in enumerate(offs):
            acc += pad[x + dx + 1, y + dy + 1, z + dz + 1] @ w[k]
        np.testing.assert_allclose(got[i], acc, atol=1e-4)
    assert np.all(got[int(t.num):] == 0)


def test_submanifold_preserves_sites():
    """Submanifold conv must not activate new sites: inactive neighbors
    contribute zero but outputs exist only at input sites (the defining
    property, SubmanifoldConvolutionRules.h:26-57)."""
    coords = np.array([[2, 2, 2, 0], [2, 2, 3, 0]], np.int32)
    feats = np.ones((2, 2), np.float32)
    t = make_table(coords, feats, (6, 6, 6))
    offs = submanifold_offsets((3, 3, 3))
    nidx = neighbor_indices(t, offs)
    w = np.zeros((27, 2, 2), np.float32)
    w[13] = np.eye(2)  # center offset only
    out = np.asarray(submanifold_conv(t.feats, nidx, jnp.array(w), t.row_valid))
    np.testing.assert_allclose(out[: int(t.num)], np.ones((2, 2)), atol=1e-6)


def test_downsample_table_k2s2():
    coords = np.array([[0, 0, 0, 0], [1, 1, 1, 0], [2, 2, 2, 0],
                       [7, 7, 7, 0]], np.int32)
    feats = np.ones((4, 1), np.float32)
    t = make_table(coords, feats, (8, 8, 8))
    dt = downsample_table(t, (2, 2, 2), (2, 2, 2), capacity=8)
    assert dt.spatial_size == (4, 4, 4)
    assert int(dt.num) == 3  # (0,0,0) x2 -> 1 site, (1,1,1), (3,3,3)
    c = np.asarray(dt.coords[: int(dt.num)])[:, :3]
    assert {tuple(r) for r in c.tolist()} == {(0, 0, 0), (1, 1, 1), (3, 3, 3)}


def test_downsample_table_k4s2_overlap():
    """kernel 4, stride 2: receptive fields overlap, one input activates
    up to 2 outputs per axis (ConvolutionRules.h:11-60 semantics)."""
    coords = np.array([[3, 0, 0, 0]], np.int32)
    feats = np.ones((1, 1), np.float32)
    t = make_table(coords, feats, (8, 4, 4))
    dt = downsample_table(t, (4, 2, 2), (2, 2, 2), capacity=8)
    c = {tuple(r) for r in
         np.asarray(dt.coords[: int(dt.num)])[:, :3].tolist()}
    # x=3 inside windows of outputs ox where 2*ox <= 3 < 2*ox+4 -> ox in {0,1}
    assert c == {(0, 0, 0), (1, 0, 0)}


def test_strided_conv_vs_dense():
    rng = np.random.RandomState(1)
    coords = np.unique(rng.randint(0, 8, (30, 3)), axis=0)
    coords = np.c_[coords, np.zeros((coords.shape[0], 1))].astype(np.int32)
    feats = rng.randn(coords.shape[0], 2).astype(np.float32)
    t = make_table(coords, feats, (8, 8, 8))
    dt = downsample_table(t, (2, 2, 2), (2, 2, 2), capacity=40)
    rb = conv_rulebook(dt, t, (2, 2, 2), (2, 2, 2))
    w = rng.randn(8, 2, 3).astype(np.float32) * 0.2
    out = np.asarray(strided_conv(t.feats, rb, jnp.array(w), dt.row_valid))

    dense = dense_from_table(t)
    c = np.asarray(dt.coords)
    for i in range(int(dt.num)):
        ox, oy, oz, _ = c[i]
        acc = np.zeros(3, np.float32)
        k = 0
        for kx in range(2):
            for ky in range(2):
                for kz in range(2):
                    acc += dense[ox * 2 + kx, oy * 2 + ky, oz * 2 + kz] @ w[k]
                    k += 1
        np.testing.assert_allclose(out[i], acc, atol=1e-4)


def test_deconv_inverts_sites():
    """Deconv scatters coarse features back onto the cached fine table:
    with kernel=stride=2 and identity weights at every offset, each fine
    site receives exactly its parent's features."""
    rng = np.random.RandomState(2)
    coords = np.unique(rng.randint(0, 8, (20, 3)), axis=0)
    coords = np.c_[coords, np.zeros((coords.shape[0], 1))].astype(np.int32)
    feats = rng.randn(coords.shape[0], 2).astype(np.float32)
    fine = make_table(coords, feats, (8, 8, 8))
    coarse = downsample_table(fine, (2, 2, 2), (2, 2, 2), capacity=30)
    cf = rng.randn(coarse.capacity, 2).astype(np.float32)
    cf[int(coarse.num):] = 0
    rb = deconv_rulebook(fine, coarse, (2, 2, 2), (2, 2, 2))
    w = np.stack([np.eye(2, dtype=np.float32)] * 8)
    out = np.asarray(deconv(jnp.array(cf), rb, jnp.array(w), fine.row_valid))

    cc = np.asarray(coarse.coords)
    parent = {tuple(cc[i][:3]): cf[i] for i in range(int(coarse.num))}
    fc = np.asarray(fine.coords)
    for i in range(int(fine.num)):
        key = (fc[i][0] // 2, fc[i][1] // 2, fc[i][2] // 2)
        np.testing.assert_allclose(out[i], parent[key], atol=1e-5)


def test_batch_separation():
    """Same xyz in different batch elements stay distinct sites."""
    coords = np.array([[1, 1, 1, 0], [1, 1, 1, 1]], np.int32)
    feats = np.array([[1.0], [2.0]], np.float32)
    t = build_sparse_tensor(jnp.array(coords), jnp.array(feats),
                            jnp.ones(2, bool), (4, 4, 4), 2, 6)
    assert int(t.num) == 2


def test_dense_grid_lookup_matches_search():
    rng = np.random.RandomState(5)
    coords = np.unique(rng.randint(0, 12, (60, 3)), axis=0)
    coords = np.c_[coords, np.zeros((coords.shape[0], 1))].astype(np.int32)
    feats = rng.randn(coords.shape[0], 2).astype(np.float32)
    t = make_table(coords, feats, (12, 12, 12))
    tg = t.with_dense_grid()
    assert tg.dense_grid is not None

    q = np.c_[rng.randint(-2, 14, (200, 3)),
              np.zeros((200, 1))].astype(np.int32)
    i1, f1 = t.lookup(jnp.array(q))
    i2, f2 = tg.lookup(jnp.array(q))
    np.testing.assert_array_equal(np.asarray(f1), np.asarray(f2))
    found = np.asarray(f1)
    np.testing.assert_array_equal(np.asarray(i1)[found],
                                  np.asarray(i2)[found])


def test_dense_grid_respects_budget():
    coords = np.array([[0, 0, 0, 0]], np.int32)
    feats = np.ones((1, 1), np.float32)
    t = make_table(coords, feats, (64, 64, 64))
    assert t.with_dense_grid(max_entries=1000).dense_grid is None
    assert t.with_dense_grid(max_entries=1 << 20).dense_grid is not None


def test_capacity_overflow_strided_unbiased():
    """Over-capacity input: true_num reports the real count and the kept
    voxels cover the WHOLE key range (strided drop, not sorted-suffix)."""
    n = 64
    xs = np.arange(n, dtype=np.int32)
    coords = np.stack([xs, np.zeros_like(xs), np.zeros_like(xs),
                       np.zeros_like(xs)], axis=-1)
    feats = xs[:, None].astype(np.float32)
    cap = 16
    t = build_sparse_tensor(jnp.array(coords), jnp.array(feats),
                            jnp.ones((n,), bool), (64, 4, 4), 1, cap)
    assert int(t.true_num) == n          # pre-truncation count signals
    assert int(t.num) == cap             # exactly ceil(64/4) kept
    kept_x = np.asarray(t.coords[: int(t.num), 0])
    # every 4th voxel kept: spatially uniform coverage of [0, 64)
    np.testing.assert_array_equal(kept_x, np.arange(0, 64, 4))
    # under capacity: true_num == num, nothing dropped
    t2 = build_sparse_tensor(jnp.array(coords), jnp.array(feats),
                             jnp.ones((n,), bool), (64, 4, 4), 1, 128)
    assert int(t2.true_num) == int(t2.num) == n


def test_lookup_paths_agree():
    """binary-search, dense-3D-grid, and xy-column-grid lookups must
    return identical (idx, found) on random tables and queries."""
    rng = np.random.RandomState(3)
    spatial = (32, 24, 16)
    n = 300
    coords = np.stack([rng.randint(0, spatial[0], n),
                       rng.randint(0, spatial[1], n),
                       rng.randint(0, spatial[2], n),
                       np.zeros(n, np.int64)], -1).astype(np.int32)
    feats = rng.rand(n, 3).astype(np.float32)
    base = build_sparse_tensor(jnp.array(coords), jnp.array(feats),
                               jnp.ones((n,), bool), spatial, 1, 512)
    dense = base.with_dense_grid(1 << 20)
    xy = SparseTensor(base.coords, base.feats, base.hi, base.lo, base.num,
                      base.spatial_size, base.batch_size).with_xy_grid(1 << 20)
    assert dense.dense_grid is not None and xy.xy_grid is not None

    m = 500
    q = np.stack([rng.randint(-2, spatial[0] + 2, m),
                  rng.randint(-2, spatial[1] + 2, m),
                  rng.randint(-2, spatial[2] + 2, m),
                  np.zeros(m, np.int64)], -1).astype(np.int32)
    # include exact hits
    q[:100] = np.asarray(base.coords[:100])
    q = jnp.array(q)
    i0, f0 = base.lookup(q)
    i1, f1 = dense.lookup(q)
    i2, f2 = xy.lookup(q)
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f2))
    fm = np.asarray(f0)
    np.testing.assert_array_equal(np.asarray(i0)[fm], np.asarray(i1)[fm])
    np.testing.assert_array_equal(np.asarray(i0)[fm], np.asarray(i2)[fm])
    # batched (K, V) query shape as used by rulebook builders
    qb = q.reshape(5, 100, 4)
    ib, fb = xy.lookup(qb)
    np.testing.assert_array_equal(np.asarray(fb).ravel(), fm)


def test_grouped_rulebooks_match_plain():
    """xy-grid grouped builders (8 column searches + z adjacency) must
    produce the exact rulebooks of the plain per-offset binary search."""
    rng = np.random.RandomState(11)
    spatial = (32, 24, 16)
    n = 400
    coords = np.stack([rng.randint(0, spatial[0], n),
                       rng.randint(0, spatial[1], n),
                       rng.randint(0, spatial[2], n),
                       np.zeros(n, np.int64)], -1).astype(np.int32)
    # add some dense z columns (walls) to exercise adjacency
    zcol = np.stack([np.full(16, 5), np.full(16, 7), np.arange(16),
                     np.zeros(16)], -1).astype(np.int32)
    coords = np.concatenate([coords, zcol])
    feats = np.ones((coords.shape[0], 2), np.float32)
    plain = build_sparse_tensor(jnp.array(coords), jnp.array(feats),
                                jnp.ones((coords.shape[0],), bool),
                                spatial, 1, 512)
    gridded = SparseTensor(plain.coords, plain.feats, plain.hi, plain.lo,
                           plain.num, plain.spatial_size,
                           plain.batch_size).with_xy_grid(1 << 20)
    offs = submanifold_offsets((3, 3, 3))
    rb_plain = np.asarray(neighbor_indices(plain, offs))
    rb_grouped = np.asarray(neighbor_indices(gridded, offs))
    np.testing.assert_array_equal(rb_plain, rb_grouped)

    out_plain = downsample_table(plain, (2, 2, 2), (2, 2, 2), 256)
    crb_plain = np.asarray(conv_rulebook(out_plain, plain,
                                         (2, 2, 2), (2, 2, 2)))
    crb_grouped = np.asarray(conv_rulebook(out_plain, gridded,
                                           (2, 2, 2), (2, 2, 2)))
    np.testing.assert_array_equal(crb_plain, crb_grouped)


def test_downsample_with_rulebooks_matches_searched():
    """Scatter-derived rulebooks (downsample_with_rulebooks) must equal
    the searched conv_rulebook / deconv_rulebook exactly — including
    kernel>stride overlap and capacity overflow."""
    from detection_3d_tpu.ops.sparse import downsample_with_rulebooks

    rng = np.random.RandomState(0)
    coords = np.unique(
        rng.randint(0, 16, (600, 3)).astype(np.int32), axis=0)
    coords = np.c_[coords, np.zeros((coords.shape[0], 1), np.int32)]
    feats = rng.randn(coords.shape[0], 2).astype(np.float32)
    for kernel, stride, cap in (((2, 2, 2), (2, 2, 2), 512),
                                ((4, 2, 2), (2, 2, 2), 512),
                                ((2, 2, 2), (2, 2, 2), 64)):  # overflow
        t = make_table(coords, feats, (16, 16, 16), cap=640)
        ref_t = downsample_table(t, kernel, stride, cap)
        ref_c = conv_rulebook(ref_t, t, kernel, stride)
        ref_d = deconv_rulebook(t, ref_t, kernel, stride)
        out_t, crb, drb = downsample_with_rulebooks(t, kernel, stride,
                                                    cap)
        np.testing.assert_array_equal(np.asarray(out_t.coords),
                                      np.asarray(ref_t.coords))
        assert int(out_t.num) == int(ref_t.num)
        np.testing.assert_array_equal(np.asarray(crb), np.asarray(ref_c))
        np.testing.assert_array_equal(np.asarray(drb), np.asarray(ref_d))


def test_build_sparse_tensor_row_map():
    coords = np.array([[0, 0, 0, 0], [1, 1, 1, 0], [0, 0, 0, 0],
                       [5, 5, 5, 0]], np.int32)
    feats = np.ones((4, 1), np.float32)
    t, row_map = build_sparse_tensor(
        jnp.array(coords), jnp.array(feats), jnp.ones((4,), bool),
        (8, 8, 8), 1, 8, return_row_map=True)
    rm = np.asarray(row_map)
    tc = np.asarray(t.coords)
    for i in range(4):
        assert (tc[rm[i], :3] == coords[i, :3]).all()
    assert rm[0] == rm[2]  # duplicates share the output row


def test_bev_with_rulebook_matches_searched():
    from detection_3d_tpu.models.backbone import (
        bev_collapse_table, bev_rulebook, bev_with_rulebook,
    )

    rng = np.random.RandomState(1)
    coords = np.unique(rng.randint(0, 8, (200, 3)).astype(np.int32),
                       axis=0)
    coords = np.c_[coords, np.zeros((coords.shape[0], 1), np.int32)]
    feats = rng.randn(coords.shape[0], 2).astype(np.float32)
    t = make_table(coords, feats, (8, 8, 8), cap=256)
    ref_bev = bev_collapse_table(t, 256)
    ref_rb = bev_rulebook(ref_bev, t)
    bev_t, rb = bev_with_rulebook(t, 256)
    np.testing.assert_array_equal(np.asarray(bev_t.coords),
                                  np.asarray(ref_bev.coords))
    np.testing.assert_array_equal(np.asarray(rb), np.asarray(ref_rb))
