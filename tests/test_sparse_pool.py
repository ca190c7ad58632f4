import numpy as np
import jax.numpy as jnp

from detection_3d_tpu.ops.sparse import downsample_table, conv_rulebook
from detection_3d_tpu.ops.sparse_conv import deconv_rulebook
from detection_3d_tpu.ops.sparse_pool import max_pool, avg_pool, unpool
from tests.test_sparse_core import make_table


def setup():
    coords = np.array([[0, 0, 0, 0], [1, 1, 1, 0], [1, 0, 0, 0],
                       [4, 4, 4, 0]], np.int32)
    feats = np.array([[1.0], [5.0], [3.0], [7.0]], np.float32)
    t = make_table(coords, feats, (8, 8, 8))
    dt = downsample_table(t, (2, 2, 2), (2, 2, 2), capacity=8)
    rb = conv_rulebook(dt, t, (2, 2, 2), (2, 2, 2))
    return t, dt, rb


def test_max_pool():
    t, dt, rb = setup()
    out = np.asarray(max_pool(t.feats, rb, dt.row_valid))
    vals = {tuple(c[:3]): v for c, v in
            zip(np.asarray(dt.coords)[: int(dt.num)].tolist(),
                out[: int(dt.num), 0].tolist())}
    assert vals[(0, 0, 0)] == 5.0  # max of 1, 5, 3
    assert vals[(2, 2, 2)] == 7.0


def test_avg_pool():
    t, dt, rb = setup()
    out = np.asarray(avg_pool(t.feats, rb, dt.row_valid))
    vals = {tuple(c[:3]): v for c, v in
            zip(np.asarray(dt.coords)[: int(dt.num)].tolist(),
                out[: int(dt.num), 0].tolist())}
    np.testing.assert_allclose(vals[(0, 0, 0)], 3.0)  # mean of 1, 5, 3
    np.testing.assert_allclose(vals[(2, 2, 2)], 7.0)


def test_unpool_roundtrip():
    t, dt, rb = setup()
    pooled = avg_pool(t.feats, rb, dt.row_valid)
    drb = deconv_rulebook(t, dt, (2, 2, 2), (2, 2, 2))
    up = np.asarray(unpool(pooled, drb, t.row_valid))
    # every fine site receives its parent's pooled value
    cc = np.asarray(dt.coords)
    parents = {tuple(cc[i][:3]): float(pooled[i, 0])
               for i in range(int(dt.num))}
    fc = np.asarray(t.coords)
    for i in range(int(t.num)):
        key = (fc[i][0] // 2, fc[i][1] // 2, fc[i][2] // 2)
        np.testing.assert_allclose(up[i, 0], parents[key], rtol=1e-6)
