"""Generic network factories (SCN networkArchitectures parity):
plan_levels planning, SparseUNet, SparseVGG, FullyConvolutionalNet,
SparseDropout."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from detection_3d_tpu.models.factories import (
    FullyConvolutionalNet, SparseDropout, SparseUNet, SparseVGG,
    plan_levels,
)
from detection_3d_tpu.ops.sparse import build_sparse_tensor

CAPS = (512, 256, 128)


@pytest.fixture(scope="module")
def plan():
    rng = np.random.RandomState(0)
    coords = np.concatenate(
        [rng.randint(0, (48, 48, 16, 1), (300, 4)),
         rng.randint(0, (48, 48, 16, 1), (100, 4))])
    feats = rng.randn(400, 6).astype(np.float32)
    table = build_sparse_tensor(
        jnp.asarray(coords, jnp.int32), jnp.asarray(feats), None,
        (48, 48, 16), 1, CAPS[0])
    return plan_levels(table, CAPS)


def test_plan_levels_shapes(plan):
    assert len(plan["tables"]) == 3
    assert [t.capacity for t in plan["tables"]] == list(CAPS)
    assert len(plan["down_rb"]) == 2 and len(plan["up_rb"]) == 2
    assert plan["down_rb"][0].shape == (8, CAPS[1])
    assert plan["up_rb"][0].shape == (8, CAPS[0])
    assert plan["subm_idx"][0].shape == (27, CAPS[0])


def test_unet_forward_and_grad(plan):
    net = SparseUNet(nplanes=(8, 16, 24), reps=1)
    params = net.init(jax.random.PRNGKey(0), plan)
    out = net.apply(params, plan)
    assert out.shape == (CAPS[0], 8)
    rv = np.asarray(plan["tables"][0].row_valid)
    assert np.isfinite(np.asarray(out)[rv]).all()
    assert np.abs(np.asarray(out)[rv]).sum() > 0

    def loss(p):
        return (net.apply(p, plan) ** 2).sum()

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
    assert any(np.abs(np.asarray(l)).sum() > 0 for l in leaves)


def test_unet_residual(plan):
    net = SparseUNet(nplanes=(8, 16), reps=2, residual=True)
    params = net.init(jax.random.PRNGKey(1), plan)
    out = net.apply(params, plan)
    assert out.shape == (CAPS[0], 8)


def test_vgg_spec(plan):
    net = SparseVGG(layers=(("C", 8), ("C", 8), ("MP",), ("C", 16),
                            ("C3/2", 24)))
    params = net.init(jax.random.PRNGKey(2), plan)
    out, lvl = net.apply(params, plan)
    assert lvl == 2
    assert out.shape == (CAPS[2], 24)


def test_vgg_rejects_unknown_entry(plan):
    net = SparseVGG(layers=(("XX", 8),))
    with pytest.raises(ValueError):
        net.init(jax.random.PRNGKey(0), plan)


def test_fully_convolutional(plan):
    net = FullyConvolutionalNet(nplanes=(8, 16, 24), reps=1)
    params = net.init(jax.random.PRNGKey(3), plan)
    out = net.apply(params, plan)
    assert out.shape == (CAPS[0], 8 + 16 + 24)


def test_dropout_modes(plan):
    feats = jnp.asarray(np.random.RandomState(0).randn(64, 8),
                        jnp.float32)
    valid = jnp.arange(64) < 50
    drop = SparseDropout(rate=0.5)
    params = drop.init(jax.random.PRNGKey(0), feats, valid)
    # deterministic = identity
    out = drop.apply(params, feats, valid, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(feats))
    # train mode: zeros appear, surviving entries scaled by 2, invalid
    # rows untouched
    out = drop.apply(params, feats, valid, deterministic=False,
                     rngs={"dropout": jax.random.PRNGKey(7)})
    o, f = np.asarray(out), np.asarray(feats)
    zeroed = (o[:50] == 0) & (f[:50] != 0)
    assert 0.2 < zeroed.mean() < 0.8
    kept = o[:50][~zeroed]
    np.testing.assert_allclose(kept, (f[:50] * 2)[~zeroed], rtol=1e-6)
    np.testing.assert_array_equal(o[50:], f[50:])
