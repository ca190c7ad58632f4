import math

import numpy as np
import pytest

import jax.numpy as jnp

from detection_3d_tpu.ops.geometry import (
    limit_period, limit_yaw, standard_to_yx_zb, yx_zb_to_standard,
    rbbox_corners_2d,
)
from detection_3d_tpu.ops.box_coder import (
    BoxCoder3D, second_box_encode, second_box_decode,
)

PI = math.pi


def test_limit_period_scopes():
    vals = jnp.array([-4.0, -PI, -1.0, 0.0, 1.0, PI, 4.0])
    # [0, pi): offset=0
    out = np.asarray(limit_period(vals, 0.0, PI))
    assert np.all(out >= 0.0) and np.all(out < PI)
    np.testing.assert_allclose(out, np.mod(np.asarray(vals), PI), atol=1e-6)
    # [-pi/2, pi/2): offset=0.5
    out = np.asarray(limit_period(vals, 0.5, PI))
    assert np.all(out >= -PI / 2) and np.all(out < PI / 2)


def test_limit_yaw_matches_modes():
    yaws = jnp.array([-2.0, -0.3, 0.0, 1.0, 2.0, 3.5])
    std = np.asarray(limit_yaw(yaws, yx_zb=False))
    yx = np.asarray(limit_yaw(yaws, yx_zb=True))
    assert np.all((std >= 0) & (std < PI))
    assert np.all((yx >= -PI / 2) & (yx < PI / 2))


def test_box_conversion_roundtrip():
    rng = np.random.RandomState(0)
    std = np.zeros((32, 7), np.float32)
    std[:, :3] = rng.uniform(-10, 10, (32, 3))
    std[:, 3:6] = rng.uniform(0.1, 5, (32, 3))
    std[:, 6] = rng.uniform(0, PI, 32)
    yx = yx_zb_to_standard(standard_to_yx_zb(std))
    out = np.asarray(yx)
    np.testing.assert_allclose(out[:, :6], std[:, :6], atol=1e-5)
    # yaw may wrap by pi at the boundary; compare mod pi
    dyaw = np.mod(out[:, 6] - std[:, 6] + PI / 2, PI) - PI / 2
    np.testing.assert_allclose(dyaw, 0, atol=1e-5)


def test_yx_zb_semantics():
    # standard [xc,yc,zc,xs,ys,zs,yaw=pi/2] -> yx_zb z_bot = zc - zs/2,
    # sizes swapped, yaw 0
    std = jnp.array([[1.0, 2.0, 3.0, 4.0, 0.5, 2.0, PI / 2]])
    yx = np.asarray(standard_to_yx_zb(std))[0]
    np.testing.assert_allclose(yx, [1.0, 2.0, 2.0, 0.5, 4.0, 2.0, 0.0],
                               atol=1e-6)


def test_rbbox_corners_axis_aligned():
    c = np.asarray(rbbox_corners_2d(jnp.array([0.0, 0.0, 2.0, 4.0, 0.0])))
    expect = np.array([[-1, -2], [-1, 2], [1, 2], [1, -2]], np.float32)
    np.testing.assert_allclose(c, expect, atol=1e-6)


def test_rbbox_corners_rotation_clockwise_positive():
    # reference rotation: x' = cos*x + sin*y, y' = -sin*x + cos*y
    c = np.asarray(rbbox_corners_2d(jnp.array([0.0, 0.0, 2.0, 2.0, PI / 2])))
    expect = np.array([[-1, 1], [1, 1], [1, -1], [-1, -1]], np.float32)
    np.testing.assert_allclose(c, expect, atol=1e-6)


def test_codec_roundtrip_smooth_dim():
    rng = np.random.RandomState(1)
    anchors = np.zeros((64, 7), np.float32)
    anchors[:, :3] = rng.uniform(-5, 5, (64, 3))
    anchors[:, 3:6] = rng.uniform(0.2, 4, (64, 3))
    anchors[:, 6] = rng.uniform(-PI / 2, PI / 2, 64)
    boxes = anchors + rng.uniform(-0.1, 0.1, (64, 7)).astype(np.float32)
    enc = second_box_encode(boxes, anchors, smooth_dim=True)
    dec = second_box_decode(enc, anchors, smooth_dim=True)
    np.testing.assert_allclose(np.asarray(dec), boxes, atol=1e-4)


def test_codec_values_match_reference_formula():
    anchor = np.array([[1.0, 2.0, 0.0, 0.5, 3.0, 2.5, 0.1]], np.float32)
    box = np.array([[1.5, 2.5, 0.3, 0.6, 3.3, 2.8, 0.2]], np.float32)
    enc = np.asarray(second_box_encode(box, anchor, smooth_dim=True))[0]
    diag = math.sqrt(3.0 ** 2 + 0.5 ** 2)
    np.testing.assert_allclose(enc[0], 0.5 / diag, rtol=1e-5)
    np.testing.assert_allclose(enc[1], 0.5 / diag, rtol=1e-5)
    np.testing.assert_allclose(enc[2], 0.3 / 2.5, rtol=1e-5)
    np.testing.assert_allclose(enc[3], 0.6 / 0.5 - 1, rtol=1e-4)
    np.testing.assert_allclose(enc[4], 3.3 / 3.0 - 1, rtol=1e-4)
    np.testing.assert_allclose(enc[5], 2.8 / 2.5 - 1, rtol=1e-4)
    np.testing.assert_allclose(enc[6], 0.1, atol=1e-6)


def test_boxcoder_multiclass_decode():
    coder = BoxCoder3D()
    rng = np.random.RandomState(2)
    anchors = np.zeros((8, 7), np.float32)
    anchors[:, 3:6] = 1.0
    enc = rng.uniform(-0.2, 0.2, (8, 21)).astype(np.float32)  # 3 classes
    dec = np.asarray(coder.decode(jnp.array(enc), jnp.array(anchors)))
    assert dec.shape == (8, 21)
    # each class slot decodes independently against the same anchor
    one = np.asarray(coder.decode(jnp.array(enc[:, 7:14]), jnp.array(anchors)))
    np.testing.assert_allclose(dec[:, 7:14], one, atol=1e-6)


def test_boxcoder_yaw_wrap():
    coder = BoxCoder3D()
    anchors = jnp.array([[0, 0, 0, 1, 1, 1, 1.5]], dtype=jnp.float32)
    targets = jnp.array([[0, 0, 0, 1, 1, 1, -1.5]], dtype=jnp.float32)
    enc = np.asarray(coder.encode(targets, anchors))[0]
    # raw diff -3.0 wraps into [-pi/2, pi/2)
    assert -PI / 2 <= enc[6] < PI / 2
    np.testing.assert_allclose(enc[6], -3.0 + PI, atol=1e-5)


def test_standard_to_yx_zb_np_parity():
    """The numpy twin used by host-side scene generation must match the
    jax op bit-for-bit (data/synthetic.py standard_to_yx_zb_np)."""
    from detection_3d_tpu.data.synthetic import standard_to_yx_zb_np
    rng = np.random.RandomState(7)
    boxes = rng.uniform(-5, 5, (64, 7)).astype(np.float32)
    boxes[:, 3:6] = np.abs(boxes[:, 3:6]) + 0.1
    ref = np.asarray(standard_to_yx_zb(jnp.asarray(boxes)))
    got = standard_to_yx_zb_np(boxes).astype(np.float32)
    np.testing.assert_allclose(got, ref, atol=1e-6)
