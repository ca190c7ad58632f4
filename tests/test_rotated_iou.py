import math

import numpy as np
import jax.numpy as jnp

from detection_3d_tpu.ops.rotated_iou import (
    rotated_iou_pair, rotated_iou_matrix, boxes_iou_3d, z_interval_iou,
)
from detection_3d_tpu.ops.nms import rotate_nms_3d, nms_from_iou

PI = math.pi


def aa_iou(b1, b2):
    """Axis-aligned analytic IoU for [cx,cy,w,h] rects."""
    x11, x12 = b1[0] - b1[2] / 2, b1[0] + b1[2] / 2
    y11, y12 = b1[1] - b1[3] / 2, b1[1] + b1[3] / 2
    x21, x22 = b2[0] - b2[2] / 2, b2[0] + b2[2] / 2
    y21, y22 = b2[1] - b2[3] / 2, b2[1] + b2[3] / 2
    iw = max(0.0, min(x12, x22) - max(x11, x21))
    ih = max(0.0, min(y12, y22) - max(y11, y21))
    inter = iw * ih
    return inter / (b1[2] * b1[3] + b2[2] * b2[3] - inter)


def test_identical_boxes_iou_one():
    b = jnp.array([1.0, 2.0, 3.0, 4.0, 0.3])
    iou = float(rotated_iou_pair(b, b))
    np.testing.assert_allclose(iou, 1.0, atol=1e-5)


def test_axis_aligned_matches_analytic():
    rng = np.random.RandomState(0)
    for _ in range(20):
        b1 = np.array([*rng.uniform(-2, 2, 2), *rng.uniform(0.5, 3, 2), 0.0],
                      np.float32)
        b2 = np.array([*rng.uniform(-2, 2, 2), *rng.uniform(0.5, 3, 2), 0.0],
                      np.float32)
        got = float(rotated_iou_pair(jnp.array(b1), jnp.array(b2)))
        want = aa_iou(b1, b2)
        np.testing.assert_allclose(got, want, atol=1e-4)


def test_rotated_90_deg_same_as_swapped_dims():
    b1 = jnp.array([0.0, 0.0, 2.0, 1.0, 0.0])
    b2 = jnp.array([0.0, 0.0, 1.0, 2.0, PI / 2])  # same rect
    np.testing.assert_allclose(float(rotated_iou_pair(b1, b2)), 1.0, atol=1e-4)


def test_diamond_overlap():
    # unit square vs same square rotated 45 deg: known IoU = 2(sqrt(2)-1)/(2-(2(sqrt2-1)))
    b1 = jnp.array([0.0, 0.0, 1.0, 1.0, 0.0])
    b2 = jnp.array([0.0, 0.0, 1.0, 1.0, PI / 4])
    inter = 2 * (math.sqrt(2) - 1)  # octagon area
    want = inter / (2 - inter)
    np.testing.assert_allclose(float(rotated_iou_pair(b1, b2)), want, atol=1e-4)


def test_disjoint_boxes_zero():
    b1 = jnp.array([0.0, 0.0, 1.0, 1.0, 0.2])
    b2 = jnp.array([10.0, 10.0, 1.0, 1.0, 0.7])
    np.testing.assert_allclose(float(rotated_iou_pair(b1, b2)), 0.0, atol=1e-6)


def test_criteria():
    # query (rbox1) 2x2 at origin; box (rbox2) 1x1 inside -> inter = 1
    q = jnp.array([0.0, 0.0, 2.0, 2.0, 0.0])
    b = jnp.array([0.0, 0.0, 1.0, 1.0, 0.0])
    np.testing.assert_allclose(float(rotated_iou_pair(q, b, -1)), 1 / 4, atol=1e-5)
    np.testing.assert_allclose(float(rotated_iou_pair(q, b, 0)), 1 / 4, atol=1e-5)
    np.testing.assert_allclose(float(rotated_iou_pair(q, b, 1)), 1.0, atol=1e-5)
    # criterion 2, box not thin (1/1 >= 0.25) -> union iou
    np.testing.assert_allclose(float(rotated_iou_pair(q, b, 2)), 1 / 4, atol=1e-5)
    # criterion 2 thin: box 0.1 x 1 inside query 2x2 -> inter=0.1,
    # denom = 0.1 + max(0, 0.5*4 - 0.1) = 2.0
    b_thin = jnp.array([0.0, 0.0, 0.1, 1.0, 0.0])
    np.testing.assert_allclose(float(rotated_iou_pair(q, b_thin, 2)),
                               0.1 / 2.0, atol=1e-5)


def test_thin_wall_self_iou():
    """Reference regression boxes (boxlist_ops_3d.py:147-152,164-176):
    9.5cm-thick walls with yaw 0 / -pi/2 must have self-IoU 1."""
    walls = jnp.array([
        [2.3569, 7.0700, -0.0300, 0.0947, 1.8593, 2.7350, 0.0000],
        [1.1548, 6.1797, -0.0300, 0.0947, 2.3096, 2.7350, -1.5708],
        [12.1804752350, 7.8437194824, 0.0490041152, 0.0947349519,
         3.1549880505, 2.7349998951, 0.0000000000],
    ])
    iou = np.asarray(boxes_iou_3d(walls, walls, criterion=-1))
    np.testing.assert_allclose(np.diag(iou), 1.0, atol=0.01)


def test_near_identical_thin_walls():
    """main1_test_iou_3d pair: nearly identical thin walls, tiny yaw —
    high IoU expected (this is the case check_same_boxes exists for)."""
    a = jnp.array([[12.1757202150, 7.8515229225, 0.0528355837, 0.0964197144,
                    3.1705775261, 2.7384383678, 0.0007397872]])
    b = jnp.array([[12.1804752350, 7.8437194824, 0.0490041152, 0.0947349519,
                    3.1549880505, 2.7349998951, 0.0000000000]])
    iou = float(boxes_iou_3d(a, b, criterion=-1)[0, 0])
    assert iou > 0.5


def test_matrix_orientation_and_blocking():
    rng = np.random.RandomState(3)
    boxes = np.c_[rng.uniform(-3, 3, (70, 2)), rng.uniform(0.5, 2, (70, 2)),
                  rng.uniform(-1.5, 1.5, (70, 1))].astype(np.float32)
    qboxes = boxes[:50]
    m = np.asarray(rotated_iou_matrix(jnp.array(boxes), jnp.array(qboxes),
                                      row_block=16))
    assert m.shape == (70, 50)
    # diag of the first 50x50 sub-block = self-iou = 1
    np.testing.assert_allclose(np.diag(m[:50, :50]), 1.0, atol=1e-4)
    # spot-check symmetry within overlap region (criterion=-1 is symmetric)
    np.testing.assert_allclose(m[:50, :50], m[:50, :50].T, atol=1e-4)


def test_z_interval():
    t = jnp.array([[0.0, 2.0]])  # [0, 2]
    a = jnp.array([[1.0, 2.0], [5.0, 1.0]])  # [1,3], [5,6]
    z = np.asarray(z_interval_iou(t, a))
    np.testing.assert_allclose(z[0, 0], 1.0 / 3.0, atol=1e-6)
    assert z[0, 1] < 0  # disjoint -> negative (reference semantics)


def test_aug_thickness_clamp():
    t = jnp.array([[0.0, 0.0, 0.0, 0.01, 2.0, 2.0, 0.0]])
    a = jnp.array([[0.0, 0.0, 0.0, 0.3, 2.0, 2.0, 0.0]])
    aug = {"target_Y": 0.3, "target_Z": 0.0, "anchor_Y": 0.0, "anchor_Z": 0.0}
    iou = float(boxes_iou_3d(t, a, aug_thickness=aug, criterion=-1)[0, 0])
    np.testing.assert_allclose(iou, 1.0, atol=1e-4)


def test_nms_basic():
    # 3 overlapping + 1 far box; scores pick the middle one first
    boxes = jnp.array([
        [0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0],
        [0.05, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0],
        [0.1, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0],
        [5.0, 5.0, 0.0, 1.0, 1.0, 1.0, 0.0],
    ])
    scores = jnp.array([0.9, 0.95, 0.8, 0.5])
    valid = jnp.ones(4, bool)
    keep, count = rotate_nms_3d(boxes, scores, valid, iou_threshold=0.5,
                                post_max_size=4)
    keep = np.asarray(keep)
    assert int(count) == 2
    assert keep[0] == 1 and keep[1] == 3
    assert np.all(keep[2:] == -1)


def test_nms_respects_valid_mask_and_cap():
    boxes = jnp.tile(jnp.array([[0.0, 0.0, 0.0, 1.0, 1.0, 1.0, 0.0]]), (8, 1))
    boxes = boxes + jnp.arange(8)[:, None] * jnp.array([[3.0, 0, 0, 0, 0, 0, 0]])
    scores = jnp.arange(8, 0, -1).astype(jnp.float32)
    valid = jnp.array([True] * 6 + [False] * 2)
    keep, count = rotate_nms_3d(boxes, scores, valid, iou_threshold=0.5,
                                post_max_size=4)
    assert int(count) == 4  # 6 valid disjoint boxes capped at 4
    assert set(np.asarray(keep).tolist()) == {0, 1, 2, 3}
