"""Visualization toolbox (utils/viz.py) — the headless analogue of the
reference's open3d draw_* debug layer (utils3d/bbox3d_ops.py:1170-1388)."""

import os

import numpy as np
import pytest

from detection_3d_tpu.utils.viz import (_corners2d, _corners3d,
                                        draw_eval_matches,
                                        draw_points_bboxes, draw_scene_3d)

pytest.importorskip("matplotlib")


def _boxes():
    return np.array([[2.0, 1.0, 1.35, 4.0, 0.1, 2.7, 0.0],
                     [0.0, 3.0, 1.35, 4.0, 0.1, 2.7, np.pi / 2],
                     [2.0, 2.0, 2.75, 4.0, 4.0, 0.1, 0.3]])


def test_corners2d_rotation():
    loops = _corners2d(_boxes())
    assert loops.shape == (3, 4, 2)
    # axis-aligned wall: extents match size
    w = loops[0]
    np.testing.assert_allclose(w[:, 0].max() - w[:, 0].min(), 4.0)
    np.testing.assert_allclose(w[:, 1].max() - w[:, 1].min(), 0.1)
    # rotated-90 wall: extents swap
    w = loops[1]
    np.testing.assert_allclose(w[:, 0].max() - w[:, 0].min(), 0.1,
                               atol=1e-12)
    np.testing.assert_allclose(w[:, 1].max() - w[:, 1].min(), 4.0)


def test_corners3d_z_loops():
    cs = _corners3d(_boxes()[:1])
    assert cs.shape == (1, 8, 3)
    np.testing.assert_allclose(cs[0, :4, 2], 0.0, atol=1e-12)
    np.testing.assert_allclose(cs[0, 4:, 2], 2.7, atol=1e-12)


def test_draw_panels_write_pngs(tmp_path):
    rng = np.random.RandomState(0)
    pts = rng.rand(2000, 3) * [5, 5, 3]
    boxes = _boxes()
    labels = np.array([1, 1, 4])
    p1 = draw_points_bboxes(pts, boxes, labels,
                            path=str(tmp_path / "bev.png"),
                            class_names=("bg", "wall", "door", "window",
                                         "ceiling", "floor"),
                            gt_boxes=boxes, gt_labels=labels,
                            title="test")
    p2 = draw_scene_3d(pts, boxes, labels,
                       path=str(tmp_path / "scene3d.png"))
    p3 = draw_eval_matches(boxes, labels, boxes, labels,
                           np.array([0.9, 0.8, 0.7]),
                           matched=np.array([True, False, True]),
                           points=pts, path=str(tmp_path / "m.png"))
    for p in (p1, p2, p3):
        assert os.path.exists(p) and os.path.getsize(p) > 5_000


def test_draw_empty_inputs(tmp_path):
    # no points / no boxes must not crash (debug tools see both)
    p = draw_points_bboxes(None, np.zeros((0, 7)),
                           path=str(tmp_path / "empty.png"))
    assert os.path.exists(p)
