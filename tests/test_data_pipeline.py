import numpy as np
import pytest

from detection_3d_tpu.data.scene_packing import split_scene
from detection_3d_tpu.data.synthetic import synthetic_building
from detection_3d_tpu.data.suncg import SUNCGDataset, _set_yaw_zero
from detection_3d_tpu.data.augment import augment_scene
from detection_3d_tpu.config import Config
from detection_3d_tpu.evaluation.detection_eval import (
    evaluate_detections, save_results,
)


def test_split_scene_small_passthrough():
    s = synthetic_building(seed=0, num_points=2000, room=5.0, voxel_scale=1)
    s = dict(s, voxel_scale=1.0)
    out = split_scene(s, max_size_m=50.0)
    assert len(out) == 1


def test_split_scene_blocks():
    s = synthetic_building(seed=0, num_points=8000, room=12.0, voxel_scale=1)
    s = dict(s, voxel_scale=1.0)
    out = split_scene(s, max_size_m=7.0, min_points=10)
    assert len(out) >= 4
    total_gt = sum(b["gt_boxes"].shape[0] for b in out)
    assert total_gt == s["gt_boxes"].shape[0]  # centroid partition
    for b in out:
        assert b["points"].min() >= 0
        ext = b["points"].max(0) - b["points"].min(0)
        assert ext[0] <= 7.0 + 1.1  # block + overlap margin


def test_split_scene_point_cap():
    s = synthetic_building(seed=1, num_points=5000, room=4.0, voxel_scale=1)
    s = dict(s, voxel_scale=1.0)
    out = split_scene(s, max_size_m=50.0, max_points=1000)
    assert all(b["points"].shape[0] <= 1000 for b in out)


def test_set_yaw_zero_swaps_odd_quarters():
    b = np.array([[0, 0, 0, 2.0, 4.0, 1.0, np.pi / 2]])
    out = _set_yaw_zero(b)
    np.testing.assert_allclose(out[0, 3], 4.0)
    np.testing.assert_allclose(out[0, 4], 2.0)
    np.testing.assert_allclose(out[0, 6], 0.0)


def test_prepare_scene_transforms():
    cfg = Config()
    ds = SUNCGDataset("train", cfg, data_root="")
    rng = np.random.RandomState(0)
    pcl = np.c_[rng.uniform(-3, 3, (500, 3)), rng.rand(500, 6)].astype(
        np.float32)
    # one standard wall box
    bdic = {"wall": np.array([[0, 0, 1.35, 4.0, 0.1, 2.7, 0.0]], np.float32)}
    scene = ds.prepare_scene(pcl, bdic)
    assert scene["points"].min() >= 0
    assert scene["gt_labels"][0] == 1  # canonical wall label
    # gt shifted consistently: wall center in scaled coords inside cloud
    c = scene["gt_boxes"][0, :2] * cfg.sparse3d.voxel_scale
    assert (c >= 0).all() and (c <= scene["points"].max(0)[:2] + 1).all()


def test_augment_disabled_identity_points_shift_only():
    s = synthetic_building(seed=0, num_points=1000, room=4.0, voxel_scale=50)
    rng = np.random.RandomState(0)
    out = augment_scene(s, rng)
    # all aug off: only min-shift (already shifted) => identical
    np.testing.assert_allclose(out["points"], s["points"] -
                               (s["points"].min(0)), atol=1e-4)


def test_save_results(tmp_path):
    preds = [{"boxes": np.zeros((0, 7), np.float32),
              "scores": np.zeros((0,)), "labels": np.zeros((0,), np.int64)}]
    gts = [{"boxes": np.array([[1, 1, 0, 0.1, 2, 2.7, 0.0]], np.float32),
            "labels": np.array([1])}]
    r = evaluate_detections(preds, gts, 2, 0.2,
                            class_names=("background", "wall"))
    p = save_results(r, str(tmp_path), 1, 0.2, epoch=3)
    text = open(p).read()
    assert "wall" in text and "iou_thresh" in text
    import os
    assert os.path.exists(tmp_path / "performance_res.npz")


def test_detail_table_and_pr_curves(tmp_path):
    """performance_str-style detail rows + PR curve export
    (suncg_eval.py:213-332, 579-688)."""
    # 3 preds: scores 0.9 TP, 0.8 TP, 0.4 FP on 2 gts
    preds = [{"boxes": np.array([[1, 1, 0, 0.1, 2, 2.7, 0.0],
                                 [4, 1, 0, 0.1, 2, 2.7, 0.0],
                                 [9, 9, 0, 0.1, 2, 2.7, 0.0]], np.float32),
              "scores": np.array([0.9, 0.8, 0.4]),
              "labels": np.array([1, 1, 1])}]
    gts = [{"boxes": np.array([[1, 1, 0, 0.1, 2, 2.7, 0.0],
                               [4, 1, 0, 0.1, 2, 2.7, 0.0]], np.float32),
            "labels": np.array([1, 1])}]
    r = evaluate_detections(preds, gts, 2, 0.2,
                            class_names=("background", "wall"))
    assert 1 in r.curves
    c = r.curves[1]
    np.testing.assert_allclose(c["rec"], [0.5, 1.0, 1.0])
    np.testing.assert_allclose(c["prec"], [1.0, 1.0, 2 / 3])
    assert (c["match"] == [1, 1, 0]).all()
    table = r.detail_table()
    assert "st5 prec" in table and "r9p" in table and "gt num" in table
    # operating point score >= 0.5: 2 TPs, prec 1.0, rec 1.0
    p = save_results(r, str(tmp_path), 1, 0.2, epoch=1)
    text = open(p).read()
    assert "st5 prec" in text
    import os
    assert os.path.exists(tmp_path / "pr_curves.png")
    z = np.load(tmp_path / "performance_res.npz")
    assert "curve_1_prec" in z
