"""Tests for the randomized multi-room generator (data/synthetic.py
synthetic_varied_building): per-room ceiling/floor GT (the L-shaped
room-polygon case of celing_floor_room_preprocessing.py) and
visibility-culled point sampling (the gen_pcl/depth_2_pcl stand-in,
/root/reference/data3d/suncg_utils/suncg_preprocess.py:673-834)."""

import numpy as np
import pytest

from detection_3d_tpu.data.dataset_metas import DatasetMetas
from detection_3d_tpu.data.synthetic import synthetic_varied_building

CLASSES = ("background", "wall", "door", "window", "ceiling", "floor")
N2L = DatasetMetas(CLASSES).class_2_label


@pytest.mark.parametrize("seed", [0, 1, 5])
def test_per_room_slabs_and_class_coverage(seed):
    s = synthetic_varied_building(seed=seed, num_points=8000)
    labels = s["gt_labels"]
    n_rooms = s["n_rooms"]
    # one ceiling + one floor PER ROOM — not one building-envelope slab
    assert (labels == N2L["ceiling"]).sum() == n_rooms
    assert (labels == N2L["floor"]).sum() == n_rooms
    assert n_rooms >= 2
    for cls in ("wall", "door"):
        assert (labels == N2L[cls]).sum() >= 1
    assert np.isfinite(s["points"]).all()
    assert np.isfinite(s["gt_boxes"]).all()
    # yx_zb yaw scope
    assert (np.abs(s["gt_boxes"][:, 6]) <= np.pi / 2 + 1e-5).all()


def test_scene_variability():
    """Held-out seeds must differ from training seeds — the whole point
    of the generalization gate (VERDICT r2 item 3)."""
    a = synthetic_varied_building(seed=100, num_points=4000)
    b = synthetic_varied_building(seed=200, num_points=4000)
    assert a["gt_boxes"].shape != b["gt_boxes"].shape or \
        not np.allclose(a["gt_boxes"], b["gt_boxes"])


def test_visibility_culling():
    """No scan points on the outside of the building: every point must
    lie within the active-room footprint (+ wall thickness margin) —
    the one-sided sampling property of the depth-render stand-in."""
    s = synthetic_varied_building(seed=3, num_points=20000, voxel_scale=1)
    pts = s["points"]  # voxel_scale=1: meters, min-shifted
    labels = s["gt_labels"]
    floors = s["gt_boxes"][labels == N2L["floor"]]
    # yx_zb floor boxes: [xc, yc, z_bot, y_size, x_size, z_size, yaw]
    margin = 0.25
    inside = np.zeros(pts.shape[0], bool)
    for f in floors:
        c, sn = np.cos(f[6] + np.pi / 2), np.sin(f[6] + np.pi / 2)
        d = pts[:, :2] - f[:2]
        lx = c * d[:, 0] - sn * d[:, 1]
        ly = sn * d[:, 0] + c * d[:, 1]
        inside |= (np.abs(lx) < f[4] / 2 + margin) & \
            (np.abs(ly) < f[3] / 2 + margin)
    frac_out = 1.0 - inside.mean()
    assert frac_out < 0.01, f"{frac_out:.3f} of points outside rooms"


def test_ceiling_underside_only():
    """Ceiling points sit on the BOTTOM face (z ~ wall_h - 0.12), never
    the top — visibility culling of the unseen exterior face."""
    s = synthetic_varied_building(seed=7, num_points=20000, voxel_scale=1)
    labels = s["gt_labels"]
    ceil = s["gt_boxes"][labels == N2L["ceiling"]][0]
    z_top = ceil[2] + ceil[5]          # z_bot + z_size
    # points within the ceiling slab's footprint at its height
    zs = s["points"][:, 2]
    near_ceiling = zs > ceil[2] - 0.05
    # anything within noise of the top face would betray two-sided
    # sampling; all high points must cluster at the bottom face
    assert (zs[near_ceiling] < z_top - 0.06).mean() > 0.95
