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


def test_symmetric_class_yaw_canonical():
    """Ceiling/floor GT yaws are canonicalized into (-pi/4, pi/4] by
    quarter-turn size swaps (set_yaw_zero semantics generalized to
    rotated buildings, data/synthetic._canonicalize_symmetric): without
    this the RPN yaw gate (|dif| <= 0.7) kills every slab anchor and
    slabs train on low-quality rescue only (r5 root cause of the r4
    held-out ceiling/floor failure)."""
    for seed in range(6):
        s = synthetic_varied_building(seed=seed, num_points=5000,
                                      voxel_scale=1)
        lab = s["gt_labels"]
        sym = np.isin(lab, [N2L["ceiling"], N2L["floor"]])
        yaws = s["gt_boxes"][sym, 6]
        assert np.all(np.abs(yaws) <= np.pi / 4 + 1e-5), (seed, yaws)


def test_canonicalize_symmetric_preserves_geometry():
    """The quarter-turn re-expression is lossless: the canonical box has
    the same footprint corners and z interval as the original. (Corner
    comparison, not IoU: the polygon clipper double-counts coincident
    corners when two EXACTLY identical rects meet under swapped
    parameterization — a degenerate case that cannot arise between
    distinct boxes.)"""
    import jax.numpy as jnp

    from detection_3d_tpu.data.synthetic import _canonicalize_symmetric
    from detection_3d_tpu.ops.geometry import (rbbox_corners_2d,
                                               yx_zb_to_standard)

    def corner_set(yx):
        std = np.asarray(yx_zb_to_standard(jnp.asarray(yx)))[0]
        cs = np.asarray(rbbox_corners_2d(
            jnp.asarray(std[[0, 1, 3, 4, 6]])))
        return cs[np.lexsort((cs[:, 1], cs[:, 0]))]

    rng = np.random.RandomState(0)
    for yaw0 in (-1.45, -0.9, 1.3, 1.56):
        b = np.array([[3.0, 4.0, 0.5, 2.0 + rng.rand(), 3.0, 0.4, yaw0]],
                     np.float32)
        c = _canonicalize_symmetric(b, np.array([4]), [4])
        assert abs(c[0, 6]) <= np.pi / 4 + 1e-6
        np.testing.assert_allclose(corner_set(b), corner_set(c),
                                   atol=1e-5, err_msg=str(yaw0))
        np.testing.assert_allclose(b[0, [2, 5]], c[0, [2, 5]])


@pytest.mark.slow
def test_gate_anchor_coverage_regression():
    """Pin the r5 anchor-layout fix: on the generalization-gate config,
    every wall/door/floor GT must have at least one ABOVE-THRESHOLD
    positive anchor (not just a low-quality rescue), ceilings nearly
    all, and no class may have orphans. Guards the anchor->map pairing
    (tools/generalization_check.gen_config rpn_3d_2d_selector) and the
    symmetric-yaw canonicalization against regressions (r4 failure
    mode: window/door/slab classes trained on rescue anchors only)."""
    import os
    import sys
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..",
                                    "tools"))
    from diag_anchor_coverage import main

    pc = main(seeds=(0,), verbose=False)
    for cname in ("wall", "door", "floor"):
        st = pc[cname]
        assert st["n_gt"] > 0
        assert st["covered"] == st["n_gt"], (cname, st)
    ceil = pc["ceiling"]
    assert ceil["covered"] >= ceil["n_gt"] - 2, ceil
    for cname, st in pc.items():
        if st["n_gt"]:
            orphan = st["n_gt"] - st["covered"] - st["rescued"]
            assert orphan == 0, (cname, st)
