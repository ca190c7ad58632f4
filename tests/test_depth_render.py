"""Depth-render pcl generation (data/depth_render.py) — the gen_pcl /
depth_2_pcl equivalent (reference suncg_preprocess.py:673-834)."""

import numpy as np
import pytest

from detection_3d_tpu.data.depth_render import (
    boxes_to_triangles, cam_extrinsics, cam_focus, cameras_for_rooms,
    depth_to_pcl, make_camera, render_depth, render_house_pcl,
    voxel_downsample,
)


def _flat_wall(cx, cy, cz=1.35, sx=4.0, sy=0.1, sz=2.7, yaw=0.0):
    return np.array([cx, cy, cz, sx, sy, sz, yaw])


def test_extrinsics_orthonormal_and_position():
    cam = make_camera([3.0, 2.0, 1.5], [1.0, 0.2, -0.1], [0, 0, 1.0])
    E = cam_extrinsics(cam)
    R = E[:, :3]
    np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-9)
    np.testing.assert_allclose(E[:, 3], [3.0, 2.0, 1.5])
    # forward column is the normalized view direction
    f = np.array([1.0, 0.2, -0.1])
    np.testing.assert_allclose(R[:, 2], f / np.linalg.norm(f), atol=1e-12)


def test_render_depth_plane_distance():
    """A wall 5 m straight ahead renders depth == 5 at the image center
    (depth is along the forward axis)."""
    wall = _flat_wall(5.0, 0.0, cz=1.5, sx=0.1, sy=8.0, sz=6.0)
    cam = make_camera([0.0, 0.0, 1.5], [1.0, 0.0, 0.0], [0, 0, 1.0])
    d = render_depth(boxes_to_triangles(wall[None]), cam, hw=(60, 80))
    assert d[30, 40] == pytest.approx(5.0 - 0.05, abs=1e-6)  # near face
    assert (d[d > 0] >= 4.9).all()


def test_occlusion_near_wall_hides_far_wall():
    """Two parallel walls; every rendered depth must be the NEAR one —
    the property the box-surface sampler cannot produce."""
    near = _flat_wall(3.0, 0.0, cz=1.5, sx=0.1, sy=8.0, sz=6.0)
    far = _flat_wall(7.0, 0.0, cz=1.5, sx=0.1, sy=8.0, sz=6.0)
    cam = make_camera([0.0, 0.0, 1.5], [1.0, 0.0, 0.0], [0, 0, 1.0])
    tris = boxes_to_triangles(np.stack([near, far]))
    d = render_depth(tris, cam, hw=(60, 80))
    hit = d > 0
    assert hit.any()
    assert d[hit].max() < 3.1       # the 7 m wall is fully occluded


def test_depth_to_pcl_roundtrip_on_surface():
    """Back-projected points of a rendered box lie ON the box surface
    (pinhole math parity: u=(x-0.5w+0.5)*z/f both ways)."""
    box = np.array([4.0, 1.0, 1.5, 2.0, 3.0, 3.0, 0.3])
    cam = make_camera([0.0, 0.0, 1.4], [1.0, 0.25, 0.0], [0, 0, 1.0])
    tris = boxes_to_triangles(box[None])
    d = render_depth(tris, cam, hw=(96, 128))
    pts = depth_to_pcl(d, cam)
    assert pts.shape[0] > 500
    # signed distance to the rotated box: all |sd| small
    # invert the clockwise box rotation: local = [[c,-s],[s,c]] @ rel
    c, s = np.cos(box[6]), np.sin(box[6])
    rel = pts[:, :3] - box[:3]
    loc = np.stack([c * rel[:, 0] - s * rel[:, 1],
                    s * rel[:, 0] + c * rel[:, 1], rel[:, 2]], 1)
    q = np.abs(loc) - box[3:6] / 2
    sd = np.linalg.norm(np.maximum(q, 0), axis=1) + np.minimum(
        np.max(q, axis=1), 0)
    assert np.abs(sd).max() < 0.03


def test_voxel_downsample_unique_cells():
    rng = np.random.RandomState(0)
    pts = rng.rand(5000, 3).astype(np.float32)
    out = voxel_downsample(pts, voxel=0.1)
    keys = np.floor(out[:, :3] / 0.1).astype(np.int64)
    uniq = np.unique(keys, axis=0)
    assert uniq.shape[0] == out.shape[0]      # one point per cell
    assert out.shape[0] < pts.shape[0]


def test_render_house_pcl_covers_and_occludes():
    """4-wall room + floor + ceiling: the merged cloud touches every
    wall, stays on surfaces, and respects the 2 cm downsample."""
    walls = np.stack([
        _flat_wall(2.0, 0.0, sx=4.0, sy=0.1, yaw=0.0),
        _flat_wall(2.0, 4.0, sx=4.0, sy=0.1, yaw=0.0),
        _flat_wall(0.0, 2.0, sx=4.0, sy=0.1, yaw=np.pi / 2),
        _flat_wall(4.0, 2.0, sx=4.0, sy=0.1, yaw=np.pi / 2),
    ])
    floor = np.array([[2.0, 2.0, -0.05, 4.2, 4.2, 0.1, 0.0]])
    ceil = np.array([[2.0, 2.0, 2.75, 4.2, 4.2, 0.1, 0.0]])
    pcl = render_house_pcl({"wall": walls, "floor": floor,
                            "ceiling": ceil}, hw=(48, 64), n_yaw=6)
    assert pcl.shape[0] > 2000
    # every wall is seen from the room interior
    for wb in walls:
        c, s = np.cos(wb[6]), np.sin(wb[6])
        rel = pcl[:, :3] - wb[:3]
        loc = np.stack([c * rel[:, 0] - s * rel[:, 1],
                        s * rel[:, 0] + c * rel[:, 1], rel[:, 2]], 1)
        on = (np.abs(loc) < wb[3:6] / 2 + 0.05).all(1)
        assert on.sum() > 50, f"wall {wb} unseen"
    # nothing outside the room envelope (occlusion keeps views inside)
    assert (pcl[:, 0] > -0.2).all() and (pcl[:, 0] < 4.2).all()
    assert (pcl[:, 2] > -0.2).all() and (pcl[:, 2] < 3.0).all()


def test_cameras_for_rooms_layout():
    rooms = np.array([[2.0, 3.0, 0.0, 5.0, 4.0, 0.2, 0.4]])
    cams = cameras_for_rooms(rooms, n_yaw=8, hw=(60, 80))
    assert cams.shape == (8, 12)
    np.testing.assert_allclose(cams[:, 0], 2.0)
    np.testing.assert_allclose(cams[:, 1], 3.0)
    np.testing.assert_allclose(cams[:, 2], -0.1 + 1.5)
    for cam in cams:
        cam_extrinsics(cam)                    # orthonormal
        cam_focus(cam, (60, 80))               # consistent fovs


def test_triangles_match_geometry_corners():
    """boxes_to_triangles must use the SAME clockwise rotation as
    ops/geometry.box3d_corners — one convention across the stack."""
    import jax
    jax.config.update("jax_platforms", "cpu")
    from detection_3d_tpu.ops.geometry import box3d_corners

    box = np.array([[1.0, 2.0, 1.5, 3.0, 0.4, 2.0, 0.7]])
    tri_verts = boxes_to_triangles(box).reshape(-1, 3)
    ref = np.asarray(box3d_corners(box)).reshape(-1, 3)
    # every triangle vertex is one of the 8 reference corners
    d = np.linalg.norm(tri_verts[:, None] - ref[None], axis=-1).min(1)
    assert d.max() < 1e-6
