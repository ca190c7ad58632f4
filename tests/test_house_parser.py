"""Offline SUNCG house-parser tests on synthetic fixtures
(suncg_preprocess.py semantics: OBJ part boxes, cam->world frames,
house.json walk, GT refinement chain incl. per-room ceiling/floor)."""

import json

import numpy as np

from detection_3d_tpu.data.house_parser import (
    bbox_from_minmax, cam2world_box, cam2world_points, parse_obj_parts,
    part_oriented_bbox, room_obj_boxes, parse_house, refine_house_boxes,
    sample_surface_points,
)


def box_corners_cam(center, sizes, yaw):
    """8 corners of a box in the SUNCG camera frame (Y up, yaw about Y:
    local +x maps to (cos yaw, 0, sin yaw))."""
    cx, cy, cz = center
    xs, ys, zs = sizes
    corners = []
    for dx in (-0.5, 0.5):
        for dy in (-0.5, 0.5):
            for dz in (-0.5, 0.5):
                lx, ly, lz = dx * xs, dy * ys, dz * zs
                wx = lx * np.cos(yaw) - lz * np.sin(yaw) + cx
                wz = lx * np.sin(yaw) + lz * np.cos(yaw) + cz
                corners.append([wx, ly + cy, wz])
    return np.asarray(corners)


def obj_text_for_boxes(specs):
    """Wavefront OBJ with one 'o' part per (name, center, sizes, yaw)."""
    lines = []
    vbase = 1
    for name, center, sizes, yaw in specs:
        lines.append(f"o {name}")
        corners = box_corners_cam(center, sizes, yaw)
        for c in corners:
            lines.append(f"v {c[0]:.8f} {c[1]:.8f} {c[2]:.8f}")
        # two faces referencing all 8 vertices (content irrelevant to the
        # bbox; the parser collects the part's vertex set)
        idx = list(range(vbase, vbase + 8))
        lines.append("f " + " ".join(str(i) for i in idx[:4]))
        lines.append("f " + " ".join(str(i) for i in idx[4:]))
        vbase += 8
    return "\n".join(lines)


def test_part_oriented_bbox_recovers_rotated_wall():
    center, sizes, yaw = (2.0, 1.35, -3.0), (4.0, 2.7, 0.1), 0.5
    v = box_corners_cam(center, sizes, yaw)
    box = part_oriented_bbox(v, "Wall#0")
    np.testing.assert_allclose(box[:3], center, atol=1e-6)
    np.testing.assert_allclose(box[3:6], sizes, atol=1e-6)
    np.testing.assert_allclose(box[6], yaw, atol=1e-6)
    # negative yaw
    box2 = part_oriented_bbox(box_corners_cam(center, sizes, -0.3), "Wall")
    np.testing.assert_allclose(box2[6], -0.3, atol=1e-6)


def test_part_bbox_non_rectangle_fallback():
    # an L-shaped vertex set: > 8 outer corners -> rejected for walls,
    # axis-aligned fallback for Ceiling (ENABLE_NO_RECTANGLE)
    sq = box_corners_cam((0, 0, 0), (2, 1, 2), 0.0)
    extra = box_corners_cam((1.5, 0, 1.5), (1, 1, 1), 0.0)
    v = np.concatenate([sq, extra])
    assert part_oriented_bbox(v, "Wall#1") is None
    fb = part_oriented_bbox(v, "Ceiling#1")
    assert fb is not None and fb[6] == 0.0
    np.testing.assert_allclose(fb[:3], (v.min(0) + v.max(0)) / 2)


def test_parse_obj_parts_and_room_boxes():
    specs = [("Wall#0", (0, 1, 0), (4, 2, 0.1), 0.0),
             ("Wall#1", (2, 1, 2), (4, 2, 0.1), 1.0)]
    text = obj_text_for_boxes(specs)
    parts = parse_obj_parts(text)
    assert [p["name"] for p in parts] == ["Wall#0", "Wall#1"]
    boxes = room_obj_boxes(text)
    assert len(boxes) == 2
    np.testing.assert_allclose(boxes[1][6], 1.0, atol=1e-6)


def test_cam2world_frames():
    box_cam = np.array([[1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 0.3]])
    w = cam2world_box(box_cam)[0]
    # (x, y, z) -> (x, -z, y); sizes swap y/z
    np.testing.assert_allclose(w, [1.0, -3.0, 2.0, 4.0, 6.0, 5.0, 0.3])
    p = cam2world_points(np.array([[1.0, 2.0, 3.0]]))[0]
    np.testing.assert_allclose(p, [1.0, -3.0, 2.0])


def _two_room_house():
    """house.json dict + room loader for a 2-room single-level house in
    the camera frame (Y up): rooms at x in [0,4] and [4,8], z in [0,3]."""
    wall_h, t = 2.7, 0.1

    def room_objs(x0, x1):
        z0, z1 = 0.0, 3.0
        cx, cz = (x0 + x1) / 2, (z0 + z1) / 2
        walls = [
            ("Wall#a", (cx, wall_h / 2, z0), (x1 - x0, wall_h, t), 0.0),
            ("Wall#b", (cx, wall_h / 2, z1), (x1 - x0, wall_h, t), 0.0),
            ("Wall#c", (x0, wall_h / 2, cz), (z1 - z0, wall_h, t),
             np.pi / 2),
            ("Wall#d", (x1, wall_h / 2, cz), (z1 - z0, wall_h, t),
             np.pi / 2),
        ]
        ceil = [("Ceiling#0", (cx, wall_h, cz), (x1 - x0, 0.1, z1 - z0),
                 0.0)]
        floor = [("Floor#0", (cx, 0.0, cz), (x1 - x0, 0.1, z1 - z0), 0.0)]
        return {"w": obj_text_for_boxes(walls),
                "c": obj_text_for_boxes(ceil),
                "f": obj_text_for_boxes(floor)}

    rooms = {"rm0": room_objs(0.0, 4.0), "rm1": room_objs(4.0, 8.0)}

    house = {
        "scaleToMeters": 1,
        "bbox": {"min": [0, 0, 0], "max": [8, 3, 3]},
        "levels": [{
            "bbox": {"min": [0, 0, 0], "max": [8, 3, 3]},
            "nodes": [
                {"type": "Room", "modelId": "rm0",
                 "bbox": {"min": [0, 0, 0], "max": [4, 3, 3]}},
                {"type": "Room", "modelId": "rm1",
                 "bbox": {"min": [4, 0, 0], "max": [8, 3, 3]}},
                {"type": "Object", "modelId": "m_door",
                 "bbox": {"min": [1.5, 0, -0.05],
                          "max": [2.4, 2.0, 0.15]}},
                {"type": "Object", "modelId": "m_win",
                 "bbox": {"min": [5.0, 0.9, -0.05],
                          "max": [6.2, 1.9, 0.15]}},
            ],
        }],
    }

    def loader(model_id, kind):
        return rooms.get(model_id, {}).get(kind)

    id2class = {"m_door": "door", "m_win": "window"}
    return house, loader, id2class


def test_parse_house_and_refine_two_rooms():
    house, loader, id2class = _two_room_house()
    boxes = parse_house(house, loader, id2class)
    assert boxes["wall"].shape == (8, 7)
    assert boxes["ceiling"].shape == (2, 7)
    assert boxes["floor"].shape == (2, 7)
    assert boxes["door"].shape == (1, 7)
    assert boxes["window"].shape == (1, 7)
    assert boxes["room"].shape == (2, 7)
    # world frame: wall height is now z_size, thickness along y or x
    hs = np.sort(boxes["wall"][:, 3:6], axis=1)
    np.testing.assert_allclose(hs[:, 0], 0.1, atol=1e-6)   # thickness
    np.testing.assert_allclose(boxes["wall"][:, 5], 2.7, atol=1e-6)

    refined = refine_house_boxes(boxes, level_num=1)
    # per-room ceilings/floors survive validation (4 edge walls each)
    assert refined["ceiling"].shape[0] == 2
    assert refined["floor"].shape[0] == 2
    # an envelope slab covering both rooms must be rejected
    env = np.array([[4.0, -1.5, 2.75, 8.0, 3.0, 0.1, 0.0]], np.float32)
    cand = np.concatenate([refined["ceiling_raw"], env])
    from detection_3d_tpu.data.gt_preprocess import preprocess_cfr
    kept = preprocess_cfr(cand, refined["wall"])
    assert kept.shape[0] == 2
    assert not any(np.allclose(k[3], 8.0) for k in kept)
    # openings aligned to host walls: thickness increased to wall fit
    assert refined["door"].shape[0] == 1
    assert refined["window"].shape[0] == 1

    pts = sample_surface_points(refined, num_points=20_000)
    assert pts.shape[0] >= 20_000 * 0.9
    # points live inside the house footprint (world frame)
    assert pts[:, 0].min() > -0.5 and pts[:, 0].max() < 8.5


def test_parse_house_bbox_from_minmax():
    b = bbox_from_minmax([0, 0, 0], [2, 4, 6])
    np.testing.assert_allclose(b, [1, 2, 3, 2, 4, 6, 0])


def test_house_point_cloud_render_path():
    """Rendered point source: occlusion-correct pcl over the parsed
    house (gen_pcl equivalent through house_point_cloud)."""
    from detection_3d_tpu.data.house_parser import house_point_cloud

    house, loader, id2class = _two_room_house()
    refined = refine_house_boxes(parse_house(house, loader, id2class),
                                 level_num=1)
    pts = house_point_cloud(refined, num_points=30_000, method="render",
                            hw=(48, 64), n_yaw=6)
    assert 2_000 < pts.shape[0] <= 30_000
    assert pts[:, 0].min() > -0.5 and pts[:, 0].max() < 8.5
    surf = house_point_cloud(refined, num_points=5_000, method="surface")
    assert surf.shape[0] <= 5_000
