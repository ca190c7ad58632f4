import numpy as np

from detection_3d_tpu.data.gt_preprocess import (
    define_walls_direction, merge_2pieces_of_1wall, preprocess_walls,
    crop_walls, find_close_walls, preprocess_openings, make_ceiling_floor,
    centroid_line, cenline_intersection_2d,
)


def wall(cx, cy, length, yaw=0.0, t=0.1, h=2.7, zc=1.35):
    return np.array([cx, cy, zc, length, t, h, yaw], np.float64)


def test_define_walls_direction_swaps_thin_axis():
    b = np.array([[0, 0, 1, 0.1, 4.0, 2.7, 0.0]])  # y longer than x
    out = define_walls_direction(b)
    assert out[0, 3] >= out[0, 4]
    np.testing.assert_allclose(out[0, 3], 4.0)
    np.testing.assert_allclose(out[0, 6], np.pi / 2)


def test_merge_two_colinear_pieces():
    # one wall split into [0,2] and [2,5] along x
    b0 = wall(1.0, 0, 2.0)
    b1 = wall(3.5, 0, 3.0)
    m = merge_2pieces_of_1wall(b0, b1, "X")
    assert m is not None
    np.testing.assert_allclose(m[0], 2.5, atol=0.01)  # spans [0,5]
    np.testing.assert_allclose(m[3], 5.0, atol=0.02)


def test_no_merge_for_perpendicular():
    b0 = wall(0, 0, 2.0, yaw=0.0)
    b1 = wall(0, 1, 2.0, yaw=np.pi / 2)
    assert merge_2pieces_of_1wall(b0, b1, "X") is None


def test_no_merge_for_gap():
    b0 = wall(0, 0, 2.0)
    b1 = wall(5.0, 0, 2.0)  # 3m gap
    assert merge_2pieces_of_1wall(b0, b1, "X") is None


def test_merge_along_y_double_drywall():
    b0 = wall(0, 0.05, 4.0, t=0.1)
    b1 = wall(0, -0.05, 4.0, t=0.1)
    m = merge_2pieces_of_1wall(b0, b1, "Y")
    assert m is not None
    np.testing.assert_allclose(m[4], 0.2, atol=0.02)  # combined thickness


def test_cenline_intersection_T_junction():
    # wall A along x through origin; wall B along y hitting A's middle
    a = wall(0, 0, 6.0)
    b = wall(0, 1.5, 3.0, yaw=np.pi / 2)
    pt, on_corner_a = cenline_intersection_2d(a, b)
    assert pt is not None
    np.testing.assert_allclose(pt[:2], [0, 0], atol=1e-6)
    assert not on_corner_a  # mid-span for A
    pt_b, on_corner_b = cenline_intersection_2d(b, a)
    assert on_corner_b  # end of B


def test_crop_wall_at_T_junction():
    a = wall(0, 0, 6.0)
    b = wall(0, 1.5, 3.0, yaw=np.pi / 2)
    out = crop_walls(np.stack([a, b]))
    # A is split into two 3m pieces; B untouched
    lengths = sorted(np.round(out[:, 3], 2))
    assert len(out) == 3
    assert lengths == [3.0, 3.0, 3.0]


def test_find_close_walls_dedup():
    a = wall(0, 0, 4.0)
    b = wall(0.01, 0.005, 4.0)  # near-duplicate
    out = find_close_walls(np.stack([a, b]))
    assert out.shape[0] == 1


def test_preprocess_walls_pipeline():
    # split wall + duplicate + crossing wall
    walls = np.stack([
        wall(1.0, 0, 2.0), wall(3.5, 0, 3.0),    # colinear pieces
        wall(3.51, 0.004, 3.0),                   # duplicate of piece 2
        wall(0, 2, 4.0, yaw=np.pi / 2),           # crossing wall
    ])
    out = preprocess_walls(walls)
    assert out.shape[0] >= 2
    # directions normalized
    assert np.all(out[:, 3] >= out[:, 4])
    assert np.all((out[:, 6] >= 0) & (out[:, 6] < np.pi))


def test_opening_alignment():
    walls = np.stack([wall(0, 0, 6.0, t=0.2)])
    # a window centered on the wall but rotated badly and too thick
    win = np.array([[1.0, 0.0, 1.5, 1.0, 0.9, 1.2, 0.4]])
    out = preprocess_openings(win, walls)
    np.testing.assert_allclose(out[0, 6], walls[0, 6], atol=1e-6)
    np.testing.assert_allclose(out[0, 4], 0.175, atol=1e-6)


def test_make_ceiling_floor():
    walls = np.stack([wall(0, -2, 4.0), wall(0, 2, 4.0),
                      wall(-2, 0, 4.0, yaw=np.pi / 2),
                      wall(2, 0, 4.0, yaw=np.pi / 2)])
    ceiling, floor = make_ceiling_floor(walls)
    assert ceiling.shape == (1, 7) and floor.shape == (1, 7)
    assert floor[0, 2] < ceiling[0, 2]
    assert ceiling[0, 3] >= 4.0


def _rect_walls(x0, y0, x1, y1, h=2.7):
    """Four walls around the rectangle [x0,x1]x[y0,y1] (centerlines ON
    the rectangle edges)."""
    return [wall((x0 + x1) / 2, y0, x1 - x0, h=h),
            wall((x0 + x1) / 2, y1, x1 - x0, h=h),
            wall(x0, (y0 + y1) / 2, y1 - y0, yaw=np.pi / 2, h=h),
            wall(x1, (y0 + y1) / 2, y1 - y0, yaw=np.pi / 2, h=h)]


def test_rooms_from_walls_two_rooms():
    """Two rooms sharing a dividing wall -> one slab pair PER ROOM, not
    the envelope (VERDICT r2 item 6 / celing_floor_room_preprocessing
    per-room semantics)."""
    from detection_3d_tpu.data.gt_preprocess import rooms_from_walls
    walls = np.stack(_rect_walls(0, 0, 4, 3) + _rect_walls(4, 0, 9, 3))
    rooms = rooms_from_walls(walls)
    assert rooms.shape == (2, 7)
    rooms = rooms[np.argsort(rooms[:, 0])]
    np.testing.assert_allclose(rooms[0, :2], [2.0, 1.5], atol=0.05)
    np.testing.assert_allclose(sorted(rooms[0, 3:5]), [3.0, 4.0],
                               atol=0.05)
    np.testing.assert_allclose(rooms[1, :2], [6.5, 1.5], atol=0.05)
    np.testing.assert_allclose(sorted(rooms[1, 3:5]), [3.0, 5.0],
                               atol=0.05)


def test_rooms_from_walls_l_shape():
    """An L-shaped single room (3 cells of a 2x2 grid): the outside
    flood-fill must carve the missing corner out of the envelope and the
    decomposition must cover exactly the L (two rectangles)."""
    from detection_3d_tpu.data.gt_preprocess import rooms_from_walls
    # L outline: (0,0)-(8,0)-(8,4)-(4,4)-(4,8)-(0,8)-(0,0)
    walls = np.stack([
        wall(4, 0, 8.0),                       # bottom
        wall(8, 2, 4.0, yaw=np.pi / 2),        # right lower
        wall(6, 4, 4.0),                       # inner horizontal
        wall(4, 6, 4.0, yaw=np.pi / 2),        # inner vertical
        wall(2, 8, 4.0),                       # top
        wall(0, 4, 8.0, yaw=np.pi / 2),        # left
    ])
    rooms = rooms_from_walls(walls)
    assert rooms.shape[0] == 2
    area = (rooms[:, 3] * rooms[:, 4]).sum()
    np.testing.assert_allclose(area, 48.0, atol=1.0)   # 64 - 16 corner
    # no rectangle may cover the missing (x>4, y>4) corner
    for r in rooms:
        assert not (r[0] + r[3] / 2 > 4.5 and r[1] + r[4] / 2 > 4.5) or \
            not (r[0] - r[3] / 2 < 4.5 and r[1] - r[4] / 2 < 4.5)


def test_rooms_from_walls_rotated():
    """Room recovery is yaw-equivariant (dominant-yaw rotation)."""
    from detection_3d_tpu.data.gt_preprocess import rooms_from_walls
    from detection_3d_tpu.data.gt_preprocess import limit_period_np
    g = 0.3
    c, s = np.cos(g), np.sin(g)

    def rw(w):
        # +g yaw rotates geometry clockwise in this codebase
        x, y = w[0], w[1]
        w = w.copy()
        w[0], w[1] = c * x + s * y, -s * x + c * y
        w[6] = (w[6] + g) % np.pi
        return w

    walls = np.stack([rw(w) for w in _rect_walls(0, 0, 5, 4)])
    rooms = rooms_from_walls(walls)
    assert rooms.shape == (1, 7)
    np.testing.assert_allclose(sorted(rooms[0, 3:5]), [4.0, 5.0],
                               atol=0.05)
    assert abs(limit_period_np(rooms[0, 6] - g, 0.5, np.pi)) < 0.02


def test_make_ceiling_floor_passes_cfr():
    """Generated per-room slabs must survive the preprocess_cfr
    validation gate (>= 3 edge walls each)."""
    from detection_3d_tpu.data.gt_preprocess import preprocess_cfr
    walls = np.stack(_rect_walls(0, 0, 4, 3) + _rect_walls(4, 0, 9, 3))
    ceiling, floor = make_ceiling_floor(walls)
    assert ceiling.shape[0] == 2 and floor.shape[0] == 2
    kept = preprocess_cfr(ceiling, walls)
    assert kept.shape[0] == 2
