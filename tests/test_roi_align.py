"""roi_align_rotated_sparse + merged multi-level pooling.

Oracle checks: trilinear sampling against a dense numpy interpolator
(the semantics of ROIAlignRotated3D_cuda.cu:16-200), and the merged
single-pass pooler (models/roi_head.pool_rois) against independent
per-level pooling.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from detection_3d_tpu.config import Config, Sparse3DConfig, CapacityConfig
from detection_3d_tpu.config.defaults import RPNConfig, ROIConfig
from detection_3d_tpu.models.structures import Boxes3D
from detection_3d_tpu.ops.geometry import standard_to_yx_zb
from detection_3d_tpu.ops.roi_align import roi_align_rotated_sparse
from detection_3d_tpu.ops.sparse import build_sparse_tensor


def dense_trilinear(grid, p):
    """numpy oracle: trilinear at continuous p (3,) on dense grid
    (X, Y, Z, C); out-of-grid clamped like the kernel."""
    X, Y, Z, _ = grid.shape
    x, y, z = (np.clip(v, 0.0, s - 1) for v, s in zip(p, (X, Y, Z)))
    x0, y0, z0 = int(np.floor(x)), int(np.floor(y)), int(np.floor(z))
    x1, y1, z1 = min(x0 + 1, X - 1), min(y0 + 1, Y - 1), min(z0 + 1, Z - 1)
    fx, fy, fz = x - x0, y - y0, z - z0
    out = 0.0
    for cx, wx in ((x0, 1 - fx), (x1, fx)):
        for cy, wy in ((y0, 1 - fy), (y1, fy)):
            for cz, wz in ((z0, 1 - fz), (z1, fz)):
                out = out + grid[cx, cy, cz] * wx * wy * wz
    return out


def make_level(rng, spatial, c=4, density=0.4, batch=1):
    X, Y, Z = spatial
    mask = rng.rand(X, Y, Z) < density
    coords = np.argwhere(mask).astype(np.int32)
    coords = np.c_[coords, np.zeros((coords.shape[0], 1), np.int32)]
    feats = rng.randn(coords.shape[0], c).astype(np.float32)
    grid = np.zeros((X, Y, Z, c), np.float32)
    grid[mask] = feats
    cap = coords.shape[0] + 7
    t = build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats),
                            jnp.ones((coords.shape[0],), bool), spatial,
                            batch, cap)
    return t, grid


def test_trilinear_matches_dense_oracle():
    rng = np.random.RandomState(0)
    t, grid = make_level(rng, (16, 16, 8))
    # one axis-aligned roi: centers/sizes in voxels
    rois = jnp.asarray([[8.0, 8.0, 4.0, 6.0, 4.0, 4.0, 0.0]], jnp.float32)
    out = np.asarray(roi_align_rotated_sparse(
        t, rois, jnp.ones((1,), bool), (3, 2, 2), sampling_ratio=2))
    # oracle: average of the 2x2x2 samples per bin
    xs, ys, zs = 6.0, 4.0, 4.0
    for b0 in range(3):
        for b1 in range(2):
            for b2 in range(2):
                acc = 0.0
                for i in range(2):
                    for j in range(2):
                        for k in range(2):
                            px = 8 - xs / 2 + (b0 + (i + 0.5) / 2) * xs / 3
                            py = 8 - ys / 2 + (b1 + (j + 0.5) / 2) * ys / 2
                            pz = 4 - zs / 2 + (b2 + (k + 0.5) / 2) * zs / 2
                            acc = acc + dense_trilinear(grid, (px, py, pz))
                np.testing.assert_allclose(out[0, b0, b1, b2], acc / 8,
                                           atol=1e-4, rtol=1e-4)


def test_merged_multilevel_pool_matches_per_level():
    """pool_rois' single merged pass == per-level pooling masked by the
    roi's level assignment (the reference Pooler semantics,
    poolers_3d.py:126-168)."""
    from detection_3d_tpu.models.roi_head import map_levels, pool_rois

    cfg = Config(
        sparse3d=Sparse3DConfig(
            voxel_scale=20, voxel_full_scale=(64, 64, 32),
            nplanes_front=(8, 16, 16), kernels=((2, 2, 2),) * 2,
            strides=((2, 2, 2),) * 2, nplane_map=4),
        rpn=RPNConfig(rpn_scales_from_top=(2, 1),
                      rpn_3d_2d_selector=(0, 1),
                      anchor_sizes_3d=((0.2, 0.5, 3), (0.4, 1.5, 3)),
                      use_yaws=(1, 1)),
        roi=ROIConfig(pooler_scales_from_top=(2, 1), canonical_size=1.0),
        caps=CapacityConfig(max_points=512, voxel_caps=(512, 256, 128)),
    )
    rng = np.random.RandomState(1)
    lvl0, _ = make_level(rng, (16, 16, 8), c=4)   # scale 1/4
    lvl1, _ = make_level(rng, (8, 8, 4), c=4)     # scale 1/8
    roi_maps = [lvl0, lvl1]

    # rois in meters (yx_zb), sized to land on both levels
    boxes_std = np.array([
        [0.4, 0.4, 0.1, 0.3, 0.2, 0.15, 0.4],
        [0.5, 0.3, 0.12, 1.2, 0.9, 0.2, -0.3],
        [0.2, 0.6, 0.08, 2.2, 1.8, 0.1, 0.0],
    ], np.float32)
    boxes = np.asarray(standard_to_yx_zb(jnp.asarray(boxes_std)))
    proposals = Boxes3D(jnp.asarray(boxes), jnp.ones((3,), bool))

    got = np.asarray(pool_rois(cfg, roi_maps, proposals))

    os = cfg.roi.pooler_resolution
    sr = cfg.roi.pooler_sampling_ratio
    levels = np.asarray(map_levels(cfg, proposals.boxes))
    assert len(set(levels.tolist())) == 2, "rois must span both levels"
    vs = float(cfg.sparse3d.voxel_scale)
    want = np.zeros_like(got)
    from detection_3d_tpu.ops.geometry import yx_zb_to_standard
    std = np.asarray(yx_zb_to_standard(proposals.boxes))
    for li, (t, scale) in enumerate(zip(roi_maps,
                                        cfg.roi_spatial_scales())):
        f = vs * scale
        rois_l = np.c_[std[:, :6] * f, std[:, 6:7]]
        sel = levels == li
        p = np.asarray(roi_align_rotated_sparse(
            t, jnp.asarray(rois_l), jnp.asarray(sel), os, sr))
        want[sel] = p[sel]
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_dense_grid_block_gather_matches_search_path():
    """The 2x2x2 block-gather fast path (dense row-index grid) must be
    bit-identical to the sorted-key lookup fallback, including rotated
    rois, multi-"batch" (merged-level) tables, and out-of-grid samples
    at every grid edge."""
    rng = np.random.RandomState(3)
    X, Y, Z, B, C = 16, 12, 8, 2, 4
    mask = rng.rand(B, X, Y, Z) < 0.35
    coords = np.argwhere(mask).astype(np.int32)
    coords = coords[:, [1, 2, 3, 0]]          # (x, y, z, b)
    feats = rng.randn(coords.shape[0], C).astype(np.float32)
    cap = coords.shape[0] + 5
    t = build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats),
                            jnp.ones((coords.shape[0],), bool),
                            (X, Y, Z), B, cap)
    td = t.with_dense_grid(1 << 20)
    assert td.dense_grid is not None and t.dense_grid is None

    rois = jnp.asarray([
        [8.0, 6.0, 4.0, 6.0, 4.0, 4.0, 0.4],
        [1.0, 1.0, 0.5, 5.0, 5.0, 3.0, -0.9],   # spills past low edges
        [15.0, 11.0, 7.5, 6.0, 6.0, 4.0, 1.2],  # spills past high edges
        [8.0, 6.0, 4.0, 30.0, 26.0, 18.0, 0.1],  # covers whole grid
    ], jnp.float32)
    rb = jnp.asarray([0, 1, 1, 0], jnp.int32)
    valid = jnp.ones((4,), bool)

    fast = np.asarray(roi_align_rotated_sparse(
        td, rois, valid, (3, 2, 2), sampling_ratio=2, roi_batch=rb))
    slow = np.asarray(roi_align_rotated_sparse(
        t, rois, valid, (3, 2, 2), sampling_ratio=2, roi_batch=rb))
    np.testing.assert_allclose(fast, slow, atol=1e-5, rtol=1e-5)
