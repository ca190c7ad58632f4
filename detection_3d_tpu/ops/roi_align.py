"""Rotated 3D ROI align by sparse gather — no dense materialization.

Replaces the reference pair SparseToDense + ROIAlignRotated3D CUDA
(/root/reference/SparseConvNet/sparseconvnet/SCN/CUDA/SparseToDense.cu,
/root/reference/maskrcnn_benchmark/csrc/cuda/ROIAlignRotated3D_cuda.cu:
88-177): instead of scattering each FPN level into a [B,C,X,Y,Z] dense
tensor and bilinearly sampling it, sample points are generated per bin,
trilinear corner voxels are looked up directly in the sorted sparse table
(missing voxels = 0, identical to the dense zeros), and the 8-corner
weighted gather is one vectorized op.

Sampling math parity with RoIAlignRotated3DForward (the .cu above):
  * bins (os0, os1, os2), sampling_ratio samples per axis at bin-relative
    offsets (i + 0.5)/ratio, averaged;
  * local offsets start at -size/2 (box center origin), z unrotated;
  * ROI sizes floored at 1 voxel (cu:123-126);
  * trilinear uses voxel coords without center offset (cu:bilinear_
    interpolate), low = floor(coord), clamped to the grid edge.

Rotation: the reference kernel receives rois with swapped x/y and
standard-mode yaw in degrees (poolers_3d.py:107-124); unrolling the swaps
gives world = [[cos, -sin], [sin, cos]] @ local + center with theta the
standard yaw, which is what we implement directly.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from detection_3d_tpu.ops.sparse import SparseTensor


def _sample_offsets(num_bins: int, ratio: int, size):
    """(num_bins*ratio,) local-axis sample coords for a given roi size."""
    bin_size = size / num_bins  # scalar per roi
    p = jnp.arange(num_bins * ratio)
    bin_idx = p // ratio
    sub = (p % ratio).astype(jnp.float32)
    return (-size / 2)[..., None] + (
        bin_idx[None, :] * bin_size[..., None]
        + (sub[None, :] + 0.5) * bin_size[..., None] / ratio)


@functools.partial(jax.jit, static_argnames=("out_size", "sampling_ratio"))
def roi_align_rotated_sparse(table: SparseTensor, rois, roi_valid,
                             out_size: Tuple[int, int, int],
                             sampling_ratio: int = 2, roi_batch=None):
    """Args:
      table: SparseTensor feature map (V, C) at some FPN level;
      rois: (R, 7) standard-mode boxes in THIS LEVEL's voxel units
        [xc, yc, zc, xs, ys, zs, yaw];
      roi_valid: (R,) bool;
      out_size: (os0, os1, os2) bins along (x_size, y_size, z_size);
      roi_batch: optional (R,) int32 batch coordinate per roi — used by
        the merged multi-level pooler (models/roi_head.pool_rois), where
        the "batch" axis of the table is the FPN level, so ALL levels
        pool in ONE pass instead of one full pass per level.

    Returns (R, os0, os1, os2, C) pooled features (invalid rois zero).
    """
    os0, os1, os2 = out_size
    sr = sampling_ratio
    r = rois.shape[0]
    c = table.num_channels

    xc, yc, zc = rois[:, 0], rois[:, 1], rois[:, 2]
    xs = jnp.maximum(rois[:, 3], 1.0)   # min 1 voxel (cu:123-126)
    ys = jnp.maximum(rois[:, 4], 1.0)
    zs = jnp.maximum(rois[:, 5], 1.0)
    yaw = rois[:, 6]

    lx = _sample_offsets(os0, sr, xs)   # (R, os0*sr)
    ly = _sample_offsets(os1, sr, ys)   # (R, os1*sr)
    lz = _sample_offsets(os2, sr, zs)   # (R, os2*sr)

    cos, sin = jnp.cos(yaw), jnp.sin(yaw)
    # world = [[cos, -sin], [sin, cos]] @ [lx, ly] + center
    gx = (lx[:, :, None] * cos[:, None, None]
          - ly[:, None, :] * sin[:, None, None] + xc[:, None, None])
    gy = (lx[:, :, None] * sin[:, None, None]
          + ly[:, None, :] * cos[:, None, None] + yc[:, None, None])
    # (R, os0*sr, os1*sr); z separable: (R, os2*sr)
    gz = lz + zc[:, None]

    X, Y, Z = table.spatial_size

    def trilinear(px, py, pz, pb):
        """px/py/pz: (...,) continuous coords -> (..., C) features.

        All 8 corner lookups resolve in ONE vectorized binary search; the
        weighted sum is a scan over the stacked corners.
        """
        inb = ((px > -1.0) & (px < X) & (py > -1.0) & (py < Y)
               & (pz > -1.0) & (pz < Z))
        px = jnp.clip(px, 0.0, X - 1)
        py = jnp.clip(py, 0.0, Y - 1)
        pz = jnp.clip(pz, 0.0, Z - 1)
        x0 = jnp.floor(px).astype(jnp.int32)
        y0 = jnp.floor(py).astype(jnp.int32)
        z0 = jnp.floor(pz).astype(jnp.int32)
        x1 = jnp.minimum(x0 + 1, X - 1)
        y1 = jnp.minimum(y0 + 1, Y - 1)
        z1 = jnp.minimum(z0 + 1, Z - 1)
        fx = px - x0
        fy = py - y0
        fz = pz - z0

        feats_pad = jnp.concatenate(
            [table.feats, jnp.zeros((1, c), table.feats.dtype)], axis=0)

        corner_x = jnp.stack([x0, x0, x0, x0, x1, x1, x1, x1])  # (8, ...)
        corner_y = jnp.stack([y0, y0, y1, y1, y0, y0, y1, y1])
        corner_z = jnp.stack([z0, z1, z0, z1, z0, z1, z0, z1])
        wx = jnp.stack([1 - fx] * 4 + [fx] * 4)
        wy = jnp.stack([1 - fy, 1 - fy, fy, fy] * 2)
        wz = jnp.stack([1 - fz, fz] * 4)
        w8 = wx * wy * wz                                       # (8, ...)

        q = jnp.stack([corner_x, corner_y, corner_z,
                       jnp.broadcast_to(pb, corner_x.shape)], axis=-1)
        idx, found = table.lookup(q)
        idx = jnp.where(found, idx, table.capacity)

        def body(acc, args):
            idx_k, w_k = args
            return acc + feats_pad[idx_k] * w_k[..., None].astype(
                feats_pad.dtype), None

        zero = feats_pad.ravel()[0] * 0
        acc, _ = jax.lax.scan(body, jnp.zeros(px.shape + (c,),
                                              feats_pad.dtype) + zero,
                              (idx, w8))
        return jnp.where(inb[..., None], acc, 0.0)

    # full sample grid (R, os0*sr, os1*sr, os2*sr)
    px = jnp.broadcast_to(gx[:, :, :, None], (r, os0 * sr, os1 * sr, os2 * sr))
    py = jnp.broadcast_to(gy[:, :, :, None], (r, os0 * sr, os1 * sr, os2 * sr))
    pz = jnp.broadcast_to(gz[:, None, None, :], (r, os0 * sr, os1 * sr, os2 * sr))
    if roi_batch is None:
        pb = jnp.zeros((r, 1, 1, 1), jnp.int32)
    else:
        pb = roi_batch.astype(jnp.int32)[:, None, None, None]
    pb = jnp.broadcast_to(pb, px.shape)[None]  # shared by all 8 corners
    vals = trilinear(px, py, pz, pb)  # (R, os0*sr, os1*sr, os2*sr, C)

    pooled = vals.reshape(r, os0, sr, os1, sr, os2, sr, c).mean(
        axis=(2, 4, 6))
    return jnp.where(roi_valid[:, None, None, None, None], pooled, 0.0)
