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
               & (pz > -1.0) & (pz < Z))     # (R, s0, s1, s2)
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

        if (table.dense_grid is not None and min(X, Y, Z) >= 2
                and table.capacity < 0xFFFF):
            # the 8 trilinear corners form a 2x2x2 block of the dense
            # row-index grid (z fastest). Pack each z-adjacent entry PAIR
            # into one int32 (two 16-bit indices, 0xFFFF = empty): one
            # flat gather per (x, y) corner then fetches BOTH z corners —
            # 4 scalar gathers instead of 8 for the whole block. (XLA's
            # multi-dim-slice gather lowers to a serial loop on TPU —
            # measured 3.5x SLOWER than 8 flat gathers — so the packing
            # must stay a plain 1D index gather.)
            grid = table.dense_grid
            u = jnp.where(grid >= 0, grid, 0xFFFF).astype(jnp.uint32)
            u4 = u.reshape((table.batch_size, X, Y, Z))
            up1 = jnp.concatenate(
                [u4[..., 1:],
                 jnp.full(u4[..., :1].shape, 0xFFFF, jnp.uint32)],
                axis=-1)
            gpair = (u4 | (up1 << 16)).reshape(-1)       # (B*X*Y*Z,)

            sx = jnp.maximum(jnp.minimum(x0, X - 2), 0)
            sy = jnp.maximum(jnp.minimum(y0, Y - 2), 0)
            sz = jnp.maximum(jnp.minimum(z0, Z - 2), 0)
            # when the corner sits on the top edge the block start is
            # shifted down one: t* in {0,1} re-indexes the weights (the
            # fractional part is exactly 0 there, so w[t+1] never spills)
            tx = (x0 - sx).astype(fx.dtype)
            ty = (y0 - sy).astype(fy.dtype)
            tz = (z0 - sz).astype(fz.dtype)
            pb0 = jnp.broadcast_to(pb[0] if pb.ndim == px.ndim + 1 else pb,
                                   px.shape)
            base = ((pb0 * X + sx) * Y + sy) * Z + sz
            flat4 = jnp.stack([base, base + Z, base + Y * Z,
                               base + Y * Z + Z])         # (4, ...)
            pairs = gpair[flat4]                          # packed (4, ...)
            lo = (pairs & 0xFFFF).astype(jnp.int32)
            hi = (pairs >> 16).astype(jnp.int32)
            cap = table.capacity
            lo = jnp.where(lo == 0xFFFF, cap, lo)
            hi = jnp.where(hi == 0xFFFF, cap, hi)
            # block ordering (i, j, k), z fastest: [q*2] = lo, [q*2+1] = hi
            # for quad q = 2*i + j — matches flat4's x-major corner order
            idx = jnp.stack([lo[0], hi[0], lo[1], hi[1],
                             lo[2], hi[2], lo[3], hi[3]])
            wxs = jnp.stack([(1 - fx) * (1 - tx), fx * (1 - tx)
                             + (1 - fx) * tx])             # (2, ...)
            wys = jnp.stack([(1 - fy) * (1 - ty), fy * (1 - ty)
                             + (1 - fy) * ty])
            wzs = jnp.stack([(1 - fz) * (1 - tz), fz * (1 - tz)
                             + (1 - fz) * tz])
            w8 = (wxs[:, None, None] * wys[None, :, None]
                  * wzs[None, None, :]).reshape((8,) + px.shape)
            w8 = w8 * inb[None].astype(w8.dtype)

            # corner pairs (2p, 2p+1) are z-adjacent grid cells (block z
            # fastest), so ONE 2C-wide gather from a doubled table (row i
            # = feats[i] || feats[z+1-neighbor of i]) serves both: 4
            # gathers of 2C instead of 8 of C — half the random HBM
            # accesses of the pooling loop
            qz = table.coords.at[:, 2].add(1)
            zn, zfound = table.lookup(qz, valid=table.row_valid)
            zn_pad = jnp.append(
                jnp.where(zfound, zn, table.capacity), table.capacity)
            table2 = jnp.concatenate([feats_pad, feats_pad[zn_pad]],
                                     axis=-1)               # (V+1, 2C)

            def pair_body(acc, args):
                i0, i1, w0, w1 = args
                found0 = i0 < table.capacity
                row = jnp.where(found0, i0, i1)
                blk = table2[row]                           # (..., 2C)
                f0 = jnp.where(found0[..., None], blk[..., :c], 0)
                f1 = jnp.where(found0[..., None], blk[..., c:],
                               blk[..., :c])
                g = (f0 * w0[..., None].astype(blk.dtype)
                     + f1 * w1[..., None].astype(blk.dtype))
                g = g.reshape(r, os0, sr, os1, sr, os2, sr, c).sum(
                    axis=(2, 4, 6), dtype=jnp.float32)
                return acc + g, None

            zero = (feats_pad.ravel()[0] * w8.ravel()[0] * 0).astype(
                jnp.float32)
            acc, _ = jax.lax.scan(
                pair_body,
                jnp.zeros((r, os0, os1, os2, c), jnp.float32) + zero,
                (idx[0::2], idx[1::2], w8[0::2], w8[1::2]))
            return (acc * (1.0 / (sr * sr * sr))).astype(feats_pad.dtype)
        else:
            corner_x = jnp.stack([x0, x0, x0, x0, x1, x1, x1, x1])  # (8,...)
            corner_y = jnp.stack([y0, y0, y1, y1, y0, y0, y1, y1])
            corner_z = jnp.stack([z0, z1, z0, z1, z0, z1, z0, z1])
            wx = jnp.stack([1 - fx] * 4 + [fx] * 4)
            wy = jnp.stack([1 - fy, 1 - fy, fy, fy] * 2)
            wz = jnp.stack([1 - fz, fz] * 4)
            # fold the out-of-bounds mask into the weights: zero
            # contribution == the dense path's zeroed samples
            w8 = wx * wy * wz * inb[None].astype(wx.dtype)      # (8, ...)

            q = jnp.stack([corner_x, corner_y, corner_z,
                           jnp.broadcast_to(pb, corner_x.shape)], axis=-1)
            idx, found = table.lookup(q)
            idx = jnp.where(found, idx, table.capacity)

        def body(acc, args):
            # pool the sr^3 sub-samples INSIDE the corner scan: the
            # accumulator is the (os0,os1,os2) bin grid — sr^3 x smaller
            # than the sample grid, so the 8 accumulation passes touch
            # sr^3 x less HBM (the gather+reduce fuse; the full sample
            # grid is never materialized)
            idx_k, w_k = args
            g = feats_pad[idx_k] * w_k[..., None].astype(feats_pad.dtype)
            g = g.reshape(r, os0, sr, os1, sr, os2, sr, c).sum(
                axis=(2, 4, 6), dtype=jnp.float32)
            return acc + g, None

        # derive the carry's zero from the inputs so its vma (varying
        # axes under shard_map) matches the body output's
        zero = (feats_pad.ravel()[0] * w8.ravel()[0] * 0).astype(
            jnp.float32)
        acc, _ = jax.lax.scan(
            body, jnp.zeros((r, os0, os1, os2, c), jnp.float32) + zero,
            (idx, w8))
        return (acc * (1.0 / (sr * sr * sr))).astype(feats_pad.dtype)

    # full sample grid (R, os0*sr, os1*sr, os2*sr)
    px = jnp.broadcast_to(gx[:, :, :, None], (r, os0 * sr, os1 * sr, os2 * sr))
    py = jnp.broadcast_to(gy[:, :, :, None], (r, os0 * sr, os1 * sr, os2 * sr))
    pz = jnp.broadcast_to(gz[:, None, None, :], (r, os0 * sr, os1 * sr, os2 * sr))
    if roi_batch is None:
        pb = jnp.zeros((r, 1, 1, 1), jnp.int32)
    else:
        pb = roi_batch.astype(jnp.int32)[:, None, None, None]
    pb = jnp.broadcast_to(pb, px.shape)[None]  # shared by all 8 corners
    pooled = trilinear(px, py, pz, pb)  # (R, os0, os1, os2, C)
    return jnp.where(roi_valid[:, None, None, None, None], pooled, 0.0)
