"""Quantized host->device input packing for the inference path.

The per-building input is 24.5 MB of f32 (points 6 MB + 9-channel feats
18 MB + valid mask): on a bandwidth-limited host link this transfer
dominates single-building latency. The reference streams raw float
tensors per batch (data3d/data.py:23-35 collate -> cuda copy in
trainer_sparse3d.py:78-81); a TPU-native pipeline instead ships compact
fixed-point arrays and reconstructs floats on device, where the unpack
is a trivial fused elementwise op:

- scaled voxel coords -> u16 fixed-point, 1/8-voxel resolution. The
  voxelizer floors to integer voxels (models/detector.voxelize_points);
  ``floor(floor(8p)/8) == floor(p)`` for p >= 0, so voxelization is
  BIT-EXACT vs the f32 path (tests/test_packing.py).
- xyz-in-meters feature channels are reconstructed from the same coords
  plus a per-scene f32 origin (the dataset's scale/shift is affine:
  suncg_dataset.py:115-137), max error 1/8 voxel / voxel_scale (2.5 mm
  at the reference's 2 cm voxels).
- rgb in [0,1] -> u8 (the source colors are 8-bit to begin with);
  normals in [-1,1] -> i8 (quantization step 1/127).
- the validity mask is replaced by one scalar count.

Total: 6 MB per 500k-point building — a 4x transfer cut.
"""

from __future__ import annotations

from typing import Dict

import numpy as np

XYZ_FP = 8  # fixed-point denominator for scaled voxel coords


def pack_scene(cfg, scene: Dict) -> Dict[str, np.ndarray]:
    """Host side: pad to static capacities and quantize.

    Requires the canonical 9-channel feature layout xyz(m)+rgb+normal
    (reference input: maskrcnn_benchmark/config/defaults.py:73).
    """
    from detection_3d_tpu.engine.trainer import pad_scene

    if cfg.in_channels != 9:
        raise ValueError(
            f"pack_scene supports the 9-channel xyz+rgb+normal layout, "
            f"got in_channels={cfg.in_channels}")
    if max(cfg.sparse3d.voxel_full_scale) * XYZ_FP >= 1 << 16:
        raise ValueError("voxel_full_scale too large for u16 fixed point")

    batch = pad_scene(cfg, scene)
    pts = batch["points"]                   # scaled voxel coords, >= 0
    m = int(batch["points_valid"].sum())
    xyz_q = np.floor(np.clip(pts, 0, None) * XYZ_FP).astype(np.uint16)

    feats = batch["feats"]
    # per-scene affine origin: xyz_m = pts / voxel_scale + origin
    scale = float(cfg.sparse3d.voxel_scale)
    res = feats[:m, :3] - pts[:m] / scale
    origin = (np.median(res, axis=0).astype(np.float32)
              if m else np.zeros(3, np.float32))
    rgb_q = np.round(np.clip(feats[:, 3:6], 0.0, 1.0) * 255.0).astype(
        np.uint8)
    nrm_q = np.round(np.clip(feats[:, 6:9], -1.0, 1.0) * 127.0).astype(
        np.int8)
    return {
        "xyz_q": xyz_q, "rgb_q": rgb_q, "nrm_q": nrm_q,
        "n_valid": np.int32(m), "origin": origin,
        "gt_boxes": batch["gt_boxes"], "gt_labels": batch["gt_labels"],
        "gt_valid": batch["gt_valid"],
    }


def pack_table(cfg, scene: Dict) -> Dict[str, np.ndarray]:
    """Host side: the FULL input layer — sort, dedup-average, quantize.

    The reference runs its InputLayer dedup on the host too (SCN
    Metadata hash build, SparseConvNet/sparseconvnet/ioLayers.py:51-65 ->
    Metadata.h:131): the irregular integer work rides the (pipelined)
    data loader while the accelerator runs the previous building. This
    is the TPU equivalent: ship a ready voxel TABLE (sorted coords +
    per-voxel mean features, quantized) so the device spends zero time
    on the voxelize stage (~60 ms of the full-scale forward).

    Bit-exact parity with ops/sparse.build_sparse_tensor on coords/keys/
    num/true_num, including the unbiased strided capacity-overflow keep
    (tests/test_packing.py); features carry quantization error of at
    most 1/512 voxel (xyz), 1/510 (rgb), 1/254 (normals).
    """
    from detection_3d_tpu.engine.trainer import pad_scene
    from detection_3d_tpu.config.defaults import Config  # noqa: F401

    if cfg.in_channels != 9:
        raise ValueError("pack_table supports the 9-channel layout only")
    X, Y, Z = cfg.sparse3d.voxel_full_scale
    cap = cfg.caps.scale_caps(cfg.sparse3d.num_scales)[0]
    if max(X, Y, Z) >= 1 << 16 or cap >= 1 << 16 * 2:
        raise ValueError("grid too large for u16 table packing")

    batch = pad_scene(cfg, scene)
    m = int(batch["points_valid"].sum())
    pts = batch["points"][:m]
    feats = batch["feats"][:m]
    scale = float(cfg.sparse3d.voxel_scale)
    res0 = feats[:, :3] - pts / scale
    origin = (np.median(res0, axis=0).astype(np.float32)
              if m else np.zeros(3, np.float32))

    vox = np.floor(pts).astype(np.int64)
    inb = ((vox[:, 0] >= 0) & (vox[:, 0] < X) & (vox[:, 1] >= 0)
           & (vox[:, 1] < Y) & (vox[:, 2] >= 0) & (vox[:, 2] < Z))
    vox, pts, feats = vox[inb], pts[inb], feats[inb]
    # device sort key: hi = b*X + x, lo = y*Z + z (ops/coords.pack_key)
    hi = vox[:, 0]
    lo = vox[:, 1] * Z + vox[:, 2]
    order = np.lexsort((lo, hi))
    vox, pts, feats = vox[order], pts[order], feats[order]
    key = hi[order] * (Y * Z) + lo[order]

    is_first = np.ones(key.shape[0], bool)
    is_first[1:] = key[1:] != key[:-1]
    seg_id = np.cumsum(is_first) - 1
    num_vox = int(seg_id[-1]) + 1 if key.shape[0] else 0
    stride = max(-(-num_vox // cap), 1)
    keep = (seg_id % stride) == 0
    slot = seg_id // stride
    num = min(-(-num_vox // stride), cap)

    vox_out = np.zeros((cap, 3), np.uint16)
    res_q = np.zeros((cap, 3), np.uint8)
    rgb_q = np.zeros((cap, 3), np.uint8)
    nrm_q = np.zeros((cap, 3), np.int8)
    if num:
        sl = slot[keep]
        cnt = np.bincount(sl, minlength=num).astype(np.float64)[:, None]

        def seg_mean(a):
            out = np.zeros((num, a.shape[1]), np.float64)
            np.add.at(out, sl, a[keep].astype(np.float64))
            return out / np.maximum(cnt, 1.0)

        first = np.full(num, vox.shape[0], np.int64)
        np.minimum.at(first, sl, np.flatnonzero(keep))
        vox_out[:num] = vox[first].astype(np.uint16)
        res = seg_mean(pts) - vox[first]
        res_q[:num] = np.clip(np.floor(res * 256.0), 0, 255).astype(
            np.uint8)
        rgb_q[:num] = np.round(
            np.clip(seg_mean(feats[:, 3:6]), 0.0, 1.0) * 255.0).astype(
            np.uint8)
        nrm_q[:num] = np.round(
            np.clip(seg_mean(feats[:, 6:9]), -1.0, 1.0) * 127.0).astype(
            np.int8)
    return {
        "vox": vox_out, "res_q": res_q, "rgb_q": rgb_q, "nrm_q": nrm_q,
        "num": np.int32(num), "true_num": np.int32(num_vox),
        "origin": origin,
        "gt_boxes": batch["gt_boxes"], "gt_labels": batch["gt_labels"],
        "gt_valid": batch["gt_valid"],
    }


def unpack_table(cfg, packed):
    """Device side (traceable): packed table dict -> SparseTensor.

    Pure elementwise work — no sort, no scatter (the host already
    ordered and deduplicated the rows)."""
    import jax.numpy as jnp

    from detection_3d_tpu.ops.coords import INVALID, pack_key
    from detection_3d_tpu.ops.sparse import SparseTensor

    vox = packed["vox"].astype(jnp.int32)                  # (V, 3)
    v = vox.shape[0]
    rowv = jnp.arange(v, dtype=jnp.int32) < packed["num"]
    coords4 = jnp.concatenate(
        [vox, jnp.zeros((v, 1), jnp.int32)], axis=-1)
    coords4 = jnp.where(rowv[:, None], coords4, INVALID)
    hi, lo = pack_key(coords4, cfg.sparse3d.voxel_full_scale, rowv)

    scale = float(cfg.sparse3d.voxel_scale)
    xyz = (vox.astype(jnp.float32)
           + packed["res_q"].astype(jnp.float32) * (1.0 / 256.0))
    xyz_m = xyz * (1.0 / scale) + packed["origin"]
    feats = jnp.concatenate(
        [xyz_m,
         packed["rgb_q"].astype(jnp.float32) * (1.0 / 255.0),
         packed["nrm_q"].astype(jnp.float32) * (1.0 / 127.0)], axis=-1)
    feats = jnp.where(rowv[:, None], feats, 0.0)
    return SparseTensor(coords4, feats, hi, lo, packed["num"],
                        cfg.sparse3d.voxel_full_scale, 1,
                        true_num=packed["true_num"])


def unpack_batch(cfg, packed) -> Dict:
    """Device side (traceable): reconstruct the f32 batch dict."""
    import jax.numpy as jnp

    pts = packed["xyz_q"].astype(jnp.float32) * (1.0 / XYZ_FP)
    xyz_m = pts * (1.0 / float(cfg.sparse3d.voxel_scale)) + packed["origin"]
    feats = jnp.concatenate(
        [xyz_m,
         packed["rgb_q"].astype(jnp.float32) * (1.0 / 255.0),
         packed["nrm_q"].astype(jnp.float32) * (1.0 / 127.0)], axis=-1)
    n = pts.shape[0]
    valid = jnp.arange(n, dtype=jnp.int32) < packed["n_valid"]
    return {"points": pts, "feats": feats, "points_valid": valid,
            "gt_boxes": packed["gt_boxes"],
            "gt_labels": packed["gt_labels"],
            "gt_valid": packed["gt_valid"]}
