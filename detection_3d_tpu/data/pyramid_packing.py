"""Host-side pyramid construction: the full Metadata build off-device.

The reference builds ALL of its sparse-conv metadata — per-scale voxel
hash tables, submanifold/strided/deconv rulebooks — on the host CPU
inside the forward pass (SCN Metadata,
/root/reference/SparseConvNet/sparseconvnet/SCN/Metadata/Metadata.h:
54-163, ConvolutionRules.h:11-60, SubmanifoldConvolutionRules.h:26-57),
which is a large part of its 4.75 s/building. This module keeps the
SAME division of labor — irregular integer work on the host, dense math
on the accelerator — but runs it in the (pipelined) data loader, so at
steady state the device never waits for it: while the TPU runs building
N, the loader threads pack building N+1.

`pack_pyramid` produces a flat dict of numpy arrays (jit-friendly);
`unpack_pyramid` reassembles the `models/backbone.build_pyramid` output
structure on device with pure elementwise ops — no sorts, no scatters,
no searches in the graph. Parity with the in-graph builder is bit-exact
and tested (tests/test_pyramid_packing.py).

The in-graph builder remains the training path (gradients/augmentation
change nothing here — rulebooks are input-only — but training batches
amortize metadata differently and keep everything on device).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

from detection_3d_tpu.data.packing import pack_table

_NP_INVALID = np.int32(np.iinfo(np.int32).max)


def _np_key(vox, spatial):
    """(n, 3) int voxels (batch 0) -> int64 sort key == device (hi, lo)
    lexicographic order (ops/coords.pack_key: hi = x, lo = y*Z + z)."""
    X, Y, Z = spatial
    return (vox[:, 0].astype(np.int64) * Y + vox[:, 1]) * Z + vox[:, 2]


def _np_dedup(cand_vox, cand_valid, spatial, capacity):
    """Mirror of ops/sparse.build_sparse_tensor (coords only) with
    return_row_map: sorted dedup + unbiased strided overflow keep.

    Returns (vox_out (cap,3) i32, num, true_num, row_map (m,) i32)."""
    m = cand_vox.shape[0]
    key = np.where(cand_valid, _np_key(cand_vox, spatial),
                   np.iinfo(np.int64).max)
    order = np.argsort(key, kind="stable")
    key_s = key[order]
    valid_s = cand_valid[order]

    is_first = np.ones(m, bool)
    if m > 1:
        is_first[1:] = key_s[1:] != key_s[:-1]
    seg_id = np.cumsum(is_first) - 1
    num_vox = int((is_first & valid_s).sum())
    stride = max(-(-num_vox // capacity), 1)
    keep = (seg_id % stride) == 0
    slot = seg_id // stride
    num = min(-(-num_vox // stride), capacity)

    row_on = valid_s & keep & (slot < num)
    vox_out = np.full((capacity, 3), _NP_INVALID, np.int32)
    if row_on.any():
        # first occurrence per slot (all rows of a segment share coords)
        sel = np.flatnonzero(row_on)
        vox_out[slot[sel][::-1]] = cand_vox[order[sel][::-1]]

    slot_sorted = np.where(row_on, slot, capacity).astype(np.int32)
    row_map = np.empty(m, np.int32)
    row_map[order] = slot_sorted
    return vox_out, num, num_vox, row_map


def np_downsample_with_rulebooks(vox, num, spatial, kernel, stride,
                                 cap_out):
    """Numpy twin of ops/sparse.downsample_with_rulebooks."""
    ksz, st = tuple(kernel), tuple(stride)
    reach = [max(1, -(-k // s)) for k, s in zip(ksz, st)]
    out_size = tuple(-(-d // s) for d, s in zip(spatial, st))
    v_in = vox.shape[0]
    kvol = ksz[0] * ksz[1] * ksz[2]
    rv = np.arange(v_in) < num
    x, y, z = vox[:, 0].astype(np.int64), vox[:, 1], vox[:, 2]

    cand_vox, cand_valid, cand_koff = [], [], []
    for ax in range(reach[0]):
        for ay in range(reach[1]):
            for az in range(reach[2]):
                ox = x // st[0] - ax
                oy = y // st[1] - ay
                oz = z // st[2] - az
                kx = x - ox * st[0]
                ky = y - oy * st[1]
                kz = z - oz * st[2]
                ok = ((kx < ksz[0]) & (ox >= 0) & (ky < ksz[1])
                      & (oy >= 0) & (kz < ksz[2]) & (oz >= 0) & rv)
                cand_vox.append(np.stack([ox, oy, oz], -1))
                cand_valid.append(ok)
                cand_koff.append((kx * ksz[1] + ky) * ksz[2] + kz)
    cand_vox = np.concatenate(cand_vox)
    cand_valid = np.concatenate(cand_valid)
    koff = np.concatenate(cand_koff)
    n_rep = reach[0] * reach[1] * reach[2]

    vox_out, num_out, true_num, row_map = _np_dedup(
        cand_vox, cand_valid, out_size, cap_out)

    src_row = np.tile(np.arange(v_in, dtype=np.int32), n_rep)
    ok = cand_valid & (row_map < cap_out)
    conv_rb = np.full((kvol, cap_out), v_in, np.int32)
    conv_rb[koff[ok], row_map[ok]] = src_row[ok]
    deconv_rb = np.full((kvol, v_in), cap_out, np.int32)
    deconv_rb[koff[ok], src_row[ok]] = row_map[ok]
    return (vox_out, num_out, true_num, out_size), conv_rb, deconv_rb


def np_subm_idx_27(vox, num, spatial):
    """Numpy twin of ops/sparse.neighbor_indices for the 3^3 kernel:
    (27, V) neighbor rows, missing/out-of-grid/invalid == V."""
    v = vox.shape[0]
    X, Y, Z = spatial
    val = vox[:num].astype(np.int64)
    keys = _np_key(val, spatial)
    offs = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)]
    idx = np.full((27, v), v, np.int32)
    for k, (dx, dy, dz) in enumerate(offs):
        q = val + np.array([dx, dy, dz], np.int64)
        inb = ((q[:, 0] >= 0) & (q[:, 0] < X) & (q[:, 1] >= 0)
               & (q[:, 1] < Y) & (q[:, 2] >= 0) & (q[:, 2] < Z))
        qk = _np_key(q, spatial)
        pos = np.searchsorted(keys, qk)
        pos_c = np.minimum(pos, max(num - 1, 0))
        found = inb & (pos < num) & (keys[pos_c] == qk)
        idx[k, :num] = np.where(found, pos_c, v)
    return idx


def np_bev_with_rulebook(vox, num, spatial, capacity):
    """Numpy twin of models/backbone.bev_with_rulebook. The parent table
    is (x, y, z)-sorted, so the z=0 projection is already sorted with
    duplicates consecutive — no sort needed."""
    v_in = vox.shape[0]
    X, Y, Z = spatial
    rv = np.arange(v_in) < num
    kb = vox[:, 0].astype(np.int64) * Y + vox[:, 1]
    kb = np.where(rv, kb, np.iinfo(np.int64).max)
    is_first = np.ones(v_in, bool)
    if v_in > 1:
        is_first[1:] = kb[1:] != kb[:-1]
    seg_id = np.cumsum(is_first) - 1
    num_vox = int((is_first & rv).sum())
    stride = max(-(-num_vox // capacity), 1)
    keep = (seg_id % stride) == 0
    slot = seg_id // stride
    num_bev = min(-(-num_vox // stride), capacity)
    row_on = rv & keep & (slot < num_bev)

    bev_vox = np.full((capacity, 3), _NP_INVALID, np.int32)
    sel = np.flatnonzero(row_on)
    bev_vox[slot[sel][::-1], 0] = vox[sel[::-1], 0]
    bev_vox[slot[sel][::-1], 1] = vox[sel[::-1], 1]
    bev_vox[slot[sel][::-1], 2] = 0

    rb = np.full((Z, capacity), v_in, np.int32)
    rb[vox[sel, 2], slot[sel]] = sel.astype(np.int32)
    return bev_vox, num_bev, rb


def np_windowed_rulebook(neighbor_idx, num_out, v_in, block, window,
                         align):
    """Numpy twin of ops/pallas/gather_conv_kernel.windowed_rulebook."""
    n_off, v_out = neighbor_idx.shape
    out_valid = np.arange(v_out) < num_out
    idx = np.where(out_valid[None, :], neighbor_idx, v_in)
    pad = (-v_out) % block
    idx = np.pad(idx, ((0, 0), (0, pad)), constant_values=v_in)
    nb = idx.shape[1] // block
    idxb = idx.reshape(n_off, nb, block)
    real = idxb < v_in
    starts = np.min(np.where(real, idxb, v_in), axis=2)
    starts = np.clip(starts, 0, max(v_in - window, 0))
    starts = (starts & ~(align - 1)).astype(np.int32)
    local = (idxb - starts[:, :, None]).astype(np.int32)
    hi = np.max(np.where(real, local, -1), axis=2).astype(np.int32)
    return {"idx": neighbor_idx.astype(np.int32),
            "starts": starts, "local": local.reshape(n_off, -1),
            "hi": hi}


def pyramid_pack_spec(cfg) -> Dict[str, Tuple[Tuple[int, ...], np.dtype]]:
    """{name: (shape, dtype)} of every array `pack_pyramid` produces for
    this config (gt/origin/base-table fields excluded — those come from
    `pack_table`). Used by the native C++ packer wrapper to preallocate
    output buffers (data/native_packer.py)."""
    s3d = cfg.sparse3d
    n_scales = s3d.num_scales
    caps = cfg.caps.scale_caps(n_scales)
    from detection_3d_tpu.ops.pallas.gather_conv_kernel import BLOCK

    spec: Dict[str, Tuple[Tuple[int, ...], np.dtype]] = {}

    def rb_spec(prefix, kvol, v_out, v_in):
        if v_in >= 1024:
            vp = v_out + ((-v_out) % BLOCK)
            nb = vp // BLOCK
            spec[f"{prefix}_idx"] = ((kvol, v_out), np.int32)
            spec[f"{prefix}_starts"] = ((kvol, nb), np.int32)
            spec[f"{prefix}_local"] = ((kvol, vp), np.int32)
            spec[f"{prefix}_hi"] = ((kvol, nb), np.int32)
        else:
            spec[f"{prefix}_idx_raw"] = ((kvol, v_out), np.int32)

    spatial = tuple(s3d.voxel_full_scale)
    for k in range(1, n_scales):
        ks, st = s3d.kernels[k - 1], s3d.strides[k - 1]
        kvol = ks[0] * ks[1] * ks[2]
        spec[f"t{k}_vox"] = ((caps[k], 3), np.uint16)
        spec[f"t{k}_num"] = ((), np.int32)
        rb_spec(f"down{k - 1}", kvol, caps[k], caps[k - 1])
        rb_spec(f"up{k - 1}", kvol, caps[k - 1], caps[k])
        spatial = tuple(-(-d // s) for d, s in zip(spatial, st))
    for k in range(n_scales):
        rb_spec(f"subm{k}", 27, caps[k], caps[k])
    sp = tuple(s3d.voxel_full_scale)
    dims = [sp]
    for st in s3d.strides:
        sp = tuple(-(-d // s) for d, s in zip(sp, st))
        dims.append(sp)
    for slot, i_from_top in enumerate(cfg.rpn.rpn_scales_from_top):
        scale = n_scales - 1 - i_from_top
        cap3d = caps[scale]
        Z = dims[scale][2]
        spec[f"bev{slot}_vox"] = ((cap3d, 3), np.uint16)
        spec[f"bev{slot}_num"] = ((), np.int32)
        rb_spec(f"bev{slot}", Z, cap3d, cap3d)
    return spec


def _rb_entries(prefix, rb_or_idx):
    if isinstance(rb_or_idx, dict):
        return {f"{prefix}_{k}": v for k, v in rb_or_idx.items()}
    return {f"{prefix}_idx_raw": rb_or_idx}


def pack_pyramid(cfg, scene: Dict) -> Dict[str, np.ndarray]:
    """Host: quantized scale-0 table + EVERY pyramid rulebook/table.

    Flat dict of numpy arrays; see `unpack_pyramid` for the consumer.
    Includes everything `pack_table` ships (gt, origin, features)."""
    from detection_3d_tpu.ops.pallas.gather_conv_kernel import (
        BLOCK, WINDOW, _ALIGN,
    )

    out = dict(pack_table(cfg, scene))
    s3d = cfg.sparse3d
    n_scales = s3d.num_scales
    caps = cfg.caps.scale_caps(n_scales)

    def fast_rb(idx, num_out, v_in):
        if v_in >= 1024:
            return np_windowed_rulebook(idx, num_out, v_in, BLOCK,
                                        WINDOW, _ALIGN)
        return idx.astype(np.int32)

    vox = out["vox"].astype(np.int32)
    num = int(out["num"])
    spatial = tuple(s3d.voxel_full_scale)
    tables = [(vox, num, spatial)]
    for k in range(1, n_scales):
        (vox_o, num_o, _true, out_size), crb, drb = \
            np_downsample_with_rulebooks(
                tables[-1][0], tables[-1][1], tables[-1][2],
                s3d.kernels[k - 1], s3d.strides[k - 1], caps[k])
        # pad-row coords must read as INVALID on device but u16 can't
        # hold it — ship valid coords only, device re-marks by num
        vox_u = np.where(np.arange(caps[k])[:, None] < num_o, vox_o, 0)
        out[f"t{k}_vox"] = vox_u.astype(np.uint16)
        out[f"t{k}_num"] = np.int32(num_o)
        out.update(_rb_entries(f"down{k - 1}",
                               fast_rb(crb, num_o, tables[-1][0].shape[0])))
        out.update(_rb_entries(f"up{k - 1}",
                               fast_rb(drb, tables[-1][1], caps[k])))
        tables.append((vox_o, num_o, out_size))

    for k, (vx, nm, sp) in enumerate(tables):
        sidx = np_subm_idx_27(vx, nm, sp)
        out.update(_rb_entries(f"subm{k}", fast_rb(sidx, nm, vx.shape[0])))

    for slot, i_from_top in enumerate(cfg.rpn.rpn_scales_from_top):
        scale = n_scales - 1 - i_from_top
        vx, nm, sp = tables[scale]
        cap3d = vx.shape[0]
        bev_vox, bev_num, brb = np_bev_with_rulebook(vx, nm, sp, cap3d)
        bev_u = np.where(np.arange(cap3d)[:, None] < bev_num, bev_vox, 0)
        out[f"bev{slot}_vox"] = bev_u.astype(np.uint16)
        out[f"bev{slot}_num"] = np.int32(bev_num)
        out.update(_rb_entries(f"bev{slot}", fast_rb(brb, bev_num, cap3d)))
    return out


def _device_table(vox, num, spatial, feats=None):
    import jax.numpy as jnp

    from detection_3d_tpu.ops.coords import INVALID, pack_key
    from detection_3d_tpu.ops.sparse import SparseTensor

    vox = vox.astype(jnp.int32)
    v = vox.shape[0]
    rowv = jnp.arange(v, dtype=jnp.int32) < num
    coords4 = jnp.concatenate([vox, jnp.zeros((v, 1), jnp.int32)], -1)
    coords4 = jnp.where(rowv[:, None], coords4, INVALID)
    hi, lo = pack_key(coords4, spatial, rowv)
    if feats is None:
        feats = jnp.zeros((v, 0), jnp.float32)
    return SparseTensor(coords4, feats, hi, lo, num, spatial, 1)


def _device_rb(packed, prefix):
    import jax.numpy as jnp

    raw = packed.get(f"{prefix}_idx_raw")
    if raw is not None:
        return raw
    return {k: packed[f"{prefix}_{k}"]
            for k in ("idx", "starts", "local", "hi")}


def unpack_pyramid(cfg, packed):
    """Device (traceable): packed dict -> (table0, pyramid) matching
    models/backbone.build_pyramid's structure — pure elementwise work."""
    from detection_3d_tpu.data.packing import unpack_table

    s3d = cfg.sparse3d
    n_scales = s3d.num_scales
    table0 = unpack_table(cfg, packed)

    spatial = tuple(s3d.voxel_full_scale)
    tables = [table0]
    down_rb, up_rb_by_scale = [], []
    for k in range(1, n_scales):
        st = s3d.strides[k - 1]
        spatial = tuple(-(-d // s) for d, s in zip(spatial, st))
        tables.append(_device_table(packed[f"t{k}_vox"],
                                    packed[f"t{k}_num"], spatial))
        down_rb.append(_device_rb(packed, f"down{k - 1}"))
        up_rb_by_scale.append(_device_rb(packed, f"up{k - 1}"))
    subm_idx = [_device_rb(packed, f"subm{k}") for k in range(n_scales)]

    bev = {}
    for slot, i_from_top in enumerate(cfg.rpn.rpn_scales_from_top):
        scale = n_scales - 1 - i_from_top
        t3d = tables[scale]
        X, Y, _ = t3d.spatial_size
        bev_t = _device_table(packed[f"bev{slot}_vox"],
                              packed[f"bev{slot}_num"], (X, Y, 1))
        bev[slot] = (bev_t, _device_rb(packed, f"bev{slot}"))
    pyramid = {"tables": tables, "subm_idx": subm_idx,
               "down_rb": down_rb, "up_rb": up_rb_by_scale[::-1],
               "bev": bev}
    return table0, pyramid
