"""Sparse FPN backbone (U-shaped encoder/decoder over sorted voxel tables).

Re-design of the reference FPN_Net
(/root/reference/SparseConvNet/sparseconvnet/fpn_net.py:13-265) for TPU:

  * the voxel pyramid (tables + all gather rulebooks) is built ONCE per
    forward in :func:`build_pyramid` — the analogue of SCN's Metadata
    rulebook cache (SCN/Metadata/Metadata.h:54-74) but fully in-graph;
  * every conv is gather-GEMM-scatter on the MXU (ops/sparse_conv.py);
  * BN runs on batch statistics (configs set TRACK_RUNNING_STATS=False,
    see ops/norm.py), fused with leaky-ReLU.

Structure parity with fpn_net.py:
  encoder scale k: [BN-LReLU + strided conv] (k>0) + block_reps residual
    blocks (fpn_net.py:60-84,95-108);
  decoder: top shortcut (1x1 -> nPlaneM), per level: BN-LReLU + deconv,
    add 1x1 shortcut of encoder scale, 3^3 submanifold merge
    (fpn_net.py:86-92,110-123,181-196);
  BEV maps: z-collapsing conv with kernel [1,1,z_size] (fpn_net.py:55-57,
    198-201); rpn maps selected by rpn_3d_2d_selector.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from detection_3d_tpu.config.defaults import Config
from detection_3d_tpu.ops.sparse import (
    SparseTensor, build_sparse_tensor, submanifold_offsets, neighbor_indices,
    downsample_with_rulebooks,
)
from detection_3d_tpu.ops.sparse_conv import (
    submanifold_conv, strided_conv, deconv, nin_conv,
)
from detection_3d_tpu.ops.norm import batch_norm_leaky_relu
from detection_3d_tpu.ops.coords import INVALID


def _he_init(key, shape, dtype=jnp.float32):
    """SCN-style fan-in init: std = sqrt(2 / (K * Cin))."""
    fan_in = shape[0] * shape[1] if len(shape) == 3 else shape[0]
    return jax.random.normal(key, shape, dtype) * jnp.sqrt(2.0 / fan_in)


def bev_collapse_table(table: SparseTensor, capacity: int) -> SparseTensor:
    """Project active sites to the z=0 plane (dedup columns)."""
    coords = table.coords.at[:, 2].set(0)
    X, Y, Z = table.spatial_size
    feats = jnp.zeros((coords.shape[0], 0), table.feats.dtype)
    return build_sparse_tensor(coords, feats, table.row_valid, (X, Y, 1),
                               table.batch_size, capacity, reduce="sum")


def bev_rulebook(bev_table: SparseTensor, table: SparseTensor):
    """(Z, V_bev) gather indices: offset kz looks up (x, y, kz, b) — one
    vectorized lookup over all Z offsets."""
    Z = table.spatial_size[2]
    v_in = table.capacity
    kz = jnp.arange(Z, dtype=jnp.int32)
    q = jnp.broadcast_to(bev_table.coords[None, :, :],
                         (Z,) + bev_table.coords.shape)
    q = q.at[:, :, 2].set(kz[:, None])
    idx, found = table.lookup(q, valid=bev_table.row_valid[None, :])
    return jnp.where(found, idx, v_in)


def bev_with_rulebook(table: SparseTensor, capacity: int):
    """BEV table + (Z, V_bev) rulebook by SCATTER — zero searches.

    Every 3D row's bev row comes free from the z=0 dedup sort
    (build_sparse_tensor return_row_map); rb[z_i, bev_row_i] = i. Exact
    equality with bev_collapse_table + bev_rulebook (tested)."""
    coords = table.coords.at[:, 2].set(0)
    X, Y, Z = table.spatial_size
    v_in = table.capacity
    feats = jnp.zeros((coords.shape[0], 0), table.feats.dtype)
    bev_t, row_map = build_sparse_tensor(
        coords, feats, table.row_valid, (X, Y, 1), table.batch_size,
        capacity, reduce="sum", return_row_map=True)
    ok = table.row_valid & (row_map < capacity)
    z = table.coords[:, 2]
    flat = jnp.where(ok, z * capacity + row_map, Z * capacity)
    rb = jnp.full((Z * capacity + 1,), v_in, jnp.int32)
    rb = rb.at[flat].set(jnp.arange(v_in, dtype=jnp.int32))[
        :Z * capacity].reshape(Z, capacity)
    return bev_t, rb


@functools.partial(jax.jit, static_argnames=("cfg",))
def build_pyramid(table0: SparseTensor, cfg: Config) -> Dict[str, Any]:
    """All tables + rulebooks for one forward pass.

    Returns dict with:
      tables: per-scale SparseTensor (features empty for scales > 0);
      subm_idx: per-scale (27, V) submanifold neighbor indices;
      down_rb: per-downsample (K, V_k) conv rulebooks;
      up_rb: per-upsample (K, V_{k-1}) deconv rulebooks;
      bev: {fpn_slot: (bev_table, (Z, V_bev) rulebook)} for RPN 2D maps.
    """
    s3d = cfg.sparse3d
    n_scales = s3d.num_scales
    caps = cfg.caps.scale_caps(n_scales, base=table0.capacity)
    offs3 = submanifold_offsets((3, 3, 3))
    budget = cfg.caps.dense_grid_max_entries
    xy_budget = cfg.caps.xy_grid_max_entries

    def accel(t):
        # dense 3D grid when it fits; otherwise a dense xy-column grid
        return t.with_dense_grid(budget).with_xy_grid(xy_budget)

    # on TPU backends, conv rulebooks are precomputed into windowed
    # fast-conv form ONCE per scale and shared by every conv at that
    # scale (the (K, V) offset arrays are large; rebuilding/re-laying
    # them out per conv call costs more than the conv kernel itself)
    import jax as _jax
    from detection_3d_tpu.ops.pallas.gather_conv_kernel import (
        windowed_rulebook,
    )
    from detection_3d_tpu.ops.pallas.match_kernel import (
        neighbor_match_3x3x3, match_supported,
    )
    use_fast = _jax.default_backend() == "tpu"

    def fast_rb(idx, dest_table, v_in):
        if use_fast and v_in >= 1024:
            return windowed_rulebook(idx, dest_table.row_valid, v_in)
        return idx

    # strided conv + deconv rulebooks come as SCATTERS from the
    # downsample dedup sort (ops/sparse.downsample_with_rulebooks) — no
    # key searches on any backend
    tables = [accel(table0)]
    down_rb = []
    up_rb_by_scale = []
    for k in range(1, n_scales):
        kernel, stride = s3d.kernels[k - 1], s3d.strides[k - 1]
        t, crb, drb = downsample_with_rulebooks(tables[-1], kernel,
                                                stride, caps[k])
        t = accel(t)
        down_rb.append(fast_rb(crb, t, tables[-1].capacity))
        up_rb_by_scale.append(fast_rb(drb, tables[-1], t.capacity))
        tables.append(t)
    up_rb = up_rb_by_scale[::-1]

    def subm_rulebook(t):
        # windowed sorted-key match kernel replaces per-query binary
        # searches on large TPU scales (the searches dominated the
        # full-scale forward)
        idx = (neighbor_match_3x3x3(t) if match_supported(t)
               else neighbor_indices(t, offs3))
        return fast_rb(idx, t, t.capacity)

    subm_idx = [subm_rulebook(t) for t in tables]

    bev = {}
    for slot, i_from_top in enumerate(cfg.rpn.rpn_scales_from_top):
        scale = n_scales - 1 - i_from_top
        t3d = tables[scale]
        bev_t, brb = bev_with_rulebook(t3d, t3d.capacity)
        bev[slot] = (bev_t, fast_rb(brb, bev_t, t3d.capacity))
    return {"tables": tables, "subm_idx": subm_idx, "down_rb": down_rb,
            "up_rb": up_rb, "bev": bev}


class SubmConv(nn.Module):
    """3^3 (or 1^3) submanifold conv, bias-free (reference convs all pass
    bias=False; BN supplies the shift)."""
    features: int
    num_offsets: int = 27

    @nn.compact
    def __call__(self, feats, nidx, valid):
        w = self.param("w", _he_init,
                       (self.num_offsets, feats.shape[-1], self.features))
        return submanifold_conv(feats, nidx, w.astype(feats.dtype), valid)


class NiN(nn.Module):
    features: int

    @nn.compact
    def __call__(self, feats, valid):
        w = self.param("w", _he_init, (feats.shape[-1], self.features))
        return nin_conv(feats, w.astype(feats.dtype), valid)


class BNLeakyReLU(nn.Module):
    leakiness: float = 0.0
    sp_axis: str = None   # spatial-sharding mesh axis: psum batch stats

    @nn.compact
    def __call__(self, feats, valid):
        c = feats.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return batch_norm_leaky_relu(feats, valid, scale, bias,
                                     leakiness=self.leakiness,
                                     axis_name=self.sp_axis)


class ResidualBlock(nn.Module):
    """ConcatTable(identity|NiN, BN->Conv->BN->Conv) + Add
    (fpn_net.py:60-69)."""
    features: int
    sp_axis: str = None

    @nn.compact
    def __call__(self, feats, nidx, valid):
        cin = feats.shape[-1]
        if cin == self.features:
            shortcut = feats
        else:
            shortcut = NiN(self.features, name="shortcut")(feats, valid)
        h = BNLeakyReLU(name="bn1", sp_axis=self.sp_axis)(feats, valid)
        h = SubmConv(self.features, name="conv1")(h, nidx, valid)
        h = BNLeakyReLU(name="bn2", sp_axis=self.sp_axis)(h, valid)
        h = SubmConv(self.features, name="conv2")(h, nidx, valid)
        return shortcut + h


class DownLayer(nn.Module):
    """BN-LReLU + strided conv (fpn_net.py:77-84)."""
    features: int
    kernel_volume: int
    sp_axis: str = None

    @nn.compact
    def __call__(self, feats, rulebook, in_valid, out_valid):
        h = BNLeakyReLU(name="bn", sp_axis=self.sp_axis)(feats, in_valid)
        w = self.param("w", _he_init,
                       (self.kernel_volume, feats.shape[-1], self.features))
        return strided_conv(h, rulebook, w.astype(h.dtype), out_valid)


class UpLayer(nn.Module):
    """BN-LReLU + deconv (fpn_net.py:86-92)."""
    features: int
    kernel_volume: int
    sp_axis: str = None

    @nn.compact
    def __call__(self, feats, rulebook, in_valid, out_valid):
        h = BNLeakyReLU(name="bn", sp_axis=self.sp_axis)(feats, in_valid)
        w = self.param("w", _he_init,
                       (self.kernel_volume, feats.shape[-1], self.features))
        return deconv(h, rulebook, w.astype(h.dtype), out_valid)


class BEVConv(nn.Module):
    """z-collapsing conv: kernel [1,1,Z], stride 1 (fpn_net.py:55-57)."""
    features: int
    z_size: int

    @nn.compact
    def __call__(self, feats, rulebook, out_valid):
        w = self.param("w", _he_init,
                       (self.z_size, feats.shape[-1], self.features))
        return strided_conv(feats, rulebook, w.astype(feats.dtype), out_valid)


class SparseFPN(nn.Module):
    """Full backbone: input subm conv + encoder + FPN decoder + BEV maps.

    __call__(table0, pyramid) -> (rpn_maps, roi_maps): lists of
    SparseTensor carrying nPlaneM-channel features.
    """
    cfg: Config
    sp_axis: str = None   # spatial-sharding mesh axis (parallel/spatial)

    @nn.compact
    def __call__(self, table0: SparseTensor, pyramid: Dict[str, Any]):
        cfg = self.cfg
        s3d = cfg.sparse3d
        n_scales = s3d.num_scales
        n_planes = s3d.nplanes_front
        n_map = s3d.nplane_map
        reps = s3d.block_reps
        tables: List[SparseTensor] = pyramid["tables"]
        subm_idx = pyramid["subm_idx"]

        # spatial sharding: "valid" for losses/BN/outputs = rows OWNED by
        # this shard (halo rows are neighbor-owned copies)
        valids = pyramid.get("own_valid") or [t.row_valid for t in tables]

        # ---- input layer: 3^3 subm conv raw_channels -> nPlanesF[0]
        # (fpn_net.py:42-44)
        h = SubmConv(n_planes[0], name="conv_in")(
            table0.feats, subm_idx[0], valids[0])

        # ---- encoder (fpn_net.py:95-108)
        downs = []
        for k in range(n_scales):
            if k > 0:
                kv = (s3d.kernels[k - 1][0] * s3d.kernels[k - 1][1]
                      * s3d.kernels[k - 1][2])
                h = DownLayer(n_planes[k], kv, name=f"down{k}",
                              sp_axis=self.sp_axis)(
                    h, pyramid["down_rb"][k - 1], valids[k - 1], valids[k])
            for r in range(reps):
                if s3d.residual_block:
                    h = ResidualBlock(n_planes[k], name=f"block{k}_{r}",
                                      sp_axis=self.sp_axis)(
                        h, subm_idx[k], valids[k])
                else:
                    hh = BNLeakyReLU(name=f"vgg_bn{k}_{r}",
                                     sp_axis=self.sp_axis)(h, valids[k])
                    h = SubmConv(n_planes[k], name=f"vgg_conv{k}_{r}")(
                        hh, subm_idx[k], valids[k])
            downs.append(h)

        # ---- decoder (fpn_net.py:181-196)
        net = NiN(n_map, name=f"shortcut{n_scales - 1}")(
            downs[-1], valids[-1])
        ups = [net]
        for i, k in enumerate(range(n_scales - 1, 0, -1)):
            j = k - 1
            kv = (s3d.kernels[j][0] * s3d.kernels[j][1] * s3d.kernels[j][2])
            net = UpLayer(n_map, kv, name=f"up{j}", sp_axis=self.sp_axis)(
                net, pyramid["up_rb"][i], valids[k], valids[j])
            sc = NiN(n_map, name=f"shortcut{j}")(downs[j], valids[j])
            net = net + sc
            net = SubmConv(n_map, name=f"merge{j}")(net, subm_idx[j],
                                                    valids[j])
            ups.append(net)

        # ups[i] = features at scale (n_scales-1-i); index i counts from top
        rpn_feats_3d = []
        rpn_tables_3d = []
        for i_from_top in cfg.rpn.rpn_scales_from_top:
            scale = n_scales - 1 - i_from_top
            rpn_feats_3d.append(ups[i_from_top])
            rpn_tables_3d.append(tables[scale])

        rpn_feats_2d = []
        rpn_tables_2d = []
        for slot in range(len(rpn_feats_3d)):
            bev_t, bev_rb = pyramid["bev"][slot]
            z = tables[n_scales - 1 - cfg.rpn.rpn_scales_from_top[slot]
                       ].spatial_size[2]
            f2d = BEVConv(n_map, z, name=f"pro2d{slot}")(
                rpn_feats_3d[slot], bev_rb, bev_t.row_valid)
            rpn_feats_2d.append(f2d)
            rpn_tables_2d.append(bev_t)

        all_feats = rpn_feats_3d + rpn_feats_2d
        all_tables = rpn_tables_3d + rpn_tables_2d
        rpn_maps = [all_tables[i].with_feats(all_feats[i])
                    for i in cfg.rpn.rpn_3d_2d_selector]

        roi_maps = []
        for i_from_top in cfg.roi.pooler_scales_from_top:
            scale = n_scales - 1 - i_from_top
            roi_maps.append(tables[scale].with_feats(ups[i_from_top]))
        return rpn_maps, roi_maps
