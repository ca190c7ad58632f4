"""Analytic GEMM FLOPs of the detector, for MFU accounting.

The reference keeps global multiply-add counters on the sparse convs
(/root/reference/SparseConvNet/sparseconvnet/submanifoldConvolution.py:
85-94: ``forward_pass_multiplyAdd_count += nActive * kernel_volume *
cin * cout``); this module computes the same *true* convolution work —
2 * (valid rulebook pairs) * Cin * Cout per conv — from a built pyramid,
plus the head GEMMs, so tools/op_profile.py can report per-stage FLOPs
vs device time and MFU (FLOPs / time / peak).

"True" means useful math only: the one-hot-matmul gather inside the
Pallas windowed conv kernel (ops/pallas/gather_conv_kernel.py) is data
movement dressed as FLOPs and is reported separately as overhead, not
counted as work.
"""

from __future__ import annotations

from typing import Dict, List

import numpy as np

from detection_3d_tpu.config.defaults import Config


def pyramid_pair_stats(cfg: Config, table0) -> Dict[str, list]:
    """Data-dependent rulebook statistics of one building.

    Builds the per-scale tables/rulebooks with the plain (non-windowed)
    builders and counts VALID gather pairs — the exact rows each conv
    GEMM consumes. Returns lists indexed by scale (or downsample slot):
      rows[s]        active voxels at scale s
      subm_pairs[s]  valid (in,out) pairs over the 27 submanifold offsets
      down_pairs[k]  valid pairs of downsample k (scale k -> k+1)
      up_pairs[k]    valid pairs of deconv k (scale k+1 -> k)
      bev_rows/bev_pairs[slot]  BEV collapse table rows / z-gather pairs
    """
    import jax.numpy as jnp

    from detection_3d_tpu.models.backbone import bev_with_rulebook
    from detection_3d_tpu.ops.sparse import (
        downsample_with_rulebooks, neighbor_indices, submanifold_offsets,
    )

    s3d = cfg.sparse3d
    n_scales = s3d.num_scales
    caps = cfg.caps.scale_caps(n_scales, base=table0.capacity)
    offs3 = submanifold_offsets((3, 3, 3))

    tables = [table0]
    down_pairs: List[int] = []
    up_pairs: List[int] = []
    for k in range(1, n_scales):
        t, crb, drb = downsample_with_rulebooks(
            tables[-1], s3d.kernels[k - 1], s3d.strides[k - 1], caps[k])
        v_in = tables[-1].capacity
        down_pairs.append(int(jnp.sum(
            (crb != v_in) & t.row_valid[None, :])))
        up_pairs.append(int(jnp.sum(
            (drb != t.capacity) & tables[-1].row_valid[None, :])))
        tables.append(t)

    rows = [int(jnp.sum(t.row_valid)) for t in tables]
    subm_pairs = []
    for t in tables:
        idx = neighbor_indices(t, offs3)
        subm_pairs.append(int(jnp.sum(
            (idx != t.capacity) & t.row_valid[None, :])))

    bev_rows, bev_pairs = [], []
    for i_from_top in cfg.rpn.rpn_scales_from_top:
        t3d = tables[n_scales - 1 - i_from_top]
        bev_t, brb = bev_with_rulebook(t3d, t3d.capacity)
        bev_rows.append(int(jnp.sum(bev_t.row_valid)))
        bev_pairs.append(int(jnp.sum(
            (brb != t3d.capacity) & bev_t.row_valid[None, :])))
    return {"rows": rows, "subm_pairs": subm_pairs,
            "down_pairs": down_pairs, "up_pairs": up_pairs,
            "bev_rows": bev_rows, "bev_pairs": bev_pairs}


def model_gemm_flops(cfg: Config, stats: Dict[str, list],
                     is_train: bool = False) -> Dict[str, float]:
    """True GEMM FLOPs per stage (2 * pairs * Cin * Cout for sparse
    convs; 2 * rows * Cin * Cout for NiN/heads), mirroring the layer
    inventory of models/backbone.SparseFPN + the RPN/ROI heads."""
    s3d = cfg.sparse3d
    n_scales = s3d.num_scales
    planes = s3d.nplanes_front
    n_map = s3d.nplane_map
    reps = s3d.block_reps
    rows = stats["rows"]
    sp = stats["subm_pairs"]

    f: Dict[str, float] = {}
    f["conv_in"] = 2.0 * sp[0] * cfg.in_channels * planes[0]

    enc = 0.0
    for k in range(n_scales):
        if k > 0:
            enc += 2.0 * stats["down_pairs"][k - 1] * planes[k - 1] \
                * planes[k]
        for _ in range(reps):
            # residual block: two 3^3 convs planes[k]->planes[k]
            # (shortcut NiN only on a channel change, which the default
            # topology never hits inside a scale)
            n_convs = 2 if s3d.residual_block else 1
            enc += n_convs * 2.0 * sp[k] * planes[k] * planes[k]
    f["encoder"] = enc

    dec = 2.0 * rows[-1] * planes[-1] * n_map       # top shortcut NiN
    for i, k in enumerate(range(n_scales - 1, 0, -1)):
        j = k - 1
        dec += 2.0 * stats["up_pairs"][::-1][i] * n_map * n_map  # deconv
        dec += 2.0 * rows[j] * planes[j] * n_map                 # shortcut
        dec += 2.0 * sp[j] * n_map * n_map                       # merge
    f["decoder"] = dec

    f["bev"] = sum(2.0 * p * n_map * n_map for p in stats["bev_pairs"])

    # RPN head: shared 1x1 + cls + box on every map's rows
    a = cfg.rpn.num_anchors_per_location
    g = cfg.group_num if cfg.separate_rpn else 1
    n3d = len(cfg.rpn.rpn_scales_from_top)
    map_rows = []
    for sel in cfg.rpn.rpn_3d_2d_selector:
        if sel < n3d:
            map_rows.append(
                rows[n_scales - 1 - cfg.rpn.rpn_scales_from_top[sel]])
        else:
            map_rows.append(stats["bev_rows"][sel - n3d])
    n_rpn = sum(map_rows)
    f["rpn_head"] = 2.0 * n_rpn * n_map * (n_map + a * g + a * 7 * g)

    # ROI head on R proposals (per separate-classifier group)
    r = (cfg.roi.batch_size_per_image if is_train
         else cfg.rpn_post_nms_top_n_test)
    groups = cfg.group_num if cfg.separate_classes else 1
    os0, os1, os2 = cfg.roi.pooler_resolution
    rep = cfg.roi.mlp_head_dim
    nc = cfg.num_classes + len(cfg.separate_classes)
    per_roi = (2.0 * os0 * os1 * (os2 * n_map) * rep      # conv3d
               + 2.0 * (os0 * os1 * rep) * rep            # fc6
               + 2.0 * rep * rep                          # fc7
               + 2.0 * rep * (nc + nc * 7))               # predictor
    f["roi_head"] = groups * r * per_roi
    f["total"] = sum(f.values())
    return f


def gather_overhead_flops(cfg: Config, stats: Dict[str, list],
                          window: int = 2048) -> float:
    """FLOPs the windowed Pallas conv kernel spends on its one-hot
    gather matmuls (ops/pallas/gather_conv_kernel.py): per offset and
    output row, a (rows x window) one-hot times the (window x Cin)
    input block. Data movement on the MXU — excluded from 'true' work."""
    s3d = cfg.sparse3d
    n_scales = s3d.num_scales
    planes = s3d.nplanes_front
    n_map = s3d.nplane_map
    reps = s3d.block_reps
    rows = stats["rows"]

    total = 0.0
    for k in range(n_scales):
        # gather cost per conv = 2 * K * out_rows * window * Cin
        if k == 0:
            total += 2.0 * 27 * rows[0] * window * cfg.in_channels
        blocks = (2 if s3d.residual_block else 1) * reps
        total += blocks * 2.0 * 27 * rows[k] * window * planes[k]
        if k > 0:
            kv = int(np.prod(s3d.kernels[k - 1]))
            total += 2.0 * kv * rows[k] * window * planes[k - 1]  # down
            total += 2.0 * kv * rows[k - 1] * window * n_map      # up
        if k + 1 < n_scales:   # merge conv at scale k (decoder)
            total += 2.0 * 27 * rows[k] * window * n_map

    z_sizes = [cfg.sparse3d.voxel_full_scale[2]]
    for k in range(1, n_scales):
        z_sizes.append(-(-z_sizes[-1] // s3d.strides[k - 1][2]))
    for br, i_from_top in zip(stats["bev_rows"],
                              cfg.rpn.rpn_scales_from_top):
        z = z_sizes[n_scales - 1 - i_from_top]
        total += 2.0 * z * br * window * n_map
    return total
