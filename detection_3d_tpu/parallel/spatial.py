"""Spatial sharding of one building across the device mesh (halo exchange).

The "context parallelism" slot of the TPU design (SURVEY.md section 5):
when one building's voxel set exceeds a chip's HBM, shard the voxels
SPATIALLY over a 1-D ``sp`` mesh axis by contiguous x-slabs and run the
sparse-conv trunk with halo exchange over ICI. The reference has no
counterpart (strictly single-GPU per building, IMS_PER_BATCH=1 —
/root/reference/tools/train_net_sparse3d.py:52-57); this is the scaling
dimension the CUDA design could not express.

Design (all static shapes, shard_map-compatible):

  * shard d owns x in [d*w_s, (d+1)*w_s) at scale s (w_s = X_s / D; slab
    boundaries stay aligned across scales because strides are powers of
    2 and X is divisible by D * prod(strides));
  * per scale, each shard's table is EXTENDED with one halo column from
    each neighbor (x = slab_lo - 1 and slab_hi + 1) — enough for 3^3
    submanifold convs and 2^3 deconvs; topology (coords) is exchanged
    once per scale via ``jax.lax.ppermute``;
  * per conv, halo FEATURES are refreshed from the neighbors right
    before the gather (:class:`HaloExchange` — wired into
    ops/sparse_conv._best_conv via the rulebook dict), because each
    layer's halo must carry the neighbor's current activations;
  * rows are key-sorted, so a shard's boundary column and the matching
    halo column enumerate sites in the same (y, z) order — the ppermute
    payload needs no re-matching on the receiving side;
  * BN statistics psum over the ``sp`` axis (ops/norm.py axis_name), so
    every shard normalizes with the global moments;
  * conv/BN/loss validity = "own" rows only (halo rows are
    neighbor-owned copies).

`spatial_fpn_apply` runs the full SparseFPN trunk under shard_map and
returns per-shard rpn/roi maps plus own-masks; `tests/test_spatial.py`
checks bit-level parity of every owned feature row against the
single-device run on a CPU mesh.
"""

from __future__ import annotations

import functools
import logging
from typing import Any, Dict, List

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from detection_3d_tpu.config.defaults import Config
from detection_3d_tpu.models.backbone import (
    SparseFPN, bev_collapse_table, bev_rulebook,
)
from detection_3d_tpu.ops.sparse import (
    SparseTensor, build_sparse_tensor, submanifold_offsets,
    neighbor_indices, downsample_table, conv_rulebook,
)
from detection_3d_tpu.ops.sparse_conv import deconv_rulebook

_LOG = logging.getLogger(__name__)


def _warn_halo_overflow(ovf, where: str):
    """Surface an undersized-halo-cap overflow (silently corrupted
    boundary convolutions otherwise)."""
    if bool(np.any(np.asarray(ovf))):
        _LOG.warning(
            "%s: halo column exceeded halo_caps on at least one shard — "
            "boundary rows were DROPPED and slab-edge convolutions are "
            "wrong; raise halo_caps", where)
        return True
    return False


def _compact(mask, cap: int):
    """Positions of the first ``cap`` True rows (row-order preserving).

    Returns (idx (cap,), ok (cap,)): ok[i] = slot i holds a real row.
    """
    n = mask.shape[0]
    order = jnp.argsort(
        jnp.where(mask, jnp.arange(n, dtype=jnp.int32), n))
    if cap > n:   # more halo slots than table rows: pad with sentinels
        order = jnp.concatenate(
            [order, jnp.full((cap - n,), n - 1, order.dtype)])
    idx = order[:cap]
    count = jnp.sum(mask.astype(jnp.int32))
    ok = jnp.arange(cap) < jnp.minimum(count, cap)
    return jnp.where(ok, idx, n - 1).astype(jnp.int32), ok


@jax.tree_util.register_pytree_node_class
class HaloExchange:
    """Per-scale feature refresh across the ``sp`` axis.

    Boundary rows (x == slab edge) of each shard are copied into the
    neighboring shards' halo rows with two ``ppermute`` shifts. Both
    sides enumerate the shared column in sorted (y, z) order, so slot i
    of the payload is slot i of the receiver's halo — no matching.
    """

    def __init__(self, axis: str, n_shards: int, send_lo, send_lo_ok,
                 send_hi, send_hi_ok, recv_lo, recv_lo_ok, recv_hi,
                 recv_hi_ok):
        self.axis = axis
        self.n_shards = n_shards
        self.send_lo = send_lo      # my x == slab_lo rows (to left nbr)
        self.send_lo_ok = send_lo_ok
        self.send_hi = send_hi      # my x == slab_hi rows (to right nbr)
        self.send_hi_ok = send_hi_ok
        self.recv_lo = recv_lo      # my x == slab_lo - 1 halo rows
        self.recv_lo_ok = recv_lo_ok
        self.recv_hi = recv_hi      # my x == slab_hi + 1 halo rows
        self.recv_hi_ok = recv_hi_ok

    def tree_flatten(self):
        children = (self.send_lo, self.send_lo_ok, self.send_hi,
                    self.send_hi_ok, self.recv_lo, self.recv_lo_ok,
                    self.recv_hi, self.recv_hi_ok)
        return children, (self.axis, self.n_shards)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(aux[0], aux[1], *children)

    def refresh(self, feats):
        d = self.n_shards
        cap = feats.shape[0]
        to_left = jnp.where(self.send_lo_ok[:, None],
                            feats[self.send_lo], 0)
        to_right = jnp.where(self.send_hi_ok[:, None],
                             feats[self.send_hi], 0)
        # shard i's lo-edge rows become shard i-1's hi halo, and its
        # hi-edge rows become shard i+1's lo halo
        from_right = jax.lax.ppermute(
            to_left, self.axis, [(i, i - 1) for i in range(1, d)])
        from_left = jax.lax.ppermute(
            to_right, self.axis, [(i, i + 1) for i in range(d - 1)])
        ilo = jnp.where(self.recv_lo_ok, self.recv_lo, cap)
        ihi = jnp.where(self.recv_hi_ok, self.recv_hi, cap)
        feats = feats.at[ilo].set(from_left, mode="drop")
        feats = feats.at[ihi].set(from_right, mode="drop")
        return feats


def _extend_with_halo(own: SparseTensor, slab_lo, slab_hi, halo_cap: int,
                      axis: str, n_shards: int):
    """Exchange boundary COLUMNS (topology) and build the extended table.

    Returns (ext_table, own_mask, halo: HaloExchange).
    """
    x = own.coords[:, 0]
    ov = own.row_valid
    lo_mask = ov & (x == slab_lo)
    hi_mask = ov & (x == slab_hi)
    # halo_cap = Y_s * Z_s is a hard upper bound (one x column); smaller
    # caps are allowed for memory — overflow is surfaced to the caller
    overflow = jnp.maximum(jnp.sum(lo_mask.astype(jnp.int32)),
                           jnp.sum(hi_mask.astype(jnp.int32))) > halo_cap
    sl_idx, sl_ok = _compact(lo_mask, halo_cap)
    sh_idx, sh_ok = _compact(hi_mask, halo_cap)
    cl = jnp.where(sl_ok[:, None], own.coords[sl_idx], -1)
    ch = jnp.where(sh_ok[:, None], own.coords[sh_idx], -1)
    perm_dn = [(i, i - 1) for i in range(1, n_shards)]
    perm_up = [(i, i + 1) for i in range(n_shards - 1)]
    halo_hi_c = jax.lax.ppermute(cl, axis, perm_dn)   # right nbr's lo col
    halo_hi_ok = jax.lax.ppermute(sl_ok, axis, perm_dn)
    halo_lo_c = jax.lax.ppermute(ch, axis, perm_up)   # left nbr's hi col
    halo_lo_ok = jax.lax.ppermute(sh_ok, axis, perm_up)

    coords = jnp.concatenate([own.coords, halo_lo_c, halo_hi_c], axis=0)
    valid = jnp.concatenate([ov, halo_lo_ok, halo_hi_ok], axis=0)
    cap_ext = own.capacity + 2 * halo_cap
    nch = own.feats.shape[-1]
    feats = jnp.concatenate(
        [own.feats, jnp.zeros((2 * halo_cap, nch), own.feats.dtype)],
        axis=0)
    ext = build_sparse_tensor(coords, feats, valid, own.spatial_size,
                              own.batch_size, cap_ext, reduce="sum")

    ex = ext.coords[:, 0]
    ev = ext.row_valid
    own_mask = ev & (ex >= slab_lo) & (ex <= slab_hi)
    s_lo, s_lo_ok = _compact(ev & (ex == slab_lo), halo_cap)
    s_hi, s_hi_ok = _compact(ev & (ex == slab_hi), halo_cap)
    r_lo, r_lo_ok = _compact(ev & (ex == slab_lo - 1), halo_cap)
    r_hi, r_hi_ok = _compact(ev & (ex == slab_hi + 1), halo_cap)
    halo = HaloExchange(axis, n_shards, s_lo, s_lo_ok, s_hi, s_hi_ok,
                        r_lo, r_lo_ok, r_hi, r_hi_ok)
    return ext, own_mask, halo, overflow


def _own_only(table: SparseTensor, own_mask) -> SparseTensor:
    """A view whose non-own rows can't produce downsample candidates."""
    coords = jnp.where(own_mask[:, None], table.coords, -1)
    return SparseTensor(coords, table.feats, table.hi, table.lo,
                        table.num, table.spatial_size, table.batch_size)


def build_spatial_pyramid(cfg: Config, points, feats, points_valid,
                          axis: str, n_shards: int,
                          shard_caps, halo_caps) -> Dict[str, Any]:
    """Per-shard pyramid over extended (own + halo) tables.

    Runs INSIDE shard_map. Each shard voxelizes only its x-slab's points
    (callers pass the full replicated point cloud; ownership is decided
    here by slab masking). Returns the build_pyramid dict layout plus
    ``own_valid`` masks; conv rulebooks carry HaloExchange objects so
    the unmodified SparseFPN runs spatially sharded.
    """
    from detection_3d_tpu.models.detector import voxelize_points

    s3d = cfg.sparse3d
    n_scales = s3d.num_scales
    X = s3d.voxel_full_scale[0]
    d = jax.lax.axis_index(axis)
    offs3 = submanifold_offsets((3, 3, 3))

    # voxelize own slab only (points arrive pre-scaled to voxel units)
    w0 = X // n_shards
    vox_x = jnp.floor(points[:, 0]).astype(jnp.int32)
    in_slab = (vox_x >= d * w0) & (vox_x < (d + 1) * w0)
    own0 = voxelize_points(cfg, points, feats, points_valid & in_slab,
                           capacity=shard_caps[0])

    tables: List[SparseTensor] = []
    own_valid = []
    halos = []
    own_tables = [own0]
    halo_overflow = jnp.zeros((), bool)
    for s in range(n_scales):
        w_s = (X >> s) // n_shards
        ext, own_m, halo, ovf = _extend_with_halo(
            own_tables[s], d * w_s, (d + 1) * w_s - 1, halo_caps[s],
            axis, n_shards)
        halo_overflow |= ovf
        tables.append(ext)
        own_valid.append(own_m)
        halos.append(halo)
        if s + 1 < n_scales:
            own_next = downsample_table(_own_only(ext, own_m),
                                        s3d.kernels[s], s3d.strides[s],
                                        shard_caps[s + 1])
            own_tables.append(own_next)

    subm_idx = [{"idx": neighbor_indices(t, offs3), "halo": h}
                for t, h in zip(tables, halos)]
    down_rb = []
    up_rb = []
    for k in range(1, n_scales):
        kernel, stride = s3d.kernels[k - 1], s3d.strides[k - 1]
        # strided down-gathers stay inside the own slab — no halo needed
        down_rb.append(
            {"idx": conv_rulebook(tables[k], tables[k - 1], kernel,
                                  stride), "halo": None})
    for k in range(n_scales - 1, 0, -1):
        kernel, stride = s3d.kernels[k - 1], s3d.strides[k - 1]
        # deconv reads the coarse halo column ((x-1)//2 crosses the slab)
        up_rb.append(
            {"idx": deconv_rulebook(tables[k - 1], tables[k], kernel,
                                    stride), "halo": halos[k]})

    bev = {}
    for slot, i_from_top in enumerate(cfg.rpn.rpn_scales_from_top):
        scale = n_scales - 1 - i_from_top
        t3d = tables[scale]
        bev_t = bev_collapse_table(_own_only(t3d, own_valid[scale]),
                                   t3d.capacity)
        bev[slot] = (bev_t, bev_rulebook(bev_t, t3d))
    return {"tables": tables, "subm_idx": subm_idx, "down_rb": down_rb,
            "up_rb": up_rb, "bev": bev, "own_valid": own_valid,
            "halo_overflow": halo_overflow}


def spatial_fpn_apply(cfg: Config, mesh: Mesh, params, points, feats,
                      points_valid, shard_caps, halo_caps,
                      axis: str = "sp"):
    """Run the SparseFPN trunk spatially sharded over ``mesh``.

    Points are replicated (ownership decided per shard); returns
    per-shard stacked (rpn_maps, roi_maps, own_valid) with a leading
    shard dim on every array. Each map's owned rows bit-match the
    single-device run (tests/test_spatial.py).
    """
    n_shards = mesh.devices.size
    fpn = SparseFPN(cfg, sp_axis=axis)

    def run(params, points, feats, points_valid):
        pyr = build_spatial_pyramid(cfg, points, feats, points_valid,
                                    axis, n_shards, shard_caps, halo_caps)
        table0 = pyr["tables"][0]
        rpn_maps, roi_maps = fpn.apply(params, table0, pyr)
        return (rpn_maps, roi_maps, pyr["own_valid"],
                pyr["halo_overflow"])

    def run_stacked(params, points, feats, points_valid):
        out = run(params, points, feats, points_valid)
        return jax.tree.map(lambda a: jnp.asarray(a)[None], out)

    spec = P()
    fn = shard_map(run_stacked, mesh=mesh,
                   in_specs=(spec, spec, spec, spec),
                   out_specs=P(axis))
    rpn_maps, roi_maps, own_valid, ovf = fn(params, points, feats,
                                            points_valid)
    _warn_halo_overflow(ovf, "spatial_fpn_apply")
    return rpn_maps, roi_maps, own_valid


def _gather_global_map(t: SparseTensor, own_mask, axis: str,
                       cap_out: int) -> SparseTensor:
    """All-gather the OWNED rows of a per-shard map into the same global
    table on every shard (eval reassembly after the sharded trunk)."""
    idx, ok = _compact(own_mask, t.capacity)
    coords = jnp.where(ok[:, None], t.coords[idx], -1)
    feats = jnp.where(ok[:, None], t.feats[idx], 0)
    coords_all = jax.lax.all_gather(coords, axis)     # (D, cap, 4)
    feats_all = jax.lax.all_gather(feats, axis)
    ok_all = jax.lax.all_gather(ok, axis)
    return build_sparse_tensor(
        coords_all.reshape(-1, 4), feats_all.reshape(-1, t.feats.shape[-1]),
        ok_all.reshape(-1), t.spatial_size, t.batch_size, cap_out,
        reduce="sum")


def _gather_global_maps(cfg: Config, spyr, rpn_maps, roi_maps, axis: str):
    """All-gather per-shard owned map rows into replicated global maps."""
    n_scales = cfg.sparse3d.num_scales
    global_caps = cfg.caps.scale_caps(n_scales)

    def scale_of(i_from_top):
        return n_scales - 1 - i_from_top

    n3d = len(cfg.rpn.rpn_scales_from_top)
    global_rpn = []
    for slot, m in enumerate(rpn_maps):
        sel = cfg.rpn.rpn_3d_2d_selector[slot]
        if sel < n3d:   # 3d map: owned rows of that scale
            sc = scale_of(cfg.rpn.rpn_scales_from_top[sel])
            own = spyr["own_valid"][sc]
            cap = global_caps[sc]
        else:           # bev map (own-only table)
            own = m.row_valid
            sc = scale_of(cfg.rpn.rpn_scales_from_top[sel - n3d])
            cap = global_caps[sc]
        global_rpn.append(_gather_global_map(m, own, axis, cap))
    global_roi = []
    for i, i_from_top in enumerate(cfg.roi.pooler_scales_from_top):
        sc = scale_of(i_from_top)
        global_roi.append(_gather_global_map(
            roi_maps[i], spyr["own_valid"][sc], axis, global_caps[sc]))
    return global_rpn, global_roi


def _heads_eval(cfg: Config, params, global_rpn, global_roi):
    """Replicated RPN + ROI eval heads on gathered global maps — the
    eval branch of SparseRCNN (models/detector.py:133-153), including
    separate-classifier groups."""
    from detection_3d_tpu.models.rpn import RPN
    from detection_3d_tpu.models.roi_head import ROIBoxHead, postprocess
    from detection_3d_tpu.models.separate_classifier import (
        grouped_class_ids, merge_group_detections, slice_group_logits,
    )

    proposals_g, _ = RPN(cfg).apply(
        {"params": params["params"]["rpn"]}, global_rpn, None,
        is_train=False, rng=None)
    proposals_g = [p.clamp_size() for p in proposals_g]
    g = len(proposals_g)
    nc_total = cfg.num_classes + len(cfg.separate_classes)
    results = []
    for gi, proposals in enumerate(proposals_g):
        cls_logits, box_reg = ROIBoxHead(cfg).apply(
            {"params": params["params"]["roi_head"]}, global_roi,
            proposals)
        if g > 1:
            cls_logits, box_reg = slice_group_logits(cfg, cls_logits,
                                                     box_reg, gi)
            nc_g = len(grouped_class_ids(cfg)[gi])
        else:
            nc_g = nc_total
        results.append(postprocess(cfg, proposals, cls_logits, box_reg,
                                   nc_g, cfg.roi_detections_per_img))
    if g == 1:
        return results[0]
    return merge_group_detections(cfg, results)


def spatial_predict(cfg: Config, mesh: Mesh, params, batch,
                    shard_caps, halo_caps, axis: str = "sp"):
    """Full spatially-sharded inference: the conv trunk runs sharded with
    halo exchange; owned map rows are then all-gathered so the (small)
    RPN/ROI heads run replicated — the same detections materialize on
    every shard. Handles separate-classifier groups (3G6c) too.

    Returns the detections of shard 0 as (boxes, valid, scores, labels).
    """
    n_shards = mesh.devices.size
    fpn = SparseFPN(cfg, sp_axis=axis)

    def run(params, points, feats, points_valid):
        spyr = build_spatial_pyramid(cfg, points, feats, points_valid,
                                     axis, n_shards, shard_caps,
                                     halo_caps)
        table0 = spyr["tables"][0]
        table0 = table0.with_feats(
            table0.feats.astype(jnp.dtype(cfg.compute_dtype)))
        rpn_maps, roi_maps = fpn.apply(
            {"params": params["params"]["backbone"]}, table0, spyr)
        global_rpn, global_roi = _gather_global_maps(cfg, spyr, rpn_maps,
                                                     roi_maps, axis)
        det = _heads_eval(cfg, params, global_rpn, global_roi)
        out = (det.boxes, det.valid, det.fields["scores"],
               det.fields["labels"], spyr["halo_overflow"])
        return jax.tree.map(lambda a: jnp.asarray(a)[None], out)

    spec = P()
    fn = shard_map(run, mesh=mesh,
                   in_specs=(spec, spec, spec, spec),
                   out_specs=P(axis))
    boxes, valid, scores, labels, ovf = fn(
        params, batch["points"], batch["feats"], batch["points_valid"])
    _warn_halo_overflow(ovf, "spatial_predict")
    return boxes[0], valid[0], scores[0], labels[0]


def _heads_train_loss(cfg: Config, params, global_rpn, global_roi, gt,
                      gt_labels, rng):
    """Replicated train heads on gathered global maps — the train branch
    of SparseRCNN (models/detector.py:103-120): RPN losses + per-group
    ROI sampling/losses. Returns a loss dict."""
    from detection_3d_tpu.models.roi_head import (
        ROIBoxHead, roi_loss, subsample_proposals,
    )
    from detection_3d_tpu.models.rpn import RPN
    from detection_3d_tpu.models.separate_classifier import (
        separate_targets, slice_group_logits,
    )
    from detection_3d_tpu.models.structures import Boxes3D

    if cfg.separate_classes:
        gt_groups = separate_targets(cfg, gt, gt_labels)
    else:
        gt_groups = [(gt, gt_labels)]
    proposals_g, losses = RPN(cfg).apply(
        {"params": params["params"]["rpn"]}, global_rpn,
        [g for g, _ in gt_groups], is_train=True, rng=rng)
    proposals_g = [p.clamp_size() for p in proposals_g]
    losses = dict(losses)
    g = len(proposals_g)
    for gi, proposals in enumerate(proposals_g):
        gt_gi, labels_gi = gt_groups[gi]
        key = jax.random.fold_in(rng, 1000 + gi)
        sampled = subsample_proposals(cfg, key, proposals, gt_gi,
                                      labels_gi)
        cls_logits, box_reg = ROIBoxHead(cfg).apply(
            {"params": params["params"]["roi_head"]}, global_roi, sampled)
        if g > 1:
            cls_logits, box_reg = slice_group_logits(cfg, cls_logits,
                                                     box_reg, gi)
        cl, bl = roi_loss(cfg, sampled, cls_logits, box_reg)
        suf = "" if g == 1 else f"_{gi}"
        losses[f"loss_classifier_roi{suf}"] = cl
        losses[f"loss_box_reg_roi{suf}"] = bl
    return losses


def make_spatial_grad_fn(cfg: Config, mesh: Mesh, shard_caps, halo_caps,
                         axis: str = "sp"):
    """Loss + exact global gradient of the spatially-sharded model.

    The conv trunk (the memory-heavy part) runs sharded with halo
    exchange and per-scale BN psum; owned map rows are all-gathered and
    the small RPN/ROI heads + losses run REPLICATED on every shard with
    the same rng. Gradient correctness through the collectives: each
    shard differentiates its own (identical) loss copy scaled by
    1/n_shards; shard_map's varying-axis autodiff (check_vma) makes the
    cotangent of every REPLICATED input a psum over the mesh axis
    automatically (transpose of the implicit pbroadcast), so the
    per-shard gradient is already the exact global gradient — summing
    n_shards identical head copies at 1/n_shards each, and routing
    trunk cotangents through the all_gather/ppermute transposes
    (reduce-scatter / reverse-permute). No explicit psum is added — one
    would double-count (verified against single-device grads in
    tests/test_spatial.py).

    Returns grad_fn(params, batch, rng) -> (total, losses, grads,
    halo_overflow) with shard-0 values (identical on every shard).
    """
    from detection_3d_tpu.models.structures import Boxes3D

    n_shards = mesh.devices.size
    fpn = SparseFPN(cfg, sp_axis=axis)

    def local_loss(params, points, feats, points_valid, gt_boxes,
                   gt_valid, gt_labels, rng):
        spyr = build_spatial_pyramid(cfg, points, feats, points_valid,
                                     axis, n_shards, shard_caps,
                                     halo_caps)
        table0 = spyr["tables"][0]
        table0 = table0.with_feats(
            table0.feats.astype(jnp.dtype(cfg.compute_dtype)))
        rpn_maps, roi_maps = fpn.apply(
            {"params": params["params"]["backbone"]}, table0, spyr)
        global_rpn, global_roi = _gather_global_maps(cfg, spyr, rpn_maps,
                                                     roi_maps, axis)
        gt = Boxes3D(gt_boxes, gt_valid)
        losses = _heads_train_loss(cfg, params, global_rpn, global_roi,
                                   gt, gt_labels, rng)
        total = sum(jax.tree_util.tree_leaves(losses))
        return total / n_shards, (losses, spyr["halo_overflow"])

    def sharded_grad(params, batch, rng):
        (scaled, (losses, ovf)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(
                params, batch["points"], batch["feats"],
                batch["points_valid"], batch["gt_boxes"],
                batch["gt_valid"], batch["gt_labels"], rng)
        total = scaled * n_shards          # identical on every shard
        return jax.tree.map(lambda a: jnp.asarray(a)[None],
                            (total, losses, grads, ovf))

    spec = P()
    fn = shard_map(sharded_grad, mesh=mesh,
                   in_specs=(spec, spec, spec), out_specs=P(axis))

    def grad_fn(params, batch, rng):
        total, losses, grads, ovf = fn(params, batch, rng)
        return (total[0], jax.tree.map(lambda a: a[0], losses),
                jax.tree.map(lambda a: a[0], grads), ovf[0])

    return grad_fn


def make_spatial_train_step(cfg: Config, mesh: Mesh, tx, shard_caps,
                            halo_caps, axis: str = "sp"):
    """Spatially-sharded training step (see make_spatial_grad_fn for the
    sharding/gradient design). NaN-gated full-state transition like the
    single-device step (engine/trainer.py).

    Returns step(state, batch, rng) -> (state, total, losses, ok,
    halo_overflow) for a batch of ONE building (points replicated).
    """
    import optax

    grad_fn = make_spatial_grad_fn(cfg, mesh, shard_caps, halo_caps, axis)

    @jax.jit
    def step(state, batch, rng):
        total, losses, grads, ovf = grad_fn(state.params, batch, rng)
        grads_ok = jax.tree_util.tree_reduce(
            lambda a, g: a & jnp.all(jnp.isfinite(g)), grads,
            jnp.bool_(True))
        ok = jnp.isfinite(total) & grads_ok
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        keep = lambda n, o: jnp.where(ok, n, o)   # noqa: E731
        new_params = jax.tree_util.tree_map(keep, new_params,
                                            state.params)
        new_opt = jax.tree_util.tree_map(keep, new_opt, state.opt_state)
        new_state = state.replace(params=new_params, opt_state=new_opt,
                                  step=state.step + 1)
        return new_state, total, losses, ok, ovf

    return step


def make_dp_spatial_grad_fn(cfg: Config, mesh: Mesh, shard_caps,
                            halo_caps, dp_axis: str = "dp",
                            sp_axis: str = "sp"):
    """Loss + exact mean-over-buildings gradient on a 2-D dp x sp mesh.

    Composition of the two parallelism dimensions (SURVEY.md section
    2.7 data parallelism x section 5 spatial scaling): the batch's
    buildings are sharded over ``dp_axis`` (one building per dp group),
    and each building's voxels are spatially sharded over ``sp_axis``
    with halo exchange exactly as in :func:`make_spatial_grad_fn`. The
    reference can express neither (single-GPU IMS_PER_BATCH=1,
    /root/reference/tools/train_net_sparse3d.py:52-57).

    Gradient correctness: each device differentiates its dp group's
    building loss scaled by 1/(n_sp * n_dp); shard_map's varying-axis
    autodiff turns the cotangent of the replicated params into a psum
    over BOTH mesh axes (transpose of the implicit pbroadcast), so the
    per-device gradient is already the exact mean over buildings — n_sp
    identical head copies per group at 1/(n_sp*n_dp) each, summed over
    the n_dp groups. Verified against averaged single-device grads in
    tests/test_spatial.py.

    ``batch`` carries a leading dp axis of size n_dp on every leaf.
    Returns grad_fn(params, batch, rng) -> (total, losses, grads,
    halo_overflow) with batch-mean values (identical on every device).
    """
    from detection_3d_tpu.models.structures import Boxes3D

    n_sp = mesh.shape[sp_axis]
    n_dp = mesh.shape[dp_axis]
    fpn = SparseFPN(cfg, sp_axis=sp_axis)

    def local_loss(params, batch, rng):
        spyr = build_spatial_pyramid(cfg, batch["points"], batch["feats"],
                                     batch["points_valid"], sp_axis, n_sp,
                                     shard_caps, halo_caps)
        table0 = spyr["tables"][0]
        table0 = table0.with_feats(
            table0.feats.astype(jnp.dtype(cfg.compute_dtype)))
        rpn_maps, roi_maps = fpn.apply(
            {"params": params["params"]["backbone"]}, table0, spyr)
        global_rpn, global_roi = _gather_global_maps(cfg, spyr, rpn_maps,
                                                     roi_maps, sp_axis)
        gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])
        losses = _heads_train_loss(cfg, params, global_rpn, global_roi,
                                   gt, batch["gt_labels"], rng)
        total = sum(jax.tree_util.tree_leaves(losses))
        return total / (n_sp * n_dp), (losses, spyr["halo_overflow"])

    def sharded_grad(params, batch, rng):
        sq = jax.tree.map(lambda a: a[0], batch)   # this group's building
        rng = jax.random.fold_in(rng, jax.lax.axis_index(dp_axis))
        (scaled, (losses, ovf)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, sq, rng)
        # grads are already psum'd over dp x sp by the vma transpose;
        # recover the batch-mean loss values explicitly
        total = jax.lax.pmean(scaled * n_sp * n_dp, dp_axis)
        losses = jax.tree.map(lambda l: jax.lax.pmean(l, dp_axis), losses)
        return jax.tree.map(lambda a: jnp.asarray(a)[None],
                            (total, losses, grads, ovf))

    fn = shard_map(sharded_grad, mesh=mesh,
                   in_specs=(P(), P(dp_axis), P()),
                   out_specs=P((dp_axis, sp_axis)))

    def grad_fn(params, batch, rng):
        total, losses, grads, ovf = fn(params, batch, rng)
        return (total[0], jax.tree.map(lambda a: a[0], losses),
                jax.tree.map(lambda a: a[0], grads), jnp.any(ovf))

    return grad_fn


def make_dp_spatial_train_step(cfg: Config, mesh: Mesh, tx, shard_caps,
                               halo_caps, dp_axis: str = "dp",
                               sp_axis: str = "sp"):
    """dp x sp training step (see make_dp_spatial_grad_fn). NaN-gated
    full-state transition like the single-device step
    (engine/trainer.py). ``batch`` leaves carry a leading dp axis.
    """
    import optax

    grad_fn = make_dp_spatial_grad_fn(cfg, mesh, shard_caps, halo_caps,
                                      dp_axis, sp_axis)

    @jax.jit
    def step(state, batch, rng):
        total, losses, grads, ovf = grad_fn(state.params, batch, rng)
        grads_ok = jax.tree_util.tree_reduce(
            lambda a, g: a & jnp.all(jnp.isfinite(g)), grads,
            jnp.bool_(True))
        ok = jnp.isfinite(total) & grads_ok
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        keep = lambda n, o: jnp.where(ok, n, o)   # noqa: E731
        new_params = jax.tree_util.tree_map(keep, new_params,
                                            state.params)
        new_opt = jax.tree_util.tree_map(keep, new_opt, state.opt_state)
        new_state = state.replace(params=new_params, opt_state=new_opt,
                                  step=state.step + 1)
        return new_state, total, losses, ok, ovf

    return step
