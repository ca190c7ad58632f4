"""SparseRCNN meta-architecture: voxelize -> backbone -> RPN -> ROI.

Parity with the reference meta-arch
(/root/reference/maskrcnn_benchmark/modeling/detector/sparse_rcnn.py:18-77)
with the TPU-native single-example design: one building per invocation,
batching via vmap/shard_map outside. Train returns (losses, result);
eval returns detections.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from detection_3d_tpu.config.defaults import Config
from detection_3d_tpu.models.backbone import SparseFPN, build_pyramid
from detection_3d_tpu.models.rpn import RPN
from detection_3d_tpu.models.roi_head import (
    ROIBoxHead, subsample_proposals, roi_loss, postprocess,
)
from detection_3d_tpu.models.separate_classifier import (
    separate_targets, merge_group_detections, slice_group_logits,
    grouped_class_ids,
)
from detection_3d_tpu.models.structures import Boxes3D
from detection_3d_tpu.ops.sparse import SparseTensor, build_sparse_tensor


def voxelize_points(cfg: Config, points_xyz, feats, valid,
                    capacity: int = None) -> SparseTensor:
    """Continuous scaled coords -> deduplicated voxel table.

    The dataset already scales xyz by voxel_scale and shifts min to 0
    (suncg_dataset.py:115-137); here we floor to int voxels and
    dedup-average (InputLayer mode=4 semantics). ``capacity`` overrides
    the configured scale-0 table size (spatial shards use a fraction).
    """
    coords = jnp.floor(points_xyz).astype(jnp.int32)
    coords4 = jnp.concatenate(
        [coords, jnp.zeros((coords.shape[0], 1), jnp.int32)], axis=-1)
    if capacity is None:
        capacity = cfg.caps.scale_caps(cfg.sparse3d.num_scales)[0]
    return build_sparse_tensor(coords4, feats, valid,
                               cfg.sparse3d.voxel_full_scale, 1, capacity)


class SparseRCNN(nn.Module):
    """Flax module holding backbone + RPN + ROI head params."""
    cfg: Config

    @nn.compact
    def __call__(self, table: SparseTensor, gt: Optional[Boxes3D] = None,
                 gt_labels=None, *, is_train: bool, rng=None,
                 pyramid=None):
        cfg = self.cfg
        # feature compute runs in bf16 on the MXU; geometry, losses and
        # box math stay f32 (heads cast their outputs back)
        table = table.with_feats(
            table.feats.astype(jnp.dtype(cfg.compute_dtype)))
        # pyramid metadata may arrive precomputed from the host loader
        # (data/pyramid_packing.unpack_pyramid) — the inference fast path
        if pyramid is None:
            pyramid = build_pyramid(table, cfg)
        rpn_maps, roi_maps = SparseFPN(cfg, name="backbone")(table, pyramid)

        # group-wise gt (single group passes through unchanged)
        if gt is not None and cfg.separate_classes:
            gt_groups = separate_targets(cfg, gt, gt_labels)
        elif gt is not None:
            gt_groups = [(gt, gt_labels)]
        else:
            gt_groups = None

        rpn_gt = None if gt_groups is None else [g for g, _ in gt_groups]
        proposals_g, rpn_losses = RPN(cfg, name="rpn")(
            rpn_maps, rpn_gt, is_train=is_train, rng=rng)
        proposals_g = [p.clamp_size() for p in proposals_g]

        g = len(proposals_g)
        losses: Dict[str, jnp.ndarray] = dict(rpn_losses)
        results = []
        nc_total = cfg.num_classes + len(cfg.separate_classes)

        if cfg.rpn_only:
            # RPN-only models have no roi_heads (sparse_rcnn.py:64-68);
            # proposals ARE the final output, returned in high-to-low
            # confidence order with class-agnostic foreground labels
            # (rpn_sparse3d.py:294-305).
            if is_train:
                return losses, proposals_g
            dets = []
            for p in proposals_g:
                score = jnp.where(p.valid, p.fields["objectness"], -jnp.inf)
                order = jnp.argsort(-score)
                p = p.gather(order)
                dets.append(p.with_fields(
                    scores=p.fields["objectness"],
                    labels=jnp.ones((p.capacity,), jnp.int32)))
            if g == 1:
                return dets[0]
            return merge_group_detections(cfg, dets)

        roi_head = ROIBoxHead(cfg, name="roi_head")
        for gi, proposals in enumerate(proposals_g):
            if is_train and gt_groups is not None:
                gt_gi, labels_gi = gt_groups[gi]
                key = jax.random.fold_in(rng, 1000 + gi)
                sampled = subsample_proposals(cfg, key, proposals, gt_gi,
                                              labels_gi)
                cls_logits, box_reg = roi_head(roi_maps, sampled)
                if g > 1:
                    cls_logits, box_reg = slice_group_logits(
                        cfg, cls_logits, box_reg, gi)
                cl, bl = roi_loss(cfg, sampled, cls_logits, box_reg)
                if g == 1:
                    losses["loss_classifier_roi"] = cl
                    losses["loss_box_reg_roi"] = bl
                else:
                    losses[f"loss_classifier_roi_{gi}"] = cl
                    losses[f"loss_box_reg_roi_{gi}"] = bl
                if cfg.eval_in_train:
                    # postprocess the NON-GT sampled rows into train-time
                    # predictions (box_head.py:118-127 removes the
                    # gt-added proposals first — here: mask them invalid)
                    nogt = Boxes3D(
                        sampled.boxes,
                        sampled.valid & (sampled.fields["is_gt"] < 0.5),
                        sampled.fields)
                    nc_g = (len(grouped_class_ids(cfg)[gi]) if g > 1
                            else nc_total)
                    results.append(postprocess(
                        cfg, nogt, cls_logits, box_reg, nc_g,
                        cfg.roi_detections_per_img))
            else:
                cls_logits, box_reg = roi_head(roi_maps, proposals)
                if g > 1:
                    cls_logits, box_reg = slice_group_logits(
                        cfg, cls_logits, box_reg, gi)
                    nc_g = len(grouped_class_ids(cfg)[gi])
                else:
                    nc_g = nc_total
                det = postprocess(cfg, proposals, cls_logits, box_reg,
                                  nc_g, cfg.roi_detections_per_img)
                results.append(det)

        if is_train:
            if cfg.eval_in_train and results:
                merged = (results[0] if g == 1
                          else merge_group_detections(cfg, results))
                return losses, merged
            return losses, results
        if g == 1:
            return results[0]
        return merge_group_detections(cfg, results)
