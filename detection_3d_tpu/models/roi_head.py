"""ROI box head: level mapping, rotated pooling, MLP head, loss, post-proc.

Parity targets:
  * LevelMapper_3d (poolers_3d.py:57-69): size = sqrt(max(y_size, x_size)),
    rate = size/canonical, level = argmin |spatial_scale - rate|;
  * FPN2MLPFeatureExtractor (roi_box_feature_extractors.py:46-117):
    proposals (meters) x voxel_scale -> pixels, pooled (R,C,6,8,4), conv3d
    kernel [1,1,4] C->512 + BN + ReLU, flatten, fc6+fc7 (512);
  * FPNPredictor (roi_box_predictors.py:33-55): linear cls + 7*C box reg
    (init std 0.01 / 0.001, zero bias);
  * loss (box_head_3d/loss.py:22-237): matcher FG=BG=0.5 without
    low-quality rescue, 512-sample 25% positive, CE + per-class smooth-L1
    (beta=1/5) over positives / total sampled;
  * post-processor (box_head_3d/inference.py:99-149): softmax, per-class
    score threshold + rotated NMS, top detections_per_img by score.
"""

from __future__ import annotations

import math
from typing import List, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from detection_3d_tpu.config.defaults import Config
from detection_3d_tpu.models.matcher import match_boxes, balanced_sample, BETWEEN
from detection_3d_tpu.models.losses import smooth_l1_box_loss, cross_entropy
from detection_3d_tpu.models.structures import Boxes3D
from detection_3d_tpu.ops.box_coder import BoxCoder3D
from detection_3d_tpu.ops.geometry import yx_zb_to_standard
from detection_3d_tpu.ops.rotated_iou import boxes_iou_3d
from detection_3d_tpu.ops.nms import nms_boxes as nms_boxes_fn
from detection_3d_tpu.ops.norm import batch_norm_leaky_relu
from detection_3d_tpu.ops.roi_align import roi_align_rotated_sparse
from detection_3d_tpu.ops.sparse import SparseTensor


def map_levels(cfg: Config, boxes):
    """(R,) level index per roi (LevelMapper_3d, poolers_3d.py:57-69)."""
    scales = jnp.asarray(cfg.roi_spatial_scales())
    size = jnp.sqrt(jnp.maximum(boxes[:, 3], boxes[:, 4]))
    rate = size / cfg.roi.canonical_size
    dif = jnp.abs(scales[None, :] - rate[:, None])
    return jnp.argmin(dif, axis=1)


def merge_roi_levels(cfg: Config, roi_maps: Sequence[SparseTensor]):
    """Stack all FPN roi levels into ONE sparse table whose batch axis is
    the level index. One roi_align pass over the merged table replaces
    one full pass per level (each roi belongs to exactly one level, so
    the per-level passes wasted (L-1)/L of their lookups/gathers on rois
    whose result was then masked to zero)."""
    from detection_3d_tpu.ops.sparse import build_sparse_tensor

    L = len(roi_maps)
    if L == 1:
        return roi_maps[0]
    X = max(t.spatial_size[0] for t in roi_maps)
    Y = max(t.spatial_size[1] for t in roi_maps)
    Z = max(t.spatial_size[2] for t in roi_maps)
    coords = jnp.concatenate(
        [t.coords.at[:, 3].set(li) for li, t in enumerate(roi_maps)])
    feats = jnp.concatenate([t.feats for t in roi_maps])
    valid = jnp.concatenate([t.row_valid for t in roi_maps])
    cap = sum(t.capacity for t in roi_maps)
    merged = build_sparse_tensor(coords, feats, valid, (X, Y, Z), L, cap,
                                 reduce="sum")
    return merged.with_dense_grid(cfg.caps.dense_grid_max_entries)


def pool_rois(cfg: Config, roi_maps: Sequence[SparseTensor],
              proposals: Boxes3D, merged: SparseTensor = None):
    """(R, os0, os1, os2, C) pooled features across FPN levels.

    Proposals are yx_zb in meters; each roi pools at ITS assigned
    level's voxel scale (x voxel_scale x spatial_scale) in one merged
    multi-level pass (level = batch coordinate; see merge_roi_levels —
    the reference instead densifies each level and masks per level,
    poolers_3d.py:126-168).
    """
    os = cfg.roi.pooler_resolution
    sr = cfg.roi.pooler_sampling_ratio
    levels = map_levels(cfg, proposals.boxes)
    std = yx_zb_to_standard(proposals.boxes)  # [xc,yc,zc,xs,ys,zs,yaw]
    vs = float(cfg.sparse3d.voxel_scale)
    if merged is None:
        merged = merge_roi_levels(cfg, roi_maps)

    factors = vs * jnp.asarray(cfg.roi_spatial_scales(),
                               std.dtype)            # (L,)
    f = factors[levels][:, None]                     # (R, 1) per-roi
    rois = jnp.concatenate([std[:, :6] * f, std[:, 6:7]], axis=-1)
    roi_batch = levels if len(roi_maps) > 1 else None
    return roi_align_rotated_sparse(merged, rois, proposals.valid, os,
                                    sr, roi_batch=roi_batch)


class ROIBoxFeatureExtractor(nn.Module):
    """conv3d [1,1,z] + BN + ReLU -> fc6 -> fc7 (both 512, ReLU)."""
    cfg: Config

    @nn.compact
    def __call__(self, pooled, roi_valid):
        cfg = self.cfg
        r = pooled.shape[0]
        os0, os1, os2, c = pooled.shape[1:]
        rep = cfg.roi.mlp_head_dim

        # conv3d kernel [1,1,os2]: fold z into channels -> one matmul
        w = self.param("conv3d_w", nn.initializers.he_normal(),
                       (os2 * c, rep))
        b = self.param("conv3d_b", nn.initializers.zeros, (rep,))
        dt = pooled.dtype
        h = pooled.reshape(r, os0, os1, os2 * c) @ w.astype(dt) \
            + b.astype(dt)

        # BatchNorm3d over (R, os0, os1) per channel + ReLU
        scale = self.param("bn_scale", nn.initializers.ones, (rep,))
        bias = self.param("bn_bias", nn.initializers.zeros, (rep,))
        flat = h.reshape(r * os0 * os1, rep)
        vmask = jnp.repeat(roi_valid, os0 * os1)
        flat = batch_norm_leaky_relu(flat, vmask, scale, bias, leakiness=0.0)
        h = flat.reshape(r, os0 * os1 * rep)

        w6 = self.param("fc6_w", nn.initializers.kaiming_uniform(),
                        (os0 * os1 * rep, rep))
        b6 = self.param("fc6_b", nn.initializers.zeros, (rep,))
        w7 = self.param("fc7_w", nn.initializers.kaiming_uniform(),
                        (rep, rep))
        b7 = self.param("fc7_b", nn.initializers.zeros, (rep,))
        h = jax.nn.relu(h @ w6.astype(dt) + b6.astype(dt))
        h = jax.nn.relu(h @ w7.astype(dt) + b7.astype(dt))
        return jnp.where(roi_valid[:, None], h, 0.0)


class ROIPredictor(nn.Module):
    """FPNPredictor: cls + per-class box regression."""
    cfg: Config

    @nn.compact
    def __call__(self, x):
        nc = self.cfg.num_classes + len(self.cfg.separate_classes)
        wc = self.param("cls_w",
                        lambda k, s: jax.random.normal(k, s) * 0.01,
                        (x.shape[-1], nc))
        bc = self.param("cls_b", nn.initializers.zeros, (nc,))
        wb = self.param("box_w",
                        lambda k, s: jax.random.normal(k, s) * 0.001,
                        (x.shape[-1], nc * 7))
        bb = self.param("box_b", nn.initializers.zeros, (nc * 7,))
        dt = x.dtype
        cls = (x @ wc.astype(dt) + bc.astype(dt)).astype(jnp.float32)
        box = (x @ wb.astype(dt) + bb.astype(dt)).astype(jnp.float32)
        return cls, box


def roi_targets(cfg: Config, proposals: Boxes3D, gt: Boxes3D, gt_labels):
    """Per-proposal class label (0 bg, -1 ignore) + regression target
    (box_head_3d/loss.py:47-118)."""
    aug = {"target_Y": cfg.roi.label_aug_thickness_y_tar_anc[0],
           "anchor_Y": cfg.roi.label_aug_thickness_y_tar_anc[1],
           "target_Z": cfg.roi.label_aug_thickness_z_tar_anc[0],
           "anchor_Z": cfg.roi.label_aug_thickness_z_tar_anc[1]}
    quality = boxes_iou_3d(gt.boxes, proposals.boxes, aug_thickness=aug,
                           criterion=-1)
    matches = match_boxes(quality, gt.valid, proposals.valid,
                          high=cfg.roi.fg_iou_threshold,
                          low=cfg.roi.bg_iou_threshold,
                          allow_low_quality=False)
    safe = jnp.clip(matches, 0)
    labels = gt_labels[safe].astype(jnp.int32)
    labels = jnp.where(matches == -1, 0, labels)
    labels = jnp.where(matches == BETWEEN, -1, labels)
    labels = jnp.where(proposals.valid, labels, -1)

    coder = BoxCoder3D(weights=cfg.roi.bbox_reg_weights)
    reg_targets = coder.encode(gt.boxes[safe], proposals.boxes)
    return labels, reg_targets


def subsample_proposals(cfg: Config, rng, proposals: Boxes3D, gt: Boxes3D,
                        gt_labels):
    """Balanced 512-sample; returns gathered static-size proposal set with
    fields labels + regression_targets (loss.py:121-166)."""
    labels, reg_targets = roi_targets(cfg, proposals, gt, gt_labels)
    pos_mask, neg_mask = balanced_sample(
        labels, rng, cfg.roi_batch_size_per_image, cfg.roi.positive_fraction)
    sampled = pos_mask | neg_mask

    pri = jnp.where(sampled, 1.0, 0.0) + \
        jax.random.uniform(rng, sampled.shape) * 0.5
    _, idx = jax.lax.top_k(pri, cfg.roi_batch_size_per_image)
    out = Boxes3D(proposals.boxes, proposals.valid & sampled,
                  {"labels": labels, "regression_targets": reg_targets,
                   "is_gt": proposals.fields.get(
                       "is_gt", jnp.zeros_like(labels, jnp.float32))})
    return out.gather(idx)


def roi_loss(cfg: Config, sampled: Boxes3D, class_logits, box_regression):
    """CE + per-class smooth-L1 (loss.py:196-237)."""
    labels = sampled.fields["labels"]
    reg_targets = sampled.fields["regression_targets"]
    valid = sampled.valid & (labels >= 0)

    cls_loss = cross_entropy(class_logits, labels, valid)

    pos = valid & (labels > 0)
    nc7 = box_regression.shape[-1]
    reg = box_regression.reshape(-1, nc7 // 7, 7)
    reg_pos = jnp.take_along_axis(
        reg, jnp.clip(labels, 0)[:, None, None].astype(jnp.int32), axis=1
    )[:, 0]
    n_sampled = jnp.maximum(jnp.sum(valid.astype(jnp.float32)), 1.0)
    box_l = smooth_l1_box_loss(reg_pos, reg_targets, sampled.boxes, pos,
                               beta=1.0 / 5,
                               yaw_loss_mode=cfg.rpn.yaw_loss_mode) / n_sampled
    return cls_loss, box_l


def postprocess(cfg: Config, proposals: Boxes3D, class_logits,
                box_regression, num_classes: int, detections_cap: int):
    """Per-class score threshold -> per-class rotated NMS -> global top-K
    (inference.py:99-149). Static output: (detections_cap,) rows.

    Returns Boxes3D with fields scores, labels.
    """
    probs = jax.nn.softmax(class_logits, axis=-1)
    coder = BoxCoder3D(weights=cfg.roi.bbox_reg_weights)
    decoded = coder.decode(box_regression, proposals.boxes)  # (R, C*7)
    r = decoded.shape[0]
    dec = decoded.reshape(r, num_classes, 7)

    ay, az = cfg.roi.nms_aug_thickness_y_z
    post_cap = min(cfg.roi.nms_post_cap, r)  # roi_post max_proposals=-1
    # -> cap 500 by default (boxlist_ops_3d.py:38-39); see Config.validate

    def per_class(boxes_j, scores_j):
        valid_j = proposals.valid & (scores_j > cfg.roi.score_thresh)
        nms_boxes = boxes_j.at[:, 3:5].set(jnp.maximum(boxes_j[:, 3:5], ay))
        nms_boxes = nms_boxes.at[:, 5].set(jnp.maximum(nms_boxes[:, 5], az))
        keep_idx, _ = nms_boxes_fn(nms_boxes, scores_j, valid_j,
                                   cfg.roi.nms, post_cap)
        kept = Boxes3D(boxes_j, valid_j,
                       {"scores": scores_j}).gather(keep_idx)
        return kept.boxes, kept.fields["scores"], kept.valid

    # vmap over foreground classes: one compiled NMS instead of C-1 copies
    fg_boxes = jnp.swapaxes(dec[:, 1:], 0, 1)       # (C-1, R, 7)
    fg_scores = jnp.swapaxes(probs[:, 1:], 0, 1)    # (C-1, R)
    b_c, s_c, v_c = jax.vmap(per_class)(fg_boxes, fg_scores)
    l_c = jnp.broadcast_to(
        jnp.arange(1, num_classes, dtype=jnp.int32)[:, None],
        v_c.shape)

    boxes = b_c.reshape(-1, 7)
    scores = s_c.reshape(-1)
    labels = l_c.reshape(-1)
    valid = v_c.reshape(-1)

    # global top-K by score over all classes
    pri = jnp.where(valid, scores, -1.0)
    top_scores, idx = jax.lax.top_k(pri, min(detections_cap, pri.shape[0]))
    return Boxes3D(boxes[idx], valid[idx] & (top_scores >= 0),
                   {"scores": scores[idx], "labels": labels[idx]})


class ROIBoxHead(nn.Module):
    """Feature extractor + predictor for one forward."""
    cfg: Config

    @nn.compact
    def __call__(self, roi_maps, proposals: Boxes3D):
        pooled = pool_rois(self.cfg, roi_maps, proposals)
        x = ROIBoxFeatureExtractor(self.cfg, name="extractor")(
            pooled, proposals.valid)
        return ROIPredictor(self.cfg, name="predictor")(x)
