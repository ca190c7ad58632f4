"""RPN: head convs, target assignment, loss, in-graph proposal selection.

Parity with the reference RPN stack, re-designed static-shape:
  * head (rpn_sparse3d.py:80-131): shared 1x1 conv + ReLU, then 1x1 cls
    (A*G logits) and 1x1 box (A*7*G) heads over active rows — on TPU these
    are per-row matmuls on the (V, C) feature matrix;
  * target assignment (loss_3d.py:88-160): IoU3D criterion=2 with
    rpn_label_generation thickness augmentation + |yaw| gate + matcher;
  * loss (loss_3d.py:200-250): 256-sample balanced BCE + smooth-L1
    (beta=1/9) over positives, divided by total sampled;
  * proposal selection (rpn/inference_3d.py:82-163): sigmoid -> static
    top-k (pre_nms) -> decode -> rotated NMS -> top post_nms [+ gt boxes
    in training, inference_3d.py:53-80].
"""

from __future__ import annotations

import math
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from detection_3d_tpu.config.defaults import Config
from detection_3d_tpu.models.anchors import generate_anchors
from detection_3d_tpu.models.matcher import match_boxes, balanced_sample, BETWEEN
from detection_3d_tpu.models.losses import smooth_l1_box_loss, bce_with_logits
from detection_3d_tpu.models.structures import Boxes3D, concat_boxes
from detection_3d_tpu.ops.box_coder import BoxCoder3D
from detection_3d_tpu.ops.geometry import limit_period
from detection_3d_tpu.ops.rotated_iou import boxes_iou_3d
from detection_3d_tpu.ops.nms import nms_boxes
from detection_3d_tpu.ops.sparse import SparseTensor


def _normal_init(std):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.normal(key, shape, dtype) * std
    return init


class RPNHead(nn.Module):
    """SingleConvRPNHead_Sparse3D: weights shared across levels
    (rpn_sparse3d.py:97-107, init std=0.01, zero bias)."""
    cfg: Config

    @nn.compact
    def __call__(self, feats_per_level: Sequence[jnp.ndarray]):
        cfg = self.cfg
        a = cfg.rpn.num_anchors_per_location
        g = cfg.group_num if cfg.separate_rpn else 1
        c = feats_per_level[0].shape[-1]
        w0 = self.param("conv_w", _normal_init(0.01), (c, c))
        b0 = self.param("conv_b", nn.initializers.zeros, (c,))
        wc = self.param("cls_w", _normal_init(0.01), (c, a * g))
        bc = self.param("cls_b", nn.initializers.zeros, (a * g,))
        wb = self.param("box_w", _normal_init(0.01), (c, a * 7 * g))
        bb = self.param("box_b", nn.initializers.zeros, (a * 7 * g,))

        logits, regs = [], []
        for f in feats_per_level:
            dt = f.dtype
            t = jax.nn.relu(f @ w0.astype(dt) + b0.astype(dt))
            lg = (t @ wc.astype(dt) + bc.astype(dt)).reshape(-1, a, g)
            rg = (t @ wb.astype(dt) + bb.astype(dt)).reshape(-1, a, 7 * g)
            # box/score math downstream is f32
            logits.append(lg.reshape(-1, g).astype(jnp.float32))
            regs.append(rg.reshape(-1, 7 * g).astype(jnp.float32))
        return jnp.concatenate(logits, 0), jnp.concatenate(regs, 0)


def rpn_targets(cfg: Config, anchors: Boxes3D, gt: Boxes3D):
    """Per-anchor label (1/0/-1) + regression target (loss_3d.py:88-198)."""
    aug = {"target_Y": cfg.rpn.label_aug_thickness_y_tar_anc[0],
           "anchor_Y": cfg.rpn.label_aug_thickness_y_tar_anc[1],
           "target_Z": cfg.rpn.label_aug_thickness_z_tar_anc[0],
           "anchor_Z": cfg.rpn.label_aug_thickness_z_tar_anc[1]}
    quality = boxes_iou_3d(gt.boxes, anchors.boxes, aug_thickness=aug,
                           criterion=2)
    # yaw_diff wrapped into [-pi/2, pi/2) (geometric_torch.py:12-21)
    ydif = limit_period(
        gt.boxes[:, 6][:, None] - anchors.boxes[:, 6][None, :], 0.5, math.pi)
    matches = match_boxes(
        quality, gt.valid, anchors.valid,
        high=cfg.rpn.fg_iou_threshold, low=cfg.rpn.bg_iou_threshold,
        allow_low_quality=True, yaw_diff=ydif,
        yaw_threshold=cfg.rpn.yaw_threshold)

    labels = jnp.where(matches >= 0, 1.0, 0.0)
    labels = jnp.where(matches == BETWEEN, -1.0, labels)
    labels = jnp.where(anchors.valid, labels, -1.0)

    coder = BoxCoder3D()
    matched_gt = gt.boxes[jnp.clip(matches, 0)]
    reg_targets = coder.encode(matched_gt, anchors.boxes)
    return labels, reg_targets, matches


def rpn_loss(cfg: Config, rng, anchors: Boxes3D, objectness, box_reg, gt):
    """(loss_objectness, loss_rpn_box_reg) — loss_3d.py:200-250."""
    labels, reg_targets, _ = rpn_targets(cfg, anchors, gt)
    pos_mask, neg_mask = balanced_sample(
        labels, rng, cfg.rpn.batch_size_per_image, cfg.rpn.positive_fraction)
    sampled = pos_mask | neg_mask
    n_sampled = jnp.maximum(jnp.sum(sampled.astype(jnp.float32)), 1.0)

    box_l = smooth_l1_box_loss(box_reg, reg_targets, anchors.boxes, pos_mask,
                               beta=1.0 / 9,
                               yaw_loss_mode=cfg.rpn.yaw_loss_mode) / n_sampled
    obj_l = bce_with_logits(objectness, labels, sampled)
    return obj_l, box_l


def select_proposals(cfg: Config, anchors: Boxes3D, objectness, box_reg,
                     is_train: bool, gt: Boxes3D = None):
    """Top-k -> decode -> rotated NMS -> top-N [+ gt] (inference_3d.py:82-163).

    Returns Boxes3D with fields objectness, is_gt.
    """
    pre_n = (cfg.rpn_pre_nms_top_n_train if is_train
             else cfg.rpn_pre_nms_top_n_test)
    post_n = (cfg.rpn_post_nms_top_n_train if is_train
              else cfg.rpn_post_nms_top_n_test)

    # proposals are constants for the ROI stage — the reference selects
    # them under torch.no_grad() (rpn_sparse3d.py:256-262); without this,
    # gradients flow through NMS polygon math (sqrt at 0 on duplicate
    # boxes => NaN) and through ROI-align sample coordinates
    objectness = jax.lax.stop_gradient(objectness)
    box_reg = jax.lax.stop_gradient(box_reg)

    score = jax.nn.sigmoid(objectness)
    score = jnp.where(anchors.valid, score, -1.0)
    pre_n = min(pre_n, score.shape[0])
    top_score, top_idx = jax.lax.top_k(score, pre_n)
    top_valid = top_score >= 0.0

    coder = BoxCoder3D()
    dec = coder.decode(box_reg[top_idx], anchors.boxes[top_idx])

    # NMS with thickness augmentation on y/x sizes and z
    # (boxlist_ops_3d.py:42-44 clamps cols 3:5 by [0] and col 5 by [1])
    ay, az = cfg.rpn.nms_aug_thickness_y_z
    nms_boxes = dec.at[:, 3:5].set(jnp.maximum(dec[:, 3:5], ay))
    nms_boxes = nms_boxes.at[:, 5].set(jnp.maximum(nms_boxes[:, 5], az))
    keep_idx, _ = _nms(nms_boxes, top_score, top_valid, cfg.rpn.nms_thresh,
                       post_n)
    kept = Boxes3D(dec, top_valid, {"objectness": top_score}).gather(keep_idx)
    kept = kept.with_fields(
        is_gt=jnp.zeros((kept.capacity,), jnp.float32))

    if is_train and cfg.rpn.add_gt_proposals and gt is not None:
        gt_part = Boxes3D(gt.boxes, gt.valid, {
            "objectness": jnp.ones((gt.capacity,), jnp.float32),
            "is_gt": jnp.ones((gt.capacity,), jnp.float32)})
        kept = concat_boxes(kept, gt_part, fields=("objectness", "is_gt"))
    return kept


def _nms(boxes, scores, valid, thresh, post_n):
    return nms_boxes(boxes, scores, valid, thresh, post_n)


class RPN(nn.Module):
    """Full RPN module for one example (single group; separate-classifier
    grouping wraps this at the detector level)."""
    cfg: Config

    @nn.compact
    def __call__(self, rpn_maps: List[SparseTensor], gt: Boxes3D = None,
                 *, is_train: bool, rng=None):
        cfg = self.cfg
        feats = [m.feats for m in rpn_maps]
        objectness, box_reg = RPNHead(cfg, name="head")(feats)
        anchors = generate_anchors(cfg, rpn_maps)

        g = cfg.group_num if cfg.separate_rpn else 1
        # per-group gt: single group gets the raw gt; separate-classifier
        # groups receive a list from the detector
        # (seperate_classifier.py:59-95 slices objectness[:, gi] and
        # box_reg[:, gi*7:(gi+1)*7])
        gt_groups = gt if isinstance(gt, (list, tuple)) else [gt] * g

        proposals_g, losses = [], {}
        for gi in range(g):
            obj = objectness[:, gi]
            reg = box_reg[:, gi * 7:(gi + 1) * 7]
            gt_gi = gt_groups[gi]
            proposals_g.append(
                select_proposals(cfg, anchors, obj, reg, is_train, gt_gi))
            if is_train and gt_gi is not None:
                key = jax.random.fold_in(rng, gi)
                lo, lb = rpn_loss(cfg, key, anchors, obj, reg, gt_gi)
                if g == 1:
                    losses = {"loss_objectness": lo, "loss_rpn_box_reg": lb}
                else:
                    losses[f"loss_objectness_{gi}"] = lo
                    losses[f"loss_rpn_box_reg_{gi}"] = lb
        return proposals_g, losses
