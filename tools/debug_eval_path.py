#!/usr/bin/env python
"""Load the overfit checkpoint and dissect the eval path stage by stage."""

import os
import sys
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from detection_3d_tpu.data.synthetic import synthetic_building
    from detection_3d_tpu.engine.trainer import Trainer, pad_scene
    from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
    from detection_3d_tpu.models.structures import Boxes3D
    from detection_3d_tpu.models.rpn import RPN
    from detection_3d_tpu.models.roi_head import ROIBoxHead, map_levels
    from detection_3d_tpu.models.backbone import SparseFPN, build_pyramid
    from detection_3d_tpu.ops.rotated_iou import boxes_iou_3d
    from detection_3d_tpu.utils.checkpoint import Checkpointer
    from tools.overfit_check import main as overfit_main  # noqa

    # same cfg as overfit_check
    from detection_3d_tpu.config import Config, Sparse3DConfig, CapacityConfig
    from detection_3d_tpu.config.defaults import (RPNConfig, ROIConfig,
                                                  SolverConfig)
    cfg = Config(
        classes=("background", "wall", "door", "window"),
        sparse3d=Sparse3DConfig(
            voxel_scale=25, voxel_full_scale=(512, 512, 128),
            nplanes_front=(16, 32, 32, 64, 64),
            kernels=((2, 2, 2),) * 4, strides=((2, 2, 2),) * 4,
            nplane_map=32),
        rpn=RPNConfig(
            rpn_scales_from_top=(3, 2), rpn_3d_2d_selector=(0, 1, 2),
            anchor_sizes_3d=((0.2, 0.9, 2.7), (0.4, 1.5, 2.7),
                             (0.8, 2.5, 2.7)),
            use_yaws=(1, 1, 1),
            fpn_pre_nms_top_n_train=512, fpn_pre_nms_top_n_test=512,
            fpn_post_nms_top_n_train=128, fpn_post_nms_top_n_test=128,
            batch_size_per_image=128),
        roi=ROIConfig(pooler_scales_from_top=(3, 2),
                      batch_size_per_image=128, detections_per_img=32,
                      mlp_head_dim=128),
        backbone_out_channels=32,
        solver=SolverConfig(base_lr=0.005, warmup_epochs=10,
                            lr_step_epochs=(10000,), epochs=1),
        caps=CapacityConfig(max_points=30_000,
                            voxel_caps=(32768, 16384, 8192, 4096, 2048),
                            max_gt=16),
        output_dir="/tmp/overfit_check")

    scene = synthetic_building(seed=0, num_points=25_000, room=6.0,
                               classes=cfg.classes,
                               voxel_scale=cfg.sparse3d.voxel_scale)
    batch = {k: jnp.asarray(v) for k, v in pad_scene(cfg, scene).items()}
    gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])

    model = SparseRCNN(cfg)
    table = voxelize_points(cfg, batch["points"], batch["feats"],
                            batch["points_valid"])
    params0 = jax.jit(functools.partial(model.init, is_train=False))(
        jax.random.PRNGKey(0), table)
    ck = Checkpointer("/tmp/overfit_check")
    state = ck.load({"params": params0, "opt_state": None, "step": 0})
    params = state["params"]
    print("loaded step:", state["step"])

    @jax.jit
    def stages(params, batch):
        table = voxelize_points(cfg, batch["points"], batch["feats"],
                                batch["points_valid"])
        table = table.with_feats(table.feats.astype(jnp.bfloat16))
        pyr = build_pyramid(table, cfg)
        bb = SparseFPN(cfg, name="backbone")
        rpn_maps, roi_maps = bb.apply(
            {"params": params["params"]["backbone"]}, table, pyr)
        rpn = RPN(cfg, name="rpn")
        props_g, _ = rpn.apply({"params": params["params"]["rpn"]},
                               rpn_maps, None, is_train=False, rng=None)
        props = props_g[0].clamp_size()
        head = ROIBoxHead(cfg, name="roi_head")
        cls_logits, box_reg = head.apply(
            {"params": params["params"]["roi_head"]}, roi_maps, props)
        gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])
        iou = boxes_iou_3d(gt.boxes, props.boxes, criterion=-1)
        iou = jnp.where(gt.valid[:, None] & props.valid[None, :], iou, 0)
        probs = jax.nn.softmax(cls_logits, axis=-1)
        lv = map_levels(cfg, props.boxes)
        return (props.boxes, props.valid, props.fields["objectness"],
                iou, probs, lv)

    pb, pv, pobj, iou, probs, levels = stages(params, batch)
    pv = np.asarray(pv)
    print("valid proposals:", pv.sum())
    print("objectness top10:", np.round(np.asarray(pobj)[:10], 3))
    print("best prop IoU per gt:",
          np.round(np.asarray(iou).max(1)[:12], 3))
    probs = np.asarray(probs)
    print("mean probs over valid props:",
          np.round(probs[pv].mean(0), 3))
    print("max fg prob:", np.round(probs[pv][:, 1:].max(), 4))
    print("level counts:", np.bincount(np.asarray(levels)[pv]))
    # which proposals have fg prob > 0.05
    fg = probs[:, 1:].max(1)
    n_above = int(((fg > 0.05) & pv).sum())
    print("props with fg prob > 0.05:", n_above)


if __name__ == "__main__":
    main()


def pos_anchor_check():
    """Decode the trained regression at the POSITIVE anchors directly."""
    import functools
    from detection_3d_tpu.data.synthetic import synthetic_building
    from detection_3d_tpu.engine.trainer import pad_scene
    from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
    from detection_3d_tpu.models.structures import Boxes3D
    from detection_3d_tpu.models.rpn import rpn_targets, RPNHead
    from detection_3d_tpu.models.anchors import generate_anchors
    from detection_3d_tpu.models.backbone import SparseFPN, build_pyramid
    from detection_3d_tpu.ops.box_coder import BoxCoder3D
    from detection_3d_tpu.ops.rotated_iou import boxes_iou_3d
    from detection_3d_tpu.utils.checkpoint import Checkpointer
    from detection_3d_tpu.config import Config, Sparse3DConfig, CapacityConfig
    from detection_3d_tpu.config.defaults import RPNConfig, ROIConfig, SolverConfig

    cfg = Config(
        classes=("background", "wall", "door", "window"),
        sparse3d=Sparse3DConfig(
            voxel_scale=25, voxel_full_scale=(512, 512, 128),
            nplanes_front=(16, 32, 32, 64, 64),
            kernels=((2, 2, 2),) * 4, strides=((2, 2, 2),) * 4,
            nplane_map=32),
        rpn=RPNConfig(
            rpn_scales_from_top=(3, 2), rpn_3d_2d_selector=(0, 1, 2),
            anchor_sizes_3d=((0.2, 0.9, 2.7), (0.4, 1.5, 2.7),
                             (0.8, 2.5, 2.7)),
            use_yaws=(1, 1, 1),
            fpn_pre_nms_top_n_train=512, fpn_pre_nms_top_n_test=512,
            fpn_post_nms_top_n_train=128, fpn_post_nms_top_n_test=128,
            batch_size_per_image=128),
        roi=ROIConfig(pooler_scales_from_top=(3, 2),
                      batch_size_per_image=128, detections_per_img=32,
                      mlp_head_dim=128),
        backbone_out_channels=32,
        caps=CapacityConfig(max_points=30_000,
                            voxel_caps=(32768, 16384, 8192, 4096, 2048),
                            max_gt=16),
        output_dir="/tmp/overfit_check")

    scene = synthetic_building(seed=0, num_points=25_000, room=6.0,
                               classes=cfg.classes,
                               voxel_scale=cfg.sparse3d.voxel_scale)
    batch = {k: jnp.asarray(v) for k, v in pad_scene(cfg, scene).items()}
    model = SparseRCNN(cfg)
    table = voxelize_points(cfg, batch["points"], batch["feats"],
                            batch["points_valid"])
    params0 = jax.jit(functools.partial(model.init, is_train=False))(
        jax.random.PRNGKey(0), table)
    ck = Checkpointer("/tmp/overfit_check")
    params = ck.load({"params": params0, "opt_state": None, "step": 0})["params"]

    @jax.jit
    def run(params, batch):
        table = voxelize_points(cfg, batch["points"], batch["feats"],
                                batch["points_valid"])
        table = table.with_feats(table.feats.astype(jnp.bfloat16))
        pyr = build_pyramid(table, cfg)
        bb = SparseFPN(cfg, name="backbone")
        rpn_maps, _ = bb.apply({"params": params["params"]["backbone"]},
                               table, pyr)
        anchors = generate_anchors(cfg, rpn_maps)
        head = RPNHead(cfg, name="head")
        obj, reg = head.apply({"params": params["params"]["rpn"]["head"]},
                              [m.feats for m in rpn_maps])
        gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])
        labels, regt, matches = rpn_targets(cfg, anchors, gt)
        pos = labels == 1
        # top-32 positive rows
        pri = jnp.where(pos, 1.0, 0.0)
        _, idx = jax.lax.top_k(pri, 32)
        coder = BoxCoder3D()
        dec = coder.decode(reg[idx], anchors.boxes[idx])
        matched_gt = gt.boxes[jnp.clip(matches[idx], 0)]
        iou = boxes_iou_3d(matched_gt, dec, criterion=-1)
        return (jnp.sum(pos), dec, matched_gt, jnp.diagonal(iou),
                jax.nn.sigmoid(obj[idx, 0]), pos[idx])

    npos, dec, mgt, dious, pobj, posmask = run(params, batch)
    print("num pos anchors:", int(npos))
    pm = np.asarray(posmask)
    print("pos anchor objectness:", np.round(np.asarray(pobj)[pm], 3))
    print("decoded-vs-matched-gt IoU:", np.round(np.asarray(dious)[pm], 3))
    print("decoded[0:4]:", np.round(np.asarray(dec)[pm][:4], 3))
    print("matchedgt[0:4]:", np.round(np.asarray(mgt)[pm][:4], 3))


if __name__ == "__main__" and os.environ.get("POS_CHECK"):
    pos_anchor_check()
