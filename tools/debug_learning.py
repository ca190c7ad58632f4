#!/usr/bin/env python
"""Diagnose the learning loop: label stats, losses, proposal quality."""

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
    from detection_3d_tpu.engine.inference import make_predict_fn
    from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
    from detection_3d_tpu.models.structures import Boxes3D
    from detection_3d_tpu.models.rpn import rpn_targets, select_proposals, RPNHead
    from detection_3d_tpu.models.anchors import generate_anchors
    from detection_3d_tpu.models.backbone import SparseFPN, build_pyramid
    from detection_3d_tpu.ops.rotated_iou import boxes_iou_3d
    from tools.overfit_check import main as _  # noqa — just for the cfg? no
    # rebuild the overfit cfg inline
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
        output_dir="/tmp/debug_learning")

    scene = synthetic_building(seed=0, num_points=25_000, room=6.0,
                               classes=cfg.classes,
                               voxel_scale=cfg.sparse3d.voxel_scale)
    batch = {k: jnp.asarray(v) for k, v in pad_scene(cfg, scene).items()}
    gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])
    print("gt boxes:", np.asarray(gt.boxes[:12]))
    print("gt labels:", np.asarray(batch["gt_labels"][:12]))

    model = SparseRCNN(cfg)
    rng = jax.random.PRNGKey(0)
    table = voxelize_points(cfg, batch["points"], batch["feats"],
                            batch["points_valid"])
    print("active voxels:", int(table.num))

    init_fn = jax.jit(functools.partial(model.init, is_train=True))
    params = init_fn(rng, table, gt, batch["gt_labels"], rng=rng)

    # --- anchor/label diagnostics (host-side, out of jit) ----------------
    @jax.jit
    def diag(params, batch):
        table = voxelize_points(cfg, batch["points"], batch["feats"],
                                batch["points_valid"])
        pyr = build_pyramid(table, cfg)
        bb = SparseFPN(cfg, name="backbone")
        rpn_maps, _ = bb.apply({"params": params["params"]["backbone"]},
                               table, pyr)
        anchors = generate_anchors(cfg, rpn_maps)
        gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])
        labels, regt, matches = rpn_targets(cfg, anchors, gt)
        iou = boxes_iou_3d(gt.boxes, anchors.boxes, aug_thickness={
            "target_Y": 0.4, "anchor_Y": 0.0, "target_Z": 0.8,
            "anchor_Z": 0.0}, criterion=2)
        iou = jnp.where(gt.valid[:, None] & anchors.valid[None, :], iou, 0)
        return (jnp.sum(labels == 1), jnp.sum(labels == 0),
                jnp.sum(labels == -1), jnp.max(iou, axis=1),
                jnp.sum(anchors.valid))

    npos, nneg, nign, max_iou_per_gt, n_anchors = diag(params, batch)
    print(f"anchors valid: {int(n_anchors)}  pos: {int(npos)}  "
          f"neg: {int(nneg)}  ignored: {int(nign)}")
    print("max IoU(crit2,aug) per gt:",
          np.round(np.asarray(max_iou_per_gt)[:12], 3))

    # --- train loop ------------------------------------------------------
    trainer = Trainer(cfg, logger=None)
    state = trainer.init_state(scene, iters_per_epoch=1)
    step = trainer._build_step() if trainer._step_fn is None else None
    trainer._step_fn = trainer._build_step()
    rngk = jax.random.PRNGKey(42)
    for it in range(120):
        rngk, key = jax.random.split(rngk)
        state, total, losses, ok, _, _ = trainer._step_fn(state, batch, key)
        if it % 20 == 0 or it == 119:
            ls = {k: round(float(v), 4) for k, v in losses.items()}
            print(f"it {it:3d} total={float(total):.4f} ok={bool(ok)} {ls}")

    # --- proposal quality after training ---------------------------------
    @jax.jit
    def prop_diag(params, batch):
        table = voxelize_points(cfg, batch["points"], batch["feats"],
                                batch["points_valid"])
        pyr = build_pyramid(table, cfg)
        bb = SparseFPN(cfg, name="backbone")
        rpn_maps, _ = bb.apply({"params": params["params"]["backbone"]},
                               table, pyr)
        anchors = generate_anchors(cfg, rpn_maps)
        head = RPNHead(cfg, name="head")
        obj, reg = head.apply(
            {"params": params["params"]["rpn"]["head"]},
            [m.feats for m in rpn_maps])
        props = select_proposals(cfg, anchors, obj[:, 0], reg, False, None)
        gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])
        iou = boxes_iou_3d(gt.boxes, props.boxes, criterion=-1)
        iou = jnp.where(gt.valid[:, None] & props.valid[None, :], iou, 0)
        return (jnp.max(iou, axis=1), jnp.sum(props.valid),
                props.fields["objectness"][:10])

    best_iou, nprops, top_obj = prop_diag(state.params, batch)
    print("proposals valid:", int(nprops))
    print("best proposal IoU per gt:", np.round(np.asarray(best_iou)[:12], 3))
    print("top objectness:", np.round(np.asarray(top_obj), 3))

    # --- final detections -------------------------------------------------
    predict = make_predict_fn(cfg, model)
    packed_out, _ = predict(state.params, batch)
    a = np.asarray(packed_out)
    boxes, scores, labels = a[:, :7], a[:, 7], a[:, 8]
    v = a[:, 9] > 0.5
    print("detections:", v.sum())
    print("det scores:", np.round(np.asarray(scores)[v][:10], 3))
    print("det labels:", np.asarray(labels)[v][:10])
    gtb = np.asarray(gt.boxes)[np.asarray(gt.valid)]
    if v.sum():
        iou = np.asarray(boxes_iou_3d(jnp.asarray(gtb),
                                      jnp.asarray(np.asarray(boxes)[v]),
                                      criterion=-1))
        print("best det IoU per gt:", np.round(iou.max(1), 3))


if __name__ == "__main__":
    main()
