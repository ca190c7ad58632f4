#!/usr/bin/env python
"""Diagnose RPN target assignment on varied buildings (CPU).

The r4 generalization gate FAILED with TRAIN-split AP 0.256 (walls 70%
missed, doors 100%) — an underfit, not an overfit. This tool replays the
exact anchor generation + criterion-2 matching the train step uses
(models/rpn.py rpn_targets) over synthetic_varied_building draws and
reports, per class: how many GT boxes receive >= 1 ABOVE-THRESHOLD
positive anchor (vs only a low-quality-rescue anchor), the best-quality
distribution, and the yaw-gate kill rate. If a class's best quality caps
below fg_iou_threshold on rotated (gyaw != 0) buildings, the RPN can
never emit confident proposals for it and ROI training collapses to
background — exactly the observed failure.
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_platforms", "cpu")

import math

import jax.numpy as jnp
import numpy as np


def main(seeds=(0, 1, 2, 3), verbose=True):
    from detection_3d_tpu.data.synthetic import synthetic_varied_building
    from detection_3d_tpu.engine.trainer import pad_scene
    from detection_3d_tpu.models.anchors import generate_anchors
    from detection_3d_tpu.models.backbone import (bev_with_rulebook,
                                                  build_pyramid)
    from detection_3d_tpu.models.detector import voxelize_points
    from detection_3d_tpu.models.matcher import match_boxes
    from detection_3d_tpu.models.rpn import rpn_targets
    from detection_3d_tpu.models.structures import Boxes3D
    from detection_3d_tpu.ops.geometry import limit_period
    from detection_3d_tpu.ops.rotated_iou import boxes_iou_3d
    from tools.generalization_check import gen_config

    cfg = gen_config()
    names = cfg.ordered_class_names()
    n_scales = len(cfg.sparse3d.nplanes_front)

    per_class = {n: {"n_gt": 0, "covered": 0, "rescued": 0, "best": []}
                 for n in names[1:]}

    for seed in seeds:
        sc = synthetic_varied_building(
            seed=seed, num_points=35_000, classes=cfg.classes,
            voxel_scale=cfg.sparse3d.voxel_scale)
        b = pad_scene(cfg, sc)
        table0 = voxelize_points(cfg, jnp.asarray(b["points"]),
                                 jnp.asarray(b["feats"]),
                                 jnp.asarray(b["points_valid"]))
        pyr = build_pyramid(table0, cfg)
        tables = pyr["tables"]
        rpn_3d = [tables[n_scales - 1 - i]
                  for i in cfg.rpn.rpn_scales_from_top]
        rpn_2d = [bev_with_rulebook(t, t.capacity)[0] for t in rpn_3d]
        all_maps = rpn_3d + rpn_2d
        rpn_maps = [all_maps[i] for i in cfg.rpn.rpn_3d_2d_selector]
        anchors = generate_anchors(cfg, rpn_maps)

        gt = Boxes3D(jnp.asarray(b["gt_boxes"]), jnp.asarray(b["gt_valid"]))
        labels, _, matches = rpn_targets(cfg, anchors, gt)

        aug = {"target_Y": cfg.rpn.label_aug_thickness_y_tar_anc[0],
               "anchor_Y": cfg.rpn.label_aug_thickness_y_tar_anc[1],
               "target_Z": cfg.rpn.label_aug_thickness_z_tar_anc[0],
               "anchor_Z": cfg.rpn.label_aug_thickness_z_tar_anc[1]}
        quality = np.asarray(boxes_iou_3d(gt.boxes, anchors.boxes,
                                          aug_thickness=aug, criterion=2))
        ydif = np.asarray(limit_period(
            gt.boxes[:, 6][:, None] - anchors.boxes[:, 6][None, :],
            0.5, math.pi))
        av = np.asarray(anchors.valid)
        quality = np.where(av[None, :], quality, -1.0)
        gate_ok = np.abs(ydif) <= cfg.rpn.yaw_threshold
        q_gated = np.where(gate_ok, quality, -1.0)

        gl = np.asarray(b["gt_labels"])
        gv = np.asarray(b["gt_valid"])
        m = np.asarray(matches)
        gyaw = float(sc["gt_boxes"][-1, 6])   # last slab's yaw ~ gyaw
        if verbose:
            print(f"\nseed {seed}: gyaw~{np.degrees(gyaw):.0f}deg "
                  f"{int(gv.sum())} gt, anchors "
                  f"{int(av.sum())}/{av.shape[0]}")
        for g in range(len(gv)):
            if not gv[g]:
                continue
            cname = names[int(gl[g])]
            st = per_class[cname]
            st["n_gt"] += 1
            bq = float(q_gated[g].max())
            st["best"].append(bq)
            n_above = int((q_gated[g] >= cfg.rpn.fg_iou_threshold).sum())
            n_assigned = int((m == g).sum())
            if n_above > 0:
                st["covered"] += 1
            elif n_assigned > 0:
                st["rescued"] += 1

    print(f"\nfg_iou_threshold={cfg.rpn.fg_iou_threshold} "
          f"yaw_threshold={cfg.rpn.yaw_threshold:.3f}")
    print(f"{'class':9s} {'n_gt':>5s} {'covered':>8s} {'rescued':>8s} "
          f"{'orphan':>7s} {'best_q: p10':>11s} {'p50':>6s} {'p90':>6s}")
    for cname, st in per_class.items():
        if st["n_gt"] == 0:
            continue
        best = np.array(st["best"])
        orphan = st["n_gt"] - st["covered"] - st["rescued"]
        print(f"{cname:9s} {st['n_gt']:5d} {st['covered']:8d} "
              f"{st['rescued']:8d} {orphan:7d} "
              f"{np.percentile(best, 10):11.3f} "
              f"{np.percentile(best, 50):6.3f} "
              f"{np.percentile(best, 90):6.3f}")
    return per_class


if __name__ == "__main__":
    main()
