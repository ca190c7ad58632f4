#!/usr/bin/env python
"""Render BEV + 3D PNG panels of a scene (synthetic or scene-pack) and
optionally of a trained model's predictions vs GT.

The headless stand-in for the reference's open3d debug windows
(utils3d/bbox3d_ops.py draw_* + the SHOW_* flags across
rpn_sparse3d.py/loss_3d.py/suncg_eval.py).

Usage:
  python tools/visualize_scene.py --seed 3 --out /tmp/viz       # GT only
  python tools/visualize_scene.py --pack scenes.npz --out /tmp/viz
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, default=0,
                    help="synthetic_varied_building seed")
    ap.add_argument("--pack", type=str, default=None,
                    help="scene-pack .npz to draw instead of synthetic")
    ap.add_argument("--out", type=str, default="/tmp/viz")
    ap.add_argument("--num-points", type=int, default=35_000)
    ap.add_argument("--voxel-scale", type=float, default=25.0)
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    from detection_3d_tpu.ops.geometry import yx_zb_to_standard
    from detection_3d_tpu.utils.viz import (draw_points_bboxes,
                                            draw_scene_3d)

    classes = ("background", "wall", "door", "window", "ceiling", "floor")
    if args.pack:
        from detection_3d_tpu.data.scene_pack import load_scene_pack
        scene = load_scene_pack(args.pack)[0]
    else:
        from detection_3d_tpu.data.synthetic import (
            synthetic_varied_building)
        scene = synthetic_varied_building(seed=args.seed,
                                          num_points=args.num_points,
                                          classes=classes)
    # scene points are voxel-scaled + min-shifted; GT is yx_zb in meters
    # in the same shifted frame (data/synthetic.py:362-371)
    vs = float(scene.get("voxel_scale", args.voxel_scale) or 1.0)
    pts = np.asarray(scene["points"]) / vs
    gt = np.asarray(yx_zb_to_standard(np.asarray(scene["gt_boxes"])))
    labels = np.asarray(scene["gt_labels"], int)

    bev = draw_points_bboxes(pts, gt, labels,
                             path=os.path.join(args.out, "bev.png"),
                             class_names=classes,
                             title=f"scene seed={args.seed}")
    three = draw_scene_3d(pts, gt, labels,
                          path=os.path.join(args.out, "scene3d.png"))
    print(f"wrote {bev}\nwrote {three}")


if __name__ == "__main__":
    main()
