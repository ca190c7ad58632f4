#!/usr/bin/env python
"""Convert reference-format SUNCG .pth scene files to scene packs.

Scene packs (data/scene_pack.py) are the flat binary unit the native C++
prefetching loader streams (native/scene_loader.cpp); the reference
loads torch-pickled tuples per scene instead
(/root/reference/data3d/suncg_dataset.py:61-75).

Usage: python tools/convert_scene_packs.py --out DIR [--data-root ROOT]
       [--split train] [--synthetic N]  (synthetic: N generated
       buildings instead of real data — for pipelines without assets)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--data-root", default=None)
    ap.add_argument("--split", default="train")
    ap.add_argument("--synthetic", type=int, default=0)
    ap.add_argument("--voxel-scale", type=int, default=50)
    args = ap.parse_args()

    from detection_3d_tpu.data.scene_pack import write_scene_pack

    os.makedirs(args.out, exist_ok=True)
    n = 0
    if args.synthetic:
        from detection_3d_tpu.data.synthetic import synthetic_building
        for i in range(args.synthetic):
            scene = synthetic_building(seed=i, voxel_scale=args.voxel_scale)
            write_scene_pack(os.path.join(args.out, f"syn_{i:05d}.spk"),
                             scene)
            n += 1
    else:
        from detection_3d_tpu.config import Config
        from detection_3d_tpu.data.suncg import SUNCGDataset
        cfg = Config()
        ds = SUNCGDataset(args.split, cfg, data_root=args.data_root)
        for i in range(len(ds)):
            scene = ds[i]
            scene = {k: np.asarray(v) for k, v in scene.items()
                     if isinstance(v, np.ndarray) or np.isscalar(v)}
            write_scene_pack(os.path.join(args.out, f"{args.split}_"
                                          f"{i:06d}.spk"), scene)
            n += 1
    print(f"wrote {n} scene packs to {args.out}")


if __name__ == "__main__":
    main()
