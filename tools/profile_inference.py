#!/usr/bin/env python
"""Per-stage inference timing on the current device (TPU by default).

Times nested prefixes of the pipeline (pyramid / backbone / RPN / full)
so stage costs are the differences. Uses the same config as bench.py.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp


def _drain(out):
    import numpy as np
    for leaf in jax.tree_util.tree_leaves(out):
        np.asarray(leaf)


def timed(fn, *args, iters=3):
    _drain(fn(*args))
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    _drain(out)
    return (time.time() - t0) / iters


def main():
    from bench import main as _  # noqa: F401  (reuse nothing, just path)
    from detection_3d_tpu.config import Config, Sparse3DConfig, CapacityConfig
    from detection_3d_tpu.config.defaults import RPNConfig
    from detection_3d_tpu.data.synthetic import synthetic_building
    from detection_3d_tpu.engine.trainer import pad_scene
    from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
    from detection_3d_tpu.models.backbone import SparseFPN, build_pyramid
    from detection_3d_tpu.models.rpn import RPN
    from detection_3d_tpu.models.roi_head import ROIBoxHead, postprocess

    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    args = ap.parse_args()
    from bench import full_scale_config, small_config
    from detection_3d_tpu.data.synthetic import synthetic_multiroom
    if args.small:
        cfg = small_config()
        scene = synthetic_building(seed=0, num_points=100_000, room=10.0,
                                   voxel_scale=cfg.sparse3d.voxel_scale)
    else:
        cfg = full_scale_config()
        scene = synthetic_multiroom(seed=0, num_points=500_000,
                                    rooms_xy=(5, 5), room=8.0,
                                    voxel_scale=cfg.sparse3d.voxel_scale)
    batch = {k: jnp.asarray(v) for k, v in pad_scene(cfg, scene).items()}
    model = SparseRCNN(cfg)
    rng = jax.random.PRNGKey(0)
    table0 = voxelize_points(cfg, batch["points"], batch["feats"],
                             batch["points_valid"])
    params = jax.jit(functools.partial(model.init, is_train=False))(
        rng, table0)

    @jax.jit
    def stage_voxelize(batch):
        t = voxelize_points(cfg, batch["points"], batch["feats"],
                            batch["points_valid"])
        return t.feats.sum(), t.num

    @jax.jit
    def stage_pyramid(batch):
        t = voxelize_points(cfg, batch["points"], batch["feats"],
                            batch["points_valid"])
        pyr = build_pyramid(t, cfg)
        return [x.num for x in pyr["tables"]]

    bb = SparseFPN(cfg, name="backbone")

    @jax.jit
    def stage_backbone(params, batch):
        t = voxelize_points(cfg, batch["points"], batch["feats"],
                            batch["points_valid"])
        pyr = build_pyramid(t, cfg)
        rpn_maps, roi_maps = bb.apply(
            {"params": params["params"]["backbone"]}, t, pyr)
        return sum(m.feats.sum() for m in rpn_maps)

    rpn_mod = RPN(cfg, name="rpn")

    @jax.jit
    def stage_rpn(params, batch):
        t = voxelize_points(cfg, batch["points"], batch["feats"],
                            batch["points_valid"])
        pyr = build_pyramid(t, cfg)
        rpn_maps, roi_maps = bb.apply(
            {"params": params["params"]["backbone"]}, t, pyr)
        props, _ = rpn_mod.apply({"params": params["params"]["rpn"]},
                                 rpn_maps, None, is_train=False, rng=None)
        return props[0].boxes.sum()

    @jax.jit
    def stage_full(params, batch):
        t = voxelize_points(cfg, batch["points"], batch["feats"],
                            batch["points_valid"])
        det = model.apply(params, t, is_train=False)
        return det.boxes.sum()

    print(f"voxelize:  {timed(stage_voxelize, batch):.3f}s")
    print(f"+pyramid:  {timed(stage_pyramid, batch):.3f}s")
    print(f"+backbone: {timed(stage_backbone, params, batch):.3f}s")
    print(f"+rpn:      {timed(stage_rpn, params, batch):.3f}s")
    print(f"full:      {timed(stage_full, params, batch):.3f}s")


if __name__ == "__main__":
    main()
