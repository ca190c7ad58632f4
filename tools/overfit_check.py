#!/usr/bin/env python
"""Overfit one synthetic building and verify the detector finds its boxes.

The reference's integration-test pattern is config-driven small-data runs
(SURVEY.md section 4; configs/*_SD.yaml with 1-5 scenes): train until the
model overfits, then eval on the same scene. This script does that
end-to-end with the jitted train step and reports AP/AIoU.

Usage: python tools/overfit_check.py [--steps 300] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--lr", type=float, default=0.01)
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    import numpy as np

    from detection_3d_tpu.config import Config, Sparse3DConfig, CapacityConfig
    from detection_3d_tpu.config.defaults import (RPNConfig, ROIConfig,
                                                  SolverConfig)
    from detection_3d_tpu.data.synthetic import synthetic_building
    from detection_3d_tpu.engine.trainer import Trainer
    from detection_3d_tpu.engine.inference import run_inference
    from detection_3d_tpu.utils.logger import setup_logger

    cfg = Config(
        classes=("background", "wall", "door", "window"),
        sparse3d=Sparse3DConfig(
            voxel_scale=25,
            voxel_full_scale=(512, 512, 128),
            nplanes_front=(16, 32, 32, 64, 64),
            kernels=((2, 2, 2),) * 4,
            strides=((2, 2, 2),) * 4,
            nplane_map=32,
        ),
        rpn=RPNConfig(
            rpn_scales_from_top=(3, 2),
            rpn_3d_2d_selector=(0, 1, 2),
            anchor_sizes_3d=((0.2, 0.9, 2.7), (0.4, 1.5, 2.7),
                             (0.8, 2.5, 2.7)),
            use_yaws=(1, 1, 1),
            fpn_pre_nms_top_n_train=512, fpn_pre_nms_top_n_test=512,
            fpn_post_nms_top_n_train=128, fpn_post_nms_top_n_test=128,
            batch_size_per_image=128,
        ),
        roi=ROIConfig(
            pooler_scales_from_top=(3, 2),
            batch_size_per_image=128, detections_per_img=32,
            mlp_head_dim=128,
        ),
        backbone_out_channels=32,
        solver=SolverConfig(base_lr=args.lr, warmup_epochs=10,
                            lr_step_epochs=(10000,), epochs=1,
                            checkpoint_period_epochs=100000),
        caps=CapacityConfig(max_points=30_000,
                            voxel_caps=(32768, 16384, 8192, 4096, 2048),
                            max_gt=16),
        output_dir="/tmp/overfit_check",
    )

    logger = setup_logger("overfit")
    scene = synthetic_building(seed=0, num_points=25_000, room=6.0,
                               classes=cfg.classes,
                               voxel_scale=cfg.sparse3d.voxel_scale)
    logger.info("scene: %d points, %d gt boxes", scene["points"].shape[0],
                scene["gt_boxes"].shape[0])

    import jax.numpy as jnp
    from detection_3d_tpu.engine.trainer import pad_scene

    trainer = Trainer(cfg, logger=logger)
    state = trainer.init_state(scene, iters_per_epoch=1)
    step_fn = trainer._build_step()
    batch = {k: jnp.asarray(v) for k, v in pad_scene(cfg, scene).items()}

    # scan multi-step: removes per-step dispatch overhead (single-scene
    # overfit uses the same batch every iteration)
    @jax.jit
    def multi_step(state, rng, _k=100):
        def body(carry, i):
            st, key = carry
            key, sub = jax.random.split(key)
            st, total, _, _, _ = step_fn(st, batch, sub)
            return (st, key), total
        (state, _), totals = jax.lax.scan(body, (state, rng),
                                          jnp.arange(_k))
        return state, totals

    t0 = time.time()
    rng = jax.random.PRNGKey(7)
    done = 0
    while done < args.steps:
        rng, sub = jax.random.split(rng)
        state, totals = multi_step(state, sub)
        done += 100
        logger.info("step %d loss %.4f", done, float(totals[-1]))
    logger.info("trained %d steps in %.1fs", done, time.time() - t0)
    trainer.checkpointer.save("model_final", {
        "params": state.params, "opt_state": state.opt_state,
        "step": jnp.asarray(done)})

    _, result, spb = run_inference(cfg, state.params, [scene, scene],
                                   logger=logger)
    print("\n" + result.summary())
    print(f"\nmean AP: {result.ap[0]:.4f}  mean AIoU: {result.aiou[0]:.4f}")
    print(f"sec/building: {spb:.3f}")
    ok = result.ap[0] > 0.5
    print("OVERFIT CHECK:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
