#!/usr/bin/env python
"""Train on many varied synthetic buildings, evaluate on HELD-OUT ones.

The reference's quality numbers are test-split results over 1,311 unseen
buildings (/root/reference/README.md:19-24; test protocol
data3d/evaluation/suncg/suncg_eval.py:714-965). Overfit checks
(tools/overfit_check.py) validate the machinery but say nothing about
generalization — this gate does: train on --train-scenes randomized
multi-room buildings (varied floor plans / sizes / yaw / openings /
density, data/synthetic.py synthetic_varied_building), evaluate per-class
AP/AIoU on --test-scenes buildings from DISJOINT seeds with the full
evaluator, and gate on held-out mean AP.

Usage: python tools/generalization_check.py [--train-scenes 50]
          [--test-scenes 15] [--epochs 60] [--gate 0.7]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def gen_config(epochs: int = 60, base_lr: float = 0.01,
               wide: bool = False):
    from detection_3d_tpu.config import (CapacityConfig, Config,
                                         Sparse3DConfig)
    from detection_3d_tpu.config.defaults import (ROIConfig, RPNConfig,
                                                  SolverConfig)

    # ``wide`` scales widths toward the reference 6c set
    # (6c_Fpn4321_bs1_lr5.yaml: nPlanesFront 32..256, OUT_CHANNELS 128,
    # nPlaneMap 128, MLP_HEAD_DIM 512): the r4 50-scene gate at the thin
    # widths UNDERFIT its own train split (AP 0.256 at loss plateau) —
    # capacity, not optimization, was the binding constraint.
    # scenes reach ~20 m x 25 vox/m = 500 < 1024; height 3.2 m -> 80 < 128
    return Config(
        classes=("background", "wall", "door", "window", "ceiling",
                 "floor"),
        sparse3d=Sparse3DConfig(
            voxel_scale=25,
            voxel_full_scale=(1024, 1024, 128),
            nplanes_front=((32, 64, 64, 128, 128) if wide
                           else (16, 32, 32, 64, 64)),
            kernels=((2, 2, 2),) * 4,
            strides=((2, 2, 2),) * 4,
            nplane_map=64 if wide else 32,
        ),
        rpn=RPNConfig(
            rpn_scales_from_top=(3, 2, 1),
            # anchor->map pairing (r5, from tools/diag_anchor_coverage):
            # the selector MUST be a permutation — the RPN head computes
            # logits from map features alone (weights shared across
            # levels, rpn_sparse3d.py:97-107 parity), so two anchor
            # types on the SAME map get byte-identical objectness and
            # box regression with conflicting targets (the r5 first gate
            # run: selector (0,0,0,3,2,5) put wall+door+window on one
            # map — train-split door/window AP 0.17/0.00 with full
            # anchor coverage, and wall localization degraded from the
            # averaged regression targets). Placement: window on the
            # finest (8cm) 3D map (needs real z — at the r4 32cm
            # placement window best quality capped at p50 0.48 < fg
            # 0.55); door on the 8cm BEV map (full-height anchor z 2.0
            # == door z extent, z-IoU 1); wall on the 16cm 3D map;
            # slabs on the 32cm 3D map whose sites carry REAL z so
            # ceiling anchors sit at ceiling height (the reference
            # parks slabs on z=0 BEV sites and ceilings survive on
            # low-quality rescue alone — its weakest link, not a
            # behavior to copy). Map order: 0..2 = 3D scales
            # (8/16/32 cm), 3..5 = their BEV copies.
            rpn_3d_2d_selector=(1, 3, 0, 4, 2, 5),
            # class-matched anchors (see tools/overfit_check.py rationale;
            # reference 6c set 6c_Fpn4321_bs1_lr5.yaml ANCHOR_SIZES_3D)
            anchor_sizes_3d=((0.4, 1.5, 2.7),    # wall pieces
                             (0.4, 0.9, 2.0),    # door
                             (0.4, 1.2, 1.0),    # window
                             (0.6, 2.5, 2.7),    # long wall pieces
                             (4.5, 4.5, 0.8),    # ceiling/floor slab
                             (0.2, 0.9, 2.7)),   # short wall stubs
            use_yaws=(1, 1, 1, 1, 0, 1),
            fpn_pre_nms_top_n_train=2048, fpn_pre_nms_top_n_test=2048,
            fpn_post_nms_top_n_train=512, fpn_post_nms_top_n_test=512,
            batch_size_per_image=256,
        ),
        roi=ROIConfig(
            pooler_scales_from_top=(3, 2),
            batch_size_per_image=256, detections_per_img=100,
            mlp_head_dim=256 if wide else 128,
        ),
        backbone_out_channels=128 if wide else 32,
        # decay late (75% / 92% of the run): the r3 first attempt decayed
        # at 2/3 of a 60-epoch run with the loss still falling and froze
        # at mean AP 0.05
        solver=SolverConfig(base_lr=base_lr, warmup_epochs=2,
                            lr_step_epochs=(int(epochs * 0.75),
                                            int(epochs * 0.92)),
                            epochs=1,
                            checkpoint_period_epochs=100000),
        caps=CapacityConfig(max_points=45_000,
                            voxel_caps=(65536, 32768, 16384, 8192, 4096),
                            max_gt=128,
                            dense_grid_max_entries=1 << 26),
        output_dir="/tmp/generalization_check",
    ).validate()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-scenes", type=int, default=50)
    ap.add_argument("--test-scenes", type=int, default=15)
    ap.add_argument("--epochs", type=int, default=240)
    ap.add_argument("--gate", type=float, default=0.7)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--scan-steps", type=int, default=10,
                    help="train steps per device call (lax.scan) - "
                    "amortizes the host round trip")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--wide", action="store_true",
                    help="reference-width model (nPlanesFront 32..128, "
                    "OUT_CHANNELS 128) — the thin widths underfit")
    ap.add_argument("--resident", action="store_true",
                    help="device-resident cached-metadata training "
                    "(Trainer.train_resident): pack each scene's pyramid "
                    "once, train by indexing the stacked device dataset")
    ap.add_argument("--resume", action="store_true",
                    help="skip training, evaluate the saved checkpoint")
    ap.add_argument("--resume-train", action="store_true",
                    help="load model_resident_last and CONTINUE training "
                    "from its step (stall recovery: the TPU tunnel here "
                    "drops for minutes at a time; pair with "
                    "tools/watchdog.sh)")
    ap.add_argument("--chunk", type=int, default=100,
                    help="lax.scan steps per device call on the "
                    "resident path")
    ap.add_argument("--eval-train", type=int, default=10, metavar="K",
                    help="also evaluate the first K TRAIN scenes (the "
                    "train/held-out gap separates undertraining from "
                    "overfitting)")
    args = ap.parse_args()
    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import numpy as np

    from detection_3d_tpu.data.synthetic import synthetic_varied_building
    from detection_3d_tpu.engine.inference import run_inference
    from detection_3d_tpu.engine.trainer import Trainer
    from detection_3d_tpu.evaluation.detection_eval import save_results
    from detection_3d_tpu.utils.logger import setup_logger

    cfg = gen_config(epochs=args.epochs, base_lr=args.lr, wide=args.wide)
    logger = setup_logger("generalization")

    # disjoint seed ranges: train [0, N), held-out [10000, 10000 + M)
    t0 = time.time()
    train_scenes = [synthetic_varied_building(
        seed=i, num_points=35_000, classes=cfg.classes,
        voxel_scale=cfg.sparse3d.voxel_scale)
        for i in range(args.train_scenes)]
    test_scenes = [synthetic_varied_building(
        seed=10_000 + i, num_points=35_000, classes=cfg.classes,
        voxel_scale=cfg.sparse3d.voxel_scale)
        for i in range(args.test_scenes)]
    logger.info("generated %d train + %d held-out scenes in %.0fs",
                len(train_scenes), len(test_scenes), time.time() - t0)

    trainer = Trainer(cfg, logger=logger)
    trainer.scan_steps = args.scan_steps
    state = trainer.init_state(train_scenes[0],
                               iters_per_epoch=len(train_scenes))
    if args.resume or args.resume_train:
        # the last_checkpoint tag points at the newest save; every
        # resident-path save lands on a chunk boundary, so the loaded
        # step is always resumable
        ck = trainer.checkpointer.load(
            {"params": state.params, "opt_state": state.opt_state,
             "step": state.step})
        if ck:
            state = state.replace(params=ck["params"],
                                  opt_state=ck["opt_state"],
                                  step=ck["step"])
            logger.info("resumed at step %d", int(state.step))
    if args.resume:
        pass  # evaluate only
    elif args.resident or args.resume_train:
        state = trainer.train_resident(train_scenes, state,
                                       epochs=args.epochs,
                                       chunk=args.chunk)
    else:
        state = trainer.train(train_scenes, state, epochs=args.epochs)

    if args.eval_train > 0:
        k = min(args.eval_train, len(train_scenes))
        logger.info("evaluating %d TRAIN scenes (gap diagnostic)", k)
        _, tr_result, _ = run_inference(cfg, state.params,
                                        train_scenes[:k], logger=logger)
        print("\nTRAIN-SPLIT " + tr_result.summary())

    logger.info("evaluating %d HELD-OUT scenes", len(test_scenes))
    _, result, spb = run_inference(cfg, state.params, test_scenes,
                                   logger=logger)
    save_results(result, cfg.output_dir, len(test_scenes),
                 cfg.test.iou_threshold, epoch=args.epochs)

    print("\nHELD-OUT " + result.summary())
    print(f"\nmean AP: {result.ap[0]:.4f}  mean AIoU: {result.aiou[0]:.4f}"
          f"  sec/building: {spb:.3f}")
    names = cfg.ordered_class_names()
    ok = True
    for l in range(1, cfg.num_classes):
        if result.n_gt[l] == 0:
            continue
        apl = result.ap[l]
        ok_l = np.isfinite(apl) and apl > 0.3
        print(f"  class {names[l]:8s} AP={apl:.3f} AIoU={result.aiou[l]:.3f}"
              f" {'ok' if ok_l else 'FAIL'}")
        ok &= ok_l
    ok &= result.ap[0] >= args.gate
    print(f"GENERALIZATION CHECK (gate mean AP >= {args.gate}):",
          "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
