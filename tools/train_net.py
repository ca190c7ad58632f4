#!/usr/bin/env python
"""Config-driven train + eval CLI.

Parity with the reference entry point
(/root/reference/tools/train_net_sparse3d.py:139-225): loads a YAML config
(reference-format overlays accepted), applies the derived-config pass
(built into Config), trains for EPOCHS with eval every
EPOCHS_BETWEEN_TEST, supports --only-test / --skip-test, auto-resumes from
the last checkpoint, and copies the config into OUTPUT_DIR for
provenance.

Data: set SUNCG_TORCH_PATH (reference-format house .pth files) or pass
--synthetic N to train on N generated buildings (smoke/regression mode).
"""

from __future__ import annotations

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config-file", default="", help="YAML config overlay")
    ap.add_argument("--only-test", action="store_true")
    ap.add_argument("--skip-test", action="store_true")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="use N synthetic buildings instead of SUNCG data")
    ap.add_argument("--scan-steps", type=int, default=1,
                    help="train steps per device call (single-device "
                    "path; amortizes the host round trip)")
    ap.add_argument("--data-root", default=os.environ.get(
        "SUNCG_TORCH_PATH", ""))
    ap.add_argument("opts", nargs="*", default=[])
    args = ap.parse_args()

    from detection_3d_tpu.config import Config, load_yaml_config
    from detection_3d_tpu.engine.trainer import Trainer
    from detection_3d_tpu.engine.inference import run_inference
    from detection_3d_tpu.utils.logger import setup_logger

    cfg = load_yaml_config(args.config_file) if args.config_file else Config()
    cfg.validate()

    out = cfg.output_dir
    os.makedirs(out, exist_ok=True)
    logger = setup_logger("detection_3d_tpu", out)
    if args.config_file:
        shutil.copyfile(args.config_file,
                        os.path.join(out, os.path.basename(args.config_file)))
    logger.info("config: %s", cfg)

    # data
    if args.synthetic > 0:
        from detection_3d_tpu.data.synthetic import synthetic_building
        train_scenes = [synthetic_building(
            seed=i, classes=cfg.classes,
            voxel_scale=cfg.sparse3d.voxel_scale)
            for i in range(args.synthetic)]
        test_scenes = [synthetic_building(
            seed=1000 + i, classes=cfg.classes,
            voxel_scale=cfg.sparse3d.voxel_scale)
            for i in range(max(1, args.synthetic // 4))]
    else:
        from detection_3d_tpu.data.suncg import SUNCGDataset
        train_ds = SUNCGDataset("train", cfg, args.data_root)
        test_ds = SUNCGDataset("test", cfg, args.data_root)
        assert len(train_ds) > 0, "no input data (set SUNCG_TORCH_PATH)"
        train_scenes = [train_ds[i] for i in range(len(train_ds))]
        test_scenes = [test_ds[i] for i in range(len(test_ds))]

    # data-parallel mesh when more than one device is attached (the
    # reference's DDP launch path, train_net_sparse3d.py:52-57,170-177)
    import jax
    mesh = None
    bsz = 1
    if len(jax.devices()) > 1 and cfg.solver.ims_per_batch >= 1:
        from detection_3d_tpu.parallel.mesh import make_mesh
        dp = len(jax.devices())
        bsz = max(cfg.solver.ims_per_batch, dp)
        bsz += (-bsz) % dp  # round up to a multiple of the mesh
        mesh = make_mesh(dp)
        logger.info("data-parallel: %d devices, %d buildings/step",
                    dp, bsz)

    trainer = Trainer(cfg, output_dir=out, logger=logger, mesh=mesh)
    trainer.scan_steps = args.scan_steps
    state = trainer.init_state(train_scenes[0],
                               iters_per_epoch=-(-len(train_scenes) // bsz))
    loaded = trainer.checkpointer.load(
        {"params": state.params, "opt_state": state.opt_state,
         "step": state.step})
    state = state.replace(params=loaded["params"],
                          opt_state=loaded["opt_state"],
                          step=loaded["step"])

    ebt = cfg.solver.epochs_between_test
    rounds = max(1, cfg.solver.epochs // max(ebt, 1))
    for loop in range(rounds):
        if not args.only_test:
            state = trainer.train(train_scenes, state, epochs=ebt)
        if not args.skip_test:
            run_inference(cfg, state.params, test_scenes, logger=logger)
        if args.only_test:
            break


if __name__ == "__main__":
    main()
