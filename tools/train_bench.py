#!/usr/bin/env python
"""Benchmark the jitted training step (fwd + bwd + SGD update).

The reference's hot loop is training
(/root/reference/maskrcnn_benchmark/engine/trainer_sparse3d.py:69-121);
this measures the repo's per-step device time — which, unlike inference,
still builds ALL pyramid metadata in-graph (engine/trainer.py uses
build_pyramid) — at two configs:

  * gen    — the generalization-gate config (25 vox/m, 5 scales);
  * full   — the reference-scale config (50 vox/m = 2 cm voxels,
             4096^2 x 512, 9 scales; configs/6c/6c_Fpn4321_bs1_lr5.yaml).

Device time comes from a profiler trace (utils/xplane.py): on this TPU
tunnel block_until_ready does not drain the device. An op-kind breakdown
is printed so the metadata-vs-GEMM split is visible (VERDICT r4 item 4).

Usage: python tools/train_bench.py [--config gen|full] [--iters 5]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import shutil
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", default="gen", choices=["gen", "full"])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--top", type=int, default=10)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    from detection_3d_tpu.engine.trainer import Trainer, pad_scene
    from detection_3d_tpu.utils.xplane import (
        plane_op_times, tpu_device_time,
    )

    if args.config == "gen":
        from tools.generalization_check import gen_config
        cfg = gen_config()
        from detection_3d_tpu.data.synthetic import (
            synthetic_varied_building,
        )
        scene = synthetic_varied_building(
            seed=0, num_points=35_000, classes=cfg.classes,
            voxel_scale=cfg.sparse3d.voxel_scale)
    else:
        import dataclasses

        from bench import full_scale_config
        from detection_3d_tpu.data.synthetic import synthetic_multiroom
        cfg = full_scale_config()
        cfg = dataclasses.replace(cfg, output_dir="/tmp/train_bench")
        scene = synthetic_multiroom(seed=0, num_points=500_000,
                                    rooms_xy=(5, 5), room=8.0,
                                    voxel_scale=cfg.sparse3d.voxel_scale)

    trainer = Trainer(cfg, output_dir="/tmp/train_bench")
    state = trainer.init_state(scene, iters_per_epoch=1)
    step = trainer._build_step()
    batch = {k: jnp.asarray(v) for k, v in pad_scene(cfg, scene).items()}
    rng = jax.random.PRNGKey(0)

    t0 = time.time()
    state, total, losses, ok, tn, _ = step(state, batch, rng)
    np.asarray(total)
    print(f"compile+first step: {time.time() - t0:.1f}s "
          f"loss={float(total):.4f} ok={bool(ok)} voxels={int(tn)}")

    d = "/tmp/train_bench_trace"
    shutil.rmtree(d, ignore_errors=True)
    jax.profiler.start_trace(d)
    for _ in range(args.iters):
        state, total, losses, ok, tn, _ = step(state, batch, rng)
    np.asarray(total)   # drain the tunneled device queue
    jax.profiler.stop_trace()
    dev = tpu_device_time(d) / args.iters
    print(f"train step device time ({args.config}): {dev:.4f} s/step "
          f"over {args.iters} iters")

    import glob
    f = glob.glob(d + "/**/*.xplane.pb", recursive=True)
    if f:
        ops = plane_op_times(open(f[0], "rb").read())
        agg = collections.Counter()
        for name, t in ops.items():
            if name.startswith("jit_"):
                continue
            m = re.match(r"%([a-z_.-]+)", name)
            key = m.group(1) if m else name[:24]
            if "_windowed_conv_call" in name:
                key = "windowed_conv(pallas)"
            if "rotated_iou" in name:
                key = "rotated_iou(pallas)"
            agg[key] += t
        print("op-kind breakdown (sums include async overlap):")
        for k, t in agg.most_common(args.top):
            print(f"  {t / args.iters:8.4f}s/step  {k}")


if __name__ == "__main__":
    main()
