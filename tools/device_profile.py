#!/usr/bin/env python
"""Capture one predict() in a profiler trace and print top device ops."""

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from detection_3d_tpu.config import Config, Sparse3DConfig, CapacityConfig
    from detection_3d_tpu.config.defaults import RPNConfig
    from detection_3d_tpu.data.synthetic import synthetic_building
    from detection_3d_tpu.engine.trainer import pad_scene
    from detection_3d_tpu.engine.inference import make_predict_fn
    from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
    from detection_3d_tpu.utils.xplane import plane_op_times

    cfg = Config(
        classes=("background", "wall", "door", "window", "ceiling", "floor"),
        sparse3d=Sparse3DConfig(
            voxel_scale=50,
            voxel_full_scale=(1024, 1024, 256),
            nplanes_front=(32, 64, 64, 128, 128, 128, 256),
            kernels=((2, 2, 2),) * 6,
            strides=((2, 2, 2),) * 6,
        ),
        rpn=RPNConfig(
            rpn_scales_from_top=(4, 3, 2),
            rpn_3d_2d_selector=(1, 3, 4, 5),
            anchor_sizes_3d=((0.4, 1.5, 1.5), (0.2, 0.5, 3), (0.4, 1.5, 3),
                             (0.6, 2.5, 3)),
            use_yaws=(1, 1, 1, 1),
        ),
        caps=CapacityConfig(
            max_points=120_000,
            voxel_caps=(65536, 32768, 16384, 8192, 4096, 2048, 1024),
            max_gt=64),
    )
    scene = synthetic_building(seed=0, num_points=100_000, room=10.0,
                               voxel_scale=cfg.sparse3d.voxel_scale)
    batch = {k: jnp.asarray(v) for k, v in pad_scene(cfg, scene).items()}
    model = SparseRCNN(cfg)
    table0 = voxelize_points(cfg, batch["points"], batch["feats"],
                             batch["points_valid"])
    params = jax.jit(functools.partial(model.init, is_train=False))(
        jax.random.PRNGKey(0), table0)
    predict = make_predict_fn(cfg, model)
    out = predict(params, batch)
    np.asarray(out[2])  # force compile + run

    trace = "/tmp/devprof"
    shutil.rmtree(trace, ignore_errors=True)
    jax.profiler.start_trace(trace)
    out = predict(params, batch)
    np.asarray(out[2])
    jax.profiler.stop_trace()

    import glob
    total = {}
    for p in glob.glob(trace + "/**/*.xplane.pb", recursive=True):
        for k, v in plane_op_times(open(p, "rb").read(), "TPU").items():
            total[k] = total.get(k, 0.0) + v
    items = sorted(total.items(), key=lambda kv: -kv[1])
    ssum = sum(total.values())
    print(f"total device op time: {ssum:.3f}s")
    for k, v in items[:40]:
        print(f"{v:9.4f}s  {100*v/ssum:5.1f}%  {k[:110]}")


if __name__ == "__main__":
    main()
