#!/usr/bin/env python
"""Capture one predict() in a profiler trace and print top device ops."""

import os
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import functools

import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp


def main():
    from detection_3d_tpu.config import Config, Sparse3DConfig, CapacityConfig
    from detection_3d_tpu.config.defaults import RPNConfig
    from detection_3d_tpu.data.synthetic import synthetic_building
    from detection_3d_tpu.engine.trainer import pad_scene
    from detection_3d_tpu.engine.inference import make_predict_fn
    from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
    from detection_3d_tpu.utils.xplane import plane_op_times

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
    table0 = voxelize_points(cfg, batch["points"], batch["feats"],
                             batch["points_valid"])
    params = jax.jit(functools.partial(model.init, is_train=False))(
        jax.random.PRNGKey(0), table0)
    predict = make_predict_fn(cfg, model)
    out = predict(params, batch)
    np.asarray(out[0])  # force compile + run

    trace = "/tmp/devprof"
    shutil.rmtree(trace, ignore_errors=True)
    jax.profiler.start_trace(trace)
    out = predict(params, batch)
    np.asarray(out[0])
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
