#!/usr/bin/env python
"""Aggregate device-op profile of the full-scale predict pipeline.

Runs one jitted predict under a profiler trace and prints device time
aggregated by op kind plus the top individual ops — the round-to-round
perf driver (which op class dominates: convs, copies, fusions, NMS...).

Usage: python tools/op_profile.py [--small] [--stage backbone|full]
"""

from __future__ import annotations

import argparse
import collections
import functools
import glob
import os
import re
import shutil
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", action="store_true")
    ap.add_argument("--stage", default="full",
                    choices=["full", "backbone"])
    ap.add_argument("--top", type=int, default=15)
    ap.add_argument("--mfu", action="store_true",
                    help="report true GEMM FLOPs per stage + MFU "
                    "(utils/flops.py)")
    ap.add_argument("--peak-tflops", type=float, default=197.0,
                    help="chip peak (bf16 TFLOP/s; v5e=197, v5p=459)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    from bench import full_scale_config, small_config
    from detection_3d_tpu.data.synthetic import (
        synthetic_building, synthetic_multiroom,
    )
    from detection_3d_tpu.engine.trainer import pad_scene
    from detection_3d_tpu.engine.inference import make_predict_fn
    from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
    from detection_3d_tpu.models.backbone import SparseFPN, build_pyramid
    from detection_3d_tpu.utils.xplane import (
        plane_op_times, tpu_device_time,
    )

    if args.small:
        cfg = small_config()
        scene = synthetic_building(seed=0, num_points=100_000, room=10.0,
                                   voxel_scale=cfg.sparse3d.voxel_scale)
    else:
        cfg = full_scale_config()
        scene = synthetic_multiroom(seed=0, num_points=500_000,
                                    rooms_xy=(5, 5), room=8.0,
                                    voxel_scale=cfg.sparse3d.voxel_scale)
    model = SparseRCNN(cfg)
    batch = {k: jnp.asarray(v) for k, v in pad_scene(cfg, scene).items()}
    table = voxelize_points(cfg, batch["points"], batch["feats"],
                            batch["points_valid"])
    rng = jax.random.PRNGKey(0)
    params = jax.jit(functools.partial(model.init, is_train=False))(
        rng, table)

    if args.stage == "backbone":
        bb = SparseFPN(cfg)

        @jax.jit
        def fn(params, batch):
            t = voxelize_points(cfg, batch["points"], batch["feats"],
                                batch["points_valid"])
            tb = t.with_feats(t.feats.astype(jnp.bfloat16))
            pyr = build_pyramid(tb, cfg)
            rpn_maps, _ = bb.apply(
                {"params": params["params"]["backbone"]}, tb, pyr)
            return sum(m.feats.astype(jnp.float32).sum()
                       for m in rpn_maps)

        run = lambda: float(fn(params, batch))  # noqa: E731
    else:
        predict = make_predict_fn(cfg, model)

        def run():
            out = predict(params, batch)
            np.asarray(out[0])

    run()  # compile
    d = "/tmp/op_profile_trace"
    shutil.rmtree(d, ignore_errors=True)
    iters = int(os.environ.get("OP_PROFILE_ITERS", "1"))
    jax.profiler.start_trace(d)
    for _ in range(iters):
        run()
    jax.profiler.stop_trace()
    print(f"module device time over {iters} iters: "
          f"{tpu_device_time(d):.4f}s "
          f"({tpu_device_time(d)/iters:.4f}s/iter)")

    f = glob.glob(d + "/**/*.xplane.pb", recursive=True)[0]
    ops = plane_op_times(open(f, "rb").read())
    agg = collections.Counter()
    cnt = collections.Counter()
    big = []
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
        cnt[key] += 1
        if t > 0.005:
            big.append((t, name[:180]))
    print("\nby op kind (sums include async overlap):")
    for k, t in agg.most_common(12):
        print(f"  {t:8.3f}s n={cnt[k]:5d}  {k}")
    print("\ntop individual ops:")
    for t, n in sorted(big, reverse=True)[:args.top]:
        print(f"  {t:8.4f}s {n}")

    if args.mfu:
        from detection_3d_tpu.utils.flops import (
            gather_overhead_flops, model_gemm_flops, pyramid_pair_stats,
        )
        stats = pyramid_pair_stats(cfg, table)
        fl = model_gemm_flops(cfg, stats)
        dt = tpu_device_time(d) / iters
        peak = args.peak_tflops * 1e12
        print(f"\nrows/scale: {stats['rows']}")
        print("true GEMM FLOPs per stage (2*pairs*Cin*Cout):")
        for k, v in fl.items():
            if k != "total":
                print(f"  {k:10s} {v / 1e9:9.2f} GF")
        total = fl["total"]
        print(f"  {'total':10s} {total / 1e9:9.2f} GF")
        ovh = gather_overhead_flops(cfg, stats)
        print(f"one-hot gather overhead (window matmuls, not counted): "
              f"{ovh / 1e9:.2f} GF ({ovh / max(total, 1):.1f}x the true "
              f"work)")
        print(f"device time {dt:.4f}s -> achieved "
              f"{total / dt / 1e12:.3f} TF/s true | "
              f"{(total + ovh) / dt / 1e12:.3f} TF/s incl. gather")
        print(f"MFU vs {args.peak_tflops:.0f} TF/s peak: "
              f"{100 * total / dt / peak:.2f}% true | "
              f"{100 * (total + ovh) / dt / peak:.2f}% incl. gather")


if __name__ == "__main__":
    main()
