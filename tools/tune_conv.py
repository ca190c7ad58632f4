#!/usr/bin/env python
"""Tune the windowed gather-conv kernel's (block, window) on the device.

The kernel's dominant cost is the one-hot gather matmul whose
contraction dim is the window size, so cost per output row ~ window x
n_offsets; smaller windows risk extra serialized passes when a block's
neighbor span exceeds the window. Sweeps real bench tables at the
channel widths the backbone actually runs (32/64/128) and checks parity
vs the XLA gather path.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_tpu_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    import jax.numpy as jnp
    import numpy as np

    from bench import full_scale_config
    from detection_3d_tpu.data.synthetic import synthetic_multiroom
    from detection_3d_tpu.engine.trainer import pad_scene
    from detection_3d_tpu.models.detector import voxelize_points
    from detection_3d_tpu.ops.pallas import gather_conv_kernel as gck
    from detection_3d_tpu.ops.sparse import (
        downsample_table, neighbor_indices, submanifold_offsets,
    )
    from detection_3d_tpu.ops.sparse_conv import gather_conv

    cfg = full_scale_config()
    scene = synthetic_multiroom(seed=0, num_points=500_000, rooms_xy=(5, 5),
                                room=8.0, voxel_scale=cfg.sparse3d.voxel_scale)
    batch = {k: jnp.asarray(v) for k, v in pad_scene(cfg, scene).items()}
    table = voxelize_points(cfg, batch["points"], batch["feats"],
                            batch["points_valid"])
    caps = cfg.caps.scale_caps(cfg.sparse3d.num_scales)
    offs3 = submanifold_offsets((3, 3, 3))

    tables = [table]
    for s in range(2):
        tables.append(downsample_table(tables[-1], (2, 2, 2), (2, 2, 2),
                                       caps[s + 1]))
    chans = {0: 32, 1: 64, 2: 128}

    iters = 10
    for s, t in enumerate(tables):
        accel = t.with_dense_grid(cfg.caps.dense_grid_max_entries) \
            .with_xy_grid(cfg.caps.xy_grid_max_entries)
        idx = neighbor_indices(accel, offs3)
        cin = cout = chans[s]
        rng = np.random.RandomState(s)
        feats = jnp.asarray(
            (rng.randn(t.capacity, cin) *
             np.asarray(t.row_valid)[:, None]).astype(np.float32)
        ).astype(jnp.bfloat16)
        w = jnp.asarray(rng.randn(27, cin, cout).astype(np.float32)
                        * 0.1).astype(jnp.bfloat16)
        ref = np.asarray(gather_conv(feats, idx, w, t.row_valid)
                         ).astype(np.float32)
        group = gck._group_of(cin)
        feats_g = feats.reshape(t.capacity // group, group * cin)
        for block in (128, 256, 512):
          for align in sorted({16 * group, 256}):
            for window in (256, 384, 512, 768, 1024):
                if window < align or window < block // 2:
                    continue
                pad = (-t.capacity) % block
                idxp = jnp.pad(
                    jnp.where(t.row_valid[None, :], idx, t.capacity),
                    ((0, 0), (0, pad)), constant_values=t.capacity)
                starts, local, hi = gck.window_starts(
                    idxp, t.capacity, block=block, window=gck.WINDOW,
                    align=align)
                passes = jnp.maximum(hi // window + 1, 1)

                fn = jax.jit(lambda fg, st, ps, lc: gck._windowed_conv_call(
                    fg, st, ps, lc, w, block, window, group))
                out = np.asarray(fn(feats_g, starts, passes, local)
                                 )[:t.capacity].astype(np.float32)
                out = out * np.asarray(t.row_valid)[:, None]
                err = np.abs(out - ref).max()
                t0 = time.time()
                for _ in range(iters):
                    o = fn(feats_g, starts, passes, local)
                np.asarray(o)
                dt = (time.time() - t0) / iters
                mp = float(np.asarray(passes).mean())
                print(f"scale {s} V={t.capacity:7d} C={cin:3d} "
                      f"block={block:4d} window={window:5d} "
                      f"align={align:3d}: "
                      f"{dt * 1e3:7.2f} ms passes~{mp:.2f} "
                      f"{'OK' if err <= 1e-2 else f'ERR {err:.1e}'}")


if __name__ == "__main__":
    main()
