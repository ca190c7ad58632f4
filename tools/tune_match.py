#!/usr/bin/env python
"""Tune the windowed match kernel's (block, window) on the real device.

Sweeps neighbor_match_3x3x3 over the bench's reference-scale voxel
tables: per site the sweep compares the whole window, so cost ~ window;
smaller blocks tighten the window span but the _ALIGN=1024 DMA
alignment slack floors it. Prints device ms per (scale, block, window)
and verifies exact parity with the XLA searched rulebook for every
combination it times.
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
    from detection_3d_tpu.ops.pallas.match_kernel import (
        match_supported, neighbor_match_3x3x3,
    )
    from detection_3d_tpu.ops.sparse import (
        downsample_table, neighbor_indices, submanifold_offsets,
    )

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

    iters = 10
    for s, t in enumerate(tables):
        if not match_supported(t):
            continue
        accel = t.with_dense_grid(cfg.caps.dense_grid_max_entries) \
            .with_xy_grid(cfg.caps.xy_grid_max_entries)
        want = np.asarray(neighbor_indices(accel, offs3))
        for block in (256, 512, 1024):
            for window in (1536, 2048, 3072):
                if window > t.capacity:
                    continue
                fn = jax.jit(lambda tt: neighbor_match_3x3x3(
                    tt, block=block, window=window))
                got = np.asarray(fn(t))     # compile + parity
                ok = (got == want).all()
                t0 = time.time()
                for _ in range(iters):
                    out = fn(t)
                np.asarray(out)
                dt = (time.time() - t0) / iters
                print(f"scale {s} V={t.capacity:7d} block={block:4d} "
                      f"window={window:4d}: {dt * 1e3:7.2f} ms "
                      f"{'OK' if ok else 'MISMATCH'}")


if __name__ == "__main__":
    main()
