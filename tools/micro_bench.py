#!/usr/bin/env python
"""Micro-benchmarks of the hot ops on the current device."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax
import jax.numpy as jnp


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    from detection_3d_tpu.ops.rotated_iou import boxes_iou_3d
    from detection_3d_tpu.ops.nms import rotate_nms_3d, nms_from_iou
    from detection_3d_tpu.ops.sparse import (build_sparse_tensor,
                                             submanifold_offsets,
                                             neighbor_indices)
    from detection_3d_tpu.ops.sparse_conv import submanifold_conv
    from detection_3d_tpu.ops.roi_align import roi_align_rotated_sparse

    rng = np.random.RandomState(0)

    # --- rotated IoU 2000x2000 -------------------------------------------
    boxes = np.c_[rng.uniform(0, 40, (2000, 2)), np.zeros((2000, 1)),
                  rng.uniform(0.1, 3, (2000, 3)),
                  rng.uniform(-1.5, 1.5, (2000, 1))].astype(np.float32)
    b = jnp.asarray(boxes)
    f_iou = jax.jit(lambda x: boxes_iou_3d(x, x, criterion=-1))
    print(f"iou 2000x2000:      {timed(f_iou, b)*1e3:8.1f} ms")

    # --- greedy NMS given IoU --------------------------------------------
    iou = f_iou(b)
    scores = jnp.asarray(rng.rand(2000).astype(np.float32))
    valid = jnp.ones(2000, bool)
    f_nms = jax.jit(lambda i, s, v: nms_from_iou(i, s, v, 0.5, 1000))
    print(f"greedy nms 2000:    {timed(f_nms, iou, scores, valid)*1e3:8.1f} ms")

    # --- submanifold conv scale0: 65k x 128ch ----------------------------
    n, c = 60000, 128
    coords = np.unique(rng.randint(0, 512, (n, 3)), axis=0)
    coords = np.c_[coords, np.zeros((coords.shape[0], 1))].astype(np.int32)
    feats = rng.randn(coords.shape[0], c).astype(np.float32)
    t = build_sparse_tensor(jnp.asarray(coords), jnp.asarray(feats),
                            jnp.ones(coords.shape[0], bool), (512, 512, 256),
                            1, 65536)
    offs = submanifold_offsets((3, 3, 3))
    nidx = neighbor_indices(t, offs)
    w32 = jnp.asarray(rng.randn(27, c, c).astype(np.float32) * 0.05)
    fb = t.feats.astype(jnp.bfloat16)
    wb = w32.astype(jnp.bfloat16)
    f_conv = jax.jit(submanifold_conv)
    print(f"subm conv 65k x128 f32: {timed(f_conv, t.feats, nidx, w32, t.row_valid)*1e3:8.1f} ms")
    print(f"subm conv 65k x128 bf16:{timed(f_conv, fb, nidx, wb, t.row_valid)*1e3:8.1f} ms")

    # neighbor build (binary search, scale0 no dense grid)
    f_nb = jax.jit(lambda tt: neighbor_indices(tt, offs))
    print(f"neighbor idx 65k bsearch: {timed(f_nb, t)*1e3:6.1f} ms")
    tg = t.with_dense_grid(1 << 27)
    print(f"neighbor idx 65k dense:   {timed(f_nb, tg)*1e3:6.1f} ms")

    # --- roi align: 1000 rois on 16k-voxel table -------------------------
    n2 = 16000
    coords2 = np.unique(rng.randint(0, 256, (n2, 3)), axis=0)
    coords2 = np.c_[coords2, np.zeros((coords2.shape[0], 1))].astype(np.int32)
    feats2 = rng.randn(coords2.shape[0], 128).astype(np.float32)
    t2 = build_sparse_tensor(jnp.asarray(coords2), jnp.asarray(feats2),
                             jnp.ones(coords2.shape[0], bool), (256, 256, 64),
                             1, 16384).with_dense_grid()
    rois = np.c_[rng.uniform(20, 200, (1000, 2)), rng.uniform(5, 40, (1000, 1)),
                 rng.uniform(2, 40, (1000, 2)), rng.uniform(2, 30, (1000, 1)),
                 rng.uniform(-1.5, 1.5, (1000, 1))].astype(np.float32)
    rv = jnp.ones(1000, bool)
    f_roi = jax.jit(lambda tt, r, v: roi_align_rotated_sparse(
        tt, r, v, (6, 8, 4), 2))
    print(f"roi align 1000x(6,8,4):  {timed(f_roi, t2, jnp.asarray(rois), rv)*1e3:6.1f} ms")
    t2b = t2.with_feats(t2.feats.astype(jnp.bfloat16))
    print(f"roi align bf16:          {timed(f_roi, t2b, jnp.asarray(rois), rv)*1e3:6.1f} ms")


if __name__ == "__main__":
    main()
