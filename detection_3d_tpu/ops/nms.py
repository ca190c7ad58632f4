"""On-device greedy rotated NMS with static shapes.

Replaces the reference's host-side greedy loop (spconv
rotate_non_max_suppression_cpu called from
/root/reference/second/core/non_max_suppression/nms_cpu.py:32-44 via
second/pytorch/core/box_torch_ops.py:489-514) with an in-graph
``lax.fori_loop`` over score-sorted boxes and a precomputed 3D IoU matrix.

Suppression condition: the reference suppresses when the 3D IoU
(criterion=-1, no augmentation) exceeds the threshold AND the exact BEV
rotated IoU exceeds it; since iou3d = iou2d * z_ratio with z_ratio <= 1,
iou3d > t implies iou2d > t, so the conditions coincide — we test iou3d
directly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from detection_3d_tpu.ops.rotated_iou import boxes_iou_3d


def nms_from_iou(iou, scores, valid, iou_threshold: float, post_max_size: int):
    """Greedy NMS given a full IoU matrix.

    Args:
      iou: (N, N) pairwise IoU.
      scores: (N,) scores; iteration order is score-descending.
      valid: (N,) bool — padding / pre-filtered entries.
      iou_threshold: suppression threshold.
      post_max_size: static cap on kept boxes.

    Returns:
      keep_idx: (post_max_size,) int32 indices into the input order
        (score-descending kept boxes first), padded with -1;
      keep_count: scalar int32.
    """
    n = scores.shape[0]
    neg_inf = jnp.finfo(scores.dtype).min
    order = jnp.argsort(jnp.where(valid, scores, neg_inf), descending=True)
    iou_o = iou[order][:, order]
    valid_o = valid[order]

    def body(i, suppressed):
        alive = ~suppressed[i]
        row = (iou_o[i] > iou_threshold) & alive & (jnp.arange(n) > i)
        return suppressed | row

    suppressed = jax.lax.fori_loop(0, n, body, ~valid_o)
    kept = ~suppressed

    # rank kept boxes by their (sorted) position; take first post_max_size
    rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    keep_idx = jnp.full((post_max_size,), -1, jnp.int32)
    src = jnp.where(kept, rank, post_max_size)  # overflow rows -> dropped
    keep_idx = keep_idx.at[jnp.clip(src, max=post_max_size)].set(
        jnp.where(kept, order, -1).astype(jnp.int32), mode="drop")
    keep_count = jnp.minimum(jnp.sum(kept.astype(jnp.int32)), post_max_size)
    return keep_idx, keep_count


@functools.partial(jax.jit, static_argnames=("iou_threshold", "post_max_size",
                                             "row_block"))
def rotate_nms_3d(boxes, scores, valid, iou_threshold: float,
                  post_max_size: int, row_block: int = 64):
    """Rotated 3D NMS on yx_zb boxes (N, 7).

    The caller is expected to have already applied any pre-top-k (the
    reference's pre_max_size topk, box_torch_ops.py:495-499) so N is static.
    Returns (keep_idx (post_max_size,), keep_count).
    """
    iou = boxes_iou_3d(boxes, boxes, aug_thickness=None, criterion=-1,
                       row_block=row_block)
    return nms_from_iou(iou, scores, valid, iou_threshold, post_max_size)
