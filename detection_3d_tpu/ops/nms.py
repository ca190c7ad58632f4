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


def _greedy_suppress(iou_o, valid_o, iou_threshold: float,
                     post_max_size: int):
    """Greedy pass over an IoU matrix ALREADY in score-descending order.

    Returns (keep_pos (post_max_size,) positions into the sorted order,
    padded -1; keep_count)."""
    n = valid_o.shape[0]

    def body(i, suppressed):
        alive = ~suppressed[i]
        row = (iou_o[i] > iou_threshold) & alive & (jnp.arange(n) > i)
        return suppressed | row

    suppressed = jax.lax.fori_loop(0, n, body, ~valid_o)
    kept = ~suppressed
    rank = jnp.cumsum(kept.astype(jnp.int32)) - 1
    keep_pos = jnp.full((post_max_size,), -1, jnp.int32)
    src = jnp.where(kept, rank, post_max_size)
    keep_pos = keep_pos.at[jnp.clip(src, max=post_max_size)].set(
        jnp.where(kept, jnp.arange(n), -1).astype(jnp.int32), mode="drop")
    keep_count = jnp.minimum(jnp.sum(kept.astype(jnp.int32)), post_max_size)
    return keep_pos, keep_count


def nms_boxes(boxes, scores, valid, iou_threshold: float,
              post_max_size: int, row_block: int = 64):
    """Sort-then-IoU greedy NMS — the preferred entry point.

    Sorting the (N, 7) boxes BEFORE building the IoU matrix means the
    matrix is computed directly in iteration order: no (N, N) permutation
    gather (``iou[order][:, order]`` materializes a second full matrix —
    real HBM traffic at 2000^2 x levels x classes).

    Returns (keep_idx into the ORIGINAL order, padded -1; keep_count).
    """
    neg_inf = jnp.finfo(scores.dtype).min
    order = jnp.argsort(jnp.where(valid, scores, neg_inf), descending=True)
    boxes_o = boxes[order]
    valid_o = valid[order]
    iou_o = boxes_iou_3d(boxes_o, boxes_o, aug_thickness=None, criterion=-1,
                         row_block=row_block)
    keep_pos, keep_count = _greedy_suppress(iou_o, valid_o, iou_threshold,
                                            post_max_size)
    keep_idx = jnp.where(keep_pos >= 0, order[jnp.clip(keep_pos, 0)],
                         -1).astype(jnp.int32)
    return keep_idx, keep_count


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
    neg_inf = jnp.finfo(scores.dtype).min
    order = jnp.argsort(jnp.where(valid, scores, neg_inf), descending=True)
    iou_o = iou[order][:, order]
    valid_o = valid[order]
    keep_pos, keep_count = _greedy_suppress(iou_o, valid_o, iou_threshold,
                                            post_max_size)
    keep_idx = jnp.where(keep_pos >= 0, order[jnp.clip(keep_pos, 0)],
                         -1).astype(jnp.int32)
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
    return nms_boxes(boxes, scores, valid, iou_threshold, post_max_size,
                     row_block=row_block)
