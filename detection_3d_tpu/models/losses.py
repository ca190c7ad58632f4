"""Detection losses: smooth-L1 with yaw modes, masked BCE / CE.

Parity targets:
  * smooth_l1_loss + get_yaw_loss —
    /root/reference/maskrcnn_benchmark/layers/smooth_l1_loss.py:15-49
    (beta-parameterized; the yaw column is replaced by |diff| ('Diff') or
    sin|diff| with fallback to |diff| outside [-pi/2, pi/2] ('SinDiff'));
  * RPN: BCE over sampled anchors, box loss summed over positives divided
    by the total sampled count (loss_3d.py:237-248);
  * ROI: CE over sampled proposals, per-class smooth-L1 beta=1/5 over
    positive rows divided by the sampled count (box_head_3d/loss.py:196-237).
All reductions are masked (padded rows contribute zero).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def yaw_loss(pred, target, anchor_yaw, mode: str = "Diff"):
    """(N,) yaw-column loss. ``pred``/``target`` are the yaw *offsets*."""
    parts = mode.split("_")
    base = parts[0]
    weight = float(parts[1]) if len(parts) == 2 else 1.0
    dif = jnp.abs(pred - target)
    if base == "Diff":
        return dif
    assert base == "SinDiff"
    sin_loss = jnp.sin(dif)
    pred_yaw = pred + anchor_yaw
    in_scope = jnp.abs(pred_yaw) <= math.pi / 2
    return jnp.where(in_scope, sin_loss, dif) * weight


def smooth_l1_box_loss(pred, target, anchors, mask, beta: float,
                       yaw_loss_mode: str = "Diff"):
    """Masked sum of per-row smooth-L1 over 7 box dims.

    pred/target/anchors: (N, 7); mask: (N,) — rows outside the mask
    contribute 0 (the reference gathers positive rows instead).
    """
    dif = jnp.abs(pred - target)
    yl = yaw_loss(pred[:, 6], target[:, 6], anchors[:, 6], yaw_loss_mode)
    dif = jnp.concatenate([dif[:, :6], yl[:, None]], axis=-1)
    loss = jnp.where(dif < beta, 0.5 * dif * dif / beta, dif - 0.5 * beta)
    return jnp.sum(jnp.where(mask[:, None], loss, 0.0))


def bce_with_logits(logits, labels, mask):
    """Masked mean binary cross-entropy."""
    per = jnp.maximum(logits, 0) - logits * labels + \
        jnp.log1p(jnp.exp(-jnp.abs(logits)))
    n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return jnp.sum(jnp.where(mask, per, 0.0)) / n


def cross_entropy(logits, labels, mask):
    """Masked mean CE. labels: (N,) int; invalid rows masked out."""
    logp = jax.nn.log_softmax(logits, axis=-1)
    ll = jnp.take_along_axis(logp, jnp.clip(labels, 0)[:, None],
                             axis=-1)[:, 0]
    n = jnp.maximum(jnp.sum(mask.astype(jnp.float32)), 1.0)
    return -jnp.sum(jnp.where(mask, ll, 0.0)) / n
