"""SECOND/VoxelNet 7-DoF box codec, smooth_dim variant.

Behavioral parity targets:
  * encode/decode — /root/reference/second/pytorch/core/box_torch_ops.py:15-88
  * BoxCoder3D wrapper (smooth_dim=True, yaw wrap, clamp, multi-class decode)
    — /root/reference/maskrcnn_benchmark/modeling/box_coder_3d.py:8-65

Boxes and anchors are yx_zb format ``[xc, yc, z_bot, y_size, x_size, z_size,
yaw]``; per the reference's (w,l,h) naming, w=y_size, l=x_size, h=z_size.
Pure JAX, static shapes, differentiable.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field

import jax.numpy as jnp

from detection_3d_tpu.ops.geometry import limit_period


def second_box_encode(boxes, anchors, smooth_dim: bool = True):
    """(..., 7) targets vs (..., 7) anchors -> (..., 7) regression deltas."""
    xa, ya, za, wa, la, ha, ra = jnp.split(jnp.asarray(anchors), 7, axis=-1)
    xg, yg, zg, wg, lg, hg, rg = jnp.split(jnp.asarray(boxes), 7, axis=-1)
    diagonal = jnp.sqrt(la * la + wa * wa)
    xt = (xg - xa) / diagonal
    yt = (yg - ya) / diagonal
    zt = (zg - za) / ha
    if smooth_dim:
        lt = lg / la - 1.0
        wt = wg / wa - 1.0
        ht = hg / ha - 1.0
    else:
        lt = jnp.log(lg / la)
        wt = jnp.log(wg / wa)
        ht = jnp.log(hg / ha)
    rt = rg - ra
    return jnp.concatenate([xt, yt, zt, wt, lt, ht, rt], axis=-1)


def second_box_decode(encodings, anchors, smooth_dim: bool = True):
    """Inverse of :func:`second_box_encode`."""
    xa, ya, za, wa, la, ha, ra = jnp.split(jnp.asarray(anchors), 7, axis=-1)
    xt, yt, zt, wt, lt, ht, rt = jnp.split(jnp.asarray(encodings), 7, axis=-1)
    diagonal = jnp.sqrt(la * la + wa * wa)
    xg = xt * diagonal + xa
    yg = yt * diagonal + ya
    zg = zt * ha + za
    if smooth_dim:
        lg = (lt + 1.0) * la
        wg = (wt + 1.0) * wa
        hg = (ht + 1.0) * ha
    else:
        lg = jnp.exp(lt) * la
        wg = jnp.exp(wt) * wa
        hg = jnp.exp(ht) * ha
    rg = rt + ra
    return jnp.concatenate([xg, yg, zg, wg, lg, hg, rg], axis=-1)


@dataclass(frozen=True)
class BoxCoder3D:
    """Encode/decode with yaw wrapped to [-pi/2, pi/2] and size clamping.

    (reference: maskrcnn_benchmark/modeling/box_coder_3d.py:14-65; the
    reference always runs smooth_dim=True so bbox_xform_clip=10000.)
    """

    weights: tuple = field(default=(1.0,) * 7)
    smooth_dim: bool = True

    @property
    def bbox_xform_clip(self) -> float:
        return 10000.0 if self.smooth_dim else math.log(1000.0)

    def encode(self, targets, anchors):
        w = jnp.asarray(self.weights, dtype=jnp.result_type(targets))
        enc = second_box_encode(targets, anchors, smooth_dim=self.smooth_dim)
        yaw = limit_period(enc[..., -1:], 0.5, math.pi)
        enc = jnp.concatenate([enc[..., :-1], yaw], axis=-1)
        return enc * w

    def decode(self, encodings, anchors):
        """``encodings``: (N, 7*C); ``anchors``: (N, 7). Returns (N, 7*C).

        Multi-class decode tiles each anchor across its C class slots
        (box_coder_3d.py:49-63).
        """
        encodings = jnp.asarray(encodings)
        anchors = jnp.asarray(anchors)
        num_classes = encodings.shape[-1] // 7
        lead = encodings.shape[:-1]
        enc = encodings.reshape(lead + (num_classes, 7))
        anc = jnp.broadcast_to(anchors[..., None, :], lead + (num_classes, 7))

        w = jnp.asarray(self.weights, dtype=enc.dtype)
        enc = enc / w
        sizes = jnp.clip(enc[..., 3:6], max=self.bbox_xform_clip)
        enc = jnp.concatenate([enc[..., :3], sizes, enc[..., 6:]], axis=-1)
        dec = second_box_decode(enc, anc, smooth_dim=self.smooth_dim)
        yaw = limit_period(dec[..., -1:], 0.5, math.pi)
        dec = jnp.concatenate([dec[..., :-1], yaw], axis=-1)
        return dec.reshape(lead + (num_classes * 7,))
