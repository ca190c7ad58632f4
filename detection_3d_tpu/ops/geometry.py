"""Yaw conventions, box-format conversions and corner generation.

Semantics match the reference (cited for parity, re-designed for JAX):
  * ``limit_period`` — /root/reference/utils3d/geometric_torch.py:4-10
  * yaw scopes — standard boxes use yaw in [0, pi]; yx_zb boxes use
    yaw in (-pi/2, pi/2]  (geometric_torch.py:26-35)
  * box formats — /root/reference/utils3d/bbox3d_ops.py:92-99,124-176
      standard: [xc, yc, zc,    x_size, y_size, z_size, yaw]
      yx_zb   : [xc, yc, z_bot, y_size, x_size, z_size, yaw - pi/2]

Everything here is pure JAX on static-shape arrays: functions operate on
``(..., 7)`` float arrays and are jit/vmap/grad-safe.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

PI = math.pi


def limit_period(val, offset: float, period: float):
    """Wrap ``val`` into a period-sized scope.

    [0, pi]: offset=0, period=pi;  [-pi/2, pi/2]: offset=0.5, period=pi.
    (reference: utils3d/geometric_torch.py:4-10)
    """
    return val - jnp.floor(val / period + offset) * period


def limit_yaw(yaws, yx_zb: bool):
    """standard: [0, pi];  yx_zb: [-pi/2, pi/2]. (geometric_torch.py:26-35)"""
    if yx_zb:
        return limit_period(yaws, 0.5, PI)
    return limit_period(yaws, 0.0, PI)


def yx_zb_to_standard(boxes):
    """yx_zb ``[xc,yc,z_bot,y_size,x_size,z_size,yaw]`` -> standard.

    (reference: utils3d/bbox3d_ops.py:124-155 convert_from_yx_zb_boxes)
    """
    boxes = jnp.asarray(boxes)
    xc, yc, zb, ys, xs, zs, yaw = jnp.split(boxes, 7, axis=-1)
    zc = zb + zs * 0.5
    yaw = limit_yaw(yaw + PI * 0.5, yx_zb=False)
    return jnp.concatenate([xc, yc, zc, xs, ys, zs, yaw], axis=-1)


def standard_to_yx_zb(boxes):
    """standard -> yx_zb. (reference: utils3d/bbox3d_ops.py:157-176)"""
    boxes = jnp.asarray(boxes)
    xc, yc, zc, xs, ys, zs, yaw = jnp.split(boxes, 7, axis=-1)
    zb = zc - zs * 0.5
    yaw = limit_yaw(yaw - PI * 0.5, yx_zb=True)
    return jnp.concatenate([xc, yc, zb, ys, xs, zs, yaw], axis=-1)


def rbbox_corners_2d(rbbox):
    """Corners of rotated 2D rects, clockwise-positive rotation.

    ``rbbox``: (..., 5) = [cx, cy, x_d, y_d, angle].  Returns (..., 4, 2).
    Corner order and the rotation sense match the reference kernel
    (second/core/non_max_suppression/nms_gpu.py:355-378 rbbox_to_corners):
    local corners ((-x/2,-y/2), (-x/2,y/2), (x/2,y/2), (x/2,-y/2)) mapped by
    [[cos, sin], [-sin, cos]].
    """
    rbbox = jnp.asarray(rbbox)
    cx, cy, xd, yd, ang = (rbbox[..., i] for i in range(5))
    c, s = jnp.cos(ang), jnp.sin(ang)
    hx, hy = xd * 0.5, yd * 0.5
    lx = jnp.stack([-hx, -hx, hx, hx], axis=-1)
    ly = jnp.stack([-hy, hy, hy, -hy], axis=-1)
    wx = c[..., None] * lx + s[..., None] * ly + cx[..., None]
    wy = -s[..., None] * lx + c[..., None] * ly + cy[..., None]
    return jnp.stack([wx, wy], axis=-1)


def box3d_corners(boxes_standard):
    """8 corners of standard-format 3D boxes. (..., 7) -> (..., 8, 2+1).

    Corner layout follows Bbox3D._corners_tmp (utils3d/bbox3d_ops.py:101-102):
    z-low face first (xy order 00,10,01,11), then z-high face.
    """
    boxes = jnp.asarray(boxes_standard)
    xc, yc, zc, xs, ys, zs, yaw = (boxes[..., i] for i in range(7))
    c, s = jnp.cos(yaw), jnp.sin(yaw)
    sx = jnp.array([-0.5, 0.5, -0.5, 0.5], boxes.dtype)
    sy = jnp.array([-0.5, -0.5, 0.5, 0.5], boxes.dtype)
    lx = sx * xs[..., None]
    ly = sy * ys[..., None]
    wx = c[..., None] * lx + s[..., None] * ly + xc[..., None]
    wy = -s[..., None] * lx + c[..., None] * ly + yc[..., None]
    zlo = (zc - 0.5 * zs)[..., None] * jnp.ones_like(sx)
    zhi = (zc + 0.5 * zs)[..., None] * jnp.ones_like(sx)
    low = jnp.stack([wx, wy, zlo], axis=-1)
    high = jnp.stack([wx, wy, zhi], axis=-1)
    return jnp.concatenate([low, high], axis=-2)
