"""Pallas TPU kernel for the rotated-IoU matrix.

Tiled equivalent of the reference's 64-thread-block numba-CUDA kernel
(/root/reference/second/core/non_max_suppression/nms_gpu.py:576-612): the
(N, K) pair matrix is computed in (BN, BK) VMEM tiles. Unlike the XLA
path (ops/rotated_iou.py), which vmaps a per-pair routine, the kernel is
written in EXPLICIT pair-matrix form — every intermediate is a (BN, BK),
(BN, 1) or (1, BK) 2D vector register, with the 24 candidate vertices and
the 24x24 rank comparisons unrolled as static python loops. This is the
layout Mosaic can lower (nested-vmap code produces >2D gathers, bool
minor-dim inserts and two-axis broadcasts it rejects).

Semantics identical to ops/rotated_iou.py (same corner order, inclusive
point-in-quad comparisons, strict segment-orientation tests, sort-free
angular ranking, shoelace area) — parity-tested in
tests/test_pallas_iou.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BN = 8     # target boxes per tile (sublanes)
BK = 128   # query boxes per tile (lanes)
_BIG = 1e9
_NC = 24   # 8 corners + 16 edge intersections


def _corners(cx, cy, xd, yd, ang):
    """4 corner (x, y) pairs, reference corner order (nms_gpu.py:355-378).
    All inputs/outputs share one broadcastable 2D shape."""
    c, s = jnp.cos(ang), jnp.sin(ang)
    hx, hy = xd * 0.5, yd * 0.5
    lx = (-hx, -hx, hx, hx)
    ly = (-hy, hy, hy, -hy)
    out = []
    for j in range(4):
        out.append((c * lx[j] + s * ly[j] + cx, -s * lx[j] + c * ly[j] + cy))
    return out


def _point_in_quad2d(px, py, quad):
    """Inclusive projection test (nms_gpu.py:310-326), 2D-broadcast form."""
    (x0, y0), (x1, y1), _, (x3, y3) = quad
    abx, aby = x1 - x0, y1 - y0
    adx, ady = x3 - x0, y3 - y0
    apx, apy = px - x0, py - y0
    abab = abx * abx + aby * aby
    abap = abx * apx + aby * apy
    adad = adx * adx + ady * ady
    adap = adx * apx + ady * apy
    return (abab >= abap) & (abap >= 0.0) & (adad >= adap) & (adap >= 0.0)


def _tile_kernel(criterion, b_ref, qt_ref, out_ref):
    # targets (rbox2): (BN, 5) -> (BN, 1) columns; queries (rbox1):
    # pre-transposed (5, BK) -> (1, BK) rows
    bx, by, bxd, byd, ba = (b_ref[:, i:i + 1] for i in range(5))
    qx, qy, qxd, qyd, qa = (qt_ref[i:i + 1, :] for i in range(5))

    bq = _corners(bx, by, bxd, byd, ba)   # 4 x ((BN,1), (BN,1))
    qq = _corners(qx, qy, qxd, qyd, qa)   # 4 x ((1,BK), (1,BK))

    ones = jnp.ones((BN, BK), jnp.float32)

    # --- candidate vertices ------------------------------------------------
    cand_x, cand_y, cand_v = [], [], []
    for j in range(4):  # query corners inside the target quad
        px, py = qq[j]
        cand_x.append(px * ones)
        cand_y.append(py * ones)
        cand_v.append(_point_in_quad2d(px, py, bq) & (ones > 0))
    for j in range(4):  # target corners inside the query quad
        px, py = bq[j]
        cand_x.append(px * ones)
        cand_y.append(py * ones)
        cand_v.append(_point_in_quad2d(px, py, qq) & (ones > 0))

    # edge-pair intersections (strict orientation tests,
    # nms_gpu.py:222-265); edges of the TARGET quad vs the QUERY quad —
    # candidate order matches ops/rotated_iou.py (c1=query in pair form)
    for i in range(4):
        ax, ay = qq[i]
        bx_, by_ = qq[(i + 1) % 4]
        for j in range(4):
            cx_, cy_ = bq[j]
            dx_, dy_ = bq[(j + 1) % 4]
            acd = (dy_ - ay) * (cx_ - ax) > (cy_ - ay) * (dx_ - ax)
            bcd = (dy_ - by_) * (cx_ - bx_) > (cy_ - by_) * (dx_ - bx_)
            abc = (cy_ - ay) * (bx_ - ax) > (by_ - ay) * (cx_ - ax)
            abd = (dy_ - ay) * (bx_ - ax) > (by_ - ay) * (dx_ - ax)
            valid = (acd != bcd) & (abc != abd)
            bax, bay = bx_ - ax, by_ - ay
            dcx, dcy = dx_ - cx_, dy_ - cy_
            abba = ax * by_ - bx_ * ay
            cddc = cx_ * dy_ - dx_ * cy_
            dh = bay * dcx - bax * dcy
            safe = jnp.where(dh == 0.0, 1.0, dh)
            cand_x.append((abba * dcx - bax * cddc) / safe * ones)
            cand_y.append((abba * dcy - bay * cddc) / safe * ones)
            cand_v.append(valid & (dh != 0.0) & (ones > 0))

    # --- centroid + pseudo-angle keys --------------------------------------
    vf = [v.astype(jnp.float32) for v in cand_v]
    n = vf[0]
    for k in range(1, _NC):
        n = n + vf[k]
    denom = jnp.maximum(n, 1.0)
    cxm = vf[0] * cand_x[0]
    cym = vf[0] * cand_y[0]
    for k in range(1, _NC):
        cxm = cxm + vf[k] * cand_x[k]
        cym = cym + vf[k] * cand_y[k]
    cxm = cxm / denom
    cym = cym / denom

    v0 = [cand_x[k] - cxm for k in range(_NC)]
    v1 = [cand_y[k] - cym for k in range(_NC)]
    keys = []
    for k in range(_NC):
        d = jnp.sqrt(v0[k] * v0[k] + v1[k] * v1[k])
        dsafe = jnp.where(d > 0.0, d, 1.0)
        vx = v0[k] / dsafe
        vy = v1[k] / dsafe
        key = jnp.where(vy < 0.0, -2.0 - vx, vx)
        keys.append(jnp.where(cand_v[k] & (d > 0.0), key, _BIG))

    # --- sort-free angular rank + shoelace ----------------------------------
    ranks = []
    for i in range(_NC):
        r = jnp.zeros((BN, BK), jnp.float32)
        for j in range(_NC):
            if j == i:
                continue
            less = keys[j] < keys[i]
            if j < i:  # index tie-break is static per (i, j)
                less = less | (keys[j] == keys[i])
            r = r + less.astype(jnp.float32)
        ranks.append(r)

    area2 = jnp.zeros((BN, BK), jnp.float32)
    for i in range(_NC):
        nxt = jnp.where(ranks[i] + 1.0 >= n, 0.0, ranks[i] + 1.0)
        vnx = jnp.zeros((BN, BK), jnp.float32)
        vny = jnp.zeros((BN, BK), jnp.float32)
        for j in range(_NC):
            sel = (ranks[j] == nxt) & cand_v[j]
            sf = sel.astype(jnp.float32)
            vnx = vnx + sf * v0[j]
            vny = vny + sf * v1[j]
        cross = v0[i] * vny - v1[i] * vnx
        area2 = area2 + vf[i] * cross
    inter = 0.5 * jnp.abs(area2)

    # --- criteria (devRotateIoUEval, nms_gpu.py:552-570) -------------------
    area1 = (qxd * qyd) * ones   # query
    area2_ = (bxd * byd) * ones  # target
    union = area1 + area2_ - inter
    if criterion == -1:
        iou = inter / union
    elif criterion == 0:
        iou = inter / area1
    elif criterion == 1:
        iou = inter / area2_
    elif criterion == 2:
        mx = jnp.maximum(bxd, byd) * ones
        mn = jnp.minimum(bxd, byd) * ones
        thin = mn / mx < 0.25
        thin_denom = area2_ + jnp.maximum(0.0, area1 * 0.5 - inter)
        iou = jnp.where(thin, inter / thin_denom, inter / union)
    else:
        iou = inter
    out_ref[:, :] = iou


@functools.partial(jax.jit, static_argnames=("criterion", "interpret"))
def rotated_iou_matrix_pallas(boxes, query_boxes, criterion: int = -1,
                              interpret: bool = False):
    """(N, 5) x (K, 5) -> (N, K); same orientation as rotate_iou_gpu_eval
    (result[i, j] = iou(boxes_i as target, query_j as anchor))."""
    boxes = jnp.asarray(boxes, jnp.float32)
    query_boxes = jnp.asarray(query_boxes, jnp.float32)
    n, k = boxes.shape[0], query_boxes.shape[0]
    pn = (-n) % BN
    pk = (-k) % BK
    bpad = jnp.pad(boxes, ((0, pn), (0, 0)), constant_values=1.0)
    qpad = jnp.pad(query_boxes, ((0, pk), (0, 0)), constant_values=1.0)
    qpad_t = qpad.T  # (5, K): lets the kernel slice (1, BK) rows directly
    np_, kp = n + pn, k + pk

    out = pl.pallas_call(
        functools.partial(_tile_kernel, criterion),
        grid=(np_ // BN, kp // BK),
        in_specs=[
            pl.BlockSpec((BN, 5), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((5, BK), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BN, BK), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, kp), jnp.float32),
        interpret=interpret,
    )(bpad, qpad_t)
    return out[:n, :k]
