"""Exact rotated-rectangle IoU + 3D IoU composition, fully on-device.

Re-designs the reference's numba-CUDA polygon kernel
(/root/reference/second/core/non_max_suppression/nms_gpu.py:166-403,552-650)
as branchless vectorized JAX: every pair's convex intersection is computed
over a static 24-candidate-vertex buffer with validity masks, so the whole
(N, K) IoU matrix is one fused XLA computation — no host round-trip (the
reference crosses host<->device per call, rotate_nms_3d_torch.py:65-83).

IoU criteria (nms_gpu.py:552-570 devRotateIoUEval, rbox1=query, rbox2=box):
  -1 : inter / union
   0 : inter / area(query)
   1 : inter / area(box)
   2 : thin-box friendly — if min(d)/max(d) of the *box* < 0.25,
       inter / (area_box + max(0, 0.5*area_query - inter)); else union IoU.

3D composition (utils3d/rotate_nms_3d_torch.py:7-88 boxes_iou_3d):
  iou3d[i, j] = iou2d(target_i, anchor_j) * z_ratio, where z_ratio is the
  z-interval overlap/common-extent ratio (may be negative when disjoint),
  with optional minimum-thickness augmentation of y_size / z_size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from detection_3d_tpu.ops.geometry import rbbox_corners_2d

# 8 corner candidates + 16 edge-pair intersections
_NUM_CAND = 24
_BIG = 1e9


def _point_in_quad(px, py, corners):
    """Reference point_in_quadrilateral (nms_gpu.py:310-326): projection test
    onto edges ab=c1-c0 and ad=c3-c0 with inclusive comparisons.

    Written without vector dots: under nested vmap inside the Pallas
    kernel, `@` lowers to batched dot_general which Mosaic rejects."""
    abx = corners[1, 0] - corners[0, 0]
    aby = corners[1, 1] - corners[0, 1]
    adx = corners[3, 0] - corners[0, 0]
    ady = corners[3, 1] - corners[0, 1]
    apx = px - corners[0, 0]
    apy = py - corners[0, 1]
    abab = abx * abx + aby * aby
    abap = abx * apx + aby * apy
    adad = adx * adx + ady * ady
    adap = adx * apx + ady * apy
    return (abab >= abap) & (abap >= 0.0) & (adad >= adap) & (adap >= 0.0)


def _segment_intersections(c1, c2):
    """All 4x4 edge-pair intersections between two quads (corners (4,2)).

    Mirrors line_segment_intersection (nms_gpu.py:222-265): strict-inequality
    orientation tests, then the determinant point formula. Returns
    (16, 2) points and (16,) validity.
    """
    # successor corners via slice+concat (constant-free and gather-free:
    # pallas/Mosaic rejects captured index arrays and >2D gathers)
    def _succ(x):
        return jnp.concatenate([x[1:], x[:1]], axis=0)

    a = c1  # (4,2) edge starts of quad 1
    b = _succ(c1)
    c = c2
    d = _succ(c2)

    A = a[:, None, :]  # (4,1,2)
    B = b[:, None, :]
    C = c[None, :, :]  # (1,4,2)
    D = d[None, :, :]

    BA = B - A
    DA = D - A
    CA = C - A
    acd = DA[..., 1] * CA[..., 0] > CA[..., 1] * DA[..., 0]
    bcd = (D[..., 1] - B[..., 1]) * (C[..., 0] - B[..., 0]) > (
        C[..., 1] - B[..., 1]
    ) * (D[..., 0] - B[..., 0])
    abc = CA[..., 1] * BA[..., 0] > BA[..., 1] * CA[..., 0]
    abd = DA[..., 1] * BA[..., 0] > BA[..., 1] * DA[..., 0]
    valid = (acd != bcd) & (abc != abd)

    DC = D - C
    ABBA = A[..., 0] * B[..., 1] - B[..., 0] * A[..., 1]
    CDDC = C[..., 0] * D[..., 1] - D[..., 0] * C[..., 1]
    DH = BA[..., 1] * DC[..., 0] - BA[..., 0] * DC[..., 1]
    Dx = ABBA * DC[..., 0] - BA[..., 0] * CDDC
    Dy = ABBA * DC[..., 1] - BA[..., 1] * CDDC
    safe = jnp.where(DH == 0.0, 1.0, DH)
    pts = jnp.stack([Dx / safe, Dy / safe], axis=-1)  # (4,4,2)
    valid = valid & (DH != 0.0)
    return pts.reshape(16, 2), valid.reshape(16)


def _intersection_area(c1, c2):
    """Convex intersection area of two quads given corners (4,2) each.

    Branchless equivalent of inter() (nms_gpu.py:331-395): collect corner-
    in-quad candidates and edge intersections into a static 24-vertex
    buffer, order them around the centroid, and take the shoelace area.

    The angular ordering is SORT-FREE: each vertex's rank is the count of
    smaller pseudo-angle keys (O(24^2) comparisons, fully fused on the
    VPU) — profiled ~5x faster than argsort-based ordering on TPU, which
    dominated NMS cost.
    """
    in2 = jax.vmap(lambda p: _point_in_quad(p[0], p[1], c2))(c1)  # (4,)
    in1 = jax.vmap(lambda p: _point_in_quad(p[0], p[1], c1))(c2)
    seg_pts, seg_valid = _segment_intersections(c1, c2)

    pts = jnp.concatenate([c1, c2, seg_pts], axis=0)  # (24, 2)
    valid = jnp.concatenate([in2, in1, seg_valid], axis=0)  # (24,)

    n = jnp.sum(valid.astype(jnp.int32))
    denom = jnp.maximum(n, 1).astype(pts.dtype)
    # float mask multiply: a bool[..., None] minor-dim insert is not
    # lowerable by Mosaic inside the pallas kernel
    vf = valid.astype(pts.dtype)
    center = jnp.sum(pts * vf[:, None], axis=0) / denom

    v = pts - center
    d = jnp.sqrt(v[:, 0] ** 2 + v[:, 1] ** 2)
    dsafe = jnp.where(d > 0.0, d, 1.0)
    vx = v[:, 0] / dsafe
    vy = v[:, 1] / dsafe
    # reference sort key (nms_gpu.py:194-202): key = vx, mirrored to -2-vx
    # for the lower half-plane => monotone around the polygon.
    key = jnp.where(vy < 0.0, -2.0 - vx, vx)
    key = jnp.where(valid & (d > 0.0), key, _BIG)

    # rank = number of strictly-smaller keys (+ index tie-break): a
    # permutation of 0..23 with valid vertices occupying ranks < n
    less = key[None, :] < key[:, None]
    tie = (key[None, :] == key[:, None]) & (
        jnp.arange(_NUM_CAND)[None, :] < jnp.arange(_NUM_CAND)[:, None])
    rank = jnp.sum((less | tie).astype(jnp.int32), axis=1)

    # shoelace around the centroid: successor = vertex with rank+1 mod n
    nxt = jnp.where(rank + 1 >= n, 0, rank + 1)
    sel = (rank[None, :] == nxt[:, None]) & valid[None, :]
    # plain slices (v[None, :, 0] mixes newaxis+int = advanced indexing,
    # which lowers to a gather Mosaic can't handle inside the kernel)
    v0 = v[:, 0]
    v1 = v[:, 1]
    vnx = jnp.sum(jnp.where(sel, v0[None, :], 0.0), axis=1)
    vny = jnp.sum(jnp.where(sel, v1[None, :], 0.0), axis=1)
    cross = v0 * vny - v1 * vnx
    area = 0.5 * jnp.abs(jnp.sum(jnp.where(valid, cross, 0.0)))
    return area


def rotated_iou_pair(qbox, box, criterion: int = -1):
    """IoU of one query rbbox vs one target rbbox, both ``[cx,cy,xd,yd,ang]``.

    Matches devRotateIoUEval(rbox1=qbox, rbox2=box, criterion)
    (nms_gpu.py:552-570): area1 = query area, area2 = box area; criterion 2
    keys off the *box* (target) aspect ratio.
    """
    area1 = qbox[2] * qbox[3]
    area2 = box[2] * box[3]
    c1 = rbbox_corners_2d(qbox)
    c2 = rbbox_corners_2d(box)
    inter = _intersection_area(c1, c2)
    union = area1 + area2 - inter
    if criterion == -1:
        return inter / union
    if criterion == 0:
        return inter / area1
    if criterion == 1:
        return inter / area2
    if criterion == 2:
        mx = jnp.maximum(box[2], box[3])
        mn = jnp.minimum(box[2], box[3])
        thin = mn / mx < 0.25
        thin_denom = area2 + jnp.maximum(0.0, area1 * 0.5 - inter)
        return jnp.where(thin, inter / thin_denom, inter / union)
    return inter  # criterion==3 in the reference debug path: raw area


def _iou_row(box, qboxes, criterion):
    return jax.vmap(lambda q: rotated_iou_pair(q, box, criterion))(qboxes)


@functools.partial(jax.jit, static_argnames=("criterion", "row_block",
                                             "same_box_fix", "impl"))
def rotated_iou_matrix(boxes, query_boxes, criterion: int = -1,
                       row_block: int = 64, same_box_fix: bool = True,
                       impl: str = "auto"):
    """(N, 5) x (K, 5) -> (N, K) rotated IoU, blocked over rows.

    ``boxes`` are the reference's first argument (targets); ``query_boxes``
    the second (anchors) — result[i, j] = iou(target_i, anchor_j), exactly
    the orientation of rotate_iou_gpu_eval (nms_gpu.py:576-650).

    ``same_box_fix`` replicates check_same_boxes (nms_gpu.py:653-664):
    (near-)identical 5-DoF boxes are forced to IoU 1.

    ``impl``: 'auto' uses the Pallas VMEM-tiled kernel on TPU and the
    blocked-XLA path elsewhere; 'xla' / 'pallas' force one.
    """
    boxes = jnp.asarray(boxes, jnp.float32)
    query_boxes = jnp.asarray(query_boxes, jnp.float32)
    n = boxes.shape[0]

    use_pallas = (impl == "pallas"
                  or (impl == "auto" and jax.default_backend() == "tpu"))
    if use_pallas:
        from detection_3d_tpu.ops.pallas.rotated_iou_kernel import (
            rotated_iou_matrix_pallas)
        iou = rotated_iou_matrix_pallas(boxes, query_boxes, criterion)
    else:
        pad = (-n) % row_block
        padded = jnp.pad(boxes, ((0, pad), (0, 0)), constant_values=1.0)
        blocks = padded.reshape(-1, row_block, 5)

        def block_fn(blk):
            return jax.vmap(
                lambda b: _iou_row(b, query_boxes, criterion))(blk)

        iou = jax.lax.map(block_fn, blocks).reshape(
            -1, query_boxes.shape[0])[:n]

    if same_box_fix:
        dif = jnp.abs(boxes[:, None, :] - query_boxes[None, :, :])
        same = jnp.all(dif < 1e-6, axis=-1)
        iou = jnp.where(same, 1.0, iou)
    return iou


def z_interval_iou(targets_z, anchors_z):
    """z-overlap ratio. ``*_z``: (N, 2) of [z_start, z_size].

    overlap/common-extent as in iou_one_dim (rotate_nms_3d_torch.py:7-21);
    negative when disjoint. Returns (N_t, N_a).
    """
    t0 = targets_z[:, 0][:, None]
    t1 = (targets_z[:, 0] + targets_z[:, 1])[:, None]
    a0 = anchors_z[:, 0][None, :]
    a1 = (anchors_z[:, 0] + anchors_z[:, 1])[None, :]
    overlap = jnp.minimum(a1, t1) - jnp.maximum(a0, t0)
    common = jnp.maximum(a1, t1) - jnp.minimum(a0, t0)
    return overlap / common


@functools.partial(jax.jit, static_argnames=("criterion", "only_xy",
                                             "row_block"))
def boxes_iou_3d(targets, anchors, aug_thickness=None, criterion: int = -1,
                 only_xy: bool = False, row_block: int = 64):
    """3D IoU of yx_zb boxes: (N_t, 7) x (N_a, 7) -> (N_t, N_a).

    ``aug_thickness``: optional dict with keys target_Y/target_Z/anchor_Y/
    anchor_Z — minimum-size clamps applied before IoU, exactly as
    boxes_iou_3d (rotate_nms_3d_torch.py:48-88). BEV extraction takes
    columns [0,1,3,4,6] = (x, y, y_size, x_size, yaw).
    """
    targets = jnp.asarray(targets, jnp.float32)
    anchors = jnp.asarray(anchors, jnp.float32)
    if aug_thickness is None:
        aug_thickness = {"target_Y": 0.0, "target_Z": 0.0,
                         "anchor_Y": 0.0, "anchor_Z": 0.0}
    targets = targets.at[:, 3].set(
        jnp.maximum(targets[:, 3], aug_thickness["target_Y"]))
    anchors = anchors.at[:, 3].set(
        jnp.maximum(anchors[:, 3], aug_thickness["anchor_Y"]))
    targets = targets.at[:, 5].set(
        jnp.maximum(targets[:, 5], aug_thickness["target_Z"]))
    anchors = anchors.at[:, 5].set(
        jnp.maximum(anchors[:, 5], aug_thickness["anchor_Z"]))

    iou2d = rotated_iou_matrix(
        targets[:, jnp.array([0, 1, 3, 4, 6])],
        anchors[:, jnp.array([0, 1, 3, 4, 6])],
        criterion=criterion, row_block=row_block)
    if only_xy:
        return iou2d
    iouz = z_interval_iou(targets[:, jnp.array([2, 5])],
                          anchors[:, jnp.array([2, 5])])
    return iou2d * iouz
