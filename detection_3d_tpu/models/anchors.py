"""Sparse-site anchor generation.

Anchors exist only at ACTIVE feature-map voxels — the reference's key
long-context trick (anchor_generator_sparse3d.py:88-120): per level,
integer site coords scale by (anchor_stride / voxel_scale) to meters and
broadcast-add the per-level cell anchors. Flatten order is
[location, anchor] (location-major), matching the head's output reshape
(rpn_sparse3d.py:117-124).

Cell anchors (generate_anchors_3d_{yaws,ratio},
anchor_generator_sparse3d.py:207-241): yx_zb boxes [0,0,0, sy, sx, sz, yaw]
with one size per level x len(yaws) yaws, or (use_yaws=0) yaw=0 x
len(ratios) size ratios. ANCHOR_SIZES_3D entries are (y, x, z) sizes; the
centroid z is the box BOTTOM.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from detection_3d_tpu.config.defaults import Config
from detection_3d_tpu.models.structures import Boxes3D
from detection_3d_tpu.ops.sparse import SparseTensor


def cell_anchors(cfg: Config):
    """Per-level (A, 7) numpy cell anchors; A = len(yaws) == len(ratios)."""
    out = []
    for size, use_yaw in zip(cfg.rpn.anchor_sizes_3d, cfg.rpn.use_yaws):
        rows = []
        if use_yaw:
            for yaw in cfg.rpn.yaws:
                rows.append([0, 0, 0, size[0], size[1], size[2], yaw])
        else:
            for ratio in cfg.rpn.ratios:
                rows.append([0, 0, 0, size[0] * ratio[0], size[1] * ratio[1],
                             size[2] * ratio[2], 0.0])
        out.append(np.array(rows, np.float32))
    return out


def generate_anchors(cfg: Config, rpn_maps) -> Boxes3D:
    """All-level anchors for one example.

    Args:
      rpn_maps: list[SparseTensor] — the selected RPN feature maps.

    Returns a Boxes3D of capacity sum(V_l * A) in [level, location, anchor]
    order, with validity from each table's row mask.
    """
    cells = cell_anchors(cfg)
    strides = cfg.anchor_strides()
    vs = float(cfg.sparse3d.voxel_scale)
    a = cfg.rpn.num_anchors_per_location

    all_boxes = []
    all_valid = []
    for lvl, table in enumerate(rpn_maps):
        stride = jnp.asarray(strides[lvl], jnp.float32)
        centers = table.coords[:, :3].astype(jnp.float32) * stride / vs
        cent7 = jnp.concatenate(
            [centers, jnp.zeros((centers.shape[0], 4), jnp.float32)], axis=-1)
        base = jnp.asarray(cells[lvl])  # (A, 7)
        boxes = cent7[:, None, :] + base[None, :, :]  # (V, A, 7)
        all_boxes.append(boxes.reshape(-1, 7))
        all_valid.append(jnp.repeat(table.row_valid, a))
    return Boxes3D(jnp.concatenate(all_boxes, axis=0),
                   jnp.concatenate(all_valid, axis=0))
