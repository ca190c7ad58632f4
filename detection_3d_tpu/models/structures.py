"""Padded box containers — the TPU-native replacement for BoxList3D.

The reference's BoxList3D
(/root/reference/maskrcnn_benchmark/structures/bounding_box_3d.py:113-696)
tracks ragged batches with an ``examples_idxscope`` index table. On TPU we
process ONE example per pipeline invocation (batching = ``jax.vmap`` /
``shard_map`` over buildings) and every box set is a static-capacity array
with a validity mask. Fields live in a flat dict of equally-shaped arrays.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

from detection_3d_tpu.ops.geometry import limit_yaw


@jax.tree_util.register_pytree_node_class
class Boxes3D:
    """(N, 7) yx_zb boxes + (N,) validity + extra per-box fields."""

    def __init__(self, boxes, valid, fields: Optional[Dict] = None):
        self.boxes = boxes
        self.valid = valid
        self.fields = dict(fields or {})

    def tree_flatten(self):
        keys = tuple(sorted(self.fields.keys()))
        return (self.boxes, self.valid) + tuple(self.fields[k] for k in keys), keys

    @classmethod
    def tree_unflatten(cls, keys, children):
        boxes, valid = children[0], children[1]
        return cls(boxes, valid, dict(zip(keys, children[2:])))

    @property
    def capacity(self) -> int:
        return self.boxes.shape[0]

    @property
    def num(self):
        return jnp.sum(self.valid.astype(jnp.int32))

    def with_fields(self, **kw):
        f = dict(self.fields)
        f.update(kw)
        return Boxes3D(self.boxes, self.valid, f)

    def clamp_size(self, min_size: float = 0.001):
        """bounding_box_3d.py:375-376 — proposals get a size floor before
        ROI pooling."""
        sizes = jnp.maximum(self.boxes[:, 3:6], min_size)
        boxes = jnp.concatenate(
            [self.boxes[:, :3], sizes, self.boxes[:, 6:]], axis=-1)
        return Boxes3D(boxes, self.valid, self.fields)

    def limit_yaw(self):
        yaw = limit_yaw(self.boxes[:, 6:7], yx_zb=True)
        boxes = jnp.concatenate([self.boxes[:, :6], yaw], axis=-1)
        return Boxes3D(boxes, self.valid, self.fields)

    def gather(self, idx, new_valid=None):
        """Select rows by index array (idx == -1 rows become invalid)."""
        safe = jnp.clip(idx, 0, self.capacity - 1)
        valid = self.valid[safe] & (idx >= 0)
        if new_valid is not None:
            valid = valid & new_valid
        fields = {k: v[safe] for k, v in self.fields.items()}
        return Boxes3D(self.boxes[safe], valid, fields)


def concat_boxes(a: Boxes3D, b: Boxes3D, fields=()):
    """Static concat of two padded box sets (both keep their masks)."""
    boxes = jnp.concatenate([a.boxes, b.boxes], axis=0)
    valid = jnp.concatenate([a.valid, b.valid], axis=0)
    f = {}
    for k in fields:
        f[k] = jnp.concatenate([a.fields[k], b.fields[k]], axis=0)
    return Boxes3D(boxes, valid, f)
