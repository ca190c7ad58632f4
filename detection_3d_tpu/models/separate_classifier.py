"""Separate-classifier (multi-group) detection support.

Parity with SeperateClassifier
(/root/reference/maskrcnn_benchmark/modeling/seperate_classifier.py:7-321):

  * group 0 = remaining class ids (background included); each separated
    group g>=1 gets a FRESH background id (num_classes + g - 1) prepended,
    so the shared ROI head predicts num_classes + G - 1 class columns;
  * per group: gt boxes filtered by membership, labels remapped to
    group-local indices; RPN objectness column gi / box columns
    [7gi, 7gi+7) belong to group gi;
  * ROI loss/postprocess slice the head's class columns by the group's
    global ids and run CE/NMS in the group-local label space, mapping
    detection labels back to original ids at the end.

Static-shape versions: group membership becomes a validity mask (no row
filtering), so every group sees the same (max_gt,) padded arrays.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from detection_3d_tpu.config.defaults import Config
from detection_3d_tpu.models.structures import Boxes3D


def grouped_class_ids(cfg: Config) -> Tuple[Tuple[int, ...], ...]:
    """Global class-id columns per group (seperate_classifier.py:26-36)."""
    nc = cfg.num_classes
    sep = [sorted(grp) for grp in cfg.separate_classes_id()]
    flat = {c for grp in sep for c in grp}
    remaining = tuple(c for c in range(nc) if c not in flat)
    groups = [remaining]
    next_bg = nc
    for grp in sep:
        groups.append((next_bg,) + tuple(grp))
        next_bg += 1
    return tuple(groups)


def org_to_group_local(cfg: Config):
    """(nc_total, 2) array: original label -> (group, local index)."""
    groups = grouped_class_ids(cfg)
    nc_total = cfg.num_classes + len(cfg.separate_classes)
    table = np.full((nc_total, 2), -1, np.int32)
    for gi, grp in enumerate(groups):
        for li, c in enumerate(grp):
            table[c] = (gi, li)
    return jnp.asarray(table)


def separate_targets(cfg: Config, gt: Boxes3D, gt_labels):
    """Per-group (Boxes3D with membership-masked validity, local labels)."""
    table = org_to_group_local(cfg)
    safe = jnp.clip(gt_labels.astype(jnp.int32), 0, table.shape[0] - 1)
    gid = table[safe, 0]
    lid = table[safe, 1]
    out = []
    for gi in range(cfg.group_num):
        member = (gid == gi) & gt.valid
        out.append((Boxes3D(gt.boxes, member, gt.fields),
                    jnp.where(member, lid, 0)))
    return out


def slice_group_logits(cfg: Config, class_logits, box_regression, gi: int):
    """Head outputs -> this group's class columns
    (seperate_classifier.py:221-238)."""
    cols = jnp.asarray(grouped_class_ids(cfg)[gi])
    logits_g = class_logits[:, cols]
    n = box_regression.shape[0]
    nc_total = cfg.num_classes + len(cfg.separate_classes)
    reg = box_regression.reshape(n, nc_total, 7)[:, cols, :]
    return logits_g, reg.reshape(n, -1)


def merge_group_detections(cfg: Config, results_g: List[Boxes3D]) -> Boxes3D:
    """Concat per-group detections, mapping local labels back to original
    ids (seperate_classifier.py:297-321)."""
    groups = grouped_class_ids(cfg)
    boxes, valid, scores, labels = [], [], [], []
    for gi, det in enumerate(results_g):
        local_to_org = jnp.asarray(groups[gi], jnp.int32)
        l = local_to_org[jnp.clip(det.fields["labels"], 0,
                                  len(groups[gi]) - 1)]
        boxes.append(det.boxes)
        valid.append(det.valid)
        scores.append(det.fields["scores"])
        labels.append(l)
    return Boxes3D(jnp.concatenate(boxes, 0), jnp.concatenate(valid, 0),
                   {"scores": jnp.concatenate(scores, 0),
                    "labels": jnp.concatenate(labels, 0)})
