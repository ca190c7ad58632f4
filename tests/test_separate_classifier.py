"""Separate-classifier (multi-group, 3G6c-style) path: unit semantics +
end-to-end train/eval forward."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detection_3d_tpu.config import Config, Sparse3DConfig, CapacityConfig
from detection_3d_tpu.config.defaults import RPNConfig, ROIConfig
from detection_3d_tpu.models.separate_classifier import (
    grouped_class_ids, org_to_group_local, separate_targets,
    slice_group_logits, merge_group_detections,
)
from detection_3d_tpu.models.structures import Boxes3D


def sep_cfg():
    return Config(
        classes=("background", "wall", "door", "window", "ceiling",
                 "floor"),
        separate_classes=(("wall",), ("ceiling", "floor")),
        sparse3d=Sparse3DConfig(
            voxel_scale=20, voxel_full_scale=(128, 128, 64),
            nplanes_front=(8, 16, 16, 32),
            kernels=((2, 2, 2),) * 3, strides=((2, 2, 2),) * 3,
            nplane_map=16),
        rpn=RPNConfig(
            rpn_scales_from_top=(2, 1), rpn_3d_2d_selector=(0, 1, 2),
            anchor_sizes_3d=((0.2, 0.5, 3), (0.4, 1.5, 3), (0.6, 2.5, 3)),
            use_yaws=(1, 1, 1),
            fpn_pre_nms_top_n_train=128, fpn_pre_nms_top_n_test=128,
            fpn_post_nms_top_n_train=32, fpn_post_nms_top_n_test=32,
            batch_size_per_image=32),
        roi=ROIConfig(pooler_scales_from_top=(2, 1),
                      batch_size_per_image=48, detections_per_img=24,
                      mlp_head_dim=32),
        backbone_out_channels=16,
        caps=CapacityConfig(max_points=4096,
                            voxel_caps=(2048, 1024, 512, 256), max_gt=8),
    )


def test_grouped_class_ids():
    cfg = sep_cfg()
    groups = grouped_class_ids(cfg)
    # canonical labels: wall=1, window=2, door=3, floor=4, ceiling=5
    # group 0 = remaining incl background; fresh bg ids 6, 7
    assert groups[0] == (0, 2, 3)
    assert groups[1] == (6, 1)
    assert groups[2] == (7, 4, 5)


def test_org_to_group_local_roundtrip():
    cfg = sep_cfg()
    table = np.asarray(org_to_group_local(cfg))
    groups = grouped_class_ids(cfg)
    for gi, grp in enumerate(groups):
        for li, c in enumerate(grp):
            assert tuple(table[c]) == (gi, li)


def test_separate_targets_masks():
    cfg = sep_cfg()
    boxes = jnp.zeros((4, 7)).at[:, 3:6].set(1.0)
    labels = jnp.asarray([1, 2, 4, 5])  # wall, window, floor, ceiling
    gt = Boxes3D(boxes, jnp.ones(4, bool))
    groups = separate_targets(cfg, gt, labels)
    assert len(groups) == 3
    g0, l0 = groups[0]
    np.testing.assert_array_equal(np.asarray(g0.valid),
                                  [False, True, False, False])
    assert int(l0[1]) == 1  # window local id in (0,2,3)
    g1, l1 = groups[1]
    np.testing.assert_array_equal(np.asarray(g1.valid),
                                  [True, False, False, False])
    assert int(l1[0]) == 1  # wall local id in (6,1)
    g2, l2 = groups[2]
    np.testing.assert_array_equal(np.asarray(g2.valid),
                                  [False, False, True, True])
    assert int(l2[2]) == 1 and int(l2[3]) == 2  # floor, ceiling local


def test_slice_and_merge():
    cfg = sep_cfg()
    nc_total = cfg.num_classes + len(cfg.separate_classes)  # 8
    logits = jnp.arange(2 * nc_total, dtype=jnp.float32).reshape(2, nc_total)
    boxreg = jnp.arange(2 * nc_total * 7, dtype=jnp.float32).reshape(2, -1)
    lg, bg = slice_group_logits(cfg, logits, boxreg, 1)
    assert lg.shape == (2, 2)  # group 1 = (6, 1)
    np.testing.assert_array_equal(np.asarray(lg[0]), [6.0, 1.0])
    assert bg.shape == (2, 14)

    dets = []
    for gi, grp in enumerate(grouped_class_ids(cfg)):
        d = Boxes3D(jnp.zeros((3, 7)), jnp.ones(3, bool),
                    {"scores": jnp.ones(3) * gi,
                     "labels": jnp.ones(3, jnp.int32)})
        dets.append(d)
    merged = merge_group_detections(cfg, dets)
    lab = np.asarray(merged.fields["labels"])
    # local label 1 maps back per group: g0->2 (window), g1->1 (wall),
    # g2->4 (floor)
    np.testing.assert_array_equal(lab, [2, 2, 2, 1, 1, 1, 4, 4, 4])


@pytest.mark.slow
def test_separate_e2e_forward():
    from detection_3d_tpu.data.synthetic import synthetic_building
    from detection_3d_tpu.engine.trainer import pad_scene
    from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
    import functools

    cfg = sep_cfg()
    scene = synthetic_building(seed=0, num_points=3000, room=5.0,
                               classes=cfg.classes,
                               voxel_scale=cfg.sparse3d.voxel_scale)
    batch = {k: jnp.asarray(v) for k, v in pad_scene(cfg, scene).items()}
    table = voxelize_points(cfg, batch["points"], batch["feats"],
                            batch["points_valid"])
    gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])
    model = SparseRCNN(cfg)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(functools.partial(model.init, is_train=True))(
        rng, table, gt, batch["gt_labels"], rng=rng)

    losses, _ = model.apply(params, table, gt, batch["gt_labels"],
                            is_train=True, rng=rng)
    # 3 groups x (rpn obj + rpn box + roi cls + roi box)
    assert len(losses) == 12
    for k, v in losses.items():
        assert np.isfinite(float(v)), k

    det = model.apply(params, table, is_train=False)
    lab = np.asarray(det.fields["labels"])[np.asarray(det.valid)]
    # merged detections carry ORIGINAL class ids (1..5)
    if lab.size:
        assert lab.min() >= 1 and lab.max() <= 5
