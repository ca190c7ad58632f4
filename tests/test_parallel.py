"""Data-parallel training step over a virtual CPU mesh (SURVEY §2.7)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detection_3d_tpu.config import Config, Sparse3DConfig, CapacityConfig
from detection_3d_tpu.config.defaults import RPNConfig, ROIConfig
from detection_3d_tpu.data.synthetic import synthetic_building
from detection_3d_tpu.engine.solver import make_optimizer
from detection_3d_tpu.engine.trainer import pad_scene
from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
from detection_3d_tpu.models.structures import Boxes3D
from detection_3d_tpu.parallel.mesh import make_mesh, batched_train_step


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
@pytest.mark.slow
def test_batched_train_step_dp():
    import functools

    cfg = Config(
        classes=("background", "wall", "door", "window"),
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
                      batch_size_per_image=32, detections_per_img=16,
                      mlp_head_dim=32),
        backbone_out_channels=16,
        caps=CapacityConfig(max_points=4096,
                            voxel_caps=(2048, 1024, 512, 256), max_gt=8),
    )

    n_dev = 2
    mesh = make_mesh(n_dev)
    scenes = [synthetic_building(seed=i, num_points=2000, room=5.0,
                                 classes=cfg.classes,
                                 voxel_scale=cfg.sparse3d.voxel_scale)
              for i in range(n_dev)]
    padded = [pad_scene(cfg, s) for s in scenes]
    batch = {k: jnp.stack([jnp.asarray(p[k]) for p in padded])
             for k in padded[0]}

    model = SparseRCNN(cfg)
    rng = jax.random.PRNGKey(0)
    b0 = padded[0]
    table0 = voxelize_points(cfg, jnp.asarray(b0["points"]),
                             jnp.asarray(b0["feats"]),
                             jnp.asarray(b0["points_valid"]))
    gt0 = Boxes3D(jnp.asarray(b0["gt_boxes"]), jnp.asarray(b0["gt_valid"]))
    params = jax.jit(functools.partial(model.init, is_train=True))(
        rng, table0, gt0, jnp.asarray(b0["gt_labels"]), rng=rng)
    tx, _ = make_optimizer(cfg, params, iters_per_epoch=1)
    opt_state = tx.init(params)

    step = batched_train_step(cfg, model, tx, mesh)
    new_params, new_opt, loss = step(params, opt_state, batch, rng)
    assert np.isfinite(float(loss))
    # params actually changed
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), params, new_params)
    assert max(jax.tree_util.tree_leaves(delta)) > 0


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
@pytest.mark.slow
def test_trainer_dp_end_to_end(tmp_path):
    """Trainer.train itself on a 2-device dp mesh: shuffled batched
    epochs, pmean'd gradients, NaN-gated state transition, checkpoints."""
    from detection_3d_tpu.engine.trainer import Trainer
    from detection_3d_tpu.config.defaults import SolverConfig

    cfg = Config(
        classes=("background", "wall", "door", "window"),
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
                      batch_size_per_image=32, detections_per_img=16,
                      mlp_head_dim=32),
        backbone_out_channels=16,
        solver=SolverConfig(ims_per_batch=2, epochs=1),
        caps=CapacityConfig(max_points=4096,
                            voxel_caps=(2048, 1024, 512, 256), max_gt=8),
    )
    mesh = make_mesh(2)
    # 3 scenes with batch 2: the final batch is cycle-padded
    scenes = [synthetic_building(seed=i, num_points=2000, room=5.0,
                                 classes=cfg.classes,
                                 voxel_scale=cfg.sparse3d.voxel_scale)
              for i in range(3)]
    trainer = Trainer(cfg, output_dir=str(tmp_path), mesh=mesh)
    state = trainer.init_state(scenes[0], iters_per_epoch=2)
    p0 = state.params
    state = trainer.train(scenes, state, epochs=1)
    assert int(state.step) == 2  # ceil(3/2) steps
    delta = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), p0, state.params)
    assert max(jax.tree_util.tree_leaves(delta)) > 0
    assert (tmp_path / "model_final.msgpack").exists()


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs >=2 devices")
@pytest.mark.slow
def test_trainer_dp_eval_in_train(tmp_path):
    """eval-in-train on the DP path: per-shard train-time detections are
    all-gathered over dp (the reference gathers in-train eval across
    GPUs, trainer_sparse3d.py:95-104 + utils/comm.py) and the epoch-end
    evaluation runs over the whole batch (VERDICT r2 weak-4)."""
    import dataclasses
    from detection_3d_tpu.engine.trainer import Trainer
    from detection_3d_tpu.config.defaults import SolverConfig

    cfg = Config(
        classes=("background", "wall", "door", "window"),
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
                      batch_size_per_image=32, detections_per_img=16,
                      mlp_head_dim=32),
        backbone_out_channels=16,
        solver=SolverConfig(ims_per_batch=2, epochs=1),
        eval_in_train=1,
        caps=CapacityConfig(max_points=4096,
                            voxel_caps=(2048, 1024, 512, 256), max_gt=8),
    )
    mesh = make_mesh(2)
    scenes = [synthetic_building(seed=i, num_points=2000, room=5.0,
                                 classes=cfg.classes,
                                 voxel_scale=cfg.sparse3d.voxel_scale)
              for i in range(2)]
    trainer = Trainer(cfg, output_dir=str(tmp_path), mesh=mesh)
    state = trainer.init_state(scenes[0], iters_per_epoch=1)
    trainer.train(scenes, state, epochs=1)
    res = trainer.last_train_eval
    assert res is not None
    # both buildings' gts were accumulated (2 scenes x wall gt count)
    assert res.n_gt[1] == sum((s["gt_labels"] == 1).sum() for s in scenes)


def test_pad_scene_truncation_warns(caplog):
    """Silent input loss is not acceptable: exceeding max_points or
    max_gt must log a warning (VERDICT r2 weak-6)."""
    import logging

    cfg = Config(caps=CapacityConfig(max_points=16, max_gt=2))
    scene = {
        "points": np.zeros((40, 3), np.float32),
        "feats": np.zeros((40, cfg.in_channels), np.float32),
        "gt_boxes": np.zeros((5, 7), np.float32),
        "gt_labels": np.zeros((5,), np.int32),
    }
    with caplog.at_level(logging.WARNING,
                         logger="detection_3d_tpu.engine.trainer"):
        out = pad_scene(cfg, scene)
    msgs = [r.message for r in caplog.records]
    assert any("max_points" in m for m in msgs)
    assert any("max_gt" in m for m in msgs)
    assert out["points"].shape[0] == 16 and out["gt_boxes"].shape[0] == 2
