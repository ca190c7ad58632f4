import numpy as np
import jax
import jax.numpy as jnp
import pytest

from detection_3d_tpu.config import Config, Sparse3DConfig, CapacityConfig
from detection_3d_tpu.config.defaults import RPNConfig, ROIConfig
from detection_3d_tpu.data.synthetic import synthetic_building
from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
from detection_3d_tpu.models.structures import Boxes3D


def tiny_cfg(**kw):
    base = dict(
        classes=("background", "wall", "door", "window"),
        sparse3d=Sparse3DConfig(
            voxel_scale=20,
            voxel_full_scale=(256, 256, 64),
            nplanes_front=(8, 16, 16, 32, 32),
            kernels=((2, 2, 2),) * 4,
            strides=((2, 2, 2),) * 4,
            nplane_map=16,
        ),
        rpn=RPNConfig(
            rpn_scales_from_top=(2, 1),
            rpn_3d_2d_selector=(0, 1, 2),
            anchor_sizes_3d=((0.2, 0.5, 3), (0.4, 1.5, 3),
                             (0.6, 2.5, 3)),
            use_yaws=(1, 1, 1),
            fpn_pre_nms_top_n_train=256, fpn_pre_nms_top_n_test=256,
            fpn_post_nms_top_n_train=64, fpn_post_nms_top_n_test=64,
            batch_size_per_image=64,
        ),
        roi=ROIConfig(
            pooler_scales_from_top=(2, 1),
            batch_size_per_image=64,
            detections_per_img=32,
            mlp_head_dim=32,
            pooler_resolution=(6, 8, 4),
        ),
        backbone_out_channels=16,
        caps=CapacityConfig(max_points=8192,
                            voxel_caps=(4096, 2048, 1024, 512, 256),
                            max_gt=16),
    )
    base.update(kw)
    return Config(**base)


@pytest.fixture(scope="module")
def scene():
    return synthetic_building(seed=0, num_points=6000, room=6.0,
                              classes=("background", "wall", "door",
                                       "window"),
                              voxel_scale=20)


def prep(cfg, scene):
    n = cfg.caps.max_points
    pts = np.zeros((n, 3), np.float32)
    fts = np.zeros((n, 9), np.float32)
    m = min(scene["points"].shape[0], n)
    pts[:m] = scene["points"][:m]
    fts[:m] = scene["feats"][:m]
    valid = np.arange(n) < m

    g = cfg.caps.max_gt
    gtb = np.zeros((g, 7), np.float32)
    gtb[:, 3:6] = 0.1
    gtl = np.zeros((g,), np.int32)
    mg = min(scene["gt_boxes"].shape[0], g)
    gtb[:mg] = scene["gt_boxes"][:mg]
    gtl[:mg] = scene["gt_labels"][:mg]
    gt = Boxes3D(jnp.asarray(gtb), jnp.arange(g) < mg)
    table = voxelize_points(cfg, jnp.asarray(pts), jnp.asarray(fts),
                            jnp.asarray(valid))
    return table, gt, jnp.asarray(gtl)


@pytest.mark.slow
def test_train_and_eval_forward(scene):
    cfg = tiny_cfg()
    table, gt, gt_labels = prep(cfg, scene)
    model = SparseRCNN(cfg)
    rng = jax.random.PRNGKey(0)
    params = model.init(rng, table, gt, gt_labels, is_train=True, rng=rng)

    losses, _ = model.apply(params, table, gt, gt_labels, is_train=True,
                            rng=rng)
    assert set(losses) == {"loss_objectness", "loss_rpn_box_reg",
                           "loss_classifier_roi", "loss_box_reg_roi"}
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
        assert float(v) >= 0, k

    det = model.apply(params, table, is_train=False)
    assert det.boxes.shape[-1] == 7
    assert det.capacity >= cfg.roi_detections_per_img
    s = np.asarray(det.fields["scores"])
    v = np.asarray(det.valid)
    assert np.all(np.isfinite(s[v])) if v.any() else True


@pytest.mark.slow
def test_train_grad_step_decreases_loss(scene):
    cfg = tiny_cfg()
    table, gt, gt_labels = prep(cfg, scene)
    model = SparseRCNN(cfg)
    rng = jax.random.PRNGKey(1)
    params = model.init(rng, table, gt, gt_labels, is_train=True, rng=rng)

    def total_loss(p, key):
        losses, _ = model.apply(p, table, gt, gt_labels, is_train=True,
                                rng=key)
        return sum(losses.values())

    key = jax.random.PRNGKey(2)
    l0, g = jax.value_and_grad(total_loss)(params, key)
    assert np.isfinite(float(l0))
    flat = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in flat)
    # SGD steps with the same rng must reduce the loss
    lr = 1e-2
    p2 = jax.tree_util.tree_map(lambda p, gg: p - lr * gg, params, g)
    l1 = total_loss(p2, key)
    assert float(l1) < float(l0)


def test_rpn_only_mode(scene):
    """cfg.rpn_only: no roi_heads — train returns only RPN losses,
    eval returns proposals as score-sorted class-agnostic detections
    (sparse_rcnn.py:64-68, rpn_sparse3d.py:294-305)."""
    cfg = tiny_cfg(rpn_only=True).validate()
    model = SparseRCNN(cfg)
    table, gt, gtl = prep(cfg, scene)
    rng = jax.random.PRNGKey(0)
    params = jax.jit(
        lambda r: model.init(r, table, gt, gtl, is_train=True, rng=r))(rng)
    losses, _ = jax.jit(
        lambda p, r: model.apply(p, table, gt, gtl, is_train=True, rng=r)
    )(params, rng)
    assert set(losses) == {"loss_objectness", "loss_rpn_box_reg"}

    det = jax.jit(lambda p: model.apply(p, table, is_train=False))(params)
    s = np.asarray(det.fields["scores"])
    v = np.asarray(det.valid)
    assert v.any()
    sv = s[v]
    assert np.all(np.diff(sv) <= 1e-6)  # high-to-low confidence order
    assert np.all(np.asarray(det.fields["labels"])[v] == 1)


def test_config_validate_rejects_silent_noops():
    with pytest.raises(AssertionError):
        tiny_cfg(separate_classes=(("door",),),
                 separate_rpn=False).validate()
    from detection_3d_tpu.config.defaults import SolverConfig
    with pytest.raises(NotImplementedError):
        tiny_cfg(solver=SolverConfig(track_running_stats=True)).validate()


@pytest.mark.slow
def test_eval_in_train_accumulation(scene, tmp_path):
    """cfg.eval_in_train: the train step postprocesses non-GT sampled
    proposals into predictions and the Trainer evaluates at epoch end
    (box_head.py:118-127, trainer_sparse3d.py:95-104,165-172)."""
    from detection_3d_tpu.engine.trainer import Trainer

    cfg = tiny_cfg(eval_in_train=1).validate()
    trainer = Trainer(cfg, output_dir=str(tmp_path))
    state = trainer.init_state(scene, iters_per_epoch=1)
    trainer.train([scene], state, epochs=1)
    res = trainer.last_train_eval
    assert res is not None
    assert len(res.n_gt) == cfg.num_classes
    assert res.n_gt[1:].sum() > 0  # gts were counted


def test_bad_scene_culling(scene, tmp_path):
    """Strike-based bad-scene culling: a scene that repeatedly yields a
    non-finite step is dropped from the rotation and persisted to
    bad_scenes.json — the runtime analogue of the reference's curated
    blocklist (rm_bad_samples + SceneSamples.bad_scenes,
    suncg_dataset.py:272-277)."""
    import json
    import os
    from detection_3d_tpu.engine.trainer import Trainer

    cfg = tiny_cfg()
    trainer = Trainer(cfg, output_dir=str(tmp_path))
    bad = {k: v.copy() if hasattr(v, "copy") else v
           for k, v in scene.items()}
    bad["scene_name"] = "cursed"
    marker = np.float32(123.0)
    bad["points"] = bad["points"].copy()
    bad["points"][0, 2] = marker

    calls = {"bad": 0, "good": 0}

    def fake_step(state, batch, rng):
        is_bad = bool(np.asarray(batch["points"][0, 2]) == marker)
        calls["bad" if is_bad else "good"] += is_bad or 1
        ok = jnp.asarray(not is_bad)
        total = jnp.asarray(np.nan if is_bad else 1.0, jnp.float32)
        return state, total, {"loss_objectness": total}, ok, \
            jnp.asarray(0), ()

    trainer._step_fn = fake_step
    state = trainer.init_state(scene, iters_per_epoch=2)
    trainer.train([scene, bad], state, epochs=6)

    path = os.path.join(str(tmp_path), "bad_scenes.json")
    assert os.path.exists(path)
    with open(path) as f:
        assert json.load(f) == ["cursed"]
    # the bad scene stops being visited once culled (3 strikes)
    assert calls["bad"] == trainer.bad_scene_strikes

    from detection_3d_tpu.data.suncg import rm_bad_samples
    assert rm_bad_samples(["a", "cursed", "b"], path) == ["a", "b"]

    # culling every scene raises instead of spinning on nothing
    trainer2 = Trainer(cfg, output_dir=str(tmp_path / "t2"))
    trainer2._step_fn = fake_step
    with pytest.raises(RuntimeError):
        trainer2.train([bad], state, epochs=6)


@pytest.mark.slow
def test_scan_steps_training(scene, tmp_path):
    """Trainer.scan_steps = K runs K steps per device call via lax.scan
    (host round-trip amortization); bookkeeping still sees every step
    and the state advances K steps per call."""
    from detection_3d_tpu.engine.trainer import Trainer

    cfg = tiny_cfg()
    scenes = [scene,
              {k: (v.copy() if hasattr(v, "copy") else v)
               for k, v in scene.items()}]
    trainer = Trainer(cfg, output_dir=str(tmp_path))
    trainer.scan_steps = 2
    state = trainer.init_state(scene, iters_per_epoch=len(scenes))
    out = trainer.train(scenes, state, epochs=2)
    assert int(out.step) == 4           # 2 scenes x 2 epochs
    assert trainer.meters.meters["loss"].count == 4
    assert np.isfinite(trainer.meters.meters["loss"].avg)
    # params actually moved
    d = jax.tree_util.tree_map(
        lambda a, b: float(np.abs(np.asarray(a - b)).sum()),
        out.params, state.params)
    assert sum(jax.tree_util.tree_leaves(d)) > 0
