"""Spatial sharding (halo exchange) parity vs the single-device backbone.

Runs the identical SparseFPN params over (a) one device and (b) a 2-shard
``sp`` mesh where each shard owns an x-slab and exchanges halo columns
via ppermute (parallel/spatial.py). Every OWNED output row must match
the single-device features (same coords -> same values).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh

from detection_3d_tpu.config import Config, Sparse3DConfig, CapacityConfig
from detection_3d_tpu.config.defaults import RPNConfig, ROIConfig
from detection_3d_tpu.models.backbone import SparseFPN, build_pyramid
from detection_3d_tpu.models.detector import voxelize_points
from detection_3d_tpu.parallel.spatial import spatial_fpn_apply

# The whole module is slow-tier: every test compiles a shard_map
# program over the 8-device CPU mesh, ~60-120s of trace+compile EACH on
# this 1-CPU host even with a warm persistent cache (measured r5: the
# two cheapest tests = 184s). Fast-tier multi-chip coverage comes from
# __graft_entry__.dryrun_multichip(8) (driver-run every round: dp8 AND
# dp2 x sp4 composed steps) + tests/test_parallel.py; this module is
# the deep parity suite behind them.
pytestmark = pytest.mark.slow

SHARD_CAPS = (2048, 1024, 512)
HALO_CAPS = (512, 128, 32)   # Y_s * Z_s: exact upper bound


@pytest.fixture(scope="module")
def cfg():
    # 3-scale FPN on a 64 x 32 x 16 grid; X=64 divisible by 2 shards * 4
    return Config(
        sparse3d=Sparse3DConfig(
            voxel_full_scale=(64, 32, 16),
            nplanes_front=(8, 16, 16),
            kernels=((2, 2, 2),) * 2,
            strides=((2, 2, 2),) * 2,
            nplane_map=16,
        ),
        rpn=RPNConfig(rpn_scales_from_top=(2, 1),
                      rpn_3d_2d_selector=(0, 2, 3),
                      anchor_sizes_3d=((0.2, 0.5, 3), (0.4, 1.5, 3),
                                       (0.6, 2.5, 3)),
                      use_yaws=(1, 1, 1)),
        roi=ROIConfig(pooler_scales_from_top=(2, 1)),
        caps=CapacityConfig(max_points=4096,
                            voxel_caps=(4096, 2048, 1024)),
    )


@pytest.fixture(scope="module")
def scene():
    rng = np.random.RandomState(3)
    n = 2000
    # points concentrated on a few "walls" so slab boundaries are busy
    pts = np.c_[rng.uniform(0, 64, n), rng.uniform(0, 32, n),
                rng.uniform(0, 16, n)].astype(np.float32)
    pts[: n // 3, 0] = 31.0 + rng.uniform(0, 2, n // 3)  # straddle x=32
    feats = rng.randn(n, 9).astype(np.float32)
    valid = np.ones(n, bool)
    return jnp.array(pts), jnp.array(feats), jnp.array(valid)


@pytest.mark.parametrize(
    "n_shards", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_spatial_fpn_parity(cfg, scene, n_shards):
    pts, feats, valid = scene
    table0 = voxelize_points(cfg, pts, feats, valid)
    pyr = build_pyramid(table0, cfg)
    fpn = SparseFPN(cfg)
    params = fpn.init(jax.random.PRNGKey(0), table0, pyr)
    rpn_ref, roi_ref = fpn.apply(params, table0, pyr)

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sp",))
    rpn_sp, roi_sp, own_valid = spatial_fpn_apply(
        cfg, mesh, params, pts, feats, valid, SHARD_CAPS, HALO_CAPS)

    # strict parity on roi maps (3d, own_valid indexed per scale)
    n_scales = cfg.sparse3d.num_scales
    for i, i_from_top in enumerate(cfg.roi.pooler_scales_from_top):
        scale = n_scales - 1 - i_from_top
        ref_t = roi_ref[i]
        sp_t = roi_sp[i]
        ref_coords = np.asarray(ref_t.coords)
        ref_feats = np.asarray(ref_t.feats)
        ref_valid = np.asarray(ref_t.row_valid)
        key = {tuple(c): i2 for i2, c in enumerate(ref_coords[ref_valid])}
        own = np.asarray(own_valid[scale])
        total = 0
        for d in range(n_shards):
            coords = np.asarray(sp_t.coords[d])
            f = np.asarray(sp_t.feats[d])
            for r in np.nonzero(own[d])[0]:
                c = tuple(coords[r])
                assert c in key, f"roi{i}: shard {d} row {c} not in ref"
                np.testing.assert_allclose(
                    f[r], ref_feats[key[c]], atol=2e-4, rtol=2e-4,
                    err_msg=f"roi{i}: shard {d} coords {c}")
                total += 1
        assert total == len(key), f"roi{i}: covered {total}/{len(key)}"


def test_halo_overflow_warns(cfg, scene, caplog):
    """An undersized halo cap must be surfaced, not silently corrupt
    slab-boundary convolutions (VERDICT r2 weak-6)."""
    import logging

    pts, feats, valid = scene
    table0 = voxelize_points(cfg, pts, feats, valid)
    fpn = SparseFPN(cfg)
    pyr = build_pyramid(table0, cfg)
    params = fpn.init(jax.random.PRNGKey(0), table0, pyr)
    mesh = Mesh(np.array(jax.devices()[:2]), ("sp",))
    with caplog.at_level(logging.WARNING,
                         logger="detection_3d_tpu.parallel.spatial"):
        spatial_fpn_apply(cfg, mesh, params, pts, feats, valid,
                          SHARD_CAPS, (2, 2, 2))
    assert any("halo" in r.message for r in caplog.records)


@pytest.mark.parametrize(
    "n_shards", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_spatial_predict_groups_matches_single_device(cfg, scene, n_shards):
    """spatial_predict with separate-classifier groups (the 3G6c path)
    must reproduce single-device detections — lifts the single-group
    restriction (VERDICT r2 weak-5)."""
    import dataclasses
    import functools
    from detection_3d_tpu.models.detector import SparseRCNN
    from detection_3d_tpu.parallel.spatial import spatial_predict

    gcfg = dataclasses.replace(
        cfg, classes=("background", "wall", "door", "window", "ceiling",
                      "floor"),
        separate_classes=((("wall",), ("ceiling", "floor"))))
    pts, feats, valid = scene
    model = SparseRCNN(gcfg)
    table0 = voxelize_points(gcfg, pts, feats, valid)
    params = jax.jit(functools.partial(model.init, is_train=False))(
        jax.random.PRNGKey(0), table0)
    det_ref = model.apply(params, table0, is_train=False)

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sp",))
    batch = {"points": pts, "feats": feats, "points_valid": valid}
    boxes, dvalid, scores, labels = spatial_predict(
        gcfg, mesh, params, batch, SHARD_CAPS, HALO_CAPS)

    rv = np.asarray(det_ref.valid)
    rb = np.asarray(det_ref.boxes)[rv]
    rs = np.asarray(det_ref.fields["scores"])[rv]
    rl = np.asarray(det_ref.fields["labels"])[rv]
    sv = np.asarray(dvalid)
    sb = np.asarray(boxes)[sv]
    ss = np.asarray(scores)[sv]
    sl = np.asarray(labels)[sv]
    assert sb.shape[0] == rb.shape[0]
    ro = np.lexsort((rs, rl))
    so = np.lexsort((ss, sl))
    np.testing.assert_array_equal(sl[so], rl[ro])
    np.testing.assert_allclose(ss[so], rs[ro], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(sb[so], rb[ro], atol=5e-3, rtol=1e-3)


def _scene_gt(cfg):
    """A few gt boxes inside the 64x32x16 grid (yx_zb, meters at
    voxel_scale=50 default... the test cfg treats coords as voxels and
    boxes in meters with voxel_scale from cfg)."""
    vs = cfg.sparse3d.voxel_scale
    gt = np.array([
        [16 / vs, 16 / vs, 2 / vs, 2 / vs, 12 / vs, 10 / vs, 0.0],
        [40 / vs, 10 / vs, 2 / vs, 3 / vs, 14 / vs, 10 / vs, 0.3],
    ], np.float32)
    boxes = np.zeros((8, 7), np.float32)
    boxes[:, 3:6] = 0.1
    boxes[:2] = gt
    valid = np.arange(8) < 2
    labels = np.zeros((8,), np.int32)
    labels[:2] = 1
    return boxes, valid, labels


@pytest.mark.parametrize(
    "n_shards", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_spatial_train_step_grad_parity(cfg, scene, n_shards):
    """The sharded training gradient must equal the single-device
    gradient (VERDICT r2 item 4: sharded training, not just inference).

    Covers: halo-exchange transpose (ppermute reversal), all_gather
    transpose (reduce-scatter of head cotangents), BN-psum backward and
    the 1/n_shards loss scaling argument of make_spatial_grad_fn.
    """
    import functools
    from detection_3d_tpu.models.detector import SparseRCNN
    from detection_3d_tpu.models.structures import Boxes3D
    from detection_3d_tpu.parallel.spatial import make_spatial_grad_fn

    pts, feats, valid = scene
    gt_boxes, gt_valid, gt_labels = _scene_gt(cfg)
    model = SparseRCNN(cfg)
    table0 = voxelize_points(cfg, pts, feats, valid)
    rng = jax.random.PRNGKey(11)
    gt = Boxes3D(jnp.asarray(gt_boxes), jnp.asarray(gt_valid))
    params = jax.jit(functools.partial(model.init, is_train=True))(
        jax.random.PRNGKey(0), table0, gt, jnp.asarray(gt_labels),
        rng=rng)

    def loss_ref(p):
        losses, _ = model.apply(p, table0, gt, jnp.asarray(gt_labels),
                                is_train=True, rng=rng)
        return sum(jax.tree_util.tree_leaves(losses)), losses

    (total_ref, losses_ref), g_ref = jax.value_and_grad(
        loss_ref, has_aux=True)(params)

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sp",))
    batch = {"points": pts, "feats": feats, "points_valid": valid,
             "gt_boxes": jnp.asarray(gt_boxes),
             "gt_valid": jnp.asarray(gt_valid),
             "gt_labels": jnp.asarray(gt_labels)}
    grad_fn = make_spatial_grad_fn(cfg, mesh, SHARD_CAPS, HALO_CAPS)
    total_sp, losses_sp, g_sp, ovf = grad_fn(params, batch, rng)

    assert not bool(ovf)
    np.testing.assert_allclose(float(total_sp), float(total_ref),
                               atol=1e-4, rtol=1e-4)
    for k, v in losses_ref.items():
        np.testing.assert_allclose(float(losses_sp[k]), float(v),
                                   atol=1e-4, rtol=1e-4, err_msg=k)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_sp = dict(
        (jax.tree_util.keystr(kp), x)
        for kp, x in jax.tree_util.tree_leaves_with_path(g_sp))
    # per-leaf relative Frobenius error: catches any mis-scaled
    # collective transpose (the 2x double-psum bug showed as 100% here)
    # while tolerating f32 summation-order noise and the occasional
    # relu-gate flip on near-zero activations (up to ~1-2% on the tiny
    # 8-element BN leaves).
    for kp, ref in flat_ref:
        ks = jax.tree_util.keystr(kp)
        got = np.asarray(flat_sp[ks], np.float64)
        ref = np.asarray(ref, np.float64)
        rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
        assert rel < 0.03, f"{ks}: relative grad error {rel:.4f}"


@pytest.mark.parametrize(
    "n_shards", [2, pytest.param(4, marks=pytest.mark.slow)])
def test_spatial_predict_matches_single_device(cfg, scene, n_shards):
    """Full sharded inference (trunk sharded + heads on reassembled
    global maps) must reproduce the single-device detections."""
    import functools
    from detection_3d_tpu.engine.trainer import pad_scene
    from detection_3d_tpu.models.detector import SparseRCNN
    from detection_3d_tpu.parallel.spatial import spatial_predict

    pts, feats, valid = scene
    model = SparseRCNN(cfg)
    table0 = voxelize_points(cfg, pts, feats, valid)
    params = jax.jit(functools.partial(model.init, is_train=False))(
        jax.random.PRNGKey(0), table0)
    det_ref = model.apply(params, table0, is_train=False)

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sp",))
    batch = {"points": pts, "feats": feats, "points_valid": valid}
    boxes, dvalid, scores, labels = spatial_predict(
        cfg, mesh, params, batch, SHARD_CAPS, HALO_CAPS)

    rv = np.asarray(det_ref.valid)
    rb = np.asarray(det_ref.boxes)[rv]
    rs = np.asarray(det_ref.fields["scores"])[rv]
    rl = np.asarray(det_ref.fields["labels"])[rv]
    sv = np.asarray(dvalid)
    sb = np.asarray(boxes)[sv]
    ss = np.asarray(scores)[sv]
    sl = np.asarray(labels)[sv]
    assert sb.shape[0] == rb.shape[0]
    # order by (label, score) to compare as sets
    ro = np.lexsort((rs, rl))
    so = np.lexsort((ss, sl))
    np.testing.assert_array_equal(sl[so], rl[ro])
    np.testing.assert_allclose(ss[so], rs[ro], atol=1e-3, rtol=1e-3)
    np.testing.assert_allclose(sb[so], rb[ro], atol=5e-3, rtol=1e-3)


@pytest.mark.slow
def test_dp_spatial_grad_parity(cfg, scene):
    """dp x sp composition: gradients on a 2x2 (dp, sp) mesh must equal
    the MEAN over buildings of the single-device gradients (VERDICT r3
    weak-5: spatial sharding composed with data parallelism).
    """
    import functools
    from detection_3d_tpu.models.detector import SparseRCNN
    from detection_3d_tpu.models.structures import Boxes3D
    from detection_3d_tpu.parallel.spatial import make_dp_spatial_grad_fn

    n_dp, n_sp = 2, 2
    pts, feats, valid = scene
    gt_boxes, gt_valid, gt_labels = _scene_gt(cfg)
    model = SparseRCNN(cfg)
    table0 = voxelize_points(cfg, pts, feats, valid)
    rng = jax.random.PRNGKey(11)
    gt = Boxes3D(jnp.asarray(gt_boxes), jnp.asarray(gt_valid))
    params = jax.jit(functools.partial(model.init, is_train=True))(
        jax.random.PRNGKey(0), table0, gt, jnp.asarray(gt_labels),
        rng=rng)

    # two distinct "buildings": the fixture scene and a z-shifted copy
    pts2 = pts.at[:, 2].set(jnp.clip(pts[:, 2] + 1.0, 0, 15.9))
    gt2 = np.asarray(gt_boxes).copy()
    gt2[:, 2] += 1.0 / cfg.sparse3d.voxel_scale
    buildings = [
        {"points": pts, "feats": feats, "points_valid": valid,
         "gt_boxes": jnp.asarray(gt_boxes),
         "gt_valid": jnp.asarray(gt_valid),
         "gt_labels": jnp.asarray(gt_labels)},
        {"points": pts2, "feats": feats, "points_valid": valid,
         "gt_boxes": jnp.asarray(gt2),
         "gt_valid": jnp.asarray(gt_valid),
         "gt_labels": jnp.asarray(gt_labels)},
    ]

    # single-device reference: mean of per-building grads, each with the
    # dp-folded rng the sharded step uses
    def loss_ref(p, b, key):
        t = voxelize_points(cfg, b["points"], b["feats"],
                            b["points_valid"])
        losses, _ = model.apply(p, t, Boxes3D(b["gt_boxes"],
                                              b["gt_valid"]),
                                b["gt_labels"], is_train=True, rng=key)
        return sum(jax.tree_util.tree_leaves(losses)), losses

    totals_ref, grads_ref = [], []
    for i, b in enumerate(buildings):
        key = jax.random.fold_in(rng, i)
        (tot, _), g = jax.value_and_grad(loss_ref, has_aux=True)(
            params, b, key)
        totals_ref.append(float(tot))
        grads_ref.append(g)
    g_ref = jax.tree.map(lambda *xs: sum(xs) / len(xs), *grads_ref)
    total_ref = float(np.mean(totals_ref))

    mesh = Mesh(np.array(jax.devices()[:n_dp * n_sp]).reshape(n_dp, n_sp),
                ("dp", "sp"))
    batch = {k: jnp.stack([b[k] for b in buildings])
             for k in buildings[0]}
    grad_fn = make_dp_spatial_grad_fn(cfg, mesh, SHARD_CAPS, HALO_CAPS)
    total_sp, losses_sp, g_sp, ovf = grad_fn(params, batch, rng)

    assert not bool(ovf)
    np.testing.assert_allclose(float(total_sp), total_ref, atol=1e-4,
                               rtol=1e-4)
    flat_ref = jax.tree_util.tree_leaves_with_path(g_ref)
    flat_sp = dict(
        (jax.tree_util.keystr(kp), x)
        for kp, x in jax.tree_util.tree_leaves_with_path(g_sp))
    for kp, ref in flat_ref:
        ks = jax.tree_util.keystr(kp)
        got = np.asarray(flat_sp[ks], np.float64)
        ref = np.asarray(ref, np.float64)
        rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
        assert rel < 0.03, f"{ks}: relative grad error {rel:.4f}"


def _boundary_occupancy(cfg, pts, feats, valid, n_shards):
    """Max boundary-COLUMN occupancy per scale: for every slab edge x in
    {k*w_s - 1, k*w_s} count active rows in that x-plane — exactly the
    rows _extend_with_halo sends/receives — and take the per-scale max."""
    table0 = voxelize_points(cfg, pts, feats, valid)
    pyr = build_pyramid(table0, cfg)
    occ = []
    X = cfg.sparse3d.voxel_full_scale[0]
    for s, t in enumerate(pyr["tables"]):
        w_s = (X >> s) // n_shards
        coords = np.asarray(t.coords)
        rv = np.asarray(t.row_valid)
        m = 0
        for k in range(1, n_shards):
            for edge in (k * w_s - 1, k * w_s):
                m = max(m, int(((coords[:, 0] == edge) & rv).sum()))
        occ.append(m)
    return occ


def test_halo_near_full_caps_grad_parity(cfg, scene):
    """Realistic cap ratios (VERDICT r4 weak-5): halo_caps set just above
    the scene's actual boundary-column occupancy — the bench-scale regime
    where Y_s*Z_s upper bounds don't fit memory and halo columns run
    near-full. Grad parity must hold AND the overflow flag must stay
    False (a silent boundary-conv corruption would show up as grad
    error here)."""
    import functools
    from detection_3d_tpu.models.detector import SparseRCNN
    from detection_3d_tpu.models.structures import Boxes3D
    from detection_3d_tpu.parallel.spatial import make_spatial_grad_fn

    n_shards = 2
    pts, feats, valid = scene
    occ = _boundary_occupancy(cfg, pts, feats, valid, n_shards)
    assert occ[0] > 8, "fixture must keep slab boundaries busy"
    # just-above-occupancy caps: near-full halo buffers (>= 80% load)
    halo_caps = tuple(o + 2 for o in occ)
    for o, c in zip(occ, halo_caps):
        assert o / c >= 0.8

    gt_boxes, gt_valid, gt_labels = _scene_gt(cfg)
    model = SparseRCNN(cfg)
    table0 = voxelize_points(cfg, pts, feats, valid)
    rng = jax.random.PRNGKey(11)
    gt = Boxes3D(jnp.asarray(gt_boxes), jnp.asarray(gt_valid))
    params = jax.jit(functools.partial(model.init, is_train=True))(
        jax.random.PRNGKey(0), table0, gt, jnp.asarray(gt_labels),
        rng=rng)

    def loss_ref(p):
        losses, _ = model.apply(p, table0, gt, jnp.asarray(gt_labels),
                                is_train=True, rng=rng)
        return sum(jax.tree_util.tree_leaves(losses)), losses

    (total_ref, _), g_ref = jax.value_and_grad(
        loss_ref, has_aux=True)(params)

    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sp",))
    batch = {"points": pts, "feats": feats, "points_valid": valid,
             "gt_boxes": jnp.asarray(gt_boxes),
             "gt_valid": jnp.asarray(gt_valid),
             "gt_labels": jnp.asarray(gt_labels)}
    grad_fn = make_spatial_grad_fn(cfg, mesh, SHARD_CAPS, halo_caps)
    total_sp, _, g_sp, ovf = grad_fn(params, batch, rng)

    assert not bool(ovf), "near-full (but sufficient) caps must not flag"
    np.testing.assert_allclose(float(total_sp), float(total_ref),
                               atol=1e-4, rtol=1e-4)
    flat_sp = dict(
        (jax.tree_util.keystr(kp), x)
        for kp, x in jax.tree_util.tree_leaves_with_path(g_sp))
    for kp, ref in jax.tree_util.tree_leaves_with_path(g_ref):
        ks = jax.tree_util.keystr(kp)
        got = np.asarray(flat_sp[ks], np.float64)
        ref = np.asarray(ref, np.float64)
        rel = np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12)
        assert rel < 0.03, f"{ks}: relative grad error {rel:.4f}"


def test_grad_fn_overflow_flag_raised(cfg, scene):
    """Undersized halo caps must raise the training-path overflow flag
    (the inference-path warning is covered by test_halo_overflow_warns;
    this asserts the flag the trainer would act on)."""
    import functools
    from detection_3d_tpu.models.detector import SparseRCNN
    from detection_3d_tpu.models.structures import Boxes3D
    from detection_3d_tpu.parallel.spatial import make_spatial_grad_fn

    n_shards = 2
    pts, feats, valid = scene
    occ = _boundary_occupancy(cfg, pts, feats, valid, n_shards)
    bad_caps = tuple(max(o // 2, 1) for o in occ)  # below occupancy
    assert bad_caps[0] < occ[0]

    gt_boxes, gt_valid, gt_labels = _scene_gt(cfg)
    model = SparseRCNN(cfg)
    table0 = voxelize_points(cfg, pts, feats, valid)
    rng = jax.random.PRNGKey(11)
    gt = Boxes3D(jnp.asarray(gt_boxes), jnp.asarray(gt_valid))
    params = jax.jit(functools.partial(model.init, is_train=True))(
        jax.random.PRNGKey(0), table0, gt, jnp.asarray(gt_labels),
        rng=rng)
    mesh = Mesh(np.array(jax.devices()[:n_shards]), ("sp",))
    batch = {"points": pts, "feats": feats, "points_valid": valid,
             "gt_boxes": jnp.asarray(gt_boxes),
             "gt_valid": jnp.asarray(gt_valid),
             "gt_labels": jnp.asarray(gt_labels)}
    grad_fn = make_spatial_grad_fn(cfg, mesh, SHARD_CAPS, bad_caps)
    _, _, _, ovf = grad_fn(params, batch, rng)
    assert bool(ovf), "undersized halo caps must raise the overflow flag"
