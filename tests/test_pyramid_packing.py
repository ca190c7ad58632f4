"""Host-side pyramid packing (data/pyramid_packing.py) parity vs the
in-graph builder (models/backbone.build_pyramid): every table, rulebook
and windowed relayout must be BIT-EXACT, and the end-to-end packed
predict must reproduce the unpacked detections."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from detection_3d_tpu.data.packing import pack_table
from detection_3d_tpu.data.pyramid_packing import (
    pack_pyramid, unpack_pyramid,
)
from detection_3d_tpu.data.synthetic import synthetic_building
from detection_3d_tpu.engine.trainer import pad_scene
from detection_3d_tpu.models.backbone import build_pyramid
from detection_3d_tpu.models.detector import voxelize_points

from bench import small_config


def _cfg_scene():
    cfg = small_config()
    scene = synthetic_building(seed=7, num_points=20_000, room=8.0,
                               voxel_scale=cfg.sparse3d.voxel_scale)
    return cfg, scene


def _ref_pyramid(cfg, scene):
    ref = pad_scene(cfg, scene)
    t0 = voxelize_points(cfg, jnp.asarray(ref["points"]),
                         jnp.asarray(ref["feats"]),
                         jnp.asarray(ref["points_valid"]))
    return t0, build_pyramid(t0, cfg)


def _assert_rb_equal(got, want, name):
    # the in-graph builder windowizes only on TPU backends; the host
    # packer always does for v_in >= 1024 — compare the underlying idx,
    # and the windowed fields when both sides carry them
    def idx_of(rb):
        return rb["idx"] if isinstance(rb, dict) else rb

    np.testing.assert_array_equal(np.asarray(idx_of(got)),
                                  np.asarray(idx_of(want)),
                                  err_msg=f"{name}.idx")
    if isinstance(got, dict) and isinstance(want, dict):
        for k in ("starts", "local", "hi"):
            np.testing.assert_array_equal(
                np.asarray(got[k]), np.asarray(want[k]),
                err_msg=f"{name}.{k}")


def test_np_windowed_rulebook_matches_device():
    from detection_3d_tpu.data.pyramid_packing import (
        np_windowed_rulebook,
    )
    from detection_3d_tpu.ops.pallas.gather_conv_kernel import (
        BLOCK, WINDOW, _ALIGN, windowed_rulebook,
    )

    rng = np.random.RandomState(11)
    v_in, v_out = 4096, 3000
    idx = rng.randint(0, v_in + 1, (27, v_out)).astype(np.int32)
    idx.sort(axis=1)
    num_out = 2700
    valid = jnp.arange(v_out) < num_out
    want = windowed_rulebook(jnp.asarray(idx), valid, v_in)
    got = np_windowed_rulebook(idx, num_out, v_in, BLOCK, WINDOW, _ALIGN)
    for k in ("idx", "starts", "local", "hi"):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)


@pytest.mark.slow
def test_pack_pyramid_bit_exact():
    cfg, scene = _cfg_scene()
    t0_ref, pyr_ref = _ref_pyramid(cfg, scene)
    packed = {k: jnp.asarray(v)
              for k, v in pack_pyramid(cfg, scene).items()}
    t0, pyr = unpack_pyramid(cfg, packed)

    for k, (tg, tr) in enumerate(zip(pyr["tables"], pyr_ref["tables"])):
        assert tg.spatial_size == tr.spatial_size, k
        assert int(tg.num) == int(tr.num), k
        np.testing.assert_array_equal(np.asarray(tg.coords),
                                      np.asarray(tr.coords), err_msg=str(k))
        np.testing.assert_array_equal(np.asarray(tg.hi),
                                      np.asarray(tr.hi), err_msg=str(k))
        np.testing.assert_array_equal(np.asarray(tg.lo),
                                      np.asarray(tr.lo), err_msg=str(k))

    n = len(pyr["tables"])
    for i in range(n - 1):
        _assert_rb_equal(pyr["down_rb"][i], pyr_ref["down_rb"][i],
                         f"down{i}")
        _assert_rb_equal(pyr["up_rb"][i], pyr_ref["up_rb"][i], f"up{i}")
    for k in range(n):
        _assert_rb_equal(pyr["subm_idx"][k], pyr_ref["subm_idx"][k],
                         f"subm{k}")
    for slot in pyr_ref["bev"]:
        bt_ref, brb_ref = pyr_ref["bev"][slot]
        bt, brb = pyr["bev"][slot]
        assert int(bt.num) == int(bt_ref.num)
        np.testing.assert_array_equal(np.asarray(bt.coords),
                                      np.asarray(bt_ref.coords))
        _assert_rb_equal(brb, brb_ref, f"bev{slot}")


@pytest.mark.slow
def test_packed_pyramid_predict_matches_table_path():
    """End-to-end: packed-pyramid predict == packed-table predict (same
    quantized inputs, so detections must be identical)."""
    import functools
    from detection_3d_tpu.engine.inference import make_predict_fn
    from detection_3d_tpu.models.detector import SparseRCNN
    from detection_3d_tpu.data.packing import unpack_table

    cfg, scene = _cfg_scene()
    model = SparseRCNN(cfg)
    packed_t = {k: jnp.asarray(v)
                for k, v in pack_table(cfg, scene).items()}
    packed_p = {k: jnp.asarray(v)
                for k, v in pack_pyramid(cfg, scene).items()}
    table = unpack_table(cfg, packed_t)
    params = jax.jit(functools.partial(model.init, is_train=False))(
        jax.random.PRNGKey(0), table)

    p_table = make_predict_fn(cfg, model, packed="table")
    p_pyr = make_predict_fn(cfg, model, packed="pyramid")
    out_t = p_table(params, packed_t)
    out_p = p_pyr(params, packed_p)
    for a, b in zip(out_t, out_p):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5, rtol=1e-5)


@pytest.mark.slow
def test_batch_predict_matches_sequential():
    """vmapped multi-building predict == per-building predict on the
    same stacked packed tables (make_batch_predict_fn)."""
    import functools
    from detection_3d_tpu.engine.inference import (
        make_batch_predict_fn, make_predict_fn,
    )
    from detection_3d_tpu.models.detector import SparseRCNN
    from detection_3d_tpu.data.packing import unpack_table

    cfg, scene0 = _cfg_scene()
    scene1 = synthetic_building(seed=21, num_points=15_000, room=7.0,
                                voxel_scale=cfg.sparse3d.voxel_scale)
    model = SparseRCNN(cfg)
    packs = [pack_table(cfg, s) for s in (scene0, scene1)]
    table = unpack_table(cfg, {k: jnp.asarray(v)
                               for k, v in packs[0].items()})
    params = jax.jit(functools.partial(model.init, is_train=False))(
        jax.random.PRNGKey(0), table)

    p_one = make_predict_fn(cfg, model, packed="table")
    p_batch = make_batch_predict_fn(cfg, model, packed="table")
    stacked = {k: jnp.asarray(np.stack([p[k] for p in packs]))
               for k in packs[0]}
    out_b = p_batch(params, stacked)
    for i, p in enumerate(packs):
        out_1 = p_one(params, {k: jnp.asarray(v) for k, v in p.items()})
        for a, b in zip(out_1, out_b):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b)[i],
                                       atol=1e-5, rtol=1e-5,
                                       err_msg=f"building {i}")


@pytest.mark.slow
def test_pipelined_inference_matches_default():
    """run_inference(pipelined=True) (C++ pack + packed-pyramid predict,
    threaded look-ahead) must reproduce the default path's detections
    up to input quantization; both must evaluate identically here
    (quantization is far below the detector's decision margins on this
    fixture)."""
    import functools
    from detection_3d_tpu.engine.inference import run_inference
    from detection_3d_tpu.engine.trainer import pad_scene as _ps
    from detection_3d_tpu.models.detector import SparseRCNN

    cfg, scene0 = _cfg_scene()
    scenes = [scene0,
              synthetic_building(seed=8, num_points=15_000, room=7.0,
                                 voxel_scale=cfg.sparse3d.voxel_scale),
              synthetic_building(seed=9, num_points=15_000, room=7.0,
                                 voxel_scale=cfg.sparse3d.voxel_scale)]
    model = SparseRCNN(cfg)
    ref = _ps(cfg, scene0)
    table = voxelize_points(cfg, jnp.asarray(ref["points"]),
                            jnp.asarray(ref["feats"]),
                            jnp.asarray(ref["points_valid"]))
    params = jax.jit(functools.partial(model.init, is_train=False))(
        jax.random.PRNGKey(0), table)

    # serial reference over the SAME packed inputs: the pipelined loop
    # must be a pure scheduling change (untrained weights make AP-level
    # comparisons against the f32 path quantization-sensitive noise)
    from detection_3d_tpu.data.native_packer import pack_pyramid_native
    from detection_3d_tpu.engine.inference import make_predict_fn

    predict = make_predict_fn(cfg, packed="pyramid")
    want = []
    for sc in scenes:
        b = {k: jnp.asarray(v)
             for k, v in pack_pyramid_native(cfg, sc).items()}
        packed_out, _ = predict(params, b)
        a = np.asarray(packed_out)
        v = a[:, 9] > 0.5
        want.append({"boxes": a[v, :7], "scores": a[v, 7]})

    preds_b, _, _ = run_inference(cfg, params, scenes, pipelined=True,
                                  evaluate=False)
    assert len(preds_b) == 3
    for w, g in zip(want, preds_b):
        np.testing.assert_allclose(g["boxes"], w["boxes"], atol=1e-6)
        np.testing.assert_allclose(g["scores"], w["scores"], atol=1e-6)
