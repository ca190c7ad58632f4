"""Quantized input packing (data/packing.py) parity vs the f32 path."""

import numpy as np
import jax.numpy as jnp

from detection_3d_tpu.data.packing import pack_scene, unpack_batch
from detection_3d_tpu.data.synthetic import synthetic_building
from detection_3d_tpu.engine.trainer import pad_scene
from detection_3d_tpu.models.detector import voxelize_points

from bench import small_config


def _scene_and_cfg():
    cfg = small_config()
    scene = synthetic_building(seed=3, num_points=20_000, room=8.0,
                               voxel_scale=cfg.sparse3d.voxel_scale)
    return cfg, scene


def test_unpack_matches_pad_scene():
    cfg, scene = _scene_and_cfg()
    ref = pad_scene(cfg, scene)
    got = {k: np.asarray(v)
           for k, v in unpack_batch(cfg, {
               k: jnp.asarray(v) for k, v in pack_scene(cfg, scene).items()
           }).items()}

    assert (got["points_valid"] == ref["points_valid"]).all()
    assert (got["gt_boxes"] == ref["gt_boxes"]).all()
    assert (got["gt_labels"] == ref["gt_labels"]).all()

    m = ref["points_valid"]
    # scaled coords: fixed point truncation, < 1/8 voxel, never negative
    d = ref["points"][m] - got["points"][m]
    assert d.min() >= 0.0 and d.max() < 1.0 / 8 + 1e-6
    # voxel assignment is bit-exact
    assert (np.floor(got["points"][m]) == np.floor(ref["points"][m])).all()
    # xyz meters within 1/8 voxel / scale; rgb u8; normals i8 steps
    scale = cfg.sparse3d.voxel_scale
    assert np.abs(got["feats"][m, :3] - ref["feats"][m, :3]).max() \
        <= 1.0 / 8 / scale + 1e-5
    assert np.abs(got["feats"][m, 3:6] - ref["feats"][m, 3:6]).max() \
        <= 0.5 / 255 + 1e-6
    assert np.abs(got["feats"][m, 6:9] - ref["feats"][m, 6:9]).max() \
        <= 0.5 / 127 + 1e-6


def test_voxelization_bit_exact():
    cfg, scene = _scene_and_cfg()
    ref = pad_scene(cfg, scene)
    got = unpack_batch(cfg, {k: jnp.asarray(v)
                             for k, v in pack_scene(cfg, scene).items()})
    t_ref = voxelize_points(cfg, jnp.asarray(ref["points"]),
                            jnp.asarray(ref["feats"]),
                            jnp.asarray(ref["points_valid"]))
    t_got = voxelize_points(cfg, got["points"], got["feats"],
                            got["points_valid"])
    assert int(t_ref.true_num) == int(t_got.true_num)
    assert (np.asarray(t_ref.coords) == np.asarray(t_got.coords)).all()
    assert (np.asarray(t_ref.row_valid) == np.asarray(t_got.row_valid)).all()
    # dedup-averaged features close (inputs quantized, same partition)
    rv = np.asarray(t_ref.row_valid)
    assert np.abs(np.asarray(t_ref.feats)[rv]
                  - np.asarray(t_got.feats)[rv]).max() < 2e-2


def test_pack_table_matches_device_voxelizer():
    """Host-side input layer (pack_table/unpack_table) == the in-graph
    voxelizer: coords/keys/num/true_num bit-exact, features within the
    documented quantization steps."""
    from detection_3d_tpu.data.packing import pack_table, unpack_table

    cfg, scene = _scene_and_cfg()
    ref = pad_scene(cfg, scene)
    t_ref = voxelize_points(cfg, jnp.asarray(ref["points"]),
                            jnp.asarray(ref["feats"]),
                            jnp.asarray(ref["points_valid"]))
    packed = {k: jnp.asarray(v) for k, v in pack_table(cfg, scene).items()}
    t_got = unpack_table(cfg, packed)

    assert int(t_ref.num) == int(t_got.num)
    assert int(t_ref.true_num) == int(t_got.true_num)
    assert (np.asarray(t_ref.coords) == np.asarray(t_got.coords)).all()
    assert (np.asarray(t_ref.hi) == np.asarray(t_got.hi)).all()
    assert (np.asarray(t_ref.lo) == np.asarray(t_got.lo)).all()
    rv = np.asarray(t_ref.row_valid)
    fr, fg = np.asarray(t_ref.feats), np.asarray(t_got.feats)
    scale = cfg.sparse3d.voxel_scale
    assert np.abs(fr[rv, :3] - fg[rv, :3]).max() <= 1.0 / 256 / scale + 1e-5
    assert np.abs(fr[rv, 3:6] - fg[rv, 3:6]).max() <= 1.0 / 255 + 1e-6
    assert np.abs(fr[rv, 6:9] - fg[rv, 6:9]).max() <= 1.0 / 127 + 1e-6
    assert not np.asarray(t_got.feats)[~rv].any()


def test_pack_table_capacity_overflow_parity():
    """The strided capacity-overflow keep must match the device's
    unbiased truncation exactly (same kept voxels, same true_num)."""
    import dataclasses
    from detection_3d_tpu.data.packing import pack_table, unpack_table
    from detection_3d_tpu.config import CapacityConfig

    cfg, scene = _scene_and_cfg()
    small = dataclasses.replace(
        cfg, caps=dataclasses.replace(cfg.caps, voxel_caps=(4096,)
                                      + cfg.caps.voxel_caps[1:]))
    ref = pad_scene(small, scene)
    t_ref = voxelize_points(small, jnp.asarray(ref["points"]),
                            jnp.asarray(ref["feats"]),
                            jnp.asarray(ref["points_valid"]))
    packed = {k: jnp.asarray(v)
              for k, v in pack_table(small, scene).items()}
    t_got = unpack_table(small, packed)
    assert int(t_ref.true_num) > 4096, "fixture must overflow"
    assert int(t_ref.num) == int(t_got.num)
    assert int(t_ref.true_num) == int(t_got.true_num)
    assert (np.asarray(t_ref.coords) == np.asarray(t_got.coords)).all()
