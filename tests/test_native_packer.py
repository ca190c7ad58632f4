"""Native C++ pyramid packer vs the numpy reference: byte-identical.

The C++ build (native/pyramid_packer.cpp) is the framework's Metadata
builder (the reference's SCN Metadata C++ role); any divergence from
data/pyramid_packing.pack_pyramid corrupts rulebooks silently, so the
parity bar is exact equality on every array.
"""

import numpy as np
import pytest

from detection_3d_tpu.data.native_packer import (
    native_pack_available, pack_pyramid_native,
)
from detection_3d_tpu.data.pyramid_packing import pack_pyramid
from detection_3d_tpu.data.synthetic import synthetic_building

from bench import small_config

pytestmark = pytest.mark.skipif(
    not native_pack_available(), reason="native packer build unavailable")


def test_native_matches_numpy_bitexact():
    cfg = small_config()
    scene = synthetic_building(seed=5, num_points=20_000, room=8.0,
                               voxel_scale=cfg.sparse3d.voxel_scale)
    want = pack_pyramid(cfg, scene)
    got = pack_pyramid_native(cfg, scene, n_threads=4)
    assert set(got) == set(want)
    for k in sorted(want):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)


def test_native_overflow_parity():
    """Capacity-overflow strided keep must match too."""
    import dataclasses
    cfg = small_config()
    cfg = dataclasses.replace(
        cfg, caps=dataclasses.replace(cfg.caps, voxel_caps=(4096,)
                                      + cfg.caps.voxel_caps[1:]))
    scene = synthetic_building(seed=6, num_points=20_000, room=8.0,
                               voxel_scale=cfg.sparse3d.voxel_scale)
    want = pack_pyramid(cfg, scene)
    got = pack_pyramid_native(cfg, scene)
    assert int(want["true_num"]) > 4096
    for k in sorted(want):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)


def test_native_table_only_matches_numpy_bitexact():
    """pp_run_table (input layer only) == data/packing.pack_table."""
    from detection_3d_tpu.data.native_packer import pack_table_native
    from detection_3d_tpu.data.packing import pack_table

    cfg = small_config()
    scene = synthetic_building(seed=5, num_points=20_000, room=8.0,
                               voxel_scale=cfg.sparse3d.voxel_scale)
    want = pack_table(cfg, scene)
    got = pack_table_native(cfg, scene)
    assert set(got) == set(want)
    for k in sorted(want):
        np.testing.assert_array_equal(np.asarray(got[k]),
                                      np.asarray(want[k]), err_msg=k)
