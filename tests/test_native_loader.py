"""Native C++ scene loader: build, round-trip, ordering, prefetch."""

import os
import time

import numpy as np
import pytest

from detection_3d_tpu.data.scene_pack import (
    write_scene_pack, read_scene_pack,
)
from detection_3d_tpu.data.native_loader import (
    NativeSceneLoader, native_available,
)


@pytest.fixture(scope="module")
def packs(tmp_path_factory):
    d = tmp_path_factory.mktemp("packs")
    rng = np.random.RandomState(0)
    paths, scenes = [], []
    for i in range(6):
        scene = {
            "points": rng.randn(100 + 17 * i, 3).astype(np.float32),
            "feats": rng.randn(100 + 17 * i, 9).astype(np.float32),
            "gt_boxes": rng.randn(4 + i, 7).astype(np.float32),
            "gt_labels": rng.randint(0, 5, 4 + i).astype(np.int32),
            "flags": (rng.rand(4 + i) > 0.5),
            "scene_id": np.int64(i),
        }
        p = str(d / f"scene_{i}.spk")
        write_scene_pack(p, scene)
        paths.append(p)
        scenes.append(scene)
    return paths, scenes


def test_python_roundtrip(packs):
    paths, scenes = packs
    got = read_scene_pack(paths[2])
    for k, v in scenes[2].items():
        np.testing.assert_array_equal(got[k], np.asarray(v))


def test_native_builds():
    assert native_available(), "g++ build of native/scene_loader.cpp failed"


def test_native_matches_python(packs):
    paths, scenes = packs
    loader = NativeSceneLoader(paths, n_prefetch=3, n_threads=2)
    assert loader.is_native
    for got, want in zip(loader.epoch(), scenes):
        assert set(got) == set(want)
        for k in want:
            np.testing.assert_array_equal(got[k], np.asarray(want[k]))
            assert got[k].dtype == np.asarray(want[k]).dtype
    loader.close()


def test_native_order_and_reuse(packs):
    paths, scenes = packs
    loader = NativeSceneLoader(paths, n_prefetch=2, n_threads=2)
    order = [3, 0, 5, 1]
    ids = [int(s["scene_id"]) for s in loader.epoch(order)]
    assert ids == order
    # second epoch, different permutation, same handle
    order2 = [2, 4, 4, 0]
    ids2 = [int(s["scene_id"]) for s in loader.epoch(order2)]
    assert ids2 == order2
    loader.close()


def test_bad_file_raises(tmp_path):
    p = str(tmp_path / "bad.spk")
    with open(p, "wb") as f:
        f.write(b"NOPE")
    loader = NativeSceneLoader([p])
    if loader.is_native:
        with pytest.raises(IOError):
            next(iter(loader.epoch()))
    loader.close()


def test_prefetch_overlaps(packs):
    """With prefetch, total wall time for a slow consumer is bounded by
    the consumer, not consumer+IO (smoke-level concurrency check)."""
    paths, _ = packs
    loader = NativeSceneLoader(paths, n_prefetch=6, n_threads=3)
    if not loader.is_native:
        pytest.skip("no native build")
    t0 = time.time()
    n = 0
    for _ in loader.epoch():
        time.sleep(0.01)
        n += 1
    assert n == len(paths)
    assert time.time() - t0 < 2.0
    loader.close()


@pytest.mark.slow
def test_trainer_consumes_native_loader(tmp_path):
    """Trainer.train accepts the prefetching loader in place of a scene
    list (2 tiny epochs on CPU; loss finite, steps advance)."""
    import jax
    from detection_3d_tpu.config import (Config, Sparse3DConfig,
                                         CapacityConfig)
    from detection_3d_tpu.config.defaults import (RPNConfig, ROIConfig,
                                                  SolverConfig)
    from detection_3d_tpu.data.synthetic import synthetic_building
    from detection_3d_tpu.engine.trainer import Trainer

    cfg = Config(
        classes=("background", "wall"),
        sparse3d=Sparse3DConfig(
            voxel_scale=10, voxel_full_scale=(64, 64, 32),
            nplanes_front=(8, 16), kernels=((2, 2, 2),),
            strides=((2, 2, 2),), nplane_map=8),
        rpn=RPNConfig(rpn_scales_from_top=(1,), rpn_3d_2d_selector=(0,),
                      anchor_sizes_3d=((0.4, 1.5, 2.7),), use_yaws=(1,),
                      fpn_pre_nms_top_n_train=64,
                      fpn_post_nms_top_n_train=16,
                      batch_size_per_image=32),
        roi=ROIConfig(pooler_scales_from_top=(1,), batch_size_per_image=16,
                      detections_per_img=8, mlp_head_dim=32),
        backbone_out_channels=8,
        solver=SolverConfig(base_lr=0.001, warmup_epochs=1,
                            lr_step_epochs=(100,), epochs=2,
                            checkpoint_period_epochs=1000),
        caps=CapacityConfig(max_points=4096, voxel_caps=(2048, 512),
                            max_gt=8),
        output_dir=str(tmp_path / "out"),
    ).validate()

    paths = []
    for i in range(2):
        sc = synthetic_building(seed=i, num_points=2000, room=4.0,
                                classes=cfg.classes,
                                voxel_scale=cfg.sparse3d.voxel_scale)
        p = str(tmp_path / f"s{i}.spk")
        write_scene_pack(p, sc)
        paths.append(p)

    loader = NativeSceneLoader(paths, n_prefetch=2)
    trainer = Trainer(cfg)
    state = trainer.init_state(read_scene_pack(paths[0]),
                               iters_per_epoch=len(loader))
    state = trainer.train(loader, state, epochs=2)
    assert int(state.step) == 4
    loader.close()
