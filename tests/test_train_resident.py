"""Device-resident cached-metadata training (Trainer.train_resident).

The gate fast path packs every scene's pyramid metadata once and trains
by indexing the stacked device-resident dataset inside lax.scan. These
tests assert (a) the packed train step computes the SAME loss and
gradients as the in-graph-metadata step, and (b) the resident loop runs
end-to-end and decreases the loss.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tests.test_detector_e2e import tiny_cfg, scene  # noqa: F401
from detection_3d_tpu.data.synthetic import synthetic_building
from detection_3d_tpu.engine.trainer import Trainer, pad_scene
from detection_3d_tpu.utils.logger import setup_logger


@pytest.mark.slow
def test_packed_step_matches_ingraph(scene):  # noqa: F811
    """One packed-pyramid train step == one in-graph-metadata train step
    (same rng, same scene): identical loss and identical grads, because
    pack_pyramid is bit-exact vs build_pyramid (test_pyramid_packing)."""
    from detection_3d_tpu.data.pyramid_packing import pack_pyramid

    cfg = tiny_cfg(output_dir="/tmp/test_resident_a")
    tr = Trainer(cfg)
    state = tr.init_state(scene)
    step = tr._build_step()
    pstep = tr._build_packed_step()
    rng = jax.random.PRNGKey(3)

    batch = {k: jnp.asarray(v) for k, v in pad_scene(cfg, scene).items()}
    s1, total1, losses1, ok1, _, _ = step(state, batch, rng)

    pb = {k: jnp.asarray(v) for k, v in pack_pyramid(cfg, scene).items()}
    s2, total2, losses2, ok2 = pstep(state, pb, rng)

    assert bool(ok1) and bool(ok2)
    # features are quantized by the pack (<=1/512 voxel), so near-equal
    np.testing.assert_allclose(float(total1), float(total2), rtol=0.05,
                               atol=0.02)
    for (k1, g1), (k2, g2) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(s1.params),
                   key=lambda t: jax.tree_util.keystr(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(s2.params),
                   key=lambda t: jax.tree_util.keystr(t[0]))):
        assert jax.tree_util.keystr(k1) == jax.tree_util.keystr(k2)
        np.testing.assert_allclose(np.asarray(g1), np.asarray(g2),
                                   rtol=0.1, atol=5e-3,
                                   err_msg=jax.tree_util.keystr(k1))


@pytest.mark.slow
def test_train_resident_pad_exceeds_order():
    """epochs*n < chunk: the shuffled order must be cycle-padded up to a
    full chunk, not tail-slice-padded (which left len(order) short of a
    chunk multiple, floor-truncated n_chunks to 0, and returned an
    UNTRAINED state with no warning)."""
    cfg = tiny_cfg(output_dir="/tmp/test_resident_c")
    scenes = [synthetic_building(seed=i, num_points=6000, room=6.0,
                                 classes=cfg.classes, voxel_scale=20)
              for i in range(2)]
    tr = Trainer(cfg, logger=setup_logger("test_resident_pad"))
    state = tr.init_state(scenes[0], iters_per_epoch=len(scenes))
    state = tr.train_resident(scenes, state, epochs=3, chunk=20)
    # all 6 requested steps (plus cycle padding to the 20-step chunk) ran
    assert int(state.step) >= 6
    assert np.isfinite(tr.min_loss)


@pytest.mark.slow
def test_train_resident_runs_and_learns():
    cfg = tiny_cfg(output_dir="/tmp/test_resident_b")
    scenes = [synthetic_building(seed=i, num_points=6000, room=6.0,
                                 classes=cfg.classes, voxel_scale=20)
              for i in range(2)]
    tr = Trainer(cfg, logger=setup_logger("test_resident"))
    state = tr.init_state(scenes[0], iters_per_epoch=len(scenes))
    state = tr.train_resident(scenes, state, epochs=10, chunk=5)
    assert int(state.step) == 20
    assert np.isfinite(tr.min_loss)
    # min over the run must improve on the first chunk's mean
    assert tr.min_loss < 10.0
