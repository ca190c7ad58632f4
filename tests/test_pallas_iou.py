"""Pallas IoU kernel parity vs the XLA path (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from detection_3d_tpu.ops.rotated_iou import rotated_iou_matrix
from detection_3d_tpu.ops.pallas.rotated_iou_kernel import (
    rotated_iou_matrix_pallas,
)


@pytest.mark.parametrize("criterion", [-1, 2])
@pytest.mark.slow
def test_pallas_matches_xla(criterion):
    rng = np.random.RandomState(0)
    n, k = 13, 37  # force padding in both dims
    boxes = np.c_[rng.uniform(-3, 3, (n, 2)), rng.uniform(0.1, 2.5, (n, 2)),
                  rng.uniform(-1.5, 1.5, (n, 1))].astype(np.float32)
    qboxes = np.c_[rng.uniform(-3, 3, (k, 2)), rng.uniform(0.1, 2.5, (k, 2)),
                   rng.uniform(-1.5, 1.5, (k, 1))].astype(np.float32)
    want = np.asarray(rotated_iou_matrix(
        jnp.asarray(boxes), jnp.asarray(qboxes), criterion=criterion,
        same_box_fix=False, impl="xla"))
    got = np.asarray(rotated_iou_matrix_pallas(
        jnp.asarray(boxes), jnp.asarray(qboxes), criterion=criterion,
        interpret=True))
    np.testing.assert_allclose(got, want, atol=1e-5)


@pytest.mark.slow
def test_pallas_self_iou():
    # note: identical boxes can get IoU 0 from float-equality in the
    # inclusive corner tests (the reference has the same quirk and fixes
    # it with check_same_boxes; our matrix path applies same_box_fix).
    # These two are numerically robust self-pairs.
    boxes = np.array([[1, 2, 3, 4, 0.3], [5, 5, 1, 1, -1.0]], np.float32)
    got = np.asarray(rotated_iou_matrix_pallas(
        jnp.asarray(boxes), jnp.asarray(boxes), interpret=True))
    np.testing.assert_allclose(np.diag(got), 1.0, atol=1e-4)
