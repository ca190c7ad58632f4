"""Multi-chip parallelism: device mesh, batched DP training, eval gather.

TPU-native replacement for the reference's distributed story
(SURVEY.md section 2.7; /root/reference/tools/train_net_sparse3d.py:52-57,
170-177 — one-process-per-GPU DDP over NCCL):

  * data parallelism = shard the building batch over a 1-D ``dp`` mesh
    axis with ``shard_map``; gradient all-reduce = ``jax.lax.pmean`` over
    ICI (replaces DDP's NCCL all-reduce);
  * loss reduction for logging = the same pmean (replaces
    reduce_loss_dict, trainer_sparse3d.py:17-39);
  * eval-result gathering = ``jax.experimental.multihost_utils.
    process_allgather`` (replaces the pickle-file scatter_gather,
    utils/comm.py:89-157).

Within one process the batch axis is plain ``vmap`` over buildings — each
building runs the identical static-shape pipeline.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from detection_3d_tpu.config.defaults import Config
from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
from detection_3d_tpu.models.structures import Boxes3D


def make_mesh(n_devices: int = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return Mesh(np.array(devs[:n]), (axis,))


def _per_building_loss(cfg: Config, model: SparseRCNN, params, batch, rng):
    table = voxelize_points(cfg, batch["points"], batch["feats"],
                            batch["points_valid"])
    gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])
    losses, _ = model.apply(params, table, gt, batch["gt_labels"],
                            is_train=True, rng=rng)
    return sum(jax.tree_util.tree_leaves(losses))


def batched_train_step(cfg: Config, model: SparseRCNN, tx, mesh: Mesh):
    """Jitted DP train step over a stacked building batch (B, ...).

    B must be divisible by the mesh's dp size; within each device the
    local buildings are vmapped.
    """
    batch_spec = P("dp")

    def local_loss(params, batch, rng):
        # Decorrelate randomness across dp shards: without the fold_in
        # every device would split the SAME key, making balanced pos/neg
        # sampling identical on all shards.
        rng = jax.random.fold_in(rng, jax.lax.axis_index("dp"))
        # batch leaves: (local_B, ...) -> vmap buildings
        b = batch["points"].shape[0]
        keys = jax.random.split(rng, b)
        losses = jax.vmap(
            lambda bt, k: _per_building_loss(cfg, model, params, bt, k),
            in_axes=(0, 0))(batch, keys)
        return jnp.mean(losses)

    @jax.jit
    def step(params, opt_state, batch, rng):
        def sharded(params, batch):
            loss, grads = jax.value_and_grad(local_loss)(params, batch, rng)
            grads = jax.lax.pmean(grads, "dp")
            loss = jax.lax.pmean(loss, "dp")
            return loss, grads

        specs = jax.tree_util.tree_map(lambda _: batch_spec, batch)
        loss, grads = shard_map(
            sharded, mesh=mesh, in_specs=(P(), specs),
            out_specs=(P(), P()), check_vma=False)(params, batch)
        updates, new_opt = tx.update(grads, opt_state, params)
        new_params = optax.apply_updates(params, updates)
        return new_params, new_opt, loss

    return step


def all_gather_results(local_results):
    """Gather per-process eval results across hosts (single-process: the
    identity). Replaces the reference's tmp-file pickle gather."""
    if jax.process_count() == 1:
        return local_results
    from jax.experimental import multihost_utils
    return multihost_utils.process_allgather(local_results)
