"""Training engine: jitted train step + epoch loop.

Parity with the reference trainer
(/root/reference/maskrcnn_benchmark/engine/trainer_sparse3d.py:42-172):
per-iteration LR schedule, NaN-loss guard (skip step), windowed metric
logging with ETA, min-loss + periodic checkpoints. The reference's
autograd.detect_anomaly becomes a jnp.isfinite check on the loss (and an
optional debug flag for per-leaf gradient checks).

The whole optimizer step (forward + backward + SGD update) is ONE jitted
function; data feeding converts host scenes to padded device arrays.
"""

from __future__ import annotations

import functools
import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from detection_3d_tpu.config.defaults import Config
from detection_3d_tpu.engine.solver import make_optimizer
from detection_3d_tpu.models.detector import SparseRCNN, voxelize_points
from detection_3d_tpu.models.structures import Boxes3D
from detection_3d_tpu.utils.checkpoint import Checkpointer
from detection_3d_tpu.utils.metric_logger import MetricLogger


class TrainState(struct.PyTreeNode):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def pad_scene(cfg: Config, scene: Dict) -> Dict[str, np.ndarray]:
    """Host-side: pad a scene dict to the static capacities."""
    n = cfg.caps.max_points
    pts = np.zeros((n, 3), np.float32)
    fts = np.zeros((n, cfg.in_channels), np.float32)
    m = min(scene["points"].shape[0], n)
    pts[:m] = scene["points"][:m]
    fts[:m] = scene["feats"][:m, :cfg.in_channels]
    pvalid = np.arange(n) < m

    g = cfg.caps.max_gt
    gtb = np.zeros((g, 7), np.float32)
    gtb[:, 3:6] = 0.1  # harmless nonzero sizes on padding rows
    gtl = np.zeros((g,), np.int32)
    mg = min(scene["gt_boxes"].shape[0], g)
    gtb[:mg] = scene["gt_boxes"][:mg]
    gtl[:mg] = scene["gt_labels"][:mg]
    gvalid = np.arange(g) < mg
    return {"points": pts, "feats": fts, "points_valid": pvalid,
            "gt_boxes": gtb, "gt_labels": gtl, "gt_valid": gvalid}


class Trainer:
    def __init__(self, cfg: Config, output_dir: Optional[str] = None,
                 logger=None):
        self.cfg = cfg
        self.model = SparseRCNN(cfg)
        self.logger = logger
        self.output_dir = output_dir or cfg.output_dir
        self.checkpointer = Checkpointer(self.output_dir, logger)
        self.meters = MetricLogger()
        self.min_loss = float("inf")
        self._step_fn = None
        self._tx = None

    # -- jitted pieces -----------------------------------------------------
    def init_state(self, example_scene: Dict, seed: int = 0,
                   iters_per_epoch: int = 1) -> TrainState:
        batch = pad_scene(self.cfg, example_scene)
        rng = jax.random.PRNGKey(seed)
        table = voxelize_points(self.cfg, jnp.asarray(batch["points"]),
                                jnp.asarray(batch["feats"]),
                                jnp.asarray(batch["points_valid"]))
        gt = Boxes3D(jnp.asarray(batch["gt_boxes"]),
                     jnp.asarray(batch["gt_valid"]))
        init_fn = jax.jit(functools.partial(self.model.init,
                                            is_train=True))
        params = init_fn(rng, table, gt, jnp.asarray(batch["gt_labels"]),
                         rng=rng)
        self._tx, self.lr_fn = make_optimizer(self.cfg, params,
                                              iters_per_epoch)
        opt_state = self._tx.init(params)
        return TrainState(params=params, opt_state=opt_state,
                          step=jnp.zeros((), jnp.int32))

    def _build_step(self):
        model, cfg, tx = self.model, self.cfg, self._tx

        @jax.jit
        def train_step(state: TrainState, batch, rng):
            table = voxelize_points(cfg, batch["points"], batch["feats"],
                                    batch["points_valid"])
            gt = Boxes3D(batch["gt_boxes"], batch["gt_valid"])

            def loss_fn(params):
                losses, _ = model.apply(params, table, gt,
                                        batch["gt_labels"],
                                        is_train=True, rng=rng)
                return sum(jax.tree_util.tree_leaves(losses)), losses

            (total, losses), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)

            # NaN guard (trainer_sparse3d.py:86-91): skip the update when
            # the loss or ANY gradient is non-finite (params stay clean
            # even when the loss is finite but grads blew up).
            grads_ok = jax.tree_util.tree_reduce(
                lambda a, g: a & jnp.all(jnp.isfinite(g)), grads,
                jnp.bool_(True))
            ok = jnp.isfinite(total) & grads_ok
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(ok, g, jnp.zeros_like(g)), grads)
            updates, new_opt = tx.update(grads, state.opt_state,
                                         state.params)
            new_params = optax.apply_updates(state.params, updates)
            new_state = TrainState(params=new_params, opt_state=new_opt,
                                   step=state.step + 1)
            return new_state, total, losses, ok

        return train_step

    # -- the loop ----------------------------------------------------------
    def train(self, scenes: Iterable[Dict], state: TrainState,
              epochs: int, seed: int = 0,
              checkpoint_period_epochs: Optional[int] = None):
        cfg = self.cfg
        scenes = list(scenes)
        if self._step_fn is None:
            self._step_fn = self._build_step()
        ckpt_period = checkpoint_period_epochs or \
            cfg.solver.checkpoint_period_epochs
        rng = jax.random.PRNGKey(seed + 123)

        it = 0
        t_start = time.time()
        for epoch in range(epochs):
            for scene in scenes:
                batch = {k: jnp.asarray(v)
                         for k, v in pad_scene(cfg, scene).items()}
                rng, key = jax.random.split(rng)
                t0 = time.time()
                state, total, losses, ok = self._step_fn(state, batch, key)
                total = float(total)
                self.meters.update(loss=total, time=time.time() - t0,
                                   **{k: float(v) for k, v in losses.items()})
                if not bool(ok) and self.logger:
                    self.logger.warning("non-finite loss at iter %d; "
                                        "update skipped", it)
                if self.logger and it % 20 == 0:
                    eta = (time.time() - t_start) / (it + 1) * \
                        (epochs * len(scenes) - it - 1)
                    self.logger.info(
                        "iter %d epoch %d eta %.0fs lr %.5f %s", it, epoch,
                        eta, float(self.lr_fn(int(state.step))), self.meters)
                # min-loss checkpoint (trainer_sparse3d.py:145-150)
                if total < self.min_loss and np.isfinite(total):
                    self.min_loss = total
                    self.checkpointer.save(
                        "model_min_loss",
                        {"params": state.params,
                         "opt_state": state.opt_state,
                         "step": state.step})
                it += 1
            if (epoch + 1) % ckpt_period == 0:
                self.checkpointer.save(
                    f"model_{epoch:07d}",
                    {"params": state.params, "opt_state": state.opt_state,
                     "step": state.step})
        self.checkpointer.save(
            "model_final", {"params": state.params,
                            "opt_state": state.opt_state,
                            "step": state.step})
        return state
