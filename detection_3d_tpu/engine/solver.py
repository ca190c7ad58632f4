"""Optimizer + LR schedule.

Parity with the reference solver
(/root/reference/maskrcnn_benchmark/solver/build.py:7-36,
solver/lr_scheduler.py:10-52):
  * SGD momentum 0.9; bias params get lr x BIAS_LR_FACTOR(2) and
    weight_decay_bias (0);
  * WarmupMultiStepLR: linear (or constant) warmup over
    min(500, warmup_epochs * iters_per_epoch) iterations from
    warmup_factor to 1, then gamma^k decay at epoch-derived milestones.

Implemented as optax transforms; the bias/non-bias split uses optax.masked
over the param-name convention (leaf named 'bias' or ending in '_b').
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax

from detection_3d_tpu.config.defaults import Config


def warmup_multistep_schedule(base_lr: float, warmup_factor: float,
                              warmup_iters: int, warmup_method: str,
                              milestones: Sequence[int], gamma: float):
    milestones = tuple(sorted(milestones))

    def schedule(step):
        step = jnp.asarray(step, jnp.float32)
        if warmup_method == "linear" and warmup_iters > 0:
            alpha = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
            wf = warmup_factor * (1.0 - alpha) + alpha
        elif warmup_method == "constant" and warmup_iters > 0:
            wf = jnp.where(step < warmup_iters, warmup_factor, 1.0)
        else:
            wf = 1.0
        k = jnp.sum(jnp.asarray(
            [step >= m for m in milestones], jnp.float32)) if milestones \
            else 0.0
        return base_lr * wf * (gamma ** k)

    return schedule


def _is_bias(path) -> bool:
    name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
    return name == "bias" or name.endswith("_b")


def make_optimizer(cfg: Config, params, iters_per_epoch: int):
    """Returns (optax.GradientTransformation, schedule_fn)."""
    s = cfg.solver
    warmup_iters = min(500, int(s.warmup_epochs * iters_per_epoch))
    milestones = [int(e * iters_per_epoch) for e in s.lr_step_epochs]
    sched = warmup_multistep_schedule(1.0, s.warmup_factor, warmup_iters,
                                      s.warmup_method, milestones, s.gamma)

    bias_mask = jax.tree_util.tree_map_with_path(
        lambda p, _: _is_bias(p), params)
    nonbias_mask = jax.tree_util.tree_map(lambda b: not b, bias_mask)

    def branch(lr_factor, wd):
        chain = []
        if wd > 0:
            chain.append(optax.add_decayed_weights(wd))
        chain.append(optax.trace(decay=s.momentum))
        chain.append(optax.scale_by_schedule(
            lambda step: -s.base_lr * lr_factor * sched(step)))
        return optax.chain(*chain)

    tx = optax.chain(
        optax.masked(branch(1.0, s.weight_decay), nonbias_mask),
        optax.masked(branch(s.bias_lr_factor, s.weight_decay_bias),
                     bias_mask),
    )
    lr_fn = lambda step: s.base_lr * sched(step)
    return tx, lr_fn
