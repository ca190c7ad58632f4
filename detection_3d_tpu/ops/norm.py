"""Masked batch norm + leaky ReLU over active sparse rows.

Equivalent of SCN BatchNormLeakyReLU
(/root/reference/SparseConvNet/sparseconvnet/batchNormalization.py:13-98):
normalizes the (V, C) active-feature matrix over the row axis. The real
configs run TRACK_RUNNING_STATS=False (configs/6c/...yaml TRACK_RUNNING
_STATS), i.e. *batch statistics are used in eval too* — parity requires
keeping that default. Statistics are computed only over valid rows.
"""

from __future__ import annotations

import jax.numpy as jnp


def batch_norm_leaky_relu(feats, valid, scale, bias, leakiness: float = 0.0,
                          eps: float = 1e-4, running_stats=None,
                          use_running: bool = False, axis_name=None):
    """Args:
      feats: (V, C); valid: (V,) bool; scale/bias: (C,).
      running_stats: optional (mean, var) to use when ``use_running``.
      leakiness: slope for x<0 (0 => plain ReLU).
      axis_name: when the voxel set is spatially sharded over a mesh axis
        (parallel/spatial.py), statistics are psum-reduced over it so
        every shard normalizes with the GLOBAL batch moments.

    Returns normalized+activated (V, C) with invalid rows zeroed.
    """
    import jax

    f32 = feats.astype(jnp.float32)
    if use_running and running_stats is not None:
        mean, var = running_stats
    else:
        w = valid.astype(jnp.float32)[:, None]
        n = jnp.sum(w)
        s1 = jnp.sum(f32 * w, axis=0)
        s2 = jnp.sum(jnp.square(f32) * w, axis=0)
        if axis_name is not None:
            n, s1, s2 = jax.lax.psum((n, s1, s2), axis_name)
        n = jnp.maximum(n, 1.0)
        mean = s1 / n
        var = jnp.maximum(s2 / n - jnp.square(mean), 0.0)
    inv = jnp.reciprocal(jnp.sqrt(var + eps))
    out = (f32 - mean) * (inv * scale) + bias
    out = jnp.where(out > 0, out, out * leakiness)
    out = jnp.where(valid[:, None], out, 0.0)
    return out.astype(feats.dtype)


def batch_stats(feats, valid):
    """Masked (mean, var) over rows — for maintaining running stats."""
    f32 = feats.astype(jnp.float32)
    w = valid.astype(jnp.float32)[:, None]
    n = jnp.maximum(jnp.sum(w), 1.0)
    mean = jnp.sum(f32 * w, axis=0) / n
    var = jnp.sum(jnp.square(f32 - mean) * w, axis=0) / n
    return mean, var
