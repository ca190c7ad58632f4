"""Sparse pooling / unpooling layers.

Equivalents of SCN's MaxPooling / AveragePooling / UnPooling
(/root/reference/SparseConvNet/sparseconvnet/maxPooling.py,
averagePooling.py, unPooling.py + their SCN/CPU|CUDA kernels): pool over
the strided-conv rulebook (same output-table construction as strided
convs), unpool by gathering each fine site's parent features. These are
not used by the FPN detector itself (fpn_net uses strided convs), but
complete the sparse layer zoo for UNet/VGG-style architectures
(networkArchitectures.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def max_pool(in_feats, rulebook_idx, out_valid):
    """(V_in, C) -> (V_out, C) max over the kernel window.

    rulebook_idx: (K, V_out) indices into the input (V_in = missing).
    Missing contributions are -inf so empty windows yield 0 after masking.
    """
    neg = jnp.finfo(jnp.float32).min
    src = jnp.concatenate(
        [in_feats.astype(jnp.float32),
         jnp.full((1, in_feats.shape[-1]), neg, jnp.float32)], axis=0)

    def body(acc, idx_k):
        return jnp.maximum(acc, src[idx_k]), None

    zero = (in_feats.ravel()[0] * 0).astype(jnp.float32)
    init = jnp.full((rulebook_idx.shape[1], in_feats.shape[-1]), neg,
                    jnp.float32) + zero
    out, _ = jax.lax.scan(body, init, rulebook_idx)
    out = jnp.where(jnp.isfinite(out), out, 0.0)
    out = jnp.where(out_valid[:, None], out, 0.0)
    return out.astype(in_feats.dtype)


def avg_pool(in_feats, rulebook_idx, out_valid):
    """Mean over present (active) inputs in each kernel window."""
    v_in = in_feats.shape[0]
    src = jnp.concatenate(
        [in_feats.astype(jnp.float32),
         jnp.zeros((1, in_feats.shape[-1]), jnp.float32)], axis=0)

    def body(carry, idx_k):
        acc, cnt = carry
        present = (idx_k < v_in).astype(jnp.float32)
        return (acc + src[idx_k], cnt + present), None

    zero = (in_feats.ravel()[0] * 0).astype(jnp.float32)
    init = (jnp.zeros((rulebook_idx.shape[1], in_feats.shape[-1]),
                      jnp.float32) + zero,
            jnp.zeros((rulebook_idx.shape[1],), jnp.float32) + zero)
    (acc, cnt), _ = jax.lax.scan(body, init, rulebook_idx)
    out = acc / jnp.maximum(cnt, 1.0)[:, None]
    out = jnp.where(out_valid[:, None], out, 0.0)
    return out.astype(in_feats.dtype)


def unpool(coarse_feats, deconv_rulebook_idx, fine_valid):
    """Broadcast each coarse feature to its covered fine sites (mean over
    contributing offsets, = SCN UnPooling semantics for disjoint windows).
    """
    v_coarse = coarse_feats.shape[0]
    src = jnp.concatenate(
        [coarse_feats.astype(jnp.float32),
         jnp.zeros((1, coarse_feats.shape[-1]), jnp.float32)], axis=0)

    def body(carry, idx_k):
        acc, cnt = carry
        present = (idx_k < v_coarse).astype(jnp.float32)
        return (acc + src[idx_k], cnt + present), None

    zero = (coarse_feats.ravel()[0] * 0).astype(jnp.float32)
    init = (jnp.zeros((deconv_rulebook_idx.shape[1],
                       coarse_feats.shape[-1]), jnp.float32) + zero,
            jnp.zeros((deconv_rulebook_idx.shape[1],), jnp.float32) + zero)
    (acc, cnt), _ = jax.lax.scan(body, init, deconv_rulebook_idx)
    out = acc / jnp.maximum(cnt, 1.0)[:, None]
    out = jnp.where(fine_valid[:, None], out, 0.0)
    return out.astype(coarse_feats.dtype)
