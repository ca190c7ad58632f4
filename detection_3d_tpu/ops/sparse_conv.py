"""Sparse convolution compute: gather-GEMM-scatter on the MXU.

TPU-native equivalent of the SCN CUDA kernels
(/root/reference/SparseConvNet/sparseconvnet/SCN/CUDA/Convolution.cu:57-130,
Deconvolution.cu): per kernel offset, gather active-neighbor feature rows
and accumulate one (V, Cin) @ (Cin, Cout) matmul per offset. Missing
neighbors gather a zero pad row (index V), so no masking multiplies are
needed, and XLA lowers each step to one MXU matmul + fused gather.

All functions are pure: weights are explicit arrays, index arrays come from
detection_3d_tpu.ops.sparse (built once per scale and reused across every
conv at that scale — the analogue of SCN's rulebook cache,
SCN/Metadata/Metadata.h:54-74).

Weight layout: (K, Cin, Cout) where K iterates kernel offsets in the same
order as the index-building loops.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _padded(feats):
    """Append one zero row: gather index V yields zeros."""
    return jnp.concatenate([feats, jnp.zeros_like(feats[:1])], axis=0)


@jax.jit
def gather_conv(feats, neighbor_idx, weights, out_valid,
                accum_dtype=jnp.float32):
    """Shared core: sum_k gather(feats, idx[k]) @ W[k].

    Args:
      feats: (V_in, Cin) input features;
      neighbor_idx: (K, V_out) gather rows (V_in => missing/zero);
      weights: (K, Cin, Cout);
      out_valid: (V_out,) bool row mask for the output table.

    Returns: (V_out, Cout) in feats.dtype.
    """
    src = _padded(feats)
    cout = weights.shape[-1]
    v_out = neighbor_idx.shape[1]
    # derive the zero init from traced inputs so its sharding/varying axes
    # match the scan outputs under shard_map
    zero = (feats.ravel()[0] * 0).astype(accum_dtype)
    init = jnp.zeros((v_out, cout), accum_dtype) + zero

    def body(acc, kw):
        idx_k, w_k = kw
        rows = src[idx_k]
        return acc + jnp.dot(rows, w_k,
                             preferred_element_type=accum_dtype), None

    # scan over kernel offsets: one traced body instead of K copies —
    # this op is instantiated ~30x per model forward
    out, _ = jax.lax.scan(body, init, (neighbor_idx, weights))
    out = jnp.where(out_valid[:, None], out, 0.0)
    return out.astype(feats.dtype)


def _best_conv(feats, rulebook, weights, out_valid):
    """Route to the Pallas windowed-gather kernel on TPU (falls back to
    the XLA scan-gather path off-TPU / on unsupported shapes).

    ``rulebook`` may be a plain (K, V) index array or a dict from
    build_pyramid: {"idx", [windowed fields], ["halo"]}. A "halo" entry
    (parallel/spatial.HaloExchange) means the voxel table is spatially
    sharded over a mesh axis: halo rows are refreshed from the
    neighboring shards (ppermute over ICI) right before the gather — the
    spatial-sharding analogue of a context-parallel halo exchange.
    """
    from detection_3d_tpu.ops.pallas.gather_conv_kernel import (
        windowed_gather_conv,
    )
    if isinstance(rulebook, dict) and rulebook.get("halo") is not None:
        feats = rulebook["halo"].refresh(feats)
    return windowed_gather_conv(feats, rulebook, weights, out_valid)


def submanifold_conv(table_feats, neighbor_idx, weights, out_valid):
    """Submanifold conv: output sites == input sites; neighbor_idx from
    ``neighbor_indices(table, submanifold_offsets(kernel))``."""
    return _best_conv(table_feats, neighbor_idx, weights, out_valid)


def strided_conv(in_feats, rulebook_idx, weights, out_valid):
    """Strided (downsampling) conv: rulebook from ``conv_rulebook``."""
    return _best_conv(in_feats, rulebook_idx, weights, out_valid)


def deconv(in_feats, rulebook_idx, weights, out_valid):
    """Transposed conv back onto a cached finer-scale table.

    ``rulebook_idx`` (K, V_fine) indexes the *coarse* table: entry [k, x]
    is the coarse site o with fine_coord(x) == o*stride + offset_k (SCN
    reverses the forward rulebook, SCN/CUDA/Deconvolution.cu — here the
    reversed book is just a different gather table)."""
    return _best_conv(in_feats, rulebook_idx, weights, out_valid)


@functools.partial(jax.jit, static_argnames=("kernel", "stride"))
def deconv_rulebook(fine_table, coarse_table, kernel, stride):
    """(K, V_fine) indices into the coarse table for ``deconv``.

    For fine site x and kernel offset k: contributes iff (x - k) is
    divisible by stride and (x - k)/stride is an active coarse site.
    """
    v_coarse = coarse_table.capacity
    fx = fine_table.coords
    st = jnp.array([stride[0], stride[1], stride[2], 1], jnp.int32)
    deltas = jnp.array(
        [[kx, ky, kz, 0] for kx in range(kernel[0])
         for ky in range(kernel[1]) for kz in range(kernel[2])], jnp.int32)
    num = fx[None, :, :] - deltas[:, None, :]                # (K, V, 4)
    o = num // st
    exact = jnp.all(o * st == num, axis=-1)                  # (K, V)
    idx, found = coarse_table.lookup(
        o, valid=fine_table.row_valid[None, :] & exact)
    return jnp.where(found & exact, idx, v_coarse)


def nin_conv(feats, weight, out_valid):
    """1x1x1 (NetworkInNetwork) conv: one plain matmul over active rows."""
    out = jnp.dot(feats, weight, preferred_element_type=jnp.float32)
    return jnp.where(out_valid[:, None], out, 0.0).astype(feats.dtype)
