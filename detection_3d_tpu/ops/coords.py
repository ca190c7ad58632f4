"""Voxel-coordinate keys and sorted-table lookup, fully on-device.

Replaces the reference's CPU hash tables (google dense_hash_map in
/root/reference/SparseConvNet/sparseconvnet/SCN/Metadata/Metadata.h:24-163)
with a TPU-friendly *sorted table* design: active voxel coordinates are
sorted by a lexicographic (hi, lo) int32 key pair and neighbors are found
with a vectorized binary search. A pair is used because the full grid
(4096 x 4096 x 512 x batch) needs 33+ bits, which does not fit one int32
(TPU-native int width).

Key packing (static grid sizes X, Y, Z, batch b):
    hi = b * X + x          (fits: batch * 4096)
    lo = y * Z + z          (fits: 4096 * 512 = 2^21)

Padding rows use hi = lo = INT32_MAX, so they sort to the end and never
match a real query.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

INVALID = jnp.iinfo(jnp.int32).max


def pack_key(coords, spatial_size, valid=None):
    """(..., 4) int32 coords [x, y, z, b] -> (hi, lo) int32 keys.

    Out-of-bounds or invalid coords map to (INVALID, INVALID).
    """
    x, y, z, b = (coords[..., i] for i in range(4))
    X, Y, Z = spatial_size
    hi = b * X + x
    lo = y * Z + z
    inb = (x >= 0) & (x < X) & (y >= 0) & (y < Y) & (z >= 0) & (z < Z) & (b >= 0)
    if valid is not None:
        inb = inb & valid
    hi = jnp.where(inb, hi, INVALID)
    lo = jnp.where(inb, lo, INVALID)
    return hi, lo


def lex_sort(hi, lo, *arrays):
    """Sort rows by (hi, lo) ascending; returns (hi, lo, *arrays) sorted."""
    order = jnp.lexsort((lo, hi))
    return tuple(a[order] for a in (hi, lo) + tuple(arrays))


def _lex_less(h1, l1, h2, l2):
    return (h1 < h2) | ((h1 == h2) & (l1 < l2))


def lex_searchsorted(hi_sorted, lo_sorted, hi_q, lo_q):
    """Vectorized binary search for composite keys.

    Args:
      hi_sorted, lo_sorted: (V,) table keys, lexicographically sorted.
      hi_q, lo_q: (...,) query keys.

    Returns:
      idx: (...,) int32 position of the query in the table (undefined when
        not found);
      found: (...,) bool — exact match exists.
    """
    n = hi_sorted.shape[0]
    nbits = max(1, (n - 1).bit_length())

    lo_bound = jnp.zeros_like(hi_q)

    # classic branchless binary search (lower-bound); fori_loop keeps the
    # trace small — this lookup is instantiated hundreds of times per
    # model forward (once per kernel offset per scale)
    def step_fn(i, lo_bound):
        shift = nbits - 1 - i
        probe = lo_bound + jnp.left_shift(jnp.int32(1), shift)
        ok = probe <= n
        pi = jnp.clip(probe - 1, 0, n - 1)
        th = hi_sorted[pi]
        tl = lo_sorted[pi]
        advance = ok & _lex_less(th, tl, hi_q, lo_q)
        return jnp.where(advance, probe, lo_bound)

    lo_bound = jax.lax.fori_loop(0, nbits, step_fn, lo_bound)

    idx = jnp.clip(lo_bound, 0, n - 1).astype(jnp.int32)
    found = (hi_sorted[idx] == hi_q) & (lo_sorted[idx] == lo_q) & (
        hi_q != INVALID)
    return idx, found


def unique_consecutive_segments(hi_sorted, lo_sorted):
    """Segment ids for runs of equal sorted keys.

    Returns (seg_id (N,), is_first (N,), num_segments scalar). INVALID rows
    share the trailing segment(s) — callers mask them via key != INVALID.
    """
    same = (hi_sorted[1:] == hi_sorted[:-1]) & (lo_sorted[1:] == lo_sorted[:-1])
    is_first = jnp.concatenate([jnp.array([True]), ~same])
    seg_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1
    valid = hi_sorted != INVALID
    num = jnp.sum((is_first & valid).astype(jnp.int32))
    return seg_id, is_first, num
