"""SparseTensor: the on-device sorted voxel table.

TPU-native replacement for SparseConvNet's SparseConvNetTensor + Metadata
(/root/reference/SparseConvNet/sparseconvnet/sparseConvNetTensor.py:12,
SCN/Metadata/Metadata.h:24-163). Instead of CPU hash maps and per-op
rulebook caches, a SparseTensor keeps:

  * ``coords`` (V, 4) int32 [x, y, z, b] — active sites, lexicographically
    sorted by (hi, lo) key; padding rows carry INVALID keys and sort last;
  * ``feats`` (V, C) — active-site features (padding rows are zero);
  * ``hi``/``lo`` (V,) int32 — the sorted key pair (cached);
  * ``num`` scalar int32 — number of active rows;
  * static aux: ``spatial_size`` (X, Y, Z) and ``batch_size``.

V is a static capacity; all ops mask with ``row_valid``. Neighbor indices
(the "rulebook" equivalent) are dense per-offset gather index arrays built
once per scale with a vectorized binary search and cached by the backbone
for the duration of a forward pass.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from detection_3d_tpu.ops.coords import (
    INVALID, pack_key, lex_sort, lex_searchsorted, unique_consecutive_segments,
)


@jax.tree_util.register_pytree_node_class
class SparseTensor:
    """Sorted sparse voxel table (pytree: coords/feats/hi/lo/num traced).

    ``dense_grid`` (optional, (X*Y*Z,) int32, -1 = empty) turns every
    lookup into ONE gather instead of a ~17-step binary search — built for
    scales whose grid volume fits the configured budget
    (:meth:`with_dense_grid`). This is the HBM-resident voxel-hash
    equivalent of the reference's per-scale SparseGrid
    (SCN/Metadata/Metadata.h:24-163), laid out TPU-style as a flat array.
    """

    def __init__(self, coords, feats, hi, lo, num, spatial_size, batch_size,
                 dense_grid=None, true_num=None, xy_grid=None):
        self.coords = coords
        self.feats = feats
        self.hi = hi
        self.lo = lo
        self.num = num
        self.spatial_size = tuple(int(s) for s in spatial_size)
        self.batch_size = int(batch_size)
        self.dense_grid = dense_grid
        # xy_grid: (col_start, col_count) over the flat (b, x, y) plane —
        # the lookup accelerator for scales whose FULL 3D grid does not
        # fit HBM (see with_xy_grid)
        self.xy_grid = xy_grid
        # pre-truncation voxel count: > capacity means the input layer had
        # to subsample (overflow signal for the trainer/inference loops)
        self.true_num = num if true_num is None else true_num

    # -- pytree protocol ---------------------------------------------------
    def tree_flatten(self):
        children = (self.coords, self.feats, self.hi, self.lo, self.num,
                    self.dense_grid, self.true_num, self.xy_grid)
        aux = (self.spatial_size, self.batch_size)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        coords, feats, hi, lo, num, dense_grid, true_num, xy_grid = children
        spatial_size, batch_size = aux
        return cls(coords, feats, hi, lo, num, spatial_size, batch_size,
                   dense_grid, true_num, xy_grid)

    def with_dense_grid(self, max_entries: int = 1 << 26):
        """Attach a dense (X*Y*Z*B,) row-index grid when affordable."""
        X, Y, Z = self.spatial_size
        total = X * Y * Z * self.batch_size
        if total > max_entries or self.dense_grid is not None:
            return self
        flat = self._flat_index(self.coords)
        flat = jnp.where(self.row_valid, flat, total)  # pad rows dropped
        grid = jnp.full((total,), -1, jnp.int32)
        grid = grid.at[flat].set(
            jnp.arange(self.capacity, dtype=jnp.int32), mode="drop")
        return SparseTensor(self.coords, self.feats, self.hi, self.lo,
                            self.num, self.spatial_size, self.batch_size,
                            grid, self.true_num, self.xy_grid)

    def with_xy_grid(self, max_entries: int = 1 << 25):
        """Attach a dense (X*Y*B,) COLUMN index: start row + row count of
        every (b, x, y) column (rows within a column are contiguous and
        z-sorted — key order is (b, x) then (y, z), ops/coords.py).

        This is the lookup accelerator for scales whose full 3D grid
        cannot be dense (4096 x 4096 x 512 = 8.6G entries at scale 0):
        the xy plane is only X*Y*B entries (16.8M at scale 0, 67 MB
        int32), and a query becomes 2 gathers (start, count) + a
        <= log2(Z)-step in-column search instead of a 17-step binary
        search over the whole table. Profiled at the reference-scale
        bench, the whole-table searches were ~80% of device time.
        """
        X, Y, Z = self.spatial_size
        total = X * Y * self.batch_size
        if (total > max_entries or self.xy_grid is not None
                or self.dense_grid is not None):
            return self
        x = self.coords[:, 0]
        y = self.coords[:, 1]
        b = self.coords[:, 3]
        ck = jnp.where(self.row_valid, (b * X + x) * Y + y, total)
        start = jnp.full((total,), self.capacity, jnp.int32)
        start = start.at[ck].min(
            jnp.arange(self.capacity, dtype=jnp.int32), mode="drop")
        count = jnp.zeros((total,), jnp.int32)
        count = count.at[ck].add(1, mode="drop")
        return SparseTensor(self.coords, self.feats, self.hi, self.lo,
                            self.num, self.spatial_size, self.batch_size,
                            self.dense_grid, self.true_num, (start, count))

    def _flat_index(self, coords):
        X, Y, Z = self.spatial_size
        x, y, z, b = (coords[..., i] for i in range(4))
        return ((b * X + x) * Y + y) * Z + z

    # -- helpers -----------------------------------------------------------
    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]

    @property
    def row_valid(self):
        return jnp.arange(self.capacity) < self.num

    def with_feats(self, feats):
        return SparseTensor(self.coords, feats, self.hi, self.lo, self.num,
                            self.spatial_size, self.batch_size,
                            self.dense_grid, self.true_num, self.xy_grid)

    def lookup(self, coords, valid=None):
        """Find rows for query coords (..., 4). Returns (idx, found)."""
        if self.dense_grid is not None:
            X, Y, Z = self.spatial_size
            x, y, z, b = (coords[..., i] for i in range(4))
            inb = ((x >= 0) & (x < X) & (y >= 0) & (y < Y) & (z >= 0)
                   & (z < Z) & (b >= 0) & (b < self.batch_size))
            if valid is not None:
                inb = inb & valid
            flat = jnp.where(inb, self._flat_index(coords), 0)
            idx = self.dense_grid[flat]
            found = inb & (idx >= 0)
            return jnp.where(found, idx, 0).astype(jnp.int32), found
        if self.xy_grid is not None:
            pos, inb, cs, cl, qhi, qlo = self.column_lower_bound(coords,
                                                                 valid)
            idx = jnp.clip(pos, 0, self.capacity - 1).astype(jnp.int32)
            found = inb & (cl > 0) & (self.hi[idx] == qhi) & \
                (self.lo[idx] == qlo)
            return idx, found
        qhi, qlo = pack_key(coords, self.spatial_size, valid)
        return lex_searchsorted(self.hi, self.lo, qhi, qlo)

    def column_lower_bound(self, coords, valid=None):
        """In-column lower bound via the xy grid.

        Returns (pos, inb, col_start, col_count, qhi, qlo): ``pos`` is the
        first row of the (b, x, y) column whose key >= the query's (i.e.
        whose z >= the query z), in [col_start, col_start + col_count].
        Exposed separately from lookup() so rulebook builders can derive
        z-adjacent neighbors from one search.
        """
        start, count = self.xy_grid
        X, Y, Z = self.spatial_size
        x, y, z, b = (coords[..., i] for i in range(4))
        inb = ((x >= 0) & (x < X) & (y >= 0) & (y < Y) & (z >= 0)
               & (z < Z) & (b >= 0) & (b < self.batch_size))
        if valid is not None:
            inb = inb & valid
        qhi = b * X + x
        qlo = y * Z + z
        ck = jnp.where(inb, qhi * Y + y, 0)
        cs = start[ck]
        cl = jnp.where(inb, count[ck], 0)
        n = self.capacity
        lo = self.lo
        # branchless lower bound within the column window [cs, cs + cl):
        # columns hold at most Z rows -> log2(Z)+1 fixed steps
        nbits = max(1, int(Z).bit_length())

        def step_fn(i, pos):
            shift = nbits - 1 - i
            probe = pos + jnp.left_shift(jnp.int32(1), shift)
            ok = probe <= cs + cl
            pi = jnp.clip(probe - 1, 0, n - 1)
            advance = ok & (lo[pi] < qlo)
            return jnp.where(advance, probe, pos)

        pos = jax.lax.fori_loop(0, nbits, step_fn, cs)
        return pos, inb, cs, cl, qhi, qlo


@functools.partial(jax.jit, static_argnames=("spatial_size", "batch_size",
                                             "capacity", "reduce",
                                             "return_row_map"))
def build_sparse_tensor(coords, feats, valid, spatial_size, batch_size,
                        capacity: int, reduce: str = "mean",
                        return_row_map: bool = False):
    """Deduplicating input layer: raw voxel coords -> SparseTensor.

    Equivalent of SCN InputLayer mode=4 (dedup + average duplicate features,
    /root/reference/SparseConvNet/sparseconvnet/ioLayers.py:31-65): rows with
    equal (x,y,z,b) are merged; ``reduce`` 'mean' averages their features
    ('sum'/'max' also supported). Out-of-grid and ``~valid`` rows are dropped
    (the reference filters them host-side, suncg_dataset.py:160-171).

    Args:
      coords: (N, 4) int32 [x, y, z, b];
      feats: (N, C);
      valid: (N,) bool or None;
      capacity: static output table size (pad/truncate to this many voxels);
      return_row_map: also return (N,) int32 — for every INPUT row, the
        output table row holding its voxel (== capacity when the row was
        invalid or its voxel was dropped by capacity overflow). This is
        the free by-product of the dedup sort that lets downsample
        rulebooks be built by SCATTER instead of key search
        (:func:`downsample_with_rulebooks`).
    """
    n = coords.shape[0]
    if valid is None:
        valid = jnp.ones((n,), bool)
    hi, lo = pack_key(coords, spatial_size, valid)
    order = jnp.lexsort((lo, hi))
    hi, lo, coords_s, feats_s = (a[order] for a in (hi, lo, coords, feats))
    seg_id, is_first, num_vox = unique_consecutive_segments(hi, lo)

    # Capacity overflow: keep every k-th segment (k = ceil(num/cap))
    # instead of the first `capacity` ones. Keys are spatially ordered, so
    # a sorted-suffix drop would lose one corner of the building; the
    # stride keeps coverage spatially uniform. ``true_num`` carries the
    # pre-truncation count so callers can surface the overflow.
    stride = jnp.maximum((num_vox + capacity - 1) // capacity, 1)
    keep = (seg_id % stride) == 0
    slot = seg_id // stride
    row_on = (hi != INVALID) & keep

    seg_id_c = jnp.minimum(slot, capacity - 1)
    ones = row_on.astype(feats.dtype)
    if reduce == "max":
        out_feats = jax.ops.segment_max(
            jnp.where(row_on[:, None], feats_s,
                      jnp.finfo(feats.dtype).min),
            seg_id_c, num_segments=capacity, indices_are_sorted=True)
        out_feats = jnp.where(jnp.isfinite(out_feats), out_feats, 0.0)
    else:
        sums = jax.ops.segment_sum(feats_s * ones[:, None], seg_id_c,
                                   num_segments=capacity,
                                   indices_are_sorted=True)
        if reduce == "mean":
            counts = jax.ops.segment_sum(ones, seg_id_c,
                                         num_segments=capacity,
                                         indices_are_sorted=True)
            out_feats = sums / jnp.maximum(counts, 1.0)[:, None]
        else:
            out_feats = sums

    # representative coords/keys per segment (first occurrence)
    first_idx = jax.ops.segment_min(
        jnp.where(row_on, jnp.arange(n), n), seg_id_c,
        num_segments=capacity, indices_are_sorted=True)
    in_range = first_idx < n
    gather_idx = jnp.minimum(first_idx, n - 1)
    out_coords = jnp.where(in_range[:, None], coords_s[gather_idx], INVALID)
    out_hi = jnp.where(in_range, hi[gather_idx], INVALID)
    out_lo = jnp.where(in_range, lo[gather_idx], INVALID)

    num = jnp.minimum((num_vox + stride - 1) // stride, capacity)
    row_ok = jnp.arange(capacity) < num
    out_feats = jnp.where(row_ok[:, None], out_feats, 0.0)
    out_coords = jnp.where(row_ok[:, None], out_coords, INVALID)
    out_hi = jnp.where(row_ok, out_hi, INVALID)
    out_lo = jnp.where(row_ok, out_lo, INVALID)
    table = SparseTensor(out_coords, out_feats, out_hi, out_lo, num,
                         spatial_size, batch_size, true_num=num_vox)
    if not return_row_map:
        return table
    slot_sorted = jnp.where(row_on & (slot < num), slot,
                            capacity).astype(jnp.int32)
    row_map = jnp.zeros((n,), jnp.int32).at[order].set(slot_sorted)
    return table, row_map


def submanifold_offsets(kernel: Tuple[int, int, int]):
    """Centered kernel offsets for submanifold conv (odd kernel sizes)."""
    kx, ky, kz = kernel
    offs = []
    for dx in range(-(kx // 2), kx // 2 + 1):
        for dy in range(-(ky // 2), ky // 2 + 1):
            for dz in range(-(kz // 2), kz // 2 + 1):
                offs.append((dx, dy, dz))
    return tuple(offs)


@functools.partial(jax.jit, static_argnames=("offsets",))
def neighbor_indices(table: SparseTensor, offsets):
    """Per-offset gather indices into the table (the 'rulebook').

    Equivalent information to SubmanifoldConvolution_SgsToRules
    (/root/reference/SparseConvNet/sparseconvnet/SCN/Metadata/
    SubmanifoldConvolutionRules.h:26-57), but as dense (K, V) index arrays:
    idx[k, i] = row of neighbor of site i at offset k, or V (a zero pad row)
    when absent. All K offsets resolve in ONE vectorized binary search.

    With an xy-column grid attached and a 3^3 kernel, the grouped builder
    is used instead: 8 xy-column searches (the center column is the row
    itself) + z-adjacency checks replace 27 independent searches — rows
    within a column are z-sorted and contiguous, so the dz = +-1
    neighbors of a found position are its adjacent rows.
    """
    if (table.xy_grid is not None and table.dense_grid is None
            and len(offsets) == 27):
        return _neighbor_indices_3x3x3_grouped(table, offsets)
    v = table.capacity
    deltas = jnp.array([[o[0], o[1], o[2], 0] for o in offsets], jnp.int32)
    q = table.coords[None, :, :] + deltas[:, None, :]        # (K, V, 4)
    idx, found = table.lookup(q, valid=table.row_valid[None, :])
    return jnp.where(found, idx, v)


def _z_triplet(table, pos, cs, cl, qhi, qlo, col_ok, z):
    """Rows for (z-1, z, z+1) of one column from a single lower bound.

    ``pos`` = first row of the column with lo >= qlo. Returns three
    (idx, found) pairs. Guards z boundaries explicitly: lo = y*Z + z, so
    lo -+ 1 can wrap into the previous/next y column (hi would still
    match) — the z-range check is what prevents that false hit.
    """
    Z = table.spatial_size[2]
    n = table.capacity
    lo, hi = table.lo, table.hi

    pc = jnp.clip(pos, 0, n - 1)
    in_col = col_ok & (pos < cs + cl)
    center_f = in_col & (lo[pc] == qlo) & (hi[pc] == qhi)

    pm = jnp.clip(pos - 1, 0, n - 1)
    minus_f = col_ok & (pos - 1 >= cs) & (z >= 1) & \
        (lo[pm] == qlo - 1) & (hi[pm] == qhi)

    pp_raw = pos + center_f.astype(pos.dtype)
    pp = jnp.clip(pp_raw, 0, n - 1)
    plus_f = col_ok & (pp_raw < cs + cl) & (z + 1 < Z) & \
        (lo[pp] == qlo + 1) & (hi[pp] == qhi)
    return (pm, minus_f), (pc, center_f), (pp, plus_f)


def _neighbor_indices_3x3x3_grouped(table: SparseTensor, offsets):
    v = table.capacity
    Z = table.spatial_size[2]
    rows = jnp.arange(v, dtype=jnp.int32)
    rv = table.row_valid
    z_own = table.coords[:, 2]
    out = {}
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                # center column: the site IS its own center; dz = +-1 are
                # the adjacent rows when their key is one z step away
                pm = jnp.clip(rows - 1, 0, v - 1)
                minus_f = rv & (rows >= 1) & (z_own >= 1) & \
                    (table.lo[pm] == table.lo - 1) & \
                    (table.hi[pm] == table.hi)
                pp = jnp.clip(rows + 1, 0, v - 1)
                plus_f = rv & (rows + 1 < v) & (z_own + 1 < Z) & \
                    (table.lo[pp] == table.lo + 1) & \
                    (table.hi[pp] == table.hi)
                trip = ((pm, minus_f), (rows, rv), (pp, plus_f))
            else:
                delta = jnp.array([dx, dy, 0, 0], jnp.int32)
                pos, inb, cs, cl, qhi, qlo = table.column_lower_bound(
                    table.coords + delta, valid=rv)
                col_ok = inb & (cl > 0)
                trip = _z_triplet(table, pos, cs, cl, qhi, qlo, col_ok,
                                  z_own)
            for dz, (idx, found) in zip((-1, 0, 1), trip):
                out[(dx, dy, dz)] = jnp.where(found, idx, v)
    return jnp.stack([out[o] for o in offsets])


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "capacity"))
def downsample_table(table: SparseTensor, kernel, stride, capacity: int):
    """Build the strided-conv output table.

    Semantics of Convolution_InputSgToRulesAndOutputSg
    (/root/reference/SparseConvNet/sparseconvnet/SCN/Metadata/
    ConvolutionRules.h:11-60): an output site exists iff >= 1 active input
    lies in its receptive field [o*stride, o*stride + kernel). Each input at
    x contributes to outputs o in ceil((x-k+1)/s) .. floor(x/s); we expand
    those candidates (prod(ceil(k/s)) per axis), dedup by sorted key.

    Returns a SparseTensor over the downsampled grid with zero features
    (shape (capacity, 0)); conv fills features separately.
    """
    ksz = tuple(kernel)
    st = tuple(stride)
    reach = [max(1, -(-k // s)) for k, s in zip(ksz, st)]  # ceil(k/s)
    out_size = tuple(-(-d // s) for d, s in zip(table.spatial_size, st))

    cand_coords = []
    cand_valid = []
    x = table.coords[:, 0]
    y = table.coords[:, 1]
    z = table.coords[:, 2]
    b = table.coords[:, 3]
    rv = table.row_valid
    for ax_off_x in range(reach[0]):
        for ax_off_y in range(reach[1]):
            for ax_off_z in range(reach[2]):
                # candidate output = floor(x/s) - axis offset; valid iff the
                # input is inside that output's kernel window
                ox = x // st[0] - ax_off_x
                oy = y // st[1] - ax_off_y
                oz = z // st[2] - ax_off_z
                okx = (x - ox * st[0] < ksz[0]) & (ox >= 0)
                oky = (y - oy * st[1] < ksz[1]) & (oy >= 0)
                okz = (z - oz * st[2] < ksz[2]) & (oz >= 0)
                cand_coords.append(jnp.stack([ox, oy, oz, b], axis=-1))
                cand_valid.append(okx & oky & okz & rv)
    coords_all = jnp.concatenate(cand_coords, axis=0)
    valid_all = jnp.concatenate(cand_valid, axis=0)

    empty_feats = jnp.zeros((coords_all.shape[0], 0), table.feats.dtype)
    return build_sparse_tensor(coords_all, empty_feats, valid_all, out_size,
                               table.batch_size, capacity, reduce="sum")


@functools.partial(jax.jit, static_argnames=("kernel", "stride", "capacity"))
def downsample_with_rulebooks(table: SparseTensor, kernel, stride,
                              capacity: int):
    """Strided-conv output table + conv AND deconv rulebooks in one pass,
    with ZERO key searches.

    The candidate expansion of :func:`downsample_table` already knows
    every (input row, output site, kernel offset) triple, and the dedup
    sort inside build_sparse_tensor assigns each candidate its output
    row (``return_row_map``) — so both rulebooks are single scatters of
    that mapping. Replaces downsample_table + conv_rulebook(+match) +
    deconv_rulebook(+match); exact-equality tested against the searched
    versions. (The reference builds the same pairs imperatively inside
    its CPU hash loop, SCN/Metadata/ConvolutionRules.h:11-60.)

    Returns (out_table, conv_rb (K, capacity), deconv_rb (K, V_in)).
    """
    ksz = tuple(kernel)
    st = tuple(stride)
    reach = [max(1, -(-k // s)) for k, s in zip(ksz, st)]
    out_size = tuple(-(-d // s) for d, s in zip(table.spatial_size, st))
    v_in = table.capacity
    kvol = ksz[0] * ksz[1] * ksz[2]

    x = table.coords[:, 0]
    y = table.coords[:, 1]
    z = table.coords[:, 2]
    b = table.coords[:, 3]
    rv = table.row_valid
    cand_coords = []
    cand_valid = []
    cand_koff = []
    for ax_off_x in range(reach[0]):
        for ax_off_y in range(reach[1]):
            for ax_off_z in range(reach[2]):
                ox = x // st[0] - ax_off_x
                oy = y // st[1] - ax_off_y
                oz = z // st[2] - ax_off_z
                kx = x - ox * st[0]
                ky = y - oy * st[1]
                kz = z - oz * st[2]
                okx = (kx < ksz[0]) & (ox >= 0)
                oky = (ky < ksz[1]) & (oy >= 0)
                okz = (kz < ksz[2]) & (oz >= 0)
                cand_coords.append(jnp.stack([ox, oy, oz, b], axis=-1))
                cand_valid.append(okx & oky & okz & rv)
                cand_koff.append((kx * ksz[1] + ky) * ksz[2] + kz)
    coords_all = jnp.concatenate(cand_coords, axis=0)
    valid_all = jnp.concatenate(cand_valid, axis=0)
    koff_all = jnp.concatenate(cand_koff, axis=0)
    n_rep = len(cand_coords)

    empty = jnp.zeros((coords_all.shape[0], 0), table.feats.dtype)
    out_table, row_map = build_sparse_tensor(
        coords_all, empty, valid_all, out_size, table.batch_size,
        capacity, reduce="sum", return_row_map=True)

    src_row = jnp.tile(jnp.arange(v_in, dtype=jnp.int32), n_rep)
    ok = valid_all & (row_map < capacity)
    koff = jnp.where(ok, koff_all, kvol)   # sentinel -> overflow slot

    # conv rulebook: idx[k, out_row] = input row (or v_in when absent).
    # each (k, out_row) has at most ONE input (site out*stride+k), so the
    # scatter never collides.
    flat_c = jnp.where(ok, koff * capacity + row_map, kvol * capacity)
    conv_rb = jnp.full((kvol * capacity + 1,), v_in, jnp.int32)
    conv_rb = conv_rb.at[flat_c].set(src_row)[
        :kvol * capacity].reshape(kvol, capacity)

    # deconv rulebook: didx[k, in_row] = out row (or capacity when the
    # offset k does not land this input on an output site).
    flat_d = jnp.where(ok, koff * v_in + src_row, kvol * v_in)
    deconv_rb = jnp.full((kvol * v_in + 1,), capacity, jnp.int32)
    deconv_rb = deconv_rb.at[flat_d].set(row_map.astype(jnp.int32))[
        :kvol * v_in].reshape(kvol, v_in)
    return out_table, conv_rb, deconv_rb


@functools.partial(jax.jit, static_argnames=("kernel", "stride"))
def conv_rulebook(out_table: SparseTensor, in_table: SparseTensor,
                  kernel, stride):
    """Gather indices for a strided conv: for each output site o and kernel
    offset k, find input site o*stride + k. Returns (K, V_out) indices into
    the input table (V_in = missing).

    With an xy-column grid on the input table and kernel depth kz = 2,
    the two z offsets of each (kx, ky) column come from ONE lower-bound
    search (rows within a column are z-sorted and contiguous)."""
    st = jnp.array([stride[0], stride[1], stride[2], 1], jnp.int32)
    base = out_table.coords * st
    v_in = in_table.capacity

    if (in_table.xy_grid is not None and in_table.dense_grid is None
            and kernel[2] == 2):
        Z = in_table.spatial_size[2]
        lo, hi = in_table.lo, in_table.hi
        rv = out_table.row_valid
        cols = []
        for kx in range(kernel[0]):
            for ky in range(kernel[1]):
                delta = jnp.array([kx, ky, 0, 0], jnp.int32)
                pos, inb, cs, cl, qhi, qlo = in_table.column_lower_bound(
                    base + delta, valid=rv)
                col_ok = inb & (cl > 0)
                p0 = jnp.clip(pos, 0, v_in - 1)
                f0 = col_ok & (pos < cs + cl) & (lo[p0] == qlo) & \
                    (hi[p0] == qhi)
                p1_raw = pos + f0.astype(pos.dtype)
                p1 = jnp.clip(p1_raw, 0, v_in - 1)
                zq = base[:, 2]
                f1 = col_ok & (p1_raw < cs + cl) & (zq + 1 < Z) & \
                    (lo[p1] == qlo + 1) & (hi[p1] == qhi)
                cols.append(jnp.where(f0, p0, v_in))
                cols.append(jnp.where(f1, p1, v_in))
        return jnp.stack(cols)

    deltas = jnp.array(
        [[kx, ky, kz, 0] for kx in range(kernel[0])
         for ky in range(kernel[1]) for kz in range(kernel[2])], jnp.int32)
    q = base[None, :, :] + deltas[:, None, :]                # (K, V, 4)
    idx, found = in_table.lookup(q, valid=out_table.row_valid[None, :])
    return jnp.where(found, idx, v_in)
