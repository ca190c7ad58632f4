"""Pallas TPU kernel: windowed sorted-key match (rulebook construction).

Replaces the per-query binary searches of submanifold rulebook building
(ops/sparse.neighbor_indices / the xy-column searches) on large scales.
The reference builds rulebooks with CPU hash maps
(/root/reference/SparseConvNet/sparseconvnet/SCN/Metadata/
SubmanifoldConvolutionRules.h:26-57); our XLA path replaced them with
vectorized searches — but at the reference-scale bench those searches
are 27 offsets x 524k sites x ~9 probe steps of RANDOM key gathers, and
dominate the whole pipeline (~1.5 s of a 2.1 s forward).

Same structural fact as the conv kernel: table keys are sorted, and the
query keys for a FIXED kernel offset are the site keys plus a constant
(hi += dx, lo += dy*Z + dz) — i.e. sorted too. So all matches for a
block of B sites live in one contiguous key window:

  per (block, xy-offset group g of the 3x3x3 kernel):
    1. one streaming DMA of the (hi, lo) key window -> VMEM;
    2. vectorized equality sweep: (B, 128) compares per window sublane
       row, sharing the hi-compare across the dz = -1/0/+1 triplet
       (z-adjacent rows share the query's hi and differ by 1 in lo);
    3. match position extracted with a masked min over lane iota
       (pure VPU — no MXU needed).

Window starts/pass counts come from a COARSE lower bound in XLA: one
search per (offset-group, block) — nb searches instead of V (512x
fewer) — via `match_plan`. Blocks whose key span exceeds one window run
extra serialized passes (exact for any span, like the conv kernel).

Out-of-grid wraps (x/y/z +-1 crossing a boundary alias a numerically
equal key of a different voxel) are masked OUTSIDE the kernel from the
site coords — the kernel reports raw key matches.

Output layout is (V, 32) lanes (offset k in lane k) to keep every
per-offset result a static lane column; callers transpose to the
(27, V) rulebook form once in XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from detection_3d_tpu.ops.coords import INVALID, lex_searchsorted, pack_key

BLOCK = 512
WINDOW = 2048          # rows per pass; usable span = WINDOW - ALIGN
                       # (tools/tune_match.py: 2048 beats 3072 at every
                       # bench scale; sweep cost per site ~ window)
_ALIGN = 1024          # start alignment: 8 sublanes x 128 lanes (int32)
_LANES = 128
_BIG = 2 ** 30


def match_plan(hi, lo, d_hi, d_lo, v_in: int, block: int = BLOCK,
               window: int = WINDOW):
    """Window starts + pass counts for the sorted match, in XLA.

    Args:
      hi/lo: (V,) sorted table keys (V % block == 0, pad rows INVALID);
      d_hi/d_lo: (G,) int32 per-offset-group key deltas (queries of
        group g = site keys + (d_hi[g], d_lo[g]); the dz triplet shares
        a group with d_lo = center, matched at lo-1/lo/lo+1);
    Returns:
      starts: (G, nb) int32 row starts, _ALIGN-aligned;
      passes: (G, nb) int32 >= 1.
    """
    v = hi.shape[0]
    nb = v // block
    first_hi = hi[::block]                       # (nb,)
    first_lo = lo[::block]
    qhi = first_hi[None, :] + d_hi[:, None]      # (G, nb)
    qlo = first_lo[None, :] + d_lo[:, None] - 1  # cover the dz=-1 key
    pos, _ = lex_searchsorted(hi, lo, qhi, qlo)
    starts = (pos & ~(_ALIGN - 1)).astype(jnp.int32)
    ends = jnp.concatenate(
        [pos[:, 1:], jnp.full((pos.shape[0], 1), v_in, pos.dtype)],
        axis=1) + 2                              # +2: dz=+1 boundary rows
    span = jnp.maximum(ends - starts, 1)
    passes = ((span + window - 1) // window).astype(jnp.int32)
    return starts, passes


def _kernel(starts_ref, passes_ref, hi128, lo128, hir_ref, lor_ref,
            out_ref, winh, winl, sems, *, n_grp, block, window, vrows,
            d_hi, d_lo):
    j = pl.program_id(0)
    wg = window // _LANES

    def copy(g, p, slot):
        s = pl.multiple_of(
            (starts_ref[g, j] + p * window) // _LANES, 8)
        s = jnp.minimum(s, vrows - wg)
        return (pltpu.make_async_copy(hi128.at[pl.ds(s, wg), :],
                                      winh.at[slot], sems.at[2 * slot]),
                pltpu.make_async_copy(lo128.at[pl.ds(s, wg), :],
                                      winl.at[slot], sems.at[2 * slot + 1]))

    for g in range(n_grp):
        for c in copy(g, 0, g):
            c.start()

    # (1, block) row -> (block, 1) column: one in-kernel relayout per
    # block (a (V, 1) column INPUT would force a T(1,128) layout whose
    # per-block prologue slices cost more than the whole kernel)
    qhi0 = hir_ref[0, 0, :].reshape(block, 1)
    qlo0 = lor_ref[0, 0, :].reshape(block, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    for g in range(n_grp):
        for c in copy(g, 0, g):
            c.wait()
        qhi = qhi0 + d_hi[g]
        qlo3 = [qlo0 + d_lo[g] + (t - 1) for t in range(3)]
        # running elementwise (block, 128) mins — the cross-lane
        # reduction happens ONCE per group at the end (per-step lane
        # reduces were 20x the cost of the compares)
        best = [jnp.full((block, _LANES), _BIG, jnp.int32)
                for _ in range(3)]

        def sweep(slot, base_rows, best):
            def srow(s, bst):
                hrow = winh[slot, pl.ds(s, 1), :]   # (1, 128)
                lrow = winl[slot, pl.ds(s, 1), :]
                mh = hrow == qhi                    # (block, 128)
                pos = lane + (base_rows + s * _LANES)
                out = []
                for t in range(3):                  # dz = -1, 0, +1
                    m = mh & (lrow == qlo3[t])
                    out.append(jnp.minimum(
                        bst[t], jnp.where(m, pos, _BIG)))
                return tuple(out)
            return list(jax.lax.fori_loop(0, wg, srow, tuple(best)))

        start_g = starts_ref[g, j]
        s0 = jnp.minimum(start_g // _LANES, vrows - wg) * _LANES
        best = sweep(g, s0, best)

        def extra(p, best):
            for c in copy(g, p, n_grp):
                c.start()
            for c in copy(g, p, n_grp):
                c.wait()
            sp = jnp.minimum((start_g + p * window) // _LANES,
                             vrows - wg) * _LANES
            return tuple(sweep(n_grp, sp, best))

        best = list(jax.lax.fori_loop(1, passes_ref[g, j], extra,
                                      tuple(best)))
        for t in range(3):
            out_ref[:, 3 * g + t:3 * g + t + 1] = jnp.min(
                best[t], axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("d_hi", "d_lo", "block",
                                             "window", "interpret"))
def _match_call(hi, lo, starts, passes, d_hi, d_lo,
                block: int, window: int, interpret: bool = False):
    v = hi.shape[0]
    n_grp = len(d_hi)
    nb = v // block
    hi128 = hi.reshape(v // _LANES, _LANES)
    lo128 = lo.reshape(v // _LANES, _LANES)
    hi3d = hi.reshape(nb, 1, block)
    lo3d = lo.reshape(nb, 1, block)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # hi windows
            pl.BlockSpec(memory_space=pltpu.ANY),          # lo windows
            pl.BlockSpec((1, 1, block), lambda j, s, p: (j, 0, 0),
                         memory_space=pltpu.VMEM),          # query hi row
            pl.BlockSpec((1, 1, block), lambda j, s, p: (j, 0, 0),
                         memory_space=pltpu.VMEM),          # query lo row
        ],
        out_specs=pl.BlockSpec((block, 32), lambda j, s, p: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_grp + 1, window // _LANES, _LANES), jnp.int32),
            pltpu.VMEM((n_grp + 1, window // _LANES, _LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * (n_grp + 1),)),
        ],
    )
    kern = functools.partial(_kernel, n_grp=n_grp, block=block,
                             window=window, vrows=v // _LANES,
                             d_hi=d_hi, d_lo=d_lo)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((v, 32), jnp.int32),
    )(starts, passes, hi128, lo128, hi3d, lo3d)


def neighbor_match_3x3x3(table, interpret: bool = False,
                         block: int = None, window: int = None):
    """(27, V) submanifold rulebook via the windowed match kernel.

    Drop-in producer for ops/sparse.neighbor_indices(table, 3x3x3
    offsets): idx[k, i] = row of the neighbor of site i at offset k, or
    V when absent/out-of-grid. Caller gates on backend/size.
    ``block``/``window`` override the sweep tile (tools/tune_match.py
    picks them; every site compares against the whole window, so sweep
    cost per site ~ window — smaller blocks keep the window tight but
    the _ALIGN alignment slack floors it).
    """
    X, Y, Z = table.spatial_size
    v = table.capacity
    hi, lo = table.hi, table.lo
    # Match only HALF the offset neighborhood: neighbor(i, o) = j  <=>
    # neighbor(j, -o) = i, so the 4 xy-groups with (dx > 0) or
    # (dx == 0, dy > 0) come from a SCATTER INVERSION of their mirror
    # group instead of their own window sweep — and the CENTER xy-group
    # needs no sweep at all: (0,0,0) is the identity and the (0,0,-1)
    # neighbor's key is lo-1 at the SAME hi, i.e. exactly the preceding
    # row of the sorted table when present. 4 sweeps instead of 9.
    matched_xy = ((-1, -1), (-1, 0), (-1, 1), (0, -1))
    d_hi = tuple(dx for dx, dy in matched_xy)
    d_lo = tuple(dy * Z for dx, dy in matched_xy)
    block = block or BLOCK
    window = min(window or WINDOW, v)
    starts, passes = match_plan(
        hi, lo, jnp.array(d_hi, jnp.int32), jnp.array(d_lo, jnp.int32), v,
        block=block, window=window)
    pos32 = _match_call(hi, lo, starts, passes, d_hi, d_lo,
                        block, window, interpret)

    # mask wraps + missing + invalid rows in XLA from the coords
    x = table.coords[:, 0]
    y = table.coords[:, 1]
    z = table.coords[:, 2]
    rv = table.row_valid
    rows = jnp.arange(v, dtype=jnp.int32)
    out = {}
    # center group by sorted-row adjacency (no sweep): prev row holds
    # (hi, lo-1) iff keys are consecutive within the same z-column
    prev_adj = jnp.concatenate([
        jnp.zeros((1,), bool),
        (hi[1:] == hi[:-1]) & (lo[1:] == lo[:-1] + 1)])
    center_pos = {
        0: jnp.where(prev_adj, rows - 1, v),            # dz = -1
        1: rows,                                        # dz = 0 (self)
    }
    for g, (dx, dy) in enumerate(matched_xy + ((0, 0),)):
        for t, dz in enumerate((-1, 0, 1)):
            if (dx, dy) == (0, 0):
                if dz == 1:
                    continue      # produced by inversion of (0,0,-1)
                pos = center_pos[t]
            else:
                pos = pos32[:, 3 * g + t]
            inb = ((x + dx >= 0) & (x + dx < X) & (y + dy >= 0)
                   & (y + dy < Y) & (z + dz >= 0) & (z + dz < Z) & rv)
            found = inb & (pos < v)
            idx = jnp.where(found, jnp.minimum(pos, v - 1), v)
            out[(dx, dy, dz)] = idx.astype(jnp.int32)
            if (dx, dy, dz) != (0, 0, 0):
                # inverse offset by scatter: idx[i] = j -> inv[j] = i
                inv = jnp.full((v + 1,), v, jnp.int32)
                inv = inv.at[idx].set(rows, mode="drop")[:v]
                out[(-dx, -dy, -dz)] = inv
    ks = [(dx, dy, dz) for dx in (-1, 0, 1) for dy in (-1, 0, 1)
          for dz in (-1, 0, 1)]
    return jnp.stack([out[k] for k in ks])


def match_supported(table) -> bool:
    v = table.capacity
    return (jax.default_backend() == "tpu" and v >= _ALIGN
            and v % _ALIGN == 0)


# ---------------------------------------------------------------------------
# Generic K-offset variant: explicit (sorted-per-offset) query keys —
# serves strided-conv and deconv rulebooks (queries live on a DIFFERENT
# grid than the searched table, so they can't be derived by a constant
# key shift like the submanifold case).
# ---------------------------------------------------------------------------


def multi_match_plan(qhi, qlo, qvalid, hi, lo, block: int = BLOCK,
                     window: int = WINDOW):
    """Starts/passes from per-block first/last VALID queries.

    Queries within a block are sorted (ascending per offset), so the
    block's key range is [first valid, last valid] — invalid rows
    (out-of-grid / inexact strides) carry INVALID keys and must not
    widen the window.
    """
    g, v = qhi.shape
    nb = v // block
    qv = qvalid.reshape(g, nb, block)
    fi = jnp.argmax(qv, axis=2).astype(jnp.int32)
    li = (block - 1 - jnp.argmax(qv[:, :, ::-1], axis=2)).astype(jnp.int32)

    def take(a, i):
        return jnp.take_along_axis(a.reshape(g, nb, block), i[..., None],
                                   axis=2)[..., 0]

    pos_lo, _ = lex_searchsorted(hi, lo, take(qhi, fi), take(qlo, fi))
    pos_hi, _ = lex_searchsorted(hi, lo, take(qhi, li), take(qlo, li))
    starts = (pos_lo & ~(_ALIGN - 1)).astype(jnp.int32)
    any_v = qv.any(axis=2)
    span = jnp.where(any_v, pos_hi + 1 - starts, 1)
    passes = jnp.maximum((span + window - 1) // window, 1).astype(jnp.int32)
    return starts, passes


def _kernel_multi(starts_ref, passes_ref, hi128, lo128, q_ref,
                  out_ref, winh, winl, sems, *, n_grp, block, window,
                  vrows):
    j = pl.program_id(0)
    wg = window // _LANES

    def copy(g, p, slot):
        s = pl.multiple_of(
            (starts_ref[g, j] + p * window) // _LANES, 8)
        s = jnp.minimum(s, vrows - wg)
        return (pltpu.make_async_copy(hi128.at[pl.ds(s, wg), :],
                                      winh.at[slot], sems.at[2 * slot]),
                pltpu.make_async_copy(lo128.at[pl.ds(s, wg), :],
                                      winl.at[slot], sems.at[2 * slot + 1]))

    for g in range(n_grp):
        for c in copy(g, 0, g):
            c.start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)

    for g in range(n_grp):
        for c in copy(g, 0, g):
            c.wait()
        qhi = q_ref[0, 2 * g, :].reshape(block, 1)
        qlo = q_ref[0, 2 * g + 1, :].reshape(block, 1)
        best = jnp.full((block, _LANES), _BIG, jnp.int32)

        def sweep(slot, base_rows, best):
            def srow(s, bst):
                hrow = winh[slot, pl.ds(s, 1), :]
                lrow = winl[slot, pl.ds(s, 1), :]
                m = (hrow == qhi) & (lrow == qlo)
                pos = lane + (base_rows + s * _LANES)
                return jnp.minimum(bst, jnp.where(m, pos, _BIG))
            return jax.lax.fori_loop(0, wg, srow, best)

        start_g = starts_ref[g, j]
        s0 = jnp.minimum(start_g // _LANES, vrows - wg) * _LANES
        best = sweep(g, s0, best)

        def extra(p, best):
            for c in copy(g, p, n_grp):
                c.start()
            for c in copy(g, p, n_grp):
                c.wait()
            sp = jnp.minimum((start_g + p * window) // _LANES,
                             vrows - wg) * _LANES
            return sweep(n_grp, sp, best)

        best = jax.lax.fori_loop(1, passes_ref[g, j], extra, best)
        out_ref[:, g:g + 1] = jnp.min(best, axis=1, keepdims=True)


@functools.partial(jax.jit, static_argnames=("block", "window",
                                             "interpret"))
def _multi_match_call(hi, lo, q_packed, starts, passes,
                      block: int, window: int, interpret: bool = False):
    """q_packed: (nb, 2*G, block) int32 — interleaved (qhi, qlo) rows."""
    v = hi.shape[0]
    nb, twog, _ = q_packed.shape
    n_grp = twog // 2
    hi128 = hi.reshape(v // _LANES, _LANES)
    lo128 = lo.reshape(v // _LANES, _LANES)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, twog, block), lambda j, s, p: (j, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block, 32), lambda j, s, p: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_grp + 1, window // _LANES, _LANES), jnp.int32),
            pltpu.VMEM((n_grp + 1, window // _LANES, _LANES), jnp.int32),
            pltpu.SemaphoreType.DMA((2 * (n_grp + 1),)),
        ],
    )
    kern = functools.partial(_kernel_multi, n_grp=n_grp, block=block,
                             window=window, vrows=v // _LANES)
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((nb * block, 32), jnp.int32),
    )(starts, passes, hi128, lo128, q_packed)


def sorted_multi_match(qhi, qlo, qvalid, table, interpret: bool = False):
    """(G, V_q) query keys (sorted per row where valid) -> (G, V_q)
    positions in the table; >= table.capacity where no match. Callers
    mask validity/collisions themselves (they know the query grids)."""
    g, vq = qhi.shape
    v = table.capacity
    pad = (-vq) % BLOCK
    inval = jnp.int32(-0x7FFFFFFF)
    qhi_p = jnp.pad(jnp.where(qvalid, qhi, inval), ((0, 0), (0, pad)),
                    constant_values=inval)
    qlo_p = jnp.pad(jnp.where(qvalid, qlo, inval), ((0, 0), (0, pad)),
                    constant_values=inval)
    qv_p = jnp.pad(qvalid, ((0, 0), (0, pad)))
    window = min(WINDOW, v)        # small tables: one whole-table window
    starts, passes = multi_match_plan(qhi_p, qlo_p, qv_p, table.hi,
                                      table.lo, BLOCK, window)
    nb = qhi_p.shape[1] // BLOCK
    q = jnp.stack([qhi_p.reshape(g, nb, BLOCK),
                   qlo_p.reshape(g, nb, BLOCK)], axis=1)   # (g, 2, nb, B)
    q_packed = q.transpose(2, 0, 1, 3).reshape(nb, 2 * g, BLOCK)
    pos32 = _multi_match_call(table.hi, table.lo, q_packed, starts,
                              passes, BLOCK, window, interpret)
    pos = pos32[:, :g].T[:, :vq]
    return jnp.where(qvalid & (pos < v), pos, v).astype(jnp.int32)


def conv_rulebook_match(out_table, in_table, kernel, stride,
                        interpret: bool = False):
    """Strided-conv rulebook via the sorted-match kernel (parity with
    ops/sparse.conv_rulebook, same (K, V_out) contract)."""
    st = jnp.array([stride[0], stride[1], stride[2], 1], jnp.int32)
    base = out_table.coords * st
    rv = out_table.row_valid
    deltas = jnp.array(
        [[kx, ky, kz, 0] for kx in range(kernel[0])
         for ky in range(kernel[1]) for kz in range(kernel[2])], jnp.int32)
    q = base[None, :, :] + deltas[:, None, :]
    qhi, qlo = pack_key(q, in_table.spatial_size, valid=rv[None, :])
    return sorted_multi_match(qhi, qlo, qhi != INVALID, in_table,
                              interpret)


def deconv_rulebook_match(fine_table, coarse_table, kernel, stride,
                          interpret: bool = False):
    """Deconv rulebook via the sorted-match kernel (parity with
    ops/sparse_conv.deconv_rulebook)."""
    st = jnp.array([stride[0], stride[1], stride[2], 1], jnp.int32)
    fx = fine_table.coords
    deltas = jnp.array(
        [[kx, ky, kz, 0] for kx in range(kernel[0])
         for ky in range(kernel[1]) for kz in range(kernel[2])], jnp.int32)
    num = fx[None, :, :] - deltas[:, None, :]
    o = num // st
    exact = jnp.all(o * st == num, axis=-1)
    qhi, qlo = pack_key(o, coarse_table.spatial_size,
                        valid=fine_table.row_valid[None, :] & exact)
    return sorted_multi_match(qhi, qlo, qhi != INVALID, coarse_table,
                              interpret)
