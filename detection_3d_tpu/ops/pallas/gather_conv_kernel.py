"""Pallas TPU kernel: windowed monotonic-gather sparse convolution.

TPU-native replacement for the XLA gather-GEMM path
(ops/sparse_conv.gather_conv) on large scales. The reference implements
this op as scattered CUDA gathers
(/root/reference/SparseConvNet/sparseconvnet/SCN/CUDA/Convolution.cu:57-130);
random row gathers are the one access pattern TPUs are bad at — each
64-byte feature row costs a full HBM transaction, and the XLA lowering of
``src[idx]`` runs ~100x off speed-of-light at 500k voxels.

The kernel exploits a structural property of OUR rulebooks that the
reference's hash-table metadata does not have: voxel-table rows are
key-sorted (ops/sparse.build_sparse_tensor), so for a FIXED kernel offset
the neighbor row index is monotonically non-decreasing in the output row.
All neighbors of a contiguous block of B output rows therefore live in ONE
contiguous input window, and the gather becomes, per (block j, offset k):

  1. one streaming DMA of input rows [start[k,j], start[k,j]+W) -> VMEM
     (contiguous HBM traffic instead of B random row transactions);
  2. one-hot (B, W) @ (W, Cin) MXU matmuls that perform the local gather
     (one-hot matmul is the canonical TPU in-VMEM gather);
  3. acc += gathered @ W_k on the MXU.

Mosaic DMAs need a 128-lane-aligned minor dim, so for Cin < 128 the
feature array is viewed as (V/g, g*Cin) with g = 128/Cin (a free
row-major regroup); window starts are rounded down to a 16-sublane
grouped boundary, the one-hot matmul gathers the whole 128-lane grouped
row (all g candidate sub-rows at once), and a full-width VPU band mask +
a g-times-stacked weight matrix resolve the sub-row — narrow (B, Cin)
selects and K=Cin matmuls were the kernel's dominant cost before this.

All n_off pass-0 window DMAs are issued up front (one slot each) so
per-DMA latency amortizes across in-flight copies. Window starts are
computed in XLA (`window_starts`) and scalar-prefetched so the DMA
addresses are known before the kernel body runs.

Exactness for any span: real scenes have density discontinuities, so a
block's neighbor span can exceed one window (p99 tails of 2-10x). Such
blocks run extra serialized passes over later windows (pass p owns
local offsets [p*W, (p+1)*W)); `window_starts` returns the per-block
pass counts. The kernel is exact by construction — no probabilistic
drop, no whole-layer fallback.

Gradients: `windowed_gather_conv` carries a custom VJP whose backward
follows the XLA gather path (same math, used only in training where the
step cost is dominated elsewhere); the forward kernel serves the
inference/proposal path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
# one uniform tile: rulebooks become channel-width-independent and can
# be PRECOMPUTED once per scale and shared by every conv at that scale
# (recomputing + re-laying-out the (K, V) offset arrays per conv was 2x
# the kernel's own cost). Start alignment is 256 rows = 16 sublanes x the
# largest group (16), so one rulebook serves any channel width.
BLOCK = 512
WINDOW = 1024
_ALIGN = 256
_WIN_VMEM_BUDGET = 8 * 2 ** 20


def window_starts(idx, v_in: int, block: int = BLOCK,
                  window: int = WINDOW, align: int = _ALIGN):
    """Per-(offset, block) window starts + span high-water, in XLA.

    Args:
      idx: (K, V_out) neighbor rows; missing neighbors == v_in (the pad
        row convention of ops/sparse_conv._padded). V_out % block == 0.
      v_in: number of input rows (pad row excluded).
      window: MAXIMUM window any conv will run over these starts (starts
        are clipped so a slice of this size stays in bounds; a conv may
        then use any window <= this).
      align: start alignment; must be >= 16 sublanes x the largest
        grouped-row factor of any conv sharing the rulebook.
    Returns:
      starts: (K, nb) int32 window start ROWS, `align`-aligned, clipped
        to [0, v_in - window];
      local: (K, V_out) int32 idx - start_rows (per block); < 0 for
        missing neighbors (the kernel's one-hot range check masks them
        for free), may exceed the conv's window — served by extra passes;
      hi: (K, nb) int32 max local index per block (-1 if all missing) —
        a conv with window w runs ceil((hi+1)/w) passes.
    """
    k, v_out = idx.shape
    nb = v_out // block
    idxb = idx.reshape(k, nb, block)
    real = idxb < v_in
    starts = jnp.min(jnp.where(real, idxb, v_in), axis=2)
    starts = jnp.clip(starts, 0, max(v_in - window, 0))
    starts = (starts & ~(align - 1)).astype(jnp.int32)
    local = idxb - starts[:, :, None]
    hi = jnp.max(jnp.where(real, local, -1), axis=2).astype(jnp.int32)
    return starts, local.reshape(k, v_out), hi


def windowed_rulebook(neighbor_idx, out_valid, v_in: int,
                      block: int = BLOCK, align: int = _ALIGN):
    """Precomputable fast-conv metadata shared by all convs over one
    rulebook (one per scale per kernel shape). Pads V_out to a `block`
    multiple and masks invalid output rows to the pad row (their coords
    are padding — arbitrary lookup results would blow up window spans).

    Window size is NOT baked in: `hi` records each block's span
    high-water, so every conv sharing the rulebook picks its own window
    (pass count = ceil((hi+1)/window)) — narrow-channel convs want small
    windows (the one-hot gather matmul costs window x Cin per row).
    """
    n_off, v_out = neighbor_idx.shape
    idx = jnp.where(out_valid[None, :], neighbor_idx, v_in)
    pad = (-v_out) % block
    idx = jnp.pad(idx, ((0, 0), (0, pad)), constant_values=v_in)
    starts, local, hi = window_starts(idx, v_in, block=block,
                                      window=WINDOW, align=align)
    # block is recoverable from shapes (local.shape[1] // starts.shape[1])
    # so the dict stays a pure array pytree (jit/vjp-safe); align is the
    # caller's contract (>= 16 x the largest group of any sharing conv)
    return {"idx": neighbor_idx, "starts": starts, "local": local,
            "hi": hi}


def _kernel(starts_ref, passes_ref, feats_hbm, off_ref, w_ref, out_ref,
            win, acc, sems, *, n_off, block, window, cin, group, vg):
    j = pl.program_id(0)
    wg = window // group

    def copy(k, slot):
        # starts are 256-aligned ROW indices: /group stays a multiple of
        # 16 sublanes for any group factor <= 16
        s = pl.multiple_of(starts_ref[k, j] // group, 16)
        return pltpu.make_async_copy(
            feats_hbm.at[pl.ds(s, wg), :],
            win.at[slot], sems.at[slot])

    # issue ALL pass-0 window DMAs up front (one slot per offset): the
    # per-DMA latency amortizes across n_off in-flight copies instead of
    # serializing — the loop is then bandwidth-, not latency-bound
    def issue(k, _):
        copy(k, k).start()
        return 0

    jax.lax.fori_loop(0, n_off, issue, 0)
    acc[:] = jnp.zeros_like(acc)

    def body(k, _):
        off = off_ref[k, :].reshape(block, 1)          # row offsets
        off_g = off // group
        iota = jax.lax.broadcasted_iota(jnp.int32, (block, wg), 1)
        if group > 1:
            off_r = off - off_g * group
            lane_band = jax.lax.broadcasted_iota(
                jnp.int32, (block, group * cin), 1) // cin

        def contrib(window_vals, sdelta, lo_bound):
            # one full-lane-width MXU matmul gathers the whole grouped
            # row (all `group` candidate sub-rows at once) ...
            hit = (iota == off_g - sdelta) & (off >= lo_bound) \
                & (off < lo_bound + window)
            onehot = hit.astype(win.dtype)
            g_all = jnp.dot(onehot, window_vals,
                            preferred_element_type=jnp.float32)
            if group == 1:
                sel = g_all
            else:
                # ... then a full-width VPU mask zeroes the sub-rows the
                # site did NOT want. w_ref[k] is W_k stacked `group`
                # times along Cin, so sel @ w_ref[k] ==
                # selected_sub_row @ W_k — every op stays 128 lanes wide
                # (narrow (B, Cin) selects and K=Cin matmuls were the
                # kernel's dominant cost).
                sel = jnp.where(lane_band == off_r, g_all, 0.0)
            acc[:] += jnp.dot(sel.astype(win.dtype), w_ref[k],
                              preferred_element_type=jnp.float32)

        copy(k, k).wait()
        contrib(win[k], 0, 0)

        # extra passes for blocks whose neighbor span exceeds one window
        # (density discontinuities in real scenes): serialized DMAs into
        # the spare slot — rare by construction, exact by partition
        # (pass p owns offsets in [p*window, (p+1)*window))
        def extra(p, _):
            start = starts_ref[k, j] // group
            s_p = jnp.minimum(start + p * wg, vg - wg)
            s_p = pl.multiple_of(s_p, 16)
            cp = pltpu.make_async_copy(
                feats_hbm.at[pl.ds(s_p, wg), :],
                win.at[n_off], sems.at[n_off])
            cp.start()
            cp.wait()
            contrib(win[n_off], s_p - start, p * window)
            return 0

        jax.lax.fori_loop(1, passes_ref[k, j], extra, 0)
        return 0

    jax.lax.fori_loop(0, n_off, body, 0)
    out_ref[:] = acc[:].astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block", "window", "group",
                                             "interpret"))
def _windowed_conv_call(feats_g, starts, passes, local, weights,
                        block: int, window: int, group: int,
                        interpret: bool = False):
    vg, cg = feats_g.shape
    cin = cg // group
    n_off, v_out = local.shape
    cout = weights.shape[-1]
    nb = v_out // block
    # W_k stacked `group` times along Cin: the kernel's band-masked
    # gathered rows contract against it at full 128-lane width
    w_cast = jnp.concatenate([weights.astype(feats_g.dtype)] * group,
                             axis=1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),          # feats in HBM
            pl.BlockSpec((n_off, block), lambda j, s, p: (0, j),
                         memory_space=pltpu.VMEM),          # local offsets
            pl.BlockSpec(memory_space=pltpu.VMEM),          # weights
        ],
        out_specs=pl.BlockSpec((block, cout), lambda j, s, p: (j, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((n_off + 1, window // group, cg), feats_g.dtype),
            pltpu.VMEM((block, cout), jnp.float32),
            pltpu.SemaphoreType.DMA((n_off + 1,)),
        ],
    )
    kern = functools.partial(_kernel, n_off=n_off, block=block,
                             window=window, cin=cin, group=group, vg=vg)
    flops = 2 * nb * n_off * block * window * cin \
        + 2 * v_out * n_off * cin * cout
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        interpret=interpret,
        out_shape=jax.ShapeDtypeStruct((v_out, cout), feats_g.dtype),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=nb * n_off * window * cin
            * feats_g.dtype.itemsize,
            transcendentals=0),
    )(starts, passes, feats_g, local, w_cast)


def _group_of(cin: int) -> int:
    return max(_LANES // cin, 1) if _LANES % cin == 0 else 1


def _pad_cin(cin: int) -> int:
    """Smallest channel count >= cin that tiles the 128-lane dim."""
    c = 8
    while c < cin:
        c *= 2
    return c


@jax.custom_vjp
def _windowed_gather_conv(feats, rb, weights, out_valid):
    return _windowed_fwd_impl(feats, rb, weights, out_valid)


def _window_for(cin: int) -> int:
    """Per-channel-width window: the one-hot gather matmul costs
    window x Cin per output row vs Cin x Cout of useful GEMM, so
    narrow-channel convs want the smallest window whose pass tail stays
    short. Values from tools/tune_conv.py sweeps on real bench tables."""
    return _WINDOW_BY_CIN.get(cin, WINDOW)


_WINDOW_BY_CIN = {}


def _windowed_fwd_impl(feats, rb, weights, out_valid, interpret=False):
    v_in, cin = feats.shape
    group = _group_of(cin)
    v_out = rb["idx"].shape[1]
    block = rb["local"].shape[1] // rb["starts"].shape[1]
    window = min(_window_for(cin), WINDOW)
    if "hi" in rb:
        passes = jnp.maximum(rb["hi"] // window + 1, 1)
    else:  # pre-`hi` rulebook layout: window is baked into the passes
        passes, window = rb["passes"], WINDOW
    feats_g = feats.reshape(v_in // group, group * cin)
    out = _windowed_conv_call(feats_g, rb["starts"], passes,
                              rb["local"], weights, block, window, group,
                              interpret)[:v_out]
    return jnp.where(out_valid[:, None], out, 0.0).astype(feats.dtype)


def _windowed_fwd(feats, rb, weights, out_valid):
    out = _windowed_fwd_impl(feats, rb, weights, out_valid)
    return out, (feats, rb, weights, out_valid)


def _windowed_bwd(res, g):
    from detection_3d_tpu.ops.sparse_conv import gather_conv
    feats, rb, weights, out_valid = res
    _, vjp = jax.vjp(
        lambda f, w: gather_conv(f, rb["idx"], w, out_valid), feats,
        weights)
    d_feats, d_w = vjp(g)
    return d_feats, jax.tree.map(lambda _: None, rb), d_w, None


_windowed_gather_conv.defvjp(_windowed_fwd, _windowed_bwd)


def supported(feats, n_off: int):
    """Can the Pallas path serve this (feats, rulebook) combination?"""
    v_in, cin = feats.shape
    cin_p = _pad_cin(cin)
    vmem = (n_off + 1) * WINDOW * cin_p * feats.dtype.itemsize
    return (jax.default_backend() == "tpu"
            and v_in >= WINDOW
            and v_in % _group_of(cin_p) == 0
            and vmem <= _WIN_VMEM_BUDGET)


def windowed_gather_conv(feats, rulebook, weights, out_valid,
                         interpret: bool = False):
    """Drop-in for ops/sparse_conv.gather_conv on TPU backends.

    ``rulebook`` is either a dict from `windowed_rulebook` (precomputed
    once per scale — the (K, V) offset arrays are large, and rebuilding
    + re-laying them out per conv costs more than the conv) or a plain
    (K, V_out) neighbor-index array, in which case the rulebook is built
    inline. Channel counts that don't tile the 128-lane dim (e.g. the
    9-channel input layer) are zero-padded up to one that does. Falls
    back to the XLA gather path when the shape doesn't qualify (tiny
    tables, VMEM-oversized widths, non-TPU backend).
    """
    from detection_3d_tpu.ops.sparse_conv import gather_conv

    v_in, cin = feats.shape
    is_dict = isinstance(rulebook, dict)
    idx = rulebook["idx"] if is_dict else rulebook
    if not interpret and not supported(feats, idx.shape[0]):
        return gather_conv(feats, idx, weights, out_valid)
    if not is_dict or "starts" not in rulebook:
        rulebook = windowed_rulebook(idx, out_valid, v_in)
    cin_p = _pad_cin(cin)
    if cin_p != cin:
        feats = jnp.pad(feats, ((0, 0), (0, cin_p - cin)))
        weights = jnp.pad(weights, ((0, 0), (0, cin_p - cin), (0, 0)))
    if interpret:
        return _windowed_fwd_impl(feats, rulebook, weights, out_valid,
                                  interpret=True)
    return _windowed_gather_conv(feats, rulebook, weights, out_valid)


def windowed_gather_conv_interpret(feats, neighbor_idx, weights, out_valid,
                                   block=None, window=None):
    """Interpret-mode forward (CPU test path; no backend gate / VJP)."""
    return windowed_gather_conv(feats, neighbor_idx, weights, out_valid,
                                interpret=True)
