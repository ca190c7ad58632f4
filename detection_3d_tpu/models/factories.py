"""Generic sparse network factories: UNet / VGG builders + dropout.

TPU re-design of SCN's network-architecture factories
(/root/reference/SparseConvNet/sparseconvnet/networkArchitectures.py:
SparseVggNet:9, UNet:203, FullyConvolutionalNet:259) and Dropout
(sparseconvnet/dropout.py). The detector itself uses the specialised
SparseFPN (models/backbone.py, fpn_net.py parity); these factories give
framework users the same generic building blocks the reference library
ships, expressed over this repo's sorted-table sparse ops:

  * planning (tables + rulebooks for every level) is SEPARATE from the
    network: :func:`plan_levels` runs once per forward (or is reused
    across networks of the same geometry), modules consume the plan —
    the SCN Metadata/"rulebook cache" split, but functional;
  * all convs are bias-free gather-GEMM-scatter on the MXU; BN+LeakyReLU
    supplies shift/nonlinearity (SCN BatchNormReLU);
  * UNet joins are concats (SCN JoinTable) on static-capacity tables.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from detection_3d_tpu.models.backbone import (
    BNLeakyReLU, DownLayer, ResidualBlock, SubmConv, UpLayer,
)
from detection_3d_tpu.ops.sparse import (
    SparseTensor, downsample_with_rulebooks, neighbor_indices,
    submanifold_offsets,
)
from detection_3d_tpu.ops.sparse_pool import max_pool


def plan_levels(table0: SparseTensor, caps: Sequence[int],
                kernel: Tuple[int, int, int] = (2, 2, 2),
                stride: Tuple[int, int, int] = (2, 2, 2),
                dense_grid_budget: int = 1 << 26) -> Dict[str, Any]:
    """Tables + rulebooks for ``len(caps)`` levels (level 0 = input).

    Returns {"tables", "subm_idx", "down_rb", "up_rb"}; ``up_rb[k]`` maps
    level k+1 back to level k (deconv/unpool). The strided rulebooks are
    scatter-derived (zero searches, ops/sparse.downsample_with_rulebooks);
    the 3^3 submanifold rulebooks use the dense-grid/binary-search
    lookup (the Pallas match kernel is a drop-in when on TPU — the
    specialised planner in models/backbone.build_pyramid uses it).
    """
    offsets = submanifold_offsets((3, 3, 3))
    tables = [table0.with_dense_grid(dense_grid_budget)]
    down_rb, up_rb = [], []
    for cap in caps[1:]:
        t, crb, drb = downsample_with_rulebooks(tables[-1], kernel,
                                                stride, cap)
        tables.append(t.with_dense_grid(dense_grid_budget))
        down_rb.append(crb)
        up_rb.append(drb)
    subm_idx = [neighbor_indices(t, offsets) for t in tables]
    return {"tables": tables, "subm_idx": subm_idx, "down_rb": down_rb,
            "up_rb": up_rb}


class SparseDropout(nn.Module):
    """Feature dropout on active rows (SCN sparseconvnet/dropout.py):
    inverted scaling, identity when ``deterministic``. Whole-channel
    variant (``per_channel=False``) drops entire rows — SCN's
    BatchwiseDropout analogue."""
    rate: float
    per_channel: bool = True

    @nn.compact
    def __call__(self, feats, valid, deterministic: bool = True):
        if deterministic or self.rate <= 0.0:
            return feats
        rng = self.make_rng("dropout")
        shape = feats.shape if self.per_channel else (feats.shape[0], 1)
        keep = jax.random.bernoulli(rng, 1.0 - self.rate, shape)
        out = feats * keep.astype(feats.dtype) / (1.0 - self.rate)
        return jnp.where(valid[:, None], out, feats)


class SparseUNet(nn.Module):
    """Recursive encoder/decoder with concat joins
    (networkArchitectures.py UNet:203-258): ``reps`` blocks per level,
    strided 2x down, deconv up, JoinTable concat, then ``reps`` blocks.

    __call__(plan) -> (V0, nplanes[0]) features on the level-0 table.
    """
    nplanes: Sequence[int]
    reps: int = 1
    residual: bool = False
    leakiness: float = 0.0

    def blocks(self, h, nidx, valid, features, tag):
        for r in range(self.reps):
            if self.residual:
                h = ResidualBlock(features, name=f"{tag}_res{r}")(
                    h, nidx, valid)
            else:
                h = BNLeakyReLU(self.leakiness, name=f"{tag}_bn{r}")(
                    h, valid)
                h = SubmConv(features, name=f"{tag}_conv{r}")(
                    h, nidx, valid)
        return h

    @nn.compact
    def __call__(self, plan: Dict[str, Any], feats=None,
                 deterministic: bool = True):
        tables = plan["tables"]
        n = len(self.nplanes)
        assert len(tables) >= n, "plan has fewer levels than nplanes"
        h = feats if feats is not None else tables[0].feats
        valids = [t.row_valid for t in tables]

        def level(k, h):
            h = self.blocks(h, plan["subm_idx"][k], valids[k],
                            self.nplanes[k], f"enc{k}")
            if k == n - 1:
                return h
            kv = plan["down_rb"][k].shape[0]
            d = DownLayer(self.nplanes[k + 1], kv, name=f"down{k}")(
                h, plan["down_rb"][k], valids[k], valids[k + 1])
            d = level(k + 1, d)
            u = UpLayer(self.nplanes[k], kv, name=f"up{k}")(
                d, plan["up_rb"][k], valids[k + 1], valids[k])
            h = jnp.concatenate([h, u], axis=-1)     # JoinTable
            h = self.blocks(h, plan["subm_idx"][k], valids[k],
                            self.nplanes[k], f"dec{k}")
            return h

        return level(0, h)


class SparseVGG(nn.Module):
    """Spec-driven sequential net (SparseVggNet,
    networkArchitectures.py:9-41). ``layers`` entries:

      ("C", c)          3^3 submanifold conv to c channels + BN-LReLU
      ("MP",)           3^3/stride-2 max pool to the next plan level
      ("C3/2", c)       strided 2x conv to c channels + BN-LReLU

    Pools and strided convs consume successive plan levels; the spec may
    not descend below the plan depth. Returns (feats, level).
    """
    layers: Sequence
    leakiness: float = 0.0

    @nn.compact
    def __call__(self, plan: Dict[str, Any], feats=None):
        tables = plan["tables"]
        h = feats if feats is not None else tables[0].feats
        lvl = 0
        for i, spec in enumerate(self.layers):
            op = spec[0] if isinstance(spec, (tuple, list)) else spec
            if op == "C":
                h = SubmConv(spec[1], name=f"l{i}_conv")(
                    h, plan["subm_idx"][lvl], tables[lvl].row_valid)
                h = BNLeakyReLU(self.leakiness, name=f"l{i}_bn")(
                    h, tables[lvl].row_valid)
            elif op == "MP":
                h = max_pool(h, plan["down_rb"][lvl],
                             tables[lvl + 1].row_valid)
                lvl += 1
            elif op == "C3/2":
                kv = plan["down_rb"][lvl].shape[0]
                h = DownLayer(spec[1], kv, name=f"l{i}_down")(
                    h, plan["down_rb"][lvl], tables[lvl].row_valid,
                    tables[lvl + 1].row_valid)
                lvl += 1
            else:
                raise ValueError(f"unknown VGG spec entry {spec!r}")
        return h, lvl


class FullyConvolutionalNet(nn.Module):
    """Encoder with all levels upsampled back to level 0 and concatenated
    (networkArchitectures.py FullyConvolutionalNet:259-297): like UNet
    but the decoder joins EVERY level's features at full resolution.
    Output channels = sum(nplanes)."""
    nplanes: Sequence[int]
    reps: int = 1
    leakiness: float = 0.0

    @nn.compact
    def __call__(self, plan: Dict[str, Any], feats=None):
        tables = plan["tables"]
        n = len(self.nplanes)
        valids = [t.row_valid for t in tables]
        h = feats if feats is not None else tables[0].feats
        outs = []
        for k in range(n):
            for r in range(self.reps):
                h = BNLeakyReLU(self.leakiness, name=f"enc{k}_bn{r}")(
                    h, valids[k])
                h = SubmConv(self.nplanes[k], name=f"enc{k}_conv{r}")(
                    h, plan["subm_idx"][k], valids[k])
            up = h
            for j in range(k - 1, -1, -1):   # chain deconvs back to lvl 0
                kv = plan["up_rb"][j].shape[0]
                # keep the origin level's width: output = sum(nplanes)
                up = UpLayer(self.nplanes[k], kv, name=f"up{k}_{j}")(
                    up, plan["up_rb"][j], valids[j + 1], valids[j])
            outs.append(up)
            if k < n - 1:
                kv = plan["down_rb"][k].shape[0]
                h = DownLayer(self.nplanes[k + 1], kv, name=f"down{k}")(
                    h, plan["down_rb"][k], valids[k], valids[k + 1])
        return jnp.concatenate(outs, axis=-1)
