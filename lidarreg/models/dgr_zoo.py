"""DGR inlier-network zoo: SimpleNet + PyramidNet families (TPU-native).

Rebuilds DGR/model/simpleunet.py:13-563 (SimpleNet / SimpleNetE / SimpleNet2
— plain sparse U-Nets without residual blocks) and DGR/model/pyramidnet.py:
15-193 (PyramidNet / PyramidNet6 — recursive pyramid modules with ELU),
completing the `load_model` registry the reference exposes at
DGR/model/__init__.py:12-38. The benchmark default remains models.fcgf.
ResUNetBN2C(dim=6); these are the documented alternates for the inlier
ConvNet experiment. IN/INBN norm variants are intentionally unported (the
benchmark never selects them — SURVEY.md row "FCGF network zoo").

All networks run over the shared sparse engine: per-level coordinate sets,
bucketized hash tables and kernel maps are computed once per forward and
shared by every conv at that level (sparse/conv.py discipline).
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..sparse.hashtable import build_table
from ..sparse.tensor import SparseTensor, downsample_coords, kernel_offsets
from .fcgf import BasicBlockBN, SparseBatchNorm, SparseConvLayer
from ..sparse.conv import (
    PrunedKernelMap,
    invert_kernel_map,
    kernel_map,
    kernel_map_down,
    prune_kernel_map,
)


def _sow_prune_overflow(mod: nn.Module, S: "LevelStructs") -> None:
    """Surface dropped pruned-map tail hits (silent conv accuracy loss)
    into the "diagnostics" collection — read with mutable=["diagnostics"]
    (solvers/dgr.py threads it into DGRResult.prune_overflow)."""
    if S._prune and not mod.is_initializing():
        mod.sow("diagnostics", "prune_tail_dropped", S.prune_overflow())


def _mk_table(coords, valid, capacity):
    size = 1
    while size < 4 * capacity:
        size *= 2
    table, _ = build_table(coords, valid, size)
    return table


class LevelStructs:
    """Per-level coords/valid/tables + lazily-built kernel maps."""

    def __init__(self, x: SparseTensor, n_levels: int, dim: int,
                 level_capacity_div: Sequence[int],
                 prune_offsets: int = 64, prune_tail_cap: int = 2048):
        self.dim = dim
        # 6-D nets: compact maps to their busiest offsets (exact tail; see
        # sparse/conv.py PrunedKernelMap) — the 3^6 im2col is the floor
        self._prune = prune_offsets if dim >= 6 else 0
        self._tail_cap = prune_tail_cap
        cap = x.capacity
        caps = [max(256, cap // level_capacity_div[min(i, len(level_capacity_div) - 1)])
                for i in range(n_levels)]
        self.coords = [x.coords]
        self.valid = [x.valid]
        self.stride = [x.stride]
        for lvl in range(1, n_levels):
            c, v = downsample_coords(
                self.coords[-1], self.valid[-1], self.stride[-1], caps[lvl]
            )
            self.coords.append(c)
            self.valid.append(v)
            self.stride.append(self.stride[-1] * 2)
        self.tables = [
            _mk_table(c, v, c.shape[0])
            for c, v in zip(self.coords, self.valid)
        ]
        self._kmaps = {}

    def _maybe_prune(self, m):
        if self._prune:
            return prune_kernel_map(m, self._prune, self._tail_cap)
        return m

    def prune_overflow(self):
        """Total tail hits dropped beyond tail_cap across built maps ([]
        int32) — nonzero means convs silently lost contributions."""
        vals = [m.tail_dropped for m in self._kmaps.values()
                if isinstance(m, PrunedKernelMap)]
        return sum(vals, jnp.int32(0))

    def km(self, in_lvl: int, out_lvl: int, k: int, units: int):
        """Kernel map reading level `in_lvl` onto level `out_lvl` coords."""
        key = (in_lvl, out_lvl, k, units)
        if key not in self._kmaps:
            self._kmaps[key] = self._maybe_prune(kernel_map(
                self.tables[in_lvl], self.valid[in_lvl],
                self.coords[out_lvl], self.valid[out_lvl],
                kernel_offsets(k, units, self.dim),
            ))
        return self._kmaps[key]

    def same(self, lvl: int, k: int = 3):
        return self.km(lvl, lvl, k, self.stride[lvl])

    def down(self, lvl: int, k: int = 3):
        # stride-2 conv: inputs at level lvl, outputs at lvl+1, offsets in
        # input-stride units. k=3 derives the map from the fine side
        # (2^dim lookups/input voxel vs 3^dim/output voxel — an 11x probe
        # reduction for 6-D nets; sparse/conv.py kernel_map_down)
        if k == 3:
            key = ("down", lvl)
            if key not in self._kmaps:
                # keep the FULL map too: up() inverts it (inverting a
                # pruned map would lose the tail pairs)
                full = kernel_map_down(
                    self.tables[lvl + 1], self.coords[lvl], self.valid[lvl],
                    self.coords[lvl + 1].shape[0], self.stride[lvl],
                )
                self._kmaps[("down_full", lvl)] = full
                self._kmaps[key] = self._maybe_prune(full)
            return self._kmaps[key]
        return self.km(lvl, lvl + 1, k, self.stride[lvl])

    def up(self, lvl: int, k: int = 3):
        # transpose conv: inputs at level lvl, outputs at lvl-1, offsets in
        # OUTPUT-stride units — derived by inverting the matching down map
        # (J set-scatters instead of a J x V hash-lookup pass)
        key = ("up", lvl, k)
        if key not in self._kmaps:
            if k == 3:
                self.down(lvl - 1, k)   # caches the full fine-side map
                full = self._kmaps[("down_full", lvl - 1)]
            else:
                # inversion needs the UNPRUNED map (a pruned one would
                # lose the tail and misalign weight rows) — build it
                # directly, bypassing km()'s pruning
                full = kernel_map(
                    self.tables[lvl - 1], self.valid[lvl - 1],
                    self.coords[lvl], self.valid[lvl],
                    kernel_offsets(k, self.stride[lvl - 1], self.dim),
                )
            self._kmaps[key] = self._maybe_prune(invert_kernel_map(
                full, self.coords[lvl - 1].shape[0]
            ))
        return self._kmaps[key]


class SimpleNet(nn.Module):
    """Plain sparse U-Net without residual blocks (simpleunet.py:13-138).

    `channels`/`tr_channels` index from 1 (entry [0] unused, reference
    convention); len(channels) - 1 = number of stride levels.
    SimpleNet:  CHANNELS [_, 32, 64, 128], TR [_, 32, 32, 64]
    SimpleNet2: CHANNELS [_, 32, 64, 128, 256], TR [_, 32, 32, 64, 64]
    (simpleunet.py:15-16, 157-160).
    """

    in_channels: int = 6
    out_channels: int = 1
    bn_momentum: float = 0.05
    conv1_kernel_size: int = 3
    normalize_feature: bool = False
    dim: int = 3
    channels: Sequence[int] = (0, 32, 64, 128)
    tr_channels: Sequence[int] = (0, 32, 32, 64)
    compute_dtype: str | None = "bfloat16"
    level_capacity_div: Sequence[int] = (1, 1, 2, 4)

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = False) -> SparseTensor:
        CH, TR = self.channels, self.tr_channels
        L = len(CH) - 1
        S = LevelStructs(x, L, self.dim, self.level_capacity_div)
        no = lambda k: k ** self.dim  # noqa: E731
        # bf16 is inference-only (training keeps f32 — see models.fcgf)
        cdt = None if train else self.compute_dtype

        def conv_bn_relu(feats, lvl, cout, kmap, k, name):
            out = SparseConvLayer(
                cout, k, num_offsets=no(k), compute_dtype=cdt, name=f"conv{name}"
            )(feats, S.valid[lvl], kmap)
            out = SparseBatchNorm(self.bn_momentum, name=f"norm{name}")(
                out, S.valid[lvl], train
            )
            return nn.relu(out)

        # encoder
        skips = []
        out = conv_bn_relu(
            x.feats, 0, CH[1], S.same(0, self.conv1_kernel_size),
            self.conv1_kernel_size, "1",
        )
        skips.append(out)
        for lvl in range(1, L):
            out = conv_bn_relu(out, lvl, CH[lvl + 1], S.down(lvl - 1), 3,
                               str(lvl + 1))
            skips.append(out)

        # decoder: transpose back up, concat encoder skip
        for lvl in range(L - 1, 0, -1):
            out = conv_bn_relu(out, lvl - 1, TR[lvl + 1], S.up(lvl), 3,
                               f"{lvl + 1}_tr")
            out = jnp.concatenate([out, skips[lvl - 1]], axis=1)

        out = conv_bn_relu(out, 0, TR[1], S.same(0), 3, "1_tr")
        out = SparseConvLayer(
            self.out_channels, 1, use_bias=True, compute_dtype=cdt,
            name="final",
        )(out, S.valid[0])

        if self.normalize_feature:
            norm = jnp.sqrt(jnp.sum(out * out, axis=1, keepdims=True) + 1e-16)
            out = out / (norm + 1e-8) * S.valid[0][:, None]
        _sow_prune_overflow(self, S)
        return SparseTensor(S.coords[0], out, S.valid[0], x.stride)


def SimpleNetE(**kw):
    """Small variant (simpleunet.py:148-150: SimpleNetBNE channels)."""
    kw.setdefault("channels", (0, 16, 32, 32))
    kw.setdefault("tr_channels", (0, 16, 16, 32))
    return SimpleNet(**kw)


def SimpleNet2(**kw):
    """4-level variant (simpleunet.py:157-160)."""
    kw.setdefault("channels", (0, 32, 64, 128, 256))
    kw.setdefault("tr_channels", (0, 32, 32, 64, 64))
    return SimpleNet(**kw)


class PyramidNet(nn.Module):
    """Recursive pyramid net (pyramidnet.py:87-163), ELU nonlinearity.

    Level d: conv(k3, s2) + `depths[d]` residual blocks, recurse, transpose
    back, concat the level input, 1x1 fuse conv. PyramidNet channels
    [32, 64, 128, 128], TR [64, 128, 128, 128] (pyramidnet.py:91-92);
    PyramidNet6 extends to 6 levels.
    """

    in_channels: int = 6
    out_channels: int = 1
    bn_momentum: float = 0.05
    conv1_kernel_size: int = 3
    normalize_feature: bool = False
    dim: int = 3
    channels: Sequence[int] = (32, 64, 128, 128)
    tr_channels: Sequence[int] = (64, 128, 128, 128)
    depths: Sequence[int] = (1, 1, 1, 1)
    compute_dtype: str | None = "bfloat16"
    level_capacity_div: Sequence[int] = (1, 1, 2, 4, 8, 16)

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = False) -> SparseTensor:
        CH, TR, DEP = self.channels, self.tr_channels, self.depths
        L = len(CH)
        S = LevelStructs(x, L, self.dim, self.level_capacity_div)
        no = lambda k: k ** self.dim  # noqa: E731
        # bf16 is inference-only (training keeps f32 — see models.fcgf)
        cdt = None if train else self.compute_dtype

        def conv_norm_non(feats, lvl, cout, kmap, k, name):
            out = SparseConvLayer(
                cout, k, num_offsets=no(k), compute_dtype=cdt,
                name=f"{name}_conv",
            )(feats, S.valid[lvl], kmap)
            out = SparseBatchNorm(self.bn_momentum, name=f"{name}_norm")(
                out, S.valid[lvl], train
            )
            return nn.elu(out) * S.valid[lvl][:, None]

        out = conv_norm_non(
            x.feats, 0, CH[0], S.same(0, self.conv1_kernel_size),
            self.conv1_kernel_size, "stem",
        )

        def pyramid(feats, d):
            """Module taking level-(d-1) features; returns TR[d-1]-wide."""
            y = conv_norm_non(feats, d, CH[d], S.down(d - 1), 3, f"p{d}_down")
            for b in range(DEP[d]):
                y = BasicBlockBN(
                    CH[d], self.bn_momentum, no(3), compute_dtype=cdt,
                    name=f"p{d}_block{b}",
                )(y, S.valid[d], S.same(d), train)
            if d + 1 < L:
                y = pyramid(y, d + 1)
            # transpose back to level d-1 (inner_outc = TR[d] channel plan)
            y = conv_norm_non(y, d - 1, TR[d], S.up(d), 3, f"p{d}_up")
            y = jnp.concatenate([feats, y], axis=1)
            return conv_norm_non(y, d - 1, TR[d - 1], None, 1, f"p{d}_cat")

        out = pyramid(out, 1)
        out = conv_norm_non(out, 0, TR[0], S.same(0), 3, "final_pre")
        out = SparseConvLayer(
            self.out_channels, 1, compute_dtype=cdt, name="final"
        )(out, S.valid[0])

        if self.normalize_feature:
            norm = jnp.sqrt(jnp.sum(out * out, axis=1, keepdims=True) + 1e-16)
            out = out / (norm + 1e-8) * S.valid[0][:, None]
        _sow_prune_overflow(self, S)
        return SparseTensor(S.coords[0], out, S.valid[0], x.stride)


def PyramidNet6(**kw):
    """6-level variant (pyramidnet.py:166-168)."""
    kw.setdefault("channels", (32, 64, 128, 192, 256, 256))
    kw.setdefault("tr_channels", (64, 128, 192, 192, 256, 256))
    kw.setdefault("depths", (1, 1, 1, 1, 1, 1))
    return PyramidNet(**kw)
