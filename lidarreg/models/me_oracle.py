"""Dense numpy oracle for MinkowskiEngine 0.5 generalized sparse convolution.

Purpose: pin the two porting conventions in `port_fcgf` (`offset_order`,
`transpose_flip`) NUMERICALLY instead of by a deferred A/B test
(VERDICT r2 item 4). MinkowskiEngine is CUDA-only and not installable here,
so this module re-implements its kernel-map semantics from the ME 0.5
sources the reference builds against (`Requirements/basis.yml` pins ME 0.5):

* offset enumeration (`src/region_iter.hpp` RegionIterator::operator++ for
  RegionType::HYPER_CUBE): coordinate axis 0 increments FASTEST; each axis
  spans {-(k//2), ..., k - 1 - k//2} * up_stride;
* convolution (`src/convolution_kernel.cuh` semantics): for output coord o,
  kernel index j contributes `in[o + off_j] @ W[j]` where offsets are in
  units of the INPUT tensor stride (down convs probe at the input stride);
* transpose convolution (`is_transpose` kernel maps,
  `src/coordinate_map_manager.cpp` swaps in/out maps per kernel index):
  the (j, in=f, out=c) pairs of the matching down conv become
  (j, in=c, out=f) — i.e. weight j contributes `in[f - off_j] @ W[j]` to
  fine output f.

The oracle is DENSE (a python dict coordinate map + per-offset loops): no
performance concern, total authority on semantics. `tests/test_me_oracle.py`
asserts that exactly one (offset_order, transpose_flip) combination makes
the repo's hash-table sparse conv reproduce this oracle, and that this
combination is `port_fcgf`'s default.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "me_offsets",
    "me_conv_dense",
    "me_conv_transpose_dense",
]


def me_offsets(kernel_size: int, dim: int, units: int = 1) -> np.ndarray:
    """ME 0.5 HYPER_CUBE offsets, axis 0 fastest. [K^dim, dim] int."""
    r = kernel_size // 2
    axis = np.arange(-r, kernel_size - r, dtype=np.int64) * units
    out = np.empty((kernel_size**dim, dim), np.int64)
    for j in range(kernel_size**dim):
        rest = j
        for ax in range(dim):          # axis 0 fastest (RegionIterator)
            out[j, ax] = axis[rest % kernel_size]
            rest //= kernel_size
    return out


def _coord_index(coords: np.ndarray) -> dict:
    return {tuple(c): i for i, c in enumerate(coords)}


def me_conv_dense(
    coords_in: np.ndarray,    # [Vi, D] int
    feats_in: np.ndarray,     # [Vi, Cin]
    coords_out: np.ndarray,   # [Vo, D] int
    weights_me: np.ndarray,   # [K^D, Cin, Cout] in ME enumeration
    kernel_size: int,
    units: int = 1,           # input tensor stride
) -> np.ndarray:
    """out[o] = sum_j in[coords_out[o] + off_j] @ W[j]  (absent -> skip)."""
    d = coords_in.shape[1]
    offs = me_offsets(kernel_size, d, units)
    index = _coord_index(coords_in)
    out = np.zeros((coords_out.shape[0], weights_me.shape[-1]), np.float64)
    for j, off in enumerate(offs):
        for o, c in enumerate(coords_out):
            row = index.get(tuple(c + off))
            if row is not None:
                out[o] += feats_in[row] @ weights_me[j]
    return out


def me_conv_transpose_dense(
    coords_in: np.ndarray,    # [Vc, D] coarse int
    feats_in: np.ndarray,     # [Vc, Cin]
    coords_out: np.ndarray,   # [Vf, D] fine int (existing finer set)
    weights_me: np.ndarray,   # [K^D, Cin, Cout] in ME enumeration
    kernel_size: int,
    units: int = 1,           # FINE (output) tensor stride
) -> np.ndarray:
    """Transposed pairs of the matching down conv, same kernel index.

    Down conv pairs (j, out=c, in=f) with f = c + off_j over the fine set;
    transpose conv therefore adds in[c] @ W[j] to out[f] for f = c + off_j,
    equivalently out[f] += in[f - off_j] @ W[j].
    """
    d = coords_in.shape[1]
    offs = me_offsets(kernel_size, d, units)
    index = _coord_index(coords_in)
    out = np.zeros((coords_out.shape[0], weights_me.shape[-1]), np.float64)
    for j, off in enumerate(offs):
        for o, f in enumerate(coords_out):
            row = index.get(tuple(f - off))
            if row is not None:
                out[o] += feats_in[row] @ weights_me[j]
    return out
