"""Feature-space nearest neighbors as tiled MXU matmuls.

Replaces the reference's chunked torch kNN (nn_max_n=250 row tiles:
Experiments/algorithms/matching.py:22-65, DGR/core/knn.py:27-83,
FCGF_FAST/net/RANSAC.py:196-224). The 250-row tiling was a 2020-GPU memory
ceiling; on TPU we use much larger tiles (default 4096 rows) so the
N x M distance computation is a handful of big `jnp.dot` launches that XLA
maps straight onto the MXU, with `lax.map` over row tiles bounding HBM use.

All functions are static-shape: padded rows/cols are handled with masks, so
they can sit inside jit/vmap/shard_map without recompilation per cloud size.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

_INF = jnp.float32(jnp.inf)


class NNResult(NamedTuple):
    idx: jnp.ndarray        # [N0] int32 — nearest neighbor in F1 for each F0 row
    dist: jnp.ndarray       # [N0] f32   — L2 distance to nearest
    idx2: jnp.ndarray       # [N0] int32 — 2nd nearest (valid iff return_2nd)
    dist2: jnp.ndarray      # [N0] f32   — L2 distance to 2nd nearest


def _row_tile_nn(f0_tile, f1, sq1, mask1, return_2nd, precision):
    """NN for one row tile: [T, D] x [M, D] -> per-row (idx, dist[, idx2, dist2])."""
    sq0 = jnp.sum(f0_tile * f0_tile, axis=1, keepdims=True)
    cross = jnp.dot(f0_tile, f1.T, precision=precision,
                    preferred_element_type=jnp.float32)
    d2 = sq0 + sq1[None, :] - 2.0 * cross
    d2 = jnp.maximum(d2, 1e-30)
    if mask1 is not None:
        d2 = jnp.where(mask1[None, :], d2, _INF)
    idx = jnp.argmin(d2, axis=1).astype(jnp.int32)
    dmin = jnp.take_along_axis(d2, idx[:, None], axis=1)[:, 0]
    if not return_2nd:
        return idx, jnp.sqrt(dmin), idx, jnp.sqrt(dmin)
    cols = lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    d2_wo = jnp.where(cols == idx[:, None], _INF, d2)
    idx2 = jnp.argmin(d2_wo, axis=1).astype(jnp.int32)
    dmin2 = jnp.take_along_axis(d2_wo, idx2[:, None], axis=1)[:, 0]
    return idx, jnp.sqrt(dmin), idx2, jnp.sqrt(dmin2)


def find_nn(
    F0: jnp.ndarray,
    F1: jnp.ndarray,
    mask1: jnp.ndarray | None = None,
    return_2nd: bool = False,
    row_tile: int = 4096,
    precision: str = "highest",
    backend: str = "jnp",
) -> NNResult:
    """Nearest (and optionally 2nd-nearest) neighbor of each F0 row in F1.

    Parity: Experiments/algorithms/matching.py:22-65 (find_nn), including the
    L2-distance formulation |f0|^2+|f1|^2-2<f0,f1> and the "mask the argmin,
    re-min" 2nd-NN trick (:34-39).

    F0: [N0, D], F1: [N1, D]. `mask1` marks valid F1 rows (padding -> False).
    N0 is padded up to a multiple of `row_tile` internally.

    backend="pallas" routes through the fused VMEM-resident top-2 kernel
    (ops.pallas_knn) — bit-identical results, no [N0, N1] HBM block
    materialization; "jnp" is the reference path and the CPU default.
    """
    if backend == "pallas" and precision == "high":
        backend = "jnp"  # mosaic lowers DEFAULT/HIGHEST only, not 3-pass HIGH
    if backend == "pallas":
        from .pallas_knn import knn_top2_pallas

        m1 = mask1 if mask1 is not None else jnp.ones(F1.shape[0], bool)
        i1, d1, i2, d2 = knn_top2_pallas(F0, F1, m1, precision=precision)
        return NNResult(i1, d1, i2, d2)
    n0 = F0.shape[0]
    tile = min(row_tile, max(n0, 8))
    n_pad = (-n0) % tile
    F0p = jnp.pad(F0, ((0, n_pad), (0, 0)))
    sq1 = jnp.sum(F1 * F1, axis=1)
    tiles = F0p.reshape(-1, tile, F0.shape[1])

    fn = partial(_row_tile_nn, f1=F1, sq1=sq1, mask1=mask1,
                 return_2nd=return_2nd, precision=precision)
    idx, dist, idx2, dist2 = lax.map(fn, tiles)
    out = NNResult(
        idx.reshape(-1)[:n0],
        dist.reshape(-1)[:n0],
        idx2.reshape(-1)[:n0],
        dist2.reshape(-1)[:n0],
    )
    return out


def find_nn_bidirectional(
    F0: jnp.ndarray,
    F1: jnp.ndarray,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
    row_tile: int = 4096,
    precision: str = "highest",
    backend: str = "auto",
) -> tuple[NNResult, jnp.ndarray]:
    """Forward top-2 NN and backward NN from ONE distance-matrix pass.

    The matching front-end (match/pipeline.py) needs the forward NN (+2nd
    for the ratio test) AND the backward NN (mutual-NN check). Two find_nn
    calls compute the [N0, N1] distance matrix twice (~2x4 GB of HBM
    traffic at 32k x 32k); here a lax.scan over row tiles computes each
    distance block once, reduces it along columns for the forward top-2,
    and folds it into running (min, argmin)-per-column carries for the
    backward direction.

    Returns (forward NNResult over F0 rows, backward idx [N1] into F0).
    Bit-identical to the two-call path except backward argmin tie-breaks
    (both pick SOME minimizing row; argmin takes the first, the carry takes
    the first across tiles too — identical because tiles scan in order).

    backend: "auto" routes through the fused VMEM-resident pallas kernel on
    TPU (ops.pallas_knn.knn_bidir_pallas — no [tile, N1] HBM blocks at
    all); "jnp" forces the lax.scan path (CPU / reference).
    """
    n0, dim = F0.shape
    if backend == "auto":
        import jax

        backend = "pallas" if jax.default_backend() == "tpu" else "jnp"
    if backend == "pallas" and precision == "high":
        backend = "jnp"  # mosaic lowers DEFAULT/HIGHEST only, not 3-pass HIGH
    if backend == "pallas":
        from .pallas_knn import knn_bidir_pallas

        m0 = mask0 if mask0 is not None else jnp.ones((n0,), bool)
        m1 = mask1 if mask1 is not None else jnp.ones((F1.shape[0],), bool)
        i1, d1, i2, d2, bi, _ = knn_bidir_pallas(
            F0, F1, m0, m1, precision=precision
        )
        return NNResult(i1, d1, i2, d2), bi
    n1 = F1.shape[0]
    tile = min(row_tile, max(n0, 8))
    n_pad = (-n0) % tile
    F0p = jnp.pad(F0, ((0, n_pad), (0, 0)))
    ntiles = F0p.shape[0] // tile
    sq1 = jnp.sum(F1 * F1, axis=1)
    m0 = mask0 if mask0 is not None else jnp.ones((n0,), bool)
    m0p = jnp.pad(m0, (0, n_pad))  # padded rows invalid for the backward min
    tiles = F0p.reshape(ntiles, tile, dim)
    m0t = m0p.reshape(ntiles, tile)

    def body(carry, xs):
        cmin, cidx = carry
        f0_tile, m0_tile, t = xs
        sq0 = jnp.sum(f0_tile * f0_tile, axis=1, keepdims=True)
        cross = jnp.dot(f0_tile, F1.T, precision=precision,
                        preferred_element_type=jnp.float32)
        d2 = sq0 + sq1[None, :] - 2.0 * cross
        d2 = jnp.maximum(d2, 1e-30)
        d2m = jnp.where(mask1[None, :], d2, _INF) if mask1 is not None else d2
        # forward top-2 for this row tile
        idx = jnp.argmin(d2m, axis=1).astype(jnp.int32)
        dmin = jnp.take_along_axis(d2m, idx[:, None], axis=1)[:, 0]
        cols = lax.broadcasted_iota(jnp.int32, d2m.shape, 1)
        d2_wo = jnp.where(cols == idx[:, None], _INF, d2m)
        idx2 = jnp.argmin(d2_wo, axis=1).astype(jnp.int32)
        dmin2 = jnp.take_along_axis(d2_wo, idx2[:, None], axis=1)[:, 0]
        # backward column-min fold (invalid/padded F0 rows excluded)
        d2c = jnp.where(m0_tile[:, None], d2, _INF)
        tmin = jnp.min(d2c, axis=0)
        targ = (t * tile + jnp.argmin(d2c, axis=0)).astype(jnp.int32)
        better = tmin < cmin
        carry = (jnp.where(better, tmin, cmin),
                 jnp.where(better, targ, cidx))
        return carry, (idx, jnp.sqrt(dmin), idx2, jnp.sqrt(dmin2))

    (cmin, cidx), outs = lax.scan(
        body,
        (jnp.full((n1,), _INF), jnp.zeros((n1,), jnp.int32)),
        (tiles, m0t, jnp.arange(ntiles, dtype=jnp.int32)),
    )
    idx, dist, idx2, dist2 = (o.reshape(-1)[:n0] for o in outs)
    fwd = NNResult(idx, dist, idx2, dist2)
    return fwd, cidx


def mutual_nn_mask(
    idx01: jnp.ndarray, idx10: jnp.ndarray, mask0: jnp.ndarray | None = None
) -> jnp.ndarray:
    """Best-buddy mask: pair (i, idx01[i]) kept iff idx10[idx01[i]] == i.

    Static-shape equivalent of the reference's sparse-COO intersection
    (Experiments/algorithms/matching.py:67-87 torch_intersect + :222-239
    nn_to_mutual): a pair survives iff it appears in both the forward and
    backward NN sets, which for unique-argmin NN reduces to this round-trip
    test. Returns a bool mask over source indices instead of a compacted
    index list (TPU static shapes; downstream ops consume masks).
    """
    n0 = idx01.shape[0]
    back = idx10[idx01]
    keep = back == jnp.arange(n0, dtype=idx01.dtype)
    if mask0 is not None:
        keep = keep & mask0
    return keep


def feature_distance_ratio(
    F0: jnp.ndarray,
    F1: jnp.ndarray,
    idx0: jnp.ndarray,
    idx1: jnp.ndarray,
    idx1_2nd: jnp.ndarray,
    eps: float = 1e-6,
) -> jnp.ndarray:
    """d(F0[i], F1[nn1]) / (d(F0[i], F1[nn2]) + eps) — PROSAC match quality.

    Parity: Experiments/algorithms/matching.py:89-98.
    """
    a = F0[idx0]
    d1 = jnp.linalg.norm(a - F1[idx1], axis=1)
    d2 = jnp.linalg.norm(a - F1[idx1_2nd], axis=1)
    return d1 / (d2 + eps)


def knn_graph(
    F: jnp.ndarray,
    k: int,
    ignore_self: bool = False,
    normalized: bool = False,
    precision: str = "highest",
) -> jnp.ndarray:
    """Top-k nearest neighbors within one feature set: [B, N, D] -> [B, N, k].

    Parity: Experiments/models/common.py:48-69 (knn), used by PointDSC's
    NSM module. Uses negative-distance top_k (XLA-native) instead of sort.
    """
    inner = 2.0 * jnp.einsum("bnd,bmd->bnm", F, F, precision=precision)
    if normalized:
        d2 = 2.0 - inner
    else:
        sq = jnp.sum(F * F, axis=-1, keepdims=True)
        d2 = sq - inner + jnp.swapaxes(sq, -1, -2)
    if ignore_self:
        n = F.shape[-2]
        eye = jnp.eye(n, dtype=bool)
        d2 = jnp.where(eye, _INF, d2)
    _, idx = lax.top_k(-d2, k)
    return idx.astype(jnp.int32)
