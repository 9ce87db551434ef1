"""Fused kNN (top-2) Pallas kernel for TPU.

The jnp path (ops.knn.find_nn) materializes [tile, N1] distance blocks in
HBM and re-reads them for argmin / 2nd-argmin — at 32k x 32k that is ~4 GB
of traffic per direction. This kernel keeps everything in VMEM: each grid
step computes one (BM x BN) distance tile straight off the MXU
(-2 * F0 @ F1^T + |f1|^2; the |f0|^2 term is constant per row and cannot
change the argmin, so it is added back only to the returned distances) and
folds it into running (best, second-best) accumulators per row. HBM traffic
drops to reading F0/F1 once plus writing 4 output vectors.

Used by ops.knn.find_nn(backend="pallas") — the default on TPU for large
problems; the jnp path remains the reference implementation and the
CPU/interpret fallback.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BM = 512    # rows per tile (queries)
_BN = 2048   # cols per tile (candidates)
_NEG_BIG = -1e30


def _knn_kernel(f0_ref, f1t_ref, sq1_ref, mask1_ref,
                d1_ref, i1_ref, d2_ref, i2_ref,
                m1_s, x1_s, m2_s, x2_s, *, precision):
    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m1_s[:] = jnp.full_like(m1_s, 1e30)
        m2_s[:] = jnp.full_like(m2_s, 1e30)
        x1_s[:] = jnp.zeros_like(x1_s)
        x2_s[:] = jnp.zeros_like(x2_s)

    # distance tile (minus the per-row |f0|^2 constant)
    s = jnp.dot(f0_ref[:], f1t_ref[:], preferred_element_type=jnp.float32,
                precision=precision)
    d = sq1_ref[:] - 2.0 * s                       # [BM, BN]
    d = jnp.where(mask1_ref[:] != 0, d, 1e30)

    col0 = j * _BN
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)

    # tile-local best and second best along the candidate axis
    t1 = jnp.min(d, axis=1, keepdims=True)                      # [BM, 1]
    a1 = jnp.argmin(d, axis=1)                                  # [BM]
    i1_tile = (col0 + a1).astype(jnp.int32)[:, None]
    d_wo = jnp.where(cols == i1_tile, 1e30, d)
    t2 = jnp.min(d_wo, axis=1, keepdims=True)
    a2 = jnp.argmin(d_wo, axis=1)
    i2_tile = (col0 + a2).astype(jnp.int32)[:, None]

    # merge (t1, t2) into the running (m1, m2) top-2 accumulators
    m1 = m1_s[:]
    m2 = m2_s[:]
    x1 = x1_s[:]
    x2 = x2_s[:]

    # candidate pool per row: {m1, m2, t1, t2}; new best/second-best
    new_m1 = jnp.minimum(m1, t1)
    take_t1 = t1 < m1
    new_x1 = jnp.where(take_t1, i1_tile, x1)
    # second best: the better of (the loser of the m1/t1 duel) and min(m2, t2)
    loser = jnp.where(take_t1, m1, t1)
    loser_x = jnp.where(take_t1, x1, i1_tile)
    alt = jnp.minimum(m2, t2)
    alt_x = jnp.where(m2 < t2, x2, i2_tile)
    new_m2 = jnp.minimum(loser, alt)
    new_x2 = jnp.where(loser < alt, loser_x, alt_x)

    m1_s[:] = new_m1
    m2_s[:] = new_m2
    x1_s[:] = new_x1
    x2_s[:] = new_x2

    @pl.when(j == nj - 1)
    def _():
        d1_ref[:] = m1_s[:]
        d2_ref[:] = m2_s[:]
        i1_ref[:] = x1_s[:]
        i2_ref[:] = x2_s[:]


@functools.partial(jax.jit, static_argnums=(3,),
                   static_argnames=("precision",))
def knn_top2_pallas(F0: jnp.ndarray, F1: jnp.ndarray,
                    mask1: jnp.ndarray, interpret: bool = False,
                    precision: str = "highest"):
    """Top-2 nearest neighbors of each F0 row among F1 rows.

    F0: [N0, D], F1: [N1, D], mask1: [N1] bool (False = padding).
    Returns (idx1 [N0], dist1 [N0], idx2 [N0], dist2 [N0]); distances are
    true L2 (the |f0|^2 constant is restored outside the kernel).
    `precision` sets the MXU pass count for the distance matmul ("highest"
    = exact f32; "default" = one bf16 pass, ~6x the MXU rate — see
    scripts/knn_precision_ablation.py before changing it for a benchmark).
    """
    n0, dim = F0.shape
    n1 = F1.shape[0]
    pad0 = (-n0) % _BM
    pad1 = (-n1) % _BN
    padd = (-dim) % 128
    F0p = jnp.pad(F0.astype(jnp.float32), ((0, pad0), (0, padd)))
    F1p = jnp.pad(F1.astype(jnp.float32), ((0, pad1), (0, padd)))
    m1p = jnp.pad(mask1.astype(jnp.int32), (0, pad1))
    sq1 = jnp.sum(F1p * F1p, axis=1)
    f1t = F1p.T  # [D, N1]

    ni = F0p.shape[0] // _BM
    nj = F1p.shape[0] // _BN
    dpad = F0p.shape[1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((_BM, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dpad, _BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_BM, 1), jnp.float32),
            pltpu.VMEM((_BM, 1), jnp.int32),
            pltpu.VMEM((_BM, 1), jnp.float32),
            pltpu.VMEM((_BM, 1), jnp.int32),
        ],
    )
    d1, i1, d2, i2 = pl.pallas_call(
        functools.partial(_knn_kernel, precision=precision),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((F0p.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((F0p.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((F0p.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((F0p.shape[0], 1), jnp.int32),
        ],
        interpret=interpret,
    )(F0p, f1t, sq1[None, :], m1p[None, :])

    sq0 = jnp.sum(F0p * F0p, axis=1)[:n0]
    d1 = jnp.sqrt(jnp.maximum(d1[:n0, 0] + sq0, 1e-30))
    d2 = jnp.sqrt(jnp.maximum(d2[:n0, 0] + sq0, 1e-30))
    return i1[:n0, 0], d1, i2[:n0, 0], d2


def _knn_bidir_kernel(f0_ref, f1t_ref, sq0_ref, sq1_ref, mask0_ref, mask1_ref,
                      d1_ref, i1_ref, d2_ref, i2_ref, bd_ref, bi_ref,
                      m1_s, x1_s, m2_s, x2_s, bm_s, bx_s, *, precision):
    i = pl.program_id(0)
    j = pl.program_id(1)
    ni = pl.num_programs(0)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m1_s[:] = jnp.full_like(m1_s, 1e30)
        m2_s[:] = jnp.full_like(m2_s, 1e30)
        x1_s[:] = jnp.zeros_like(x1_s)
        x2_s[:] = jnp.zeros_like(x2_s)

    col0 = j * _BN
    # backward accumulators live across the whole grid (full [1, N1] width
    # in VMEM); column block j is first touched at i == 0
    @pl.when(i == 0)
    def _():
        bm_s[:, pl.dslice(col0, _BN)] = jnp.full((1, _BN), 1e30, jnp.float32)
        bx_s[:, pl.dslice(col0, _BN)] = jnp.zeros((1, _BN), jnp.int32)

    # TRUE squared distance tile (same op order as ops.knn._row_tile_nn so
    # argmin tie-breaks match bit-for-bit)
    s = jnp.dot(f0_ref[:], f1t_ref[:], preferred_element_type=jnp.float32,
                precision=precision)
    sq0col = sq0_ref[0, :][:, None]                # [BM, 1]
    d = (sq0col + sq1_ref[:]) - 2.0 * s           # [BM, BN]
    dfw = jnp.where(mask1_ref[:] != 0, d, 1e30)

    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, d.shape, 1)

    # ---- forward top-2 along candidates (identical to _knn_kernel) ---- #
    t1 = jnp.min(dfw, axis=1, keepdims=True)
    a1 = jnp.argmin(dfw, axis=1)
    i1_tile = (col0 + a1).astype(jnp.int32)[:, None]
    d_wo = jnp.where(cols == i1_tile, 1e30, dfw)
    t2 = jnp.min(d_wo, axis=1, keepdims=True)
    a2 = jnp.argmin(d_wo, axis=1)
    i2_tile = (col0 + a2).astype(jnp.int32)[:, None]

    m1 = m1_s[:]
    m2 = m2_s[:]
    x1 = x1_s[:]
    x2 = x2_s[:]
    new_m1 = jnp.minimum(m1, t1)
    take_t1 = t1 < m1
    new_x1 = jnp.where(take_t1, i1_tile, x1)
    loser = jnp.where(take_t1, m1, t1)
    loser_x = jnp.where(take_t1, x1, i1_tile)
    alt = jnp.minimum(m2, t2)
    alt_x = jnp.where(m2 < t2, x2, i2_tile)
    m1_s[:] = new_m1
    m2_s[:] = jnp.minimum(loser, alt)
    x1_s[:] = new_x1
    x2_s[:] = jnp.where(loser < alt, loser_x, alt_x)

    @pl.when(j == nj - 1)
    def _():
        d1_ref[:] = m1_s[:]
        d2_ref[:] = m2_s[:]
        i1_ref[:] = x1_s[:]
        i2_ref[:] = x2_s[:]

    # ---- backward column-min fold (invalid F0 rows excluded) ---------- #
    dbw = jnp.where(mask0_ref[0, :][:, None] != 0, d, 1e30)
    cmin_t = jnp.min(dbw, axis=0, keepdims=True)                  # [1, BN]
    carg_t = (i * _BM + jnp.argmin(dbw, axis=0)).astype(jnp.int32)[None, :]
    prev_m = bm_s[:, pl.dslice(col0, _BN)]
    prev_x = bx_s[:, pl.dslice(col0, _BN)]
    better = cmin_t < prev_m
    bm_s[:, pl.dslice(col0, _BN)] = jnp.where(better, cmin_t, prev_m)
    bx_s[:, pl.dslice(col0, _BN)] = jnp.where(better, carg_t, prev_x)

    @pl.when(i == ni - 1)
    def _():
        bd_ref[:] = bm_s[:, pl.dslice(col0, _BN)]
        bi_ref[:] = bx_s[:, pl.dslice(col0, _BN)]


@functools.partial(jax.jit, static_argnums=(4,),
                   static_argnames=("precision",))
def knn_bidir_pallas(F0: jnp.ndarray, F1: jnp.ndarray,
                     mask0: jnp.ndarray, mask1: jnp.ndarray,
                     interpret: bool = False, precision: str = "highest"):
    """Forward top-2 NN of F0 rows in F1 AND backward NN of F1 rows in F0,
    from ONE pass over the distance tiles.

    The matching front-end (match/pipeline.py) needs both directions; two
    kernel launches would read F0/F1 and stream the [N0, N1] tiles twice.
    Here each MXU distance tile additionally folds into a full-width
    [1, N1] column-min accumulator kept in VMEM scratch for the whole grid.

    Returns (idx1 [N0], dist1, idx2, dist2, bwd_idx [N1], bwd_dist [N1]).
    """
    n0, dim = F0.shape
    n1 = F1.shape[0]
    pad0 = (-n0) % _BM
    pad1 = (-n1) % _BN
    padd = (-dim) % 128
    F0p = jnp.pad(F0.astype(jnp.float32), ((0, pad0), (0, padd)))
    F1p = jnp.pad(F1.astype(jnp.float32), ((0, pad1), (0, padd)))
    m0p = jnp.pad(mask0.astype(jnp.int32), (0, pad0))
    m1p = jnp.pad(mask1.astype(jnp.int32), (0, pad1))
    sq0 = jnp.sum(F0p * F0p, axis=1)
    sq1 = jnp.sum(F1p * F1p, axis=1)
    f1t = F1p.T

    ni = F0p.shape[0] // _BM
    nj = F1p.shape[0] // _BN
    dpad = F0p.shape[1]
    n1p = F1p.shape[0]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=0,
        grid=(ni, nj),
        in_specs=[
            pl.BlockSpec((_BM, dpad), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((dpad, _BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BM), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BM), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_BM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BN), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((_BM, 1), jnp.float32),
            pltpu.VMEM((_BM, 1), jnp.int32),
            pltpu.VMEM((_BM, 1), jnp.float32),
            pltpu.VMEM((_BM, 1), jnp.int32),
            pltpu.VMEM((1, n1p), jnp.float32),
            pltpu.VMEM((1, n1p), jnp.int32),
        ],
    )
    d1, i1, d2, i2, bd, bi = pl.pallas_call(
        functools.partial(_knn_bidir_kernel, precision=precision),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((F0p.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((F0p.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((F0p.shape[0], 1), jnp.float32),
            jax.ShapeDtypeStruct((F0p.shape[0], 1), jnp.int32),
            jax.ShapeDtypeStruct((1, n1p), jnp.float32),
            jax.ShapeDtypeStruct((1, n1p), jnp.int32),
        ],
        interpret=interpret,
    )(F0p, f1t, sq0[None, :], sq1[None, :], m0p[None, :], m1p[None, :])

    d1 = jnp.sqrt(jnp.maximum(d1[:n0, 0], 1e-30))
    d2 = jnp.sqrt(jnp.maximum(d2[:n0, 0], 1e-30))
    bdist = jnp.sqrt(jnp.maximum(bd[0, :n1], 1e-30))
    return i1[:n0, 0], d1, i2[:n0, 0], d2, bi[0, :n1], bdist
