"""Point-to-point ICP, TPU-native (fixed-iteration, hash-grid NN).

Replaces Open3D `registration_icp` (the always-applied post-refinement at
Experiments/test.py:183-189, max_correspondence_distance 0.6, and the
refinement-family ICP at FCGF_FAST/net/refinement_tester.py:100-117).

Design: correspondences come from a cuckoo-hash voxel grid over the target
cloud (cell = max_corr_dist * 0.75, 27-cell neighborhood query) instead of a
KD-tree — the nearest STORED-PER-CELL point approximates the exact NN within
the correspondence radius (deviation: sub-cell nearest-point ties can pick a
slightly farther point; at benchmark voxel density the pose impact is below
the 0.6 m / 5 deg success resolution). Each iteration re-queries the grid,
solves weighted Kabsch on the in-radius pairs, and composes o3d-style
(T <- dT @ T). Fixed `max_iter` rounds (o3d's relative-change early exit is
control-flow-hostile under XLA; extra rounds are idempotent at convergence).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

from ..core.kabsch import weighted_kabsch
from ..core.se3 import integrate
from ..sparse.hashtable import build_table, lookup
from ..sparse.tensor import kernel_offsets


def grid_table_size(n: int, factor: int = 8) -> int:
    """Table entry count for `n` keys honoring the single-probe lookup's
    sizing contract (hashtable.py: >= ~8x keys keeps flagged buckets rare
    enough that the fixed retry pool never overflows — an undersized table
    silently reports present keys as absent)."""
    size = 1
    while size < factor * n:
        size *= 2
    return size


def build_grid(tgt: jnp.ndarray, tgt_valid: jnp.ndarray, cell: float,
               table_size: int):
    coords = jnp.floor(tgt / cell).astype(jnp.int32)
    table, _ = build_table(coords, tgt_valid, table_size)
    return table


def grid_nn(table, tgt: jnp.ndarray, query: jnp.ndarray, cell: float):
    """Approx NN: nearest stored point among the 27 cells around each query.

    Returns (nn_xyz [N, 3], dist [N]); dist = +inf where no candidate.
    """
    q = jnp.floor(query / cell).astype(jnp.int32)
    offs = kernel_offsets(3, 1)  # 27 neighbors
    cand = lookup(table, q[None, :, :] + offs[:, None, :])  # [27, N]
    hit = cand >= 0
    cand_safe = jnp.where(hit, cand, 0)
    pts = tgt[cand_safe]                                     # [27, N, 3]
    d2 = jnp.sum((pts - query[None]) ** 2, axis=-1)
    d2 = jnp.where(hit, d2, jnp.inf)
    best = jnp.argmin(d2, axis=0)                            # [N]
    nn = jnp.take_along_axis(pts, best[None, :, None], axis=0)[0]
    dbest = jnp.take_along_axis(d2, best[None, :], axis=0)[0]
    return nn, jnp.sqrt(dbest)


@partial(jax.jit, static_argnums=(5, 6, 7))
def icp_point_to_point(
    src: jnp.ndarray,
    src_valid: jnp.ndarray,
    tgt: jnp.ndarray,
    tgt_valid: jnp.ndarray,
    init_T: jnp.ndarray,
    max_corr_dist: float = 0.6,
    max_iter: int = 10,
    table_size: int | None = None,
):
    """ICP refinement from `init_T`; returns the refined [4, 4] transform."""
    n_tgt = tgt.shape[0]
    if table_size is None:
        table_size = grid_table_size(n_tgt)
    cell = max_corr_dist * 0.75
    table = build_grid(tgt, tgt_valid, cell, table_size)

    def body(_, T):
        # geometry matmul: pin f32 (TPU bf16 default = ~0.2 m at LiDAR scale)
        warped = jnp.einsum("nj,ij->ni", src, T[:3, :3],
                            precision="highest") + T[:3, 3]
        nn, dist = grid_nn(table, tgt, warped, cell)
        w = ((dist < max_corr_dist) & src_valid).astype(src.dtype)
        R, t = weighted_kabsch(warped[None], nn[None], w[None], method="jacobi")
        dT = integrate(R[0], t[0])
        good = jnp.sum(w) >= 3.0
        return jnp.where(good, jnp.matmul(dT, T, precision="highest"), T)

    return lax.fori_loop(0, max_iter, body, init_T.astype(jnp.float32))
