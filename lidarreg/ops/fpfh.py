"""FPFH descriptors (Fast Point Feature Histograms), TPU-native.

Replaces Open3D's `compute_fpfh_feature` used by the reference's FPFH
precompute path (Experiments/misc/cal_fpfh.py:7-112; consumed by the
`descriptor='fpfh'` branches of the precomputed datasets,
Experiments/datasets/KITTI.py:51-54).

Algorithm (Rusu et al. 2009): per point p with normal n, for each neighbor q
compute the Darboux-frame angle triple
  u = n_p, v = u x (q - p)/|q - p|, w = u x v
  f1 = v . n_q          (in [-1, 1])
  f2 = u . (q - p)/d    (in [-1, 1])
  f3 = atan2(w . n_q, u . n_q)  (in [-pi, pi])
bin each into 11 bins -> SPFH(33); FPFH(p) = SPFH(p) +
mean_q SPFH(q) / d(p, q) over neighbors, L1-normalized per 11-bin block.

Neighborhoods come from the cuckoo voxel grid (27-cell candidates — one
stored point per cell), giving a fixed <=26-neighbor stencil; Open3D uses a
KD-tree radius search. Same descriptor family, bounded memory (documented
deviation; histogram bin boundaries identical).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..solvers.icp import build_grid
from ..solvers.refinement import estimate_normals
from ..sparse.hashtable import lookup
from ..sparse.tensor import kernel_offsets

_BINS = 11


def _soft_hist(value01: jnp.ndarray, weight: jnp.ndarray) -> jnp.ndarray:
    """Hard-binned histogram over the last (neighbor) axis.

    value01: [N, K] in [0, 1]; weight: [N, K] -> [N, _BINS].
    """
    b = jnp.clip((value01 * _BINS).astype(jnp.int32), 0, _BINS - 1)
    onehot = jax.nn.one_hot(b, _BINS, dtype=weight.dtype)
    return jnp.einsum("nk,nkb->nb", weight, onehot)


@partial(jax.jit, static_argnums=(2, 3))
def fpfh(
    pts: jnp.ndarray,
    valid: jnp.ndarray,
    radius: float = 1.0,
    table_size: int | None = None,
) -> jnp.ndarray:
    """[N, 3] points (+ validity) -> [N, 33] FPFH descriptors."""
    n = pts.shape[0]
    if table_size is None:
        table_size = 1
        while table_size < 8 * n:
            table_size *= 2
    normals = estimate_normals(pts, valid, radius=radius)
    table = build_grid(pts, valid, radius, table_size)

    q = jnp.floor(pts / radius).astype(jnp.int32)
    offs = kernel_offsets(3, 1)
    nb = lookup(table, q[None] + offs[:, None])       # [27, N]
    hit = (nb >= 0) & valid[None]
    nb_safe = jnp.where(hit, nb, 0)
    # drop the self cell (offset 13 = center for k=3 cube)
    self_row = nb_safe == jnp.arange(n)[None]
    hit = hit & ~self_row

    qp = pts[nb_safe]                                  # [27, N, 3]
    nq = normals[nb_safe]
    diff = qp - pts[None]
    d = jnp.linalg.norm(diff, axis=-1)
    hit = hit & (d > 1e-6) & (d < radius * 1.74)       # cell diagonal reach
    dn = diff / jnp.maximum(d, 1e-6)[..., None]

    u = jnp.broadcast_to(normals[None], qp.shape)
    v = jnp.cross(u, dn)
    v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-6)
    w = jnp.cross(u, v)

    f1 = jnp.sum(v * nq, axis=-1)                      # [-1, 1]
    f2 = jnp.sum(u * dn, axis=-1)                      # [-1, 1]
    f3 = jnp.arctan2(jnp.sum(w * nq, axis=-1), jnp.sum(u * nq, axis=-1))

    wgt = hit.astype(pts.dtype).T                      # [N, 27]
    h1 = _soft_hist(((f1 + 1.0) * 0.5).T, wgt)
    h2 = _soft_hist(((f2 + 1.0) * 0.5).T, wgt)
    h3 = _soft_hist(((f3 / jnp.pi + 1.0) * 0.5).T, wgt)
    spfh = jnp.concatenate([h1, h2, h3], axis=1)       # [N, 33]

    # FPFH: own SPFH + distance-weighted mean of neighbor SPFHs
    nb_spfh = spfh[nb_safe]                            # [27, N, 33]
    inv_d = jnp.where(hit, 1.0 / jnp.maximum(d, 1e-6), 0.0)
    denom = jnp.maximum(jnp.sum(inv_d, axis=0), 1e-6)
    neigh = jnp.einsum("kn,knf->nf", inv_d, nb_spfh) / denom[:, None]
    out = spfh + neigh

    # per-block L1 normalization (Open3D convention: percentage histograms)
    def norm_block(x):
        return x / jnp.maximum(jnp.sum(x, axis=1, keepdims=True), 1e-9) * 100.0

    out = jnp.concatenate(
        [norm_block(out[:, :11]), norm_block(out[:, 11:22]),
         norm_block(out[:, 22:])], axis=1,
    )
    return out * valid[:, None]
