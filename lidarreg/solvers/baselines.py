"""Baseline registration algorithms: SM (spectral matching) and PMC.

Parity targets: Experiments/baseline_scripts/baseline_3DMatch.py:19-78 —
  * SM: length-difference compatibility matrix through the polynomial kernel
    max(0, 4.5 - M^2 / (2 sigma^2)) with sigma = inlier_threshold / 3,
    zeroed diagonal, 10 power iterations for the leading eigenvector,
    top-10% entries become inliers, weighted Kabsch on eig * labels;
  * PMC: compatibility-graph maximum clique -> unweighted Kabsch over the
    clique; the exact clique comes from the native C++ solver
    (lidarreg.native.max_clique, replacing the PMC C library the reference
    loads through ctypes at Experiments/utils/max_clique.py:9-40).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..core.kabsch import rigid_transform_3d
from ..models.pointdsc import power_iteration


def spectral_matching_register(
    src_keypts: jnp.ndarray,     # [B, N, 3]
    tgt_keypts: jnp.ndarray,     # [B, N, 3]
    inlier_threshold: float = 0.6,
    top_ratio: float = 0.1,
    num_iterations: int = 10,
):
    """SM baseline; returns (pred_trans [B,4,4], pred_labels [B,N]). Jittable."""
    d_src = jnp.linalg.norm(
        src_keypts[:, :, None] - src_keypts[:, None], axis=-1
    )
    d_tgt = jnp.linalg.norm(
        tgt_keypts[:, :, None] - tgt_keypts[:, None], axis=-1
    )
    M = d_src - d_tgt
    sigma = inlier_threshold / 3.0
    M = jnp.maximum(0.0, 4.5 - M**2 / (2.0 * sigma**2))
    n = M.shape[-1]
    M = jnp.where(jnp.eye(n, dtype=bool), 0.0, M)

    eig = power_iteration(M, num_iterations)          # [B, N]
    k = max(1, int(n * top_ratio))
    thresh = jnp.sort(eig, axis=-1)[:, -k][:, None]
    labels = (eig >= thresh).astype(jnp.float32)
    trans = rigid_transform_3d(src_keypts, tgt_keypts, eig * labels)
    return trans, labels


def pmc_register(
    src_keypts: np.ndarray,      # [N, 3] (host arrays; exact clique is C++)
    tgt_keypts: np.ndarray,
    inlier_threshold: float = 0.6,
    time_budget_sec: float = 10.0,
):
    """PMC baseline: exact max clique of the compatibility graph.

    Edge (i, j) iff |d_src(i,j)^2 - d_tgt(i,j)^2| < inlier_threshold
    (baseline_3DMatch.py:62-67 — note the reference compares SQUARED length
    difference against the threshold; kept for parity).
    """
    from ..native import max_clique

    ds2 = ((src_keypts[:, None] - src_keypts[None]) ** 2).sum(-1)
    dt2 = ((tgt_keypts[:, None] - tgt_keypts[None]) ** 2).sum(-1)
    adj = np.abs(ds2 - dt2) < inlier_threshold
    np.fill_diagonal(adj, False)
    clique = max_clique(adj, time_budget_sec)
    labels = np.zeros(len(src_keypts), np.float32)
    labels[clique] = 1.0
    trans = rigid_transform_3d(
        jnp.asarray(src_keypts)[None], jnp.asarray(tgt_keypts)[None],
        jnp.asarray(labels)[None],
    )
    return np.asarray(trans[0]), labels
