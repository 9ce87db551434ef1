"""Misc evaluation utilities.

Parity: Experiments/evaluation/benchmark_utils.py (set_seed :27-38,
icp_refine :40-57, rot_to_euler) and FCGF_FAST/utils/algo_utils.py
(best-buddy losses :11-120, chamfer distance :121-200) /
PointCloudUtils.py distance helpers.
"""
from __future__ import annotations

import os
import random

import jax
import jax.numpy as jnp
import numpy as np


def set_seed(seed: int = 51):
    """Global python/numpy seeding + a JAX key (benchmark_utils.py:27-38;
    the harness applies seed 51 before eval: Experiments/test.py:357,373).

    JAX RNG is explicit, so this returns the root PRNG key to thread through
    device code (torch's global-state seeding has no JAX analogue).
    """
    random.seed(seed)
    np.random.seed(seed)
    os.environ["PYTHONHASHSEED"] = str(seed)
    return jax.random.PRNGKey(seed)


def icp_refine(src_xyz, src_valid, tgt_xyz, tgt_valid, pred_trans,
               max_corr_dist: float = 0.6):
    """ICP post-refinement wrapper (benchmark_utils.py:40-57 semantics)."""
    from ..solvers.icp import icp_point_to_point

    return icp_point_to_point(
        src_xyz, src_valid, tgt_xyz, tgt_valid, pred_trans, max_corr_dist
    )


def rot_to_euler(R: np.ndarray) -> np.ndarray:
    """ZYX euler (degrees) of a rotation matrix (benchmark_utils rot_to_euler)."""
    from ..genset.generator import rotation_matrix_euler_deg

    return rotation_matrix_euler_deg(np.asarray(R))


def chamfer_distance(A: jnp.ndarray, B: jnp.ndarray,
                     a_valid=None, b_valid=None) -> jnp.ndarray:
    """Symmetric chamfer distance (FCGF_FAST/utils/algo_utils.py chamfer).

    A: [N, 3], B: [M, 3]; masked rows excluded from both directions.
    """
    d2 = (
        jnp.sum(A * A, 1)[:, None] + jnp.sum(B * B, 1)[None]
        - 2.0 * jnp.dot(A, B.T, precision="highest")
    )
    inf = jnp.float32(jnp.inf)
    if b_valid is not None:
        d2 = jnp.where(b_valid[None, :], d2, inf)
    ab = jnp.sqrt(jnp.maximum(jnp.min(d2, axis=1), 1e-30))
    d2t = d2.T
    if a_valid is not None:
        d2t = jnp.where(a_valid[None, :], d2t, inf)
    ba = jnp.sqrt(jnp.maximum(jnp.min(d2t, axis=1), 1e-30))
    wa = a_valid.astype(ab.dtype) if a_valid is not None else jnp.ones_like(ab)
    wb = b_valid.astype(ba.dtype) if b_valid is not None else jnp.ones_like(ba)
    return (
        jnp.sum(ab * wa) / jnp.maximum(jnp.sum(wa), 1)
        + jnp.sum(ba * wb) / jnp.maximum(jnp.sum(wb), 1)
    )


def best_buddy_loss(A: jnp.ndarray, B: jnp.ndarray,
                    a_valid=None, b_valid=None) -> jnp.ndarray:
    """Mean distance over mutual-nearest pairs (algo_utils best-buddy loss:
    the BBS/BBR family's registration objective)."""
    d2 = (
        jnp.sum(A * A, 1)[:, None] + jnp.sum(B * B, 1)[None]
        - 2.0 * jnp.dot(A, B.T, precision="highest")
    )
    inf = jnp.float32(jnp.inf)
    if b_valid is not None:
        d2 = jnp.where(b_valid[None, :], d2, inf)
    if a_valid is not None:
        d2 = jnp.where(a_valid[:, None], d2, inf)
    nn_ab = jnp.argmin(d2, axis=1)
    nn_ba = jnp.argmin(d2, axis=0)
    n = A.shape[0]
    is_bb = nn_ba[nn_ab] == jnp.arange(n)
    if a_valid is not None:
        is_bb = is_bb & a_valid
    d = jnp.sqrt(
        jnp.maximum(jnp.take_along_axis(d2, nn_ab[:, None], 1)[:, 0], 1e-30)
    )
    w = is_bb.astype(d.dtype)
    return jnp.sum(d * w) / jnp.maximum(jnp.sum(w), 1)
