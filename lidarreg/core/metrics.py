"""Registration error metrics: RE / TE / success recall.

Parity targets:
  - RE = arccos((trace(R_est^T R_gt) - 1) / 2) in degrees, TE = ||t_est - t_gt||
    (Experiments/test.py:326-331 via TransformationLoss,
     FCGF_FAST/net/RANSAC.py:114-125, DGR/scripts/test_kitti.py:43-44).
  - Success criterion: RE <= re_thresh (5 deg) AND TE <= te_thresh (0.6 m)
    (Experiments/config.py:126-129).
  - Correspondence inlier ratio vs GT: dist^2 < (2*voxel)^2
    (Experiments/algorithms/matching.py:241-249).
"""
from __future__ import annotations

import jax.numpy as jnp

from .se3 import decompose, transform

DEFAULT_RE_THRESH_DEG = 5.0
DEFAULT_TE_THRESH_M = 0.6


def rotation_error_deg(R_est: jnp.ndarray, R_gt: jnp.ndarray) -> jnp.ndarray:
    """Geodesic rotation error in degrees, batched over leading dims."""
    tr = jnp.einsum("...ij,...ij->...", R_est, R_gt, precision="highest")
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)
    return jnp.degrees(jnp.arccos(cos))


def translation_error(t_est: jnp.ndarray, t_gt: jnp.ndarray) -> jnp.ndarray:
    """Euclidean translation error (meters)."""
    return jnp.linalg.norm(t_est - t_gt, axis=-1)


def registration_errors(T_est: jnp.ndarray, T_gt: jnp.ndarray):
    """(RE_deg, TE_m) for [..., 4, 4] transforms."""
    R_est, t_est = decompose(T_est)
    R_gt, t_gt = decompose(T_gt)
    return rotation_error_deg(R_est, R_gt), translation_error(t_est, t_gt)


def registration_success(
    T_est: jnp.ndarray,
    T_gt: jnp.ndarray,
    re_thresh_deg: float = DEFAULT_RE_THRESH_DEG,
    te_thresh_m: float = DEFAULT_TE_THRESH_M,
):
    """(success_bool, RE_deg, TE_m)."""
    re, te = registration_errors(T_est, T_gt)
    return (re <= re_thresh_deg) & (te <= te_thresh_m), re, te


def inlier_ratio(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    idx0: jnp.ndarray,
    idx1: jnp.ndarray,
    T_gt: jnp.ndarray,
    voxel_size: float,
    pair_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Fraction of correspondences within 2*voxel of GT alignment.

    Parity: Experiments/algorithms/matching.py:241-249 (measure_inlier_ratio).
    `pair_mask` masks out padded correspondence slots (TPU static shapes).
    """
    src_t = transform(src, T_gt)
    d2 = jnp.sum((src_t[..., idx0, :] - tgt[..., idx1, :]) ** 2, axis=-1)
    is_close = d2 < (2.0 * voxel_size) ** 2
    if pair_mask is None:
        return jnp.mean(is_close.astype(jnp.float32), axis=-1)
    m = pair_mask.astype(jnp.float32)
    return jnp.sum(is_close * m, axis=-1) / jnp.maximum(jnp.sum(m, axis=-1), 1.0)


def correspondence_inlier_mask(
    src_pts: jnp.ndarray,
    tgt_pts: jnp.ndarray,
    T: jnp.ndarray,
    thresh: float,
) -> jnp.ndarray:
    """Boolean mask: |T(src) - tgt| < thresh, for matched point arrays [..., N, 3]."""
    d2 = jnp.sum((transform(src_pts, T) - tgt_pts) ** 2, axis=-1)
    return d2 < thresh * thresh
