"""Weighted rigid alignment (Kabsch / weighted Procrustes), TPU-native.

The reference ships every 3x3 SVD to the CPU because batched CUDA SVD was slow
(Experiments/models/common.py:36, DGR/core/registration.py:105). On TPU we
avoid SVD entirely on the hot path: the optimal rotation is recovered with
Horn's closed-form quaternion method — build the symmetric 4x4 profile matrix
N from the weighted cross-covariance H and take its leading eigenvector with a
fixed-sweep cyclic Jacobi eigensolver (branch-free, batched 4x4 rotations,
quadratic convergence — a shifted power iteration stalls when the top two
eigenvalues nearly tie, which happens on minimal 3-point samples). This is
vmap-able and runs at 1M-hypothesis scale inside a single XLA program (used by
the RANSAC engine, PointDSC's seed hypotheses, and DGR's weighted Procrustes).

Functional parity target: Experiments/models/common.py:7-45
(`rigid_transform_3d`) and DGR/core/registration.py:91-113
(`weighted_procrustes`).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .se3 import integrate, quat_to_rotation

_JACOBI_SWEEPS = 6
# Cyclic order of off-diagonal (p, q) pairs for the 4x4 Jacobi sweeps.
_JACOBI_PAIRS = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))


def _horn_profile_matrix(H: jnp.ndarray) -> jnp.ndarray:
    """Build Horn's 4x4 symmetric matrix N from H[i,j] = sum_k w_k a_ki b_kj."""
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    N = jnp.stack(
        [
            jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1),
            jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1),
            jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1),
            jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1),
        ],
        -2,
    )
    return N


def _jacobi_rotation(A: jnp.ndarray, p: int, q: int) -> jnp.ndarray:
    """One batched Jacobi rotation G annihilating A[..., p, q] (symmetric A)."""
    apq = A[..., p, q]
    app = A[..., p, p]
    aqq = A[..., q, q]
    # Stable Jacobi angle: t = sign(theta) / (|theta| + sqrt(theta^2 + 1))
    theta = (aqq - app) / (2.0 * jnp.where(jnp.abs(apq) < 1e-30, 1e-30, apq))
    t = jnp.sign(theta) / (jnp.abs(theta) + jnp.sqrt(theta * theta + 1.0))
    t = jnp.where(jnp.abs(apq) < 1e-30, 0.0, t)
    c = 1.0 / jnp.sqrt(t * t + 1.0)
    s = t * c
    G = jnp.zeros(A.shape[:-2] + (4, 4), A.dtype) + jnp.eye(4, dtype=A.dtype)
    G = G.at[..., p, p].set(c).at[..., q, q].set(c)
    G = G.at[..., p, q].set(s).at[..., q, p].set(-s)
    return G


def eigh4_leading(N: jnp.ndarray) -> jnp.ndarray:
    """Leading (algebraically largest) eigenvector of symmetric [..., 4, 4].

    Fixed-count cyclic Jacobi: `_JACOBI_SWEEPS` sweeps over the 6 off-diagonal
    pairs; branch-free so it batches to millions of matrices on the VPU/MXU.
    """
    V = jnp.zeros_like(N) + jnp.eye(4, dtype=N.dtype)
    A = N

    def sweep(_, carry):
        A, V = carry
        for (p, q) in _JACOBI_PAIRS:
            G = _jacobi_rotation(A, p, q)
            A = jnp.einsum("...ji,...jk,...kl->...il", G, A, G, precision="highest")
            V = jnp.matmul(V, G, precision="highest")
        return (A, V)

    A, V = lax.fori_loop(0, _JACOBI_SWEEPS, sweep, (A, V))
    idx = jnp.argmax(
        jnp.diagonal(A, axis1=-2, axis2=-1), axis=-1
    )  # [...,]
    return jnp.take_along_axis(V, idx[..., None, None], axis=-1)[..., 0]


def rotation_from_covariance(H: jnp.ndarray) -> jnp.ndarray:
    """Optimal rotation R (maps src -> tgt) from cross-covariance H [..., 3, 3].

    H[i, j] = sum_k w_k * a_k[i] * b_k[j] with a = centered source points and
    b = centered target points. SVD-free: leading eigenvector of Horn's 4x4
    profile matrix via the fixed-sweep Jacobi solver above.
    """
    dtype = H.dtype
    H32 = H.astype(jnp.float32)
    # Scale-normalize for numerical stability at tiny/huge weights.
    scale = jnp.maximum(
        jnp.max(jnp.abs(H32), axis=(-2, -1), keepdims=True), 1e-30
    )
    N = _horn_profile_matrix(H32 / scale)
    q = eigh4_leading(N)
    return quat_to_rotation(q).astype(dtype)


def weighted_kabsch(
    A: jnp.ndarray,
    B: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    weight_threshold: float = 0.0,
):
    """Weighted rigid alignment: find (R, t) minimizing sum w |R a + t - b|^2.

    A, B: [..., N, 3]; weights: [..., N] or None.
    Returns (R [..., 3, 3], t [..., 3]).

    Parity: Experiments/models/common.py:7-45 (rigid_transform_3d), including
    the weight clipping below `weight_threshold`.
    """
    if weights is None:
        weights = jnp.ones(A.shape[:-1], dtype=A.dtype)
    if weight_threshold > 0.0:
        weights = jnp.where(weights < weight_threshold, 0.0, weights)
    wsum = jnp.sum(weights, axis=-1, keepdims=True) + 1e-6
    centroid_A = jnp.sum(A * weights[..., None], axis=-2) / wsum
    centroid_B = jnp.sum(B * weights[..., None], axis=-2) / wsum
    Am = A - centroid_A[..., None, :]
    Bm = B - centroid_B[..., None, :]
    H = jnp.einsum("...ni,...n,...nj->...ij", Am, weights, Bm, precision="highest")
    R = rotation_from_covariance(H)
    t = centroid_B - jnp.einsum("...ij,...j->...i", R, centroid_A, precision="highest")
    return R, t


def rigid_transform_3d(
    A: jnp.ndarray,
    B: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    weight_threshold: float = 0.0,
) -> jnp.ndarray:
    """Weighted Kabsch returning a [..., 4, 4] SE(3) matrix (reference API)."""
    R, t = weighted_kabsch(A, B, weights, weight_threshold)
    return integrate(R, t)


def kabsch_svd(
    A: jnp.ndarray, B: jnp.ndarray, weights: jnp.ndarray | None = None
):
    """SVD-based weighted Kabsch (reference numerics; cold paths & tests only).

    Mirrors Experiments/models/common.py:31-42 including the det-sign fix.
    """
    if weights is None:
        weights = jnp.ones(A.shape[:-1], dtype=A.dtype)
    wsum = jnp.sum(weights, axis=-1, keepdims=True) + 1e-6
    centroid_A = jnp.sum(A * weights[..., None], axis=-2) / wsum
    centroid_B = jnp.sum(B * weights[..., None], axis=-2) / wsum
    Am = A - centroid_A[..., None, :]
    Bm = B - centroid_B[..., None, :]
    H = jnp.einsum("...ni,...n,...nj->...ij", Am, weights, Bm, precision="highest")
    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    det = jnp.linalg.det(V @ jnp.swapaxes(U, -1, -2))
    D = jnp.zeros_like(H).at[..., 0, 0].set(1.0).at[..., 1, 1].set(1.0)
    D = D.at[..., 2, 2].set(det)
    R = V @ D @ jnp.swapaxes(U, -1, -2)
    t = centroid_B - jnp.einsum("...ij,...j->...i", R, centroid_A, precision="highest")
    return R, t
