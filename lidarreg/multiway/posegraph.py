"""Pose-graph optimization with line-process robustness (multiway backend).

Replaces Open3D's GlobalOptimization pipeline used by the reference's
multiway experiment (Experiments/multiway/optimize_posegraph.py:13-60:
GlobalOptimization with LevenbergMarquardt convergence criteria +
GlobalOptimizationOption(max_correspondence_distance, edge_prune_threshold
0.25, preference_loop_closure)).

Formulation (Choi/Zhou/Koltun 2015, the algorithm behind o3d's optimizer):
  minimize sum_odometry |r_e|^2_Info + sum_loop s_e |r_e|^2_Info
           + mu * sum_loop Psi(s_e)
with line-process weights s_e in [0, 1] on UNCERTAIN (loop-closure) edges;
r_e = residual of measured T_ij vs X_i^-1 X_j, parametrized by a 6-dof twist
per node. Solved by fixed Gauss-Newton rounds with closed-form line-process
updates s_e = (mu / (mu + |r_e|^2))^2; edges whose converged s_e falls below
`edge_prune_threshold` are pruned (o3d option parity). Dense 6N x 6N solve —
fragment graphs are tens of nodes, trivially dense on TPU.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..core.se3 import euler_to_rotation, integrate, inverse


class PoseGraphEdge(NamedTuple):
    i: int
    j: int
    transformation: np.ndarray    # measured T_ij mapping j-frame into i-frame
    information: np.ndarray       # 6x6 (identity-scaled is fine)
    uncertain: bool               # True = loop closure (line process applies)


def _so3_log(R: jnp.ndarray) -> jnp.ndarray:
    """Rotation log map (axis-angle vector), batched."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) * 0.5, -1.0 + 1e-7, 1.0 - 1e-7)
    theta = jnp.arccos(cos)
    w = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    scale = theta / jnp.maximum(2.0 * jnp.sin(theta), 1e-9)
    return w * scale[..., None]


def _edge_residual(Xi, Xj, Tij):
    """6-vector residual of one edge: log(T_ij^-1 X_i^-1 X_j)."""
    E = jnp.linalg.multi_dot([inverse(Tij), inverse(Xi), Xj],
                             precision="highest")
    return jnp.concatenate([_so3_log(E[:3, :3]), E[:3, 3]])


def optimize_pose_graph(
    nodes: np.ndarray,            # [N, 4, 4] initial absolute poses
    edges: list[PoseGraphEdge],
    iterations: int = 30,
    mu: float = 1.0,
    edge_prune_threshold: float = 0.25,   # o3d option default
    damping: float = 1e-4,
):
    """Returns (optimized nodes [N,4,4], final line-process weights [E])."""
    n = len(nodes)
    e = len(edges)
    idx_i = jnp.asarray([ed.i for ed in edges])
    idx_j = jnp.asarray([ed.j for ed in edges])
    T_meas = jnp.asarray(np.stack([ed.transformation for ed in edges]),
                         dtype=jnp.float32)
    info = jnp.asarray(np.stack([ed.information for ed in edges]),
                       dtype=jnp.float32)
    uncertain = jnp.asarray([ed.uncertain for ed in edges])

    X0 = jnp.asarray(np.stack(nodes), dtype=jnp.float32)

    def residuals(X):
        def one(k):
            return _edge_residual(X[idx_i[k]], X[idx_j[k]], T_meas[k])
        return jax.vmap(one)(jnp.arange(e))

    def gn_step(X, s):
        # Jacobians by autodiff through per-node twist perturbations.
        def r_of_twists(tw):
            def apply_twist(Xk, t):
                dR = euler_to_rotation(t[:3])  # small-angle
                return integrate(
                    jnp.matmul(dR, Xk[:3, :3], precision="highest"),
                    jnp.matmul(dR, Xk[:3, 3], precision="highest") + t[3:])
            Xp = jax.vmap(apply_twist)(X, tw.reshape(n, 6))
            return residuals(Xp).reshape(-1)

        tw0 = jnp.zeros(n * 6)
        J = jax.jacfwd(r_of_twists)(tw0).reshape(e, 6, n * 6)
        r = residuals(X)                                     # [E, 6]
        w_e = jnp.where(uncertain, s, 1.0)[:, None, None]    # line process
        W = info * w_e                                       # [E, 6, 6]
        A = jnp.einsum("eai,eab,ebj->ij", J, W, J)
        b = jnp.einsum("eai,eab,eb->i", J, W, r)
        # gauge fix: pin node 0
        mask = jnp.ones(n * 6).at[:6].set(0.0)
        A = A * mask[:, None] * mask[None, :] + jnp.diag(1.0 - mask)
        b = b * mask
        A = A + damping * jnp.eye(n * 6)
        delta = -jnp.linalg.solve(A, b)

        def apply_twist(Xk, t):
            dR = euler_to_rotation(t[:3])
            return integrate(
                jnp.matmul(dR, Xk[:3, :3], precision="highest"),
                jnp.matmul(dR, Xk[:3, 3], precision="highest") + t[3:])

        X_new = jax.vmap(apply_twist)(X, delta.reshape(n, 6))
        # closed-form line-process update on loop edges
        r_new = residuals(X_new)
        cost = jnp.einsum("ea,eab,eb->e", r_new, info, r_new)
        s_new = (mu / (mu + cost)) ** 2
        s_new = jnp.where(uncertain, s_new, 1.0)
        return X_new, s_new

    def body(_, carry):
        X, s = carry
        return gn_step(X, s)

    X, s = lax.fori_loop(
        0, iterations, body, (X0, jnp.ones(e, dtype=jnp.float32))
    )
    pruned = np.asarray(s) >= edge_prune_threshold
    return np.asarray(X), np.asarray(s), pruned
