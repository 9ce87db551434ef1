"""Trajectory IO (.log format) + ATE evaluation + multiway driver.

Parity targets:
  * trajectory .log read/write — the Redwood/3DMatch camera-trajectory
    format used by Experiments/evaluation/benchmark_utils_predator.py
    (read_trajectory/write_trajectory) and Experiments/multiway/trajectory.py:
    per pose a metadata line "i j k" + 4 lines of the 4x4 matrix;
  * ATE evaluation — Experiments/multiway/test_multi_ate.py: align the
    estimated trajectory to GT with Umeyama/Kabsch, report RMSE of
    translation errors;
  * multiway registration driver — Experiments/multiway/test_multi.py:
    register consecutive fragments (odometry edges) + all loop-closure
    candidates (uncertain edges), optimize the pose graph.
"""
from __future__ import annotations

from typing import Callable, Sequence

import numpy as np

from ..core.kabsch import kabsch_svd
from .posegraph import PoseGraphEdge, optimize_pose_graph


def write_trajectory(path: str, poses: Sequence[np.ndarray], meta=None):
    with open(path, "w") as f:
        for k, T in enumerate(poses):
            m = meta[k] if meta is not None else (k, k, k + 1)
            f.write(f"{m[0]}\t{m[1]}\t{m[2]}\n")
            for row in np.asarray(T):
                f.write("\t".join(f"{x:.12f}" for x in row) + "\n")


def read_trajectory(path: str):
    poses, meta = [], []
    with open(path) as f:
        lines = [ln for ln in f.read().splitlines() if ln.strip()]
    for k in range(0, len(lines), 5):
        meta.append(tuple(int(x) for x in lines[k].split()))
        poses.append(
            np.asarray([[float(x) for x in lines[k + 1 + r].split()]
                        for r in range(4)])
        )
    return poses, meta


def ate_rmse(est_poses: Sequence[np.ndarray], gt_poses: Sequence[np.ndarray]):
    """Absolute trajectory error after rigid alignment of the two paths."""
    import jax.numpy as jnp

    est_t = np.asarray([T[:3, 3] for T in est_poses], np.float32)
    gt_t = np.asarray([T[:3, 3] for T in gt_poses], np.float32)
    R, t = kabsch_svd(jnp.asarray(est_t[None]), jnp.asarray(gt_t[None]))
    aligned = est_t @ np.asarray(R[0]).T + np.asarray(t[0])
    err = np.linalg.norm(aligned - gt_t, axis=1)
    return float(np.sqrt((err**2).mean())), err


def multiway_register(
    n_fragments: int,
    pairwise_register: Callable[[int, int], tuple[np.ndarray, float]],
    loop_candidates: Sequence[tuple[int, int]] | None = None,
    odometry_information: float = 1.0,
    loop_information: float = 1.0,
    **opt_kwargs,
):
    """Full multiway pipeline (test_multi.py structure).

    pairwise_register(i, j) -> (T_ij mapping j into i, fitness in [0, 1]).
    Odometry edges connect consecutive fragments (certain); loop candidates
    (default: all non-adjacent pairs) become uncertain edges subject to the
    line process. Returns (absolute poses [N,4,4], edge weights, kept mask).
    """
    edges = []
    odometry = [np.eye(4)]
    for i in range(n_fragments - 1):
        T, _ = pairwise_register(i, i + 1)
        edges.append(PoseGraphEdge(
            i, i + 1, T, odometry_information * np.eye(6), False
        ))
        odometry.append(odometry[-1] @ T)

    if loop_candidates is None:
        loop_candidates = [
            (i, j) for i in range(n_fragments) for j in range(i + 2, n_fragments)
        ]
    for (i, j) in loop_candidates:
        T, fitness = pairwise_register(i, j)
        if fitness > 0:
            edges.append(PoseGraphEdge(
                i, j, T, fitness * loop_information * np.eye(6), True
            ))

    nodes0 = np.stack(odometry)
    return optimize_pose_graph(nodes0, edges, **opt_kwargs)
