"""Multiway registration tests: pose-graph optimization, trajectory, ATE."""
import numpy as np
import jax.numpy as jnp

from lidarreg.core.se3 import euler_to_rotation
from lidarreg.multiway import (
    PoseGraphEdge,
    ate_rmse,
    multiway_register,
    optimize_pose_graph,
    read_trajectory,
    write_trajectory,
)


def ring_poses(n=8, radius=10.0):
    """GT: sensor moves around a circle, yawing along the tangent."""
    poses = []
    for k in range(n):
        a = 2 * np.pi * k / n
        T = np.eye(4)
        T[:3, :3] = np.asarray(euler_to_rotation(jnp.asarray([0.0, 0.0, a])))
        T[:3, 3] = [radius * np.cos(a), radius * np.sin(a), 0.0]
        poses.append(T)
    return poses


def rel(Ti, Tj):
    return np.linalg.inv(Ti) @ Tj


class TestPoseGraph:
    def test_noisy_odometry_with_loop_closure(self, rng):
        gt = ring_poses(8)
        edges = []
        # noisy odometry chain
        X = [np.eye(4)]
        for i in range(7):
            T = rel(gt[i], gt[i + 1]).copy()
            noise = np.eye(4)
            noise[:3, :3] = np.asarray(
                euler_to_rotation(jnp.asarray(rng.normal(0, 0.01, 3)))
            )
            noise[:3, 3] = rng.normal(0, 0.05, 3)
            T_noisy = T @ noise
            edges.append(PoseGraphEdge(i, i + 1, T_noisy, np.eye(6), False))
            X.append(X[-1] @ T_noisy)
        # exact loop closure 7 -> 0 pulls the drift back
        edges.append(PoseGraphEdge(7, 0, rel(gt[7], gt[0]), np.eye(6), True))
        # and a garbage loop edge the line process must reject
        bad = np.eye(4); bad[:3, 3] = [30.0, -20.0, 5.0]
        edges.append(PoseGraphEdge(2, 6, bad, np.eye(6), True))

        nodes, s, kept = optimize_pose_graph(np.stack(X), edges, iterations=40)

        # drift reduced: endpoint chain consistency with the loop closure
        loop_err_before = np.linalg.norm(
            (X[7] @ rel(gt[7], gt[0]))[:3, 3] - X[0][:3, 3]
        )
        loop_err_after = np.linalg.norm(
            (nodes[7] @ rel(gt[7], gt[0]))[:3, 3] - nodes[0][:3, 3]
        )
        assert loop_err_after < 0.5 * loop_err_before + 1e-3
        # the garbage edge got a low line-process weight
        assert s[-1] < s[-2]
        assert not kept[-1] or s[-1] < 0.5

    def test_perfect_graph_stays_put(self, rng):
        gt = ring_poses(5)
        edges = [
            PoseGraphEdge(i, i + 1, rel(gt[i], gt[i + 1]), np.eye(6), False)
            for i in range(4)
        ]
        nodes, _, _ = optimize_pose_graph(np.stack(gt), edges, iterations=10)
        rel_check = np.linalg.inv(nodes[0]) @ nodes[4]
        gt_check = np.linalg.inv(gt[0]) @ gt[4]
        np.testing.assert_allclose(rel_check, gt_check, atol=5e-3)


class TestTrajectory:
    def test_log_roundtrip(self, tmp_path, rng):
        poses = ring_poses(4)
        p = str(tmp_path / "traj.log")
        write_trajectory(p, poses)
        back, meta = read_trajectory(p)
        assert len(back) == 4
        np.testing.assert_allclose(back[2], poses[2], atol=1e-9)
        assert meta[0] == (0, 0, 1)

    def test_ate(self, rng):
        gt = ring_poses(10)
        # estimated = GT rigidly moved + small noise: ATE ~ noise after align
        M = np.eye(4)
        M[:3, 3] = [5.0, -2.0, 1.0]
        est = [M @ T for T in gt]
        for T in est:
            T[:3, 3] += rng.normal(0, 0.01, 3)
        rmse, err = ate_rmse(est, gt)
        assert rmse < 0.05
        assert len(err) == 10


class TestMultiwayDriver:
    def test_driver_recovers_ring(self, rng):
        gt = ring_poses(6)

        def pairwise(i, j):
            T = rel(gt[i], gt[j]).copy()
            noise = np.eye(4)
            noise[:3, 3] = rng.normal(0, 0.03, 3)
            return T @ noise, 1.0

        nodes, s, kept = multiway_register(6, pairwise, iterations=30)
        # compare relative node poses to GT (gauge-fixed at node 0)
        for k in range(6):
            got = np.linalg.inv(nodes[0]) @ nodes[k]
            exp = rel(gt[0], gt[k])
            assert np.linalg.norm(got[:3, 3] - exp[:3, 3]) < 0.2
