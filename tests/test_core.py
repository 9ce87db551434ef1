"""Unit tests for lidarreg.core: SE(3) ops, Kabsch, metrics."""
import numpy as np
import jax.numpy as jnp
import pytest

from lidarreg.core import se3, kabsch, metrics


def random_rotation(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return np.asarray(se3.quat_to_rotation(jnp.asarray(q)))


def random_se3(rng, t_scale=10.0):
    R = random_rotation(rng)
    t = rng.normal(size=3) * t_scale
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


class TestSE3:
    def test_transform_roundtrip(self, rng):
        T = random_se3(rng)
        pts = rng.normal(size=(100, 3))
        out = np.asarray(se3.transform(jnp.asarray(pts), jnp.asarray(T)))
        expected = pts @ T[:3, :3].T + T[:3, 3]
        np.testing.assert_allclose(out, expected, atol=1e-6)

    def test_inverse(self, rng):
        T = random_se3(rng)
        inv = np.asarray(se3.inverse(jnp.asarray(T)))
        np.testing.assert_allclose(inv @ T, np.eye(4), atol=1e-6)

    def test_concatenate_matches_matmul(self, rng):
        T1, T2 = random_se3(rng), random_se3(rng)
        out = np.asarray(se3.concatenate(jnp.asarray(T1), jnp.asarray(T2)))
        np.testing.assert_allclose(out, T1 @ T2, atol=1e-6)

    def test_integrate_decompose(self, rng):
        T = random_se3(rng)
        R, t = se3.decompose(jnp.asarray(T))
        T2 = np.asarray(se3.integrate(R, t))
        np.testing.assert_allclose(T2, T, atol=1e-7)

    def test_euler_roundtrip(self, rng):
        angles = rng.uniform(-1.0, 1.0, size=3)  # within principal range
        R = se3.euler_to_rotation(jnp.asarray(angles))
        back = np.asarray(se3.rotation_to_euler(R))
        np.testing.assert_allclose(back, angles, atol=1e-6)

    def test_batched_transform(self, rng):
        Ts = np.stack([random_se3(rng) for _ in range(4)])
        pts = rng.normal(size=(4, 50, 3))
        out = np.asarray(se3.transform(jnp.asarray(pts), jnp.asarray(Ts)))
        for b in range(4):
            np.testing.assert_allclose(
                out[b], pts[b] @ Ts[b, :3, :3].T + Ts[b, :3, 3], atol=1e-6
            )


class TestKabsch:
    def test_exact_recovery(self, rng):
        T = random_se3(rng)
        A = rng.normal(size=(64, 3)) * 5
        B = A @ T[:3, :3].T + T[:3, 3]
        R, t = kabsch.weighted_kabsch(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-5)
        np.testing.assert_allclose(np.asarray(t), T[:3, 3], atol=1e-4)

    def test_three_point_minimal(self, rng):
        # The RANSAC minimal-sample case.
        T = random_se3(rng)
        A = rng.normal(size=(3, 3))
        B = A @ T[:3, :3].T + T[:3, 3]
        R, t = kabsch.weighted_kabsch(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-4)

    def test_weights_ignore_outliers(self, rng):
        T = random_se3(rng)
        A = rng.normal(size=(50, 3)) * 5
        B = A @ T[:3, :3].T + T[:3, 3]
        B_corrupt = B.copy()
        B_corrupt[:10] += rng.normal(size=(10, 3)) * 40
        w = np.ones(50)
        w[:10] = 0.0
        R, t = kabsch.weighted_kabsch(
            jnp.asarray(A), jnp.asarray(B_corrupt), jnp.asarray(w)
        )
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-5)

    def test_weight_threshold_clips(self, rng):
        # parity with rigid_transform_3d weight_threshold semantics
        T = random_se3(rng)
        A = rng.normal(size=(50, 3)) * 5
        B = A @ T[:3, :3].T + T[:3, 3]
        B_corrupt = B.copy()
        B_corrupt[:10] += 100.0
        w = np.ones(50)
        w[:10] = 0.05  # below threshold -> clipped to zero
        R, _ = kabsch.weighted_kabsch(
            jnp.asarray(A), jnp.asarray(B_corrupt), jnp.asarray(w), 0.1
        )
        np.testing.assert_allclose(np.asarray(R), T[:3, :3], atol=1e-5)

    def test_matches_svd_variant_with_noise(self, rng):
        T = random_se3(rng)
        A = rng.normal(size=(200, 3)) * 5
        B = A @ T[:3, :3].T + T[:3, 3] + rng.normal(size=(200, 3)) * 0.05
        w = rng.uniform(0.1, 1.0, size=200)
        Rq, tq = kabsch.weighted_kabsch(jnp.asarray(A), jnp.asarray(B), jnp.asarray(w))
        Rs, ts = kabsch.kabsch_svd(jnp.asarray(A), jnp.asarray(B), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(Rq), np.asarray(Rs), atol=1e-4)
        np.testing.assert_allclose(np.asarray(tq), np.asarray(ts), atol=1e-4)

    def test_batched_hypotheses(self, rng):
        # vmapped use: K hypotheses x 4 points each
        K = 128
        Ts = np.stack([random_se3(rng) for _ in range(K)])
        A = rng.normal(size=(K, 4, 3)) * 8
        B = np.einsum("kij,knj->kni", Ts[:, :3, :3], A) + Ts[:, None, :3, 3]
        R, t = kabsch.weighted_kabsch(jnp.asarray(A), jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(R), Ts[:, :3, :3], atol=1e-3)

    def test_rigid_transform_3d_shape(self, rng):
        A = rng.normal(size=(2, 30, 3))
        B = rng.normal(size=(2, 30, 3))
        T = kabsch.rigid_transform_3d(jnp.asarray(A), jnp.asarray(B))
        assert T.shape == (2, 4, 4)
        np.testing.assert_allclose(np.asarray(T[:, 3]), [[0, 0, 0, 1]] * 2, atol=1e-7)
        # rotation block is orthogonal
        R = np.asarray(T[:, :3, :3])
        np.testing.assert_allclose(
            R @ R.transpose(0, 2, 1), np.broadcast_to(np.eye(3), (2, 3, 3)), atol=1e-4
        )


class TestMetrics:
    def test_zero_error_on_identity(self, rng):
        T = random_se3(rng)
        ok, re, te = metrics.registration_success(jnp.asarray(T), jnp.asarray(T))
        assert bool(ok)
        assert float(re) < 1e-3
        assert float(te) < 1e-6

    def test_known_rotation_error(self):
        angle = np.radians(7.0)
        Tgt = np.eye(4)
        Test_ = np.eye(4)
        Test_[:3, :3] = np.asarray(
            se3.euler_to_rotation(jnp.asarray([0.0, 0.0, angle]))
        )
        ok, re, te = metrics.registration_success(
            jnp.asarray(Test_), jnp.asarray(Tgt)
        )
        assert not bool(ok)
        np.testing.assert_allclose(float(re), 7.0, atol=1e-4)

    def test_translation_threshold_boundary(self):
        Tgt = np.eye(4)
        Test_ = np.eye(4)
        Test_[:3, 3] = [0.0, 0.0, 0.59]
        ok, _, te = metrics.registration_success(jnp.asarray(Test_), jnp.asarray(Tgt))
        assert bool(ok)
        np.testing.assert_allclose(float(te), 0.59, atol=1e-6)

    def test_inlier_ratio_gt(self, rng):
        T = random_se3(rng, t_scale=2.0)
        src = rng.normal(size=(100, 3)) * 10
        tgt = src @ T[:3, :3].T + T[:3, 3]
        idx = np.arange(100)
        # half the correspondences point at wrong targets
        idx1 = idx.copy()
        idx1[:50] = (idx[:50] + 7) % 100
        r = metrics.inlier_ratio(
            jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(idx), jnp.asarray(idx1),
            jnp.asarray(T), voxel_size=0.3,
        )
        assert 0.45 <= float(r) <= 0.65  # ~50% plus accidental near-hits
