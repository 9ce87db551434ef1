"""Tests: normals, BBR-F, symmetric ICP, TEASER-GNC."""
import numpy as np
import jax
import jax.numpy as jnp

from lidarreg.core import registration_success
from lidarreg.core.se3 import euler_to_rotation
from lidarreg.solvers.refinement import bbr_f, estimate_normals, symmetric_icp
from lidarreg.solvers.icp import icp_point_to_point
from lidarreg.solvers.teaser import TeaserConfig, teaser_register


def make_scene(rng, n=3000):
    """Planar ground + two walls (well-constrained for point-to-plane)."""
    g = np.c_[rng.uniform(-20, 20, (n // 2, 2)), rng.normal(0, 0.01, (n // 2, 1))]
    w1 = np.c_[rng.normal(5, 0.01, (n // 4, 1)), rng.uniform(-10, 10, (n // 4, 1)),
               rng.uniform(0, 4, (n // 4, 1))]
    w2 = np.c_[rng.uniform(-10, 10, (n // 4, 1)), rng.normal(-7, 0.01, (n // 4, 1)),
               rng.uniform(0, 4, (n // 4, 1))]
    return np.vstack([g, w1, w2]).astype(np.float32)


def small_motion(rng):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = np.asarray(
        euler_to_rotation(jnp.asarray(np.radians([0.3, -0.2, 1.5])))
    )
    T[:3, 3] = [0.25, -0.15, 0.05]
    return T


class TestNormals:
    def test_plane_normals(self, rng):
        pts = np.c_[rng.uniform(-5, 5, (500, 2)), np.zeros((500, 1))].astype(np.float32)
        nrm = np.asarray(estimate_normals(jnp.asarray(pts), jnp.ones(500, bool), radius=1.0))
        # normals of a z=0 plane are +-z
        assert (np.abs(nrm[:, 2]) > 0.99).mean() > 0.95

    def test_padding_zeroed(self, rng):
        pts = rng.uniform(-5, 5, (100, 3)).astype(np.float32)
        v = np.ones(100, bool)
        v[50:] = False
        nrm = np.asarray(estimate_normals(jnp.asarray(pts), jnp.asarray(v)))
        assert (nrm[50:] == 0).all()


class TestSymmetricICP:
    def test_refines_small_motion(self, rng):
        scene = make_scene(rng)
        T = small_motion(rng)
        src = (scene @ np.linalg.inv(T)[:3, :3].T + np.linalg.inv(T)[:3, 3]).astype(np.float32)
        v = jnp.ones(len(scene), bool)
        T_est = symmetric_icp(jnp.asarray(src), v, jnp.asarray(scene), v,
                              jnp.eye(4))
        ok, re, te = registration_success(T_est, jnp.asarray(T))
        assert bool(ok), f"RE={float(re):.3f} TE={float(te):.3f}"
        assert float(te) < 0.1

    def test_does_not_diverge_at_optimum(self, rng):
        scene = make_scene(rng)
        v = jnp.ones(len(scene), bool)
        T_est = symmetric_icp(jnp.asarray(scene), v, jnp.asarray(scene), v,
                              jnp.eye(4))
        _, re, te = registration_success(T_est, jnp.eye(4))
        assert float(re) < 0.1 and float(te) < 0.02


class TestBBRF:
    def test_refines_small_motion(self, rng):
        scene = make_scene(rng, n=2000)
        T = small_motion(rng)
        inv = np.linalg.inv(T)
        src = (scene @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
        v = jnp.ones(len(scene), bool)
        T0 = np.eye(4, dtype=np.float32)
        T_est = bbr_f(jnp.asarray(src), v, jnp.asarray(scene), v, 100)
        # BBR-F's tiny lr means partial convergence (reference behavior);
        # require clear improvement over identity
        _, re0, te0 = registration_success(jnp.asarray(T0), jnp.asarray(T))
        _, re1, te1 = registration_success(T_est, jnp.asarray(T))
        assert float(te1) < float(te0)
        assert float(re1) <= float(re0) + 1e-3


class TestTeaser:
    def test_registers_with_outliers(self, rng):
        n = 512
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(euler_to_rotation(jnp.asarray([0.05, -0.02, 0.9])))
        T[:3, 3] = [4.0, -2.0, 0.3]
        src = rng.uniform(-40, 40, (n, 3)).astype(np.float32)
        tgt = (src @ T[:3, :3].T + T[:3, 3]).astype(np.float32)
        out = rng.choice(n, int(n * 0.6), replace=False)
        tgt[out] = rng.uniform(-40, 40, (len(out), 3))
        tgt += rng.normal(0, 0.02, (n, 3)).astype(np.float32)
        res = teaser_register(
            jnp.asarray(src), jnp.asarray(tgt), jnp.ones(n, bool),
            TeaserConfig(noise_bound=0.3),
        )
        ok, re, te = registration_success(res.transform, jnp.asarray(T))
        assert bool(ok), f"RE={float(re):.3f} TE={float(te):.3f}"
        # clique mostly true inliers
        clique = np.asarray(res.clique_mask)
        is_inl = np.ones(n, bool)
        is_inl[out] = False
        assert (clique & is_inl).sum() / max(clique.sum(), 1) > 0.9

    def test_jittable(self, rng):
        n = 256
        src = jnp.asarray(rng.uniform(-20, 20, (n, 3)).astype(np.float32))
        tgt = src + jnp.asarray([1.0, 0.0, 0.0])
        f = jax.jit(lambda a, b: teaser_register(a, b, jnp.ones(n, bool)))
        res = f(src, tgt)
        ok, _, te = registration_success(
            res.transform,
            jnp.asarray(np.diag([1.0, 1, 1, 1]).astype(np.float32)).at[0, 3].set(1.0),
        )
        assert bool(ok)


class TestICPCompare:
    def test_icp_also_converges_on_scene(self, rng):
        scene = make_scene(rng)
        T = small_motion(rng)
        inv = np.linalg.inv(T)
        src = (scene @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
        v = jnp.ones(len(scene), bool)
        T_est = icp_point_to_point(jnp.asarray(src), v, jnp.asarray(scene), v,
                                   jnp.eye(4), 0.6, 15)
        ok, re, te = registration_success(T_est, jnp.asarray(T))
        assert bool(ok)


class TestDegenerateMasks:
    """Finite-output guarantees on all-invalid masks (production hardening;
    the reference's equivalents are its try/except + identity fallbacks,
    TEASER_plus_plus.py:16-59)."""

    def test_teaser_empty_valid_stays_finite(self, rng):
        from lidarreg.solvers.teaser import teaser_register

        src = jnp.asarray(rng.uniform(-20, 20, (256, 3)).astype(np.float32))
        res = teaser_register(src, src + 3.0, jnp.zeros(256, bool))
        assert np.all(np.isfinite(np.asarray(res.transform)))

    def test_icp_empty_valid_returns_init(self, rng):
        from lidarreg.solvers.icp import icp_point_to_point

        src = jnp.asarray(rng.uniform(-20, 20, (256, 3)).astype(np.float32))
        empty = jnp.zeros(256, bool)
        T = np.asarray(icp_point_to_point(src, empty, src + 3.0, empty,
                                          jnp.eye(4)))
        np.testing.assert_allclose(T, np.eye(4), atol=1e-6)
