"""Native C++ max-clique tests (exact PMC replacement)."""
import numpy as np
import itertools

from lidarreg.native import max_clique


def brute_force_max_clique(adj):
    n = adj.shape[0]
    best = []
    for r in range(n, 0, -1):
        for combo in itertools.combinations(range(n), r):
            if all(adj[a, b] for a, b in itertools.combinations(combo, 2)):
                return list(combo)
    return best


class TestMaxClique:
    def test_matches_bruteforce_small(self, rng):
        for trial in range(10):
            n = 12
            adj = rng.uniform(size=(n, n)) < 0.5
            adj = adj | adj.T
            np.fill_diagonal(adj, False)
            got = max_clique(adj)
            exp = brute_force_max_clique(adj)
            assert len(got) == len(exp), f"trial {trial}: {got} vs {exp}"
            assert all(adj[a, b] for a, b in itertools.combinations(got, 2))

    def test_planted_clique(self, rng):
        n = 200
        adj = rng.uniform(size=(n, n)) < 0.1
        adj = adj | adj.T
        members = rng.choice(n, 20, replace=False)
        adj[np.ix_(members, members)] = True
        np.fill_diagonal(adj, False)
        got = max_clique(adj)
        assert set(members) <= set(got.tolist()) or len(got) >= 20

    def test_empty_graph(self):
        adj = np.zeros((5, 5), bool)
        got = max_clique(adj)
        assert len(got) == 1  # single vertex is a clique

    def test_complete_graph(self):
        n = 30
        adj = np.ones((n, n), bool)
        np.fill_diagonal(adj, False)
        got = max_clique(adj)
        assert len(got) == n


class TestGraphCutLO:
    """gc_local_optimize: the GC-RANSAC LO oracle (native/gc_local_opt.cpp)."""

    def _problem(self, seed=0, n=600, inlier_frac=0.5, noise=0.03):
        rng = np.random.default_rng(seed)
        src = rng.uniform(-40, 40, (n, 3))
        ang = np.radians(25.0)
        R = np.array([
            [np.cos(ang), -np.sin(ang), 0],
            [np.sin(ang), np.cos(ang), 0],
            [0, 0, 1.0],
        ])
        t = np.array([5.0, -2.0, 0.4])
        dst = src @ R.T + t
        n_in = int(n * inlier_frac)
        dst[:n_in] += rng.normal(0, noise, (n_in, 3))
        dst[n_in:] = rng.uniform(-40, 40, (n - n_in, 3))  # outliers
        T = np.eye(4)
        T[:3, :3] = R
        T[:3, 3] = t
        return src, dst, T, n_in

    def test_recovers_pose_from_perturbed_init(self):
        from lidarreg.native import gc_local_optimize

        src, dst, T_gt, n_in = self._problem()
        # perturb the init by ~2 deg / 0.3 m — a coarse RANSAC winner
        d = np.radians(2.0)
        Rp = np.array([
            [np.cos(d), -np.sin(d), 0],
            [np.sin(d), np.cos(d), 0],
            [0, 0, 1.0],
        ])
        T0 = T_gt.copy()
        T0[:3, :3] = Rp @ T_gt[:3, :3]
        T0[:3, 3] += np.array([0.3, -0.2, 0.1])

        pose, labels, count = gc_local_optimize(src, dst, T0, threshold=0.6)
        t_err = np.linalg.norm(pose[:3, 3] - T_gt[:3, 3])
        cosang = (np.trace(pose[:3, :3] @ T_gt[:3, :3].T) - 1) / 2
        assert t_err < 0.05, t_err
        assert cosang > np.cos(np.radians(0.5))
        # all true inliers recovered, no false ones beyond noise
        assert count >= n_in * 0.98
        assert labels[:n_in].mean() > 0.98

    def test_spatial_coherence_cut_runs(self):
        from lidarreg.native import gc_local_optimize

        src, dst, T_gt, n_in = self._problem(seed=1)
        pose, labels, count = gc_local_optimize(
            src, dst, T_gt, threshold=0.6,
            spatial_coherence_weight=0.975, neighborhood_radius=20.0,
        )
        t_err = np.linalg.norm(pose[:3, 3] - T_gt[:3, 3])
        assert t_err < 0.05, t_err
        assert count >= n_in * 0.95

    def test_lambda_zero_equals_threshold_labeling(self):
        """lambda=0 labeling == per-point residual thresholding at
        sqrt(sq_trunc/2) — the degeneracy that makes the reference's
        default (spatial_coherence_weight=0.0) equal iterated-LS."""
        from lidarreg.native import gc_local_optimize

        src, dst, T_gt, n_in = self._problem(seed=2, noise=0.0)
        pose, labels, _ = gc_local_optimize(
            src, dst, T_gt, threshold=0.6, max_lo_iters=1,
        )
        resid = np.linalg.norm(src @ pose[:3, :3].T + pose[:3, 3] - dst,
                               axis=1)
        np.testing.assert_array_equal(labels, resid < 0.6)
