"""Tests for the matching layer: GPF water-filling + pipeline modes."""
import numpy as np
import jax.numpy as jnp

from lidarreg.match import grid_prioritized_filter, match_pair
from lidarreg.match.gpf import _water_fill


class TestWaterFill:
    def test_uniform_cells(self):
        counts = jnp.asarray(np.full(100, 50, np.int32))
        quotas = np.asarray(_water_fill(counts, jnp.int32(1000)))
        # 1000 over 100 equally-full cells -> ~10 each
        assert abs(quotas.sum() - 1000) <= 100  # bisection tolerance (|hi-lo|<=2)
        assert (quotas <= 50).all()

    def test_skewed_cells(self):
        counts = np.zeros(100, np.int32)
        counts[0] = 10000
        counts[1:11] = 5
        quotas = np.asarray(_water_fill(jnp.asarray(counts), jnp.int32(100)))
        # small cells keep everything; the giant cell is capped
        np.testing.assert_array_equal(quotas[1:11], 5)
        assert quotas[0] <= 100

    def test_total_smaller_than_any_cell(self):
        counts = jnp.asarray(np.full(4, 1000, np.int32))
        quotas = np.asarray(_water_fill(counts, jnp.int32(40)))
        assert abs(quotas.sum() - 40) <= 8


class TestGPF:
    def _mk(self, rng, n=400, n_bb=60):
        xy = rng.uniform(0, 100, size=(n, 2)).astype(np.float32)
        fd = rng.uniform(0.1, 1.0, size=n).astype(np.float32)
        is_bb = np.zeros(n, bool)
        is_bb[rng.choice(n, n_bb, replace=False)] = True
        valid = np.ones(n, bool)
        return xy, fd, is_bb, valid

    def test_target_count(self, rng):
        xy, fd, is_bb, valid = self._mk(rng)
        keep = np.asarray(
            grid_prioritized_filter(
                jnp.asarray(xy), jnp.asarray(fd), jnp.asarray(is_bb),
                jnp.asarray(valid), grid_wid=5, gpf_factor=2.0,
            )
        )
        target = 2.0 * is_bb.sum()
        assert abs(keep.sum() - target) < 0.2 * target  # water-filling approx

    def test_bb_prioritized(self, rng):
        # in a cell with quota < count, BBs must be selected before non-BBs
        # identical coords -> bounding box collapses -> all in one cell
        xy = np.zeros((100, 2), np.float32)
        fd = np.linspace(0.1, 1.0, 100).astype(np.float32)
        is_bb = np.zeros(100, bool)
        is_bb[90:] = True  # worst feature ratios, but best-buddies
        keep = np.asarray(
            grid_prioritized_filter(
                jnp.asarray(xy), jnp.asarray(fd), jnp.asarray(is_bb),
                jnp.ones(100, dtype=bool), grid_wid=10, gpf_factor=2.0,
            )
        )
        assert keep[90:].all()  # all BBs kept first

    def test_spatial_spread(self, rng):
        # 1000 pairs crammed in one corner + 20 spread out: GPF must keep the
        # spread-out ones (per-cell quotas), unlike a global top-k.
        n = 1020
        xy = np.zeros((n, 2), np.float32)
        xy[:1000] = rng.uniform(0, 1, size=(1000, 2))
        xy[1000:, 0] = np.linspace(10, 100, 20)
        xy[1000:, 1] = np.linspace(10, 100, 20)
        fd = np.ones(n, np.float32) * 0.5
        fd[:1000] = 0.1  # corner pairs have better ratios
        is_bb = np.zeros(n, bool)
        is_bb[rng.choice(1000, 50, replace=False)] = True
        keep = np.asarray(
            grid_prioritized_filter(
                jnp.asarray(xy), jnp.asarray(fd), jnp.asarray(is_bb),
                jnp.ones(n, dtype=bool), grid_wid=10, gpf_factor=2.0,
            )
        )
        assert keep[1000:].sum() >= 15  # spread cells each have spare quota

    def test_bb_first_mode_early_return(self, rng):
        xy, fd, is_bb, valid = self._mk(rng, n_bb=30)
        keep = np.asarray(
            grid_prioritized_filter(
                jnp.asarray(xy), jnp.asarray(fd), jnp.asarray(is_bb),
                jnp.asarray(valid), bb_first=True, max_matches=10**9,
            )
        )
        np.testing.assert_array_equal(keep, is_bb)  # all BBs fit the budget

    def test_padding_never_kept(self, rng):
        xy, fd, is_bb, valid = self._mk(rng)
        valid[200:] = False
        keep = np.asarray(
            grid_prioritized_filter(
                jnp.asarray(xy), jnp.asarray(fd), jnp.asarray(is_bb),
                jnp.asarray(valid),
            )
        )
        assert not keep[200:].any()


class TestMatchPair:
    def _features(self, rng, n=256, d=16, inlier_frac=0.7):
        F1 = rng.normal(size=(n, d)).astype(np.float32)
        F1 /= np.linalg.norm(F1, axis=1, keepdims=True)
        F0 = F1 + rng.normal(size=(n, d)).astype(np.float32) * 0.05
        n_out = int(n * (1 - inlier_frac))
        F0[:n_out] = rng.normal(size=(n_out, d))
        F0 /= np.linalg.norm(F0, axis=1, keepdims=True)
        xyz0 = rng.uniform(-30, 30, size=(n, 3)).astype(np.float32)
        return F0, F1, xyz0

    def test_mnn_mode(self, rng):
        F0, F1, xyz0 = self._features(rng)
        c = match_pair(jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(xyz0), mode="MNN")
        keep = np.asarray(c.keep)
        idx1 = np.asarray(c.idx1)
        # kept pairs overwhelmingly identity matches (noise-matched features)
        agree = (idx1[keep] == np.nonzero(keep)[0]).mean()
        assert agree > 0.9
        assert keep.sum() > 100

    def test_gpf_mode_runs_jitted(self, rng):
        import jax
        F0, F1, xyz0 = self._features(rng)
        fn = jax.jit(lambda a, b, x: match_pair(a, b, x, mode="GPF"))
        c = fn(jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(xyz0))
        assert bool(c.keep.any())
        # GPF target ~= 2 x num_bb
        assert abs(int(c.keep.sum()) - 2 * int(c.is_bb.sum())) < int(c.is_bb.sum())

    def test_no_filter(self, rng):
        F0, F1, xyz0 = self._features(rng)
        c = match_pair(jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(xyz0), mode="no_filter")
        assert bool(c.keep.all())

    def test_masked_padding(self, rng):
        F0, F1, xyz0 = self._features(rng)
        m0 = np.ones(256, bool); m0[200:] = False
        m1 = np.ones(256, bool); m1[220:] = False
        c = match_pair(
            jnp.asarray(F0), jnp.asarray(F1), jnp.asarray(xyz0),
            mask0=jnp.asarray(m0), mask1=jnp.asarray(m1), mode="MNN",
        )
        assert not bool(c.keep[200:].any())
        assert np.asarray(c.idx1).max() < 220  # NN never points at padding
