"""Unit tests for lidarreg.ops: voxelize, kNN, mutual-NN."""
import numpy as np
import jax.numpy as jnp

from lidarreg.ops import voxelize as vx
from lidarreg.ops import knn as knn_mod


class TestVoxelize:
    def test_matches_numpy_unique(self, rng):
        xyz = rng.uniform(-20, 20, size=(5000, 3)).astype(np.float32)
        vs = 0.3
        res = vx.voxelize(jnp.asarray(xyz), vs, capacity=8192)
        n = int(res.count)
        got_coords = np.asarray(res.coords[:n])
        got_idx = np.asarray(res.indices[:n])

        q = np.floor(xyz / vs).astype(np.int32)
        _, first_idx = np.unique(q, axis=0, return_index=True)
        expected = {tuple(q[i]): i for i in first_idx}
        assert n == len(expected)
        for c, i in zip(got_coords, got_idx):
            assert expected[tuple(c)] == i  # first-occurrence semantics

    def test_capacity_truncation(self, rng):
        xyz = rng.uniform(-20, 20, size=(1000, 3)).astype(np.float32)
        res = vx.voxelize(jnp.asarray(xyz), 0.1, capacity=64)
        assert int(res.count) == 64
        assert bool(res.valid.all())

    def test_mask_excludes_points(self, rng):
        xyz = rng.uniform(-5, 5, size=(200, 3)).astype(np.float32)
        mask = np.zeros(200, dtype=bool)
        mask[:50] = True
        res = vx.voxelize(jnp.asarray(xyz), 0.05, capacity=256, mask=jnp.asarray(mask))
        kept = np.asarray(res.indices[: int(res.count)])
        assert kept.max() < 50  # only unmasked points selected

    def test_single_voxel(self):
        xyz = np.zeros((10, 3), dtype=np.float32) + 0.01
        res = vx.voxelize(jnp.asarray(xyz), 1.0, capacity=4)
        assert int(res.count) == 1
        assert int(res.indices[0]) == 0

    def test_centroid_downsample(self, rng):
        xyz = np.array(
            [[0.1, 0.1, 0.1], [0.3, 0.3, 0.3], [5.1, 5.1, 5.1]], dtype=np.float32
        )
        pts, valid, count = vx.voxel_down_sample(jnp.asarray(xyz), 1.0, capacity=8)
        assert int(count) == 2
        got = np.asarray(pts[:2])
        np.testing.assert_allclose(sorted(got[:, 0]), [0.2, 5.1], atol=1e-6)

    def test_segment_ids(self, rng):
        xyz = rng.uniform(-3, 3, size=(500, 3)).astype(np.float32)
        q = vx.quantize_coords(jnp.asarray(xyz), 0.5)
        seg, nseg = vx.unique_coords_segment_ids(q)
        seg = np.asarray(seg)
        qn = np.asarray(q)
        # same voxel -> same segment; different voxel -> different segment
        for s in np.unique(seg):
            members = qn[seg == s]
            assert (members == members[0]).all()
        assert int(nseg) == len(np.unique(qn, axis=0))


class TestKNN:
    def test_matches_bruteforce(self, rng):
        F0 = rng.normal(size=(300, 32)).astype(np.float32)
        F1 = rng.normal(size=(450, 32)).astype(np.float32)
        res = knn_mod.find_nn(jnp.asarray(F0), jnp.asarray(F1), return_2nd=True,
                              row_tile=128)
        d = np.linalg.norm(F0[:, None] - F1[None], axis=-1)
        exp1 = d.argmin(axis=1)
        np.testing.assert_array_equal(np.asarray(res.idx), exp1)
        d2 = d.copy()
        d2[np.arange(300), exp1] = np.inf
        np.testing.assert_array_equal(np.asarray(res.idx2), d2.argmin(axis=1))
        np.testing.assert_allclose(
            np.asarray(res.dist), d.min(axis=1), rtol=1e-4, atol=1e-4
        )

    def test_col_mask(self, rng):
        F0 = rng.normal(size=(50, 8)).astype(np.float32)
        F1 = rng.normal(size=(80, 8)).astype(np.float32)
        mask1 = np.ones(80, dtype=bool)
        mask1[40:] = False
        res = knn_mod.find_nn(jnp.asarray(F0), jnp.asarray(F1), mask1=jnp.asarray(mask1))
        assert np.asarray(res.idx).max() < 40

    def test_mutual_nn(self, rng):
        # construct a case with known best buddies
        F1 = rng.normal(size=(100, 16)).astype(np.float32)
        perm = rng.permutation(100)
        F0 = F1[perm] + rng.normal(size=(100, 16)).astype(np.float32) * 1e-3
        r01 = knn_mod.find_nn(jnp.asarray(F0), jnp.asarray(F1))
        r10 = knn_mod.find_nn(jnp.asarray(F1), jnp.asarray(F0))
        keep = knn_mod.mutual_nn_mask(r01.idx, r10.idx)
        assert bool(keep.all())  # perfect bijection -> all mutual
        np.testing.assert_array_equal(np.asarray(r01.idx), perm)

    def test_mutual_nn_rejects_many_to_one(self, rng):
        F1 = np.array([[0.0, 0], [10.0, 0]], dtype=np.float32)
        F0 = np.array([[0.1, 0], [0.2, 0], [9.9, 0]], dtype=np.float32)
        r01 = knn_mod.find_nn(jnp.asarray(F0), jnp.asarray(F1))
        r10 = knn_mod.find_nn(jnp.asarray(F1), jnp.asarray(F0))
        keep = np.asarray(knn_mod.mutual_nn_mask(r01.idx, r10.idx))
        # F0[0] and F0[1] both map to F1[0]; only F0[0] (F1[0]'s NN) survives
        np.testing.assert_array_equal(keep, [True, False, True])

    def test_feature_distance_ratio(self, rng):
        F0 = np.array([[0.0, 0.0]], dtype=np.float32)
        F1 = np.array([[1.0, 0.0], [2.0, 0.0]], dtype=np.float32)
        r = knn_mod.feature_distance_ratio(
            jnp.asarray(F0), jnp.asarray(F1),
            jnp.asarray([0]), jnp.asarray([0]), jnp.asarray([1]),
        )
        np.testing.assert_allclose(float(r[0]), 0.5, atol=1e-5)

    def test_knn_graph(self, rng):
        F = rng.normal(size=(1, 60, 8)).astype(np.float32)
        idx = np.asarray(knn_mod.knn_graph(jnp.asarray(F), k=5, ignore_self=True))
        d = np.linalg.norm(F[0][:, None] - F[0][None], axis=-1)
        np.fill_diagonal(d, np.inf)
        exp = np.argsort(d, axis=1)[:, :5]
        assert (np.sort(idx[0], axis=1) == np.sort(exp, axis=1)).all()
        assert not (idx[0] == np.arange(60)[:, None]).any()  # no self loops

    def test_odd_sizes_padding(self, rng):
        # N0 not a multiple of the tile
        F0 = rng.normal(size=(37, 4)).astype(np.float32)
        F1 = rng.normal(size=(53, 4)).astype(np.float32)
        res = knn_mod.find_nn(jnp.asarray(F0), jnp.asarray(F1), row_tile=16)
        d = np.linalg.norm(F0[:, None] - F1[None], axis=-1)
        np.testing.assert_array_equal(np.asarray(res.idx), d.argmin(axis=1))


class TestPallasKNN:
    def test_matches_jnp_interpret(self, rng):
        import jax
        from lidarreg.ops.pallas_knn import knn_top2_pallas

        F0 = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
        F1 = jnp.asarray(rng.normal(size=(700, 16)).astype(np.float32))
        mask1 = np.ones(700, bool)
        mask1[600:] = False
        i1, d1, i2, d2 = knn_top2_pallas(
            F0, F1, jnp.asarray(mask1), True  # interpret mode (CPU tests)
        )
        ref = knn_mod.find_nn(F0, F1, mask1=jnp.asarray(mask1), return_2nd=True)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(ref.idx))
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(ref.idx2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(ref.dist), atol=1e-4)
        assert np.asarray(i1).max() < 600  # padding never matched

    def test_backend_switch(self, rng):
        F0 = jnp.asarray(rng.normal(size=(128, 8)).astype(np.float32))
        F1 = jnp.asarray(rng.normal(size=(256, 8)).astype(np.float32))
        import jax
        if jax.default_backend() == "cpu":
            return  # compiled pallas path is TPU-only; interpret covered above
        a = knn_mod.find_nn(F0, F1, return_2nd=True, backend="pallas")
        b = knn_mod.find_nn(F0, F1, return_2nd=True)
        np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))


class TestPallasBidirKNN:
    def test_matches_jnp_interpret(self, rng):
        from lidarreg.ops.pallas_knn import knn_bidir_pallas

        F0 = jnp.asarray(rng.normal(size=(300, 16)).astype(np.float32))
        F1 = jnp.asarray(rng.normal(size=(700, 16)).astype(np.float32))
        mask0 = np.ones(300, bool)
        mask0[250:] = False
        mask1 = np.ones(700, bool)
        mask1[600:] = False
        i1, d1, i2, d2, bi, bd = knn_bidir_pallas(
            F0, F1, jnp.asarray(mask0), jnp.asarray(mask1), True  # interpret
        )
        ref, bwd_ref = knn_mod.find_nn_bidirectional(
            F0, F1, mask0=jnp.asarray(mask0), mask1=jnp.asarray(mask1),
            backend="jnp",
        )
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(ref.idx))
        np.testing.assert_array_equal(np.asarray(i2), np.asarray(ref.idx2))
        np.testing.assert_allclose(np.asarray(d1), np.asarray(ref.dist),
                                   atol=1e-4)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(ref.dist2),
                                   atol=1e-4)
        np.testing.assert_array_equal(np.asarray(bi), np.asarray(bwd_ref))
        assert np.asarray(i1).max() < 600      # padding never matched fwd
        assert np.asarray(bi).max() < 250      # invalid F0 rows never matched

    def test_bidir_vs_two_calls(self, rng):
        """jnp bidirectional == two find_nn calls (incl. backward)."""
        F0 = jnp.asarray(rng.normal(size=(130, 8)).astype(np.float32))
        F1 = jnp.asarray(rng.normal(size=(90, 8)).astype(np.float32))
        m0 = jnp.asarray(rng.random(130) > 0.2)
        m1 = jnp.asarray(rng.random(90) > 0.2)
        fwd, bwd = knn_mod.find_nn_bidirectional(
            F0, F1, mask0=m0, mask1=m1, row_tile=32, backend="jnp"
        )
        fr = knn_mod.find_nn(F0, F1, mask1=m1, return_2nd=True)
        br = knn_mod.find_nn(F1, F0, mask1=m0)
        np.testing.assert_array_equal(np.asarray(fwd.idx), np.asarray(fr.idx))
        np.testing.assert_array_equal(np.asarray(fwd.idx2), np.asarray(fr.idx2))
        np.testing.assert_array_equal(np.asarray(bwd), np.asarray(br.idx))
