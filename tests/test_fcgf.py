"""Tests for the FCGF sparse U-Net."""
import numpy as np
import jax
import jax.numpy as jnp

from lidarreg.models.fcgf import ResUNetBN2C
from lidarreg.sparse import SparseTensor
from lidarreg.ops import voxelize_points


def make_input(rng, n_pts=3000, cap=2048, voxel=0.3):
    pts = rng.uniform(-15, 15, size=(n_pts, 3)).astype(np.float32)
    res = voxelize_points(jnp.asarray(pts), voxel, cap)
    coords = res.coords
    feats = jnp.ones((cap, 1), jnp.float32) * res.valid[:, None]
    return SparseTensor(coords, feats, res.valid, 1)


MODEL = ResUNetBN2C()


class TestResUNetBN2C:
    def test_forward_shapes_and_norm(self, rng):
        x = make_input(rng)
        variables = MODEL.init(jax.random.PRNGKey(0), x, train=False)
        out = MODEL.apply(variables, x, train=False)
        assert out.feats.shape == (x.capacity, 32)
        f = np.asarray(out.feats)
        v = np.asarray(out.valid)
        norms = np.linalg.norm(f[v], axis=1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-3)  # L2-normalized
        assert (np.abs(f[~v]).max() if (~v).any() else 0.0) == 0.0

    def test_translation_equivariance(self, rng):
        # FCGF on voxel coords: shifting all coords by a constant voxel offset
        # must not change features (conv is translation equivariant).
        x = make_input(rng)
        variables = MODEL.init(jax.random.PRNGKey(0), x, train=False)
        out1 = MODEL.apply(variables, x, train=False)
        x_shift = x.replace(coords=x.coords + jnp.asarray([[40, -24, 8]], jnp.int32))
        out2 = MODEL.apply(variables, x_shift, train=False)
        v = np.asarray(x.valid)
        np.testing.assert_allclose(
            np.asarray(out1.feats)[v], np.asarray(out2.feats)[v], atol=2e-3
        )

    def test_padding_invariance(self, rng):
        # same cloud at two capacities -> same features for real voxels
        pts = rng.uniform(-10, 10, size=(700, 3)).astype(np.float32)
        r1 = voxelize_points(jnp.asarray(pts), 0.3, 1024)
        r2 = voxelize_points(jnp.asarray(pts), 0.3, 2048)
        n = int(r1.count)
        assert int(r2.count) == n
        x1 = SparseTensor(r1.coords, jnp.ones((1024, 1)) * r1.valid[:, None], r1.valid, 1)
        x2 = SparseTensor(r2.coords, jnp.ones((2048, 1)) * r2.valid[:, None], r2.valid, 1)
        # full capacity at every level: capacity-loss truncation would break
        # the invariance this test asserts
        model = ResUNetBN2C(level_capacity_div=(1, 1, 1, 1))
        variables = model.init(jax.random.PRNGKey(0), x1, train=False)
        o1 = model.apply(variables, x1, train=False)
        o2 = model.apply(variables, x2, train=False)
        # voxel order identical (lexsorted), so rows align
        np.testing.assert_allclose(
            np.asarray(o1.feats)[:n], np.asarray(o2.feats)[:n], atol=2e-3
        )

    def test_train_mode_updates_stats(self, rng):
        x = make_input(rng, n_pts=800, cap=512)
        variables = MODEL.init(jax.random.PRNGKey(0), x, train=False)
        out, mutated = MODEL.apply(
            variables, x, train=True, mutable=["batch_stats"]
        )
        before = jax.tree_util.tree_leaves(variables["batch_stats"])
        after = jax.tree_util.tree_leaves(mutated["batch_stats"])
        changed = any(
            not np.allclose(np.asarray(a), np.asarray(b))
            for a, b in zip(before, after)
        )
        assert changed

    def test_jit_and_grad(self, rng):
        x = make_input(rng, n_pts=800, cap=512)
        variables = MODEL.init(jax.random.PRNGKey(0), x, train=False)

        @jax.jit
        def loss_fn(params):
            out = MODEL.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, train=False,
            )
            return jnp.sum(out.feats**2)

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).max()) > 0 for l in leaves)


class TestPairBatchedForward:
    def test_pair_forward_matches_single(self, rng):
        """One batched pair forward == two single forwards, voxel for voxel."""
        import jax
        from lidarreg.data.pipeline import (
            prepare_pair_sparse_input, prepare_sparse_input,
        )
        from lidarreg.models.fcgf import ResUNetBN2C

        # sizes chosen so every U-Net level fits its capacity in BOTH the
        # single and pair configurations (capacity overflow drops voxels
        # and would differ between them)
        cap = 1024
        cloud_a = rng.uniform(-10, 10, (800, 3)).astype(np.float32)
        cloud_b = rng.uniform(-10, 10, (700, 3)).astype(np.float32)
        model = ResUNetBN2C(
            channels=(0, 8, 16, 16, 32), tr_channels=(0, 8, 8, 8, 16),
            out_channels=8, conv1_kernel_size=3, compute_dtype=None,
        )
        st_a, xyz_a = prepare_sparse_input(jnp.asarray(cloud_a), 0.3, cap)
        st_b, xyz_b = prepare_sparse_input(jnp.asarray(cloud_b), 0.3, cap)
        params = model.init(jax.random.PRNGKey(0), st_a, train=False)
        f_a = model.apply(params, st_a, train=False)
        f_b = model.apply(params, st_b, train=False)

        st, pxa, pxb = prepare_pair_sparse_input(
            jnp.asarray(cloud_a), jnp.asarray(cloud_b), 0.3, cap
        )
        fp = model.apply(params, st, train=False)
        np.testing.assert_array_equal(np.asarray(pxa), np.asarray(xyz_a))
        np.testing.assert_array_equal(np.asarray(pxb), np.asarray(xyz_b))
        va = np.asarray(st_a.valid)
        vb = np.asarray(st_b.valid)
        np.testing.assert_array_equal(np.asarray(fp.valid[:cap]), va)
        np.testing.assert_array_equal(np.asarray(fp.valid[cap:]), vb)
        # layer 1 is bit-exact (see sparse tests); deeper layers pick up
        # f32 reassociation from the 2x-shaped einsum tilings, so compare
        # unit features by cosine
        for got, want, m in (
            (fp.feats[:cap], f_a.feats, va),
            (fp.feats[cap:], f_b.feats, vb),
        ):
            cos = np.sum(np.asarray(got)[m] * np.asarray(want)[m], axis=1)
            assert cos.min() > 0.9999, cos.min()


class TestOnesInputFastPath:
    def test_conv1_matmul_path_matches_gather_path(self, rng):
        """ones_input=True (hit-mask matmul) == ones_input=False (gather)."""
        import jax
        from lidarreg.models.fcgf import ResUNetBN2C
        from lidarreg.sparse.tensor import SparseTensor

        coords = np.unique(
            rng.integers(-25, 25, (700, 3)).astype(np.int32), axis=0
        )
        cap = 1024
        n = len(coords)
        full = np.concatenate(
            [coords, np.full((cap - n, 3), 2**20, np.int32)]
        )
        valid = jnp.asarray(np.arange(cap) < n)
        feats = jnp.ones((cap, 1), jnp.float32) * valid[:, None]
        x = SparseTensor(jnp.asarray(full), feats, valid, 1)

        fast = ResUNetBN2C(compute_dtype=None, ones_input=True)
        slow = ResUNetBN2C(compute_dtype=None, ones_input=False)
        params = fast.init(jax.random.PRNGKey(0), x, train=False)
        out_fast = fast.apply(params, x, train=False).feats
        out_slow = slow.apply(params, x, train=False).feats
        np.testing.assert_allclose(
            np.asarray(out_fast), np.asarray(out_slow), atol=2e-5
        )


class TestFusedStructureBuild:
    def test_fused_build_matches_serialized(self, rng):
        """fused_build=True (one batched sort + vmapped table builds) must
        be bit-identical to the round-2 serialized per-level path."""
        x = make_input(rng, n_pts=2500, cap=2048)
        fused = ResUNetBN2C(compute_dtype=None, fused_build=True)
        serial = ResUNetBN2C(compute_dtype=None, fused_build=False)
        params = fused.init(jax.random.PRNGKey(0), x, train=False)
        o1 = fused.apply(params, x, train=False)
        o2 = serial.apply(params, x, train=False)
        np.testing.assert_array_equal(np.asarray(o1.valid), np.asarray(o2.valid))
        np.testing.assert_allclose(
            np.asarray(o1.feats), np.asarray(o2.feats), atol=1e-6
        )

    def test_fused_build_matches_serialized_dim6(self, rng):
        """Same parity for the 6-D DGR inlier net (pruned kernel maps)."""
        coords6 = np.unique(
            rng.integers(-12, 12, (400, 6)).astype(np.int32), axis=0
        )
        cap, n = 512, len(coords6)
        full = np.concatenate(
            [coords6, np.full((cap - n, 6), 2**20, np.int32)]
        )
        valid = jnp.asarray(np.arange(cap) < n)
        feats = jnp.ones((cap, 1), jnp.float32) * valid[:, None]
        x = SparseTensor(jnp.asarray(full), feats, valid, 1)
        kw = dict(dim=6, out_channels=1, conv1_kernel_size=3,
                  normalize_feature=False, compute_dtype=None)
        fused = ResUNetBN2C(fused_build=True, **kw)
        serial = ResUNetBN2C(fused_build=False, **kw)
        params = fused.init(jax.random.PRNGKey(0), x, train=False)
        o1 = fused.apply(params, x, train=False)
        o2 = serial.apply(params, x, train=False)
        np.testing.assert_allclose(
            np.asarray(o1.feats), np.asarray(o2.feats), atol=1e-6
        )

    def test_prune_overflow_diagnostic(self, rng):
        """Tail hits dropped beyond prune_tail_cap (silent conv accuracy
        loss) must be surfaced via the "diagnostics" collection."""
        def make6(lo, hi):
            coords6 = np.unique(
                rng.integers(lo, hi, (400, 6)).astype(np.int32), axis=0
            )
            cap, n = 512, len(coords6)
            full = np.concatenate(
                [coords6, np.full((cap - n, 6), 2**20, np.int32)]
            )
            valid = jnp.asarray(np.arange(cap) < n)
            feats = jnp.ones((cap, 1), jnp.float32) * valid[:, None]
            return SparseTensor(jnp.asarray(full), feats, valid, 1)

        kw = dict(dim=6, out_channels=1, conv1_kernel_size=3,
                  normalize_feature=False, compute_dtype=None)
        model = ResUNetBN2C(**kw)
        # benchmark-like sparsity (LiDAR-scale quantized pair coords):
        # the default (64-offset, 2048-tail) pruning is exact -> 0 dropped
        x_sparse = make6(-160, 160)
        params = model.init(jax.random.PRNGKey(0), x_sparse, train=False)
        _, diag = model.apply(params, x_sparse, train=False,
                              mutable=["diagnostics"])
        assert int(diag["diagnostics"]["prune_tail_dropped"][0]) == 0
        # a dense coordinate block (coarse levels approach a full 3^6
        # stencil) overflows the tail: the count must be REPORTED, not
        # silently swallowed
        x_dense = make6(-12, 12)
        _, diag = model.apply(params, x_dense, train=False,
                              mutable=["diagnostics"])
        assert int(diag["diagnostics"]["prune_tail_dropped"][0]) > 0

    def test_fused_build_gradient_parity(self, rng):
        """Training runs the fused path: grads must match the serial path."""
        import jax.flatten_util

        x = make_input(rng, n_pts=2000, cap=1024)
        grads = {}
        for fused in (False, True):
            m = ResUNetBN2C(compute_dtype=None, fused_build=fused)
            v = m.init(jax.random.PRNGKey(0), x, train=True)

            def loss(params, m=m, v=v):
                out, _ = m.apply(
                    {"params": params, "batch_stats": v["batch_stats"]},
                    x, train=True, mutable=["batch_stats"])
                return jnp.sum(out.feats ** 2)

            grads[fused] = jax.grad(loss)(v["params"])
        fa = jax.flatten_util.ravel_pytree(grads[True])[0]
        fb = jax.flatten_util.ravel_pytree(grads[False])[0]
        rel = float(jnp.abs(fa - fb).max()) / (
            float(jnp.abs(fb).max()) + 1e-30)
        assert rel < 1e-6, rel


class TestDedupStructureBuild:
    """dedup_build: per-level coord sets from the table build's own claim
    rounds (sparse/hashtable.build_table_dedup) instead of the multi-key
    sort. Coarse-level ROW ORDER differs (claim order vs lexicographic);
    sparse conv is row-order invariant and level-0 order is unchanged, so
    level-0 outputs must match the sort path to fp tolerance."""

    def test_dedup_build_matches_serialized(self, rng):
        # level_capacity_div=(1,1,1,1): no coarse-level truncation — under
        # truncation the two paths legitimately keep DIFFERENT subsets
        # (lexicographic prefix vs claim order) and outputs diverge
        x = make_input(rng, n_pts=2500, cap=2048)
        kw = dict(compute_dtype=None, fused_build=False,
                  level_capacity_div=(1, 1, 1, 1))
        dedup = ResUNetBN2C(dedup_build=True, **kw)
        serial = ResUNetBN2C(dedup_build=False, **kw)
        params = dedup.init(jax.random.PRNGKey(0), x, train=False)
        o1 = dedup.apply(params, x, train=False)
        o2 = serial.apply(params, x, train=False)
        np.testing.assert_array_equal(
            np.asarray(o1.valid), np.asarray(o2.valid)
        )
        np.testing.assert_allclose(
            np.asarray(o1.feats), np.asarray(o2.feats), atol=1e-5
        )

    def test_dedup_build_matches_serialized_dim6(self, rng):
        coords6 = np.unique(
            rng.integers(-12, 12, (400, 6)).astype(np.int32), axis=0
        )
        cap, n = 512, len(coords6)
        full = np.concatenate(
            [coords6, np.full((cap - n, 6), 2**20, np.int32)]
        )
        valid = jnp.asarray(np.arange(cap) < n)
        feats = jnp.ones((cap, 1), jnp.float32) * valid[:, None]
        x = SparseTensor(jnp.asarray(full), feats, valid, 1)
        kw = dict(dim=6, out_channels=1, conv1_kernel_size=3,
                  normalize_feature=False, compute_dtype=None,
                  fused_build=False, level_capacity_div=(1, 1, 1, 1))
        dedup = ResUNetBN2C(dedup_build=True, **kw)
        serial = ResUNetBN2C(dedup_build=False, **kw)
        params = dedup.init(jax.random.PRNGKey(0), x, train=False)
        o1 = dedup.apply(params, x, train=False)
        o2 = serial.apply(params, x, train=False)
        np.testing.assert_allclose(
            np.asarray(o1.feats), np.asarray(o2.feats), atol=1e-5
        )

    def test_dedup_build_grad_matches(self, rng):
        """Training goes through the same structure build: gradients of a
        scalar loss must match the sort path (f32, train=False BN to keep
        the comparison exact across coarse-row permutations)."""
        x = make_input(rng, n_pts=1200, cap=1024)
        kw = dict(compute_dtype=None, fused_build=False,
                  level_capacity_div=(1, 1, 1, 1))
        dedup = ResUNetBN2C(dedup_build=True, **kw)
        serial = ResUNetBN2C(dedup_build=False, **kw)
        params = dedup.init(jax.random.PRNGKey(0), x, train=False)

        def loss(m):
            def f(p):
                o = m.apply(p, x, train=False)
                return jnp.sum(
                    jnp.where(o.valid[:, None], o.feats, 0.0) ** 2
                )
            return f

        g1 = jax.grad(loss(dedup))(params)
        g2 = jax.grad(loss(serial))(params)
        flat1 = jax.tree_util.tree_leaves(g1)
        flat2 = jax.tree_util.tree_leaves(g2)
        for a, b in zip(flat1, flat2):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
            )


class TestCombinedStructureBuild:
    """combined_build: one claim-round chain builds all four tables + all
    coarse coordinate lists (sparse/hashtable.build_tables_ragged). Same
    row-order caveat as dedup_build: coarse order is claim order, level-0
    order (the public feature order) is unchanged, sparse conv is
    row-order invariant."""

    def test_combined_build_matches_serialized(self, rng):
        x = make_input(rng, n_pts=2500, cap=2048)
        kw = dict(compute_dtype=None, fused_build=False,
                  level_capacity_div=(1, 1, 1, 1))
        comb = ResUNetBN2C(combined_build=True, **kw)
        serial = ResUNetBN2C(combined_build=False, **kw)
        params = comb.init(jax.random.PRNGKey(0), x, train=False)
        o1 = comb.apply(params, x, train=False)
        o2 = serial.apply(params, x, train=False)
        np.testing.assert_array_equal(
            np.asarray(o1.valid), np.asarray(o2.valid)
        )
        np.testing.assert_allclose(
            np.asarray(o1.feats), np.asarray(o2.feats), atol=1e-5
        )

    def test_combined_build_matches_serialized_dim6(self, rng):
        coords6 = np.unique(
            rng.integers(-12, 12, (400, 6)).astype(np.int32), axis=0
        )
        cap, n = 512, len(coords6)
        full = np.concatenate(
            [coords6, np.full((cap - n, 6), 2**20, np.int32)]
        )
        valid = jnp.asarray(np.arange(cap) < n)
        feats = jnp.ones((cap, 1), jnp.float32) * valid[:, None]
        x = SparseTensor(jnp.asarray(full), feats, valid, 1)
        kw = dict(dim=6, out_channels=1, conv1_kernel_size=3,
                  normalize_feature=False, compute_dtype=None,
                  fused_build=False, level_capacity_div=(1, 1, 1, 1))
        comb = ResUNetBN2C(combined_build=True, **kw)
        serial = ResUNetBN2C(combined_build=False, **kw)
        params = comb.init(jax.random.PRNGKey(0), x, train=False)
        o1 = comb.apply(params, x, train=False)
        o2 = serial.apply(params, x, train=False)
        np.testing.assert_allclose(
            np.asarray(o1.feats), np.asarray(o2.feats), atol=1e-5
        )

    def test_combined_build_grad_matches(self, rng):
        x = make_input(rng, n_pts=1200, cap=1024)
        kw = dict(compute_dtype=None, fused_build=False,
                  level_capacity_div=(1, 1, 1, 1))
        comb = ResUNetBN2C(combined_build=True, **kw)
        serial = ResUNetBN2C(combined_build=False, **kw)
        params = comb.init(jax.random.PRNGKey(0), x, train=False)

        def loss(m):
            def f(p):
                o = m.apply(p, x, train=False)
                return jnp.sum(
                    jnp.where(o.valid[:, None], o.feats, 0.0) ** 2
                )
            return f

        g1 = jax.grad(loss(comb))(params)
        g2 = jax.grad(loss(serial))(params)
        for a, b in zip(jax.tree_util.tree_leaves(g1),
                        jax.tree_util.tree_leaves(g2)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-4, rtol=1e-3
            )

    def test_combined_build_stride2_input(self, rng):
        """A stride-2 input tensor (DGR runs the inlier net at stride 1,
        but level quantization must respect x.stride in general)."""
        c = np.unique(
            (rng.integers(-30, 30, (600, 3)) * 2).astype(np.int32), axis=0
        )
        cap, n = 1024, len(c)
        full = np.concatenate([c, np.full((cap - n, 3), 2**20, np.int32)])
        valid = jnp.asarray(np.arange(cap) < n)
        feats = (jnp.asarray(
            rng.normal(size=(cap, 1)).astype(np.float32)) * valid[:, None])
        x = SparseTensor(jnp.asarray(full), feats, valid, 2)
        kw = dict(compute_dtype=None, fused_build=False,
                  level_capacity_div=(1, 1, 1, 1))
        comb = ResUNetBN2C(combined_build=True, **kw)
        serial = ResUNetBN2C(combined_build=False, **kw)
        params = comb.init(jax.random.PRNGKey(0), x, train=False)
        o1 = comb.apply(params, x, train=False)
        o2 = serial.apply(params, x, train=False)
        np.testing.assert_allclose(
            np.asarray(o1.feats), np.asarray(o2.feats), atol=1e-5
        )


class TestGroupedLookupRagged:
    def test_grouped_lookup_forward_parity(self, rng):
        """grouped_lookup=True (one ragged probe over per-level tables) must
        be numerically identical to the 7-serialized-lookup path — same
        tables, same queries, different program shape."""
        x = make_input(rng, n_pts=2500, cap=2048)
        kw = dict(compute_dtype=None, fused_build=False)
        for dedup in (False, True):
            grp = ResUNetBN2C(grouped_lookup=True, dedup_build=dedup, **kw)
            plain = ResUNetBN2C(grouped_lookup=False, dedup_build=dedup,
                                **kw)
            params = grp.init(jax.random.PRNGKey(0), x, train=False)
            o1 = grp.apply(params, x, train=False)
            o2 = plain.apply(params, x, train=False)
            np.testing.assert_array_equal(
                np.asarray(o1.valid), np.asarray(o2.valid)
            )
            np.testing.assert_allclose(
                np.asarray(o1.feats), np.asarray(o2.feats), atol=1e-6,
                err_msg=f"dedup={dedup}",
            )

    def test_grouped_lookup_is_the_default(self):
        """The grouped ragged probe is the shipped default after the
        round-4 on-chip gate (BASELINE.md build A/B); the env var is the
        escape hatch in BOTH directions. Evaluated in a SUBPROCESS — an
        importlib.reload here would swap the module's class objects under
        every already-imported test module (round-4 ADVICE item 3)."""
        import json
        import os
        import subprocess
        import sys

        prog = (
            "import json, lidarreg.models.fcgf as m;"
            "print(json.dumps(m.ResUNetBN2C().grouped_lookup))"
        )
        for env_val, expect in ((None, True), ("0", False), ("1", True)):
            env = dict(os.environ)
            env.pop("LIDARREG_GROUPED_LOOKUP", None)
            if env_val is not None:
                env["LIDARREG_GROUPED_LOOKUP"] = env_val
            out = subprocess.run(
                [sys.executable, "-c", prog], env=env, capture_output=True,
                text=True, timeout=300, check=True,
            )
            assert json.loads(out.stdout.strip()) is expect, (env_val, out)

    def test_build_rounds_default_and_escape_hatch(self):
        """The (4, 2) claim-round schedule is the shipped default after
        the round-5 gate: side-1 exhaustive (flag population unchanged —
        the (3, 2) schedule saturated the grouped probe's retry pool,
        BASELINE.md round-5 build section), side-2 halved.
        LIDARREG_BUILD_ROUNDS=4,4 restores the exhaustive schedule.
        Subprocess-evaluated like the grouped-lookup default."""
        import json
        import os
        import subprocess
        import sys

        prog = (
            "import json, lidarreg.models.fcgf as m;"
            "print(json.dumps(list(m.ResUNetBN2C().build_rounds)))"
        )
        for env_val, expect in ((None, [4, 2]), ("4,4", [4, 4])):
            env = dict(os.environ)
            env.pop("LIDARREG_BUILD_ROUNDS", None)
            if env_val is not None:
                env["LIDARREG_BUILD_ROUNDS"] = env_val
            out = subprocess.run(
                [sys.executable, "-c", prog], env=env, capture_output=True,
                text=True, timeout=300, check=True,
            )
            assert json.loads(out.stdout.strip()) == expect, (env_val, out)
