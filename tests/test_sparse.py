"""Tests for the sparse engine: hash table, kernel maps, conv vs dense ref."""
import numpy as np
import jax.numpy as jnp

from lidarreg.sparse import (
    SparseTensor,
    build_table,
    lookup,
    downsample_coords,
    kernel_offsets,
    sparse_conv,
    sparse_conv_transpose,
)


def dense_ref_conv(coords, feats, valid, offsets, weights):
    """Direct definition: out[o] = sum_j W_j @ X[at coords[o]+off_j]."""
    table = {tuple(c): i for i, c in enumerate(coords[valid])}
    vi = {tuple(c): feats[i] for i, c in enumerate(coords) if valid[i]}
    out = np.zeros((len(coords), weights.shape[-1]), np.float32)
    for o, c in enumerate(coords):
        if not valid[o]:
            continue
        acc = np.zeros(weights.shape[-1], np.float32)
        for j, off in enumerate(offsets):
            key = tuple(np.asarray(c) + np.asarray(off))
            if key in vi:
                acc += vi[key] @ weights[j]
        out[o] = acc
    del table
    return out


class TestHashTable:
    def test_roundtrip(self, rng):
        coords = rng.integers(-500, 500, size=(2000, 3)).astype(np.int32)
        coords = np.unique(coords, axis=0)
        v = len(coords)
        valid = np.ones(v, bool)
        table, placed = build_table(jnp.asarray(coords), jnp.asarray(valid), 8192)
        assert bool(placed.all())
        got = np.asarray(lookup(table, jnp.asarray(coords)))
        np.testing.assert_array_equal(got, np.arange(v))

    def test_misses_return_minus1(self, rng):
        coords = (rng.integers(0, 100, size=(500, 3)) * 2).astype(np.int32)
        coords = np.unique(coords, axis=0)
        table, _ = build_table(
            jnp.asarray(coords), jnp.ones(len(coords), bool), 2048
        )
        queries = coords + 1  # odd coords can't be present
        got = np.asarray(lookup(table, jnp.asarray(queries)))
        assert (got == -1).all()

    def test_invalid_rows_not_inserted(self, rng):
        coords = np.unique(
            rng.integers(-50, 50, size=(300, 3)).astype(np.int32), axis=0
        )
        valid = np.zeros(len(coords), bool)
        valid[:10] = True
        table, _ = build_table(jnp.asarray(coords), jnp.asarray(valid), 1024)
        got = np.asarray(lookup(table, jnp.asarray(coords)))
        assert (got[10:] == -1).all()
        np.testing.assert_array_equal(got[:10], np.arange(10))


class TestKernelMaps:
    def test_offsets_k3(self):
        offs = np.asarray(kernel_offsets(3, 2))
        assert offs.shape == (27, 3)
        assert set(map(tuple, offs)) == {
            (i * 2, j * 2, k * 2)
            for i in (-1, 0, 1) for j in (-1, 0, 1) for k in (-1, 0, 1)
        }

    def test_downsample_coords(self):
        coords = np.array(
            [[0, 0, 0], [1, 0, 0], [2, 0, 0], [3, 3, 3], [-1, -1, -1]],
            np.int32,
        )
        out, valid = downsample_coords(
            jnp.asarray(coords), jnp.ones(5, bool), in_stride=1, out_capacity=8
        )
        got = set(map(tuple, np.asarray(out)[np.asarray(valid)]))
        # floor-div: {0,1}->0, 2->2, 3->2, -1->-2
        assert got == {(0, 0, 0), (2, 0, 0), (2, 2, 2), (-2, -2, -2)}


class TestSparseConv:
    def test_matches_dense_reference_k3(self, rng):
        v, cin, cout = 200, 8, 16
        coords = np.unique(
            rng.integers(-6, 6, size=(v, 3)).astype(np.int32), axis=0
        )
        n = len(coords)
        pad = 256
        coords_p = np.zeros((pad, 3), np.int32)
        coords_p[:n] = coords
        feats = np.zeros((pad, cin), np.float32)
        feats[:n] = rng.normal(size=(n, cin))
        valid = np.zeros(pad, bool)
        valid[:n] = True
        W = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1

        x = SparseTensor(
            jnp.asarray(coords_p), jnp.asarray(feats), jnp.asarray(valid), 1
        )
        y = sparse_conv(x, jnp.asarray(W), kernel_size=3, stride=1)
        ref = dense_ref_conv(
            coords_p, feats, valid, np.asarray(kernel_offsets(3, 1)), W
        )
        np.testing.assert_allclose(np.asarray(y.feats), ref, atol=1e-4)
        assert y.stride == 1

    def test_stride2_downsample(self, rng):
        coords = np.unique(
            rng.integers(-8, 8, size=(300, 3)).astype(np.int32), axis=0
        )
        n = len(coords)
        pad = 512
        coords_p = np.zeros((pad, 3), np.int32); coords_p[:n] = coords
        feats = np.zeros((pad, 4), np.float32)
        feats[:n] = rng.normal(size=(n, 4))
        valid = np.zeros(pad, bool); valid[:n] = True
        W = rng.normal(size=(27, 4, 6)).astype(np.float32)

        x = SparseTensor(jnp.asarray(coords_p), jnp.asarray(feats), jnp.asarray(valid), 1)
        y = sparse_conv(x, jnp.asarray(W), kernel_size=3, stride=2)
        assert y.stride == 2
        yc = np.asarray(y.coords)[np.asarray(y.valid)]
        assert (yc % 2 == 0).all()
        expected = np.unique((coords // 2) * 2, axis=0)
        assert len(yc) == len(expected)

        # spot check one output against the definition
        out_ref = dense_ref_conv(
            np.asarray(y.coords), feats_join(coords_p, feats, valid),
            np.asarray(y.valid), np.asarray(kernel_offsets(3, 1)), W,
        ) if False else None
        # direct check: output o sums inputs at out_c + {-1,0,1}^3
        table = {tuple(c): i for i, c in enumerate(coords_p[:n])}
        o = 0
        oc = yc[o]
        acc = np.zeros(6, np.float32)
        for j, off in enumerate(np.asarray(kernel_offsets(3, 1))):
            key = tuple(oc + off)
            if key in table:
                acc += feats[table[key]] @ W[j]
        np.testing.assert_allclose(np.asarray(y.feats)[0], acc, atol=1e-4)

    def test_transpose_roundtrip_coords(self, rng):
        # downsample then conv_tr back onto the original (fine) coords
        coords = np.unique(
            (rng.integers(-8, 8, size=(200, 3))).astype(np.int32), axis=0
        )
        n = len(coords); pad = 256
        coords_p = np.zeros((pad, 3), np.int32); coords_p[:n] = coords
        feats = np.zeros((pad, 4), np.float32); feats[:n] = rng.normal(size=(n, 4))
        valid = np.zeros(pad, bool); valid[:n] = True
        x = SparseTensor(jnp.asarray(coords_p), jnp.asarray(feats), jnp.asarray(valid), 1)
        Wd = rng.normal(size=(27, 4, 8)).astype(np.float32)
        y = sparse_conv(x, jnp.asarray(Wd), 3, stride=2)

        Wu = rng.normal(size=(27, 8, 4)).astype(np.float32)
        z = sparse_conv_transpose(
            y, jnp.asarray(Wu), 3, x.coords, x.valid, out_stride=1
        )
        assert z.stride == 1
        assert z.feats.shape == (pad, 4)
        zf = np.asarray(z.feats)
        assert np.isfinite(zf).all()
        assert np.abs(zf[np.asarray(x.valid)]).sum() > 0  # information flows up
        assert (zf[~np.asarray(x.valid)] == 0).all()      # padding stays zero

    def test_padding_isolation(self, rng):
        # garbage in padded rows must not leak into valid outputs
        coords = np.unique(rng.integers(-5, 5, size=(100, 3)).astype(np.int32), axis=0)
        n = len(coords); pad = 128
        cp = np.zeros((pad, 3), np.int32); cp[:n] = coords
        f1 = np.zeros((pad, 4), np.float32); f1[:n] = rng.normal(size=(n, 4))
        f2 = f1.copy(); f2[n:] = 1e6  # garbage in padding
        cp2 = cp.copy(); cp2[n:] = coords[0] + np.array([1, 0, 0])  # aliasing coords!
        valid = np.zeros(pad, bool); valid[:n] = True
        W = rng.normal(size=(27, 4, 4)).astype(np.float32)
        y1 = sparse_conv(SparseTensor(jnp.asarray(cp), jnp.asarray(f1), jnp.asarray(valid), 1), jnp.asarray(W), 3)
        y2 = sparse_conv(SparseTensor(jnp.asarray(cp2), jnp.asarray(f2), jnp.asarray(valid), 1), jnp.asarray(W), 3)
        np.testing.assert_allclose(
            np.asarray(y1.feats)[:n], np.asarray(y2.feats)[:n], atol=1e-3
        )


def feats_join(c, f, v):  # helper kept for clarity in stride-2 test
    return f


class TestCuckooAtScale:
    def test_no_unplaced_keys_at_fcgf_load(self, rng):
        # regression guard: claim-round insertion must place EVERY key at
        # the sizing the FCGF levels use (table_factor 16 -> bucket load
        # 0.25), and the single-probe lookup's default retry pool must
        # resolve them all. Tighter loads need an explicit retry_capacity
        # (TestOverflowRetryPath covers that contract).
        for n, T in ((32768, 524288), (120000, 2097152)):
            coords = np.unique(
                rng.integers(-2000, 2000, size=(n, 3)).astype(np.int32), axis=0
            )
            table, placed = build_table(
                jnp.asarray(coords), jnp.ones(len(coords), bool), T
            )
            assert bool(placed.all()), f"unplaced keys at n={len(coords)}"
            got = np.asarray(lookup(table, jnp.asarray(coords)))
            np.testing.assert_array_equal(got, np.arange(len(coords)))


class TestInvertKernelMap:
    def test_matches_direct_lookup(self, rng):
        """Inverted down-map == directly-looked-up transpose map."""
        from lidarreg.sparse import build_table
        from lidarreg.sparse.conv import invert_kernel_map, kernel_map

        cap = 512
        coords = np.unique(
            (rng.integers(-20, 20, (cap, 3)) * 1).astype(np.int32), axis=0
        )
        n = len(coords)
        coords = np.concatenate(
            [coords, np.full((cap - n, 3), 2**20, np.int32)]
        )
        valid = np.arange(cap) < n
        c1, v1 = jnp.asarray(coords), jnp.asarray(valid)
        c2, v2 = downsample_coords(c1, v1, 1, cap)
        t1, _ = build_table(c1, v1, 4096)
        t2, _ = build_table(c2, v2, 4096)

        offs = kernel_offsets(3, 1, 3)
        down = kernel_map(t1, v1, c2, v2, offs)       # L1 -> L2 (stride 2)
        up_direct = kernel_map(t2, v2, c1, v1, offs)  # L2 -> L1 (transpose)
        up_derived = invert_kernel_map(down, cap)

        hd = np.asarray(up_direct.hit)
        hv = np.asarray(up_derived.hit)
        np.testing.assert_array_equal(hd, hv)
        nd = np.asarray(up_direct.nb)
        nv = np.asarray(up_derived.nb)
        np.testing.assert_array_equal(nd[hd], nv[hd])


class TestSymmetricStride1Map:
    """kernel_map_stride1 (half-lookup + mirror scatter) == kernel_map."""

    def _coords(self, rng, n=400, cap=512):
        coords = np.unique(
            rng.integers(-20, 20, size=(n, 3)).astype(np.int32), axis=0
        )
        v = len(coords)
        full = np.concatenate(
            [coords, np.full((cap - v, 3), 2**20, np.int32)]
        )
        valid = np.arange(cap) < v
        return jnp.asarray(full), jnp.asarray(valid)

    def test_matches_general_map(self, rng):
        from lidarreg.sparse.conv import (
            kernel_map,
            kernel_map_stride1,
            table_for,
        )

        for k, seed in ((3, 0), (5, 1)):
            coords, valid = self._coords(np.random.default_rng(seed))
            x = SparseTensor(
                coords, jnp.zeros((coords.shape[0], 1)), valid, 1
            )
            table = table_for(x)
            offs = kernel_offsets(k, 1, 3)
            ref = kernel_map(table, valid, coords, valid, offs)
            fast = kernel_map_stride1(table, valid, coords, offs)
            np.testing.assert_array_equal(
                np.asarray(ref.hit), np.asarray(fast.hit)
            )
            # nb only meaningful where hit
            np.testing.assert_array_equal(
                np.where(np.asarray(ref.hit), np.asarray(ref.nb), -1),
                np.where(np.asarray(fast.hit), np.asarray(fast.nb), -1),
            )

    def test_dim6(self, rng):
        from lidarreg.sparse.conv import (
            kernel_map,
            kernel_map_stride1,
            table_for,
        )

        coords = np.unique(
            rng.integers(-3, 3, size=(200, 6)).astype(np.int32), axis=0
        )
        cap = 256
        v = len(coords)
        full = np.concatenate(
            [coords, np.full((cap - v, 6), 2**20, np.int32)]
        )
        valid = jnp.asarray(np.arange(cap) < v)
        coords = jnp.asarray(full)
        x = SparseTensor(coords, jnp.zeros((cap, 1)), valid, 1)
        table = table_for(x)
        offs = kernel_offsets(3, 1, 6)
        ref = kernel_map(table, valid, coords, valid, offs)
        fast = kernel_map_stride1(table, valid, coords, offs)
        np.testing.assert_array_equal(np.asarray(ref.hit), np.asarray(fast.hit))
        np.testing.assert_array_equal(
            np.where(np.asarray(ref.hit), np.asarray(ref.nb), -1),
            np.where(np.asarray(fast.hit), np.asarray(fast.nb), -1),
        )


class TestOverflowRetryPath:
    """Force side-1 bucket overflow so lookups exercise flag + retry."""

    def test_tight_table_still_exact(self, rng):
        from lidarreg.sparse.hashtable import build_table, lookup

        coords = np.unique(
            rng.integers(-100, 100, size=(900, 3)).astype(np.int32), axis=0
        )
        v = len(coords)
        valid = np.ones(v, bool)
        # table_size == 1024 entries for ~900 keys: lambda ~ 3.5 per 4-lane
        # bucket -> a large fraction of buckets overflow to side 2
        table, placed = build_table(
            jnp.asarray(coords), jnp.asarray(valid), 1024
        )
        assert bool(np.asarray(placed).all()), "keys lost at high load"
        rows = np.asarray(lookup(table, jnp.asarray(coords)))
        np.testing.assert_array_equal(rows, np.arange(v))
        # absent queries stay absent
        absent = coords + np.asarray([1000, 0, 0], np.int32)
        rows_a = np.asarray(lookup(table, jnp.asarray(absent)))
        assert (rows_a == -1).all()

    def test_retry_pool_capacity_respected(self, rng):
        from lidarreg.sparse.hashtable import build_table, lookup

        coords = np.unique(
            rng.integers(-50, 50, size=(500, 3)).astype(np.int32), axis=0
        )
        v = len(coords)
        table, placed = build_table(
            jnp.asarray(coords), jnp.asarray(np.ones(v, bool)), 512
        )
        assert bool(np.asarray(placed).all())
        # generous explicit retry capacity: still exact
        rows = np.asarray(
            lookup(table, jnp.asarray(coords), retry_capacity=v)
        )
        np.testing.assert_array_equal(rows, np.arange(v))


class TestScatterSideDownMap:
    """kernel_map_down (2^dim fine-side lookups) == kernel_map (3^dim)."""

    def _check(self, rng, dim, in_stride, cap=512):
        from lidarreg.sparse import build_table
        from lidarreg.sparse.conv import kernel_map, kernel_map_down

        coords = np.unique(
            (rng.integers(-20, 20, (cap, dim)) * in_stride).astype(np.int32),
            axis=0,
        )
        n = len(coords)
        coords = np.concatenate(
            [coords, np.full((cap - n, dim), 2**20, np.int32)]
        )
        valid = np.arange(cap) < n
        c1, v1 = jnp.asarray(coords), jnp.asarray(valid)
        c2, v2 = downsample_coords(c1, v1, in_stride, cap)
        t1, _ = build_table(c1, v1, 8192)
        t2, _ = build_table(c2, v2, 8192)

        offs = kernel_offsets(3, in_stride, dim)
        ref = kernel_map(t1, v1, c2, v2, offs)
        got = kernel_map_down(t2, c1, v1, cap, in_stride)

        hr, hg = np.asarray(ref.hit), np.asarray(got.hit)
        np.testing.assert_array_equal(hr, hg)
        nr, ng = np.asarray(ref.nb), np.asarray(got.nb)
        np.testing.assert_array_equal(nr[hr], ng[hr])

    def test_3d_stride1(self, rng):
        self._check(rng, 3, 1)

    def test_3d_stride2(self, rng):
        self._check(rng, 3, 2)

    def test_3d_stride4(self, rng):
        self._check(rng, 3, 4)

    def test_6d(self, rng):
        self._check(rng, 6, 1, cap=256)


class TestPrunedKernelMap:
    """prune_kernel_map + apply_conv == full apply_conv (exact when the
    tail fits its cap); the 6-D DGR inlier-net path relies on this."""

    def _dense_6d(self, rng, n=180, cap=256):
        # clustered coords so some offsets DO hit (worst case for pruning)
        base = rng.integers(-4, 4, size=(n // 3, 6))
        jitter = rng.integers(-1, 2, size=(n, 6))
        coords = np.unique(
            (np.repeat(base, 3, axis=0)[:n] + jitter).astype(np.int32),
            axis=0,
        )
        v = len(coords)
        full = np.concatenate(
            [coords, np.full((cap - v, 6), 2**20, np.int32)]
        )
        valid = np.arange(cap) < v
        return jnp.asarray(full), jnp.asarray(valid)

    def test_matches_full_conv(self, rng):
        from lidarreg.sparse.conv import (
            apply_conv,
            kernel_map,
            prune_kernel_map,
            table_for,
        )

        coords, valid = self._dense_6d(rng)
        cap = coords.shape[0]
        x = SparseTensor(coords, jnp.zeros((cap, 1)), valid, 1)
        table = table_for(x)
        offs = kernel_offsets(3, 1, 6)
        km = kernel_map(table, valid, coords, valid, offs)
        feats = jnp.asarray(
            rng.normal(size=(cap, 8)).astype(np.float32)
        ) * valid[:, None]
        w = jnp.asarray(rng.normal(size=(729, 8, 4)).astype(np.float32))
        ref = apply_conv(feats, km, w, valid, precision="highest")

        n_nonzero = int(jnp.sum(jnp.sum(km.hit, axis=1) > 0))
        for keep in (16, 64):
            pkm = prune_kernel_map(km, keep, tail_cap=4096)
            assert int(pkm.tail_dropped) == 0, "tail cap must hold the rest"
            got = apply_conv(feats, pkm, w, valid, precision="highest")
            np.testing.assert_allclose(
                np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5
            )
        assert n_nonzero > 16, "test must exercise a NON-empty tail"

    def test_gradients_match_full_conv(self, rng):
        # the DGR inlier net TRAINS through the pruned path: d(loss)/d(w)
        # and d(loss)/d(x) must match the full map (incl. tail scatter-add)
        import jax

        from lidarreg.sparse.conv import (
            apply_conv,
            kernel_map,
            prune_kernel_map,
            table_for,
        )

        coords, valid = self._dense_6d(rng)
        cap = coords.shape[0]
        x = SparseTensor(coords, jnp.zeros((cap, 1)), valid, 1)
        table = table_for(x)
        offs = kernel_offsets(3, 1, 6)
        km = kernel_map(table, valid, coords, valid, offs)
        pkm = prune_kernel_map(km, 16, tail_cap=4096)
        feats = jnp.asarray(
            rng.normal(size=(cap, 8)).astype(np.float32)
        ) * valid[:, None]
        w = jnp.asarray(rng.normal(size=(729, 8, 4)).astype(np.float32))
        cot = jnp.asarray(rng.normal(size=(cap, 4)).astype(np.float32))

        def loss(m):
            return lambda f, ww: jnp.sum(
                apply_conv(f, m, ww, valid, precision="highest") * cot
            )

        gx_f, gw_f = jax.grad(loss(km), argnums=(0, 1))(feats, w)
        gx_p, gw_p = jax.grad(loss(pkm), argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(
            np.asarray(gx_p), np.asarray(gx_f), rtol=1e-5, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(gw_p), np.asarray(gw_f), rtol=1e-5, atol=1e-5
        )

    def test_keep_geq_j_passthrough(self, rng):
        from lidarreg.sparse.conv import (
            KernelMap,
            prune_kernel_map,
        )

        km = KernelMap(
            jnp.zeros((27, 8), jnp.int32), jnp.zeros((27, 8), bool)
        )
        assert prune_kernel_map(km, 27) is km

    def test_dgr_inlier_net_pruned_forward(self, rng):
        # the full 6-D ResUNetBN2C with pruning on vs off (tiny channels)
        from lidarreg.models.fcgf import ResUNetBN2C

        coords, valid = self._dense_6d(rng)
        cap = coords.shape[0]
        st = SparseTensor(coords, jnp.ones((cap, 1)), valid, 1)
        kw = dict(
            dim=6, out_channels=1, normalize_feature=False,
            conv1_kernel_size=3, channels=(0, 4, 8, 8, 8),
            tr_channels=(0, 4, 4, 4, 4), compute_dtype=None,
        )
        m_full = ResUNetBN2C(prune_offsets=0, **kw)
        m_pruned = ResUNetBN2C(prune_offsets=32, prune_tail_cap=8192, **kw)
        import jax

        var = m_full.init(jax.random.PRNGKey(0), st, train=False)
        a = m_full.apply(var, st, train=False)
        b = m_pruned.apply(var, st, train=False)
        np.testing.assert_allclose(
            np.asarray(a.feats), np.asarray(b.feats), rtol=2e-4, atol=2e-4
        )


class TestLookupGrouped:
    def test_matches_per_table_lookup(self, rng):
        """lookup_grouped over a vmapped table stack == per-table lookup,
        including misses and repeat levels."""
        import jax
        from lidarreg.sparse.hashtable import lookup_grouped

        L, size = 3, 4096
        coords, valids = [], []
        for i in range(L):
            c = np.unique(
                rng.integers(-40, 40, (300 + 100 * i, 3)).astype(np.int32),
                axis=0,
            )
            full = np.zeros((512, 3), np.int32)
            full[: len(c)] = c
            coords.append(full)
            valids.append(np.arange(512) < len(c))
        cs = jnp.asarray(np.stack(coords))
        vs = jnp.asarray(np.stack(valids))
        tabs, _ = jax.vmap(lambda c, v: build_table(c, v, size))(cs, vs)

        queries = [
            (lvl, jnp.asarray(
                rng.integers(-45, 45, (7, 200, 3)).astype(np.int32)))
            for lvl in (0, 2, 1, 2)
        ]
        got = lookup_grouped(tabs, queries)
        from lidarreg.sparse.hashtable import HashTable
        for (lvl, q), g in zip(queries, got):
            single = HashTable(tabs.table[lvl], tabs.mask[lvl])
            want = lookup(single, q)
            np.testing.assert_array_equal(np.asarray(g), np.asarray(want))

    def test_downsample_pyramid_matches_chained(self, rng):
        from lidarreg.sparse.tensor import downsample_pyramid

        pts = np.unique(
            rng.integers(-60, 60, (900, 3)).astype(np.int32), axis=0
        )
        cap = 1024
        full = np.full((cap, 3), 2**20, np.int32)
        full[: len(pts)] = pts
        coords = jnp.asarray(full)
        valid = jnp.asarray(np.arange(cap) < len(pts))
        caps = [cap, cap // 2, cap // 4]
        pyr = downsample_pyramid(coords, valid, 1, caps)
        c, v = coords, valid
        stride = 1
        for (ck, vk), cap_k in zip(pyr, caps):
            want_c, want_v = downsample_coords(c, v, stride, cap_k)
            np.testing.assert_array_equal(np.asarray(vk), np.asarray(want_v))
            np.testing.assert_array_equal(
                np.asarray(ck)[np.asarray(vk)],
                np.asarray(want_c)[np.asarray(want_v)],
            )
            c, v, stride = want_c, want_v, stride * 2

    def test_grouped_lookup_tight_tables_exact(self, rng):
        """lookup_grouped's shared retry pool must stay exact when MANY
        buckets overflow (side-2 rows routed per level through row2)."""
        import jax
        from lidarreg.sparse.hashtable import lookup_grouped

        L = 3
        coords, valids = [], []
        for i in range(L):
            c = np.unique(
                rng.integers(-100, 100, (900, 3)).astype(np.int32), axis=0
            )
            full = np.zeros((1024, 3), np.int32)
            full[: len(c)] = c
            coords.append(full)
            valids.append(np.arange(1024) < len(c))
        cs = jnp.asarray(np.stack(coords))
        vs = jnp.asarray(np.stack(valids))
        # 1024 entries for ~900 keys per level: heavy side-1 overflow
        tabs, placed = jax.vmap(
            lambda c, v: build_table(c, v, 1024)
        )(cs, vs)
        assert bool(np.asarray(placed)[np.asarray(vs)].all())
        items = [(lvl, cs[lvl]) for lvl in range(L)]
        # mix in absent queries for every level
        items += [(lvl, cs[lvl] + jnp.asarray([[1000, 0, 0]], jnp.int32))
                  for lvl in range(L)]
        got = lookup_grouped(tabs, items, retry_capacity=4096)
        for lvl in range(L):
            present = np.asarray(got[lvl])[np.asarray(vs[lvl])]
            np.testing.assert_array_equal(
                present, np.arange(int(vs[lvl].sum()))
            )
            absent = np.asarray(got[L + lvl])[np.asarray(vs[lvl])]
            assert (absent == -1).all()


class TestBuildTableDedup:
    """build_table_dedup: the claim rounds both build the table AND derive
    the unique coordinate list (sort-free downsample — hashtable.py)."""

    def test_set_parity_with_sorted_downsample(self, rng):
        from lidarreg.sparse.hashtable import build_table_dedup, lookup

        V, cap = 4096, 4096
        coords = rng.integers(-40, 40, (V, 3)).astype(np.int32) * 2
        valid = jnp.asarray(rng.random(V) < 0.9)
        c = jnp.asarray(coords)
        ref_c, ref_v = downsample_coords(c, valid, 2, cap)
        ref_set = set(map(tuple, np.asarray(ref_c)[np.asarray(ref_v)]))
        tab, out_c, out_v = build_table_dedup(
            (c // 4) * 4, valid, 65536, cap
        )
        got = np.asarray(out_c)[np.asarray(out_v)]
        assert set(map(tuple, got)) == ref_set
        # every listed coord is findable at its own row; absences miss
        rows = np.asarray(lookup(tab, jnp.asarray(got)))
        np.testing.assert_array_equal(rows, np.arange(len(got)))
        absent = jnp.asarray([[401, 0, 0], [0, 403, 0]], jnp.int32)
        assert np.all(np.asarray(lookup(tab, absent)) == -1)

    def test_heavy_duplicates_one_row_per_cell(self, rng):
        from lidarreg.sparse.hashtable import build_table_dedup

        V = 4096
        coords = (rng.integers(0, 5, (V, 3)) * 4).astype(np.int32)
        tab, oc, ov = build_table_dedup(
            jnp.asarray(coords), jnp.ones(V, bool), 65536, 1024
        )
        n = int(np.asarray(ov).sum())
        uniq = set(map(tuple, coords))
        assert n == len(uniq)
        assert set(map(tuple, np.asarray(oc)[:n])) == uniq

    def test_truncation_list_table_consistent(self, rng):
        """Unique cells beyond out_capacity drop from BOTH the list and the
        table; every listed coord stays findable (the dropped-winner lane
        still carries its bucket's overflow flag — hashtable.py)."""
        from lidarreg.sparse.hashtable import build_table_dedup, lookup

        V, small = 4096, 64
        coords = rng.integers(-40, 40, (V, 3)).astype(np.int32) * 2
        valid = jnp.asarray(rng.random(V) < 0.9)
        q = (jnp.asarray(coords) // 4) * 4
        tab, oc, ov = build_table_dedup(q, valid, 1024, small)
        assert int(np.asarray(ov).sum()) == small
        rows = np.asarray(lookup(tab, oc))
        np.testing.assert_array_equal(rows[:small], np.arange(small))

    def test_all_invalid(self, rng):
        from lidarreg.sparse.hashtable import build_table_dedup, lookup

        c = jnp.asarray(rng.integers(-8, 8, (256, 3)).astype(np.int32))
        tab, oc, ov = build_table_dedup(
            c, jnp.zeros(256, bool), 4096, 256
        )
        assert not bool(np.asarray(ov).any())
        assert np.all(np.asarray(lookup(tab, c)) == -1)


class TestLookupGroupedRagged:
    def test_matches_individual_lookups_over_ragged_tables(self, rng):
        """One probe over row-concatenated DIFFERENT-sized tables must equal
        per-table `lookup` (the per-level sizing the equal-shape
        `lookup_grouped` stack cannot express)."""
        from lidarreg.sparse.hashtable import (
            build_table,
            lookup,
            lookup_grouped_ragged,
        )

        tables, queries = [], []
        for i, (n, size) in enumerate(
            ((1500, 32768), (700, 16384), (300, 8192))
        ):
            coords = np.unique(
                rng.integers(-60, 60, (n, 3)).astype(np.int32) * (i + 1),
                axis=0,
            )
            c = jnp.asarray(
                np.concatenate(
                    [coords, np.full((n - len(coords) + 64, 3), 2**20,
                                     np.int32)]
                )
            )
            v = jnp.arange(c.shape[0]) < len(coords)
            tab, _ = build_table(c, v, size)
            tables.append(tab)
            # query mix: present coords + absent probes, odd leading shape
            qs = np.concatenate(
                [coords[:: max(1, len(coords) // 40)],
                 rng.integers(-200, 200, (17, 3)).astype(np.int32) * 7 + 1]
            )
            queries.append(jnp.asarray(qs))
        items = [(2, queries[2]), (0, queries[0]), (1, queries[1]),
                 (0, queries[0][:5])]
        got = lookup_grouped_ragged(tables, items)
        for (lvl, q), g in zip(items, got):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(lookup(tables[lvl], q))
            )


class TestBuildTablesRagged:
    """build_tables_ragged: ALL per-level tables + coarse coord lists from
    ONE combined set of claim rounds (hashtable.py)."""

    def test_matches_individual_builds(self, rng):
        """Each combined-built table answers lookups identically to a
        table built alone; dedup levels list the same coordinate SETS as
        build_table_dedup (order may differ: claim order depends on the
        bucket space)."""
        from lidarreg.sparse.hashtable import (
            build_table_dedup,
            build_tables_ragged,
            lookup,
        )

        V = 2048
        c0 = np.unique(
            rng.integers(-60, 60, (V, 3)).astype(np.int32), axis=0
        )
        full = np.zeros((V, 3), np.int32)
        full[: len(c0)] = c0
        c1 = jnp.asarray(full)
        v1 = jnp.asarray(np.arange(V) < len(c0))
        q2 = (c1 // 2) * 2
        q4 = (c1 // 4) * 4
        tables, outs = build_tables_ragged([
            (c1, v1, 32768, None),
            (q2, v1, 16384, 1024),
            (q4, v1, 8192, 512),
        ])
        assert outs[0] is None
        # level 0: every valid coord findable at its own row
        rows = np.asarray(lookup(tables[0], c1))
        vm = np.asarray(v1)
        np.testing.assert_array_equal(rows[vm], np.arange(V)[vm])
        # dedup levels: same sets as the standalone dedup build; each
        # listed coord findable at its own row in the combined-built table
        for tab, (oc, ov), q, size, capk in (
            (tables[1], outs[1], q2, 16384, 1024),
            (tables[2], outs[2], q4, 8192, 512),
        ):
            _, ref_c, ref_v = build_table_dedup(q, v1, size, capk)
            got = set(map(tuple, np.asarray(oc)[np.asarray(ov)]))
            want = set(map(tuple, np.asarray(ref_c)[np.asarray(ref_v)]))
            assert got == want
            n = int(np.asarray(ov).sum())
            found = np.asarray(lookup(tab, oc[:n]))
            np.testing.assert_array_equal(found, np.arange(n))
        # misses stay misses across every level
        absent = jnp.asarray([[401, 0, 0], [0, 403, 1]], jnp.int32)
        for tab in tables:
            assert np.all(np.asarray(lookup(tab, absent)) == -1)

    def test_grouped_ragged_probe_over_combined_tables(self, rng):
        from lidarreg.sparse.hashtable import (
            build_tables_ragged,
            lookup,
            lookup_grouped_ragged,
        )

        V = 1024
        c0 = np.unique(
            rng.integers(-40, 40, (V, 3)).astype(np.int32), axis=0
        )
        full = np.zeros((V, 3), np.int32)
        full[: len(c0)] = c0
        c1 = jnp.asarray(full)
        v1 = jnp.asarray(np.arange(V) < len(c0))
        tables, _ = build_tables_ragged([
            (c1, v1, 16384, None),
            ((c1 // 2) * 2, v1, 8192, 512),
        ])
        queries = [
            (0, jnp.asarray(
                rng.integers(-45, 45, (5, 100, 3)).astype(np.int32))),
            (1, (jnp.asarray(
                rng.integers(-45, 45, (300, 3)).astype(np.int32)) // 2) * 2),
        ]
        got = lookup_grouped_ragged(tables, queries)
        for (lvl, q), g in zip(queries, got):
            np.testing.assert_array_equal(
                np.asarray(g), np.asarray(lookup(tables[lvl], q))
            )

    def test_all_invalid(self, rng):
        from lidarreg.sparse.hashtable import build_tables_ragged, lookup

        c = jnp.asarray(rng.integers(-8, 8, (256, 3)).astype(np.int32))
        v = jnp.zeros(256, bool)
        tables, outs = build_tables_ragged([
            (c, v, 4096, None), ((c // 2) * 2, v, 4096, 128),
        ])
        assert not bool(np.asarray(outs[1][1]).any())
        for tab in tables:
            assert np.all(np.asarray(lookup(tab, c)) == -1)


class TestClaimRoundSchedules:
    """Round-5 build options: reduced claim rounds, unique_coords fast
    path, and the overflow-flag post-pass (the flag must survive an empty
    last lane, which reduced schedules can produce)."""

    def test_reduced_rounds_exact_at_product_sizing(self, rng):
        from lidarreg.sparse.hashtable import build_table, lookup

        n = 4096
        coords = jnp.asarray(
            rng.choice(60 * 60 * 20, size=n, replace=False)
        )
        coords = jnp.stack(
            [coords % 60, (coords // 60) % 60, coords // 3600], axis=1
        ).astype(jnp.int32)
        valid = jnp.asarray(rng.uniform(size=n) < 0.9)
        size = 1
        while size < 16 * n:
            size *= 2
        for unique in (False, True):
            tab, placed = build_table(coords, valid, size, rounds=(3, 2),
                                      unique_coords=unique)
            assert bool(jnp.all(placed == valid)), f"unique={unique}"
            got = np.asarray(lookup(tab, coords))
            exp = np.where(np.asarray(valid), np.arange(n), -1)
            np.testing.assert_array_equal(got, exp)

    def test_flag_postpass_tight_table(self, rng):
        # a table at 1x sizing (load 1.0 at 4 lanes) forces heavy side-2
        # spill under the (3, 2) schedule: buckets whose last lane stays
        # EMPTY must still carry the overflow flag or their side-2
        # residents become unfindable
        from lidarreg.sparse.hashtable import build_table, lookup

        n = 512
        coords = jnp.asarray(
            rng.choice(40 * 40 * 12, size=n, replace=False)
        )
        coords = jnp.stack(
            [coords % 40, (coords // 40) % 40, coords // 1600], axis=1
        ).astype(jnp.int32)
        valid = jnp.ones((n,), bool)
        tab, placed = build_table(coords, valid, 1024, rounds=(2, 4))
        got = np.asarray(lookup(tab, coords, retry_capacity=4096))
        pl = np.asarray(placed)
        np.testing.assert_array_equal(got[pl], np.arange(n)[pl])
        assert pl.mean() > 0.9  # two sides absorb nearly everything

    def test_reduced_rounds_match_exhaustive_lookups(self, rng):
        from lidarreg.sparse.hashtable import build_table, lookup

        n = 2048
        coords = jnp.asarray(
            rng.integers(-40, 40, (n, 3)).astype(np.int32)
        )  # duplicates likely
        valid = jnp.ones((n,), bool)
        size = 1
        while size < 16 * n:
            size *= 2
        t_full, p_full = build_table(coords, valid, size)
        t_red, p_red = build_table(coords, valid, size, rounds=(3, 2))
        q = jnp.asarray(rng.integers(-45, 45, (4096, 3)).astype(np.int32))
        a = np.asarray(lookup(t_full, q))
        b = np.asarray(lookup(t_red, q))
        # duplicate coords may resolve to a different (equal-coord) winner
        # row; compare the COORDS each lookup resolves to
        ca = np.where(a[:, None] >= 0, np.asarray(coords)[a], -999)
        cb = np.where(b[:, None] >= 0, np.asarray(coords)[b], -999)
        np.testing.assert_array_equal(ca, cb)

    def test_ragged_reduced_rounds(self, rng):
        from lidarreg.sparse.hashtable import (
            build_tables_ragged, lookup,
        )

        c = jnp.asarray(rng.integers(-32, 32, (1024, 3)).astype(np.int32))
        v = jnp.asarray(rng.uniform(size=1024) < 0.95)
        (t0, t1), outs = build_tables_ragged(
            [(c, v, 16384, None), ((c // 2) * 2, v, 16384, 1024)],
            rounds=(3, 2),
        )
        # level 1's coord list + table agree (dedup semantics)
        oc, ov = outs[1]
        rows = np.asarray(lookup(t1, oc))
        nvalid = int(np.asarray(ov).sum())
        np.testing.assert_array_equal(rows[:nvalid], np.arange(nvalid))


class TestRetryPoolPressure:
    """Round-5 root-cause regression: the grouped probe's block-compacted
    side-2 retry pool must cover the flag population the shipped
    claim-round schedule produces at the pair-batched 65k scale. A reduced
    side-1 schedule ((3, 2)) inflates flagged buckets ~20x, saturates the
    pool, and SILENTLY mis-resolves neighbors (184 wrong rows -> 0.31
    feature delta in the round-5 A/B) — the ADVICE r4 item 1 failure mode."""

    def _l0_probe_errors(self, rounds):
        from lidarreg.data.adapters import synthesize_lidar_scene
        from lidarreg.models.fcgf import ResUNetBN2C
        from lidarreg.ops import voxelize_points
        from lidarreg.sparse.conv import stride1_queries
        from lidarreg.sparse.hashtable import (
            build_table, lookup, lookup_grouped_ragged,
        )
        from lidarreg.sparse.tensor import kernel_offsets

        cap = 65536
        pts = synthesize_lidar_scene(np.random.default_rng(7), cap * 4)
        v = voxelize_points(jnp.asarray(pts), 0.3, cap)
        size = 1
        while size < 16 * cap:
            size *= 2
        tab, _ = build_table(v.coords, v.valid, size, rounds=rounds,
                             unique_coords=True)
        W = tab.table.shape[1]
        T = int(tab.mask) + 1
        flags = int(
            ((np.asarray(tab.table[:T, W - 1]) & (1 << 30)) != 0).sum()
        )
        q = stride1_queries(v.coords, kernel_offsets(5, 1, 3))
        got = lookup_grouped_ragged([tab], [(0, q)])[0]
        ref = lookup(tab, q, retry_capacity=1 << 22)
        wrong = int((np.asarray(got) != np.asarray(ref)).sum())
        return flags, wrong

    def test_default_schedule_probe_exact_at_65k(self):
        from lidarreg.models.fcgf import ResUNetBN2C

        rounds = tuple(ResUNetBN2C().build_rounds)
        assert rounds[0] == 4, (
            "side-1 must stay exhaustive — see build_rounds docstring"
        )
        flags, wrong = self._l0_probe_errors(rounds)
        assert wrong == 0, (flags, wrong)
        assert flags < 16, f"flag population blew up: {flags}"

    def test_reduced_side1_saturates_pool(self):
        # negative control: the machinery detects the failure this test
        # class guards against (otherwise a pool regression could hide)
        flags, wrong = self._l0_probe_errors((3, 2))
        assert flags > 16, flags
        assert wrong > 0, "pool saturation no longer reproduces at 65k; "\
            "if the pool grew, update TestRetryPoolPressure"
