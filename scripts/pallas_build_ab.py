"""A/B the pallas single-pass structure build against the fused XLA path.

Times, at FCGF forward shapes, the full structure-build half the roofline
ledger prices (BASELINE.md): downsample levels + four hash tables. XLA side
= downsample_pyramid + vmapped build_table (the fused_build path measured
at 57.6 ms @32k on v5e); pallas side = build_unet_structures. Also checks
cross-path parity: identical level coordinate SETS and mutually-consistent
table lookups.

Usage: python scripts/pallas_build_ab.py [n_voxels ...]
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lidarreg.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from lidarreg.ops import voxelize_points
from lidarreg.sparse.hashtable import build_table, lookup
from lidarreg.sparse.pallas_build import build_unet_structures
from lidarreg.sparse.tensor import downsample_pyramid


def timeit(fn, n=5):
    jax.block_until_ready(fn())
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    sizes = [int(a) for a in sys.argv[1:]] or [32768, 65536]
    rng = np.random.default_rng(0)
    for cap in sizes:
        pts = rng.uniform(-70, 70, (cap * 2, 3)).astype(np.float32)
        res = voxelize_points(jnp.asarray(pts), 0.3, cap)
        coords, valid = res.coords, res.valid
        caps = [cap, cap, cap // 2, cap // 4]

        # ---- XLA fused path (downsample_pyramid + vmapped build_table) ----
        size = 1
        while size < 16 * cap:
            size *= 2

        @jax.jit
        def xla_build(coords, valid):
            levels = downsample_pyramid(coords, valid, 1, caps[1:])

            def padto(c, v):
                p = cap - c.shape[0]
                if p:
                    c = jnp.concatenate(
                        [c, jnp.zeros((p, c.shape[1]), jnp.int32)]
                    )
                    v = jnp.concatenate([v, jnp.zeros((p,), bool)])
                return c, v

            pcs, pvs = zip(*([(coords, valid)]
                             + [padto(c, v) for c, v in levels]))
            tabs, _ = jax.vmap(
                lambda c, v: build_table(c, v, size)
            )(jnp.stack(pcs), jnp.stack(pvs))
            return tabs, levels

        @jax.jit
        def pl_build(coords, valid):
            return build_unet_structures(coords, valid, 1, caps)

        t_xla = timeit(lambda: xla_build(coords, valid))
        t_pl = timeit(lambda: pl_build(coords, valid))
        print(f"cap={cap}: XLA fused build {t_xla*1e3:7.1f} ms | "
              f"pallas build {t_pl*1e3:7.1f} ms "
              f"({t_xla/t_pl:.2f}x)", flush=True)

        # ---- parity: level coord sets + table resolution ------------------
        _, xl = xla_build(coords, valid)
        ptabs, plevels, placed0 = pl_build(coords, valid)
        cv, vv = np.asarray(coords), np.asarray(valid)
        assert np.asarray(placed0)[vv].all()
        r0 = np.asarray(lookup(ptabs[0], coords))
        assert (r0[vv] == np.arange(cap)[vv]).all(), "level-0 index map"
        for k, ((xc, xv), (pc, pv)) in enumerate(zip(xl, plevels), 1):
            xs = {tuple(r) for r in np.asarray(xc)[np.asarray(xv)]}
            ps = {tuple(r) for r in np.asarray(pc)[np.asarray(pv)]}
            assert xs == ps, f"level {k}: set mismatch ({len(xs)} vs {len(ps)})"
            rows = np.asarray(lookup(ptabs[k], pc))[np.asarray(pv)]
            assert (rows == np.arange(len(np.asarray(pv)))[np.asarray(pv)]).all()
        print(f"cap={cap}: parity OK "
              f"(levels {[int(np.asarray(v).sum()) for _, v in plevels]})",
              flush=True)


if __name__ == "__main__":
    main()
