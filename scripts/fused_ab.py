"""A/B the fused structure build (one batched sort + vmapped table builds +
one grouped lookup) against the round-2 serialized path, on the real TPU.

Usage: python scripts/fused_ab.py [n_voxels ...]
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

from lidarreg.models.fcgf import ResUNetBN2C
from lidarreg.ops import voxelize_points
from lidarreg.sparse.tensor import SparseTensor


def timeit(fn, n=5):
    fn()
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
        feats = jnp.ones((cap, 1), jnp.float32) * res.valid[:, None]
        x = SparseTensor(res.coords, feats, res.valid, 1)
        outs = {}
        for fused in (False, True):
            model = ResUNetBN2C(fused_build=fused)
            variables = model.init(jax.random.PRNGKey(0), x, train=False)
            fwd = jax.jit(lambda v, s: model.apply(v, s, train=False))
            t = timeit(lambda: fwd(variables, x).feats)
            outs[fused] = np.asarray(fwd(variables, x).feats)
            print(f"cap={cap} fused={fused}: fwd {t*1e3:.1f} ms", flush=True)
        err = np.abs(outs[True] - outs[False]).max()
        print(f"cap={cap} max|fused - serial| = {err:.2e}", flush=True)

        # fused stage split: jitted prefixes (pyramid; +tables; +grouped
        # lookup) — the roofline ledger's downsample/tables/maps rows
        from lidarreg.sparse.hashtable import build_table, lookup_grouped
        from lidarreg.sparse.tensor import downsample_pyramid
        from lidarreg.sparse.conv import down_queries, stride1_queries
        from lidarreg.sparse.tensor import kernel_offsets

        caps = [cap, cap, cap // 2, cap // 4]
        size = 1
        while size < 16 * cap:
            size *= 2

        def pyramid(c1, v1):
            return downsample_pyramid(c1, v1, 1, caps[1:])

        def tables(c1, v1):
            pyr = pyramid(c1, v1)
            cs, vs = [c1], [v1]
            for c, v in pyr:
                p = cap - c.shape[0]
                if p:
                    c = jnp.concatenate([c, jnp.zeros((p, 3), jnp.int32)])
                    v = jnp.concatenate([v, jnp.zeros((p,), bool)])
                cs.append(c)
                vs.append(v)
            tabs, _ = jax.vmap(lambda c, v: build_table(c, v, size))(
                jnp.stack(cs), jnp.stack(vs))
            return pyr, tabs

        def maps(c1, v1):
            pyr, tabs = tables(c1, v1)
            (c2, _), (c4, _), (c8, _) = pyr
            o1 = kernel_offsets(5, 1)
            rows = lookup_grouped(tabs, [
                (0, stride1_queries(c1, o1)),
                (1, stride1_queries(c2, kernel_offsets(3, 2))),
                (2, stride1_queries(c4, kernel_offsets(3, 4))),
                (3, stride1_queries(c8, kernel_offsets(3, 8))),
                (1, down_queries(c1, 1)[0]),
                (2, down_queries(c2, 2)[0]),
                (3, down_queries(c4, 4)[0]),
            ])
            return rows

        for name, fn in (("pyramid", pyramid), ("pyramid+tables", tables),
                         ("pyramid+tables+maps", maps)):
            jf = jax.jit(lambda c, v, f=fn: f(c, v))
            t = timeit(lambda: jf(x.coords, x.valid))
            print(f"cap={cap} fused stage {name}: {t*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
