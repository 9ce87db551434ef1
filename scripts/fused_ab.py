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
from lidarreg.ops.voxelize import voxelize_points
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


if __name__ == "__main__":
    main()
