"""Time the DGR register end-to-end and its inlier-net forward alone.

Measures the effect of PrunedKernelMap offset compaction (sparse/conv.py)
on the 6-D ResUNetBN2C inlier net — VERDICT r2 item 3 target: DGR matrix
row <= 3.5 s/pair at unchanged recall/TE.
"""
from __future__ import annotations

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
from lidarreg.solvers.dgr import DGRConfig, make_dgr_register
from lidarreg.sparse.tensor import SparseTensor
from lidarreg.ops.voxelize import quantize_coords

CAP = 16384
VOX = 0.3


def timeit(fn, n=5):
    fn()  # compile
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        jax.block_until_ready(fn())
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    prune = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    rng = np.random.default_rng(0)
    N = CAP
    src = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    t = np.array([3.0, -2.0, 0.3], np.float32)
    inl = rng.random(N) < 0.3
    tgt = np.where(inl[:, None], src @ R.T + t,
                   rng.uniform(-60, 60, (N, 3))).astype(np.float32)

    F0 = jnp.asarray(rng.normal(size=(N, 32)).astype(np.float32))
    F1 = jnp.asarray(np.where(inl[:, None], np.asarray(F0),
                              rng.normal(size=(N, 32))).astype(np.float32))
    xyz0 = jnp.asarray(src)
    xyz1 = jnp.asarray(tgt)
    m = jnp.ones((N,), bool)
    c0 = quantize_coords(xyz0, VOX)
    c1 = quantize_coords(xyz1, VOX)

    model = ResUNetBN2C(dim=6, out_channels=1, conv1_kernel_size=3,
                        normalize_feature=False, prune_offsets=prune)
    dummy = SparseTensor(jnp.zeros((CAP, 6), jnp.int32),
                         jnp.ones((CAP, 1)), jnp.ones((CAP,), bool), 1)
    ivars = model.init(jax.random.PRNGKey(2), dummy, train=False)

    # inlier net forward alone
    fwd = jax.jit(lambda v, s: model.apply(v, s, train=False))
    coords6 = jnp.concatenate([c0, c1], axis=1)
    st6 = SparseTensor(coords6, jnp.ones((CAP, 1)), m, 1)
    t_fwd = timeit(lambda: fwd(ivars, st6).feats)
    print(f"prune={prune}: inlier-net fwd @{CAP}: {t_fwd*1e3:.1f} ms",
          flush=True)

    dgr = make_dgr_register(model, ivars, DGRConfig(voxel_size=VOX))
    key = jax.random.PRNGKey(0)
    t_all = timeit(
        lambda: dgr(F0, F1, xyz0, xyz1, c0, c1, m, m, key).transform
    )
    print(f"prune={prune}: DGR register e2e: {t_all*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
