"""Per-stage cost of the 6-D DGR inlier-net forward (TPU, jitted min-of-5).

Mirrors ResUNetBN2C(dim=6)'s internal structure: coordinate downsampling,
table builds, kernel-map lookups, map pruning, then the full forward —
each as a jitted prefix — to locate the post-pruning floor.
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
from lidarreg.sparse.conv import (
    invert_kernel_map,
    kernel_map_down,
    kernel_map_stride1,
    prune_kernel_map,
)
from lidarreg.sparse.hashtable import build_table
from lidarreg.sparse.tensor import (
    SparseTensor,
    downsample_coords,
    kernel_offsets,
)

CAP = 16384


def timed(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts), out


def main():
    rng = np.random.default_rng(0)
    src = rng.uniform(-60, 60, (CAP, 3)).astype(np.float32)
    inl = rng.random(CAP) < 0.3
    tgt = np.where(inl[:, None], src, rng.uniform(-60, 60, (CAP, 3)))
    c0 = np.floor(src / 0.3).astype(np.int32)
    c1 = np.floor(tgt / 0.3).astype(np.int32)
    coords = jnp.asarray(np.concatenate([c0, c1], 1))
    valid = jnp.ones((CAP,), bool)

    caps = [max(256, CAP // d) for d in (1, 1, 2, 4)]

    @jax.jit
    def coords_stage(c1_, v1_):
        c2, v2 = downsample_coords(c1_, v1_, 1, caps[1])
        c4, v4 = downsample_coords(c2, v2, 2, caps[2])
        c8, v8 = downsample_coords(c4, v4, 4, caps[3])
        return c2, v2, c4, v4, c8, v8

    def mk_table(c, v, capn):
        size = 1
        while size < 16 * capn:
            size *= 2
        t, _ = build_table(c, v, size)
        return t

    @jax.jit
    def tables_stage(c1_, v1_, c2, v2, c4, v4, c8, v8):
        return (mk_table(c1_, v1_, CAP), mk_table(c2, v2, caps[1]),
                mk_table(c4, v4, caps[2]), mk_table(c8, v8, caps[3]))

    @jax.jit
    def maps_stage(tabs, c1_, v1_, c2, v2, c4, v4, c8, v8):
        t1, t2, t4, t8 = tabs
        offs = lambda u: kernel_offsets(3, u, 6)  # noqa: E731
        km1 = kernel_map_stride1(t1, v1_, c1_, offs(1))
        km2 = kernel_map_stride1(t2, v2, c2, offs(2))
        km4 = kernel_map_stride1(t4, v4, c4, offs(4))
        km8 = kernel_map_stride1(t8, v8, c8, offs(8))
        d12 = kernel_map_down(t2, c1_, v1_, c2.shape[0], 1)
        d24 = kernel_map_down(t4, c2, v2, c4.shape[0], 2)
        d48 = kernel_map_down(t8, c4, v4, c8.shape[0], 4)
        u84 = invert_kernel_map(d48, c4.shape[0])
        u42 = invert_kernel_map(d24, c2.shape[0])
        u21 = invert_kernel_map(d12, c1_.shape[0])
        return km1, km2, km4, km8, d12, d24, d48, u84, u42, u21

    @jax.jit
    def prune_stage(maps):
        return tuple(prune_kernel_map(m, 64, 2048) for m in maps)

    t_c, cc = timed(coords_stage, coords, valid)
    print(f"downsample_coords x3:   {t_c*1e3:7.1f} ms", flush=True)
    c2, v2, c4, v4, c8, v8 = cc
    t_t, tabs = timed(tables_stage, coords, valid, *cc)
    print(f"table builds x4:        {t_t*1e3:7.1f} ms", flush=True)
    t_m, maps = timed(maps_stage, tabs, coords, valid, *cc)
    print(f"kernel maps (10):       {t_m*1e3:7.1f} ms", flush=True)
    t_p, _ = timed(prune_stage, maps)
    print(f"prune x10:              {t_p*1e3:7.1f} ms", flush=True)

    model = ResUNetBN2C(dim=6, out_channels=1, conv1_kernel_size=3,
                        normalize_feature=False, prune_offsets=64)
    st6 = SparseTensor(coords, jnp.ones((CAP, 1)), valid, 1)
    var = model.init(jax.random.PRNGKey(2), st6, train=False)
    fwd = jax.jit(lambda v, s: model.apply(v, s, train=False))
    t_f, _ = timed(lambda: fwd(var, st6).feats)
    print(f"full forward:           {t_f*1e3:7.1f} ms", flush=True)
    print(f"  (structs total:       "
          f"{(t_c+t_t+t_m+t_p)*1e3:7.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
