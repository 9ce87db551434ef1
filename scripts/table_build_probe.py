"""Structure-build roofline probes (run on the real TPU when idle).

BASELINE.md round-3 roofline: the FCGF forward is structure-build-bound —
tables 46 ms + downsample 34 ms measured vs ~8 ms at pure scatter rate.
This script measures candidate reductions IN ISOLATION before any engine
change:

  A. build_table as-is (8 claim rounds) per level;
  B. claim-round truncation: how many keys remain unplaced after each
     round at the factor-16 sizing (if ~0 after 2, rounds 3-8 can become
     a tiny block-compacted straggler pass);
  C. downsample_coords as-is (3-key lax.sort) vs a packed 2-key sort vs
     a 1-key 62-bit split pack.

Prints one line per probe: name, ms (jitted min-of-5, block_until_ready).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3


def main():
    from lidarreg.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from bench import build_pair
    from lidarreg.ops import voxelize_points
    from lidarreg.sparse.hashtable import build_table, _h1, _h2
    from lidarreg.sparse.tensor import downsample_coords

    print("backend:", jax.default_backend())
    rng = np.random.default_rng(51)
    cloud, _, _ = build_pair(rng)
    v = voxelize_points(jnp.asarray(cloud), 0.3, 32768)
    c1, v1 = v.coords, v.valid
    c2, v2 = downsample_coords(c1, v1, 1, 32768)
    c4, v4 = downsample_coords(c2, v2, 2, 16384)
    c8, v8 = downsample_coords(c4, v4, 4, 8192)
    levels = [("L1", c1, v1), ("L2", c2, v2), ("L4", c4, v4), ("L8", c8, v8)]

    # ---- A: current builds ------------------------------------------------ #
    for name, cc, vv in levels:
        tsize = 1 << int(np.ceil(np.log2(max(16 * cc.shape[0], 64))))
        f = jax.jit(lambda c, m, t=tsize: build_table(c, m, t))
        print(f"A build {name} (size {tsize}): {timed(f, cc, vv):7.2f} ms")

    # ---- B: unplaced keys per claim round (correctness headroom) ---------- #
    @jax.jit
    def unplaced_after(coords, valid, rounds: int, tsize: int):
        lanes = 4
        T = tsize // lanes
        mask = jnp.int32(T - 1)
        idx = jnp.arange(coords.shape[0], dtype=jnp.int32)
        b1 = _h1(coords, mask)
        unplaced = valid
        for lane in range(min(rounds, lanes)):
            wb = jnp.where(unplaced, b1, T)
            claim = jnp.full((T,), -1, jnp.int32).at[wb].set(idx, mode="drop")
            winner = claim[b1]
            dup = (
                unplaced & (winner >= 0)
                & jnp.all(coords[jnp.maximum(winner, 0)] == coords, axis=-1)
            )
            unplaced = unplaced & ~dup
        return jnp.sum(unplaced.astype(jnp.int32))

    for name, cc, vv in levels:
        tsize = 1 << int(np.ceil(np.log2(max(16 * cc.shape[0], 64))))
        rem = [int(unplaced_after(cc, vv, r, tsize)) for r in (1, 2, 3, 4)]
        print(f"B {name}: unplaced after rounds 1..4 = {rem}")

    # ---- C: downsample variants ------------------------------------------ #
    f0 = jax.jit(lambda c, m: downsample_coords(c, m, 1, 32768))
    print(f"C downsample 3-key sort: {timed(f0, c1, v1):7.2f} ms")

    @jax.jit
    def ds_packed2(coords, valid):
        q = jnp.where(valid[:, None], (coords // 2) * 2, jnp.int32(2**30 - 2))
        # key0 = x; key1 = (y + 2^14) << 16 | (z + 2^14): |y|,|z| < 2^13 in
        # any voxelized LiDAR scene at stride<=8 (pair offset rides x only)
        k0 = q[:, 0]
        k1 = ((q[:, 1] + (1 << 14)) << 15) | (q[:, 2] + (1 << 14))
        s0, s1 = jax.lax.sort([k0, k1], num_keys=2)
        y = (s1 >> 15) - (1 << 14)
        z = (s1 & jnp.int32((1 << 15) - 1)) - (1 << 14)
        qs = jnp.stack([s0, y, z], axis=1)
        diff = jnp.any(qs[1:] != qs[:-1], axis=1)
        newrun = jnp.concatenate([jnp.ones((1,), bool), diff])
        real = qs[:, 0] != jnp.int32(2**30 - 2)
        newrun = newrun & real
        slot = jnp.cumsum(newrun.astype(jnp.int32)) - 1
        count = jnp.sum(newrun.astype(jnp.int32))
        out = jnp.zeros((32768, 3), jnp.int32)
        write = jnp.where(newrun, slot, 32768)
        out = out.at[write].set(qs, mode="drop")
        return out, jnp.arange(32768) < jnp.minimum(count, 32768)

    o0, m0 = f0(c1, v1)
    o1, m1 = ds_packed2(c1, v1)
    same = bool(
        jnp.array_equal(jnp.where(m0[:, None], o0, 0),
                        jnp.where(m1[:, None], o1, 0))
        & jnp.array_equal(m0, m1)
    )
    print(f"C downsample 2-key pack: {timed(ds_packed2, c1, v1):7.2f} ms "
          f"(matches 3-key: {same})")


if __name__ == "__main__":
    main()
