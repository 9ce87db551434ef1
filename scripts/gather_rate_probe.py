"""v5e gather-rate microbenchmark: is the kernel-map probe row-rate bound?

The structure build issues ~10.5M random bucket-row gathers per 65k
pair-batched forward (the k=5 stem alone is 125 x 65k = 8.1M rows), and
the round-2 rule of thumb says random gathers cost ~35 ms per 4M rows
REGARDLESS of row width. If that holds at wider rows, a tiled two-level
probe (hash 4^3-cell tiles, gather 8 wide tile rows per voxel instead of
125 narrow bucket rows, then extract in-register) cuts probe cost ~10x.

Measures, min-of-7 jitted (consumed outputs):
  a. random row gathers at widths 4/20/80/272 B from HBM-resident tables
     -> the row-rate vs byte-rate crossover;
  b. take_along_axis [V, 512] -> [V, 125] with per-row dynamic minor-dim
     indices -> the tile-extraction primitive;
  c. the same extraction via reshaped global gather (control).

Usage: python scripts/gather_rate_probe.py
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


def t_ms(fn, *args, n=7):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return 1000 * min(ts)


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(0)

    # ---- a. row-rate sweep ------------------------------------------------
    n_rows_table = 1 << 20                       # 1M-row table
    for q in (1 << 20, 4 << 20):
        idx = jnp.asarray(
            rng.integers(0, n_rows_table, size=q).astype(np.int32)
        )
        for width_ints in (1, 5, 20, 68):
            tab = jnp.asarray(
                rng.integers(0, 100, size=(n_rows_table, width_ints)
                             ).astype(np.int32)
            )
            f = jax.jit(lambda t, i: jnp.sum(t[i], dtype=jnp.int32))
            ms = t_ms(f, tab, idx)
            mb = q * width_ints * 4 / 1e6
            print(f"gather rows={q/1e6:.0f}M width={width_ints*4:3d}B: "
                  f"{ms:7.2f} ms  ({q/ms/1e3:7.0f} rows/us, "
                  f"{mb/ms:6.1f} GB/s)", flush=True)

    # ---- b. minor-dim extraction -----------------------------------------
    for v in (32768, 65536):
        tiles = jnp.asarray(
            rng.integers(0, 100, size=(v, 512)).astype(np.int32)
        )
        sel = jnp.asarray(
            rng.integers(0, 512, size=(v, 125)).astype(np.int32)
        )
        f = jax.jit(
            lambda t, s: jnp.sum(
                jnp.take_along_axis(t, s, axis=1), dtype=jnp.int32
            )
        )
        ms = t_ms(f, tiles, sel)
        print(f"take_along_axis [{v},512]->[{v},125]: {ms:7.2f} ms "
              f"({v*125/ms/1e3:7.0f} elts/us)", flush=True)

        # control: same extraction as a flat global gather
        flat = tiles.reshape(-1)
        gsel = (jnp.arange(v, dtype=jnp.int32)[:, None] * 512 + sel).reshape(-1)
        g = jax.jit(lambda t, s: jnp.sum(t[s], dtype=jnp.int32))
        ms2 = t_ms(g, flat, gsel)
        print(f"  flat-gather control:            {ms2:7.2f} ms", flush=True)

    # ---- c. one-hot MXU extraction (bf16) — the matmul alternative -------
    v = 32768
    tiles = jnp.asarray(rng.integers(0, 100, size=(v, 512)).astype(np.float32))
    sel = jnp.asarray(rng.integers(0, 512, size=(v, 125)).astype(np.int32))

    def onehot_extract(t, s):
        oh = jax.nn.one_hot(s, 512, dtype=jnp.bfloat16)     # [v,125,512]
        return jnp.sum(jnp.einsum("vks,vs->vk", oh, t.astype(jnp.bfloat16)))

    ms = t_ms(jax.jit(onehot_extract), tiles, sel)
    print(f"one-hot einsum extract [{v}]:     {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
