"""v5e gather-rate microbenchmark: is the kernel-map probe row-rate bound?

The structure build issues ~10.5M random bucket-row gathers per 65k
pair-batched forward (the k=5 stem alone is 125 x 65k = 8.1M rows), and
the round-2 rule of thumb says random gathers cost ~35 ms per 4M rows
REGARDLESS of row width. If that holds at wider rows, a tiled two-level
probe (hash 4^3-cell tiles, gather 8 wide tile rows per voxel instead of
125 narrow bucket rows, then extract in-register) cuts probe cost ~10x.

Measurement notes (round-5 probe post-mortem, BASELINE.md):
  * per-call `block_until_ready` can return BEFORE execution on the
    tunneled backend for static programs — every timing here forces a
    small np.asarray fetch, streamed `depth` calls at a time to amortize
    the ~20-30 ms fetch RTT;
  * a bare `sum(t[idx])` is algebraically rewritable (counts @ table —
    reads the table once instead of gathering) and a per-row reduce
    commutes with the gather, so every kernel reduces the gathered row
    against a QUERY-dependent mask (`^ idx`), the same
    compare-gathered-key-to-query shape the real hash probe has, which
    XLA cannot hoist to the table side.

Measures, min-of-5 streamed:
  a. random row gathers at widths 4/20/80/272 B from a 1M-row table
     -> the row-rate vs byte-rate crossover;
  b. take_along_axis [V, 512] -> [V, 125] with per-row dynamic minor-dim
     indices -> the tile-extraction primitive;
  c. one-hot MXU extraction (bf16 einsum) — the matmul alternative.

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


def t_ms(fn, *args, n=5, depth=4):
    """Streamed fetch-forced min-of-n: `depth` calls in flight with a
    fresh int32 salt each (identical-args calls can be deduped), ONE
    fetch of every [small] output, per-call time = wall / depth."""
    _ = np.asarray(fn(*args, jnp.int32(0)))
    ts = []
    for trial in range(n):
        t0 = time.perf_counter()
        outs = [fn(*args, jnp.int32(1 + trial * depth + k))
                for k in range(depth)]
        _ = [np.asarray(o) for o in outs]
        ts.append((time.perf_counter() - t0) / depth)
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

            # reduce each gathered row against its QUERY id (t[i] ^ i):
            # not hoistable to the table side, so the gather must happen;
            # output [8, 128] keeps the fetch tiny
            def probe(t, i, salt, q=q):
                ii = (i + salt) & jnp.int32(n_rows_table - 1)
                rows = jnp.min(t[ii] ^ ii[:, None], axis=1)   # [q]
                return jnp.min(rows.reshape(8, 128, -1), axis=2)

            ms = t_ms(jax.jit(probe), tab, idx)
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
        rows_v = jnp.arange(v, dtype=jnp.int32)

        def extract(t, s, salt, v=v):
            got = jnp.take_along_axis(t, (s + salt) % 512, axis=1)
            red = jnp.min(got ^ rows_v[:, None], axis=1)      # [v]
            return jnp.min(red.reshape(8, 128, -1), axis=2)

        ms = t_ms(jax.jit(extract), tiles, sel)
        print(f"take_along_axis [{v},512]->[{v},125]: {ms:7.2f} ms "
              f"({v*125/ms/1e3:7.0f} elts/us)", flush=True)

        # control: same extraction as a flat global gather
        flat = tiles.reshape(-1)
        gsel = (rows_v[:, None] * 512 + sel).reshape(-1)

        def gflat(t, s, salt, v=v):
            ss = (s // 512) * 512 + (s + salt) % 512
            red = jnp.min(
                (t[ss] ^ ss).reshape(v, 125), axis=1
            )
            return jnp.min(red.reshape(8, 128, -1), axis=2)

        ms2 = t_ms(jax.jit(gflat), flat, gsel)
        print(f"  flat-gather control:            {ms2:7.2f} ms", flush=True)

    # ---- c. one-hot MXU extraction (bf16) — the matmul alternative -------
    v = 32768
    tilesf = jnp.asarray(
        rng.integers(0, 100, size=(v, 512)).astype(np.float32)
    )
    sel = jnp.asarray(rng.integers(0, 512, size=(v, 125)).astype(np.int32))
    rows_vf = jnp.arange(v, dtype=jnp.float32)

    def onehot_extract(t, s, salt):
        oh = jax.nn.one_hot((s + salt) % 512, 512, dtype=jnp.bfloat16)
        got = jnp.einsum("vks,vs->vk", oh, t.astype(jnp.bfloat16))
        red = jnp.min(got.astype(jnp.float32) + rows_vf[:, None], axis=1)
        return jnp.min(red.reshape(8, 128, -1), axis=2)

    ms = t_ms(jax.jit(onehot_extract), tilesf, sel)
    print(f"one-hot einsum extract [{v}]:     {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
