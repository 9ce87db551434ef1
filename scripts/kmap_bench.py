"""Kernel-map construction bench: hash-table design variants (TPU).

Times the REAL km1_c1 workload (k=5 stencil over a 65k LiDAR-like voxel
set) under each table geometry, plus the table build, in one jit per
variant. Decides the production bucket width (lanes) and whether the
symmetric-stencil halving pays.
"""
import sys
import time

import numpy as np


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


def main(cap=65536):
    import jax
    import jax.numpy as jnp

    from lidarreg.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from lidarreg.data.pipeline import prepare_pair_sparse_input
    from lidarreg.sparse.conv import kernel_map, kernel_map_stride1
    from lidarreg.sparse.hashtable import build_table
    from lidarreg.sparse.tensor import kernel_offsets

    sys.path.insert(0, "/root/repo")
    from bench import build_pair

    rng = np.random.default_rng(51)
    cloud_a, cloud_b, _ = build_pair(rng)
    st, _, _ = prepare_pair_sparse_input(
        jnp.asarray(cloud_a), jnp.asarray(cloud_b), 0.3, cap // 2
    )
    coords, valid = st.coords, st.valid
    print(f"cap={cap} valid={int(valid.sum())}", flush=True)

    size = 1
    while size < 4 * cap:
        size *= 2
    offs = kernel_offsets(5, 1, 3)

    for lanes in (4, 8, 16, 32):
        def build(coords, valid, lanes=lanes):
            t, placed = build_table(coords, valid, size, lanes=lanes)
            return t.table, placed

        bj = jax.jit(build)
        ms_build = timed(bj, coords, valid)
        tab_arr, placed = bj(coords, valid)
        n_placed = int(jnp.sum(placed))
        from lidarreg.sparse.hashtable import HashTable

        table = HashTable(tab_arr, jnp.int32(size // lanes - 1))

        def km_full(coords, valid, table=table):
            m = kernel_map(table, valid, coords, valid, offs)
            return m.nb.sum() + m.hit.sum()

        def km_half(coords, valid, table=table):
            m = kernel_map_stride1(table, valid, coords, offs)
            return m.nb.sum() + m.hit.sum()

        ms_full = timed(jax.jit(km_full), coords, valid)
        ms_half = timed(jax.jit(km_half), coords, valid)
        print(
            f"lanes={lanes:2d}: build={ms_build:6.1f} ms  "
            f"km125_full={ms_full:6.1f} ms  km125_sym={ms_half:6.1f} ms  "
            f"placed={n_placed}",
            flush=True,
        )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 65536)
