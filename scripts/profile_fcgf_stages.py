"""Per-stage cost breakdown of the FCGF forward (TPU, jitted min-of-5).

Splits the ResUNetBN2C forward into (a) table builds, (b) kernel-map
lookups, (c) conv gather+matmul stack, by timing jitted prefixes of the
real forward machinery (eager per-op timers mislead on the tunneled chip —
CLAUDE.md). Used to write the BASELINE.md roofline section.
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
    return min(ts), out


def main(cap=65536):
    import jax
    import jax.numpy as jnp

    from lidarreg.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()

    from lidarreg.models.fcgf import ResUNetBN2C
    from lidarreg.ops import voxelize_points
    from lidarreg.sparse.conv import (
        invert_kernel_map,
        kernel_map,
        kernel_map_stride1,
        table_for,
    )
    from lidarreg.sparse.hashtable import build_table
    from lidarreg.sparse.tensor import (
        SparseTensor,
        downsample_coords,
        kernel_offsets,
    )

    sys.path.insert(0, "/root/repo")
    from bench import build_pair

    rng = np.random.default_rng(51)
    cloud_a, cloud_b, _ = build_pair(rng)
    if cap > 32768:
        from lidarreg.data.pipeline import prepare_pair_sparse_input

        st, _, _ = prepare_pair_sparse_input(
            jnp.asarray(cloud_a), jnp.asarray(cloud_b), 0.3, cap // 2
        )
    else:
        va = voxelize_points(jnp.asarray(cloud_a), 0.3, cap)
        st = SparseTensor(
            va.coords, jnp.ones((cap, 1), jnp.float32), va.valid, 1
        )
    print(f"cap={st.capacity} valid={int(st.valid.sum())}", flush=True)

    caps = [max(256, st.capacity // d) for d in (1, 1, 2, 4)]

    def coords_stage(coords, valid):
        c1, v1 = coords, valid
        c2, v2 = downsample_coords(c1, v1, 1, caps[1])
        c4, v4 = downsample_coords(c2, v2, 2, caps[2])
        c8, v8 = downsample_coords(c4, v4, 4, caps[3])
        return c2, v2, c4, v4, c8, v8

    def mk_table(coords, valid, capacity):
        size = 1
        while size < 4 * capacity:
            size *= 2
        table, _ = build_table(coords, valid, size)
        return table

    def tables_stage(c1, v1, c2, v2, c4, v4, c8, v8):
        return (
            mk_table(c1, v1, st.capacity),
            mk_table(c2, v2, caps[1]),
            mk_table(c4, v4, caps[2]),
            mk_table(c8, v8, caps[3]),
        )

    def km(table, tv, coords, valid, k, units):
        offs = kernel_offsets(k, units, 3)
        if valid is tv:  # same-set stride-1 map (mirrors models/fcgf.py)
            return kernel_map_stride1(table, tv, coords, offs)
        return kernel_map(table, tv, coords, valid, offs)

    def maps_stage(tabs, c1, v1, c2, v2, c4, v4, c8, v8):
        t1, t2, t4, t8 = tabs
        km1_c1 = km(t1, v1, c1, v1, 5, 1)
        km2 = km(t2, v2, c2, v2, 3, 2)
        km4 = km(t4, v4, c4, v4, 3, 4)
        km8 = km(t8, v8, c8, v8, 3, 8)
        km_d12 = km(t1, v1, c2, v2, 3, 1)
        km_d24 = km(t2, v2, c4, v4, 3, 2)
        km_d48 = km(t4, v4, c8, v8, 3, 4)
        km_u84 = invert_kernel_map(km_d48, c4.shape[0])
        km_u42 = invert_kernel_map(km_d24, c2.shape[0])
        km_u21 = invert_kernel_map(km_d12, c1.shape[0])
        return km1_c1, km2, km4, km8, km_d12, km_d24, km_d48, km_u84, km_u42, km_u21

    def km1_only_stage(t1, v1, c1):
        return km(t1, v1, c1, v1, 5, 1)

    coords_j = jax.jit(coords_stage)
    t_coords, (c2, v2, c4, v4, c8, v8) = timed(coords_j, st.coords, st.valid)
    print(f"downsample_coords x3: {t_coords*1e3:8.1f} ms", flush=True)

    tables_j = jax.jit(tables_stage)
    t_tables, tabs = timed(
        tables_j, st.coords, st.valid, c2, v2, c4, v4, c8, v8
    )
    print(f"table builds x4:      {t_tables*1e3:8.1f} ms", flush=True)

    km1_j = jax.jit(km1_only_stage)
    t_km1, _ = timed(km1_j, tabs[0], st.valid, st.coords)
    print(f"km1_c1 (125 offs):    {t_km1*1e3:8.1f} ms", flush=True)

    maps_j = jax.jit(maps_stage)
    t_maps, _ = timed(maps_j, tabs, st.coords, st.valid, c2, v2, c4, v4, c8, v8)
    print(f"all kernel maps:      {t_maps*1e3:8.1f} ms", flush=True)

    model = ResUNetBN2C()
    params = model.init(
        jax.random.PRNGKey(0),
        SparseTensor(st.coords, st.feats, st.valid, 1),
        train=False,
    )
    fwd = jax.jit(lambda p, s: model.apply(p, s, train=False).feats)
    t_fwd, _ = timed(fwd, params, st)
    print(f"FULL forward:         {t_fwd*1e3:8.1f} ms", flush=True)
    print(
        f"-> conv/BN remainder: {(t_fwd - t_maps - t_tables - t_coords)*1e3:8.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 65536)
