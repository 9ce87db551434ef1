"""Microbenchmarks for the gather-bound FCGF kernel-map machinery (TPU).

v2: every timed function reduces its result to a scalar INSIDE jit —
big-array outputs on the tunneled chip can report absurdly fast times
(block_until_ready returns before materialization; CLAUDE.md). Variants:

  * XLA row gathers at hash-probe and feature-gather shapes;
  * Pallas `take_along_axis` sublane gather (shape-matched — the only form
    Mosaic can lower) at several table sizes;
  * set-scatter cost (the symmetric-stencil inversion trick);
  * sort costs (merge-based kernel-map alternative).
"""
import time

import numpy as np


def timed(fn, *args, n=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    assert np.ndim(out) == 0, "timed() requires scalar-reduced outputs"
    float(out)  # force D2H
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(jax.device_get(out))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, out


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from lidarreg.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    rng = np.random.default_rng(0)

    # ---------------- XLA row gathers --------------------------------------
    for T, W, N, dt in (
        (262_144, 16, 8_000_000, np.int32),   # km1_c1 probes (65k, both sides)
        (262_144, 16, 1_000_000, np.int32),   # smaller-level probes
        (65_536, 32, 1_769_472, np.float32),  # 27-off feat gather, C=32
        (65_536, 128, 1_769_472, np.float32), # C=128 level
        (65_536, 128, 1_769_472, np.dtype(jnp.bfloat16)),
    ):
        table = jnp.asarray(
            rng.standard_normal((T, W)).astype(np.float32)
        ).astype(dt) if dt != np.int32 else jnp.asarray(
            rng.integers(0, 1 << 30, (T, W), dtype=np.int32)
        )
        idx = jnp.asarray(rng.integers(0, T, (N,), dtype=np.int32))

        @jax.jit
        def g(t, i):
            return jnp.sum(t[i].astype(jnp.float32))

        ms, _ = timed(g, table, idx)
        print(
            f"XLA gather [{T},{W}] {np.dtype(dt).name:8s} x{N//1000:6d}k rows:"
            f" {ms:8.1f} ms  ({ms*1e6/N:6.1f} ns/row)",
            flush=True,
        )

    # ---------------- Pallas sublane gather (shape-matched) ----------------
    for S in (8, 512, 8192, 65536):
        data = jnp.asarray(rng.integers(0, 1 << 30, (S, 128), dtype=np.int32))
        idx = jnp.asarray(rng.integers(0, S, (S, 128), dtype=np.int32))

        def k_taa(d_ref, i_ref, o_ref):
            o_ref[0, 0] = jnp.sum(
                jnp.take_along_axis(d_ref[:], i_ref[:], axis=0)
            )

        try:
            f = pl.pallas_call(
                k_taa,
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec(memory_space=pltpu.SMEM),
                out_shape=jax.ShapeDtypeStruct((1, 1), jnp.int32),
            )
            fj = jax.jit(lambda d, i: f(d, i)[0, 0])
            ms, _ = timed(fj, data, idx)
            nrows = S * 128
            print(
                f"pallas taa [S={S:6d},128]: {ms:8.1f} ms "
                f"({ms*1e6/nrows:8.3f} ns/elem)  ", flush=True,
            )
        except Exception as e:  # noqa: BLE001
            msg = str(e).split("\n")[0][:140]
            print(f"pallas taa [S={S:6d},128]: FAILED — {msg}", flush=True)

    # ---------------- set-scatter (map-inversion trick) --------------------
    V = 65_536
    tgt = jnp.asarray(rng.integers(0, V, (V,), dtype=np.int32))
    vals = jnp.asarray(rng.integers(0, V, (V,), dtype=np.int32))

    @jax.jit
    def scat62(t, v):
        def body(c, _):
            z = jnp.zeros((V,), jnp.int32).at[t].set(v + c, mode="drop")
            return c + z[0], None

        c, _ = jax.lax.scan(body, jnp.int32(0), None, length=62)
        return c

    ms, _ = timed(scat62, tgt, vals)
    print(f"62x set-scatter [65k]:        {ms:8.1f} ms", flush=True)

    # ---------------- sorts -------------------------------------------------
    keys = jnp.asarray(rng.integers(0, 1 << 60, (131_072,), dtype=np.int64))

    @jax.jit
    def s1(k):
        return jnp.sort(k)[0]

    ms, _ = timed(s1, keys)
    print(f"sort 131k int64:              {ms:8.1f} ms", flush=True)

    pay = jnp.asarray(rng.integers(0, 1 << 30, (131_072,), dtype=np.int32))

    @jax.jit
    def s2(k, p):
        ks, ps = jax.lax.sort([k, p], num_keys=1)
        return ks[0] + ps[0].astype(jnp.int64)

    ms, _ = timed(s2, keys, pay)
    print(f"sort 131k int64+payload:      {ms:8.1f} ms", flush=True)


if __name__ == "__main__":
    main()
