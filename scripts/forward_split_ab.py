"""Two-program forward split A/B on the real TPU (VERDICT r4 item 1).

The match/solve split won 38 ms/pair by letting XLA schedule two small
programs instead of one big one (BASELINE.md round-4 protocol). This
measures the same surgery on the FCGF forward: dispatch
`ResUNetBN2C.build_structures` (tables + kernel maps — pure int/bool) as
its own jitted program and feed the conv stack through `structures=`.

Rows per cap: single fused program (the shipped default), build program
alone, conv program alone, and the two-dispatch total (back-to-back, one
block at the end — the streaming pattern). Parity asserted bit-exact.

Usage: python scripts/forward_split_ab.py [caps ...]
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


def timeit(fn, *args, n=7, ready=lambda o: o):
    out = fn(*args)
    jax.block_until_ready(ready(out))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(ready(out))
        ts.append(time.perf_counter() - t0)
    return 1000 * min(ts), out


def main():
    caps = [int(a) for a in sys.argv[1:]] or [32768, 65536]
    rng = np.random.default_rng(0)
    from lidarreg.data.adapters import synthesize_lidar_scene

    for cap in caps:
        pts = synthesize_lidar_scene(rng, cap * 4)
        v = voxelize_points(jnp.asarray(pts), 0.3, cap)
        st = SparseTensor(coords=v.coords, feats=jnp.ones((cap, 1)),
                          valid=v.valid, stride=1)

        model = ResUNetBN2C()   # shipped defaults
        params = model.init(jax.random.PRNGKey(0), st, train=False)

        fused = jax.jit(lambda p, s: model.apply(p, s, train=False))
        build = jax.jit(model.build_structures)
        conv = jax.jit(
            lambda p, s, z: model.apply(p, s, train=False, structures=z)
        )

        ms_fused, out_f = timeit(fused, params, st, ready=lambda o: o.feats)
        ms_build, structs = timeit(build, st)
        ms_conv, out_s = timeit(conv, params, st, structs,
                                ready=lambda o: o.feats)

        def two_dispatch(p, s):
            z = build(s)
            return conv(p, s, z)

        ms_two, out_t = timeit(two_dispatch, params, st,
                               ready=lambda o: o.feats)

        d = np.abs(np.asarray(out_t.feats) - np.asarray(out_f.feats))
        d = d[np.asarray(out_f.valid)].max()
        print(f"cap={cap}: fused={ms_fused:.1f} ms | build={ms_build:.1f} "
              f"+ conv={ms_conv:.1f} | two-dispatch total={ms_two:.1f} ms "
              f"| parity max|delta|={d:.2e}", flush=True)


if __name__ == "__main__":
    main()
