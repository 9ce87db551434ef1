"""Full FCGF forward A/B across structure-build modes, on the real TPU.

Times the COMPLETE ResUNetBN2C forward (not just the build) with the four
build paths — serialized claim rounds (round 2), fused XLA (round 3), the
single-pass VMEM pallas build (round 4, sparse/pallas_build.py), and the
sort-free dedup build (round 4, hashtable.build_table_dedup: the level
coordinate lists come from the table's own claim rounds) — at single-cloud
32k and the pair-batched 64k the e2e benchmark runs.

Scene: data/adapters.synthesize_lidar_scene (the family the benchmark and
trainer use). The earlier uniform-random scene OVERFILLS coarse levels
(stride-4 unique cells 1.5x the level capacity at 32k) — under truncation
the build modes legitimately keep different cell subsets and feature
parity is meaningless; realistic LiDAR occupancy stays well under every
level capacity (measured: 9.1k unique stride-4 cells vs 16384 cap @32k). Also
checks cross-mode parity of the output features: coarse-level coordinate
ORDER differs between builds (lexicographic vs first-occurrence), so
feature parity is checked per-voxel (max |delta| over valid rows), not
bit-exactness of intermediate structures.

The VERDICT r3 #4 gate: pallas mode ships as default only if this program
shows parity (max |delta| < 1e-3 on unit-norm-ish features) AND a forward
speedup. LIDARREG_PALLAS_BUILD=0 is the escape hatch.

Usage: python scripts/forward_build_ab.py [caps ...]
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


def timeit(fn, *args, n=5):
    out = fn(*args)
    jax.block_until_ready(out.feats)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out.feats)
        ts.append(time.perf_counter() - t0)
    return 1000 * min(ts), out


def main():
    caps = [int(a) for a in sys.argv[1:]] or [32768, 65536]
    rng = np.random.default_rng(0)
    for cap in caps:
        from lidarreg.data.adapters import synthesize_lidar_scene

        pts = synthesize_lidar_scene(rng, cap * 4)
        v = voxelize_points(jnp.asarray(pts), 0.3, cap)
        feats = jnp.ones((cap, 1), jnp.float32)
        st = SparseTensor(coords=v.coords, feats=feats, valid=v.valid,
                          stride=1)

        outs, times = {}, {}
        for mode, kw in (
            # grouped_lookup pinned False (it is the DEFAULT since the
            # round-4 gate) so these rows keep measuring the plain probes
            ("serial", dict(fused_build=False, pallas_build=False,
                            dedup_build=False, grouped_lookup=False,
                            build_rounds=(4, 4))),
            ("fused", dict(fused_build=True, pallas_build=False,
                           dedup_build=False, grouped_lookup=False,
                           build_rounds=(4, 4))),
            ("pallas", dict(fused_build=True, pallas_build=True,
                            dedup_build=False, grouped_lookup=False,
                            build_rounds=(4, 4))),
            ("dedup", dict(fused_build=False, pallas_build=False,
                           dedup_build=True, grouped_lookup=False,
                           build_rounds=(4, 4))),
            ("serial+grp", dict(fused_build=False, pallas_build=False,
                                dedup_build=False, grouped_lookup=True,
                                build_rounds=(4, 4))),
            ("dedup+grp", dict(fused_build=False, pallas_build=False,
                               dedup_build=True, grouped_lookup=True,
                               build_rounds=(4, 4))),
            # combined ragged claim build (round 4): one 8-round chain for
            # all four tables + coarse coord lists
            ("comb+grp", dict(fused_build=False, pallas_build=False,
                              dedup_build=False, combined_build=True,
                              grouped_lookup=True, build_rounds=(4, 4))),
            # round-5 SHIPPED schedule: side-1 exhaustive, side-2 halved
            # (models/fcgf.py build_rounds docstring)
            ("serial+grp+r42", dict(fused_build=False, pallas_build=False,
                                    dedup_build=False, grouped_lookup=True,
                                    build_rounds=(4, 2))),
            # round-5 MEASURED-NEGATIVE schedule (kept as the retry-pool
            # regression's on-chip witness): (3, 2) inflates the overflow
            # flag population ~20x and saturates the grouped probe's
            # side-2 retry pool at 65k — 184 wrong rows, 0.31 feature
            # delta (BASELINE.md round-5 build section)
            ("serial+grp+r32", dict(fused_build=False, pallas_build=False,
                                    dedup_build=False, grouped_lookup=True,
                                    build_rounds=(3, 2))),
            ("dedup+grp+r32", dict(fused_build=False, pallas_build=False,
                                   dedup_build=True, grouped_lookup=True,
                                   build_rounds=(3, 2))),
            ("comb+grp+r32", dict(fused_build=False, pallas_build=False,
                                  dedup_build=False, combined_build=True,
                                  grouped_lookup=True,
                                  build_rounds=(3, 2))),
        ):
            model = ResUNetBN2C(**kw)
            params = model.init(jax.random.PRNGKey(0), st, train=False)
            fwd = jax.jit(lambda p, s, m=model: m.apply(p, s, train=False))
            ms, out = timeit(fwd, params, st)
            outs[mode], times[mode] = out, ms
            print(f"cap={cap} {mode:>6}: {ms:7.1f} ms", flush=True)

        f_ref = np.asarray(outs["fused"].feats)
        vmask = np.asarray(outs["fused"].valid)
        for mode in ("serial", "pallas", "dedup", "serial+grp",
                     "dedup+grp", "comb+grp", "serial+grp+r42",
                     "serial+grp+r32", "dedup+grp+r32", "comb+grp+r32"):
            f = np.asarray(outs[mode].feats)
            d = np.abs(f - f_ref)[vmask].max() if vmask.any() else 0.0
            scale = np.abs(f_ref[vmask]).max()
            print(f"cap={cap} {mode} vs fused: max|delta|={d:.2e} "
                  f"(scale {scale:.2e})", flush=True)


if __name__ == "__main__":
    main()
