"""Solve-stage roofline: price the RANSAC chunk engine against v5e ceilings.

VERDICT r4 item 7: the forward has a bytes-moved roofline; the solver
(~94 ms blocking at the 1M budget, ~3.1 ms per 65k-hypothesis chunk) does
not. This measures the chunk's component stages on the real chip and
prices each against the ceiling that could bind it:

  * minimal-sample GATHERS (pts6[:, cand_idx[draw]]): random rows from a
    [6, N] SoA pool (768 KB @32k — cache-resident, so the HBM row-rate
    ceiling does NOT apply; the measurement tells us what does);
  * QCP Kabsch + ELC: pure VPU elementwise over [C];
  * stage-1 scoring (_transform_dist2_soa over [C, M0]): C*M0*23 flops of
    f32 VPU work — the only stage whose cost scales with both budget and
    subset size.

Method: time ransac_register at fixed budget with (a) stage1_samples
swept (scoring-cost slope), (b) chunk count swept (per-chunk fixed cost),
then solve the linear model  t = a*chunks + b*chunks*M0  for the
per-chunk fixed cost a (sampling+kabsch+merge) and the per-(hypothesis x
subset-point) scoring rate b. Compare b against the VPU flop ceiling and
a against the gather/PRNG floor.

Usage: python scripts/solve_roofline.py
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

from lidarreg.solvers import RansacConfig, ransac_register


def timed(fn, src, tgt, keep, n=5, depth=4):
    """Streaming fetch-forced timing: `depth` calls in flight with a
    FRESH PRNGKey each, then ONE host fetch of every transform; per-call
    time = wall / depth, min over n trials.

    Why not per-call block_until_ready: on the tunneled backend
    block_until_ready can return BEFORE execution for static programs
    (round-5 sync probe: an 8x4096^3 matmul chain "timed" 0.07 ms against
    a >=5 ms physical floor; the solver's while_loop variant times
    correctly, the fixed-budget confidence=0.0 variant does not). A
    np.asarray fetch of the 4x4 transform is the only sync primitive
    that held in every probe; streaming depth amortizes its ~20-30 ms
    tunnel RTT to noise level."""
    _ = np.asarray(fn(src, tgt, keep, jax.random.PRNGKey(0)).transform)
    ts = []
    for trial in range(n):
        t0 = time.perf_counter()
        outs = [
            fn(src, tgt, keep, jax.random.PRNGKey(1 + trial * depth + k))
            for k in range(depth)
        ]
        _ = [np.asarray(o.transform) for o in outs]
        ts.append((time.perf_counter() - t0) / depth)
    return min(ts) * 1e3


def main():
    print("backend:", jax.default_backend())
    rng = np.random.default_rng(51)
    N = 32768
    src = jnp.asarray(rng.uniform(-40, 40, (N, 3)).astype(np.float32))
    # ~10% inliers (benchmark-like post-GPF ratio)
    inl = rng.uniform(size=N) < 0.10
    tgt = jnp.where(
        jnp.asarray(inl)[:, None],
        src + jnp.asarray([4.0, -2.0, 0.1]),
        jnp.asarray(rng.uniform(-40, 40, (N, 3)).astype(np.float32)),
    )
    keep = jnp.ones((N,), bool)
    key = jax.random.PRNGKey(0)

    rows = []
    C = 65536
    for n_chunks in (1, 4, 16):
        for m0 in (64, 256, 512, 1024):
            cfg = RansacConfig(
                num_hypotheses=n_chunks * C, chunk_size=C,
                stage1_samples=m0, top_k=512, refit_iters=3,
                confidence=0.0,  # fixed budget: no early exit, clean slope
            )
            f = jax.jit(
                lambda s, t, k, ky, cfg=cfg: ransac_register(
                    s, t, k, ky, cfg
                )
            )
            ms = timed(f, src, tgt, keep)
            rows.append((n_chunks, m0, ms))
            print(f"chunks={n_chunks:3d} M0={m0:5d}: {ms:8.2f} ms",
                  flush=True)

    # linear model t = t0 + a*chunks + b*chunks*m0 (least squares)
    A = np.array([[1.0, nc, nc * m0] for nc, m0, _ in rows])
    y = np.array([ms for _, _, ms in rows])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    t0, a, b = coef
    print(f"\nmodel: t = {t0:.2f} ms + {a:.3f} ms/chunk "
          f"+ {b*1000:.3f} us/(chunk*subset-point)")
    # scoring: C * 23 flops per (hypothesis, subset point) pair
    flops_per_cm = 65536 * 23
    eff_flops = flops_per_cm / max(b * 1e-3, 1e-12)
    print(f"scoring slope -> effective {eff_flops/1e12:.2f} TFLOP/s f32 VPU "
          "(v5e VPU order ~0.5-1 TFLOP/s: >0.3 means scoring is at the "
          "VPU ceiling — compute-bound, not layout-attackable)")
    # fixed per-chunk cost: sampling gather (s*C rows from a cache-resident
    # 768 KB pool), threefry bits, QCP kabsch (~250 flop/hyp), ELC, merge
    kabsch_ms_floor = 65536 * 300 / 0.5e12 * 1e3
    print(f"per-chunk fixed {a:.3f} ms vs ~{kabsch_ms_floor:.3f} ms QCP VPU "
          "floor; the remainder is sampling PRNG + pool gathers + merge")


if __name__ == "__main__":
    main()
