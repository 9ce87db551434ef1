"""SPRT pre-stage ablation at LOW inlier ratios (no_filter regime).

VERDICT r3 item 8: the batched SPRT pre-stage (RansacConfig.sprt_samples —
a cheap k-point screen that culls hypotheses before the 512-point stage-1
scoring, the batched analogue of GC-RANSAC's sequential probability ratio
test, Experiments/algorithms/GC_RANSAC.py:8-55) measured NEUTRAL at
benchmark-scale inlier ratios (~5%+, BASELINE.md round-2 ablation) and
defaults OFF. The reference exposes SPRT as a first-class fast-rejection
mode aimed at the no_filter regime (~1-4% inliers), where nearly every
hypothesis is garbage and a staged test should pay. This script measures
that regime: success rate and wall time with the pre-stage off/on at two
screen sizes, across budgets.

Run ON TPU: python scripts/sprt_ablation.py
"""
import itertools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from lidarreg.utils.jaxcache import enable_persistent_cache

enable_persistent_cache()

from lidarreg.core import registration_success
from lidarreg.core.se3 import euler_to_rotation
from lidarreg.solvers import RansacConfig, ransac_register

N = 16384
TRIALS = 24
RATIOS = (0.01, 0.02, 0.04)
BUDGETS = (262_144, 1_048_576)
SPRT = (0, 64, 256)  # pre-stage screen sizes; 0 = off (current default)


def make_problem(rng, r):
    ang = rng.uniform(-0.1, 0.1, 3)
    ang[2] = rng.uniform(-0.6, 0.6)
    t = np.concatenate([rng.uniform(-10, 10, 2), rng.uniform(-0.5, 0.5, 1)])
    R = np.asarray(euler_to_rotation(jnp.asarray(ang)))
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    src = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
    src[:, 2] = rng.uniform(-2, 4, N)
    tgt = (src @ R.T + t + rng.normal(0, 0.05, (N, 3))).astype(np.float32)
    n_in = int(N * r)
    out = rng.permutation(N)[n_in:]
    bad = src[rng.permutation(N)][: len(out)]
    tgt[out] = (bad @ R.T + t + rng.uniform(-20, 20, (len(out), 3))).astype(
        np.float32
    )
    is_in = np.ones(N, bool)
    is_in[out] = False
    # no_filter regime: weakly-informative qualities (unfiltered NN ratio)
    quality = np.where(is_in, rng.normal(0.55, 0.3, N),
                       rng.normal(0.45, 0.3, N))
    return src, tgt, quality.astype(np.float32), T


def main():
    funcs = {}
    for sprt, budget in itertools.product(SPRT, BUDGETS):
        cfg = RansacConfig(
            num_hypotheses=budget,
            confidence=0.0,          # fixed budget: isolate the pre-stage
            first_chunk=0,
            sprt_samples=sprt,
            stage1_samples=512,
            top_k=512,
            refit_iters=3,
        )

        @jax.jit
        def reg(src, tgt, q, key, cfg=cfg):
            return ransac_register(
                src, tgt, jnp.ones(N, bool), key, cfg, quality=q
            )

        funcs[(sprt, budget)] = reg

    print(f"{'ratio':>6} {'budget':>9} | "
          + " | ".join(f"sprt={s:>4}" for s in SPRT)
          + "   (success rate, median ms)")
    for r in RATIOS:
        problems = [make_problem(np.random.default_rng(2000 + i), r)
                    for i in range(TRIALS)]
        for budget in BUDGETS:
            cells = []
            for sprt in SPRT:
                reg = funcs[(sprt, budget)]
                succ, times = 0, []
                for i, (src, tgt, q, T) in enumerate(problems):
                    key = jax.random.PRNGKey(i)
                    t0 = time.perf_counter()
                    res = reg(jnp.asarray(src), jnp.asarray(tgt),
                              jnp.asarray(q), key)
                    jax.block_until_ready(res.transform)
                    times.append(time.perf_counter() - t0)
                    ok, _, _ = registration_success(
                        res.transform, jnp.asarray(T))
                    succ += bool(ok)
                cells.append(
                    f"{succ / TRIALS:5.0%} {1000 * np.median(times):5.0f}ms")
            print(f"{r:>6} {budget:>9} | " + " | ".join(
                f"{c:>12}" for c in cells), flush=True)


if __name__ == "__main__":
    main()
