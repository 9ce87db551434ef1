"""Recall parity: structured sample reuse vs independent minimal samples.

RansacConfig.sample_reuse=True (round 3) draws ONE correspondence per
hypothesis and builds the 4-point sample from cyclic rolls of the drawn
chunk — cutting the engine's profiled floor (the 4M-row minimal-sample
gather) by 4x. Marginal inlier statistics are identical; this ablation
checks the max-statistic (recall/TE) is too, in the regime where the
cross-hypothesis correlation would bite (low inlier ratio).

Run on TPU: python scripts/reuse_ablation.py [--trials 50] [--eps 0.05]
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=50)
    ap.add_argument("--eps", type=float, nargs="+", default=[0.05, 0.15])
    ap.add_argument("--n", type=int, default=4096)
    ap.add_argument("--hyps", type=int, default=262_144)
    args = ap.parse_args()

    from lidarreg.utils.jaxcache import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from lidarreg.core import registration_success
    from lidarreg.core.se3 import euler_to_rotation
    from lidarreg.solvers import RansacConfig, ransac_register

    print("backend:", jax.default_backend())
    N = args.n
    regs = {}
    for reuse in (True, False):
        cfg = RansacConfig(num_hypotheses=args.hyps, chunk_size=65_536,
                           stage1_samples=512, top_k=512, refit_iters=3,
                           sample_reuse=reuse)
        regs[reuse] = jax.jit(
            lambda s, t, k, key, c=cfg: ransac_register(s, t, k, key, c)
        )

    rng = np.random.default_rng(7)
    res = {True: [], False: []}
    for trial in range(args.trials):
        for eps in args.eps:
            src = rng.uniform(-40, 40, (N, 3)).astype(np.float32)
            ang = np.radians(rng.uniform(-5, 5, 3)
                             + [0, 0, rng.uniform(-30, 30)])
            R = np.asarray(euler_to_rotation(jnp.asarray(ang)))
            t = rng.uniform(-8, 8, 3).astype(np.float32)
            T = np.eye(4)
            T[:3, :3] = R
            T[:3, 3] = t
            tgt = (src @ R.T + t).astype(np.float32)
            n_out = int(N * (1 - eps))
            out_idx = rng.choice(N, n_out, replace=False)
            tgt[out_idx] = rng.uniform(-40, 40, (n_out, 3)).astype(np.float32)
            tgt += rng.normal(0, 0.03, tgt.shape).astype(np.float32)
            keep = jnp.ones(N, bool)
            for reuse in (True, False):
                r = regs[reuse](jnp.asarray(src), jnp.asarray(tgt), keep,
                                jax.random.PRNGKey(trial))
                ok, re, te = registration_success(r.transform, jnp.asarray(T))
                res[reuse].append((bool(ok), float(te), eps))

    for reuse in (True, False):
        for eps in args.eps:
            sel = [r for r in res[reuse] if r[2] == eps]
            rec = 100.0 * sum(r[0] for r in sel) / len(sel)
            te_ok = [100 * r[1] for r in sel if r[0]]
            med = float(np.median(te_ok)) if te_ok else float("nan")
            p95 = float(np.percentile(te_ok, 95)) if te_ok else float("nan")
            print(f"reuse={int(reuse)} eps={eps:.2f}: recall {rec:5.1f}%  "
                  f"median TE {med:5.2f} cm  p95 {p95:5.2f} cm  (n={len(sel)})")


if __name__ == "__main__":
    main()
