"""Ablate the NN-matching matmul precision on the full solver path.

The feature kNN runs at precision="highest" (exact f32 = 6 bf16 MXU
passes) for parity with the reference's torch f32 matmul
(Experiments/algorithms/matching.py:22-65). On unit-norm descriptors a
lower pass count only perturbs near-tie NN decisions, which GPF + RANSAC
should absorb — but that must be MEASURED, like the grid-NN and LO
substitutions (BASELINE.md). Runs the full jitted match+GPF+RANSAC program
per pair at each precision tier and reports recall / TE / RE / time.

  python scripts/knn_precision_ablation.py [--pairs 50] [--n 16384]
"""
import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=50)
    ap.add_argument("--n", type=int, default=16384)
    ap.add_argument("--iters", type=int, default=1_000_000)
    ap.add_argument("--noise", type=float, default=0.35)
    args = ap.parse_args(argv)

    from lidarreg.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from lidarreg.bench.registration import FRConfig, make_fr_register
    from lidarreg.core.metrics import registration_errors
    from lidarreg.data.balanced import (
        balanced_set_path, default_balanced_root, read_balanced_set,
    )

    print(f"backend: {jax.default_backend()}")
    N = args.n
    pairs = read_balanced_set(
        balanced_set_path(default_balanced_root(), "ApolloSouthbay", "test")
    )
    n_pairs = min(args.pairs, len(pairs))
    rng = np.random.default_rng(11)

    # one scene+feature set per pair, shared across precision tiers
    data = []
    for i in range(n_pairs):
        T_gt = pairs.motions[i].astype(np.float32)
        src = rng.uniform(-60, 60, (N, 3)).astype(np.float32)
        src[:, 2] = rng.uniform(-2, 4, N)
        tgt = (src @ T_gt[:3, :3].T + T_gt[:3, 3]
               + rng.normal(0, 0.03, (N, 3))).astype(np.float32)
        # surrogate descriptors: bench.py's generator (multi-scale sin of
        # the GT-aligned position + noise, unit-norm) — realistic inlier
        # structure and near-tie density
        def feat(p):
            f = np.concatenate([np.sin(p * s) for s in (0.11, 0.37, 0.93)], 1)
            f = f + rng.normal(0, args.noise, f.shape)
            return (f / np.linalg.norm(f, axis=1, keepdims=True)).astype(
                np.float32)

        f0 = feat(src)
        f1 = feat((tgt - T_gt[:3, 3]) @ T_gt[:3, :3])
        data.append((T_gt, src, tgt, f0, f1))

    m = jnp.ones((N,), bool)
    for prec in ("highest", "high", "default"):
        reg = make_fr_register(FRConfig(
            iters=args.iters, match_precision=prec))
        res_rows, times = [], []
        for i, (T_gt, src, tgt, f0, f1) in enumerate(data):
            a = (jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(src),
                 jnp.asarray(tgt), m, m, jax.random.PRNGKey(i))
            out = reg(*a)
            jax.block_until_ready(out.transform)
            t0 = time.perf_counter()
            out = reg(*a)
            jax.block_until_ready(out.transform)
            times.append(time.perf_counter() - t0)
            re, te = registration_errors(out.transform, jnp.asarray(T_gt))
            res_rows.append([float(re), float(te)])
        r = np.asarray(res_rows)
        ok = ((r[:, 0] <= 5) & (r[:, 1] <= 0.6)).mean()
        print(f"precision={prec:8s}: recall {ok*100:5.1f}%  "
              f"median RE {np.median(r[:,0]):.4f} deg  "
              f"median TE {np.median(r[:,1])*100:.2f} cm  "
              f"p95 TE {np.percentile(r[:,1],95)*100:.2f} cm  "
              f"mean t {np.mean(times)*1e3:.1f} ms  "
              f"median t {np.median(times)*1e3:.1f} ms", flush=True)


if __name__ == "__main__":
    main()
