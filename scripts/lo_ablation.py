"""GC-RANSAC LO-substitute parity ablation (SURVEY.md §7 hard-part 3).

GC-RANSAC's graph-cut local optimization is inherently sequential
(gcransac_python.cpp:404-624); this framework substitutes iterated
least-squares refits on the winner's inlier set (solvers/ransac.py). This
script quantifies that substitution: over >= 100 synthetic pairs driven by
REAL published balanced-set motions, sweep

  * refit_iters 0 (LO off) .. 5,
  * hypothesis budgets (8k / 64k / 1M),
  * SPRT pre-stage on/off,

and report recall (RE<=5deg, TE<=60cm), median TE/RE, and solve time.
Results are recorded in BASELINE.md.

  python scripts/lo_ablation.py [--pairs 100] [--budgets 8192 65536 1048576]

Three-way mode (--three_way): the SAME raw RANSAC winner (refit_iters=0,
shared PRNG key) is post-processed three ways — not at all, by the repo's
iterated-LS substitute, and by the native graph-cut LO oracle
(native/gc_local_opt.cpp, exact s-t min-cut under the GC-RANSAC energy) at
the reference's lambda=0.0 default (Experiments/test.py:306) and at the
GC-RANSAC paper's lambda=0.975 — closing SURVEY.md §7 hard-part 3 with a
direct parity measurement.
"""
import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=100)
    ap.add_argument("--budgets", type=int, nargs="+",
                    default=[8192, 65536, 1048576])
    ap.add_argument("--refit", type=int, nargs="+", default=[0, 1, 3, 5])
    ap.add_argument("--n_corr", type=int, default=8192)
    ap.add_argument("--inlier_ratio", type=float, default=0.05)
    ap.add_argument("--three_way", action="store_true",
                    help="LO-off vs iterated-LS vs graph-cut oracle")
    args = ap.parse_args(argv)

    from lidarreg.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from lidarreg.core.metrics import registration_errors
    from lidarreg.data.balanced import balanced_set_path, default_balanced_root, read_balanced_set
    from lidarreg.solvers import RansacConfig, ransac_register

    print(f"backend: {jax.default_backend()}")
    pairs = read_balanced_set(
        balanced_set_path(default_balanced_root(), "ApolloSouthbay", "test")
    )
    n_pairs = min(args.pairs, len(pairs))
    N = args.n_corr

    def build_problem(i, rng):
        """Correspondence set with realistic outliers under a REAL motion."""
        T = pairs.motions[i]
        src = rng.uniform([-60, -60, -2], [60, 60, 6], (N, 3)).astype(np.float32)
        tgt_true = src @ T[:3, :3].T.astype(np.float32) + T[:3, 3].astype(np.float32)
        inl = rng.random(N) < args.inlier_ratio
        noise = rng.normal(0, 0.1, (N, 3)).astype(np.float32)
        # outliers: matched to random other points (feature-confusion model)
        perm = rng.permutation(N)
        tgt = np.where(inl[:, None], tgt_true + noise, tgt_true[perm])
        quality = (inl * rng.uniform(0.3, 1.0, N)
                   + ~inl * rng.uniform(0.0, 0.7, N)).astype(np.float32)
        return (jnp.asarray(src), jnp.asarray(tgt.astype(np.float32)),
                jnp.asarray(quality), jnp.asarray(T))

    rng = np.random.default_rng(51)
    problems = [build_problem(i, rng) for i in range(n_pairs)]
    keep = jnp.ones((N,), bool)

    if args.three_way:
        return three_way(args, problems, keep)

    rows = []
    for budget in args.budgets:
        for sprt in (True, False):
            for refit in args.refit:
                cfg = RansacConfig(
                    num_hypotheses=budget,
                    chunk_size=min(65536, budget),
                    refit_iters=refit,
                    sprt_samples=64 if sprt else 0,
                )

                @jax.jit
                def solve(src, tgt, quality, key):
                    return ransac_register(
                        src, tgt, keep, key, cfg, quality=quality
                    ).transform

                # warm compile
                jax.block_until_ready(
                    solve(*problems[0][:3], jax.random.PRNGKey(0))
                )
                res, times = [], []
                for i, (src, tgt, q, T_gt) in enumerate(problems):
                    t0 = time.perf_counter()
                    T_hat = solve(src, tgt, q, jax.random.PRNGKey(i))
                    jax.block_until_ready(T_hat)
                    times.append(time.perf_counter() - t0)
                    re, te = registration_errors(T_hat, T_gt)
                    res.append((float(re), float(te)))
                res = np.asarray(res)
                ok = (res[:, 0] <= 5.0) & (res[:, 1] <= 0.6)
                row = dict(
                    budget=budget, sprt=sprt, refit_iters=refit,
                    recall=float(ok.mean()),
                    med_te_cm=float(np.median(res[:, 1]) * 100),
                    med_re_deg=float(np.median(res[:, 0])),
                    mean_ms=float(np.mean(times) * 1000),
                )
                rows.append(row)
                print(
                    f"budget={budget:>8d} sprt={int(sprt)} refit={refit}: "
                    f"recall={row['recall']*100:5.1f}% "
                    f"TE={row['med_te_cm']:6.2f}cm RE={row['med_re_deg']:.3f}deg "
                    f"t={row['mean_ms']:6.1f}ms"
                )
    return rows


def three_way(args, problems, keep):
    import jax
    import jax.numpy as jnp

    from lidarreg.core.metrics import registration_errors
    from lidarreg.native import gc_local_optimize
    from lidarreg.solvers import RansacConfig, ransac_register

    budget = args.budgets[0] if len(args.budgets) == 1 else 65536
    variants = {}
    for refit in (0, 3):
        cfg = RansacConfig(
            num_hypotheses=budget, chunk_size=min(65536, budget),
            refit_iters=refit,
        )

        @jax.jit
        def solve(src, tgt, quality, key, cfg=cfg):
            return ransac_register(
                src, tgt, keep, key, cfg, quality=quality
            ).transform

        jax.block_until_ready(solve(*problems[0][:3], jax.random.PRNGKey(0)))
        variants[refit] = solve

    rows = {k: [] for k in ("off", "iter_ls", "gc_l0", "gc_l975")}
    times = {k: [] for k in rows}
    for i, (src, tgt, q, T_gt) in enumerate(problems):
        key = jax.random.PRNGKey(i)
        t0 = time.perf_counter()
        T_raw = np.asarray(variants[0](src, tgt, q, key))
        jax.block_until_ready(T_raw)
        t_raw = time.perf_counter() - t0

        t0 = time.perf_counter()
        T_ls = np.asarray(variants[3](src, tgt, q, key))
        t_ls = time.perf_counter() - t0

        s, d = np.asarray(src, np.float64), np.asarray(tgt, np.float64)
        t0 = time.perf_counter()
        T_gc0, _, _ = gc_local_optimize(
            s, d, T_raw, threshold=0.6, spatial_coherence_weight=0.0
        )
        t_gc0 = time.perf_counter() - t0
        t0 = time.perf_counter()
        T_gc975, _, _ = gc_local_optimize(
            s, d, T_raw, threshold=0.6, spatial_coherence_weight=0.975,
            neighborhood_radius=20.0,
        )
        t_gc975 = time.perf_counter() - t0

        for name, T_hat, tt in (
            ("off", T_raw, t_raw),
            ("iter_ls", T_ls, t_ls),
            ("gc_l0", T_gc0, t_raw + t_gc0),
            ("gc_l975", T_gc975, t_raw + t_gc975),
        ):
            re, te = registration_errors(jnp.asarray(T_hat), T_gt)
            rows[name].append((float(re), float(te)))
            times[name].append(tt)

    print(f"\nthree-way LO parity ({len(problems)} pairs, budget={budget}, "
          f"{args.inlier_ratio*100:.1f}% inliers):")
    out = []
    for name, label in (
        ("off", "LO off (raw winner)"),
        ("iter_ls", "iterated-LS substitute"),
        ("gc_l0", "graph-cut LO lambda=0 (ref default)"),
        ("gc_l975", "graph-cut LO lambda=0.975 (paper)"),
    ):
        r = np.asarray(rows[name])
        ok = (r[:, 0] <= 5.0) & (r[:, 1] <= 0.6)
        row = dict(
            variant=name, recall=float(ok.mean()),
            med_te_cm=float(np.median(r[:, 1]) * 100),
            med_re_deg=float(np.median(r[:, 0])),
            mean_ms=float(np.mean(times[name]) * 1000),
        )
        out.append(row)
        print(
            f"  {label:38s} recall={row['recall']*100:5.1f}% "
            f"TE={row['med_te_cm']:6.3f}cm RE={row['med_re_deg']:.4f}deg "
            f"t={row['mean_ms']:6.1f}ms"
        )
    return out


if __name__ == "__main__":
    main()
