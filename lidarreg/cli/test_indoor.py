"""Indoor (3DMatch / 3DLoMatch / Redwood) evaluation entry.

Rebuilds Experiments/evaluation/test_3DMatch.py / test_3DLoMatch.py: iterate
a precomputed-descriptor pair directory (data.precomputed format, written by
cli.precompute / cal_fcgf.py), run the selected estimator on the prepared
correspondences, and report with the INDOOR success criterion
(RE <= 15 deg, TE <= 30 cm — Experiments/config.py:90-131).

  python -m lidarreg.cli.test_indoor --precomputed_root data/3DMatch \\
      --benchmark 3DMatch --algo PointDSC \\
      [--pointdsc_weights_file ckpt.msgpack] [--descriptor fcgf|fpfh]

Algos: PointDSC (learned), OANet (learned), RANSAC (correspondence RANSAC
on the same inputs), SM (spectral matching baseline).
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

from .test import str2bool


def get_args(argv=None):
    p = argparse.ArgumentParser("lidarreg indoor test")
    p.add_argument("--precomputed_root", type=str, required=True)
    p.add_argument("--benchmark", type=str, default="3DMatch",
                   choices=["3DMatch", "3DLoMatch", "Redwood"])
    p.add_argument("--split", type=str, default="test")
    p.add_argument("--descriptor", type=str, default="fcgf",
                   choices=["fcgf", "fpfh"])
    p.add_argument("--algo", type=str, default="PointDSC",
                   choices=["PointDSC", "OANet", "RANSAC", "SM"])
    p.add_argument("--num_node", type=int, default=5000)
    p.add_argument("--use_mutual", type=str2bool, default=True)
    p.add_argument("--iters", type=int, default=50_000)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--pointdsc_weights_file", type=str, default=None)
    p.add_argument("--oanet_weights_file", type=str, default=None)
    p.add_argument("--outdir", type=str, default=None)
    p.add_argument("--seed", type=int, default=51)
    p.add_argument("--tiny", type=str2bool, default=False)
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from ..utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from ..core.metrics import registration_errors
    from ..data.precomputed import PrecomputedPairDataset
    from ..utils.config import DATASET_FAMILIES

    fam = DATASET_FAMILIES[args.benchmark]
    re_thre, te_thre = fam["re_thre"], fam["te_thre"]

    ds = PrecomputedPairDataset(
        args.precomputed_root, split=args.split, descriptor=args.descriptor,
        num_node=args.num_node, use_mutual=args.use_mutual,
        inlier_threshold=fam["inlier_threshold"], seed=args.seed,
    )
    n_pairs = min(args.max_samples or len(ds), len(ds))

    if args.algo in ("PointDSC", "OANet"):
        if args.algo == "PointDSC":
            from ..models import PointDSC
            model = (
                PointDSC(num_layers=2, num_channels=32, ratio=0.2, k=10)
                if args.tiny else PointDSC(
                    inlier_threshold=fam["inlier_threshold"],
                    sigma_d=fam["sigma_d"], nms_radius=fam["nms_radius"],
                )
            )
            wfile = args.pointdsc_weights_file
            kw = {"testing": True}
        else:
            from ..models.oanet import OANet
            model = (OANet(num_channels=32, num_layers=4, clusters=50)
                     if args.tiny else OANet())
            wfile = args.oanet_weights_file
            kw = {}

        def init_vars(example):
            data = {k: jnp.asarray(example[k])[None]
                    for k in ("corr_pos", "src_keypts", "tgt_keypts")}
            if wfile:
                from ..utils.checkpoint import load_variables
                return load_variables(wfile)
            return model.init(jax.random.PRNGKey(0), data, train=False, **kw)

        variables = init_vars(ds[0])
        apply = jax.jit(
            lambda v, d: model.apply(v, d, train=False, **kw)
        )

        def solve(item, key):
            data = {k: jnp.asarray(item[k])[None]
                    for k in ("corr_pos", "src_keypts", "tgt_keypts")}
            out = apply(variables, data)
            return out["final_trans"][0]

    elif args.algo == "RANSAC":
        from ..solvers import RansacConfig, ransac_register

        cfg = RansacConfig(
            num_hypotheses=args.iters,
            chunk_size=min(65536, max(1024, args.iters)),
            inlier_thresh=fam["inlier_threshold"],
        )

        @jax.jit
        def _solve(src, tgt, key):
            keep = jnp.ones(src.shape[0], bool)
            return ransac_register(src, tgt, keep, key, cfg).transform

        def solve(item, key):
            return _solve(jnp.asarray(item["src_keypts"]),
                          jnp.asarray(item["tgt_keypts"]), key)

    else:  # SM baseline (baseline_3DMatch.py:19-45)
        from ..solvers.baselines import spectral_matching_register

        @jax.jit
        def _solve(src, tgt):
            trans, _ = spectral_matching_register(
                src[None], tgt[None],
                inlier_threshold=fam["inlier_threshold"],
            )
            return trans[0]

        def solve(item, key):
            return _solve(jnp.asarray(item["src_keypts"]),
                          jnp.asarray(item["tgt_keypts"]))

    stats = np.zeros((n_pairs, 5), np.float64)  # ok, RE, TE, time, n_corr
    for i in range(n_pairs):
        item = ds[i]
        t0 = time.perf_counter()
        T_hat = solve(item, jax.random.PRNGKey(args.seed + i))
        T_hat = jax.block_until_ready(T_hat)
        dt = time.perf_counter() - t0
        re, te = registration_errors(
            jnp.asarray(T_hat), jnp.asarray(item["gt_trans"].reshape(4, 4))
        )
        re, te = float(re), float(te)
        ok = (re <= re_thre) and (te <= te_thre * 0.01)
        stats[i] = (ok, re, te, dt, item["src_keypts"].reshape(-1, 3).shape[0])

    ok = stats[:, 0].astype(bool)
    recall = 100.0 * ok.mean() if n_pairs else 0.0
    # report format parity (Experiments/test.py:80-84 style)
    succ = stats[ok]
    report = (
        f"{args.algo} | {args.benchmark} recall: {recall:.2f}%, "
        f"#failed/#total: {int((~ok).sum())}/{n_pairs}, "
        f"TE(cm): {100 * succ[:, 2].mean() if len(succ) else float('nan'):.2f}, "
        f"RE(deg): {succ[:, 1].mean() if len(succ) else float('nan'):.2f}, "
        f"reg time: {stats[:, 3].mean():.3f}s mean / "
        f"{np.quantile(stats[:, 3], 0.99):.3f}s 99%"
    )
    print(report)
    outdir = args.outdir or os.path.join(
        "outputs",
        f"{args.benchmark}.{args.algo}.{time.strftime('%y%m%d_%H%M%S')}",
    )
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "log.txt"), "w") as f:
        f.write(report + "\n")
        f.write(repr(vars(args)) + "\n")
    np.save(os.path.join(outdir, "raw_stats.npy"), stats)
    return report


if __name__ == "__main__":
    main()
