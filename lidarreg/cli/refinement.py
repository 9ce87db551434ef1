"""Refinement experiment CLI — FCGF_FAST/refinement.py rebuild.

Consumes coarse motions (the `coarse_motions.txt` files exported by the
test CLI or shipped next to the published balanced sets:
balanced_sets/*/test.coarse_motions.txt — same schema as a balanced set
minus the trailing fields) and measures how ICP / BBR-F / symmetric ICP
refine them. Per-pair stats: for each refiner (success, TE, RE, time) —
12 columns total (FCGF_FAST/net/refinement_tester.py:75-93); the analysis
block prints mean/median/95% rows per refiner (refinement.py:15-67 format).

  python -m lidarreg.cli.refinement --dataset A --synthetic true \\
      [--coarse_motions path.txt] [--max_samples N]
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np

from .test import str2bool


def get_args(argv=None):
    p = argparse.ArgumentParser("lidarreg refinement")
    p.add_argument("--dataset", type=str, required=True)
    p.add_argument("--phase", type=str, default="test")
    p.add_argument("--synthetic", type=str2bool, default=True)
    p.add_argument("--coarse_motions", type=str, default=None,
                   help="default: the published test.coarse_motions.txt")
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--capacity", type=int, default=16384)
    p.add_argument("--voxel_size", type=float, default=0.3)
    p.add_argument("--bbr_iters", type=int, default=100)
    p.add_argument("--outdir", type=str, default=None)
    p.add_argument("--re_thresh", type=float, default=5.0)
    p.add_argument("--te_thresh", type=float, default=0.6)
    return p.parse_args(argv)


def analyze_refinement_stats(stats: np.ndarray) -> str:
    """Mean/median/95% report per refiner (refinement.py:15-67 format).

    stats columns: per refiner k in (ICP, BBR-F, symICP):
    [4k+0 success, 4k+1 TE(m), 4k+2 RE(deg), 4k+3 time(s)].
    """
    mean = stats.mean(0)
    med = np.median(stats, axis=0)
    q95 = np.quantile(stats, 0.95, axis=0)
    n = stats.shape[0]
    s = "\n"
    for name, offs in (("ICP          ", 0), ("BBR-F        ", 4),
                       ("Symmetric ICP", 8)):
        failed = n - int(stats[:, offs].sum())
        s += f"{name}| recall: {100 * mean[offs]:.2f}, #failed/#total: {failed}/{n}\n"
        s += (f"      (mean) | TE(cm): {100 * mean[offs + 1]:.3f}, "
              f"RE(deg): {mean[offs + 2]:.3f}, reg time(s): {mean[offs + 3]:.3f}\n")
        s += (f"    (median) | TE(cm): {100 * med[offs + 1]:.3f}, "
              f"RE(deg): {med[offs + 2]:.3f}, reg time(s): {med[offs + 3]:.3f}\n")
        s += (f"       (95%) | TE(cm): {100 * q95[offs + 1]:.3f}, "
              f"RE(deg): {q95[offs + 2]:.3f}, reg time(s): {q95[offs + 3]:.3f}\n\n")
    return s


def load_coarse_motions(path: str) -> dict:
    data = np.atleast_2d(np.loadtxt(path, skiprows=1))
    return {
        (int(r[0]), int(r[1]), int(r[2])): r[3:19].reshape(4, 4) for r in data
    }


def main(argv=None):
    args = get_args(argv)
    from ..utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from ..core.metrics import registration_errors
    from ..data import make_dataset, balanced_set_path, default_balanced_root
    from ..data.pipeline import pad_cloud, prepare_sparse_input
    from ..solvers.icp import icp_point_to_point
    from ..solvers.refinement import bbr_f, symmetric_icp
    from ..core.se3 import concatenate
    from ..utils.logging import Tee, generate_output_dir

    outdir = args.outdir or generate_output_dir(
        "outputs", args.dataset, "refinement"
    )
    tee = Tee(os.path.join(outdir, "log.txt"))

    ds = make_dataset(args.dataset, phase=args.phase, synthetic=args.synthetic)
    coarse_path = args.coarse_motions or balanced_set_path(
        default_balanced_root(), args.dataset, args.phase
    ).replace(".txt", ".coarse_motions.txt")
    coarse = load_coarse_motions(coarse_path)

    cap = args.capacity
    pt_cap = cap * 4

    def prep(c):
        pad, m = pad_cloud(c, pt_cap)
        st, xyz = prepare_sparse_input(jnp.asarray(pad), args.voxel_size,
                                       cap, jnp.int32(m))
        return xyz, st.valid

    n = len(ds)
    if args.max_samples:
        n = min(n, args.max_samples)
    rows = []
    p = ds.pairs
    for i in range(n):
        key = (int(p.session_ind[i]), int(p.src_ind[i]), int(p.tgt_ind[i]))
        if key not in coarse:
            continue
        T_gt_np, ca, cb = ds.get_pair(i)
        T_gt = jnp.asarray(T_gt_np.astype(np.float32))
        T0 = jnp.asarray(coarse[key].astype(np.float32))
        x0, m0 = prep(ca)
        x1, m1 = prep(cb)

        row = []
        for name in ("icp", "bbr", "sym"):
            t0 = time.perf_counter()
            if name == "icp":
                T = icp_point_to_point(x0, m0, x1, m1, T0)
            elif name == "bbr":
                warped = jnp.einsum("nj,ij->ni", x0, T0[:3, :3],
                                    precision="highest") + T0[:3, 3]
                T = concatenate(
                    bbr_f(warped, m0, x1, m1, args.bbr_iters), T0
                )
            else:
                T = symmetric_icp(x0, m0, x1, m1, T0)
            jax.block_until_ready(T)
            dt = time.perf_counter() - t0
            re, te = registration_errors(T, T_gt)
            re, te = float(re), float(te)
            row += [float(te < args.te_thresh and re < args.re_thresh),
                    te, re, dt]
        rows.append(row)
        if i % 10 == 0:
            tee(f"pair {i}/{n}")

    stats = np.asarray(rows)
    np.save(os.path.join(outdir, "raw_stats.npy"), stats)
    report = analyze_refinement_stats(stats)
    tee(report)
    return report


if __name__ == "__main__":
    main()
