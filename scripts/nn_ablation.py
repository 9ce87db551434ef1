"""Quantify the grid-NN approximation (VERDICT round-1 weak item 7).

solvers/icp.py's nearest-neighbor is cell-approximate: one stored point per
27-neighborhood voxel cell survives the hash. The reference applies exact-NN
Open3D ICP to EVERY benchmark pair (Experiments/test.py:183-189), so a
systematic grid-NN bias would touch every "+ICP" row. This script measures
the pose impact over >= 50 pairs: ICP from a perturbed init with

  (a) grid-NN ICP (the framework's solvers.icp.icp_point_to_point), vs
  (b) exact-NN ICP (brute-force NN, same update rule),

reporting RE/TE vs GT for both and the (a)-(b) deltas, against the 0.6 m /
5 deg success criterion. Results recorded in BASELINE.md.

  python scripts/nn_ablation.py [--pairs 50] [--n 8000]
"""
import argparse
import time

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=50)
    ap.add_argument("--n", type=int, default=8000)
    ap.add_argument("--max_iter", type=int, default=10)
    args = ap.parse_args(argv)

    from lidarreg.utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    from functools import partial

    from lidarreg.core.kabsch import weighted_kabsch
    from lidarreg.core.metrics import registration_errors
    from lidarreg.core.se3 import integrate
    from lidarreg.data.balanced import (
        balanced_set_path, default_balanced_root, read_balanced_set,
    )
    from lidarreg.solvers.icp import icp_point_to_point

    print(f"backend: {jax.default_backend()}")
    N = args.n

    @partial(jax.jit, static_argnums=(5, 6))
    def icp_exact(src, src_valid, tgt, tgt_valid, init_T, max_corr, iters):
        """Same fixed-iteration point-to-point ICP, brute-force exact NN."""
        def body(_, T):
            w = src @ T[:3, :3].T + T[:3, 3]
            d2 = (
                jnp.sum(w * w, 1)[:, None]
                + jnp.sum(tgt * tgt, 1)[None, :]
                - 2 * jnp.einsum("ic,jc->ij", w, tgt, precision="highest")
            )
            d2 = jnp.where(tgt_valid[None, :], d2, jnp.inf)
            nn = jnp.argmin(d2, axis=1)
            dmin = jnp.sqrt(jnp.maximum(jnp.take_along_axis(d2, nn[:, None], 1)[:, 0], 0))
            wgt = (src_valid & (dmin < max_corr)).astype(src.dtype)
            R, t = weighted_kabsch(w[None], tgt[nn][None], wgt[None],
                                   method="jacobi")
            good = jnp.sum(wgt) >= 3.0
            dT = jnp.where(good, integrate(R[0], t[0]), jnp.eye(4))
            return dT @ T
        return jax.lax.fori_loop(0, iters, body, init_T)

    pairs = read_balanced_set(
        balanced_set_path(default_balanced_root(), "ApolloSouthbay", "test")
    )
    n_pairs = min(args.pairs, len(pairs))
    rng = np.random.default_rng(7)
    rows = []
    for i in range(n_pairs):
        T_gt = pairs.motions[i].astype(np.float32)
        # structured scene (ground + walls) so normals/NN structure is LiDAR-like
        ground = np.c_[rng.uniform(-50, 50, (N // 2, 2)),
                       rng.normal(0, 0.05, (N // 2, 1))]
        walls = []
        for _ in range(20):
            c = rng.uniform(-40, 40, 2)
            m = N // 40
            walls.append(np.c_[c[0] + rng.normal(0, 0.2, m),
                               c[1] + rng.normal(0, 2.5, m),
                               rng.uniform(0, 6, m)])
        src = np.vstack([ground] + walls)[:N].astype(np.float32)
        tgt = (src @ T_gt[:3, :3].T + T_gt[:3, 3]
               + rng.normal(0, 0.02, (N, 3))).astype(np.float32)
        # perturbed init: the coarse-registration error ICP must clean up
        ang = np.radians(rng.uniform(-2, 2, 3))
        Rz = np.eye(3)
        c, s = np.cos(ang[2]), np.sin(ang[2])
        Rz[:2, :2] = [[c, -s], [s, c]]
        T0 = T_gt.copy()
        T0[:3, :3] = Rz @ T0[:3, :3]
        T0[:3, 3] += rng.uniform(-0.3, 0.3, 3)

        valid = jnp.ones((N,), bool)
        sj, tj = jnp.asarray(src), jnp.asarray(tgt)
        T0j = jnp.asarray(T0)

        Tg = icp_point_to_point(sj, valid, tj, valid, T0j,
                                max_corr_dist=0.6, max_iter=args.max_iter)
        Te = icp_exact(sj, valid, tj, valid, T0j, 0.6, args.max_iter)
        re_g, te_g = registration_errors(Tg, jnp.asarray(T_gt))
        re_e, te_e = registration_errors(Te, jnp.asarray(T_gt))
        re_0, te_0 = registration_errors(T0j, jnp.asarray(T_gt))
        rows.append([float(re_g), float(te_g), float(re_e), float(te_e),
                     float(re_0), float(te_0)])
    r = np.asarray(rows)
    ok_g = ((r[:, 0] <= 5) & (r[:, 1] <= 0.6)).mean()
    ok_e = ((r[:, 2] <= 5) & (r[:, 3] <= 0.6)).mean()
    print(f"pairs: {n_pairs}  (init: median RE {np.median(r[:,4]):.2f} deg, "
          f"TE {np.median(r[:,5])*100:.1f} cm)")
    print(f"grid-NN ICP : recall {ok_g*100:5.1f}%  median RE {np.median(r[:,0]):.4f} deg  "
          f"TE {np.median(r[:,1])*100:.2f} cm  p95 TE {np.percentile(r[:,1],95)*100:.2f} cm")
    print(f"exact-NN ICP: recall {ok_e*100:5.1f}%  median RE {np.median(r[:,2]):.4f} deg  "
          f"TE {np.median(r[:,3])*100:.2f} cm  p95 TE {np.percentile(r[:,3],95)*100:.2f} cm")
    d_re = r[:, 0] - r[:, 2]
    d_te = (r[:, 1] - r[:, 3]) * 100
    print(f"delta (grid - exact): RE median {np.median(d_re):+.4f} deg max {d_re.max():+.4f}; "
          f"TE median {np.median(d_te):+.3f} cm max {d_te.max():+.3f} cm")
    return r


if __name__ == "__main__":
    main()
