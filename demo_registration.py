"""Demo: register two point clouds end-to-end (Experiments/demo_registration.py
counterpart — that demo runs PointDSC on two .ply files; this one runs the
full lidarreg pipeline on two .npy/.xyz clouds, or on a generated synthetic
pair when no files are given).

  python demo_registration.py [srcA.npy srcB.npy] [--algo RANSAC|TEASER]
"""
import argparse
import sys

import numpy as np


def load_cloud(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        pts = np.load(path)
    elif path.endswith(".ply"):  # the reference demo's input format
        from lidarreg.data.fileio import read_ply

        pts = read_ply(path)
    else:  # whitespace xyz text
        pts = np.loadtxt(path)
    return np.asarray(pts, np.float32)[:, :3]


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("clouds", nargs="*", help="two cloud files (.npy/.xyz)")
    ap.add_argument("--algo", default="RANSAC", choices=["RANSAC", "TEASER"])
    ap.add_argument("--voxel_size", type=float, default=0.3)
    ap.add_argument("--iters", type=int, default=50_000)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from lidarreg.bench import FRConfig, make_fr_register
    from lidarreg.core.se3 import euler_to_rotation
    from lidarreg.data.pipeline import pad_cloud, prepare_sparse_input
    from lidarreg.models.fcgf import ResUNetBN2C
    from lidarreg.solvers.icp import icp_point_to_point

    if len(args.clouds) == 2:
        cloud_a, cloud_b = map(load_cloud, args.clouds)
        T_gt = None
    else:
        print("no input clouds given; generating a synthetic LiDAR pair")
        rng = np.random.default_rng(0)
        n = 60_000
        g = np.c_[rng.uniform(-50, 50, (n // 2, 2)), rng.normal(0, 0.05, (n // 2, 1))]
        s = np.c_[rng.uniform(-40, 40, (n // 2, 2)), rng.uniform(0, 6, (n // 2, 1))]
        cloud_b = np.vstack([g, s]).astype(np.float32)
        T_gt = np.eye(4, dtype=np.float32)
        T_gt[:3, :3] = np.asarray(
            euler_to_rotation(jnp.asarray(np.radians([1.0, -0.5, 25.0])))
        )
        T_gt[:3, 3] = [6.0, -2.0, 0.1]
        inv = np.linalg.inv(T_gt)
        cloud_a = (cloud_b @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)

    cap = 32768
    pt_cap = cap * 4

    def prep(c):
        pad, m = pad_cloud(c, pt_cap)
        return prepare_sparse_input(jnp.asarray(pad), args.voxel_size, cap,
                                    jnp.int32(m))

    st0, xyz0 = prep(cloud_a)
    st1, xyz1 = prep(cloud_b)
    print(f"voxels: {int(st0.valid.sum())} / {int(st1.valid.sum())}")

    model = ResUNetBN2C()
    variables = model.init(jax.random.PRNGKey(0), st0, train=False)
    apply = jax.jit(lambda v, x: model.apply(v, x, train=False))
    F0 = apply(variables, st0)
    F1 = apply(variables, st1)
    print("FCGF features extracted (untrained weights; pass a checkpoint for "
          "benchmark-grade matching)")

    fr = make_fr_register(FRConfig(mode="GPF", iters=args.iters))
    res = fr(F0.feats, F1.feats, xyz0, xyz1, F0.valid, F1.valid,
             jax.random.PRNGKey(42))
    T = icp_point_to_point(xyz0, st0.valid, xyz1, st1.valid, res.transform)
    T = np.asarray(T)
    np.set_printoptions(precision=4, suppress=True)
    print("estimated transform (src -> tgt):\n", T)
    if T_gt is not None:
        from lidarreg.core import registration_success

        ok, re, te = registration_success(jnp.asarray(T), jnp.asarray(T_gt))
        print(f"vs ground truth: success={bool(ok)} RE={float(re):.3f}deg "
              f"TE={float(te) * 100:.1f}cm")
    return T


if __name__ == "__main__":
    main(sys.argv[1:])
