"""Multiway registration end-to-end driver.

Mirrors the reference's multiway experiment chain
(Experiments/multiway/make_fragments.py + test_multi.py:1-207 +
test_multi_ate.py:1-346): depth sequence -> per-chunk fragments (RGBD
odometry posegraph + TSDF integration) -> pairwise fragment registration
(FPFH features + mutual matching + RANSAC, odometry edges certain / loop
edges uncertain with line-process pruning) -> global pose-graph
optimization -> ATE report + trajectory `.log`.

Usage:
  python -m lidarreg.cli.multiway --synthetic 45 --frames_per_fragment 15
  python -m lidarreg.cli.multiway --data <dir-with-depth-pngs> [--gt_traj t.log]

`--synthetic N` renders a corner-wall depth sequence with known camera
motion, so the run self-reports ATE against analytic ground truth — the
smoke path used by tests/test_multiway_cli.py.
"""
from __future__ import annotations

import argparse
import os

import numpy as np


# --------------------------------------------------------------------------- #
# synthetic depth sequence (smoke path)
# --------------------------------------------------------------------------- #

def _default_intrinsic():
    from ..multiway.fragments import CameraIntrinsic

    return CameraIntrinsic(fx=100.0, fy=100.0, cx=32.0, cy=24.0,
                           width=64, height=48)


def render_corner_depth(cam_from_world: np.ndarray, K, wall_z: float = 2.0):
    """Depth image of two tilted half-walls (split at world x=0) + a box.

    The corner + box slab make all 6 motion DoF observable by depth-only
    odometry AND lock point-to-point fragment ICP (bare planes slide along
    themselves with perfect overlap)."""
    v, u = np.meshgrid(np.arange(K.height), np.arange(K.width), indexing="ij")
    d = np.stack([(u - K.cx) / K.fx, (v - K.cy) / K.fy, np.ones_like(u)],
                 axis=-1).astype(np.float64)
    world_from_cam = np.linalg.inv(cam_from_world)
    Rwc, twc = world_from_cam[:3, :3], world_from_cam[:3, 3]
    dirs = d @ Rwc.T
    org = twc

    def plane_t(a, b, c):
        den = dirs[..., 2] - a * dirs[..., 0] - b * dirs[..., 1]
        den = np.where(np.abs(den) < 1e-9, 1e-9, den)
        return (a * org[0] + b * org[1] + c - org[2]) / den

    t1 = plane_t(0.35, -0.25, wall_z)
    t2 = plane_t(-0.45, 0.3, wall_z)
    x1 = org[0] + t1 * dirs[..., 0]
    tz = np.where(x1 < 0, t1, t2)
    # raised slab in front of the walls (z = 1.5 within an xy window)
    bx0, bx1, by0, by1, bz = -0.4, 0.3, -0.3, 0.2, 1.5
    den_z = np.where(np.abs(dirs[..., 2]) < 1e-9, 1e-9, dirs[..., 2])
    tb = (bz - org[2]) / den_z
    hit = org[None, None, :2] + tb[..., None] * dirs[..., :2]
    on_box = (
        (tb > 0) & (hit[..., 0] > bx0) & (hit[..., 0] < bx1)
        & (hit[..., 1] > by0) & (hit[..., 1] < by1)
    )
    tz = np.where(on_box & (tb < tz), tb, tz)
    return np.where(tz > 0, tz * d[..., 2], 0.0).astype(np.float32)


def synthetic_sequence(n_frames: int, K):
    """(depths, gt cam_to_world poses): slow lateral sweep with a yaw arc."""
    depths, poses = [], []
    for i in range(n_frames):
        ang = np.radians(0.6 * i)
        c, s = np.cos(ang), np.sin(ang)
        pose = np.eye(4)                       # camera -> world
        pose[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        pose[:3, 3] = [0.012 * i, 0.004 * i, -0.008 * i]
        depths.append(render_corner_depth(np.linalg.inv(pose), K))
        poses.append(pose)
    return depths, poses


# --------------------------------------------------------------------------- #
# pairwise fragment registration (FPFH + RANSAC + optional ICP)
# --------------------------------------------------------------------------- #

def make_pairwise_register(clouds, valids, cfg_args):
    """Fragment-pair registration, mirroring test_multi_ate.py:54-84:

    odometry (adjacent) pairs -> multiscale ICP from identity (certain);
    loop pairs -> FPFH + mutual matching + RANSAC init, ICP refinement,
    with post-alignment overlap fraction as the line-process fitness.
    """
    import jax
    import jax.numpy as jnp

    from ..match import match_pair
    from ..ops.fpfh import fpfh
    from ..solvers import RansacConfig, ransac_register
    from ..solvers.icp import (
        build_grid,
        grid_nn,
        grid_table_size,
        icp_point_to_point,
    )

    rcfg = RansacConfig(
        num_hypotheses=cfg_args.ransac_iters,
        chunk_size=min(65536, cfg_args.ransac_iters),
        inlier_thresh=cfg_args.threshold,
    )

    feats = [
        fpfh(c, v, radius=cfg_args.fpfh_radius)
        for c, v in zip(clouds, valids)
    ]

    def overlap_fitness(T, src, srcv, tgt, tgtv):
        cell = cfg_args.threshold
        table = build_grid(tgt, tgtv, cell, grid_table_size(tgt.shape[0]))
        # geometry matmul: pin f32 (TPU bf16 default = ~0.2 m at LiDAR scale)
        warped = jnp.einsum("nj,ij->ni", src, T[:3, :3],
                            precision="highest") + T[:3, 3]
        _, dist = grid_nn(table, tgt, warped, cell)
        hit = (dist < cfg_args.threshold) & srcv
        return float(jnp.sum(hit) / jnp.maximum(jnp.sum(srcv), 1))

    def multiscale_icp(src, srcv, tgt, tgtv, T0):
        T = T0
        for scale in (4.0, 2.0, 1.0):
            T = icp_point_to_point(
                src, srcv, tgt, tgtv, T,
                max_corr_dist=scale * cfg_args.threshold,
            )
        return T

    def pairwise(i, j):
        src, srcv = clouds[j], valids[j]
        tgt, tgtv = clouds[i], valids[i]
        if abs(i - j) == 1:
            T0 = jnp.eye(4)
        else:
            c = match_pair(feats[j], feats[i], src,
                           mask0=srcv, mask1=tgtv, mode="MNN")
            T0 = ransac_register(
                src, tgt[c.idx1], c.keep,
                jax.random.PRNGKey(1000 * i + j), rcfg,
                quality=c.quality, refit_mask=c.valid,
            ).transform
        T = multiscale_icp(src, srcv, tgt, tgtv, T0) if cfg_args.icp else T0
        fitness = overlap_fitness(T, src, srcv, tgt, tgtv)
        return np.asarray(T, np.float64), fitness

    return pairwise


def main(argv=None):
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--data", type=str, default=None,
                    help="dataset dir with depth/ PNGs (fileio layout)")
    ap.add_argument("--synthetic", type=int, default=0,
                    help="render N synthetic frames instead of reading data")
    ap.add_argument("--frames_per_fragment", type=int, default=15)
    ap.add_argument("--keyframe_every", type=int, default=5)
    ap.add_argument("--fragment_capacity", type=int, default=20000)
    ap.add_argument("--fragment_points", type=int, default=4096,
                    help="per-fragment subsampled cloud size for matching")
    ap.add_argument("--fpfh_radius", type=float, default=0.25)
    ap.add_argument("--threshold", type=float, default=0.15,
                    help="RANSAC inlier / ICP correspondence distance")
    ap.add_argument("--ransac_iters", type=int, default=8192)
    ap.add_argument("--icp", action="store_true", default=True)
    ap.add_argument("--no-icp", dest="icp", action="store_false")
    ap.add_argument("--gt_traj", type=str, default=None,
                    help=".log trajectory with GT fragment poses")
    ap.add_argument("--out", type=str, default="outputs/multiway")
    ap.add_argument("--max_depth", type=float, default=3.0)
    args = ap.parse_args(argv)

    import jax

    if jax.default_backend() != "cpu":
        # cached XLA:CPU AOT programs may carry machine features from the
        # remote compile helper (__graft_entry__ docstring); cache only TPU
        from ..utils.jaxcache import enable_persistent_cache

        enable_persistent_cache()

    import jax.numpy as jnp

    from ..data.fileio import write_ply
    from ..multiway.fileio import get_rgbd_file_lists, read_depth_png
    from ..multiway.fragments import make_fragment
    from ..multiway.trajectory import ate_rmse, multiway_register, write_trajectory

    K = _default_intrinsic()
    gt_poses = None
    if args.synthetic:
        depths, cam_poses = synthetic_sequence(args.synthetic, K)
    else:
        assert args.data, "--data or --synthetic required"
        _, depth_files = get_rgbd_file_lists(args.data)
        depths = [read_depth_png(p) for p in depth_files]
        cam_poses = None
    n_frag = max(1, len(depths) // args.frames_per_fragment)
    print(f"multiway: {len(depths)} frames -> {n_frag} fragments")

    clouds, valids, frag_gt = [], [], []
    for f in range(n_frag):
        lo = f * args.frames_per_fragment
        hi = min(len(depths), lo + args.frames_per_fragment)
        pts, normals, valid, poses = make_fragment(
            depths[lo:hi], K,
            n_keyframes_per_n_frame=args.keyframe_every,
            capacity=args.fragment_capacity,
            max_depth=args.max_depth,
            # voxel = cubic/512; 128^3 at 1/32 m spans [-2,2]^2 x [0.8,4.8]
            volume_dims=(128, 128, 128),
            tsdf_cubic_size=16.0,
            volume_origin=(-2.0, -2.0, 0.8),
        )
        # subsample to the matching budget (deterministic stride over valid)
        pts = np.asarray(pts)
        valid = np.asarray(valid)
        idx = np.flatnonzero(valid)
        if len(idx) > args.fragment_points:
            idx = idx[:: max(1, len(idx) // args.fragment_points)]
            idx = idx[: args.fragment_points]
        cap = args.fragment_points
        cloud = np.zeros((cap, 3), np.float32)
        cloud[: len(idx)] = pts[idx]
        v = np.arange(cap) < len(idx)
        clouds.append(jnp.asarray(cloud))
        valids.append(jnp.asarray(v))
        if cam_poses is not None:
            frag_gt.append(cam_poses[lo])   # fragment frame = first frame
        # fragment_%03d.ply like the reference's make_fragments output
        # (Experiments/multiway/make_fragments.py:112-131 TSDF -> .ply)
        os.makedirs(args.out, exist_ok=True)
        write_ply(
            os.path.join(args.out, f"fragment_{f:03d}.ply"),
            pts[idx],
            normals=np.asarray(normals)[idx] if normals is not None else None,
        )
        print(f"  fragment {f}: {len(idx)} pts "
              f"({hi - lo} frames)", flush=True)

    pairwise = make_pairwise_register(clouds, valids, args)
    nodes, weights, kept = multiway_register(n_frag, pairwise)
    nodes = np.asarray(nodes, np.float64)

    os.makedirs(args.out, exist_ok=True)
    traj_path = os.path.join(args.out, "trajectory.log")
    write_trajectory(traj_path, list(nodes))
    print(f"wrote {traj_path}")

    if args.gt_traj:
        from ..multiway.trajectory import read_trajectory

        frag_gt = read_trajectory(args.gt_traj)
    if frag_gt and len(frag_gt) == n_frag and n_frag >= 2:
        ate, _ = ate_rmse(list(nodes), [np.asarray(p) for p in frag_gt])
        print(f"ATE(cm): {100 * ate:.2f}")
        return nodes, float(ate)
    return nodes, None


if __name__ == "__main__":
    main()
