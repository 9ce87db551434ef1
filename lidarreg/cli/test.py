"""Benchmark test CLI — reference protocol: Experiments/test.py:273-405.

Usage (flag parity with test.py:295-313 where applicable):

  python -m lidarreg.cli.test --dataset A --algo RANSAC --mode GPF \\
      --iters 50000 [--codebase batched] [--prosac true] \\
      [--fast_rejection ELC] [--max_samples N] [--synthetic true] \\
      [--rank R --world_size W --tmp_file_base /tmp/run1] [--analysis]

Multi-process sharding keeps the reference's shard-file protocol
(test_parallel.sh: one process per accelerator, then an `--analysis` merge
run); on a single host the same flag pair shards over pair indices.
`--synthetic true` runs the benchmark over deterministic synthetic scenes
driven by the real published balanced-set motions (no raw data needed);
with raw data mounted (LIDARREG_DATA) use `--synthetic false`.

The FCGF encoder runs with randomly-initialized weights unless
`--fcgf_weights_file` points at a saved checkpoint (msgpack, see
lidarreg.utils.checkpoint); `--features surrogate` uses noisy GT-aligned
position features instead (upper-bound matching quality; used for solver
benchmarking).
"""
from __future__ import annotations

import argparse
import os
import time

import numpy as np


def str2bool(v: str) -> bool:
    return str(v).lower() in ("yes", "true", "t", "1")


def get_args(argv=None):
    p = argparse.ArgumentParser("lidarreg test")
    p.add_argument("--dataset", type=str, required=True,
                   help="K/A/B/S/L or full name")
    p.add_argument("--algo", type=str, default="RANSAC",
                   choices=["RANSAC", "GC_RANSAC", "PointDSC", "TEASER",
                            "DGR", "OANet"])
    p.add_argument("--codebase", type=str, default="batched",
                   choices=["batched", "open3d", "GC"],
                   help="RANSAC preset (FR.py:61-98 codebase switch): "
                        "'open3d' = uniform sampling + single refit, "
                        "'GC'/'batched' = PROSAC + ELC + iterated-LS LO")
    p.add_argument("--mode", type=str, default="GPF",
                   choices=["GPF", "MNN", "no_filter"])
    p.add_argument("--iters", type=int, default=50_000)
    p.add_argument("--confidence", type=float, default=0.9995,
                   help="RANSAC convergence confidence (FR.py:136); "
                        "0.0 runs the fixed hypothesis budget")
    p.add_argument("--phase", type=str, default="test",
                   choices=["train", "validation", "test"])
    p.add_argument("--prosac", type=str2bool, default=True)
    p.add_argument("--fast_rejection", type=str, default="ELC",
                   choices=["ELC", "NONE"])
    p.add_argument("--GPF_factor", type=float, default=2.0)
    p.add_argument("--GPF_grid_wid", type=int, default=10)
    p.add_argument("--max_samples", type=int, default=None)
    p.add_argument("--synthetic", type=str2bool, default=True)
    p.add_argument("--features", type=str, default="fcgf",
                   choices=["fcgf", "surrogate"])
    p.add_argument("--fcgf_weights_file", type=str, default=None)
    p.add_argument("--oanet_weights_file", type=str, default=None,
                   help="trained OANet checkpoint for --algo OANet")
    p.add_argument("--pointdsc_weights_file", type=str, default=None,
                   help="trained PointDSC checkpoint (msgpack) for "
                        "--algo PointDSC (test.py:377-397 snapshot load)")
    p.add_argument("--dgr_weights_file", type=str, default=None,
                   help="trained 6-D inlier-net checkpoint for --algo DGR")
    p.add_argument("--clip_weight_thresh", type=float, default=0.05,
                   help="DGR inlier-weight clip (DGR/config.py:76; "
                        "calibrate with solvers.dgr.calibrate_clip_weight_thresh)")
    p.add_argument("--voxel_size", type=float, default=0.3)
    p.add_argument("--capacity", type=int, default=32768)
    p.add_argument("--num_node", type=int, default=12000)
    p.add_argument("--outdir", type=str, default=None)
    p.add_argument("--rank", type=int, default=0)
    p.add_argument("--world_size", type=int, default=1)
    p.add_argument("--tmp_file_base", type=str, default=None)
    p.add_argument("--analysis", action="store_true",
                   help="merge shard files and print the report")
    p.add_argument("--seed", type=int, default=51)  # benchmark_utils.py:27-38
    p.add_argument("--num_repeats", type=int, default=1,
                   help="repeat eval for mean/std (FCGF_FAST/test.py:39-82)")
    p.add_argument("--tiny", type=str2bool, default=False,
                   help="tiny network configs (CI smoke tests)")
    p.add_argument("--export_coarse", type=str2bool, default=False,
                   help="write coarse_motions.txt for the refinement test")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    # heavy imports after arg parsing (fast --help)
    from ..utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from ..bench import (
        EvalConfig, FRConfig, analyze_stats, evaluate_pairs,
        make_fr_register, merge_shards, save_shard, write_log,
    )
    from ..data import make_dataset
    from ..data.pipeline import pad_cloud, prepare_sparse_input

    outdir = args.outdir or os.path.join(
        "outputs", f"{args.dataset}.{args.algo}.{time.strftime('%y%m%d_%H%M%S')}"
    )

    if args.analysis:
        stats = merge_shards(args.tmp_file_base)
        report = analyze_stats(stats, args.algo)
        print(report)
        write_log(outdir, report, vars(args))
        np.save(os.path.join(outdir, "raw_stats.npy"), stats)
        return report

    ds = make_dataset(args.dataset, phase=args.phase, synthetic=args.synthetic)

    cap = args.capacity
    pt_cap = cap * 4

    if args.features == "fcgf":
        from ..models.fcgf import ResUNetBN2C
        from ..sparse.tensor import SparseTensor

        model = ResUNetBN2C()
        dummy = SparseTensor(
            jnp.zeros((cap, 3), jnp.int32), jnp.ones((cap, 1)),
            jnp.ones((cap,), bool), 1,
        )
        if args.fcgf_weights_file:
            from ..utils.checkpoint import load_variables
            variables = load_variables(args.fcgf_weights_file)
        else:
            variables = model.init(jax.random.PRNGKey(0), dummy, train=False)
        fcgf_apply = jax.jit(lambda v, x: model.apply(v, x, train=False))

        def features_for(cloud, T_align):
            pad, m = pad_cloud(cloud, pt_cap)
            st, xyz = prepare_sparse_input(jnp.asarray(pad), args.voxel_size,
                                           cap, jnp.int32(m))
            out = fcgf_apply(variables, st)
            return xyz, out.feats, out.valid

        # one batched forward per pair: tables/kernel maps amortize over
        # both clouds (data.pipeline.prepare_pair_sparse_input)
        from ..data.pipeline import FeaturePipeline
        _pipe = FeaturePipeline(fcgf_apply, variables, args.voxel_size,
                                cap, pt_cap, args.num_node)
        features_for_pair = _pipe.features_for_pair
    else:
        # surrogate: noisy GT-aligned positions (solver-benchmark mode).
        # T_align comes explicitly from the harness per cloud (GT motion for
        # the source cloud, identity for the target) — no call-order state.
        def features_for(cloud, T_align):
            pad, m = pad_cloud(cloud, pt_cap)
            st, xyz = prepare_sparse_input(jnp.asarray(pad), args.voxel_size,
                                           cap, jnp.int32(m))
            is_src = int(not np.allclose(T_align, np.eye(4)))
            p = jnp.einsum(
                "nj,ji->ni", xyz,
                jnp.asarray(T_align[:3, :3].T.astype(np.float32)),
                precision="highest",
            ) + jnp.asarray(T_align[:3, 3].astype(np.float32))
            noise_key = jax.random.fold_in(jax.random.PRNGKey(0), is_src)
            f = p + jax.random.normal(noise_key, p.shape) * 0.1
            return xyz, f, st.valid

    if args.algo in ("RANSAC", "GC_RANSAC"):
        # --codebase mirrors FR.py:61-98's GC vs Open3D switch; GC_RANSAC as
        # an algo name (Experiments/algorithms/GC_RANSAC.py:8-55) forces the
        # GC preset (PROSAC + ELC + iterated-LS LO).
        codebase = "GC" if args.algo == "GC_RANSAC" else args.codebase
        if codebase == "open3d":
            # Open3D RANSAC_registration semantics (FR.py:122-139): uniform
            # sampling, EdgeLength checker, one LS refit on final inliers.
            prosac, refit_iters = False, 1
        else:
            prosac, refit_iters = args.prosac, 3
        # the GC preset runs the actual graph-cut local optimization
        # (native C++ s-t min-cut, GC-RANSAC LO semantics) instead of the
        # in-solver iterated-LS refits, so the GC_RANSAC benchmark row
        # measures the reference's LO, not the default path again
        gc_lo = codebase == "GC"
        fr = make_fr_register(
            FRConfig(
                mode=args.mode,
                iters=args.iters,
                voxel_size=args.voxel_size,
                prosac=prosac,
                use_elc=args.fast_rejection == "ELC",
                grid_wid=args.GPF_grid_wid,
                gpf_factor=args.GPF_factor,
                refit_iters=0 if gc_lo else refit_iters,
                graph_cut_lo=gc_lo,
                confidence=args.confidence,
            )
        )
    elif args.algo == "TEASER":
        # TEASER protocol (Experiments/test.py + algorithms/
        # TEASER_plus_plus.py:78-126): GPF BB_first cap feeds the solver.
        from ..bench.registration import FRResult
        from ..match import match_pair
        from ..solvers.teaser import TeaserConfig, teaser_register
        from ..core.se3 import transform as se3_transform

        tcfg = TeaserConfig(noise_bound=args.voxel_size)

        @jax.jit
        def fr(F0, F1, xyz0, xyz1, m0, m1, key):
            c = match_pair(
                F0, F1, xyz0, mask0=m0, mask1=m1, mode="GPF",
                bb_first=True, max_matches=tcfg.max_corr,
                grid_wid=args.GPF_grid_wid, gpf_factor=args.GPF_factor,
            )
            tgt = xyz1[c.idx1]
            res = teaser_register(xyz0, tgt, c.keep, tcfg)
            warped = se3_transform(xyz0, res.transform)
            d = jnp.linalg.norm(warped - tgt, axis=-1)
            inl = (d < 2 * args.voxel_size) & c.valid
            return FRResult(res.transform, c.idx1, c.valid, c.keep, inl,
                            jnp.sum(c.keep.astype(jnp.int32)))

    elif args.algo == "DGR":
        # DGR benchmark path (DGR/scripts/test_kitti.py:98-172): 6-D
        # inlier net -> weighted Procrustes + SE(3) refine, RANSAC safeguard.
        from ..solvers.dgr import DGRConfig, make_dgr_register
        from ..models.fcgf import ResUNetBN2C
        from ..ops.voxelize import quantize_coords
        from ..sparse.tensor import SparseTensor
        from ..bench.registration import FRResult
        from ..core.se3 import transform as se3_transform

        if args.tiny:
            inlier_model = ResUNetBN2C(
                dim=6, out_channels=1, normalize_feature=False,
                channels=(0, 8, 16, 16, 32), tr_channels=(0, 8, 8, 8, 16),
                conv1_kernel_size=3,
            )
        else:
            # inlier_conv1_kernel_size=3 (DGR/config.py:83): k5 in 6-D
            # would be 5^6 = 15625 offsets
            inlier_model = ResUNetBN2C(dim=6, out_channels=1,
                                       conv1_kernel_size=3,
                                       normalize_feature=False)
        dummy6 = SparseTensor(
            jnp.zeros((cap, 6), jnp.int32), jnp.ones((cap, 1)),
            jnp.ones((cap,), bool), 1,
        )
        if args.dgr_weights_file:
            from ..utils.checkpoint import load_variables
            ivars = load_variables(args.dgr_weights_file)
        else:
            ivars = inlier_model.init(jax.random.PRNGKey(2), dummy6,
                                      train=False)
        dgr = make_dgr_register(
            inlier_model, ivars,
            DGRConfig(voxel_size=args.voxel_size,
                      clip_weight_thresh=args.clip_weight_thresh),
        )

        # no OUTER jit here: the dgr register is already jitted with the
        # inlier weights as a traced argument; wrapping it again would
        # constant-fold them into the program (HTTP 413 on the tunnel)
        @jax.jit
        def _dgr_prep(xyz0, xyz1, m0, m1):
            c0 = quantize_coords(xyz0, args.voxel_size) * m0[:, None]
            c1 = quantize_coords(xyz1, args.voxel_size) * m1[:, None]
            return c0, c1

        @jax.jit
        def _dgr_post(T, idx1, xyz0, xyz1, m0):
            warped = se3_transform(xyz0, T)
            d = jnp.linalg.norm(warped - xyz1[idx1], axis=-1)
            inl = (d < 2 * args.voxel_size) & m0
            return inl, jnp.sum(m0.astype(jnp.int32))

        def fr(F0, F1, xyz0, xyz1, m0, m1, key):
            c0, c1 = _dgr_prep(xyz0, xyz1, m0, m1)
            res = dgr(F0, F1, xyz0, xyz1, c0, c1, m0, m1, key)
            inl, n = _dgr_post(res.transform, res.idx1, xyz0, xyz1, m0)
            return FRResult(res.transform, res.idx1, m0, m0, inl, n)

    elif args.algo == "OANet":
        # OANet benchmarked alongside PointDSC on the same correspondence
        # inputs (Experiments/models/OANet.py)
        from ..bench.registration import FRResult
        from ..data.pipeline import build_pointdsc_input
        from ..models.oanet import OANet
        from ..core.se3 import transform as se3_transform

        omodel = (OANet(num_channels=32, num_layers=4, clusters=50)
                  if args.tiny else OANet())
        num_node = min(args.num_node, cap)
        dummy = {
            "corr_pos": jnp.zeros((1, num_node, 6)),
            "src_keypts": jnp.zeros((1, num_node, 3)),
            "tgt_keypts": jnp.zeros((1, num_node, 3)),
        }
        if args.oanet_weights_file:
            from ..utils.checkpoint import load_variables
            ovars = load_variables(args.oanet_weights_file)
        else:
            ovars = omodel.init(jax.random.PRNGKey(1), dummy, train=False)

        @jax.jit
        def fr(F0, F1, xyz0, xyz1, m0, m1, key):
            data = build_pointdsc_input(
                key, xyz0, F0, m0, xyz1, F1, m1, num_node,
                2 * args.voxel_size,
            )
            out = omodel.apply(ovars, data, train=False)
            T = out["final_trans"][0]
            from ..ops.knn import find_nn

            nn = find_nn(F0, F1, mask1=m1)
            warped = se3_transform(xyz0, T)
            d = jnp.linalg.norm(warped - xyz1[nn.idx], axis=-1)
            inl = (d < 2 * args.voxel_size) & m0
            return FRResult(T, nn.idx, m0, m0,
                            inl, jnp.sum(m0.astype(jnp.int32)))

    else:  # PointDSC (Experiments/test.py:377-397 inference path)
        from ..bench.registration import FRResult
        from ..data.pipeline import build_pointdsc_input
        from ..models import PointDSC
        from ..core.se3 import transform as se3_transform

        pmodel = PointDSC(inlier_threshold=1.2, sigma_d=1.2, nms_radius=1.2)
        num_node = min(args.num_node, cap)
        dummy = {
            "corr_pos": jnp.zeros((1, num_node, 6)),
            "src_keypts": jnp.zeros((1, num_node, 3)),
            "tgt_keypts": jnp.zeros((1, num_node, 3)),
        }
        if args.pointdsc_weights_file:
            from ..utils.checkpoint import load_variables
            pvars = load_variables(args.pointdsc_weights_file)
        else:
            pvars = pmodel.init(jax.random.PRNGKey(1), dummy, testing=False,
                                train=False)

        @jax.jit
        def fr(F0, F1, xyz0, xyz1, m0, m1, key):
            data = build_pointdsc_input(
                key, xyz0, F0, m0, xyz1, F1, m1, num_node,
                2 * args.voxel_size,
            )
            out = pmodel.apply(pvars, data, testing=True, train=False)
            T = out["final_trans"][0]
            # report stats over the NN correspondence set like FR
            from ..ops.knn import find_nn

            nn = find_nn(F0, F1, mask1=m1)
            warped = se3_transform(xyz0, T)
            d = jnp.linalg.norm(warped - xyz1[nn.idx], axis=-1)
            inl = (d < 2 * args.voxel_size) & m0
            return FRResult(T, nn.idx, m0, m0,
                            inl, jnp.sum(m0.astype(jnp.int32)))

    if args.features != "fcgf":
        features_for_pair = None
    cfg = EvalConfig(algo=args.algo, voxel_size=args.voxel_size,
                     max_samples=args.max_samples)
    repeat_recalls, repeat_times = [], []
    stats = None
    transforms = [] if args.export_coarse else None
    for rep in range(args.num_repeats):
        if transforms is not None:
            transforms.clear()
        stats = evaluate_pairs(
            ds, features_for, fr, cfg, jax.random.PRNGKey(args.seed + rep),
            rank=args.rank, world_size=args.world_size, progress=True,
            out_transforms=transforms, features_for_pair=features_for_pair,
        )
        repeat_recalls.append(100.0 * stats[:, 0].mean())
        repeat_times.append(stats[:, 9].mean())

    if args.tmp_file_base:
        save_shard(stats, args.tmp_file_base, args.world_size, args.rank)
        return None
    report = analyze_stats(stats, args.algo)
    if args.num_repeats > 1:
        # repeat-based statistics (FCGF_FAST/test.py:39-82,155-157)
        r = np.asarray(repeat_recalls)
        t = np.asarray(repeat_times)
        report += (
            f"repeats({args.num_repeats}): recall "
            f"{r.mean():.2f}±{r.std():.2f}%, reg time "
            f"{t.mean():.3f}±{t.std():.3f}s\n"
        )
    print(report)
    write_log(outdir, report, vars(args))
    os.makedirs(outdir, exist_ok=True)
    np.save(os.path.join(outdir, "raw_stats.npy"), stats)

    # failure artifacts: drive/t0/t1 + errors per failed pair
    # (FCGF_FAST/test.py:58-67, DGR/scripts/test_kitti.py:108-150)
    failed = stats[stats[:, 0] == 0]
    with open(os.path.join(outdir, "failures.txt"), "w") as f:
        f.write("session t0 t1 RE_deg TE_cm\n")
        for row in failed:
            f.write(
                f"{int(row[19])} {int(row[20])} {int(row[21])} "
                f"{row[1]:.4f} {row[2]:.4f}\n"
            )

    if transforms is not None:
        # coarse-motion export consumed by cli.refinement
        # (FCGF_FAST/test.py:86-97 format)
        path = os.path.join(outdir, "coarse_motions.txt")
        transforms.sort(key=lambda r: (r[0], r[1]))
        with open(path, "w") as f:
            f.write(
                "session_ind source_ind target_ind "
                + " ".join(f"mot{k}" for k in range(16)) + "\n"
            )
            for (si, t0_, t1_, T) in transforms:
                f.write(
                    f"{si} {t0_} {t1_} "
                    + " ".join(f"{x:.16f}" for x in T.flatten()) + "\n"
                )
    return report


if __name__ == "__main__":
    main()
