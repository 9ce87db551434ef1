"""Training CLI — reference protocol: Experiments/train.py / FCGF_FAST/
train.py / DGR/train.py, unified behind one flag system.

  python -m lidarreg.cli.train --model pointdsc --dataset K --synthetic true \\
      --epochs 2 --steps_per_epoch 20 [--batch_size 4] [--outdir ...]
  python -m lidarreg.cli.train --model fcgf ...
  python -m lidarreg.cli.train --model dgr --fcgf_weights_file ckpt.msgpack ...

The reference spawns one NCCL process per GPU with manual grad all-reduce
(Experiments/train.py:45-64); here a single process drives a `data`-axis
mesh over every visible device (shard_map + pmean — parallel/mesh.py), so
1 chip and N chips run the same code. Checkpoints carry a config-snapshot
JSON next to the weights (train.py:31-43 discipline); scalar metrics stream
to metrics.jsonl (TensorBoard stand-in); the best-validation-recall snapshot
is kept separately (libs/trainer.py:284-292).
"""
from __future__ import annotations

import argparse
import os

import numpy as np

from .test import str2bool


def get_args(argv=None):
    p = argparse.ArgumentParser("lidarreg train")
    p.add_argument("--model", required=True,
                   choices=["pointdsc", "fcgf", "dgr", "oanet"])
    p.add_argument("--dataset", type=str, default="K")
    p.add_argument("--synthetic", type=str2bool, default=True)
    p.add_argument("--epochs", type=int, default=2)
    p.add_argument("--steps_per_epoch", type=int, default=25)
    p.add_argument("--batch_size", type=int, default=1,
                   help="pairs per device per step (global = x num_devices)")
    p.add_argument("--lr", type=float, default=None)
    p.add_argument("--num_node", type=int, default=1000)  # train default (config.py)
    p.add_argument("--capacity", type=int, default=8192)
    p.add_argument("--voxel_size", type=float, default=0.3)
    p.add_argument("--fcgf_weights_file", type=str, default=None)
    p.add_argument("--features", type=str, default="fcgf",
                   choices=["fcgf", "surrogate"],
                   help="pointdsc/dgr correspondence source: 'surrogate' "
                        "builds noisy GT-aligned descriptors (protocol-scale "
                        "inlier ratios without a fully-trained FCGF)")
    p.add_argument("--precomputed_root", type=str, default=None,
                   help="train pointdsc/oanet from a precomputed-descriptor "
                        "pair directory (train_3DMatch.py indoor protocol)")
    p.add_argument("--benchmark", type=str, default="3DMatch",
                   choices=["3DMatch", "3DLoMatch", "Redwood", "KITTI"],
                   help="family defaults when --precomputed_root is set")
    p.add_argument("--descriptor", type=str, default="fcgf",
                   choices=["fcgf", "fpfh"])
    p.add_argument("--outdir", type=str, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--resume", type=str, default=None)
    p.add_argument("--rot_augment", type=str2bool, default=True,
                   help="fcgf: per-cloud almost-planar [5,5,180]-deg "
                        "rotation augmentation (the reference training "
                        "protocol, FCGF_FAST/dataloader/"
                        "generic_balanced_loader.py:37-53). Training "
                        "without it leaves descriptors yaw-variant: the "
                        "round-5 N=200 Apollo matrix measured 0% recall "
                        "above 45 deg yaw on the unaugmented encoder")
    p.add_argument("--patience", type=int, default=0,
                   help="stop after this many consecutive epochs without a "
                        "val_metric improvement (0 = run all epochs) — the "
                        "plateau criterion for train-to-convergence runs")
    p.add_argument("--use_mesh", type=str2bool, default=False,
                   help="shard the step over all devices (DP)")
    p.add_argument("--tiny", type=str2bool, default=False,
                   help="tiny network configs (CI smoke tests)")
    return p.parse_args(argv)


def main(argv=None):
    args = get_args(argv)
    from ..utils.jaxcache import enable_persistent_cache
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from ..data import make_dataset
    from ..data.pipeline import pad_cloud, prepare_sparse_input
    from ..parallel.mesh import get_mesh
    from ..utils.checkpoint import save_variables
    from ..utils.logging import MetricsLogger, Tee, generate_output_dir

    outdir = args.outdir or generate_output_dir(
        "outputs", args.dataset, "train", args.model
    )
    tee = Tee(os.path.join(outdir, "log.txt"))
    metrics_log = MetricsLogger(os.path.join(outdir, "metrics.jsonl"))
    mesh = get_mesh() if args.use_mesh else None
    n_dev = len(jax.devices()) if mesh else 1

    train_ds = make_dataset(args.dataset, phase="train", synthetic=args.synthetic)
    val_ds = make_dataset(args.dataset, phase="validation",
                          synthetic=args.synthetic)
    rng = np.random.default_rng(args.seed)
    cap = args.capacity
    pt_cap = cap * 4

    def voxelized(c):
        pad, m = pad_cloud(c, pt_cap)
        st, xyz = prepare_sparse_input(jnp.asarray(pad), args.voxel_size,
                                       cap, jnp.int32(m))
        return st, xyz

    from ..core.se3 import transform as se3_transform

    def surrogate_desc(xyz, T, k):
        # GT-aligned position descriptor + noise (--features surrogate).
        # One shared implementation (pointdsc/oanet + dgr branches) so the
        # protocol can't silently diverge; se3.transform pins
        # precision="highest" — meter-scale coords through the bf16-default
        # matmul would inject ~0.2 m of systematic error into descriptors
        # whose deliberate noise is 0.35 m.
        T = jnp.asarray(np.asarray(T, np.float32))
        return se3_transform(xyz, T) + jax.random.normal(k, xyz.shape) * 0.35

    if args.use_mesh and args.model in ("fcgf", "dgr") and args.batch_size != 1:
        tee("note: --batch_size applies to pointdsc/oanet only; "
            "fcgf/dgr train one distinct pair per device")

    # ------------------------------------------------------------------ #
    if args.model == "fcgf":
        from ..models.fcgf import ResUNetBN2C
        from ..train.fcgf_trainer import (
            FCGFTrainerConfig, init_state, make_train_step,
        )

        model = ResUNetBN2C(
            channels=(0, 8, 16, 16, 32), tr_channels=(0, 8, 8, 8, 16),
            out_channels=8, conv1_kernel_size=3,
        ) if args.tiny else ResUNetBN2C()
        cfg = FCGFTrainerConfig(
            steps_per_epoch=args.steps_per_epoch,
            **({"lr": args.lr} if args.lr else {}),
        )

        def sample_batch(ds, key):
            i = int(rng.integers(len(ds)))
            T, a, b = ds.get_pair(i)
            if args.rot_augment:
                from ..data.augment import rotation_augment_pair

                T, a, b = rotation_augment_pair(rng, T, a, b)
            st0, xyz0 = voxelized(a)
            st1, xyz1 = voxelized(b)
            return {
                "st0": st0, "st1": st1, "xyz0": xyz0, "xyz1": xyz1,
                "T_gt": jnp.asarray(T.astype(np.float32)), "key": key,
            }

        ex = sample_batch(train_ds, jax.random.PRNGKey(0))
        state = init_state(model, cfg, ex["st0"], jax.random.PRNGKey(args.seed))
        step = make_train_step(model, cfg, mesh=mesh)

        def run_step(state, key):
            if mesh:
                # one DISTINCT pair per device (shard_map splits axis 0);
                # broadcasting a single pair would pmean identical grads —
                # N chips for 1 chip's training signal
                batch = jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[sample_batch(train_ds, k)
                      for k in jax.random.split(key, n_dev)],
                )
            else:
                batch = sample_batch(train_ds, key)
            return step(state, batch)

        from ..ops.knn import find_nn

        @jax.jit
        def _val_feats(variables, st0, st1):
            o0 = model.apply(variables, st0, train=False)
            o1 = model.apply(variables, st1, train=False)
            return o0.feats, o0.valid, o1.feats, o1.valid

        @jax.jit
        def _inlier_ratio(F0, m0, F1, m1, xyz0, xyz1, T):
            nn = find_nn(F0, F1, mask1=m1)
            warped = se3_transform(xyz0, T)
            d2 = jnp.sum((warped - xyz1[nn.idx]) ** 2, axis=1)
            close = d2 < (2 * args.voxel_size) ** 2
            return jnp.sum(close & m0) / jnp.maximum(jnp.sum(m0), 1)

        def val_metric(state):
            # NN inlier ratio on FIXED validation pairs with eval-mode
            # (running-stats) features — matchability IS the product
            # metric. Selecting `model_best` by train/val LOSS picks
            # collapsed embeddings: the hardest-contrastive loss keeps
            # improving while feature effective rank falls to ~3 and NN
            # matchability drops below random init (BASELINE.md round-3
            # matchability-collapse section).
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            probes = [(k, 0.0) for k in range(4)]
            if args.rot_augment:
                # deterministic large-yaw probes: matchability must hold
                # under rotation, not just on the raw (mostly small-yaw)
                # validation motions — selecting on raw-only is how the
                # round-4 encoder shipped 0% recall above 45 deg yaw
                probes += [(k, 45.0 + 45.0 * k) for k in range(4)]
            ratios = []
            for k, yaw in probes:
                T, a, b = val_ds.get_pair(k % len(val_ds))
                if yaw:
                    from ..data.augment import yaw_rotation_4x4

                    M = yaw_rotation_4x4(yaw)
                    a = (a @ M[:3, :3].T).astype(a.dtype)
                    T = np.asarray(T, np.float64) @ M.T  # inv = transpose
                st0, xyz0 = voxelized(a)
                st1, xyz1 = voxelized(b)
                F0, m0, F1, m1 = _val_feats(variables, st0, st1)
                ratios.append(float(_inlier_ratio(
                    F0, m0, F1, m1, xyz0, xyz1,
                    jnp.asarray(T.astype(np.float32)),
                )))
            return float(np.mean(ratios))

        params_of = lambda s: {"params": s.params, "batch_stats": s.batch_stats}  # noqa: E731

    elif args.model in ("pointdsc", "oanet"):
        from ..models import PointDSC
        from ..models.fcgf import ResUNetBN2C
        from ..data.pipeline import FeaturePipeline
        if args.model == "pointdsc":
            from ..train.pointdsc_trainer import (
                PointDSCTrainerConfig, init_state, make_train_step,
            )
        else:
            # OANet shares the batch protocol and loop; no SM head
            # (train/oanet_trainer.py)
            from ..models.oanet import OANet
            from ..train.oanet_trainer import (
                OANetTrainerConfig as PointDSCTrainerConfig,
                init_state, make_train_step,
            )
        from ..train.losses import transformation_loss

        if not args.precomputed_root:
            if args.features == "surrogate":
                # noisy GT-aligned position descriptors: the pair's clouds
                # map to a shared frame, so NN matching yields protocol-scale
                # inlier ratios without a fully-trained encoder (the
                # reference trains PointDSC on descriptors from a CONVERGED
                # FCGF — 400 real-data epochs; surrogate mode decouples the
                # outlier-rejection recipe from encoder availability)
                from ..data.pipeline import build_pointdsc_input

                class _SurrogatePipe:
                    def pointdsc_batch(self, ds_, ind, key):
                        T_gt, ca, cb = ds_.get_pair(ind)
                        key, ka, kb = jax.random.split(key, 3)

                        def fx(c, T, k):
                            pad, m = pad_cloud(c, pt_cap)
                            st, xyz = prepare_sparse_input(
                                jnp.asarray(pad), args.voxel_size, cap,
                                jnp.int32(m))
                            return xyz, surrogate_desc(xyz, T, k), st.valid

                        xyz0, F0, m0 = fx(ca, T_gt, ka)
                        xyz1, F1, m1 = fx(cb, np.eye(4), kb)
                        return build_pointdsc_input(
                            key, xyz0, F0, m0, xyz1, F1, m1,
                            args.num_node, 2 * args.voxel_size,
                            T_gt=jnp.asarray(T_gt.astype(np.float32)),
                        )

                pipe = _SurrogatePipe()
            else:
                fcgf = ResUNetBN2C()
                dummy_st, _ = voxelized(np.zeros((64, 3), np.float32))
                if args.fcgf_weights_file:
                    from ..utils.checkpoint import load_variables
                    fcgf_vars = load_variables(args.fcgf_weights_file)
                else:
                    fcgf_vars = fcgf.init(jax.random.PRNGKey(0), dummy_st,
                                          train=False)
                pipe = FeaturePipeline(
                    jax.jit(lambda v, x: fcgf.apply(v, x, train=False)),
                    fcgf_vars, args.voxel_size, cap, pt_cap, args.num_node,
                )

        if args.model == "pointdsc":
            if args.tiny:
                model = PointDSC(num_layers=2, num_channels=32, ratio=0.2,
                                 k=10)
            elif args.precomputed_root and args.benchmark != "KITTI":
                # indoor defaults (config.py:90-131 3DMatch family)
                model = PointDSC(inlier_threshold=0.10, sigma_d=0.10,
                                 nms_radius=0.10)
            else:
                model = PointDSC(inlier_threshold=1.2, sigma_d=1.2,
                                 nms_radius=1.2)
        else:
            model = OANet(num_channels=32, num_layers=4, clusters=50) \
                if args.tiny else OANet()
        cfg = PointDSCTrainerConfig(
            steps_per_epoch=args.steps_per_epoch,
            **({"lr": args.lr} if args.lr else {}),
        )

        if args.precomputed_root:
            # indoor protocol (Experiments/train_3DMatch.py:1-115): pairs come
            # from precomputed descriptors; correspondences are padded by
            # resampling to a fixed num_node so the step stays one program
            from ..data.precomputed import PrecomputedPairDataset
            from ..utils.config import DATASET_FAMILIES

            fam = DATASET_FAMILIES.get(args.benchmark, DATASET_FAMILIES["3DMatch"])

            def _pc_ds(split):
                return PrecomputedPairDataset(
                    args.precomputed_root, split=split,
                    descriptor=args.descriptor, num_node=args.num_node,
                    inlier_threshold=fam["inlier_threshold"], seed=args.seed,
                )

            pc_train, pc_val = _pc_ds("train"), _pc_ds("val")

            def _fixed(item, n_fix, r):
                n = len(item["gt_labels"])
                sel = (np.arange(n) if n == n_fix
                       else r.integers(0, max(n, 1), n_fix))
                out = {k: item[k][sel] for k in
                       ("corr_pos", "src_keypts", "tgt_keypts", "gt_labels")}
                out["gt_trans"] = item["gt_trans"]
                return out

            def sample_batch(ds_unused, key, r=None):
                r = rng if r is None else r
                ds_pc = pc_train if ds_unused is train_ds else pc_val
                outs = []
                for b in range(args.batch_size * max(n_dev, 1)):
                    i = int(r.integers(len(ds_pc)))
                    item = _fixed(ds_pc[i], args.num_node, r)
                    outs.append({k: jnp.asarray(v)[None]
                                 for k, v in item.items()})
                return {
                    k: jnp.concatenate([o[k] for o in outs], axis=0)
                    for k in outs[0]
                }
        else:
            def sample_batch(ds, key, r=None):
                r = rng if r is None else r
                outs = []
                for b in range(args.batch_size * max(n_dev, 1)):
                    i = int(r.integers(len(ds)))
                    key, sub = jax.random.split(key)
                    outs.append(pipe.pointdsc_batch(ds, i, sub))
                return {
                    k: jnp.concatenate([o[k] for o in outs], axis=0)
                    for k in outs[0]
                }

        ex = sample_batch(train_ds, jax.random.PRNGKey(0))
        state = init_state(model, cfg, ex, jax.random.PRNGKey(args.seed))
        step = make_train_step(model, cfg, mesh=mesh)

        def run_step(state, key):
            return step(state, sample_batch(train_ds, key))

        _val_kw = {"testing": False} if args.model == "pointdsc" else {}

        @jax.jit
        def _val_recall(variables, b):
            out = model.apply(
                variables,
                {k: b[k] for k in ("corr_pos", "src_keypts", "tgt_keypts")},
                train=False, **_val_kw,
            )
            tl = transformation_loss(
                out["final_trans"], b["gt_trans"], b["src_keypts"],
                b["tgt_keypts"], out["final_labels"],
            )
            return tl["recall"], tl["TE"], tl["RE"]

        def val_metric(state):
            # FIXED pairs + fixed resampling each epoch: model_best must
            # compare checkpoints on identical validation data, not on
            # whichever pair the advancing train rng happens to draw.
            # Averaged over SEVERAL fixed pairs — a single-pair val recall
            # is 0/100 and promoted a lucky near-init OANet checkpoint that
            # scored 0% on the 12-pair matrix (round-4 post-mortem) — with
            # a CONTINUOUS error tie-breaker: recall over 8 pairs has 12.5%
            # granularity and `vm > best` keeps the EARLIEST of tied
            # checkpoints, so a near-init checkpoint tying the final one
            # would win without it (round-4 ADVICE item 2).
            variables = {"params": state.params,
                         "batch_stats": state.batch_stats}
            recalls, errs = [], []
            for vi in range(8):
                b = sample_batch(val_ds, jax.random.PRNGKey(999 + vi),
                                 r=np.random.default_rng(999 + vi))
                rec, te, re = _val_recall(variables, b)
                recalls.append(float(rec))
                # clip so one diverged pair can't dominate the tie-break
                errs.append(min(float(te), 100.0) + min(float(re), 100.0))
            # tie-break term < 0.2 total: never flips a real recall step
            # (12.5 points), always separates equal-recall checkpoints
            return float(np.mean(recalls)) - 1e-3 * float(np.mean(errs))

        params_of = lambda s: {"params": s.params, "batch_stats": s.batch_stats}  # noqa: E731

    else:  # dgr
        from ..models.fcgf import ResUNetBN2C
        from ..sparse.tensor import SparseTensor
        from ..train.dgr_trainer import (
            DGRTrainerConfig, init_state, make_train_step,
        )

        fcgf = ResUNetBN2C(
            channels=(0, 8, 16, 16, 32), tr_channels=(0, 8, 8, 8, 16),
            out_channels=8, conv1_kernel_size=3,
        ) if args.tiny else ResUNetBN2C()
        dummy_st, _ = voxelized(np.zeros((64, 3), np.float32))
        if args.fcgf_weights_file:
            from ..utils.checkpoint import load_variables
            fcgf_vars = load_variables(args.fcgf_weights_file)
        else:
            fcgf_vars = fcgf.init(jax.random.PRNGKey(0), dummy_st, train=False)
        fcgf_apply = jax.jit(lambda v, x: fcgf.apply(v, x, train=False))

        if args.tiny:
            inlier_net = ResUNetBN2C(
                dim=6, out_channels=1, normalize_feature=False,
                channels=(0, 8, 16, 16, 32), tr_channels=(0, 8, 8, 8, 16),
                conv1_kernel_size=3,
            )
        else:
            # inlier_conv1_kernel_size=3 (DGR/config.py:83)
            inlier_net = ResUNetBN2C(dim=6, out_channels=1,
                                     conv1_kernel_size=3,
                                     normalize_feature=False)
        cfg = DGRTrainerConfig(
            steps_per_epoch=args.steps_per_epoch,
            **({"lr": args.lr} if args.lr else {}),
        )

        def sample_batch(ds, key, r=None):
            i = int((rng if r is None else r).integers(len(ds)))
            T, a, b = ds.get_pair(i)
            st0, xyz0 = voxelized(a)
            st1, xyz1 = voxelized(b)
            if args.features == "surrogate":
                # GT-aligned position descriptors (see --features help)
                ka, kb = jax.random.split(jax.random.fold_in(key, i))
                F0 = surrogate_desc(xyz0, T, ka)
                F1 = surrogate_desc(xyz1, np.eye(4), kb)
                f0v, f1v = st0.valid, st1.valid
            else:
                f0 = fcgf_apply(fcgf_vars, st0)
                f1 = fcgf_apply(fcgf_vars, st1)
                F0, F1, f0v, f1v = f0.feats, f1.feats, f0.valid, f1.valid
            return {
                "F0": F0, "F1": F1,
                "xyz0": xyz0, "xyz1": xyz1,
                "c0": st0.coords, "c1": st1.coords,
                "m0": f0v, "m1": f1v,
                "T_gt": jnp.asarray(T.astype(np.float32)),
            }

        ex6 = SparseTensor(
            jnp.zeros((cap, 6), jnp.int32), jnp.ones((cap, 1)),
            jnp.ones((cap,), bool), 1,
        )
        state = init_state(inlier_net, cfg, ex6, jax.random.PRNGKey(args.seed))
        step = make_train_step(inlier_net, cfg, mesh=mesh)

        def run_step(state, key):
            if mesh:
                # one DISTINCT pair per device (see fcgf run_step)
                batch = jax.tree.map(
                    lambda *xs: jnp.stack(xs),
                    *[sample_batch(train_ds, k)
                      for k in jax.random.split(key, n_dev)],
                )
            else:
                batch = sample_batch(train_ds, key)
            return step(state, batch)

        # built ONCE: re-creating the step closure per epoch re-traces the
        # full grad+optimizer program each time (minutes through the tunnel)
        _val_step = step if mesh is None else make_train_step(inlier_net, cfg)

        def val_metric(state):
            _, m = _val_step(
                state, sample_batch(val_ds, jax.random.PRNGKey(999),
                                    r=np.random.default_rng(999)),
            )
            return -float(m["bce"])

        params_of = lambda s: {"params": s.params, "batch_stats": s.batch_stats}  # noqa: E731

    # ------------------------------------------------------------------ #
    if args.resume:
        # warm-start params/batch_stats from a saved snapshot (optimizer
        # state restarts fresh; the reference's FCGF resume also re-derives
        # scheduler position — FCGF_FAST/train.py:30-49).
        from ..utils.checkpoint import load_variables

        loaded = load_variables(args.resume)
        state = state._replace(
            params=loaded["params"],
            batch_stats=loaded.get("batch_stats", state.batch_stats),
        )
        tee(f"resumed model weights from {args.resume}")

    key = jax.random.PRNGKey(args.seed)
    best = -np.inf
    gstep = 0
    stale = 0
    for epoch in range(args.epochs):
        for it in range(args.steps_per_epoch):
            key, sub = jax.random.split(key)
            state, m = run_step(state, sub)
            gstep += 1
            if it % 10 == 0:
                tee(f"epoch {epoch} it {it} " + " ".join(
                    f"{k}={float(v):.4f}" for k, v in sorted(m.items())
                ))
                metrics_log.log(gstep, **m)
        vm = val_metric(state)
        tee(f"epoch {epoch} val_metric {vm:.4f}")
        metrics_log.log(gstep, val_metric=vm)
        # The DGR inlier net's 6-D convs carry 3^6-point stencils (~944 MB
        # of f32 params); store those checkpoints bf16 (params stay f32 in
        # memory — load_variables upcasts).
        bf16 = args.model == "dgr"
        save_variables(
            os.path.join(outdir, f"model_{epoch}.msgpack"), params_of(state),
            config=vars(args), store_bf16=bf16,
        )
        if vm > best:
            best = vm
            stale = 0
            save_variables(
                os.path.join(outdir, "model_best.msgpack"), params_of(state),
                config=vars(args), store_bf16=bf16,
            )
        else:
            stale += 1
            if args.patience and stale >= args.patience:
                tee(f"early stop at epoch {epoch}: val_metric plateaued "
                    f"({stale} epochs without improvement)")
                break
    tee(f"done; best val metric {best:.4f}; outputs in {outdir}")
    return outdir


if __name__ == "__main__":
    main()
