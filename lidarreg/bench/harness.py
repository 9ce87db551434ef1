"""Evaluation harness: per-pair stats matrix + analyze_stats reports.

Parity targets:
  * 22-column stats matrix, column semantics identical to
    Experiments/test.py:98-100,191-218 —
    0 success, 1 RE(deg), 2 TE(cm), 3 input-inlier #, 4 input-inlier ratio,
    5 output-inlier #, 6 precision, 7 recall, 8 f1, 9 model time,
    10 data time, 11 icp time, 12 success+ICP, 13 RE+ICP, 14 TE+ICP,
    15 #pairs init, 16 inlier ratio init, 17 #pairs filtered,
    18 inlier ratio filtered, 19 drive, 20 t0, 21 t1;
  * report lines byte-compatible with Experiments/test.py:80-84
    (`ALGO | recall: ...` + `ALGO+ICP | ...`);
  * shard files `<base>_res_<world>_<rank>.npy` merged by `analyze`
    (test.py:236-257,355-368) — kept for multi-host runs; single host
    shards over the mesh in-process.

Timing: wall-clock around `jax.block_until_ready` (the reference's Timer
tic/toc, Experiments/utils/timer.py:26-56).
"""
from __future__ import annotations

import glob as globlib
import os
import time
from dataclasses import dataclass, field
from typing import Callable

import numpy as np
import jax
import jax.numpy as jnp

from ..core.metrics import registration_errors
from ..core.se3 import transform
from ..solvers.icp import icp_point_to_point


@dataclass
class EvalConfig:
    algo: str = "RANSAC"
    re_thresh_deg: float = 5.0       # config.py:126-129
    te_thresh_cm: float = 60.0
    voxel_size: float = 0.3
    icp_max_corr: float = 0.6        # test.py:185-188
    icp_iters: int = 10
    max_samples: int | None = None
    extras: dict = field(default_factory=dict)


def _success(re_deg, te_cm, cfg):
    return float((te_cm < cfg.te_thresh_cm) and (re_deg < cfg.re_thresh_deg))


def _prf(pred: np.ndarray, gt: np.ndarray):
    tp = float(np.sum(pred & gt))
    prec = tp / max(pred.sum(), 1)
    rec = tp / max(gt.sum(), 1)
    f1 = 2 * prec * rec / max(prec + rec, 1e-12)
    return prec, rec, f1


def evaluate_pairs(
    dataset,
    features_for: Callable,
    register,
    cfg: EvalConfig,
    key,
    rank: int = 0,
    world_size: int = 1,
    progress: bool = False,
    warmup: bool = True,
    out_transforms: list | None = None,
    features_for_pair: Callable | None = None,
) -> np.ndarray:
    """Run the FR-style benchmark over `dataset`, sharded by (rank, world).

    features_for(cloud, T_align) -> (xyz [V,3], feats [V,C], valid [V]) on
    device. T_align is the 4x4 host array mapping this cloud into the pair's
    target frame (GT motion for the source cloud, identity for the target);
    real feature extractors ignore it, the surrogate-feature path uses it
    explicitly (no hidden call-order state).
    features_for_pair(cloud_a, cloud_b) -> the same six arrays from ONE
    batched encoder forward (FeaturePipeline.features_for_pair) — used when
    given; amortizes the sparse tables/kernel maps over both clouds.
    register(F0, F1, xyz0, xyz1, m0, m1, key) -> FRResult.
    """
    n_total = len(dataset)
    if cfg.max_samples is not None:
        n_total = min(n_total, cfg.max_samples)
    my_ids = list(range(rank, n_total, world_size))
    stats = np.zeros((len(my_ids), 22))
    eye4 = np.eye(4, dtype=np.float64)

    if warmup and my_ids:
        # Prime all jit caches so XLA compile time never lands in the
        # per-pair timing columns (first compile is tens of seconds).
        T_w, ca, cb = dataset.get_pair(my_ids[0])
        if features_for_pair is not None:
            x0, f0, v0, x1, f1, v1 = features_for_pair(ca, cb)
        else:
            x0, f0, v0 = features_for(ca, T_w)
            x1, f1, v1 = features_for(cb, eye4)
        r = register(f0, f1, x0, x1, v0, v1, key)
        jax.block_until_ready(
            icp_point_to_point(x0, v0, x1, v1, r.transform,
                               cfg.icp_max_corr, cfg.icp_iters)
        )

    for row, i in enumerate(my_ids):
        t0 = time.perf_counter()
        T_gt_np, cloud_a, cloud_b = dataset.get_pair(i)
        if features_for_pair is not None:
            xyz0, F0, m0, xyz1, F1, m1 = features_for_pair(cloud_a, cloud_b)
        else:
            xyz0, F0, m0 = features_for(cloud_a, T_gt_np)
            xyz1, F1, m1 = features_for(cloud_b, eye4)
        jax.block_until_ready(F1)
        data_time = time.perf_counter() - t0
        T_gt = jnp.asarray(T_gt_np.astype(np.float32))

        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        res = register(F0, F1, xyz0, xyz1, m0, m1, sub)
        jax.block_until_ready(res.transform)
        model_time = time.perf_counter() - t0

        t0 = time.perf_counter()
        T_icp = icp_point_to_point(
            xyz0, m0, xyz1, m1, res.transform,
            cfg.icp_max_corr, cfg.icp_iters,
        )
        jax.block_until_ready(T_icp)
        icp_time = time.perf_counter() - t0

        # ---- GT-referenced statistics ---------------------------------- #
        re, te = registration_errors(res.transform, T_gt)
        re, te = float(re), float(te) * 100.0
        re_i, te_i = registration_errors(T_icp, T_gt)
        re_i, te_i = float(re_i), float(te_i) * 100.0

        warped = transform(xyz0, T_gt)
        d = jnp.linalg.norm(warped - xyz1[res.idx1], axis=-1)
        gt_inlier = np.asarray((d < 2 * cfg.voxel_size) & res.valid)
        keep = np.asarray(res.keep)
        valid = np.asarray(res.valid)
        pred = np.asarray(res.inlier_mask)
        prec, rec, f1 = _prf(pred, gt_inlier)

        n_init = int(valid.sum())
        n_filt = int(keep.sum())
        p = dataset.pairs
        stats[row] = [
            _success(re, te, cfg), re, te,
            int(gt_inlier.sum()), gt_inlier.sum() / max(n_init, 1),
            int((pred & gt_inlier).sum()), prec, rec, f1,
            model_time, data_time, icp_time,
            _success(re_i, te_i, cfg), re_i, te_i,
            n_init, gt_inlier.sum() / max(n_init, 1),
            n_filt, float(gt_inlier[keep].sum()) / max(n_filt, 1),
            int(p.session_ind[i]), int(p.src_ind[i]), int(p.tgt_ind[i]),
        ]
        if out_transforms is not None:
            out_transforms.append(
                (int(p.session_ind[i]), int(p.src_ind[i]), int(p.tgt_ind[i]),
                 np.asarray(res.transform))
            )
        if progress and rank == 0:
            print(
                f"{time.strftime('%m/%d %H:%M:%S')} Finished pair:{i}/{n_total}",
                flush=True,
            )
    return stats


def analyze_stats(all_stats: np.ndarray, algo: str) -> str:
    """Report lines, format-parity with Experiments/test.py:80-84."""
    a = all_stats.mean(0)
    ok = all_stats[all_stats[:, 0] == 1]
    c = ok.mean(0) if len(ok) else np.zeros(22)
    t99 = np.quantile(all_stats[:, 9], 0.99)
    num_total = all_stats.shape[0]
    n_fail = int((all_stats[:, 0] == 0).sum())
    n_fail_icp = int((all_stats[:, 12] == 0).sum())

    s = "\n"
    s += (
        f"{a[15]:.0f} nn pairs ({a[16]:.3f} inliers), "
        f"{a[17]:.0f} filtered pairs ({a[18]:.3f} inliers)\n"
    )
    s += (
        f"{algo}     | recall: {100 * a[0]:.2f}%, "
        f"#failed/#total: {n_fail}/{num_total}, TE(cm): {c[2]:.3f}, "
        f"RE(deg): {c[1]:.3f}, mean reg time(s): {a[9]:.3f}, "
        f"99% reg time(s): {t99:.3f}\n"
    )
    s += (
        f"{algo}+ICP | recall: {100 * a[12]:.2f}%, "
        f"#failed/#total: {n_fail_icp}/{num_total}, TE(cm): {c[14]:.3f}, "
        f"RE(deg): {c[13]:.3f}, ICP time(s): {a[11]:.3f}, "
        f"Total time(s) {a[9] + a[11]:.3f}\n"
    )
    return s


def save_shard(stats: np.ndarray, tmp_base: str, world_size: int, rank: int):
    """test.py:257 shard convention: <base>_res_<world>_<rank>.npy."""
    os.makedirs(os.path.dirname(tmp_base) or ".", exist_ok=True)
    np.save(f"{tmp_base}_res_{world_size}_{rank}.npy", stats)


def merge_shards(tmp_base: str) -> np.ndarray:
    files = sorted(globlib.glob(f"{tmp_base}_res_*"))
    return np.vstack([np.load(f) for f in files])


def write_log(outdir: str, report: str, config_items: dict):
    """log.txt with full config + report (test.py:86-89)."""
    os.makedirs(outdir, exist_ok=True)
    with open(os.path.join(outdir, "log.txt"), "w") as fid:
        for k, v in config_items.items():
            fid.write(f"{k} = {v}\n")
        fid.write("\n" + report)
