"""Registration pipeline factory: features -> matching -> robust estimation.

TPU-native counterpart of the `FR()` driver (Experiments/algorithms/
FR.py:16-119): one jitted program per configuration covering
  find_nn(+2nd) -> MNN | GPF | no_filter -> batched RANSAC (PROSAC/ELC/LO)
plus the PointDSC path (model forward, testing mode).

Timing protocol note: the reference excludes 1st-NN time from the reported
registration time (it is "already available"; only the *extra* 2nd-NN time
counts — Experiments/algorithms/matching.py:6-19). Here the full jitted
program (matching + filter + RANSAC) is timed as model time — a STRICTER
accounting than the reference's (our number includes work the reference
doesn't charge for).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..match.pipeline import match_pair
from ..solvers.ransac import RansacConfig, ransac_register


class FRConfig(NamedTuple):
    mode: str = "GPF"               # MNN | GPF | no_filter (FR.py:48-56)
    iters: int = 50_000             # hypothesis budget (`--iters`)
    voxel_size: float = 0.3
    prosac: bool = True
    use_elc: bool = True
    grid_wid: int = 10
    gpf_factor: float = 2.0
    stage1_samples: int = 512
    top_k: int = 512
    refit_iters: int = 3
    chunk_size: int = 65_536
    # GC preset: run the native graph-cut local optimization
    # (native/gc_local_opt.cpp, exact s-t min-cut under the GC-RANSAC
    # energy) on the winner as a host post-step — the C++ LO the reference
    # binds (gcransac_python.cpp:404-624). 0.0 is the reference harness
    # default lambda (Experiments/test.py:306).
    graph_cut_lo: bool = False
    spatial_coherence_weight: float = 0.0
    # NN distance matmul precision ("highest" = exact f32, parity with the
    # reference's torch matmul; see scripts/knn_precision_ablation.py)
    match_precision: str = "highest"
    # RANSAC convergence confidence (FR.py:136; 0.0 = fixed budget)
    confidence: float = 0.9995


class FRResult(NamedTuple):
    transform: jnp.ndarray     # [4, 4]
    idx1: jnp.ndarray          # [N] NN target of each source voxel
    valid: jnp.ndarray         # [N] real source voxels (pairs_init mask)
    keep: jnp.ndarray          # [N] pairs surviving the filter
    inlier_mask: jnp.ndarray   # [N] final RANSAC inliers (pred labels)
    num_kept: jnp.ndarray


def make_fr_register(cfg: FRConfig):
    """Build the jitted register(F0, F1, xyz0, xyz1, m0, m1, key) program."""
    rcfg = RansacConfig(
        num_hypotheses=cfg.iters,
        inlier_thresh=2.0 * cfg.voxel_size,     # FR.py:85,95
        elc_similarity=0.9,
        use_elc=cfg.use_elc,
        prosac=cfg.prosac,
        stage1_samples=cfg.stage1_samples,
        top_k=cfg.top_k,
        refit_iters=cfg.refit_iters,
        chunk_size=min(cfg.chunk_size, max(1024, cfg.iters)),
        confidence=cfg.confidence,
    )

    # TWO dispatches, not one fused program: measured on v5e, the fused
    # match+solve jit runs 107 ms amortized vs 69 ms for the same work as
    # two back-to-back programs — XLA schedules the pallas kNN kernel +
    # the RANSAC while_loop badly when they share one program (+25 ms on
    # the kNN, +13 ms on the loop; BASELINE.md round-4 protocol section).
    # Structure parity: the reference also runs matching and RANSAC as
    # separate steps (matching.py then FR.py's loop).
    @jax.jit
    def match_stage(F0, F1, xyz0, m0, m1):
        return match_pair(
            F0, F1, xyz0, mask0=m0, mask1=m1, mode=cfg.mode,
            grid_wid=cfg.grid_wid, gpf_factor=cfg.gpf_factor,
            precision=cfg.match_precision,
        )

    @jax.jit
    def solve_stage(c, xyz0, xyz1, key):
        tgt = xyz1[c.idx1]
        res = ransac_register(
            xyz0, tgt, c.keep, key, rcfg,
            quality=c.quality if cfg.prosac else None,
            refit_mask=c.valid,
        )
        return FRResult(
            transform=res.transform,
            idx1=c.idx1,
            valid=c.valid,
            keep=c.keep,
            inlier_mask=res.inlier_mask,
            num_kept=res.num_kept,
        )

    def register(F0, F1, xyz0, xyz1, m0, m1, key):
        c = match_stage(F0, F1, xyz0, m0, m1)
        return solve_stage(c, xyz0, xyz1, key)

    if not cfg.graph_cut_lo:
        return register

    import numpy as np

    from ..native import gc_local_optimize

    def register_gc(F0, F1, xyz0, xyz1, m0, m1, key):
        res = register(F0, F1, xyz0, xyz1, m0, m1, key)
        keep = np.asarray(res.keep & res.valid)
        src = np.asarray(xyz0)[keep]
        tgt = np.asarray(xyz1)[np.asarray(res.idx1)][keep]
        pose, _, _ = gc_local_optimize(
            src, tgt, np.asarray(res.transform, np.float64),
            threshold=2.0 * cfg.voxel_size,
            spatial_coherence_weight=cfg.spatial_coherence_weight,
        )
        return res._replace(transform=jnp.asarray(pose, jnp.float32))

    return register_gc


def make_pointdsc_register(model, variables):
    """Jitted PointDSC inference path (testing=True) on a built input dict."""

    @jax.jit
    def register(data):
        out = model.apply(variables, data, testing=True, train=False)
        return out["final_trans"][0], out["final_labels"][0]

    return register
