"""Massively-batched RANSAC hypothesis engine (the framework's centerpiece).

Replaces BOTH C++ robust-estimation backends of the reference with one
TPU-native design:

  * Open3D `registration_ransac_based_on_correspondence` (ransac_n=4,
    EdgeLength checker, confidence early-exit) — Experiments/algorithms/
    FR.py:122-139 — and
  * GC-RANSAC `findRigidTransform` (PROSAC sampling, ELC preemption, MSAC
    scoring, graph-cut LO) — GC-RANSAC/src/pygcransac/src/
    gcransac_python.cpp:404-624, wrapped at Experiments/algorithms/
    GC_RANSAC.py:8-55.

TPU-first design (no sequential iteration loop):
  K hypotheses are drawn and evaluated as a few big XLA launches —
  a chunk loop over `chunk_size` hypotheses; per chunk: minimal-sample
  gather -> edge-length-constraint mask -> closed-form quaternion Kabsch
  (core.kabsch, SVD-free) -> staged inlier counting:
    stage 0 (SPRT): every hypothesis scored on a tiny `sprt_samples` subset;
             only the per-chunk `sprt_survivors` best advance — the batched
             analogue of GC-RANSAC's sequential probability-ratio preemption
             (preemption_sprt.h): a cheap test kills the bulk, progressively
             more expensive tests run on progressively fewer survivors;
    stage 1: survivors scored on a `stage1_samples`-point random subset;
    stage 2: the `top_k` stage-1 survivors scored on ALL correspondences;
  winner is re-fit by iterated least-squares on its inliers over the
  *unfiltered* correspondence set (FR.py:99-111), `refit_iters` rounds —
  this iterated reweighted refit is the XLA-friendly stand-in for
  GC-RANSAC's sequential graph-cut local optimization (documented deviation;
  SURVEY.md §7 hard-part 3).

Confidence-based early termination (Open3D RANSACConvergenceCriteria,
conf=0.9995 — FR.py:136) runs at CHUNK granularity: a `lax.while_loop`
draws 65k-hypothesis chunks until the drawn count exceeds
log(1-conf)/log(1-e^s) for the best stage-2 inlier ratio e so far. That
keeps the control flow XLA-friendly (fixed-shape chunk programs, trip
count data-dependent) while matching the reference's semantics: easy
pairs (high post-GPF inlier ratios, the benchmark regime) terminate after
one chunk, hard pairs still consume the full `num_hypotheses` budget.
`confidence=0.0` restores the fixed-budget behavior. The `iters` CLI knob
maps directly onto `num_hypotheses`.

PROSAC (round 4): the true Chum-Matas growth function is the default —
hypothesis t samples s-1 points from the top n(t)-1 quality-sorted
correspondences plus candidate n(t) itself, with n(t) inverted from
T_n = T_N * C(n,s)/C(N,s) in closed form per hypothesis (branch-free;
`_prosac_pool_size`). T_N = the hypothesis budget. The round-1..3 linear
schedule (m_t = s + (n_keep - s) * t / K) is kept as
`prosac_growth="linear"` for the ablation recorded in BASELINE.md.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.kabsch import (
    qcp_quaternion_comps,
    quat_comps_to_rotation_comps,
    weighted_kabsch,
)
from ..core.se3 import integrate


class RansacConfig(NamedTuple):
    num_hypotheses: int = 50_000        # `--iters` (FR.py:65: default 500k)
    sample_size: int = 4                # ransac_n=4 (FR.py:134)
    inlier_thresh: float = 0.6          # 2 * voxel (FR.py:85,95)
    elc_similarity: float = 0.9         # EdgeLength checker / ELC ratio 0.9
                                        # (preemption_edge_length.h:71-128)
    use_elc: bool = True                # fast_rejection=ELC (test.py:307)
    prosac: bool = True                 # test.py:308
    stage1_samples: int = 512           # preemption subset size
    top_k: int = 512                    # stage-2 survivors
    refit_iters: int = 3                # LO substitute (GC_LO, test.py:313)
    chunk_size: int = 65_536            # hypotheses per XLA map step
    # SPRT-style pre-stage (preemption_sprt.h semantics, batched): every
    # hypothesis is first scored on a tiny `sprt_samples` subset; only the
    # per-chunk `sprt_survivors` best advance to the stage-1 subset. 0 = off.
    # Default OFF: the v5e ablation (scripts/lo_ablation.py, BASELINE.md)
    # shows hypothesis generation, not scoring, bounds the solve at these
    # correspondence counts, so the pre-stage only adds overhead.
    sprt_samples: int = 0
    sprt_survivors: int = 4096
    # Structured sample reuse: draw ONE correspondence index per hypothesis
    # and build the s-point minimal sample from cyclic rolls of the drawn
    # chunk — every point participates in s hypotheses, cutting the random
    # 4M-row minimal-sample gather (the profiled engine floor, CLAUDE.md)
    # by s x. Default OFF: marginal per-hypothesis inlier statistics are
    # unchanged, but the cross-hypothesis correlation (hypotheses i and
    # i+jC/s share s-1 points) collapses the number of INDEPENDENT trials,
    # and the max-statistic pays for it exactly in the low-inlier regime
    # RANSAC exists for — measured 13% vs 40% recall at 5% inliers / 262k
    # hypotheses (scripts/reuse_ablation.py, BASELINE.md negative ablation).
    sample_reuse: bool = False
    # PROSAC growth schedule: "chum_matas" inverts the true growth function
    # T_n = T_N * C(n,s)/C(N,s) (Chum & Matas 2005, the schedule GC-RANSAC's
    # ProsacSampler implements) per hypothesis in closed form — early
    # hypotheses concentrate on a pool growing like N*(t/T_N)^(1/s), far more
    # aggressively than "linear" (m_t = s + (N-s) t/T_N, the round-1..3
    # schedule, kept for ablation). T_N = the total hypothesis budget, so the
    # sampler converges to uniform RANSAC exactly when the budget runs out.
    prosac_growth: str = "chum_matas"
    # Confidence-based early termination (Open3D RANSACConvergenceCriteria
    # semantics, FR.py:136 conf=0.9995): after each chunk, stop once the
    # number of drawn hypotheses exceeds log(1-conf)/log(1-e^s) for the best
    # inlier ratio e seen so far. Runs as a lax.while_loop over chunks —
    # high-inlier pairs (the benchmark regime after GPF) terminate after the
    # first chunk; low-inlier pairs still use the full budget. 0.0 = fixed
    # budget (the round-2 behavior; statistically stronger, but pays the
    # worst case on every pair).
    confidence: float = 0.9995
    # Warmup chunk (confidence mode only): score `first_chunk` hypotheses
    # BEFORE entering the 65k-chunk loop and test the stopping rule on
    # them. Post-GPF inlier ratios (~0.3+) satisfy conf=0.9995 within a
    # few hundred PROSAC-ordered trials, so easy pairs finish after this
    # prefix and never pay a full chunk. 0 = off.
    first_chunk: int = 8192


class RansacResult(NamedTuple):
    transform: jnp.ndarray      # [4, 4] best SE(3)
    inlier_count: jnp.ndarray   # [] int32 — inliers of best hypothesis (stage 2)
    inlier_mask: jnp.ndarray    # [N] bool — final inliers on the refit set
    num_kept: jnp.ndarray       # [] int32 — size of the filtered sampling set


def _prosac_pool_size(t, n_keep, s: int, T_N: float):
    """Chum-Matas pool size n(t): invert T_n = T_N * C(n,s)/C(N,s) for n.

    t: [C] 1-based hypothesis indices (float); n_keep: [] int; returns [C]
    float pool sizes in [s, N]. Continuous approximation of the integer
    growth recurrence (T'_n = T_n + O(n) ceil accumulation — second-order
    at these budgets; documented deviation). Since the sample size s is a
    small static int, log C(n,s) ratios reduce to sums of s logs — exact,
    no gammaln. 4 Newton steps from the asymptotic guess n ~ N (t/T_N)^(1/s)
    converge to <0.5 over the whole schedule.
    """
    N = jnp.maximum(n_keep.astype(jnp.float32), float(s + 1))
    # The ceil accumulation is NOT second-order early on: while the
    # continuous increments T_{n+1}-T_n are < 1, every step still adds
    # exactly 1, so T'_n ~ (n - s + 1) + T_n over the whole range (each
    # step contributes max(increment, 1) ~ increment + 1). Invert
    # t = (n - s + 1) + T_N * prod_i (n-i)/(N-i) by Newton; exact in the
    # early linear regime (n = s + t - 1) and asymptotically at large t;
    # in the crossover between the two regimes the pool runs up to ~16%
    # SMALLER than the exact integer recurrence (slightly more aggressive
    # early concentration — tests/test_ransac.py TestProsacGrowth pins the
    # envelope; operationally indistinguishable per the BASELINE ablation).
    log_PN = sum(jnp.log(N - i) for i in range(s))

    def T_and_grad(n):
        logT = jnp.log(T_N) + sum(jnp.log(n - i) for i in range(s)) - log_PN
        T = jnp.exp(logT)
        return T, T * sum(1.0 / (n - i) for i in range(s))

    # start from the max of the two regime asymptotes
    ratio = jnp.clip(t / T_N, 1e-12, 1.0)
    n_comb = (N - 0.5 * (s - 1)) * ratio ** (1.0 / s) + 0.5 * (s - 1)
    n = jnp.clip(jnp.maximum(float(s) + t - 1.0, n_comb), float(s), N)
    for _ in range(6):
        T, dT = T_and_grad(n)
        g = (n - s + 1.0) + T - t
        n = jnp.clip(n - g / (1.0 + dT), float(s), N)
    return n


def _sorted_candidates(keep: jnp.ndarray, quality: jnp.ndarray | None):
    """Candidate index list: kept-first; PROSAC additionally quality-sorted.

    Returns (cand_idx [N] int32, n_keep int32). Entries past n_keep are
    arbitrary invalid slots and are never sampled.
    """
    n = keep.shape[0]
    if quality is None:
        order = jnp.lexsort(((~keep).astype(jnp.int32),))
    else:
        # primary: kept first; secondary: higher quality first
        order = jnp.lexsort((-quality, (~keep).astype(jnp.int32)))
    return order.astype(jnp.int32), jnp.sum(keep.astype(jnp.int32))


def _edge_length_ok(a: jnp.ndarray, b: jnp.ndarray, similarity: float):
    """Edge-length constraint over all sample-point pairs.

    Open3D CorrespondenceCheckerBasedOnEdgeLength semantics: for every edge,
    require d_src > 0.9 * d_tgt AND d_tgt > 0.9 * d_src — equivalently
    min/max ratio > similarity (preemption_edge_length.h:82-127).
    a, b: [..., s, 3]. Returns [...] bool.
    """
    da = jnp.linalg.norm(a[..., :, None, :] - a[..., None, :, :], axis=-1)
    db = jnp.linalg.norm(b[..., :, None, :] - b[..., None, :, :], axis=-1)
    s = a.shape[-2]
    iu = jnp.triu_indices(s, k=1)
    ra = da[..., iu[0], iu[1]]
    rb = db[..., iu[0], iu[1]]
    lo = jnp.minimum(ra, rb)
    hi = jnp.maximum(ra, rb) + 1e-12
    return jnp.all(lo / hi > similarity, axis=-1)


def _minimal_kabsch_soa(g):
    """Unweighted Kabsch for minimal samples in SoA layout.

    g: [6, s, K] gathered coordinates (src x/y/z, tgt x/y/z) for K hypotheses
    of s points each. Returns 12 [K]-shaped arrays: 9 rotation components
    (row-major) + 3 translation components.

    SoA rationale: TPU tiles pad an array's minor dims to (8, 128); any
    [K, s, 3] / [K, 3, 3] intermediate at K ~ 10^6 costs ~40x its logical
    HBM footprint. Keeping every quantity as a [K] vector makes the whole
    hypothesis generator one fused VPU pass.
    """
    ax, ay, az = g[0], g[1], g[2]  # [s, K]
    bx, by, bz = g[3], g[4], g[5]
    cax, cay, caz = ax.mean(0), ay.mean(0), az.mean(0)  # [K]
    cbx, cby, cbz = bx.mean(0), by.mean(0), bz.mean(0)
    amx, amy, amz = ax - cax, ay - cay, az - caz
    bmx, bmy, bmz = bx - cbx, by - cby, bz - cbz

    Sxx = (amx * bmx).sum(0)
    Sxy = (amx * bmy).sum(0)
    Sxz = (amx * bmz).sum(0)
    Syx = (amy * bmx).sum(0)
    Syy = (amy * bmy).sum(0)
    Syz = (amy * bmz).sum(0)
    Szx = (amz * bmx).sum(0)
    Szy = (amz * bmy).sum(0)
    Szz = (amz * bmz).sum(0)

    # scale-normalize for Newton stability
    scale = jnp.maximum(
        jnp.maximum(
            jnp.maximum(jnp.abs(Sxx), jnp.abs(Sxy)),
            jnp.maximum(jnp.abs(Sxz), jnp.abs(Syx)),
        ),
        jnp.maximum(
            jnp.maximum(jnp.abs(Syy), jnp.abs(Syz)),
            jnp.maximum(jnp.abs(Szx), jnp.maximum(jnp.abs(Szy), jnp.abs(Szz))),
        ),
    ) + 1e-30
    q = qcp_quaternion_comps(
        Sxx / scale, Sxy / scale, Sxz / scale,
        Syx / scale, Syy / scale, Syz / scale,
        Szx / scale, Szy / scale, Szz / scale,
    )
    r = quat_comps_to_rotation_comps(*q)
    tx = cbx - (r[0] * cax + r[1] * cay + r[2] * caz)
    ty = cby - (r[3] * cax + r[4] * cay + r[5] * caz)
    tz = cbz - (r[6] * cax + r[7] * cay + r[8] * caz)
    return r + (tx, ty, tz)


def _elc_ok_soa(g, similarity):
    """Edge-length constraint on SoA samples g: [6, s, K] -> [K] bool."""
    s = g.shape[1]
    ok = jnp.ones(g.shape[2], bool)
    for i in range(s):
        for j in range(i + 1, s):
            da2 = (
                (g[0, i] - g[0, j]) ** 2
                + (g[1, i] - g[1, j]) ** 2
                + (g[2, i] - g[2, j]) ** 2
            )
            db2 = (
                (g[3, i] - g[3, j]) ** 2
                + (g[4, i] - g[4, j]) ** 2
                + (g[5, i] - g[5, j]) ** 2
            )
            lo = jnp.minimum(da2, db2)
            hi = jnp.maximum(da2, db2) + 1e-24
            ok = ok & (lo / hi > similarity * similarity)
    return ok


def _score_chunk(
    chunk_id,
    *,
    key,
    cand_idx,
    n_keep,
    pts6,
    sub_src,
    sub_tgt,
    sprt_src,
    sprt_tgt,
    cfg: RansacConfig,
    total_hyps: int,
):
    """Generate + score one chunk of hypotheses (SoA throughout).

    pts6: [6, N] stacked (src_x, src_y, src_z, tgt_x, tgt_y, tgt_z).
    Returns (fitness [C], Rt [12, C]).
    """
    s = cfg.sample_size
    C = cfg.chunk_size
    k = jax.random.fold_in(key, chunk_id)

    # --- sampling schedule -------------------------------------------------
    # Draw resolution is picked from the STATIC candidate-pool size: pools
    # <= 65536 use two 16-bit draws per PRNG word (threefry is ~17% of the
    # whole engine at one word per draw); larger pools pay one word per draw
    # at 24-bit resolution (exactly representable in f32) so the tail of the
    # pool stays sampleable.
    n_rows = 1 if cfg.sample_reuse else s
    n_pool = pts6.shape[1]
    if n_pool <= 65536:
        words = jax.random.bits(k, ((n_rows + 1) // 2, C), jnp.uint32)
        halves = [
            ((words >> (16 * h)) & jnp.uint32(0xFFFF)).astype(jnp.float32)
            for h in range(2)
        ]
        u = jnp.concatenate(halves, axis=0)[:n_rows] \
            * jnp.float32(1.0 / 65536.0)
    else:
        words = jax.random.bits(k, (n_rows, C), jnp.uint32)
        u = (words >> 8).astype(jnp.float32) * jnp.float32(1.0 / (1 << 24))
    det_last = None
    if cfg.prosac and cfg.prosac_growth == "chum_matas":
        # true PROSAC: hypothesis t draws s-1 points uniformly from the top
        # n(t)-1 candidates plus candidate n(t) itself; once the pool covers
        # the whole kept set the draw degrades to plain uniform RANSAC.
        t_idx = chunk_id * C + jnp.arange(C, dtype=jnp.float32) + 1.0
        n_t = _prosac_pool_size(t_idx, n_keep, s, float(total_hyps))
        nk_f = jnp.maximum(n_keep, 1).astype(jnp.float32)
        exhausted = n_t >= nk_f - 0.5
        m = jnp.where(exhausted, nk_f, jnp.maximum(n_t - 1.0, 1.0))
        det_last = jnp.where(
            exhausted,
            jnp.int32(-1),  # sentinel: keep the uniform draw
            jnp.minimum(n_t.astype(jnp.int32), n_keep) - 1,
        )
    elif cfg.prosac:
        h = chunk_id * C + jnp.arange(C, dtype=jnp.float32)
        m = s + (n_keep.astype(jnp.float32) - s) * h / float(total_hyps)
        m = jnp.maximum(jnp.minimum(m, n_keep.astype(jnp.float32)), 1.0)
    else:
        m = jnp.full((C,), 1.0) * jnp.maximum(n_keep, 1).astype(jnp.float32)
    if cfg.sample_reuse:
        # one drawn point per hypothesis; sample j of hypothesis i is the
        # draw of hypothesis (i + j*C/s) % C — ONE C-row random gather plus
        # s-1 contiguous rolls instead of an s*C-row random gather
        d = jnp.floor(u[0] * m).astype(jnp.int32)        # [C] in [0, m)
        draw = jnp.stack(
            [jnp.roll(d, -(j * C) // s) for j in range(s)]
        )                                                 # [s, C]
        rows = pts6[:, cand_idx[d]]                       # [6, C] one gather
        g = jnp.stack(
            [jnp.roll(rows, -(j * C) // s, axis=1) for j in range(s)],
            axis=1,
        )                                                 # [6, s, C]
    else:
        draw = jnp.floor(u * m[None, :]).astype(jnp.int32)  # [s, C] in [0, m)
        if det_last is not None:
            # the deterministic n(t)-th candidate takes the last sample slot
            draw = draw.at[s - 1].set(
                jnp.where(det_last < 0, draw[s - 1], det_last)
            )
        sample_idx = cand_idx[draw]                          # [s, C]
        g = pts6[:, sample_idx]  # ONE gather -> [6, s, C], minor dim C

    ok = jnp.ones((C,), bool)
    if cfg.use_elc:
        ok = _elc_ok_soa(g, cfg.elc_similarity)
    # degenerate guard: a repeated index in the sample
    srt = jnp.sort(draw, axis=0)
    ok = ok & jnp.all(srt[1:] != srt[:-1], axis=0)

    rt = _minimal_kabsch_soa(g)  # 12 x [C]
    thr2 = cfg.inlier_thresh**2

    if cfg.sprt_samples > 0 and cfg.sprt_survivors < C \
            and C % cfg.sprt_survivors == 0:
        # --- SPRT pre-stage: tiny subset for ALL hypotheses ----------------
        d2 = _transform_dist2_soa(rt, sprt_src, sprt_tgt)      # [C, m_sprt]
        cnt0 = jnp.sum(d2 < thr2, axis=-1).astype(jnp.int32)
        fit0 = jnp.where(ok, cnt0, -1)
        # survivor selection is GROUP-max, not lax.top_k: top_k over 65k
        # costs more than the scoring it saves (v5e-profiled); hypotheses
        # are iid, so the best of each contiguous C/S-group is an unbiased
        # survivor set of exactly S
        S = cfg.sprt_survivors
        G = C // S
        grp = fit0.reshape(S, G)
        lane = jnp.argmax(grp, axis=1).astype(jnp.int32)        # [S]
        surv = jnp.arange(S, dtype=jnp.int32) * G + lane
        top0 = jnp.take_along_axis(grp, lane[:, None], axis=1)[:, 0]
        rt_s = tuple(c[surv] for c in rt)                       # 12 x [S]
        d2 = _transform_dist2_soa(rt_s, sub_src, sub_tgt)       # [S, M0]
        cnt1 = jnp.sum(d2 < thr2, axis=-1).astype(jnp.int32)
        fitness = (
            jnp.full((C,), -1, jnp.int32)
            .at[surv].set(jnp.where(top0 >= 0, cnt1, -1))
        )
    else:
        # --- stage-1 scoring on the shared random subset -------------------
        d2 = _transform_dist2_soa(rt, sub_src, sub_tgt)  # [C, M0]
        cnt = jnp.sum(d2 < thr2, axis=-1).astype(jnp.int32)
        fitness = jnp.where(ok, cnt, -1)
    return fitness, jnp.stack(rt)  # [C], [12, C]


def _transform_dist2_soa(rt, src, tgt):
    """|R_c src_n + t_c - tgt_n|^2 for all (hypothesis, point) pairs.

    rt: 12 x [C] rotation/translation components; src/tgt: [N, 3] -> [C, N].
    Explicitly-unrolled elementwise chain (not einsum): a batched 3x3 matvec
    is padded to (8,128) MXU tiles on TPU; this form fuses into one VPU pass.
    """
    r00, r01, r02, r10, r11, r12, r20, r21, r22, tx, ty, tz = [
        c[:, None] for c in rt
    ]
    ax, ay, az = src[:, 0][None], src[:, 1][None], src[:, 2][None]   # [1, N]
    bx, by, bz = tgt[:, 0][None], tgt[:, 1][None], tgt[:, 2][None]
    px = r00 * ax + r01 * ay + r02 * az + tx - bx
    py = r10 * ax + r11 * ay + r12 * az + ty - by
    pz = r20 * ax + r21 * ay + r22 * az + tz - bz
    return px * px + py * py + pz * pz


def _transform_dist2(R, t, src, tgt):
    """AoS wrapper over `_transform_dist2_soa` for [T, 3, 3] / [T, 3] inputs."""
    rt = (
        R[:, 0, 0], R[:, 0, 1], R[:, 0, 2],
        R[:, 1, 0], R[:, 1, 1], R[:, 1, 2],
        R[:, 2, 0], R[:, 2, 1], R[:, 2, 2],
        t[:, 0], t[:, 1], t[:, 2],
    )
    return _transform_dist2_soa(rt, src, tgt)


def _count_inliers(R, t, src, tgt, mask, thresh):
    """Inlier count for a batch of hypotheses over a masked set.

    R: [T, 3, 3], t: [T, 3]; src/tgt: [N, 3]; mask: [N]. -> counts [T], d2 [T, N].
    """
    d2 = _transform_dist2(R, t, src, tgt)
    inl = (d2 < thresh * thresh) & mask[None, :]
    return jnp.sum(inl, axis=-1).astype(jnp.int32), d2


def ransac_register(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    keep: jnp.ndarray,
    key: jax.Array,
    cfg: RansacConfig = RansacConfig(),
    quality: jnp.ndarray | None = None,
    refit_mask: jnp.ndarray | None = None,
) -> RansacResult:
    """Robust rigid registration from putative correspondences.

    src/tgt: [N, 3] matched point arrays (src[i] <-> tgt[i]); `keep` masks the
    filtered sampling set; `quality` (higher=better) enables PROSAC ordering;
    `refit_mask` is the (larger) set used for the final LS refit — the
    reference refits on the unfiltered correspondences (FR.py:99-111).
    Fully jittable; N and all config sizes are static.
    """
    if refit_mask is None:
        refit_mask = keep

    cand_idx, n_keep = _sorted_candidates(keep, quality if cfg.prosac else None)

    # Shared stage-1 subset: first `stage1_samples` of a random permutation of
    # the kept candidates (padding-safe: modulo n_keep).
    key, k_sub, k_sprt = jax.random.split(key, 3)
    m0 = cfg.stage1_samples
    pick = jnp.floor(
        jax.random.uniform(k_sub, (m0,)) * jnp.maximum(n_keep, 1)
    ).astype(jnp.int32)
    sub_ids = cand_idx[pick]
    sub_src = src[sub_ids]
    sub_tgt = tgt[sub_ids]
    # SPRT pre-stage subset (independent draw so pre-stage survivors aren't
    # overfit to the stage-1 scoring points)
    m_sprt = max(cfg.sprt_samples, 1)
    pick0 = jnp.floor(
        jax.random.uniform(k_sprt, (m_sprt,)) * jnp.maximum(n_keep, 1)
    ).astype(jnp.int32)
    sprt_ids = cand_idx[pick0]
    sprt_src = src[sprt_ids]
    sprt_tgt = tgt[sprt_ids]

    pts6 = jnp.concatenate([src.T, tgt.T], axis=0)  # [6, N] SoA layout

    n_chunks = max(1, -(-cfg.num_hypotheses // cfg.chunk_size))
    score_fn = partial(
        _score_chunk,
        key=key,
        cand_idx=cand_idx,
        n_keep=n_keep,
        pts6=pts6,
        sub_src=sub_src,
        sub_tgt=sub_tgt,
        sprt_src=sprt_src,
        sprt_tgt=sprt_tgt,
        cfg=cfg,
        total_hyps=n_chunks * cfg.chunk_size,
    )
    C = cfg.chunk_size

    def make_chunk_best(score, csize):
        top = min(cfg.top_k, csize)

        def chunk_best(chunk_id):
            """Stage-1 score one chunk, stage-2 score its survivors on the
            full set; return (best stage-2 inlier count, its [12] Rt)."""
            fitness, rt = score(chunk_id)              # [Csz], [12, Csz]
            if csize > top and csize % top == 0:
                # group-max survivor selection: lax.top_k over 65k fitness
                # values costs more than stage 2 itself (v5e-profiled,
                # CLAUDE.md); the best of each contiguous group always
                # includes the chunk argmax, and stage 2 re-ranks survivors
                # on the FULL correspondence set anyway
                G = csize // top
                grp = fitness.reshape(top, G)
                lane = jnp.argmax(grp, axis=1).astype(jnp.int32)
                top_idx = jnp.arange(top, dtype=jnp.int32) * G + lane
            else:
                _, top_idx = lax.top_k(fitness, top)
            rt_top = rt[:, top_idx]  # [12, T]
            R_top = jnp.stack(
                [rt_top[0], rt_top[1], rt_top[2],
                 rt_top[3], rt_top[4], rt_top[5],
                 rt_top[6], rt_top[7], rt_top[8]], axis=-1
            ).reshape(-1, 3, 3)
            t_top = jnp.stack([rt_top[9], rt_top[10], rt_top[11]], axis=-1)
            counts, _ = _count_inliers(
                R_top, t_top, src, tgt, keep, cfg.inlier_thresh
            )
            # a stage-1 rejection (ELC / degenerate sample) stays rejected
            counts = jnp.where(fitness[top_idx] >= 0, counts, -1)
            b = jnp.argmax(counts)
            return counts[b], rt_top[:, b]

        return chunk_best

    chunk_best = make_chunk_best(score_fn, C)

    def merge(carry, chunk_id):
        bc, brt = carry
        c, rtb = chunk_best(chunk_id)
        better = c > bc
        return jnp.where(better, c, bc), jnp.where(better, rtb, brt)

    use_conf = 0.0 < cfg.confidence < 1.0
    # identity fallback: if every hypothesis is rejected (degenerate pair,
    # empty keep mask) the result is still a valid rigid transform, matching
    # the reference's failure convention (TEASER_plus_plus.py returns
    # identity on solver failure)
    init = (jnp.int32(-1),
            jnp.asarray([1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0], src.dtype))
    drawn0 = 0
    if use_conf and 0 < cfg.first_chunk < min(C, cfg.num_hypotheses):
        # warmup prefix: a small PROSAC-ordered chunk scored before the
        # 65k-chunk loop. Easy pairs (post-GPF inlier ratios) satisfy the
        # stopping rule here and skip the loop entirely. Distinct PRNG
        # stream (fold_in 2^20) so it never replays main-chunk samples.
        w_score = partial(
            _score_chunk,
            key=jax.random.fold_in(key, 1 << 20),
            cand_idx=cand_idx,
            n_keep=n_keep,
            pts6=pts6,
            sub_src=sub_src,
            sub_tgt=sub_tgt,
            sprt_src=sprt_src,
            sprt_tgt=sprt_tgt,
            cfg=cfg._replace(chunk_size=cfg.first_chunk),
            total_hyps=n_chunks * cfg.chunk_size,
        )
        # merge with (never replace) the identity init: a fully-rejected
        # warmup chunk returns count -1 with the Rt of a rejected sample
        # (possibly NaN); strict > keeps the identity fallback in that case
        w_count, w_rt = make_chunk_best(w_score, cfg.first_chunk)(jnp.int32(0))
        w_better = w_count > init[0]
        init = (jnp.where(w_better, w_count, init[0]),
                jnp.where(w_better, w_rt, init[1]))
        drawn0 = cfg.first_chunk
    if use_conf and (n_chunks > 1 or drawn0):
        # Open3D RANSACConvergenceCriteria (FR.py:136): stop once the drawn
        # hypothesis count exceeds log(1-conf)/log(1-e^s) for the best
        # inlier ratio e so far. Chunks run under lax.while_loop, so easy
        # pairs terminate after one chunk (or the warmup prefix alone);
        # divergent trip counts are safe under shard_map (no collective
        # inside the loop).
        import math

        log1mconf = math.log(1.0 - cfg.confidence)

        def cond(carry):
            i, bc, _ = carry
            e = bc.astype(jnp.float32) / jnp.maximum(
                n_keep, 1
            ).astype(jnp.float32)
            p_good = jnp.clip(e, 0.0, 1.0) ** cfg.sample_size
            # log1p(-p) <= 0; pin strictly negative so p_good=0 gives
            # needed=+inf (run the full budget), not a 0/0
            denom = jnp.minimum(jnp.log1p(-p_good), -1e-12)
            needed = log1mconf / denom
            drawn = i.astype(jnp.float32) * C + float(drawn0)
            return (i < n_chunks) & (drawn < needed)

        def body(carry):
            i, bc, brt = carry
            bc2, brt2 = merge((bc, brt), i)
            return i + 1, bc2, brt2

        _, best_count, rt_best = lax.while_loop(
            cond, body, (jnp.int32(0),) + init
        )
    else:
        (best_count, rt_best), _ = lax.scan(
            lambda c, i: (merge(c, i), None),
            init,
            jnp.arange(n_chunks, dtype=jnp.int32),
        )
    R_best = rt_best[:9].reshape(3, 3)
    t_best = rt_best[9:]

    # --- iterated LS refit on the refit set (LO substitute) ----------------
    def refit_body(_, carry):
        R, t = carry
        _, d2 = _count_inliers(R[None], t[None], src, tgt, refit_mask,
                               cfg.inlier_thresh)
        w = ((d2[0] < cfg.inlier_thresh**2) & refit_mask).astype(src.dtype)
        # single-hypothesis refit: use the high-accuracy Jacobi eigensolver
        R2, t2 = weighted_kabsch(src[None], tgt[None], w[None], method="jacobi")
        # keep previous solution if the refit degenerated (too few inliers)
        good = jnp.sum(w) >= 3.0
        R = jnp.where(good, R2[0], R)
        t = jnp.where(good, t2[0], t)
        return R, t

    R_fin, t_fin = lax.fori_loop(
        0, cfg.refit_iters, refit_body, (R_best, t_best)
    )
    _, d2_fin = _count_inliers(
        R_fin[None], t_fin[None], src, tgt, refit_mask, cfg.inlier_thresh
    )
    inl_fin = (d2_fin[0] < cfg.inlier_thresh**2) & refit_mask

    return RansacResult(
        transform=integrate(R_fin, t_fin),
        inlier_count=best_count,
        inlier_mask=inl_fin,
        num_kept=n_keep,
    )


def make_sharded_ransac(mesh, cfg: RansacConfig = RansacConfig()):
    """Shard the HYPOTHESIS axis over the device mesh.

    The reference has no analogue (its only parallelism is per-pair data
    parallelism, SURVEY.md §2c); on TPU the natural second axis is the
    hypothesis space itself (SURVEY.md §5: "tile the 1M-hypothesis RANSAC
    scoring across the mesh"). Each device draws and scores an independent
    `num_hypotheses / n_devices` slice (decorrelated by folding the device
    index into the PRNG key), refits locally, and the best refit wins by
    inlier count via an `all_gather` of (count, T) — 17 floats per device
    over ICI.

    Returns a jitted fn(src, tgt, keep, key) -> RansacResult with inputs
    replicated; compose with data-parallel pair sharding for 2-D meshes.
    """
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    n_dev = mesh.devices.size
    per_dev = cfg._replace(
        num_hypotheses=max(cfg.chunk_size,
                           cfg.num_hypotheses // n_dev),
        top_k=max(16, cfg.top_k // n_dev),
    )
    axis = mesh.axis_names[0]

    def local(src, tgt, keep, key):
        me = lax.axis_index(axis)
        res = ransac_register(
            src, tgt, keep, jax.random.fold_in(key, me), per_dev
        )
        counts = lax.all_gather(res.inlier_count, axis)      # [n_dev]
        trans = lax.all_gather(res.transform, axis)          # [n_dev, 4, 4]
        masks = lax.all_gather(res.inlier_mask, axis)
        best = jnp.argmax(counts)
        return RansacResult(
            transform=trans[best],
            inlier_count=counts[best],
            inlier_mask=masks[best],
            num_kept=res.num_kept,
        )

    return jax.jit(
        shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(), P(), P()),
            out_specs=P(),
            check_vma=False,
        )
    )
