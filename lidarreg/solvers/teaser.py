"""TEASER-style certifiable registration: clique pruning + GNC-TLS.

Replaces the teaserpp_python solver wrapped at
Experiments/algorithms/TEASER_plus_plus.py:78-126 (RobustRegistrationSolver:
GNC-TLS rotation, PMC_EXACT max-clique inlier selection, cbar2=1,
noise_bound=voxel, estimate_scaling=False).

TPU design:
  * consistency graph over the (GPF BB_first-capped) correspondences:
    edge (i,j) iff | |p_i - p_j| - |q_i - q_j| | <= 2 * noise_bound
    (the TIM compatibility test);
  * inlier selection: GREEDY max clique with a fixed step budget —
    vectorized candidate scoring per step (the reference's exact PMC is an
    NP-hard sequential C library; lidarreg.native.max_clique provides an
    exact branch-and-bound for offline/baseline use, SURVEY.md §2a row 5);
  * rotation: GNC-TLS over star TIMs of the clique (Yang & Carlone), a
    fixed mu *= 1.4 schedule of weighted-Kabsch solves;
  * translation: component-wise weighted median over clique pairs
    (TEASER's adaptive voting reduces to a robust 1-D estimate per axis).

The reference's FAIL_TOLERANT watchdog (subprocess + 10 s kill + identity
fallback, TEASER_plus_plus.py:16-59) exists because PMC can hang; this
solver is fixed-iteration by construction and cannot, so the watchdog
reduces to the always-success path (tally kept for report parity).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.kabsch import rotation_from_covariance
from ..core.se3 import integrate


class TeaserConfig(NamedTuple):
    noise_bound: float = 0.3          # voxel size (TEASER_plus_plus.py:97)
    cbar2: float = 1.0
    max_clique_steps: int = 64        # greedy growth budget
    gnc_iters: int = 20
    gnc_mu_factor: float = 1.4        # solver param gnc_factor 1.4
    max_corr: int = 1024              # GPF BB_first cap feeds this many


class TeaserResult(NamedTuple):
    transform: jnp.ndarray
    clique_mask: jnp.ndarray   # [N] selected inliers
    rotation_weights: jnp.ndarray


def consistency_graph(src, tgt, valid, noise_bound):
    """Adjacency of the TIM compatibility graph. [N, N] bool."""
    ds = jnp.linalg.norm(src[:, None] - src[None], axis=-1)
    dt = jnp.linalg.norm(tgt[:, None] - tgt[None], axis=-1)
    ok = jnp.abs(ds - dt) <= 2.0 * noise_bound
    ok = ok & valid[:, None] & valid[None, :]
    n = src.shape[0]
    return ok & ~jnp.eye(n, dtype=bool)


def greedy_max_clique(adj: jnp.ndarray, steps: int) -> jnp.ndarray:
    """Greedy clique: seed at the max-degree vertex, repeatedly add the
    candidate with most edges into the remaining candidate set. [N] bool."""
    n = adj.shape[0]
    deg = jnp.sum(adj, axis=1)
    seed = jnp.argmax(deg)
    clique = jnp.zeros((n,), bool).at[seed].set(True)
    cand = adj[seed]

    def body(_, state):
        clique, cand = state
        score = jnp.sum(adj & cand[None, :], axis=1)
        score = jnp.where(cand, score, -1)
        best = jnp.argmax(score)
        ok = score[best] >= 0
        clique = clique.at[best].set(ok | clique[best])
        cand = cand & adj[best]
        return clique, cand

    clique, _ = lax.fori_loop(0, steps, body, (clique, cand))
    return clique


def gnc_tls_rotation(
    tims_src: jnp.ndarray,   # [M, 3] translation-invariant measurements
    tims_tgt: jnp.ndarray,
    tim_valid: jnp.ndarray,
    noise_bound: float,
    cbar2: float = 1.0,
    iters: int = 20,
    mu_factor: float = 1.4,
):
    """GNC-TLS rotation search (TEASER's rotation stage)."""
    cbar_sq = cbar2 * (2.0 * noise_bound) ** 2
    w0 = tim_valid.astype(jnp.float32)

    def solve(w):
        H = jnp.einsum("ni,n,nj->ij", tims_src, w, tims_tgt,
                       precision="highest")
        return rotation_from_covariance(H, method="jacobi")

    def warp_tims(R):
        # geometry matmul: pin f32 (TPU bf16 default, meter-scale TIMs)
        return jnp.einsum("nj,ij->ni", tims_src, R, precision="highest")

    R0 = solve(w0)
    r2 = jnp.sum((tims_tgt - warp_tims(R0)) ** 2, axis=-1)
    mu0 = jnp.maximum(cbar_sq / (2.0 * jnp.max(r2 * tim_valid) - cbar_sq + 1e-9), 1e-6)

    def body(carry, _):
        R, mu = carry
        r2 = jnp.sum((tims_tgt - warp_tims(R)) ** 2, axis=-1)
        # TLS weights (Yang et al., GNC): closed form with truncation
        ub = (mu + 1.0) / mu * cbar_sq
        lb = mu / (mu + 1.0) * cbar_sq
        w_mid = jnp.sqrt(cbar_sq * mu * (mu + 1.0) / jnp.maximum(r2, 1e-12)) - mu
        w = jnp.where(r2 >= ub, 0.0, jnp.where(r2 <= lb, 1.0, w_mid))
        w = jnp.clip(w, 0.0, 1.0) * tim_valid
        R = solve(w)
        return (R, mu * mu_factor), w

    (R, _), ws = lax.scan(body, (R0, mu0), None, length=iters)
    return R, ws[-1]


def teaser_register(
    src: jnp.ndarray,
    tgt: jnp.ndarray,
    valid: jnp.ndarray,
    cfg: TeaserConfig = TeaserConfig(),
) -> TeaserResult:
    """Full solve: clique pruning -> GNC-TLS rotation -> median translation.

    src/tgt: [N, 3] matched correspondences (N <= cfg.max_corr; feed the
    GPF BB_first-filtered set as the reference does,
    TEASER_plus_plus.py:99-106).
    """
    adj = consistency_graph(src, tgt, valid, cfg.noise_bound)
    clique = greedy_max_clique(adj, cfg.max_clique_steps) & valid

    # star TIMs around the clique's weighted center element
    n = src.shape[0]
    anchor = jnp.argmax(jnp.sum(adj & clique[None], axis=1) * clique)
    tims_src = src - src[anchor]
    tims_tgt = tgt - tgt[anchor]
    tim_valid = clique & (jnp.arange(n) != anchor)

    R, w = gnc_tls_rotation(
        tims_src, tims_tgt, tim_valid.astype(jnp.float32),
        cfg.noise_bound, cfg.cbar2, cfg.gnc_iters, cfg.gnc_mu_factor,
    )

    # translation: weighted median per component over clique pairs
    resid = tgt - jnp.einsum("nj,ij->ni", src, R, precision="highest")
    wt = (w * tim_valid + clique[anchor] * (jnp.arange(n) == anchor))

    def wmedian(x, wgt):
        order = jnp.argsort(x)
        xs = x[order]
        ws_ = wgt[order]
        c = jnp.cumsum(ws_)
        half = 0.5 * c[-1]
        i = jnp.searchsorted(c, half)
        return xs[jnp.clip(i, 0, x.shape[0] - 1)]

    t = jnp.stack([wmedian(resid[:, d], wt) for d in range(3)])
    return TeaserResult(integrate(R, t), clique, w)
