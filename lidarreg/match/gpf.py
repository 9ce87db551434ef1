"""Grid-Prioritized Filter (GPF) — the paper's correspondence filter.

TPU-native reimplementation of Experiments/algorithms/matching.py:100-220
(Grid_Prioritized_Filter + mark_best_buddies). The reference runs a Python
double loop over grid cells plus per-cell argsorts on CPU; here the whole
filter is a fixed-shape XLA program:

  * best-buddy priority = the reference's "-1 offset" trick on normalized
    feature distances (matching.py:126-134),
  * per-cell quotas by the same bisection water-filling (matching.py:154-179),
  * per-cell "take the best quota-many" selection done with ONE lexsort by
    (cell, priority) and a rank-vs-quota comparison instead of G^2 argsorts.

Returns a keep-mask over the fixed-size correspondence array (no compaction —
downstream TPU consumers are mask-based).
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax


def _to_quads(x: jnp.ndarray, grid_wid: int, valid: jnp.ndarray) -> jnp.ndarray:
    """Quantize a coordinate into [0, grid_wid) bins over the valid range.

    Parity: matching.py:136-142 (to_quads), EPS=1e-3 on the range.
    """
    big = jnp.float32(1e30)
    m = jnp.min(jnp.where(valid, x, big))
    M = jnp.max(jnp.where(valid, x, -big))
    x_ = (x - m) / (M - m + 1e-3)
    return jnp.clip(jnp.floor(grid_wid * x_).astype(jnp.int32), 0, grid_wid - 1)


def _water_fill(counts: jnp.ndarray, total_num: jnp.ndarray) -> jnp.ndarray:
    """Per-cell quotas via bisection water-filling.

    Parity: matching.py:154-179 — bisect `height` until the summed
    min(count, height) hits total_num (or the bracket closes to <=2), then
    apply the rounded height.
    """
    counts = counts.astype(jnp.float32)
    total = total_num.astype(jnp.float32)

    def cond(state):
        lo, hi, _ = state
        cur = jnp.sum(jnp.minimum(counts, (lo + hi) * 0.5))
        return (jnp.abs(hi - lo) > 2.0) & (cur != total)

    def body(state):
        lo, hi, _ = state
        h = (lo + hi) * 0.5
        cur = jnp.sum(jnp.minimum(counts, h))
        lo = jnp.where(cur < total, h, lo)
        hi = jnp.where(cur > total, h, hi)
        return lo, hi, h

    lo, hi, h = lax.while_loop(cond, body, (jnp.float32(0.0), total, (total) * 0.5))
    h = (lo + hi) * 0.5
    return jnp.minimum(counts, jnp.round(h))


def grid_prioritized_filter(
    src_xy: jnp.ndarray,
    feat_dist: jnp.ndarray,
    is_bb: jnp.ndarray,
    valid: jnp.ndarray,
    grid_wid: int = 10,
    gpf_factor: float = 2.0,
    bb_first: bool = False,
    max_matches: int | None = None,
) -> jnp.ndarray:
    """Keep-mask over N correspondences (static shape).

    src_xy:    [N, 2] source-point XY for grid binning (xyz0[idx0, :2]).
    feat_dist: [N] 1st/2nd NN feature-distance ratio (lower = better).
    is_bb:     [N] best-buddy (mutual-NN) mask.
    valid:     [N] real-correspondence mask (False = padding).

    Modes (parity with matching.py:109-116):
      bb_first=False: target count = gpf_factor * num_bb, BBs prioritized
                      within cells via the -1 offset.
      bb_first=True:  candidates are BBs only; target = max_matches; if there
                      are fewer BBs than max_matches, all BBs are kept
                      (matching.py:112-113 early return).
    """
    n = feat_dist.shape[0]
    inf = jnp.float32(jnp.inf)

    if bb_first:
        cand = is_bb & valid
        total_num = jnp.int32(max_matches if max_matches is not None else n)
    else:
        cand = valid
        num_bb = jnp.sum((is_bb & valid).astype(jnp.int32))
        total_num = (gpf_factor * num_bb).astype(jnp.int32)

    # Normalized feature distance; BBs offset to sort first (matching.py:119-134).
    fd = jnp.where(cand, feat_dist, inf)
    m = jnp.min(fd)
    M = jnp.max(jnp.where(cand, feat_dist, -inf))
    nfd = (feat_dist - m) / jnp.maximum(M - m, 1e-12)
    if not bb_first:
        nfd = jnp.where(is_bb, nfd - 1.0, nfd)

    qi = _to_quads(src_xy[:, 0], grid_wid, cand)
    qj = _to_quads(src_xy[:, 1], grid_wid, cand)
    ncells = grid_wid * grid_wid
    cell = jnp.where(cand, qi * grid_wid + qj, ncells)

    counts = jnp.zeros((ncells,), jnp.int32).at[cell].add(
        cand.astype(jnp.int32), mode="drop"
    )
    per_quad = _water_fill(counts, total_num)  # [ncells] f32

    # Rank each candidate inside its cell by priority (one lexsort, no loops).
    sort_nfd = jnp.where(cand, nfd, inf)
    order = jnp.lexsort((sort_nfd, cell))  # primary: cell, secondary: priority
    cell_sorted = cell[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    cell_start = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)]
    )  # [ncells+1]
    rank = pos - cell_start[jnp.minimum(cell_sorted, ncells)]
    keep_sorted = (cell_sorted < ncells) & (
        rank < per_quad[jnp.minimum(cell_sorted, ncells - 1)].astype(jnp.int32)
    )
    keep = jnp.zeros((n,), bool).at[order].set(keep_sorted)

    if bb_first:
        # Early-return parity: when all BBs fit the budget, keep them all.
        keep = jnp.where(jnp.sum(cand.astype(jnp.int32)) <= total_num, cand, keep)
    return keep & cand
