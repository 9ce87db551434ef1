"""Correspondence-generation pipeline: NN -> (MNN | GPF | none) filtering.

TPU-native equivalent of the front half of Experiments/algorithms/FR.py:16-61:
  1. coarse correspondences: every valid source voxel matched to its feature
     nearest neighbor (with 2nd-NN for the ratio quality),
  2. filter mode "MNN" (mutual nearest neighbor / best buddies), "GPF"
     (grid-prioritized filter), or "no_filter".

Static shapes: correspondences are index arrays of length N0 (idx0 == arange)
plus boolean keep-masks; nothing is compacted on-device.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ops.knn import find_nn_bidirectional, mutual_nn_mask, feature_distance_ratio
from .gpf import grid_prioritized_filter


class Correspondences(NamedTuple):
    idx1: jnp.ndarray        # [N0] target index of the NN of each source row
    idx1_2nd: jnp.ndarray    # [N0] 2nd NN
    valid: jnp.ndarray       # [N0] source rows that are real (not padding)
    keep: jnp.ndarray        # [N0] surviving after the filter stage
    is_bb: jnp.ndarray       # [N0] mutual-NN mask
    feat_ratio: jnp.ndarray  # [N0] d1/(d2+eps) match quality (lower=better)
    quality: jnp.ndarray     # [N0] PROSAC quality = -ratio (GPF: -norm offset)


def match_pair(
    F0: jnp.ndarray,
    F1: jnp.ndarray,
    xyz0: jnp.ndarray,
    mask0: jnp.ndarray | None = None,
    mask1: jnp.ndarray | None = None,
    mode: str = "GPF",
    grid_wid: int = 10,
    gpf_factor: float = 2.0,
    bb_first: bool = False,
    max_matches: int | None = None,
    row_tile: int = 4096,
    precision: str = "highest",
) -> Correspondences:
    """Full matching front-end for one pair.

    F0/F1: [N0/N1, D] (padded) features; xyz0: [N0, 3] source coordinates.
    mode: "MNN" | "GPF" | "no_filter" (FR.py:48-56).
    `precision` controls the NN distance matmul's MXU pass count
    ("highest" = exact f32, the reference's torch semantics; lower tiers
    trade NN exactness on near-ties for MXU rate — ablate before changing).
    """
    n0 = F0.shape[0]
    valid = mask0 if mask0 is not None else jnp.ones((n0,), bool)

    # one distance-matrix pass yields forward top-2 AND backward NN — half
    # the HBM traffic of two find_nn calls (ops/knn.py find_nn_bidirectional)
    fwd, bwd_idx = find_nn_bidirectional(
        F0, F1, mask0=mask0, mask1=mask1, row_tile=row_tile,
        precision=precision,
    )
    is_bb = mutual_nn_mask(fwd.idx, bwd_idx, mask0=valid)
    if mask1 is not None:
        # a padded target row can never anchor a best buddy
        is_bb = is_bb & mask1[fwd.idx]

    ratio = feature_distance_ratio(
        F0, F1, jnp.arange(n0, dtype=jnp.int32), fwd.idx, fwd.idx2
    )

    if mode == "MNN":
        keep = is_bb
        quality = -ratio
    elif mode == "GPF":
        keep = grid_prioritized_filter(
            xyz0[:, :2], ratio, is_bb, valid,
            grid_wid=grid_wid, gpf_factor=gpf_factor,
            bb_first=bb_first, max_matches=max_matches,
        )
        # PROSAC quality after GPF uses the BB-offset normalized distance
        # (FR.py:75-80: match_quality = -norm_feat_dist).
        inf = jnp.float32(jnp.inf)
        fd = jnp.where(valid, ratio, inf)
        m = jnp.min(fd)
        M = jnp.max(jnp.where(valid, ratio, -inf))
        nfd = (ratio - m) / jnp.maximum(M - m, 1e-12)
        nfd = jnp.where(is_bb, nfd - 1.0, nfd)
        quality = -nfd
    elif mode == "no_filter":
        keep = valid
        quality = -ratio
    else:
        raise ValueError(f"unknown mode: {mode}")

    return Correspondences(
        idx1=fwd.idx,
        idx1_2nd=fwd.idx2,
        valid=valid,
        keep=keep & valid,
        is_bb=is_bb,
        feat_ratio=ratio,
        quality=quality,
    )
