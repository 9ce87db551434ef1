"""Voxel-grid quantization with static output shapes (TPU-native).

Replaces MinkowskiEngine's `sparse_quantize` (used at
Experiments/dataloader/generic_balanced_loader.py:62-63 and
DGR/core/deep_global_registration.py:187-203) and Open3D's
`voxel_down_sample` (BalancedDatasetGenerator/GenerateBalancedSet.py:143-147).

Semantics parity: one point per occupied voxel, the *first occurrence*
(smallest original index) — matching `np.unique(..., return_index=True)`
which backs ME 0.5's CPU sparse_quantize. The reference notes its own GPU
variant is nondeterministic (FCGF_FAST/utils/subsampling.py:34-43); ours is
deterministic by construction.

TPU design: no hash tables, no dynamic shapes. Points are lexsorted by
quantized coordinate (with original index as the final tie-break key), run
starts mark unique voxels, and results are scattered into a fixed-`capacity`
output with a validity mask. Everything is jit/vmap-compatible.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class VoxelizeResult(NamedTuple):
    indices: jnp.ndarray  # [capacity] int32 — original index of kept point per voxel
    coords: jnp.ndarray   # [capacity, 3] int32 — quantized voxel coordinates
    valid: jnp.ndarray    # [capacity] bool — True for real voxels, False for padding
    count: jnp.ndarray    # [] int32 — number of occupied voxels (clipped to capacity)


_SENTINEL = jnp.int32(2**31 - 1)


def quantize_coords(xyz: jnp.ndarray, voxel_size: float) -> jnp.ndarray:
    """floor(xyz / voxel_size) as int32 — ME sparse_quantize's grid mapping."""
    return jnp.floor(xyz / voxel_size).astype(jnp.int32)


def _sorted_runs(q: jnp.ndarray, mask: jnp.ndarray | None):
    """Lexsort quantized coords; return (order, sorted_q, newrun, sorted_valid)."""
    n = q.shape[0]
    if mask is not None:
        q = jnp.where(mask[:, None], q, _SENTINEL)
    orig = jnp.arange(n, dtype=jnp.int32)
    # lexsort: last key is primary. Primary x, then y, z; original index last
    # so each voxel's run starts at its smallest original index.
    order = jnp.lexsort((orig, q[:, 2], q[:, 1], q[:, 0]))
    qs = q[order]
    diff = jnp.any(qs[1:] != qs[:-1], axis=1)
    newrun = jnp.concatenate([jnp.ones((1,), dtype=bool), diff])
    if mask is not None:
        valid_s = qs[:, 0] != _SENTINEL
        newrun = newrun & valid_s
    else:
        valid_s = jnp.ones((n,), dtype=bool)
    return order, qs, newrun, valid_s


def voxelize(
    xyz: jnp.ndarray,
    voxel_size: float,
    capacity: int,
    mask: jnp.ndarray | None = None,
) -> VoxelizeResult:
    """Deterministic first-point-per-voxel downsampling into a fixed capacity.

    xyz:  [N, 3] float; mask: [N] bool for padded inputs (False = ignore).
    Voxels beyond `capacity` (in lexicographic coord order) are dropped.
    """
    q = quantize_coords(xyz, voxel_size)
    order, qs, newrun, _ = _sorted_runs(q, mask)
    slot = jnp.cumsum(newrun.astype(jnp.int32)) - 1  # [N]
    count = jnp.sum(newrun.astype(jnp.int32))

    indices = jnp.zeros((capacity,), dtype=jnp.int32)
    coords = jnp.zeros((capacity, 3), dtype=jnp.int32)
    write_slot = jnp.where(newrun, slot, capacity)  # OOB -> dropped
    indices = indices.at[write_slot].set(order, mode="drop")
    coords = coords.at[write_slot].set(qs, mode="drop")
    valid = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(count, capacity)
    return VoxelizeResult(indices, coords, valid, jnp.minimum(count, capacity))


def voxel_down_sample(
    xyz: jnp.ndarray,
    voxel_size: float,
    capacity: int,
    mask: jnp.ndarray | None = None,
):
    """Centroid-per-voxel downsampling (Open3D `voxel_down_sample` semantics,
    used by the balanced-set generator's overlap computation:
    GenerateBalancedSet.py:143-147).

    Returns (points [capacity, 3], valid [capacity] bool, count).
    """
    q = quantize_coords(xyz, voxel_size)
    order, _, newrun, valid_s = _sorted_runs(q, mask)
    slot = jnp.cumsum(newrun.astype(jnp.int32)) - 1
    count = jnp.sum(newrun.astype(jnp.int32))

    pts_sorted = xyz[order]
    w = valid_s.astype(xyz.dtype)
    write_slot = jnp.where(valid_s, slot, capacity)
    sums = jnp.zeros((capacity, 3), dtype=xyz.dtype)
    sums = sums.at[write_slot].add(pts_sorted * w[:, None], mode="drop")
    counts = jnp.zeros((capacity,), dtype=xyz.dtype)
    counts = counts.at[write_slot].add(w, mode="drop")
    centroids = sums / jnp.maximum(counts, 1.0)[:, None]
    valid = jnp.arange(capacity, dtype=jnp.int32) < jnp.minimum(count, capacity)
    return centroids, valid, jnp.minimum(count, capacity)


def unique_coords_segment_ids(
    q: jnp.ndarray, mask: jnp.ndarray | None = None
):
    """Per-point voxel segment ids (in lexicographic voxel order) plus the
    inverse permutation — building block for sparse-tensor construction.

    Returns (segment_id [N] int32 in original point order, num_segments).
    Padded/masked points get segment id = N (out of range).
    """
    n = q.shape[0]
    order, _, newrun, valid_s = _sorted_runs(q, mask)
    slot = jnp.cumsum(newrun.astype(jnp.int32)) - 1
    seg_sorted = jnp.where(valid_s, slot, n)
    seg = jnp.zeros((n,), dtype=jnp.int32).at[order].set(seg_sorted)
    return seg, jnp.sum(newrun.astype(jnp.int32))
