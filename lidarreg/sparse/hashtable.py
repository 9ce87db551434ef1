"""Fixed-capacity bucketized hash table for voxel coordinate lookup (TPU).

Replaces MinkowskiEngine's C++/CUDA coordinate manager (kernel-map
construction for sparse convolution — SURVEY.md §2a row 1).

Design: 2-choice hashing into buckets of LANES=4 entries per side, stored as
a packed [2T, LANES*(D+1)] int32 table. LOOKUP IS EXACTLY TWO GATHERS — one
bucket row per hash — and a lane-wise compare (TPU gather cost is per-row,
not per-byte, so a 4-lane 64-byte row costs the same as a 16-byte one;
v5e-profiled). INSERTION IS 2*LANES = 8 FIXED set-scatter rounds with no
eviction and no `lax.while_loop`: each lane round claims one key per bucket
(XLA set-scatter, deterministic last-wins on duplicate indices), so
collisions and duplicate coords drain across lanes. The previous random-walk
cuckoo insert needed a data-dependent while_loop (up to 96 sequential
scatter rounds) that cost ~600 ms of the FCGF forward; this build is ~20
sequential ops, all on the cheap scatter path (combiner scatters like
.at[].min cost ~4 ms each on v5e and are avoided).

Load math (per-side T buckets = table_size/4 >= capacity at the default
table_factor=4): side-1 bucket load lambda <= 1.0, so expected overflow
past 4 lanes is ~0.5% of keys; those fall through to side 2 (lambda ~ 0.005)
where the residual non-placement probability is < 1e-9. `placed` means
"findable by lookup": duplicate coords share ONE lane (grid-NN tables insert
many points per cell; one survives, as the previous cuckoo did), and lookup
deterministically resolves to side-1's lowest occupied lane.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

LANES = 4
_EMPTY = jnp.int32(2**31 - 1)

# Two independent per-dimension spatial-hash mixes (Teschner et al. primes
# extended to 6-D for DGR's 6-D inlier-net coordinates + Knuth constants).
_P1 = (73856093, 19349669, 83492791, 49979687, 86028157, 7367287)
_P2 = (-1640531527, 97523885, 51964263, 39916801, 15485863, 104729)


class HashTable(NamedTuple):
    table: jnp.ndarray   # [2T, LANES*(D+1)] int32 — per lane (coords..., row)
    mask: jnp.ndarray    # [] int32 — T - 1 (T = per-side bucket count, 2^k)


def _fmix(h):
    """murmur3 finalizer: full avalanche so structured grid coords don't
    produce correlated h1/h2 (e.g. all-even downsampled coordinates)."""
    h = h ^ ((h >> 16) & jnp.int32(0x0000FFFF))
    h = h * jnp.int32(-2048144789)   # 0x85EBCA6B
    h = h ^ ((h >> 13) & jnp.int32(0x0007FFFF))
    h = h * jnp.int32(-1028477387)   # 0xC2B2AE35
    h = h ^ ((h >> 16) & jnp.int32(0x0000FFFF))
    return h


def _mix(c, primes):
    h = c[..., 0] * jnp.int32(primes[0])
    for d in range(1, c.shape[-1]):
        h = h ^ c[..., d] * jnp.int32(primes[d])
    return h


def _h1(c, mask):
    return _fmix(_mix(c, _P1)) & mask


def _h2(c, mask):
    return _fmix(_mix(c, _P2) ^ jnp.int32(0x5BD1E995)) & mask


def build_table(coords: jnp.ndarray, valid: jnp.ndarray, table_size: int):
    """Insert valid rows of coords [V, D] (D <= 6).

    `table_size` is the per-side ENTRY count (2^k; callers size it >= 4x the
    key count) — per-side buckets T = table_size / LANES.

    Winner detection per (side, lane) round is a plain set-scatter followed
    by a gather-back (XLA scatter is deterministic: with duplicate indices
    the last update wins), NOT a min-combiner scatter — combiner scatters
    cost ~4 ms each on v5e while set-scatters are ~free. Entries materialize
    once at the end through flat 1-D scatters.

    Returns (HashTable, placed [V] bool).
    """
    assert table_size & (table_size - 1) == 0, "table_size must be 2^k"
    assert table_size >= LANES
    v, d = coords.shape
    T = table_size // LANES
    mask = jnp.int32(T - 1)
    idx = jnp.arange(v, dtype=jnp.int32)
    buckets = (_h1(coords, mask), _h2(coords, mask))

    unplaced = valid
    inserts = jnp.zeros((v,), bool)            # keys that own a lane
    slot = jnp.zeros((v,), jnp.int32)          # flat lane slot per insert
    for side in range(2):
        row = side * T + buckets[side]
        for lane in range(LANES):
            wb = jnp.where(unplaced, row, 2 * T)
            claim = jnp.full((2 * T,), -1, jnp.int32).at[wb].set(
                idx, mode="drop"
            )
            winner = claim[row]
            win = unplaced & (winner == idx)
            slot = jnp.where(win, row * LANES + lane, slot)
            inserts = inserts | win
            # a key whose coord was just claimed by a DUPLICATE is served by
            # that lane too — without this, >LANES copies of one cell can
            # monopolize every lane of a bucket and starve a colliding cell
            # (grid-NN tables insert many points per cell)
            dup_served = (
                unplaced
                & (winner >= 0)
                & jnp.all(
                    coords[jnp.maximum(winner, 0)] == coords, axis=-1
                )
            )
            unplaced = unplaced & ~dup_served   # dup_served includes win
    placed = valid & ~unplaced

    # one-shot materialization: flat [2T * LANES * (D+1)] then reshape
    stride = d + 1
    flat = jnp.tile(
        jnp.concatenate(
            [jnp.zeros((d,), jnp.int32), jnp.full((1,), _EMPTY, jnp.int32)]
        ),
        2 * T * LANES,
    )
    base = jnp.where(inserts, slot * stride, 2 * T * LANES * stride)
    for k in range(d):
        flat = flat.at[base + k].set(coords[:, k], mode="drop")
    flat = flat.at[base + d].set(idx, mode="drop")
    tab = flat.reshape(2 * T, LANES * stride)
    return HashTable(tab, mask), placed


def lookup(table: HashTable, query: jnp.ndarray) -> jnp.ndarray:
    """Find row indices for query coords [..., D]; -1 where absent.

    Exactly two packed gathers (one bucket row per hash side); lane hits
    resolve to the LOWEST lane = smallest inserted original index.
    """
    T = table.mask + 1
    d = query.shape[-1]
    e1 = table.table[_h1(query, table.mask)]        # [..., LANES*(D+1)]
    e2 = table.table[_h2(query, table.mask) + T]
    out = jnp.full(query.shape[:-1], -1, jnp.int32)
    for e in (e2, e1):
        for lane in reversed(range(LANES)):
            col = lane * (d + 1)
            val = e[..., col + d]
            hit = (val != _EMPTY) & jnp.all(
                e[..., col:col + d] == query, axis=-1
            )
            out = jnp.where(hit, val, out)
    return out
