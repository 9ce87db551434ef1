"""Fixed-capacity cuckoo hash table for voxel coordinate lookup (TPU-native).

Replaces MinkowskiEngine's C++/CUDA coordinate manager (kernel-map
construction for sparse convolution — SURVEY.md §2a row 1).

Design: 2-choice cuckoo hashing over a packed [2T, 4] int32 table
(x, y, z, row). LOOKUP IS EXACTLY TWO GATHERS — no probe loop. On TPU the
gather op dominates kernel-map cost, so bounding probes at 2 beats any
open-addressing scheme (double hashing needed ~7 rounds for the 4M-query
tail at 25% load; v5e-profiled). Insertion is the parallel random-walk
cuckoo algorithm (min-index-wins claims + evictions), a fixed number of
vectorized scatter rounds; keys still unplaced after `INSERT_ROUNDS`
(vanishingly rare at <=25% combined load) are dropped and reported.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

INSERT_ROUNDS = 96
_EMPTY = jnp.int32(2**31 - 1)

# Two independent per-dimension spatial-hash mixes (Teschner et al. primes
# extended to 6-D for DGR's 6-D inlier-net coordinates + Knuth constants).
_P1 = (73856093, 19349669, 83492791, 49979687, 86028157, 7367287)
_P2 = (-1640531527, 97523885, 51964263, 39916801, 15485863, 104729)


class HashTable(NamedTuple):
    table: jnp.ndarray   # [2T, D+1] int32 — (coords..., row); row == _EMPTY if free
    mask: jnp.ndarray    # [] int32 — T - 1 (T = per-side size, power of two)


def _fmix(h):
    """murmur3 finalizer: full avalanche so structured grid coords don't
    produce correlated h1/h2 (correlated hashes create infeasible cuckoo
    components — keys sharing BOTH slots)."""
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
    """Insert valid rows of coords [V, D] (D <= 6); per-side size = 2^k >= 2V.

    Returns (HashTable, placed [V] bool).
    """
    assert table_size & (table_size - 1) == 0, "table_size must be 2^k"
    v = coords.shape[0]
    T = table_size
    mask = jnp.int32(T - 1)
    idx = jnp.arange(v, dtype=jnp.int32)
    s1 = _h1(coords, mask)
    s2 = _h2(coords, mask) + T

    from jax import lax

    tab_val0 = jnp.full((2 * T,), _EMPTY, jnp.int32)
    tab_keys0 = jnp.zeros((2 * T, coords.shape[-1]), jnp.int32)
    side0 = jnp.zeros((v,), jnp.int32)
    placed0 = jnp.zeros((v,), bool)
    big = jnp.int32(2**31 - 1)

    def cond(state):
        r, _, _, _, placed = state
        return (r < INSERT_ROUNDS) & ~jnp.all(placed | ~valid)

    def body(state):
        r, tab_val, tab_keys, side, placed = state
        active = valid & ~placed
        slot = jnp.where(side == 0, s1, s2)
        wslot = jnp.where(active, slot, 2 * T)
        # Round-varying rank through the _fmix bijection (collision-free per
        # round). An AFFINE rank (i * A + rmix) does NOT work: the relative
        # order of two keys is then (almost) round-invariant, and a key whose
        # rank sits just above its occupant's never evicts — the cuckoo
        # random walk stalls (observed: ~0.1% keys permanently unplaced).
        rmix = r * jnp.int32(-1640531527)

        def rank(i):
            return _fmix(i + rmix)

        my_rank = jnp.where(active, rank(idx), big)
        best = jnp.full((2 * T,), big, jnp.int32).at[wslot].min(
            my_rank, mode="drop"
        )
        occ = tab_val[slot]
        occ_rank = jnp.where(
            occ == _EMPTY, big, rank(jnp.where(occ == _EMPTY, 0, occ))
        )
        win = active & (best[slot] == my_rank) & (my_rank < occ_rank)
        # displaced occupants lose their placement and flip sides
        old_safe = jnp.where(win & (occ != _EMPTY), occ, 0)
        tgt = jnp.where(win & (occ != _EMPTY), occ, v)
        new_side = 1 - side[old_safe]
        # write winners into the table
        wslot2 = jnp.where(win, slot, 2 * T)
        tab_val = tab_val.at[wslot2].set(idx, mode="drop")
        tab_keys = tab_keys.at[wslot2].set(coords, mode="drop")
        placed = placed.at[tgt].set(False, mode="drop")
        side = side.at[tgt].set(new_side, mode="drop")
        placed = placed | win
        # losers retry the other side next round
        lose = active & ~win
        side = jnp.where(lose, 1 - side, side)
        return r + 1, tab_val, tab_keys, side, placed

    _, tab_val, tab_keys, _, placed = lax.while_loop(
        cond, body, (jnp.int32(0), tab_val0, tab_keys0, side0, placed0)
    )
    table = jnp.concatenate([tab_keys, tab_val[:, None]], axis=1)
    return HashTable(table, mask), placed


def lookup(table: HashTable, query: jnp.ndarray) -> jnp.ndarray:
    """Find row indices for query coords [..., 3]; -1 where absent.

    Exactly two packed gathers (the cuckoo invariant: a key is in one of its
    two slots or nowhere).
    """
    T = table.mask + 1
    e1 = table.table[_h1(query, table.mask)]            # [..., 4]
    e2 = table.table[_h2(query, table.mask) + T]
    d = query.shape[-1]
    hit1 = (e1[..., d] != _EMPTY) & jnp.all(e1[..., :d] == query, axis=-1)
    hit2 = (e2[..., d] != _EMPTY) & jnp.all(e2[..., :d] == query, axis=-1)
    return jnp.where(hit1, e1[..., d], jnp.where(hit2, e2[..., d], -1))
