"""Single-pass VMEM-resident hash-table build (Pallas TPU kernel).

Rebuilds the sparse-conv structure path (MinkowskiEngine's C++ coordinate
manager — SURVEY.md §2a row 1) without XLA scatters: the claim-round
`build_table` + `downsample_pyramid` sort cost ~57.6 ms of the 141 ms FCGF
forward on v5e (BASELINE.md fused A/B) against an ~8 ms scatter-rate floor,
because every claim round and dedup pass is a separate serialized
scatter/gather program. This kernel instead keeps the whole table resident
in VMEM and inserts points one at a time from a scalar-prefetch stream —
dedup, bucket assignment, overflow flagging and the per-point unique-slot
assignment all happen in one pass with zero HBM round-trips.

Layout: one bucket per 128-lane VMEM row, field-major — lanes 0-31 hold the
32 x-coords, 32-63 y, 64-95 z, 96-127 the row ids (so probes are static
lane-slices + broadcast compares; no dynamic minor-dim indexing, which TPU
cannot do). The emitted table is transposed once in XLA to the lane-major
`(coords..., row)`-per-lane layout `sparse.hashtable.lookup` expects — a
32-lane table is just `lookup` with LANES=32, same single-probe + bit-30
overflow-flag contract.

Contract: D=3, coords int32 in x ∈ [-2048, 2047], y ∈ [-512, 511],
z ∈ [-128, 127] (asymmetric 12/10/8-bit packed scalar stream — LiDAR voxel
grids at 0.3 m span ~±500 voxels in x/y and ~±30 in z; x is widest so the
pair-batched layout's +1024-voxel cloud-B offset fits), capacities
multiples of 128. Out-of-range coords are dropped like padding
(pack_coords folds the range check into validity). The claim-round path
stays the fallback for 6-D DGR coords and CPU.

Cited reference scope: MinkowskiEngine coordinate-map insertion
(`Experiments/misc/fcgf.py:229-798` consumes it; ME 0.5 C++ kernel maps).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .hashtable import HashTable

_LANES = 32
_EMPTY = (1 << 30) - 1       # hashtable._EMPTY (row-id sentinel)
_FLAG = 1 << 30              # hashtable._FLAG (bucket-overflow, last lane)
_NEWBIT = 1 << 29            # slot output: "this point created the entry"
_SLOTMASK = _NEWBIT - 1

# hashtable._P1/_P2 first three primes (d=3)
_P1 = (73856093, 19349669, 83492791)
_P2 = (-1640531527, 97523885, 51964263)
_H2_XOR = 0x5BD1E995


def _fmix_s(h):
    """Scalar murmur3 finalizer — bit-exact with hashtable._fmix."""
    h = h ^ ((h >> 16) & jnp.int32(0x0000FFFF))
    h = h * jnp.int32(-2048144789)
    h = h ^ ((h >> 13) & jnp.int32(0x0007FFFF))
    h = h * jnp.int32(-1028477387)
    h = h ^ ((h >> 16) & jnp.int32(0x0000FFFF))
    return h


_XBITS, _YBITS, _ZBITS = 12, 10, 8  # 30 bits total; bit 31 stays clear
_XR = 1 << (_XBITS - 1)   # x in [-2048, 2047] (+-614 m at 0.3 m voxels):
#                           wide so the pair-batched layout (cloud B offset
#                           +1024 voxels along x, data/pipeline.py) fits
_YR = 1 << (_YBITS - 1)   # y in [-512, 511]   (+-153 m)
_ZR = 1 << (_ZBITS - 1)   # z in [-128, 127]   (+-38 m — LiDAR height span)


def pack_coords(coords: jnp.ndarray, valid: jnp.ndarray) -> jnp.ndarray:
    """[V, 3] int32 + validity -> one int32 per point (<0 = invalid; bit 31
    stays clear for every in-range coord).

    Asymmetric 12/10/8-bit packing (x/y/z; ranges above — ground-vehicle
    LiDAR spans far more range in x/y than height). Anything outside is
    ENFORCED here by folding the range check into validity — out-of-range
    points are dropped like padding rather than silently aliased by the
    masked wrap (voxelize coords are un-recentered floor(xyz/voxel))."""
    in_range = (
        (coords[:, 0] >= -_XR) & (coords[:, 0] < _XR)
        & (coords[:, 1] >= -_YR) & (coords[:, 1] < _YR)
        & (coords[:, 2] >= -_ZR) & (coords[:, 2] < _ZR)
    )
    p = (
        ((coords[:, 0] + _XR) & (2 * _XR - 1))
        | (((coords[:, 1] + _YR) & (2 * _YR - 1)) << _XBITS)
        | (((coords[:, 2] + _ZR) & (2 * _ZR - 1)) << (_XBITS + _YBITS))
    )
    return jnp.where(valid & in_range, p, jnp.int32(-1))


def _build_kernel(packed_ref, table_ref, slots_ref, count_ref, *,
                  T: int, cap: int, index_slots: bool):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        lane = jax.lax.broadcasted_iota(jnp.int32, (2 * T, 128), 1)
        table_ref[...] = jnp.where(lane >= 96, jnp.int32(_EMPTY),
                                   jnp.int32(0))
        count_ref[0, 0] = jnp.int32(0)

    lane128 = jax.lax.broadcasted_iota(jnp.int32, (1, 128), 1)
    lane32 = jax.lax.broadcasted_iota(jnp.int32, (1, _LANES), 1)
    # slots are emitted as (8, 128) superblocks (Mosaic block-shape rule:
    # second-minor divisible by 8)
    srow = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    scol = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)

    def probe(row, x, y, z):
        t = table_ref[pl.ds(row, 1), :]                       # [1, 128]
        rid = t[:, 96:128] & jnp.int32(_SLOTMASK | _NEWBIT)   # drop FLAG bit
        hit = (
            (t[:, 0:32] == x) & (t[:, 32:64] == y) & (t[:, 64:96] == z)
            & (rid != _EMPTY)
        )
        found_slot = jnp.max(jnp.where(hit, rid, -1))
        sel = jnp.min(jnp.where(rid == _EMPTY, lane32, 999))
        return t, found_slot, sel

    def body(j, slotvec):
        p = packed_ref[i * 1024 + j]
        x = (p & (2 * _XR - 1)) - _XR
        y = ((p >> _XBITS) & (2 * _YR - 1)) - _YR
        z = ((p >> (_XBITS + _YBITS)) & (2 * _ZR - 1)) - _ZR
        h1 = _fmix_s(
            x * jnp.int32(_P1[0]) ^ y * jnp.int32(_P1[1])
            ^ z * jnp.int32(_P1[2])
        ) & jnp.int32(T - 1)
        h2 = _fmix_s(
            (x * jnp.int32(_P2[0]) ^ y * jnp.int32(_P2[1])
             ^ z * jnp.int32(_P2[2])) ^ jnp.int32(_H2_XOR)
        ) & jnp.int32(T - 1)
        valid = p >= 0

        t1, f1, sel1 = probe(h1, x, y, z)
        row2 = jnp.int32(T) + h2
        t2, f2, sel2 = probe(row2, x, y, z)

        found = (f1 >= 0) | (f2 >= 0)
        found_slot = jnp.where(f1 >= 0, f1, f2)
        cnt = count_ref[0, 0]
        newid = jnp.int32(i * 1024) + j if index_slots else cnt
        can = newid < cap
        want = valid & ~found & can
        do1 = want & (sel1 < _LANES)
        do2 = want & (sel1 >= _LANES) & (sel2 < _LANES)

        def lane_update(t, sel, row):
            nr = jnp.where(lane128 == sel, x,
                 jnp.where(lane128 == 32 + sel, y,
                 jnp.where(lane128 == 64 + sel, z,
                 jnp.where(lane128 == 96 + sel, newid, t))))
            table_ref[pl.ds(row, 1), :] = nr

        @pl.when(do1)
        def _():
            lane_update(t1, sel1, h1)

        @pl.when(do2)
        def _():
            lane_update(t2, sel2, row2)
            # mark the side-1 bucket overflowed (bit 30 of its LAST lane's
            # row value — the single-probe lookup's "must I retry?" bit)
            table_ref[pl.ds(h1, 1), :] = jnp.where(
                lane128 == 127, t1 | jnp.int32(_FLAG), t1
            )

        @pl.when(do1 | do2)
        def _():
            count_ref[0, 0] = cnt + 1

        emitted = jnp.where(
            valid,
            jnp.where(found, found_slot,
                      jnp.where(do1 | do2, newid | jnp.int32(_NEWBIT),
                                jnp.int32(-1))),
            jnp.int32(-1),
        )
        return jnp.where((srow == j // 128) & (scol == j % 128),
                         emitted, slotvec)

    slots_ref[...] = jax.lax.fori_loop(
        0, 1024, body, jnp.full((8, 128), -1, jnp.int32)
    )


def build_table_pallas(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    T: int,
    *,
    cap: int | None = None,
    index_slots: bool = False,
    interpret: bool = False,
):
    """Build one 32-lane table over [V, 3] coords in a single VMEM pass.

    `T` = per-side bucket count (2^k; 32 lanes each — size T >= keys/8 so
    the per-bucket Poisson tail beyond 32 lanes is negligible and lookups
    stay single-probe). `index_slots=True` stores the INPUT ROW index as
    each entry's row id (level-0 tables: coords are already unique and the
    table must map back to the feature rows); False assigns dense
    first-come unique ids 0..count-1 (downsample levels: the ids index the
    compacted coordinate list, `extract_level`).

    Returns (HashTable, slots [V] int32, count [] int32). slots: -1 for
    invalid/unplaced points, else the entry's row id, with bit 29 set on
    the one point that created the entry.
    """
    v, d = coords.shape
    assert d == 3, "pallas build is 3-D only (DGR 6-D keeps claim rounds)"
    assert v % 1024 == 0, v
    assert T & (T - 1) == 0, T
    cap = v if cap is None else cap
    nb = v // 128
    packed = pack_coords(coords, valid)

    table_fm, slots, count = pl.pallas_call(
        functools.partial(_build_kernel, T=T, cap=cap,
                          index_slots=index_slots),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(v // 1024,),
            in_specs=[],
            out_specs=[
                pl.BlockSpec((2 * T, 128), lambda i, packed: (0, 0)),
                pl.BlockSpec((8, 128), lambda i, packed: (i, 0)),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((2 * T, 128), jnp.int32),
            jax.ShapeDtypeStruct((nb, 128), jnp.int32),
            jax.ShapeDtypeStruct((1, 1), jnp.int32),
        ],
        interpret=interpret,
    )(packed)

    # field-major [2T, 4, 32] -> lookup's lane-major (coords..., row) rows
    tab = table_fm.reshape(2 * T, 4, _LANES).transpose(0, 2, 1).reshape(
        2 * T, 4 * _LANES
    )
    return (
        HashTable(tab, jnp.int32(T - 1)),
        slots.reshape(-1),
        count[0, 0],
    )


def extract_level(
    qc: jnp.ndarray, slots: jnp.ndarray, count: jnp.ndarray, cap: int
):
    """Compacted coordinate list from a `build_table_pallas` slot stream.

    `qc` [V, 3] are the quantized coords the table was built over; each
    NEW-flagged point writes its coord at its slot. Returns
    (coords_k [cap, 3], valid_k [cap]) — the `downsample_coords` interface,
    in first-occurrence order instead of lexicographic (downstream is
    order-agnostic: every consumer resolves rows through table lookups).
    """
    is_new = (slots >= 0) & ((slots & _NEWBIT) != 0)
    sid = slots & _SLOTMASK
    write = jnp.where(is_new, sid, cap)
    coords_k = jnp.zeros((cap, qc.shape[1]), jnp.int32).at[write].set(
        qc, mode="drop"
    )
    valid_k = jnp.arange(cap, dtype=jnp.int32) < jnp.minimum(count, cap)
    return coords_k, valid_k


def build_unet_structures(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    in_stride: int,
    caps: list[int],
    *,
    interpret: bool = False,
):
    """All four U-Net levels in four VMEM passes (no scatters, no sort).

    `caps` = [cap0, cap1, cap2, cap4] like the fcgf builder's level
    capacities. Level 0 inserts `coords` as-is with input-row ids; level k
    inserts `(coords // (s*2^k)) * (s*2^k)` with dense first-occurrence
    ids and also returns its compacted coordinate list. All tables share
    the level-0 sizing so `lookup_grouped` can stack them.

    Returns (tables [list of HashTable], levels [list of (coords, valid)]
    for levels 1.., placed0 [V] bool).
    """
    cap0 = caps[0]
    T = max(cap0 // 8, 128)
    t0, slots0, _ = build_table_pallas(
        coords, valid, T, cap=cap0, index_slots=True, interpret=interpret
    )
    tables = [t0]
    levels = []
    for k, cap_k in enumerate(caps[1:], start=1):
        q = in_stride * (1 << k)
        qc = jnp.where(valid[:, None], (coords // q) * q, jnp.int32(0))
        qpack_valid = valid
        tk, slots_k, count_k = build_table_pallas(
            qc, qpack_valid, T, cap=cap_k, interpret=interpret
        )
        tables.append(tk)
        levels.append(extract_level(qc, slots_k, count_k, cap_k))
    return tables, levels, slots0 >= 0
