"""Fixed-capacity bucketized hash table for voxel coordinate lookup (TPU).

Replaces MinkowskiEngine's C++/CUDA coordinate manager (kernel-map
construction for sparse convolution — SURVEY.md §2a row 1).

Design (v4, round-3 single-probe): two-choice bucketized hashing where
LOOKUP IS ONE GATHER in the common case. Round 2's lookup always gathered
both sides; v5e profiling (scripts/pallas_gather_probe.py) showed gathers
cost ~5-9 ns per ROW regardless of row width, so the second gather was
pure waste for the ~100% of queries side 1 can answer:

  * per-side buckets hold `lanes` (default 4) entries packed in one
    [lanes*(D+1)]-int32 row; entries are (coords..., row);
  * keys that overflow their side-1 bucket land on side 2 AND set bit 30
    of the side-1 bucket's last-lane row value ("overflow flag"). A query
    that misses an UNflagged bucket is definitively absent — no second
    gather. At the default table_factor-4 sizing the side-1 bucket load
    is lambda = lanes/4, so ~0.4% of buckets are flagged (lanes=4);
  * queries that miss a FLAGGED bucket are compacted (cumsum) into a
    fixed-size retry pool (~1.5% of the batch) that probes side 2 —
    lookup stays exact;
  * insertion is 2*lanes fixed set-scatter claim rounds (see build_table:
    sort-based building is compile-pathological through the TPU tunnel).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

_ROW_MASK = jnp.int32((1 << 30) - 1)
_EMPTY = jnp.int32((1 << 30) - 1)   # row-field sentinel (capacities << 2^30)
_FLAG = jnp.int32(1 << 30)          # bucket-overflow flag (last lane only)

# Two independent per-dimension spatial-hash mixes (Teschner et al. primes
# extended to 6-D for DGR's 6-D inlier-net coordinates + Knuth constants).
_P1 = (73856093, 19349669, 83492791, 49979687, 86028157, 7367287)
_P2 = (-1640531527, 97523885, 51964263, 39916801, 15485863, 104729)


def _table_lanes(table, d: int) -> int:
    """Bucket lane count from the stored row width (static)."""
    return table.table.shape[1] // (d + 1)


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


def build_table(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    table_size: int,
    lanes: int = 4,
    rounds: tuple[int, int] | None = None,
    unique_coords: bool = False,
):
    """Insert valid rows of coords [V, D] (D <= 6).

    `table_size` is the per-side ENTRY count (2^k; callers size it >= 4x the
    key count) — per-side buckets T = table_size / lanes.

    INSERTION IS set-scatter claim rounds (each round claims one key per
    bucket; XLA set-scatter is deterministic last-wins, so collisions and
    duplicate coords drain across rounds) — deliberately SORT-FREE: a
    sort-based build runs marginally faster but every `lax.sort` instance
    costs minutes of XLA TPU compile through the remote tunnel, and a
    U-Net forward holds four builds (round-3 post-mortem: the sort-based
    build wedged the compile service).
    Keys that overflow side 1 land on side 2 and FLAG their side-1 bucket
    (bit 30 of the last lane's row value — applied as an elementwise
    post-pass on the materialized table, so the flag survives even when
    the last lane itself stays empty) — that flag is what lets `lookup`
    resolve most queries with a single gather.

    `rounds` = (side1_rounds, side2_rounds); default (lanes, lanes) — the
    exhaustive schedule. The claim-chain cost is ROW-RATE, not latency
    (~3 V-row scatter/gathers per round — BASELINE.md round-5 build
    section), so hot callers at the table_factor-16 sizing (bucket load
    <= 0.25) pass (3, 2): keys in a side-1 bucket holding > side1_rounds
    keys spill to side 2 early (exact — the bucket gets flagged), and at
    load 0.25 the expected spill is ~1e-4 of keys with a ~1e-8 residual
    drop risk, vs the guaranteed-exhaustive 2*lanes schedule.

    Returns (HashTable, placed [V] bool). `placed` means "findable by
    lookup": duplicate coords share ONE lane (grid-NN tables insert many
    points per cell; one survives, as in round 2).

    `unique_coords=True` asserts the valid coords are already distinct
    (voxelized coordinate lists are, by construction) and skips the
    duplicate-drain gather+compare — one of the three V-row ops each
    claim round pays. WRONG RESULTS if duplicates are actually present
    (>lanes copies of one cell can starve a colliding cell).
    """
    assert table_size & (table_size - 1) == 0, "table_size must be 2^k"
    v, d = coords.shape
    assert lanes & (lanes - 1) == 0, "lanes must be 2^k"
    assert table_size >= lanes, (table_size, lanes)
    T = table_size // lanes
    mask = jnp.int32(T - 1)
    idx = jnp.arange(v, dtype=jnp.int32)
    buckets = (_h1(coords, mask), _h2(coords, mask))
    inserts, slot, flags, unplaced = _claim_rounds(
        coords, valid, buckets, T, lanes, rounds, unique_coords
    )
    placed = valid & ~unplaced
    tab = _materialize(coords, inserts, slot, flags, idx, T, lanes)
    return HashTable(tab, mask), placed


def _claim_rounds(
    coords, valid, buckets, T: int, lanes: int,
    rounds: tuple[int, int] | None = None,
    unique_coords: bool = False,
):
    """Set-scatter claim rounds (see `build_table`): exactly one winner
    lane per unique valid coord; duplicates drain via dup_served."""
    r1, r2 = rounds or (lanes, lanes)
    assert 1 <= r1 <= lanes and 1 <= r2 <= lanes, (r1, r2, lanes)
    v = coords.shape[0]
    idx = jnp.arange(v, dtype=jnp.int32)
    unplaced = valid
    inserts = jnp.zeros((v,), bool)            # keys that own a lane
    slot = jnp.zeros((v,), jnp.int32)          # flat lane slot per insert
    flags = jnp.zeros((T,), bool)              # side-1 bucket overflowed
    for side, n_rounds in ((0, r1), (1, r2)):
        if side == 1:
            # everything still unplaced overflowed its side-1 bucket
            fb = jnp.where(unplaced, buckets[0], T)
            flags = flags.at[fb].set(True, mode="drop")
        row = side * T + buckets[side]
        for lane in range(n_rounds):
            wb = jnp.where(unplaced, row, 2 * T)
            claim = jnp.full((2 * T,), -1, jnp.int32).at[wb].set(
                idx, mode="drop"
            )
            winner = claim[row]
            win = unplaced & (winner == idx)
            slot = jnp.where(win, row * lanes + lane, slot)
            inserts = inserts | win
            if unique_coords:
                # distinct valid coords: the only key a claim can serve is
                # its winner — skip the duplicate-drain V-row gather
                unplaced = unplaced & ~win
                continue
            # a key whose coord was just claimed by a DUPLICATE is served by
            # that lane too — without this, >lanes copies of one cell can
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
    return inserts, slot, flags, unplaced


def _apply_flags(tab2d, flag_rows, lanes: int, d: int):
    """OR the overflow flag into the LAST lane's row-value column of every
    flagged bucket row — elementwise over the table, no scatter. Works
    whether or not the last lane holds a winner (an empty slot's _EMPTY
    value stays absent under `_resolve`'s _ROW_MASK comparison).
    `flag_rows` is [rows] bool aligned with tab2d (side-2 rows False)."""
    col = lanes * (d + 1) - 1
    flagged_col = jnp.where(flag_rows, tab2d[:, col] | _FLAG, tab2d[:, col])
    return tab2d.at[:, col].set(flagged_col)


def _materialize(coords, inserts, slot, flags, rowvals, T: int, lanes: int):
    """One-shot table materialization: ONE [V]-row 2-D set-scatter of the
    packed (coords..., rowval) payload (one HBM row transaction per key,
    vs the previous d+1 column scatters), then the overflow-flag
    elementwise post-pass (`_apply_flags`). `flags` is [T] bool over
    side-1 buckets. `rowvals` is the row id each winner stores
    (`build_table`: its own input row; dedup build: the output rank)."""
    d = coords.shape[1]
    stride = d + 1
    pattern = jnp.concatenate([jnp.zeros((d,), jnp.int32), _EMPTY[None]])
    tab = jnp.broadcast_to(pattern, (2 * T * lanes, stride))
    target = jnp.where(inserts, slot, 2 * T * lanes)
    payload = jnp.concatenate([coords, rowvals[:, None]], axis=1)
    tab = tab.at[target].set(payload, mode="drop")
    tab2d = tab.reshape(2 * T, lanes * stride)
    flag_rows = jnp.concatenate([flags, jnp.zeros((T,), bool)])
    return _apply_flags(tab2d, flag_rows, lanes, d)


def build_table_dedup(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    table_size: int,
    out_capacity: int,
    lanes: int = 4,
    rounds: tuple[int, int] | None = None,
):
    """Build a table over coords [V, D] THAT MAY CONTAIN DUPLICATES and
    derive the unique-coordinate list from the same claim rounds.

    The U-Net structure build previously deduped each level's coordinates
    with a multi-key `lax.sort` (`tensor.downsample_coords`, ~34 ms of the
    146 ms forward @32k on v5e; BASELINE.md roofline) and then built the
    level's hash table from the deduped list. But `build_table`'s claim
    rounds already perform an exact dedup — duplicates drain via
    dup_served and exactly one lane wins per unique coord — so the sort is
    redundant work: insert the QUANTIZED parent-level coords directly and
    read the unique list off the winners. The output row id of each unique
    coord is its winner's rank by input row (cumsum over `inserts`) —
    deterministic, but NOT lexicographic like `downsample_coords` (the
    order is a free choice: ME's own coordinate-manager order is
    hash-insertion-dependent; sparse conv is row-order invariant and the
    level-0 row order — the tensor's public feature order — is unchanged).

    Unique coords beyond `out_capacity` are dropped from BOTH the output
    list and the table (lookup returns -1), matching the sort path's
    truncation semantics. Returns (HashTable, out_coords [out_capacity, D],
    out_valid [out_capacity]).

    SIZING CONTRACT: dropped winners still consume lanes (their rows read
    _EMPTY but the lane is occupied), so `table_size` must be sized on the
    INPUT row count V — the bound on unique keys — not on `out_capacity`;
    sizing on a smaller out_capacity under coarse-level overflow can push
    the bucket load past what `lookup`'s default retry pool assumes
    (round-4 ADVICE item 1; the FCGF callers size on V).
    """
    assert table_size & (table_size - 1) == 0, "table_size must be 2^k"
    v, d = coords.shape
    assert lanes & (lanes - 1) == 0, "lanes must be 2^k"
    assert table_size >= lanes, (table_size, lanes)
    T = table_size // lanes
    mask = jnp.int32(T - 1)
    buckets = (_h1(coords, mask), _h2(coords, mask))
    inserts, slot, flags, _ = _claim_rounds(
        coords, valid, buckets, T, lanes, rounds
    )
    rank = jnp.cumsum(inserts.astype(jnp.int32)) - 1
    keep = inserts & (rank < out_capacity)
    write = jnp.where(keep, rank, out_capacity)
    out_coords = jnp.zeros((out_capacity, d), jnp.int32).at[write].set(
        coords, mode="drop"
    )
    count = jnp.sum(inserts.astype(jnp.int32))
    out_valid = jnp.arange(out_capacity) < jnp.minimum(count, out_capacity)
    # winners past out_capacity still WRITE their lane, with an _EMPTY row
    # value: the lane reads as absent (_resolve masks bit 30 then compares
    # against _EMPTY); the overflow flag is applied as a table post-pass
    # (_apply_flags), so dropped winners can't orphan side-2 residents.
    tab = _materialize(
        coords, inserts, slot, flags, jnp.where(keep, rank, _EMPTY), T, lanes
    )
    return HashTable(tab, mask), out_coords, out_valid


def _claim_rounds_rows(
    coords, valid, row1, row2, R: int, lanes: int,
    rounds: tuple[int, int] | None = None,
):
    """Row-space claim rounds: `_claim_rounds` over PRECOMPUTED absolute
    bucket rows (side-1 `row1`, side-2 `row2`) in a combined [R]-row table
    space — the core that lets `build_tables_ragged` build SEVERAL
    per-level-sized tables in ONE set of claim rounds. Returns
    (inserts, slot, flags, unplaced); `flags` is [R] per-ROW ("this
    side-1 bucket row overflowed"; side-2 rows stay False)."""
    r1, r2 = rounds or (lanes, lanes)
    assert 1 <= r1 <= lanes and 1 <= r2 <= lanes, (r1, r2, lanes)
    v = coords.shape[0]
    idx = jnp.arange(v, dtype=jnp.int32)
    unplaced = valid
    inserts = jnp.zeros((v,), bool)
    slot = jnp.zeros((v,), jnp.int32)
    flags = jnp.zeros((R,), bool)
    for side, n_rounds in ((0, r1), (1, r2)):
        if side == 1:
            fb = jnp.where(unplaced, row1, R)
            flags = flags.at[fb].set(True, mode="drop")
        row = (row1, row2)[side]
        for lane in range(n_rounds):
            wb = jnp.where(unplaced, row, R)
            claim = jnp.full((R,), -1, jnp.int32).at[wb].set(
                idx, mode="drop"
            )
            winner = claim[row]
            win = unplaced & (winner == idx)
            slot = jnp.where(win, row * lanes + lane, slot)
            inserts = inserts | win
            dup_served = (
                unplaced
                & (winner >= 0)
                & jnp.all(
                    coords[jnp.maximum(winner, 0)] == coords, axis=-1
                )
            )
            unplaced = unplaced & ~dup_served
    return inserts, slot, flags, unplaced


def _materialize_rows(coords, inserts, slot, flags, rowvals, R: int,
                      lanes: int):
    """`_materialize` over the combined row space: ONE [V]-row 2-D
    set-scatter + the overflow-flag elementwise post-pass (`flags` is [R]
    per-row, from `_claim_rounds_rows`)."""
    d = coords.shape[1]
    stride = d + 1
    pattern = jnp.concatenate([jnp.zeros((d,), jnp.int32), _EMPTY[None]])
    tab = jnp.broadcast_to(pattern, (R * lanes, stride))
    target = jnp.where(inserts, slot, R * lanes)
    payload = jnp.concatenate([coords, rowvals[:, None]], axis=1)
    tab = tab.at[target].set(payload, mode="drop")
    return _apply_flags(tab.reshape(R, lanes * stride), flags, lanes, d)


def build_tables_ragged(levels, lanes: int = 4,
                        rounds: tuple[int, int] | None = None):
    """Build SEVERAL per-level-sized hash tables in ONE set of 2*lanes
    set-scatter claim rounds over a row-concatenated table space.

    The serial U-Net structure build chains 7 scatter/gather programs
    (one `build_table` + three `downsample_coords` dedups + three more
    `build_table`s), each its own 2*lanes-round dependency chain —
    measured ~80 ms of the 134 ms forward @32k on v5e against an ~8 ms
    scatter-rate floor (BASELINE.md roofline), because the cost is CHAIN
    LATENCY, not rows. Every level's coordinate set is derivable directly
    from level 0 (floor division composes: unique(c1 // 2^k) equals the
    iterated per-level dedup), so one combined claim over [sum 2*T_i]
    rows builds every table — and, via `build_table_dedup`'s rank trick,
    every coarse coordinate list — in a single 2*lanes-round chain.

    `levels` is a list of (coords [V_i, D], valid [V_i], table_size_i,
    out_capacity_i). out_capacity None = table-only level (coords assumed
    pre-deduped; row values are input rows, `build_table` semantics);
    an int K = dedup level (`build_table_dedup` semantics: row values are
    winner ranks, a compacted [K, D] coord list is emitted). Returns
    (tables, outs): per-level HashTable list (feed `lookup_grouped_ragged`
    in the same order) and per-level (out_coords, out_valid) | None.

    Truncation caveat (same as build_table_dedup / the fused pyramid):
    under coarse-level overflow the kept subset is claim-order, not
    lexicographic, and dedup levels quantized straight from level 0 may
    keep a different subset than iterated per-level dedup. Realistic
    LiDAR occupancy stays well under the level capacities
    (scripts/forward_build_ab.py measures this).
    """
    Ts, bases, acc = [], [], 0
    for _, _, table_size, _ in levels:
        assert table_size & (table_size - 1) == 0, "table_size must be 2^k"
        assert lanes & (lanes - 1) == 0 and table_size >= lanes
        Ts.append(table_size // lanes)
        bases.append(acc)
        acc += 2 * (table_size // lanes)
    R = acc
    d = levels[0][0].shape[1]
    r1s, r2s = [], []
    for (coords, _, _, _), T, base in zip(levels, Ts, bases):
        assert coords.shape[1] == d
        mask = jnp.int32(T - 1)
        r1s.append(base + _h1(coords, mask))
        r2s.append(base + T + _h2(coords, mask))
    coords_all = jnp.concatenate([lv[0] for lv in levels])
    valid_all = jnp.concatenate([lv[1] for lv in levels])
    row1 = jnp.concatenate(r1s)
    row2 = jnp.concatenate(r2s)
    inserts, slot, flags, _ = _claim_rounds_rows(
        coords_all, valid_all, row1, row2, R, lanes, rounds
    )
    # per-level row values + dedup outputs (static slices: V_i are static)
    rowvals_parts, outs = [], []
    ofs = 0
    for coords, _, _, out_capacity in levels:
        vi = coords.shape[0]
        ins_i = inserts[ofs:ofs + vi]
        if out_capacity is None:
            rowvals_parts.append(jnp.arange(vi, dtype=jnp.int32))
            outs.append(None)
        else:
            rank = jnp.cumsum(ins_i.astype(jnp.int32)) - 1
            keep = ins_i & (rank < out_capacity)
            write = jnp.where(keep, rank, out_capacity)
            out_coords = jnp.zeros(
                (out_capacity, d), jnp.int32
            ).at[write].set(coords, mode="drop")
            count = jnp.sum(ins_i.astype(jnp.int32))
            out_valid = jnp.arange(out_capacity) < jnp.minimum(
                count, out_capacity
            )
            rowvals_parts.append(jnp.where(keep, rank, _EMPTY))
            outs.append((out_coords, out_valid))
        ofs += vi
    flat = _materialize_rows(
        coords_all, inserts, slot, flags,
        jnp.concatenate(rowvals_parts), R, lanes,
    )
    tables = [
        HashTable(flat[base:base + 2 * T], jnp.int32(T - 1))
        for base, T in zip(bases, Ts)
    ]
    return tables, outs


def _resolve(entries, query, lanes, d):
    """Match query coords against a gathered bucket row. [-1 where absent]."""
    ee = entries.reshape(entries.shape[:-1] + (lanes, d + 1))
    rowval = ee[..., d] & _ROW_MASK
    m = (
        jnp.all(ee[..., :d] == query[..., None, :], axis=-1)
        & (rowval != _EMPTY)
    )
    # build dedupes coords, so at most one lane matches
    return jnp.max(jnp.where(m, rowval, -1), axis=-1)


def _lookup_rows(
    flat_table: jnp.ndarray,   # [R, LANES*(D+1)] — one or more stacked tables
    row1: jnp.ndarray,         # [nq] side-1 bucket row per query
    row2: jnp.ndarray,         # [nq] side-2 bucket row per query
    q: jnp.ndarray,            # [nq, D] query coords
    lanes: int,
    retry_capacity: int | None = None,
) -> jnp.ndarray:
    """Probe core over PRECOMPUTED bucket rows — shared by `lookup` (one
    table) and `lookup_grouped` (a stack of same-shaped tables, where the
    callers fold the table index into row1/row2)."""
    d = q.shape[-1]
    nq = q.shape[0]

    e1 = flat_table[row1]
    out = _resolve(e1, q, lanes, d)
    flag = (e1[:, lanes * (d + 1) - 1] & _FLAG) != 0
    need2 = (out < 0) & flag

    # TWO-LEVEL retry compaction: per-element compaction (cumsum + an
    # nq-update scatter) costs ~as much as the probe gather it was meant to
    # save (v5e round-3 profile). Retries are ~1e-6 of queries at the
    # table_factor-16 sizing, so compact 1024-query BLOCKS instead: the
    # bookkeeping shrinks to nq/1024-sized ops and the side-2 probe touches
    # at most RB blocks.
    B = 1024
    nB = -(-nq // B)
    pad = nB * B - nq
    if retry_capacity is None:
        # flagged-bucket queries are rare but SPREAD: a stencil batch of Q
        # queries hits ~Q * flagged_frac (~1e-4) buckets across ~that many
        # blocks, so the pool must scale with the batch (nB/8 blocks ~=
        # 12.5% coverage = two orders of margin), floored at 64 blocks
        retry_capacity = max(64, nB // 8) * B
    RB = max(2, min(nB, -(-retry_capacity // B)))
    q_pad = jnp.concatenate([q, jnp.zeros((pad, d), q.dtype)]) if pad else q
    row2_pad = (jnp.concatenate([row2, jnp.zeros((pad,), row2.dtype)])
                if pad else row2)
    out_pad = (jnp.concatenate([out, jnp.full((pad,), -1, out.dtype)])
               if pad else out)
    need_pad = (jnp.concatenate([need2, jnp.zeros((pad,), bool)])
                if pad else need2)
    need_b = need_pad.reshape(nB, B)
    block_any = jnp.any(need_b, axis=1)
    posb = jnp.cumsum(block_any.astype(jnp.int32)) - 1
    slotb = jnp.where(block_any & (posb < RB), posb, RB)
    qb = jnp.zeros((RB + 1,), jnp.int32).at[slotb].set(
        jnp.arange(nB, dtype=jnp.int32), mode="drop"
    )[:RB]

    q2 = q_pad.reshape(nB, B, d)[qb]                      # [RB, B, d]
    e2 = flat_table[row2_pad.reshape(nB, B)[qb]]
    row2res = _resolve(e2, q2, lanes, d)                  # [RB, B]
    # a key lives on exactly one side, so "side-2 hit wins, else keep the
    # side-1 answer" == the need2 merge — WITHOUT gathering bool rows
    # (a fused [RB,B] PRED gather miscompiled on v5e, selecting row2
    # everywhere; round-3 post-mortem)
    merged = jnp.where(row2res >= 0, row2res, out_pad.reshape(nB, B)[qb])
    # write EVERY slot back to its block unconditionally: merged[i] is the
    # identity-correct content for block qb[i] whatever slot i is, so
    # duplicate targets all carry equal values and no out-of-bounds
    # sentinel is needed. (A drop-mode scatter with duplicate OOB sentinel
    # indices miscompiled on v5e — blocks 0..2 were corrupted while the
    # same HLO inline with extra outputs was correct; round-3 post-mortem.)
    out_pad = out_pad.reshape(nB, B).at[qb].set(merged)
    return out_pad.reshape(-1)[:nq]


def lookup(
    table: HashTable, query: jnp.ndarray, retry_capacity: int | None = None
) -> jnp.ndarray:
    """Find row indices for query coords [..., D]; -1 where absent.

    ONE packed gather + a LANES-wide compare; queries that miss an
    overflow-flagged bucket take an exact block-compacted side-2 retry
    (default pool: 64 blocks of 1024 queries). SIZING CONTRACT: at the
    table_factor-16 sizing `table_for` uses (bucket load 0.25), overflow
    is ~1e-6 of buckets and the default pool is bottomless in practice;
    tables built tighter than ~8x the key count (load >= 0.5) should pass
    a larger `retry_capacity` or overflow queries past the pool resolve
    as absent.
    """
    T = table.mask + 1
    d = query.shape[-1]
    lanes = _table_lanes(table, d)
    shape = query.shape[:-1]
    q = query.reshape(-1, d)
    row1 = _h1(q, table.mask)
    row2 = T + _h2(q, table.mask)
    return _lookup_rows(
        table.table, row1, row2, q, lanes, retry_capacity
    ).reshape(shape)


def lookup_grouped(
    tables: HashTable,
    items: list[tuple[int, jnp.ndarray]],
    retry_capacity: int | None = None,
) -> list[jnp.ndarray]:
    """One fused probe over a STACK of same-shaped tables.

    `tables` is a vmapped `build_table` result: table [L, 2T, W], mask [L]
    (all equal — the stack exists precisely because the levels share one
    sizing). `items` is [(level, query[..., D]), ...]; returns one row
    array per item shaped like its query minus the last axis.

    Folding the level index into the bucket row turns L separate `lookup`
    calls into ONE probe: a single e1 gather, a single retry pool, a
    single program — per-call overhead (gather ramp, retry bookkeeping)
    amortizes across every kernel map of a U-Net forward (~7 maps,
    3.4 M rows at 32k voxels; BASELINE.md roofline).
    """
    tab = tables.table
    L, twoT, W = tab.shape
    mask = tables.mask.reshape(-1)[0] if getattr(
        tables.mask, "ndim", 0
    ) else tables.mask
    T = mask + 1
    flat = tab.reshape(L * twoT, W)
    d = items[0][1].shape[-1]
    lanes = W // (d + 1)
    qs, r1s, r2s, shapes, sizes = [], [], [], [], []
    for lvl, query in items:
        assert query.shape[-1] == d
        shapes.append(query.shape[:-1])
        qf = query.reshape(-1, d)
        sizes.append(qf.shape[0])
        base = jnp.int32(lvl * twoT)
        r1s.append(base + _h1(qf, mask))
        r2s.append(base + T + _h2(qf, mask))
        qs.append(qf)
    out = _lookup_rows(
        flat,
        jnp.concatenate(r1s),
        jnp.concatenate(r2s),
        jnp.concatenate(qs),
        lanes,
        retry_capacity,
    )
    res, ofs = [], 0
    for shape, n in zip(shapes, sizes):
        res.append(out[ofs:ofs + n].reshape(shape))
        ofs += n
    return res


def lookup_grouped_ragged(
    tables: list[HashTable],
    items: list[tuple[int, jnp.ndarray]],
    retry_capacity: int | None = None,
) -> list[jnp.ndarray]:
    """`lookup_grouped` over tables of DIFFERENT sizes (same bucket width).

    The fused build's grouped probe — ONE e1 gather + ONE retry pool for
    every kernel map of a U-Net forward — was the real win of that path
    (maps 25 ms grouped vs 66 ms as 7 serialized lookups @32k; BASELINE.md
    round-3/4 sections), but it required equal-shaped tables, which forces
    the shared LEVEL-0 sizing that regresses 1.7x at 64k. Concatenating the
    tables along ROWS instead (per-level row offsets folded into the bucket
    rows, per-level masks for the hashes) keeps per-level sizing AND the
    single-probe program. `items` is [(table_index, query[..., D]), ...].
    """
    W = tables[0].table.shape[1]
    assert all(t.table.shape[1] == W for t in tables)
    flat = jnp.concatenate([t.table for t in tables], axis=0)
    bases, acc = [], 0
    for t in tables:
        bases.append(acc)
        acc += t.table.shape[0]
    d = items[0][1].shape[-1]
    lanes = W // (d + 1)
    qs, r1s, r2s, shapes, sizes = [], [], [], [], []
    for lvl, query in items:
        assert query.shape[-1] == d
        shapes.append(query.shape[:-1])
        qf = query.reshape(-1, d)
        sizes.append(qf.shape[0])
        mask = tables[lvl].mask
        base = jnp.int32(bases[lvl])
        r1s.append(base + _h1(qf, mask))
        r2s.append(base + (mask + 1) + _h2(qf, mask))
        qs.append(qf)
    out = _lookup_rows(
        flat,
        jnp.concatenate(r1s),
        jnp.concatenate(r2s),
        jnp.concatenate(qs),
        lanes,
        retry_capacity,
    )
    res, ofs = [], 0
    for shape, n in zip(shapes, sizes):
        res.append(out[ofs:ofs + n].reshape(shape))
        ofs += n
    return res
