"""Single-pass pallas hash build vs the claim-round reference semantics.

Runs in pallas interpret mode on the CPU test platform (conftest); the
on-TPU compiled-path parity + timing A/B lives in scripts/pallas_build_ab.py
(same pattern as the fused-build gate, scripts/fused_ab.py).
"""
import numpy as np
import jax.numpy as jnp
import pytest

from lidarreg.sparse.hashtable import lookup
from lidarreg.sparse.pallas_build import (
    _NEWBIT,
    _SLOTMASK,
    build_table_pallas,
    build_unet_structures,
    extract_level,
)
from lidarreg.sparse.tensor import downsample_coords


def _coords(rng, n, lo=-500, hi=500):
    c = rng.integers(lo, hi, (n, 3)).astype(np.int32)
    # z obeys the narrower 8-bit packing range (LiDAR height span)
    c[:, 2] = np.clip(c[:, 2], -120, 120)
    return c


def test_count_mode_lookup_roundtrip():
    rng = np.random.default_rng(0)
    v = 1024
    base = _coords(rng, 700)
    dups = base[rng.integers(0, 700, 200)]
    c = np.concatenate([base, dups, _coords(rng, v - 900)])
    valid = np.ones((v,), bool)
    valid[-40:] = False

    tab, slots, count = build_table_pallas(
        jnp.asarray(c), jnp.asarray(valid), T=128, interpret=True
    )
    slots = np.asarray(slots)
    count = int(count)
    uniq = len({tuple(r) for r in c[valid]})
    assert count == uniq
    # every valid point resolves through the single-probe lookup to its slot
    rows = np.asarray(lookup(tab, jnp.asarray(c)))
    sid = slots & _SLOTMASK
    assert (rows[valid] == sid[valid]).all()
    assert (slots[valid] >= 0).all()
    # duplicates share the representative's slot; exactly one NEW flag per
    # unique coord
    new = (slots >= 0) & ((slots & _NEWBIT) != 0)
    assert new.sum() == uniq
    # absent coords miss
    absent = _coords(rng, 256, lo=600, hi=900)
    assert (np.asarray(lookup(tab, jnp.asarray(absent))) == -1).all()
    # invalid rows never land in the table
    assert (slots[~valid] == -1).all()

    coords_k, valid_k = extract_level(
        jnp.asarray(c), jnp.asarray(slots), jnp.asarray(count), cap=v
    )
    coords_k, valid_k = np.asarray(coords_k), np.asarray(valid_k)
    assert valid_k.sum() == uniq
    assert (coords_k[sid[valid]] == c[valid]).all()


def test_index_mode_maps_to_input_rows():
    rng = np.random.default_rng(1)
    v = 1024
    c = np.unique(_coords(rng, 2 * v), axis=0)[:v].astype(np.int32)
    rng.shuffle(c)
    valid = np.ones((v,), bool)
    tab, slots, _ = build_table_pallas(
        jnp.asarray(c), jnp.asarray(valid), T=64, index_slots=True,
        interpret=True,
    )
    rows = np.asarray(lookup(tab, jnp.asarray(c)))
    assert (rows == np.arange(v)).all()
    assert (np.asarray(slots) & _SLOTMASK == np.arange(v)).all()


def test_tiny_table_overflow_side2_and_flags():
    # T=8 x 32 lanes x 2 sides = 512 entries for ~980 uniques: most buckets
    # overflow side 1 (exercising the side-2 path + bit-30 flags) and many
    # keys are unplaceable (slot -1). Contract: placed keys stay findable,
    # unplaced keys miss — exactness degrades to "absent", never to a wrong
    # row.
    rng = np.random.default_rng(2)
    v = 1024
    c = np.unique(_coords(rng, 2048), axis=0)[:v].astype(np.int32)
    valid = np.ones((v,), bool)
    tab, slots, count = build_table_pallas(
        jnp.asarray(c), jnp.asarray(valid), T=8, interpret=True
    )
    slots = np.asarray(slots)
    placed = slots >= 0
    assert 0 < placed.sum() <= 512
    assert int(count) == ((slots & _NEWBIT) != 0)[placed].sum()
    rows = np.asarray(
        lookup(tab, jnp.asarray(c), retry_capacity=1 << 14)
    )
    assert (rows[placed] == (slots & _SLOTMASK)[placed]).all()
    assert (rows[~placed] == -1).all()


def test_unet_structures_match_downsample_semantics():
    rng = np.random.default_rng(3)
    v = 1024
    pts = _coords(rng, v, lo=-400, hi=400)
    valid = np.ones((v,), bool)
    valid[900:] = False
    # capacities that hold every unique: under capacity OVERFLOW both paths
    # truncate to cap uniques but keep different subsets (lexicographic-
    # first vs first-occurrence) — same count, different members; the
    # faithful regime (capacity_div sizing, fcgf.py) never overflows
    caps = [v, v, v, v]
    tables, levels, placed0 = build_unet_structures(
        jnp.asarray(pts), jnp.asarray(valid), 1, caps, interpret=True
    )
    assert np.asarray(placed0)[valid].all()
    # level-0 table: input-row ids
    r0 = np.asarray(lookup(tables[0], jnp.asarray(pts)))
    assert (r0[valid] == np.arange(v)[valid]).all()
    for k, (ck, vk) in enumerate(levels, start=1):
        ref_c, ref_v = downsample_coords(
            jnp.asarray(pts), jnp.asarray(valid), 1 << (k - 1), caps[k]
        )
        ck, vk = np.asarray(ck), np.asarray(vk)
        ref_set = {tuple(r) for r in np.asarray(ref_c)[np.asarray(ref_v)]}
        got_set = {tuple(r) for r in ck[vk]}
        assert got_set == ref_set, f"level {k}"
        # the level table resolves every member to its row in ck
        rows = np.asarray(lookup(tables[k], jnp.asarray(ck)))[vk]
        assert (rows == np.arange(len(vk))[vk]).all()


def test_capacity_shape_contract():
    with pytest.raises(AssertionError):
        build_table_pallas(
            jnp.zeros((100, 3), jnp.int32), jnp.ones((100,), bool), T=64,
            interpret=True,
        )  # V not a multiple of 1024 (scalar-stream block size)


def test_coord_range_guard_drops_out_of_range():
    # coords outside the asymmetric 12/10/8-bit packing ranges
    # (x +-2048, y +-512, z +-128) can't be represented; the guard must
    # drop them like padding (slot -1, absent from the table) — NOT alias
    # them onto the masked wrap.
    rng = np.random.default_rng(4)
    v = 1024
    c = _coords(rng, v, lo=-400, hi=400)
    c[0] = (2500, 0, 0)       # x out (would wrap to -1595)
    c[1] = (0, -513, 10)      # y one step out on the low side
    c[2] = (0, 10, 200)       # z out (would wrap to -56)
    c[3] = (2047, 511, 127)   # boundary: in range
    c[4] = (-2048, -512, -128)  # boundary: in range
    c[5] = (0, 600, 10)       # y out; wraps to (0, -424, 10) if unguarded
    alias = np.array([0, ((600 + 512) & 1023) - 512, 10], np.int32)
    c[6] = alias              # legitimate point AT c[5]'s alias target
    valid = np.ones((v,), bool)
    tab, slots, _ = build_table_pallas(
        jnp.asarray(c), jnp.asarray(valid), T=128, interpret=True
    )
    slots = np.asarray(slots)
    assert (slots[[0, 1, 2, 5]] == -1).all()          # dropped, not wrapped
    assert slots[3] >= 0 and slots[4] >= 0            # boundaries stay in
    # the alias target's slot belongs to the REAL point at that coord
    rows = np.asarray(lookup(tab, jnp.asarray(alias[None])))
    assert rows[0] == (slots[6] & _SLOTMASK)
    # unet builder inherits the guard at every level
    tables, levels, placed0 = build_unet_structures(
        jnp.asarray(c), jnp.asarray(valid), 1, [v, v], interpret=True
    )
    assert not np.asarray(placed0)[[0, 1, 2, 5]].any()
