"""Sparse convolution as hash-lookup kernel maps + one MXU matmul per layer.

Replaces MinkowskiEngine's generalized sparse convolution (SURVEY.md §2a).
Performance structure (v5e-profiled):

  * the KERNEL MAP (neighbor row index per kernel offset) is computed once
    per (coordinate set, offset pattern) and shared by every conv at that
    U-Net level — ME's coordinate manager caches kernel maps the same way;
  * hash lookups are SINGLE-GATHER (bucketized table with per-bucket
    overflow flags — sparse/hashtable.py), and stride-1 same-set maps pay
    for only half their offsets (symmetric-stencil mirror,
    kernel_map_stride1);
  * the conv itself is img2col: one [J, Vo, Cin] neighbor gather + a single
    (J*Cin) x Cout contraction that XLA tiles straight onto the MXU —
    features in bf16-accumulate-f32 (weights/features are O(1) normalized;
    coordinates never touch this path);
  * kernel_size=1 convs skip the hash machinery entirely (pure dense).

Conventions (pinned against Experiments/misc/fcgf.py + ME 0.5 semantics):
  * a tensor at stride s has integer coords that are multiples of s;
  * conv(kernel k, stride 1): inputs at out_c + off, off in {-r..r}^3 * s;
  * conv(kernel 3, stride 2): out coords = unique((c // 2s) * 2s); inputs at
    out_c + off, off in {-s, 0, s}^3 (input-stride units);
  * conv_tr(kernel 3, stride 2): out coords = the SKIP-LEVEL coordinate set
    (decoder levels reuse encoder coordinate sets — ME's coordinate-manager
    sharing in the reference U-Net, fcgf.py:800-843); inputs at
    out_c + off, off in {-s_out, 0, s_out}^3 looked up in the coarse table.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from .hashtable import HashTable, build_table, lookup
from .tensor import SparseTensor, downsample_coords, kernel_offsets


class KernelMap(NamedTuple):
    nb: jnp.ndarray    # [J, Vo] int32 — input row per (offset, output voxel)
    hit: jnp.ndarray   # [J, Vo] bool  — neighbor exists and is valid


class PrunedKernelMap(NamedTuple):
    """Hit-count-compacted kernel map for very-high-J stencils (6-D nets).

    A 3^6 = 729-offset stencil over DGR's correspondence tensor is almost
    entirely empty: correspondences live near a 3-D manifold in 6-D space,
    so measured hit mass concentrates in a handful of offsets (typically
    just the center + a few diagonal neighbors; scripts/hitdist probe).
    The im2col gather then moves J*Vo rows per conv of which >99% are
    masked misses. This map keeps the `keep` highest-hit-count offsets in
    dense [keep, Vo] im2col form and compacts EVERY remaining hit into a
    flat [tail_cap] (offset, out_voxel, in_row) list — exact as long as
    tail hits fit `tail_cap` (they number ~0-10 at benchmark scale; the
    excess, if any, is dropped and counted in `tail_dropped`).

    Shared per coordinate-set/offset-pattern like KernelMap: the pruning
    cost (one cumsum over J*Vo) is paid once per level, not per conv.
    """

    nb: jnp.ndarray        # [keep, Vo]
    hit: jnp.ndarray       # [keep, Vo]
    off_id: jnp.ndarray    # [keep] original offset row (weights index)
    tail_nb: jnp.ndarray   # [T] input row of each tail hit
    tail_off: jnp.ndarray  # [T] offset row of each tail hit
    tail_out: jnp.ndarray  # [T] output voxel of each tail hit
    tail_ok: jnp.ndarray   # [T] slot occupied
    tail_dropped: jnp.ndarray  # [] int32 — tail hits beyond tail_cap


def prune_kernel_map(
    kmap: KernelMap, keep: int, tail_cap: int = 2048
) -> PrunedKernelMap | KernelMap:
    """Compact a [J, Vo] kernel map to its `keep` busiest offsets + tail."""
    J, Vo = kmap.nb.shape
    if keep >= J:
        return kmap
    from jax import lax

    hits = jnp.sum(kmap.hit, axis=1)                    # [J]
    _, top = lax.top_k(hits, keep)
    top = top.astype(jnp.int32)
    nb = kmap.nb[top]
    hit = kmap.hit[top]

    is_top = jnp.zeros((J,), bool).at[top].set(True)
    tail_hit = kmap.hit & (~is_top)[:, None]            # [J, Vo]
    flat = tail_hit.ravel()
    pos = jnp.cumsum(flat.astype(jnp.int32)) - 1        # rank of each hit
    n_tail = jnp.where(flat.shape[0] > 0, pos[-1] + 1, 0)
    src = jnp.arange(J * Vo, dtype=jnp.int32)
    tgt = jnp.where(flat & (pos < tail_cap), pos, tail_cap)
    slots = (
        jnp.full((tail_cap + 1,), -1, jnp.int32)
        .at[tgt].set(src, mode="drop")[:tail_cap]
    )
    ok = slots >= 0
    sl = jnp.maximum(slots, 0)
    t_off = sl // Vo
    t_out = sl - t_off * Vo
    t_nb = kmap.nb.ravel()[sl]
    return PrunedKernelMap(
        nb, hit, top, t_nb, t_off, t_out, ok,
        jnp.maximum(n_tail - tail_cap, 0),
    )


def table_for(
    x: SparseTensor,
    table_factor: int = 16,
    rounds: tuple[int, int] | None = None,
    unique_coords: bool = False,
) -> HashTable:
    # per-side entries; factor 16 => bucket load 0.25 at 4 lanes, so the
    # single-probe lookup's side-2 retry path fires ~never (hashtable.py).
    # unique_coords=True (voxelized coordinate lists) skips the duplicate-
    # drain gather each claim round (hashtable.build_table).
    size = 1
    while size < table_factor * x.capacity:
        size *= 2
    table, _ = build_table(x.coords, x.valid, size, rounds=rounds,
                           unique_coords=unique_coords)
    return table


def kernel_map(
    in_table: HashTable,
    in_valid: jnp.ndarray,
    out_coords: jnp.ndarray,
    out_valid: jnp.ndarray,
    offsets: jnp.ndarray,
) -> KernelMap:
    """Neighbor map for all offsets at once: [J, Vo] lookups in one batch.

    CONTRACT: `in_table` must have been built with `in_valid` as its
    validity mask (every call site does — table_for / fcgf.mk_table /
    dgr_zoo._mk_table). build_table only inserts valid rows, so nb >= 0
    already implies the neighbor is valid: checking `in_valid[nb]` again
    would be a J*Vo-row gather of pure waste (~35 ms of the FCGF forward
    at 65k-pair scale; v5e round 3).
    """
    del in_valid  # kept in the signature to document the contract
    queries = out_coords[None, :, :] + offsets[:, None, :]  # [J, Vo, 3]
    nb = lookup(in_table, queries)
    hit = (nb >= 0) & out_valid[None, :]
    nb_safe = jnp.where(hit, nb, 0)
    return KernelMap(nb_safe, hit)


def stride1_queries(coords: jnp.ndarray, offsets: jnp.ndarray) -> jnp.ndarray:
    """Lookup queries for `kernel_map_stride1`'s first J//2 offsets."""
    half = offsets.shape[0] // 2
    return coords[None, :, :] + offsets[:half, None, :]


def kernel_map_stride1(
    in_table: HashTable,
    valid: jnp.ndarray,
    coords: jnp.ndarray,
    offsets: jnp.ndarray,
    nb_half: jnp.ndarray | None = None,
) -> KernelMap:
    """Stride-1 (same coordinate set) kernel map at HALF the lookup cost.

    A hypercubic stencil is symmetric: offsets[J-1-j] == -offsets[j] and the
    center offset is zero. On a shared in/out coordinate set the pair
    (j, out=o, in=i) exists iff (J-1-j, out=i, in=o) does, so only the first
    J//2 offsets need hash lookups; the mirror half is derived by ONE flat
    set-scatter (~free on v5e vs ~8.75 ns/row gathers — CLAUDE.md), and the
    center row is the identity map. Exact — not an approximation (voxel
    coords are unique, so the scatter has no index conflicts).

    Pass `nb_half` (a `lookup`/`lookup_grouped` result over
    `stride1_queries`) to skip the probe — the fused forward batches every
    level's probes into one `lookup_grouped` call.
    """
    J = offsets.shape[0]
    V = coords.shape[0]
    assert J % 2 == 1, "hypercube stencils have odd offset counts"
    half = J // 2
    if nb_half is None:
        nb_half = lookup(in_table, stride1_queries(coords, offsets))
    # nb >= 0 already implies the neighbor is valid: the table is built
    # with this same `valid` mask (kernel_map contract above), so the
    # valid[nb] re-check would be a half*V-row gather of waste
    hit_half = (nb_half >= 0) & valid[None, :]
    nb_safe = jnp.where(hit_half, nb_half, 0)

    # mirror half via ONE flat scatter: nb[J-1-j, i] = o where nb[j, o] = i.
    # Scatters cost ~as much per element as gathers at this scale, so nb and
    # hit are packed into a single int32 scatter (init -1; hit = val >= 0).
    rows = jnp.broadcast_to(jnp.arange(V, dtype=jnp.int32), (half, V))
    j_base = jnp.arange(half, dtype=jnp.int32)[:, None] * V
    tgt = jnp.where(hit_half, j_base + nb_safe, half * V).ravel()
    packed = (
        jnp.full((half * V,), -1, jnp.int32)
        .at[tgt].set(rows.ravel(), mode="drop")
        .reshape(half, V)
    )
    hit_m = packed >= 0
    nb_m = jnp.maximum(packed, 0)

    nb = jnp.concatenate(
        [nb_safe, jnp.arange(V, dtype=jnp.int32)[None], nb_m[::-1]]
    )
    hit = jnp.concatenate([hit_half, valid[None], hit_m[::-1]])
    return KernelMap(nb, hit)


def down_queries(in_coords: jnp.ndarray, stride: int):
    """Coarse-table queries + offset indices for `kernel_map_down`.

    Returns (q [2^d, Vi, d] candidate parent coords, j_idx [2^d, Vi] offset
    row in the 3^d `kernel_offsets` enumeration).
    """
    vi, d = in_coords.shape
    s = jnp.int32(stride)
    s2 = jnp.int32(2 * stride)
    r = in_coords - (in_coords // s2) * s2            # [Vi, d]
    odd = r == s
    qs, js = [], []
    for b in range(1 << d):
        bits = jnp.asarray(
            [(b >> (d - 1 - k)) & 1 for k in range(d)], jnp.int32
        )
        off = jnp.where(odd, (2 * bits[None, :] - 1) * s, 0)   # [Vi, d]
        qs.append(in_coords - off)
        # offset index in the kernel_offsets enumeration (meshgrid 'ij':
        # LAST axis fastest): j = sum_k (off_k/s + 1) * 3^(d-1-k)
        idx = off // s + 1
        w3 = jnp.asarray([3 ** (d - 1 - k) for k in range(d)], jnp.int32)
        js.append(jnp.sum(idx * w3[None, :], axis=1))
    return jnp.stack(qs), jnp.stack(js)


def kernel_map_down(
    out_table: HashTable,
    in_coords: jnp.ndarray,
    in_valid: jnp.ndarray,
    n_out: int,
    stride: int,
    kernel_size: int = 3,
    o_row: jnp.ndarray | None = None,
) -> KernelMap:
    """Stride-2 (k=3) kernel map derived from the FINE side: 2^dim lookups
    per input voxel instead of 3^dim per output voxel.

    A stride-2 conv pairs (offset j, coarse out o, fine in i) where
    in_c = out_c + off, off in {-s,0,s}^dim. Seen from the fine voxel:
    out_c = in_c - off must lie on the 2s lattice, so per axis only the
    offsets matching in_c's parity qualify — 0 where the component is even
    (in 2s units), {-s,+s} where odd. That is at most 2^dim candidate
    parents per fine voxel (vs 3^dim stencil probes per coarse voxel — a
    3.4x probe reduction in 3-D, 11x for DGR's 6-D net), looked up in the
    COARSE table and scattered into the map (at most one fine voxel per
    (j, o) slot, so the packed set-scatter is conflict-free).

    Bit-identical to `kernel_map(fine_table, ..., out_coords, ...)` with the
    same offsets enumeration (tests/test_sparse.py parity test). Same table
    contract as kernel_map: `out_table` must be built with the coarse
    validity mask.
    """
    assert kernel_size == 3, "derivation assumes radius-1 stencils"
    vi, d = in_coords.shape
    rows_i = jnp.arange(vi, dtype=jnp.int32)
    # component parity on the 2s lattice picks the candidate parents
    # (floor-mod: coords may be negative) — see down_queries
    q, j_idx = down_queries(in_coords, stride)         # [2^d, Vi, (d)]
    if o_row is None:
        o_row = lookup(out_table, q)                   # [2^d, Vi]
    J = 3**d
    ok = (o_row >= 0) & in_valid[None, :]
    tgt = jnp.where(ok, j_idx * n_out + o_row, J * n_out).ravel()
    packed = (
        jnp.full((J * n_out,), -1, jnp.int32)
        .at[tgt].set(
            jnp.broadcast_to(rows_i, (1 << d, vi)).ravel(), mode="drop"
        )
        .reshape(J, n_out)
    )
    return KernelMap(jnp.maximum(packed, 0), packed >= 0)


def up_map_from_fine(
    o_row: jnp.ndarray,      # [2^d, Vi] coarse row per candidate parent
    j_idx: jnp.ndarray,      # [2^d, Vi] offset index (down_queries)
    in_valid: jnp.ndarray,   # [Vi] fine-voxel validity
    kernel_size: int = 3,
) -> KernelMap:
    """Transpose-conv kernel map scattered from the FINE side.

    `invert_kernel_map` scatters J * Vc update rows (27x the coarse count
    in 3-D) of which only the hits survive; but the down map's fine-side
    candidate data (down_queries + the grouped probe) already lists every
    (offset, parent) pair per fine voxel — at most 2^d per voxel. Packing
    the up map [J, Vi] directly from that list is the same one-scatter
    trick at 8/27ths the update rows (round-5: ~2.2M -> 0.64M scatter rows
    per forward @32k). Offset j of the down pair becomes J-1-j for the
    transpose (offset negation reverses the hypercube enumeration).
    Bit-identical to `invert_kernel_map(kernel_map_down(...), Vi)`
    (tests/test_sparse.py parity).
    """
    assert kernel_size == 3, "derivation assumes radius-1 stencils"
    two_d, vi = o_row.shape
    J = 3 ** (two_d.bit_length() - 1)
    rows_i = jnp.arange(vi, dtype=jnp.int32)
    ok = (o_row >= 0) & in_valid[None, :]
    tgt = jnp.where(
        ok, (J - 1 - j_idx) * vi + rows_i[None, :], J * vi
    ).ravel()
    packed = (
        jnp.full((J * vi,), -1, jnp.int32)
        .at[tgt].set(o_row.ravel(), mode="drop")
        .reshape(J, vi)
    )
    return KernelMap(jnp.maximum(packed, 0), packed >= 0)


def invert_kernel_map(down: KernelMap, n_fine: int) -> KernelMap:
    """Transpose-conv kernel map derived from the matching down-conv map.

    A stride-2 conv's (offset j, coarse out o, fine in i) pairs are exactly
    the transpose conv's (J-1-j, i, o) pairs back onto the finer coordinate
    set (offset negation reverses the hypercube enumeration). ONE packed
    flat set-scatter (nb and hit share an int32: init -1, hit = val >= 0)
    replaces a J x V hash-lookup pass (~30% of FCGF kernel-map cost on
    v5e) — same packing trick as kernel_map_stride1's mirror half.
    """
    J, Vc = down.nb.shape
    coarse_rows = jnp.broadcast_to(
        jnp.arange(Vc, dtype=jnp.int32), (J, Vc)
    )
    j_base = (J - 1 - jnp.arange(J, dtype=jnp.int32))[:, None] * n_fine
    tgt = jnp.where(down.hit, j_base + down.nb, J * n_fine).ravel()
    packed = (
        jnp.full((J * n_fine,), -1, jnp.int32)
        .at[tgt].set(coarse_rows.ravel(), mode="drop")
        .reshape(J, n_fine)
    )
    return KernelMap(jnp.maximum(packed, 0), packed >= 0)


def apply_conv(
    in_feats: jnp.ndarray,   # [Vi, Cin]
    kmap: KernelMap,
    weights: jnp.ndarray,    # [J, Cin, Cout]
    out_valid: jnp.ndarray,  # [Vo]
    precision: str = "default",
    compute_dtype: jnp.dtype | None = None,
) -> jnp.ndarray:
    """img2col sparse conv: one gather + one big contraction. [Vo, Cout].

    `compute_dtype=jnp.bfloat16` halves the neighbor-gather HBM traffic and
    doubles MXU rate; accumulation stays f32 (`preferred_element_type`).
    Feature-space math tolerates bf16 (activations are BN-normalized O(1));
    geometry paths must NOT pass a reduced dtype.

    A `PrunedKernelMap` routes through the compacted path: dense im2col on
    the kept offsets (weights gathered by `off_id`) plus a [T]-row tail
    einsum scatter-added into the output — exact vs the full map whenever
    the tail fit its cap (see PrunedKernelMap).
    """
    x = in_feats if compute_dtype is None else in_feats.astype(compute_dtype)
    w = weights if compute_dtype is None else weights.astype(compute_dtype)

    if isinstance(kmap, PrunedKernelMap):
        out = apply_conv(
            in_feats, KernelMap(kmap.nb, kmap.hit), weights[kmap.off_id],
            out_valid, precision=precision, compute_dtype=compute_dtype,
        )
        xg = x[kmap.tail_nb] * kmap.tail_ok[:, None].astype(x.dtype)
        wg = w[kmap.tail_off]                     # [T, Cin, Cout]
        rows = jnp.einsum(
            "tc,tcd->td", xg, wg,
            precision=precision, preferred_element_type=jnp.float32,
        )
        # ok=False slots gathered x[0]*0 = zero rows -> adding them to
        # voxel tail_out[0-slot]=0 is a no-op; no extra mask gather needed
        return (out.at[kmap.tail_out].add(rows)) * out_valid[:, None]

    J, Vo = kmap.nb.shape
    cin = x.shape[-1]

    def contract(nb, hit, wj):
        g = x[nb] * hit[..., None].astype(x.dtype)        # [j, Vo, Cin]
        return jnp.einsum(
            "jvc,jcd->vd", g, wj,
            precision=precision, preferred_element_type=jnp.float32,
        )

    # the im2col intermediate is [J, Vo, Cin]; 6-D nets (J = 3^6 = 729)
    # at full width would materialize multi-GB buffers — lax.scan over
    # offset chunks instead (elements budget ~128M = 512 MB f32), with the
    # gather rematerialized in the backward pass (without remat autodiff
    # saves every chunk's [step, Vo, Cin] residual and the TRAIN step
    # OOMs; an unrolled python loop makes the HLO too large for the
    # remote-compile tunnel)
    budget = 128 * 2**20
    if J * Vo * cin <= budget:
        out = contract(kmap.nb, kmap.hit, w)
    else:
        import jax
        from jax import lax

        contract_ckpt = jax.checkpoint(contract)
        step = max(1, budget // (Vo * cin))
        n_chunks = -(-J // step)
        pad = n_chunks * step - J
        nb_c = jnp.concatenate(
            [kmap.nb, jnp.zeros((pad, Vo), jnp.int32)]
        ).reshape(n_chunks, step, Vo)
        hit_c = jnp.concatenate(
            [kmap.hit, jnp.zeros((pad, Vo), bool)]
        ).reshape(n_chunks, step, Vo)
        w_c = jnp.concatenate(
            [w, jnp.zeros((pad,) + w.shape[1:], w.dtype)]
        ).reshape(n_chunks, step, *w.shape[1:])

        def body(acc, xs):
            nb_j, hit_j, w_j = xs
            return acc + contract_ckpt(nb_j, hit_j, w_j), None

        out, _ = lax.scan(
            body, jnp.zeros((Vo, weights.shape[-1]), jnp.float32),
            (nb_c, hit_c, w_c),
        )
    return out * out_valid[:, None]


def sparse_conv(
    x: SparseTensor,
    weights: jnp.ndarray,   # [K^3, Cin, Cout]
    kernel_size: int,
    stride: int = 1,
    out_capacity: int | None = None,
    in_table: HashTable | None = None,
    kmap: KernelMap | None = None,
) -> SparseTensor:
    """Sparse convolution; stride 1 keeps coords, stride 2 downsamples.

    Pass a precomputed `kmap` (from `kernel_map`) to skip hash lookups —
    every stride-1 conv on the same coordinate set shares one map.
    """
    if kernel_size == 1 and stride == 1:
        out = jnp.dot(
            x.feats, weights[0], preferred_element_type=jnp.float32
        ) * x.valid[:, None]
        return SparseTensor(x.coords, out, x.valid, x.stride)

    if stride == 1:
        out_coords, out_valid = x.coords, x.valid
        out_stride = x.stride
    elif stride == 2:
        cap = out_capacity or x.capacity
        out_coords, out_valid = downsample_coords(
            x.coords, x.valid, x.stride, cap
        )
        out_stride = x.stride * 2
    else:
        raise ValueError("only stride 1 and 2 are used by the FCGF family")

    if kmap is None:
        if in_table is None:
            in_table = table_for(x)
        offsets = kernel_offsets(kernel_size, x.stride, x.coords.shape[1])
        kmap = kernel_map(in_table, x.valid, out_coords, out_valid, offsets)

    out = apply_conv(x.feats, kmap, weights, out_valid)
    return SparseTensor(out_coords, out, out_valid, out_stride)


def sparse_conv_transpose(
    x: SparseTensor,
    weights: jnp.ndarray,        # [K^3, Cin, Cout]
    kernel_size: int,
    out_coords: jnp.ndarray,     # target (finer) coordinate set
    out_valid: jnp.ndarray,
    out_stride: int,
    in_table: HashTable | None = None,
    kmap: KernelMap | None = None,
) -> SparseTensor:
    """Transpose (upsampling) conv onto a given finer coordinate set."""
    if kmap is None:
        if in_table is None:
            in_table = table_for(x)
        offsets = kernel_offsets(kernel_size, out_stride, x.coords.shape[1])
        kmap = kernel_map(in_table, x.valid, out_coords, out_valid, offsets)
    out = apply_conv(x.feats, kmap, weights, out_valid)
    return SparseTensor(out_coords, out, out_valid, out_stride)
