"""FCGF feature encoder: sparse ResUNetBN2C over the TPU sparse-conv engine.

Parity target: Experiments/misc/fcgf.py:621-868 (ResUNet2 family; the
benchmark uses ResUNetBN2C with in=1, out=32, bn_momentum=0.05,
conv1_kernel_size=5, normalize_feature=True — instantiated at
Experiments/datasets/LidarFeatureExtractor.py:71-76 and
FCGF_FAST/model/resunet.py:1223-1245).

Channel plan (fcgf.py:864-868): CHANNELS [_, 32, 64, 128, 256],
TR_CHANNELS [_, 64, 64, 64, 128].

U-Net coordinate discipline: each decoder level's output coordinate set is
the matching encoder level's set (ME shares them through its coordinate
manager; here we pass the stored encoder coords to conv_tr), which makes the
ME.cat skip connections (fcgf.py:824-843) an exact channel concat.

Performance discipline: all hash tables and kernel maps are computed ONCE in
the forward (one per coordinate-set/offset-pattern pair — 9 maps total) and
shared across every conv at that level; each conv is then a single gather +
MXU matmul (sparse/conv.py docstring).
"""
from __future__ import annotations

import itertools
import os
from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..sparse.conv import (
    PrunedKernelMap,
    apply_conv,
    down_queries,
    invert_kernel_map,
    kernel_map_down,
    kernel_map_stride1,
    prune_kernel_map,
    stride1_queries,
    table_for,
    up_map_from_fine,
)
from ..sparse.hashtable import (
    HashTable,
    build_table,
    build_table_dedup,
    build_tables_ragged,
    lookup_grouped,
    lookup_grouped_ragged,
)
from ..sparse.tensor import (
    SparseTensor,
    downsample_coords,
    downsample_pyramid,
    kernel_offsets,
)


class SparseConvLayer(nn.Module):
    """One sparse conv with an externally-supplied kernel map.

    kernel_size==1 needs no map (pure per-voxel dense matmul).
    `num_offsets` = kernel_size ** dim (the kmap's offset count).
    `ones_input=True` asserts the input features are the all-ones column
    the FCGF/DGR convention feeds the stem conv
    (LidarFeatureExtractor.py:131-139 / deep_global_registration.py:380:
    ME.SparseTensor(features=ones)): x[nb]*hit == hit, so the neighbor
    GATHER (J*V rows, the most expensive op of the level-1 stack) is
    replaced by a pure [V,J]x[J,C] hit-mask matmul — exact, not approximate.
    """

    out_channels: int
    kernel_size: int
    use_bias: bool = False
    num_offsets: int | None = None
    compute_dtype: str | None = None   # 'bfloat16' halves gather traffic
    ones_input: bool = False

    @nn.compact
    def __call__(self, feats, valid, kmap=None):
        j = self.num_offsets or self.kernel_size**3
        w = self.param(
            "kernel",
            nn.initializers.variance_scaling(1.0, "fan_in", "truncated_normal"),
            (j, feats.shape[-1], self.out_channels),
        )
        cdt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        if self.kernel_size == 1:
            x, wk = (feats, w[0]) if cdt is None else (
                feats.astype(cdt), w[0].astype(cdt)
            )
            out = jnp.dot(x, wk, preferred_element_type=jnp.float32)
            out = out * valid[:, None]
        elif self.ones_input and feats.shape[-1] == 1:
            h = kmap.hit.astype(cdt or jnp.float32)          # [J, V]
            wsel = w if not isinstance(kmap, PrunedKernelMap) else w[kmap.off_id]
            wk = wsel[:, 0, :] if cdt is None else wsel[:, 0, :].astype(cdt)
            out = jnp.einsum(
                "jv,jd->vd", h, wk, preferred_element_type=jnp.float32
            )
            if isinstance(kmap, PrunedKernelMap):
                # tail hits contribute their offset's weight row directly
                # (all-ones input: x[nb] == 1)
                rows = w[kmap.tail_off, 0, :] * kmap.tail_ok[:, None]
                out = out.at[kmap.tail_out].add(rows)
            out = out * valid[:, None]
        else:
            out = apply_conv(feats, kmap, w, valid, compute_dtype=cdt)
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,))
            out = (out + b) * valid[:, None]
        return out


class SparseBatchNorm(nn.Module):
    """BatchNorm over valid voxels only (ME BN normalizes over all points)."""

    momentum: float = 0.05  # reference bn_momentum (torch convention)

    @nn.compact
    def __call__(self, feats, valid, train: bool):
        c = feats.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        ra_mean = self.variable("batch_stats", "mean", jnp.zeros, (c,))
        ra_var = self.variable("batch_stats", "var", jnp.ones, (c,))

        if train:
            m = valid.astype(jnp.float32)[:, None]
            n = jnp.maximum(jnp.sum(m), 1.0)
            mean = jnp.sum(feats * m, axis=0) / n
            var = jnp.sum(((feats - mean) ** 2) * m, axis=0) / n
            if not self.is_initializing():
                # torch-style update: new = (1 - mom) * old + mom * batch
                ra_mean.value = (1 - self.momentum) * ra_mean.value + self.momentum * mean
                ra_var.value = (1 - self.momentum) * ra_var.value + self.momentum * var
        else:
            mean, var = ra_mean.value, ra_var.value

        f = (feats - mean) / jnp.sqrt(var + 1e-5) * scale + bias
        return f * valid[:, None]


class BasicBlockBN(nn.Module):
    """conv3-BN-relu-conv3-BN + skip, relu (fcgf.py:107-158)."""

    channels: int
    bn_momentum: float = 0.05
    num_offsets: int = 27
    compute_dtype: str | None = None

    @nn.compact
    def __call__(self, feats, valid, kmap, train: bool):
        residual = feats
        out = SparseConvLayer(self.channels, 3, num_offsets=self.num_offsets,
                              compute_dtype=self.compute_dtype,
                              name="conv1")(feats, valid, kmap)
        out = SparseBatchNorm(self.bn_momentum, name="norm1")(out, valid, train)
        out = nn.relu(out)
        out = SparseConvLayer(self.channels, 3, num_offsets=self.num_offsets,
                              compute_dtype=self.compute_dtype,
                              name="conv2")(out, valid, kmap)
        out = SparseBatchNorm(self.bn_momentum, name="norm2")(out, valid, train)
        return nn.relu((out + residual) * valid[:, None])


class ResUNetBN2C(nn.Module):
    """The FCGF benchmark network (4-level sparse U-Net, 32-D output)."""

    in_channels: int = 1
    out_channels: int = 32
    bn_momentum: float = 0.05
    conv1_kernel_size: int = 5
    normalize_feature: bool = True
    dim: int = 3   # 3 for point clouds; 6 for DGR's inlier net over pairs
    channels: Sequence[int] = (0, 32, 64, 128, 256)
    tr_channels: Sequence[int] = (0, 64, 64, 64, 128)
    # 'bfloat16' runs every conv's gather+matmul in bf16 with f32
    # accumulation (features are BN-normalized O(1); ~2x less gather HBM
    # traffic). None = f32 exactly.
    compute_dtype: str | None = "bfloat16"
    # FCGF/DGR feed all-ones input features (LidarFeatureExtractor.py:131-139)
    # — lets conv1 skip its J*V-row neighbor gather (SparseConvLayer). Set
    # False if real features are ever fed at the stem.
    ones_input: bool = True
    # Capacity of each stride level (level 0 = input capacity). Conservative
    # defaults: a level whose true voxel count exceeds its capacity silently
    # drops voxels (and with it, padding invariance) — real LiDAR reduces
    # ~3-4x per stride level, synthetic/uniform clouds reduce far less.
    level_capacity_div: Sequence[int] = (1, 1, 2, 4)
    # dim >= 6 only: compact every kernel map to its `prune_offsets`
    # busiest offsets + an exact [prune_tail_cap] tail (sparse/conv.py
    # PrunedKernelMap) — a 3^6 stencil over correspondence tensors is
    # >99% masked misses, and the im2col gather is the DGR inlier-net
    # floor. 0 disables.
    prune_offsets: int = 64
    prune_tail_cap: int = 2048
    # Fuse the per-level structure build: ONE batched sort for all three
    # downsample levels (sparse/tensor.downsample_pyramid) and ONE vmapped
    # claim-round program for all four hash tables, instead of 3 + 4
    # serialized passes. DEFAULT OFF (round 4): the fusion is neutral at
    # 32k voxels (141 vs 140 ms) but 1.7x SLOWER at the pair-batched 64k
    # (406 vs 240 ms, scripts/forward_build_ab.py) — the shared LEVEL-0
    # table sizing makes every coarse-level claim-round scatter 4-16x
    # bigger than its key count needs, and the cost only bites once tables
    # outgrow ~1M rows. LIDARREG_FUSED_BUILD=1 re-enables.
    fused_build: bool = os.environ.get("LIDARREG_FUSED_BUILD", "0") == "1"
    # Single-pass VMEM-resident pallas build (sparse/pallas_build.py): the
    # whole table lives in VMEM and points insert from a scalar-prefetch
    # stream — no claim-round scatters. DEFAULT OFF (round 4, measured
    # negative result): the kernel's per-point sequential insertion loop
    # loses to XLA's parallel claim-round scatters at product sizes
    # (forward 162 vs 140 ms @32k, 305 vs 240 ms @64k —
    # scripts/forward_build_ab.py; parity max|delta| 2e-3 on 0.67-scale
    # features). A competitive VMEM build needs lane-parallel insertion
    # with conflict resolution, not a scalar stream. Effective only when
    # dim == 3, capacity % 1024 == 0, backend is TPU; coords must fit the
    # 12/10/8-bit packing (pack_coords drops out-of-range like padding).
    # LIDARREG_PALLAS_BUILD=1 re-enables for A/Bs.
    pallas_build: bool = os.environ.get("LIDARREG_PALLAS_BUILD", "0") == "1"
    # Sort-free structure build: derive each level's unique coordinate set
    # from the claim rounds its hash-table build already runs
    # (sparse/hashtable.build_table_dedup) instead of the multi-key
    # `lax.sort` dedup (`downsample_coords`, ~34 ms of the 146 ms forward
    # @32k — BASELINE.md roofline). Changes the COARSE levels' row order
    # (deterministic claim order, not lexicographic); level-0 row order —
    # the tensor's public feature order — is unchanged and sparse conv is
    # row-order invariant, so outputs match to fp tolerance.
    # Default OFF until the on-chip parity+timing gate
    # (scripts/forward_build_ab.py, "dedup" mode) passes — repo rule: every
    # new scatter/gather-heavy path is proven on v5e before it can default
    # on (two prior miscompile post-mortems). LIDARREG_DEDUP_BUILD=1
    # enables.
    dedup_build: bool = os.environ.get("LIDARREG_DEDUP_BUILD", "0") == "1"
    # Combined ragged claim build (sparse/hashtable.build_tables_ragged):
    # ALL four per-level-sized tables AND all three coarse coordinate
    # lists from ONE set of 2*lanes claim rounds over a row-concatenated
    # table space — every level quantizes straight from level 0 (floor
    # division composes), so the 7-program serialized build chain
    # collapses to a single chain. Coarse-level row order is claim order
    # (same caveat as dedup_build); level-0 order unchanged. Default OFF
    # until the on-chip gate (scripts/forward_build_ab.py, "combined"
    # mode) passes. LIDARREG_COMBINED_BUILD=1 enables.
    combined_build: bool = (
        os.environ.get("LIDARREG_COMBINED_BUILD", "0") == "1"
    )
    # Grouped kernel-map probe for the serial/dedup builds: all 7 per-level
    # lookups in ONE program over row-concatenated PER-LEVEL-SIZED tables
    # (sparse/hashtable.lookup_grouped_ragged). The grouped probe is where
    # the fused path's speedup actually lived (maps 25 ms grouped vs 66 ms
    # serialized @32k) but it was coupled to the equal-shape table stack
    # and its 64k regression; this keeps per-level sizing. Default ON
    # after the on-chip gate passed (scripts/forward_build_ab.py: forward
    # 133.6 vs 142.9 ms @32k, 243.8 vs 243.3 @65k, parity bit-exact vs
    # serial — BASELINE.md round-4 build A/B). LIDARREG_GROUPED_LOOKUP=0
    # is the escape hatch. No effect under fused/pallas builds (they
    # already probe grouped).
    grouped_lookup: bool = (
        os.environ.get("LIDARREG_GROUPED_LOOKUP", "1") == "1"
    )
    # Claim-round schedule (side1_rounds, side2_rounds) for every hash
    # table of the structure build. Default (4, 2): side-1 stays
    # EXHAUSTIVE — reducing it (the (3, 2) schedule) spills early keys to
    # side 2 and inflates the overflow-flag population ~20x (39 vs 2
    # flagged buckets on the 65k gate scene), which saturates the grouped
    # probe's block-compacted retry pool and silently mis-resolves
    # neighbors (184 wrong kernel-map rows -> 0.31 feature delta @65k;
    # round-5 root-cause, BASELINE.md round-5 build section; the exact
    # failure mode ADVICE r4 item 1 warned about). Side-2 at 2 rounds is
    # exact: side-2 holds only the truly-overflowed keys (~1e-5 of keys
    # at the factor-16 sizing), so >2 colliding in one side-2 bucket is
    # ~impossible, and tests/test_fcgf.py pins grouped-probe parity at
    # the pair-batched 65k. LIDARREG_BUILD_ROUNDS=4,4 restores the fully
    # exhaustive schedule.
    build_rounds: tuple = tuple(
        int(t) for t in os.environ.get(
            "LIDARREG_BUILD_ROUNDS", "4,2"
        ).split(",")
    )

    def build_structures(self, x: SparseTensor):
        """Hash tables + kernel maps for every U-Net level — the pure
        int/bool "coordinate manager" half of the forward (what ME builds
        in its C++ coordinate manager; Experiments/misc/fcgf.py:229-798
        usage). A pure function of (coords, valid, stride) and the module
        CONFIG — no parameters, no flax state — so callers may dispatch it
        as its OWN jitted program and pass the result to `__call__` via
        `structures=`; `structures=None` builds inline (same numerics,
        one program). Returns a pytree dict of level valids + kernel maps
        (+ the pruning drop count for dim >= 6 nets).
        """
        cap = x.capacity
        caps = [max(256, cap // d) for d in self.level_capacity_div]
        s = x.stride

        # ---- coordinate sets, tables, kernel maps (once per level) ------ #
        c1, v1 = x.coords, x.valid
        import jax

        use_pallas = (
            self.pallas_build
            and self.dim == 3
            and cap % 1024 == 0
            and jax.default_backend() == "tpu"
        )
        if use_pallas:
            from ..sparse.pallas_build import build_unet_structures

            ptabs, plevels, _ = build_unet_structures(c1, v1, s, caps)
            t1, t2, t4, t8 = ptabs
            (c2, v2), (c4, v4), (c8, v8) = plevels
            # same stacked-table shape the vmapped XLA build produces, so
            # the lookup_grouped probe below is shared verbatim
            tabs = HashTable(
                jnp.stack([t.table for t in ptabs]),
                jnp.stack([jnp.asarray(t.mask) for t in ptabs]),
            )
        elif self.fused_build:
            (c2, v2), (c4, v4), (c8, v8) = downsample_pyramid(
                c1, v1, s, caps[1:]
            )
            # all four tables at the LEVEL-0 sizing (table_factor 16 on the
            # input capacity): equal shapes let one vmapped build replace
            # four serialized claim-round programs. Coarser levels get an
            # even lower bucket load — lookups stay single-probe.
            size = 1
            while size < 16 * cap:
                size *= 2

            def padto(c, v):
                p = cap - c.shape[0]
                if p:
                    c = jnp.concatenate(
                        [c, jnp.zeros((p, c.shape[1]), jnp.int32)]
                    )
                    v = jnp.concatenate([v, jnp.zeros((p,), bool)])
                return c, v

            pcs, pvs = zip(*(padto(c, v) for c, v in
                             ((c1, v1), (c2, v2), (c4, v4), (c8, v8))))
            tabs, _ = jax.vmap(
                lambda c, v: build_table(c, v, size, rounds=self.build_rounds,
                                         unique_coords=True)
            )(jnp.stack(pcs), jnp.stack(pvs))
            t1, t2, t4, t8 = (
                HashTable(tabs.table[i], tabs.mask[i]) for i in range(4)
            )
        elif self.combined_build:
            # one claim-round chain for all four tables + three coarse
            # coordinate lists; per-level table sizing kept (table_factor
            # 16, as mk_table below)
            def size_of(capacity):
                # sized on the INPUT row count (here every level quantizes
                # straight from level 0), not out_capacity: unique keys
                # beyond out_capacity still consume lanes, so V-based
                # sizing is what keeps the bucket load <= 0.25 that the
                # lookup's default retry pool assumes (round-4 ADVICE 1)
                size = 1
                while size < 16 * capacity:
                    size *= 2
                return size

            (t1, t2, t4, t8), louts = build_tables_ragged([
                (c1, v1, size_of(cap), None),
                ((c1 // (2 * s)) * (2 * s), v1, size_of(cap), caps[1]),
                ((c1 // (4 * s)) * (4 * s), v1, size_of(cap), caps[2]),
                ((c1 // (8 * s)) * (8 * s), v1, size_of(cap), caps[3]),
            ], rounds=self.build_rounds)
            (c2, v2), (c4, v4), (c8, v8) = louts[1], louts[2], louts[3]
        elif self.dedup_build:
            t1 = table_for(x, rounds=self.build_rounds, unique_coords=True)

            def dedup_level(coords, valid, s2, capacity):
                # per-side entries at table_factor 16 on the INPUT row
                # count (not the level capacity): unique quantized parents
                # can exceed out_capacity under coarse-level overflow, and
                # dropped winners still consume lanes — V-based sizing
                # keeps the bucket load <= 0.25 the 1-probe lookup's
                # default retry pool assumes (round-4 ADVICE item 1).
                # Duplicate parents drain via dup_served without
                # consuming lanes.
                size = 1
                while size < 16 * max(capacity, coords.shape[0]):
                    size *= 2
                q = (coords // s2) * s2
                return build_table_dedup(
                    q, valid, size, capacity, rounds=self.build_rounds
                )

            t2, c2, v2 = dedup_level(c1, v1, 2 * s, caps[1])
            t4, c4, v4 = dedup_level(c2, v2, 4 * s, caps[2])
            t8, c8, v8 = dedup_level(c4, v4, 8 * s, caps[3])
        else:
            # voxelized level-0 coords and the sort-deduped coarse lists
            # are distinct by construction -> skip the duplicate-drain
            # gather in every claim round (hashtable.build_table)
            t1 = table_for(x, rounds=self.build_rounds, unique_coords=True)
            c2, v2 = downsample_coords(c1, v1, s, caps[1])
            c4, v4 = downsample_coords(c2, v2, 2 * s, caps[2])
            c8, v8 = downsample_coords(c4, v4, 4 * s, caps[3])

            def mk_table(coords, valid, capacity):
                # per-side entries at table_factor 16: bucket load 0.25 at 4
                # lanes -> the 1-probe lookup's retry path fires ~never
                size = 1
                while size < 16 * capacity:
                    size *= 2
                table, _ = build_table(
                    coords, valid, size, rounds=self.build_rounds,
                    unique_coords=True,
                )
                return table

            t2 = mk_table(c2, v2, caps[1])
            t4 = mk_table(c4, v4, caps[2])
            t8 = mk_table(c8, v8, caps[3])

        offs1 = kernel_offsets(self.conv1_kernel_size, s, self.dim)
        offs2 = kernel_offsets(3, 2 * s, self.dim)
        offs4 = kernel_offsets(3, 4 * s, self.dim)
        offs8 = kernel_offsets(3, 8 * s, self.dim)
        if use_pallas or self.fused_build or self.grouped_lookup:
            # EVERY hash probe of the forward — four symmetric-stencil
            # stride-1 maps + three fine-side down maps — in ONE
            # lookup_grouped call: one gather program, one retry pool
            # (sparse/hashtable.py), instead of 7 serialized lookups
            dq1, dj1 = down_queries(c1, s)
            dq2, dj2 = down_queries(c2, 2 * s)
            dq4, dj4 = down_queries(c4, 4 * s)
            items = [
                (0, stride1_queries(c1, offs1)),
                (1, stride1_queries(c2, offs2)),
                (2, stride1_queries(c4, offs4)),
                (3, stride1_queries(c8, offs8)),
                (1, dq1),
                (2, dq2),
                (3, dq4),
            ]
            if use_pallas or self.fused_build:
                rows = lookup_grouped(tabs, items)
            else:
                # ragged variant: per-level table sizing kept (the equal-
                # shape stack forces LEVEL-0 sizing on every level, the
                # 1.7x-at-64k regression fused_build documents above)
                rows = lookup_grouped_ragged([t1, t2, t4, t8], items)
            km1_c1 = kernel_map_stride1(t1, v1, c1, offs1, nb_half=rows[0])
            km2 = kernel_map_stride1(t2, v2, c2, offs2, nb_half=rows[1])
            km4 = kernel_map_stride1(t4, v4, c4, offs4, nb_half=rows[2])
            km8 = kernel_map_stride1(t8, v8, c8, offs8, nb_half=rows[3])
            km_d12 = kernel_map_down(
                t2, c1, v1, c2.shape[0], s, o_row=rows[4])
            km_d24 = kernel_map_down(
                t4, c2, v2, c4.shape[0], 2 * s, o_row=rows[5])
            km_d48 = kernel_map_down(
                t8, c4, v4, c8.shape[0], 4 * s, o_row=rows[6])
            # conv_tr (up) maps packed straight from the SAME fine-side
            # candidate lists — 2^dim update rows per fine voxel instead
            # of inverting the [3^dim, Vc] down map (sparse/conv.py
            # up_map_from_fine; round-5, ~1.5M fewer scatter rows @32k)
            km_u21 = up_map_from_fine(rows[4], dj1, v1)
            km_u42 = up_map_from_fine(rows[5], dj2, v2)
            km_u84 = up_map_from_fine(rows[6], dj4, v4)
        else:
            km1_c1 = kernel_map_stride1(t1, v1, c1, offs1)
            km2 = kernel_map_stride1(t2, v2, c2, offs2)
            km4 = kernel_map_stride1(t4, v4, c4, offs4)
            km8 = kernel_map_stride1(t8, v8, c8, offs8)
            # stride-2 conv (down) maps derived from the FINE side: 2^dim
            # coarse-table lookups per input voxel instead of 3^dim
            # fine-table probes per output voxel (sparse/conv.py)
            km_d12 = kernel_map_down(t2, c1, v1, c2.shape[0], s)
            km_d24 = kernel_map_down(t4, c2, v2, c4.shape[0], 2 * s)
            km_d48 = kernel_map_down(t8, c4, v4, c8.shape[0], 4 * s)
            km_u21 = km_u42 = km_u84 = None
        if self.conv1_kernel_size > 3:
            # the 3^dim offsets are a subset of the conv1 kernel's offsets at
            # the same stride, so the L1-blocks map is a row-slice of km1_c1
            # — saves a 3^dim x V hash-lookup pass
            k5, r5 = self.conv1_kernel_size, self.conv1_kernel_size // 2
            sel = jnp.asarray(
                [
                    sum(
                        (d + r5) * k5 ** (self.dim - 1 - ax)
                        for ax, d in enumerate(deltas)
                    )
                    for deltas in itertools.product((-1, 0, 1), repeat=self.dim)
                ],
                jnp.int32,
            )
            km1 = type(km1_c1)(km1_c1.nb[sel], km1_c1.hit[sel])
        else:
            km1 = km1_c1                  # k3 stem: blocks share the map
        # conv_tr (up) maps are exact inversions of the down maps — J
        # set-scatters instead of a J x V hash-lookup pass (sparse/conv.py
        # invert_kernel_map); the grouped path already packed them from
        # the fine side above (up_map_from_fine)
        if km_u84 is None:
            km_u84 = invert_kernel_map(km_d48, c4.shape[0])
            km_u42 = invert_kernel_map(km_d24, c2.shape[0])
            km_u21 = invert_kernel_map(km_d12, c1.shape[0])

        dropped = []
        if self.dim >= 6 and self.prune_offsets:
            def pk(m):
                pm = prune_kernel_map(
                    m, self.prune_offsets, self.prune_tail_cap
                )
                if isinstance(pm, PrunedKernelMap):
                    dropped.append(pm.tail_dropped)
                return pm

            same_stem = km1 is km1_c1
            km1_c1 = pk(km1_c1)
            km1 = km1_c1 if same_stem else pk(km1)
            km2, km4, km8 = pk(km2), pk(km4), pk(km8)
            km_d12, km_d24, km_d48 = pk(km_d12), pk(km_d24), pk(km_d48)
            km_u84, km_u42, km_u21 = pk(km_u84), pk(km_u42), pk(km_u21)

        return {
            "v2": v2, "v4": v4, "v8": v8,
            "km1_c1": km1_c1, "km1": km1, "km2": km2, "km4": km4,
            "km8": km8, "km_d12": km_d12, "km_d24": km_d24,
            "km_d48": km_d48, "km_u84": km_u84, "km_u42": km_u42,
            "km_u21": km_u21,
            "prune_tail_dropped": (
                sum(dropped, jnp.int32(0)) if dropped else None
            ),
        }

    @nn.compact
    def __call__(self, x: SparseTensor, train: bool = False,
                 structures=None) -> SparseTensor:
        CH, TR = self.channels, self.tr_channels
        # reduced precision is an INFERENCE optimization: training keeps f32
        # end-to-end (bf16 backward pass loses the gradient signal when
        # activations degenerate, e.g. isolated voxels + constant features)
        cdt = None if train else self.compute_dtype
        bm = self.bn_momentum
        if structures is None:
            structures = self.build_structures(x)
        c1, v1 = x.coords, x.valid
        v2, v4, v8 = structures["v2"], structures["v4"], structures["v8"]
        km1_c1, km1 = structures["km1_c1"], structures["km1"]
        km2, km4, km8 = structures["km2"], structures["km4"], structures["km8"]
        km_d12, km_d24 = structures["km_d12"], structures["km_d24"]
        km_d48 = structures["km_d48"]
        km_u84, km_u42 = structures["km_u84"], structures["km_u42"]
        km_u21 = structures["km_u21"]
        ptd = structures.get("prune_tail_dropped")
        if ptd is not None and not self.is_initializing():
            # tail hits beyond prune_tail_cap are DROPPED from the conv
            # (silent accuracy loss); surface the count so callers can
            # detect it — apply with mutable=["diagnostics"] to read
            # (solvers/dgr.py threads it into DGRResult.prune_overflow)
            self.sow("diagnostics", "prune_tail_dropped", ptd)

        # ---- encoder ----------------------------------------------------- #
        no = lambda k: k**self.dim  # noqa: E731
        out_s1 = SparseConvLayer(
            CH[1], self.conv1_kernel_size, num_offsets=no(self.conv1_kernel_size),
            compute_dtype=cdt, ones_input=self.ones_input, name="conv1",
        )(x.feats, v1, km1_c1)
        out_s1 = SparseBatchNorm(bm, name="norm1")(out_s1, v1, train)
        out_s1 = BasicBlockBN(CH[1], bm, no(3), compute_dtype=cdt, name="block1")(out_s1, v1, km1, train)
        out = nn.relu(out_s1)

        out_s2 = SparseConvLayer(CH[2], 3, num_offsets=no(3), compute_dtype=cdt, name="conv2")(out, v2, km_d12)
        out_s2 = SparseBatchNorm(bm, name="norm2")(out_s2, v2, train)
        out_s2 = BasicBlockBN(CH[2], bm, no(3), compute_dtype=cdt, name="block2")(out_s2, v2, km2, train)
        out = nn.relu(out_s2)

        out_s4 = SparseConvLayer(CH[3], 3, num_offsets=no(3), compute_dtype=cdt, name="conv3")(out, v4, km_d24)
        out_s4 = SparseBatchNorm(bm, name="norm3")(out_s4, v4, train)
        out_s4 = BasicBlockBN(CH[3], bm, no(3), compute_dtype=cdt, name="block3")(out_s4, v4, km4, train)
        out = nn.relu(out_s4)

        out_s8 = SparseConvLayer(CH[4], 3, num_offsets=no(3), compute_dtype=cdt, name="conv4")(out, v8, km_d48)
        out_s8 = SparseBatchNorm(bm, name="norm4")(out_s8, v8, train)
        out_s8 = BasicBlockBN(CH[4], bm, no(3), compute_dtype=cdt, name="block4")(out_s8, v8, km8, train)
        out = nn.relu(out_s8)

        # ---- decoder (coords reuse encoder levels) ------------------------ #
        out = SparseConvLayer(TR[4], 3, num_offsets=no(3), compute_dtype=cdt, name="conv4_tr")(out, v4, km_u84)
        out = SparseBatchNorm(bm, name="norm4_tr")(out, v4, train)
        out = BasicBlockBN(TR[4], bm, no(3), compute_dtype=cdt, name="block4_tr")(out, v4, km4, train)
        out_s4_tr = nn.relu(out)

        out = jnp.concatenate([out_s4_tr, out_s4], axis=1)

        out = SparseConvLayer(TR[3], 3, num_offsets=no(3), compute_dtype=cdt, name="conv3_tr")(out, v2, km_u42)
        out = SparseBatchNorm(bm, name="norm3_tr")(out, v2, train)
        out = BasicBlockBN(TR[3], bm, no(3), compute_dtype=cdt, name="block3_tr")(out, v2, km2, train)
        out_s2_tr = nn.relu(out)

        out = jnp.concatenate([out_s2_tr, out_s2], axis=1)

        out = SparseConvLayer(TR[2], 3, num_offsets=no(3), compute_dtype=cdt, name="conv2_tr")(out, v1, km_u21)
        out = SparseBatchNorm(bm, name="norm2_tr")(out, v1, train)
        out = BasicBlockBN(TR[2], bm, no(3), compute_dtype=cdt, name="block2_tr")(out, v1, km1, train)
        out_s1_tr = nn.relu(out)

        out = jnp.concatenate([out_s1_tr, out_s1], axis=1)
        out = SparseConvLayer(TR[1], 1, compute_dtype=cdt,
                              name="conv1_tr")(out, v1)
        out = nn.relu(out)
        out = SparseConvLayer(self.out_channels, 1, use_bias=True,
                              compute_dtype=cdt, name="final")(
            out, v1
        )

        if self.normalize_feature:
            # safe norm: jnp.linalg.norm has a NaN gradient at exactly-zero
            # rows (padded voxels are exactly zero)
            norm = jnp.sqrt(jnp.sum(out * out, axis=1, keepdims=True) + 1e-16)
            out = out / (norm + 1e-8)
            out = out * v1[:, None]
        return SparseTensor(c1, out, v1, x.stride)


def ResUNetBN2(**kw):
    """Zoo alias (fcgf.py:854-856): TR_CHANNELS [_, 32, 64, 64, 128]."""
    kw.setdefault("tr_channels", (0, 32, 64, 64, 128))
    return ResUNetBN2C(**kw)


def ResUNetBN2B(**kw):
    """Zoo alias (fcgf.py:858-861): TR_CHANNELS [_, 64, 64, 64, 64]."""
    kw.setdefault("tr_channels", (0, 64, 64, 64, 64))
    return ResUNetBN2C(**kw)


def ResUNetBN2D(**kw):
    """Zoo alias (fcgf.py:874-877): TR [_, 64, 64, 128, 128]."""
    kw.setdefault("tr_channels", (0, 64, 64, 128, 128))
    return ResUNetBN2C(**kw)


def ResUNetBN2E(**kw):
    """Zoo alias (fcgf.py:880-883): CH [_, 128, 128, 128, 256],
    TR [_, 64, 128, 128, 128]."""
    kw.setdefault("channels", (0, 128, 128, 128, 256))
    kw.setdefault("tr_channels", (0, 64, 128, 128, 128))
    return ResUNetBN2C(**kw)


def ResUNetBN2F(**kw):
    """Zoo alias (fcgf.py:886-889): CH [_, 16, 32, 64, 128],
    TR [_, 16, 32, 64, 128]."""
    kw.setdefault("channels", (0, 16, 32, 64, 128))
    kw.setdefault("tr_channels", (0, 16, 32, 64, 128))
    return ResUNetBN2C(**kw)


# name registry (DGR/model/__init__.py:12-38 load_model equivalent).
# Covers the full ResUNet2/BN family (fcgf.py:854-894) minus the
# HYPER_CROSS-region ...X variants and the IN/SP/v2 families — none are
# instantiated anywhere in the reference benchmark (cal_fcgf.py:8 and
# LidarFeatureExtractor.py:5 import ResUNetBN2C only).
MODEL_REGISTRY = {
    "ResUNetBN2": ResUNetBN2,
    "ResUNetBN2B": ResUNetBN2B,
    "ResUNetBN2C": ResUNetBN2C,
    "ResUNetBN2D": ResUNetBN2D,
    "ResUNetBN2E": ResUNetBN2E,
    "ResUNetBN2F": ResUNetBN2F,
}


def load_model(name: str):
    """Model-name lookup (DGR/model/__init__.py:12-38)."""
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name}; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]
