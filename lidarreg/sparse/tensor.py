"""Fixed-capacity sparse voxel tensor + stride-coordinate ops.

The TPU replacement for ME.SparseTensor: static shapes everywhere —
[V, 3] int coords (ME convention: coords at tensor-stride s are multiples of
s), [V, C] features, [V] validity mask, plus the python-static stride.
"""
from __future__ import annotations

import flax.struct
import jax.numpy as jnp


@flax.struct.dataclass
class SparseTensor:
    coords: jnp.ndarray  # [V, D] int32 (D=3 clouds, D=6 DGR pairs), x `stride`
    feats: jnp.ndarray   # [V, C] float
    valid: jnp.ndarray   # [V] bool
    # static metadata: kernel-offset sizes and downsample factors derive from
    # it in python, so it must not become a traced leaf at jit boundaries
    stride: int = flax.struct.field(pytree_node=False, default=1)

    @property
    def capacity(self) -> int:
        return self.coords.shape[0]

    @property
    def num_channels(self) -> int:
        return self.feats.shape[-1]


def downsample_coords(
    coords: jnp.ndarray, valid: jnp.ndarray, in_stride: int, out_capacity: int
):
    """Output coordinate set of a stride-2 sparse conv.

    ME semantics: out coords = unique(floor(c / (2*s)) * (2*s)) over valid
    input coords. Deterministic (lexicographic-unique, like ops.voxelize).
    Returns (out_coords [Vo, 3], out_valid [Vo]).
    """
    s2 = in_stride * 2
    q = jnp.where(valid[:, None], (coords // s2) * s2, jnp.int32(2**31 - 1))
    n = q.shape[0]
    # one fused multi-key sort (x-major lexicographic); sorted columns come
    # out directly — no order gather. ~10x cheaper than jnp.lexsort's
    # chained per-key passes on v5e (scripts/pallas_gather_probe.py).
    import jax

    d = q.shape[1]
    cols = jax.lax.sort([q[:, k] for k in range(d)], num_keys=d)
    qs = jnp.stack(cols, axis=1)
    diff = jnp.any(qs[1:] != qs[:-1], axis=1)
    newrun = jnp.concatenate([jnp.ones((1,), bool), diff])
    real = qs[:, 0] != jnp.int32(2**31 - 1)
    newrun = newrun & real
    slot = jnp.cumsum(newrun.astype(jnp.int32)) - 1
    count = jnp.sum(newrun.astype(jnp.int32))
    out = jnp.zeros((out_capacity, coords.shape[1]), jnp.int32)
    write = jnp.where(newrun, slot, out_capacity)
    out = out.at[write].set(qs, mode="drop")
    out_valid = jnp.arange(out_capacity) < jnp.minimum(count, out_capacity)
    return out, out_valid


def downsample_pyramid(
    coords: jnp.ndarray,
    valid: jnp.ndarray,
    in_stride: int,
    out_capacities: list[int],
):
    """All stride-2^k coordinate sets of a U-Net in ONE fused batched sort.

    `unique(floor(c / q) * q)` composes across levels — deduping level k's
    deduped set at 2q equals deduping the LEVEL-0 set at 2q directly — so
    every level derives from `coords` and the L per-level sort+dedup passes
    (3 serialized `downsample_coords` calls in the FCGF forward, ~34 ms of
    the 146 ms forward on v5e; BASELINE.md roofline) fuse into one [L, V]
    multi-key `lax.sort` + one scatter. Semantics match chained
    `downsample_coords` calls exactly while no intermediate level overflows
    its capacity (on overflow the chained form truncates the INPUT of the
    next level; this form never truncates inputs — strictly more faithful
    to ME, which has no capacity notion).

    Returns [(coords_k [cap_k, D], valid_k [cap_k])] for k = 1..L.
    """
    import jax

    n, d = coords.shape
    L = len(out_capacities)
    sent = jnp.int32(2**31 - 1)
    qs = []
    for k in range(1, L + 1):
        q = in_stride * (1 << k)
        qs.append(
            jnp.where(valid[:, None], (coords // q) * q, sent)
        )
    q_all = jnp.stack(qs)                                  # [L, V, D]
    cols = jax.lax.sort(
        [q_all[:, :, k] for k in range(d)], num_keys=d, dimension=-1
    )
    qs_sorted = jnp.stack(cols, axis=-1)                   # [L, V, D]
    diff = jnp.any(qs_sorted[:, 1:] != qs_sorted[:, :-1], axis=-1)
    newrun = jnp.concatenate([jnp.ones((L, 1), bool), diff], axis=1)
    newrun = newrun & (qs_sorted[:, :, 0] != sent)
    slot = jnp.cumsum(newrun.astype(jnp.int32), axis=1) - 1
    counts = jnp.sum(newrun.astype(jnp.int32), axis=1)     # [L]
    cap_m = max(out_capacities)
    # slot can reach V-1 on overflow; keep each level inside its padded row
    # so level i never bleeds into level i+1's region of the flat buffer
    ok = newrun & (slot < cap_m)
    write = jnp.where(ok, jnp.arange(L)[:, None] * cap_m + slot, L * cap_m)
    flat = jnp.zeros((L * cap_m, d), jnp.int32).at[write.ravel()].set(
        qs_sorted.reshape(-1, d), mode="drop"
    ).reshape(L, cap_m, d)
    out = []
    for i, cap_k in enumerate(out_capacities):
        vk = jnp.arange(cap_k) < jnp.minimum(counts[i], cap_k)
        out.append((flat[i, :cap_k], vk))
    return out


def kernel_offsets(kernel_size: int, stride_units: int, dim: int = 3) -> jnp.ndarray:
    """All K^dim offsets of a hypercubic kernel in coordinate units.

    ME HYPER_CUBE region: offsets in {-(k//2)..k//2} * stride_units per axis
    (dim=6 serves DGR's 6-D inlier ConvNet). Returns [K^dim, dim] int32;
    weights are indexed consistently by this same enumeration.
    """
    r = kernel_size // 2
    axis = jnp.arange(-r, kernel_size - r, dtype=jnp.int32) * stride_units
    grids = jnp.meshgrid(*([axis] * dim), indexing="ij")
    return jnp.stack([g.ravel() for g in grids], axis=1)
