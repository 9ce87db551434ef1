"""Point-cloud subsampling toolbox.

Rebuild of FCGF_FAST/utils/subsampling.py (the reference's grab-bag of
samplers): voxel-grid pick (sparse_quantize_torch :14-49 — see ops.voxelize,
which is the deterministic equivalent), voxel-grid filter (:124-198 — see
ops.voxelize.voxel_down_sample), farthest-point sampling variants
(:214-342), radius-normalized density sampling (:343-486), and road/ground
removal (:625-886). All static-shape and jittable.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


@partial(jax.jit, static_argnums=(2,))
def farthest_point_sampling(
    pts: jnp.ndarray, valid: jnp.ndarray, n_samples: int, key=None
) -> jnp.ndarray:
    """Classic FPS: iteratively pick the point farthest from the chosen set.

    Returns [n_samples] int32 indices. Deterministic first pick (the first
    valid point) unless a PRNG key is given. O(n_samples * N) — the
    reference's torch implementation has the same structure
    (subsampling.py:214-342).
    """
    n = pts.shape[0]
    big = jnp.float32(1e30)
    start = jnp.argmax(valid) if key is None else jnp.argmax(
        valid.astype(jnp.float32)
        * jax.random.uniform(key, (n,), minval=0.5, maxval=1.0)
    )
    d0 = jnp.where(valid, big, -big)

    def body(carry, _):
        mind, last = carry
        d = jnp.sum((pts - pts[last]) ** 2, axis=1)
        mind = jnp.minimum(mind, jnp.where(valid, d, -big))
        nxt = jnp.argmax(mind)
        return (mind, nxt), last

    (_, _), picks = lax.scan(
        body, (d0, start.astype(jnp.int32)), None, length=n_samples
    )
    return picks.astype(jnp.int32)


@partial(jax.jit, static_argnums=(2,))
def radius_normalized_sampling(
    pts: jnp.ndarray, valid: jnp.ndarray, n_samples: int, key=None,
    alpha: float = 1.0,
):
    """Sample with probability ~ range^alpha, flattening LiDAR's near-field
    density bias (subsampling.py:343-486 'radius normalized' family).

    Returns [n_samples] int32 indices (without replacement while supply
    lasts, via weighted Gumbel top-k).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    r = jnp.linalg.norm(pts[:, :2], axis=1)
    logw = alpha * jnp.log(jnp.maximum(r, 1e-3))
    g = logw + jax.random.gumbel(key, r.shape)
    g = jnp.where(valid, g, -jnp.inf)
    _, idx = lax.top_k(g, n_samples)
    return idx.astype(jnp.int32)


@partial(jax.jit, static_argnums=())
def estimate_ground_plane(
    pts: jnp.ndarray, valid: jnp.ndarray, iters: int = 10,
    inlier_dist: float = 0.2,
):
    """Robust ground plane z = a x + b y + c by IRLS on low-z seed points.

    Backbone of the road-removal utility (subsampling.py:625-886, which
    fits/peels the ground before feature extraction).
    Returns (normal [3], d) of plane n.p + d = 0 with |n| = 1.
    """
    z = pts[:, 2]
    zmin = jnp.min(jnp.where(valid, z, 1e30))
    seed = valid & (z < zmin + 1.0)
    w0 = seed.astype(jnp.float32)

    def solve(w):
        A = jnp.concatenate([pts[:, :2], jnp.ones((pts.shape[0], 1))], axis=1)
        AtA = jnp.einsum("ni,n,nj->ij", A, w, A) + 1e-6 * jnp.eye(3)
        Atz = jnp.einsum("ni,n->i", A, w * z)
        return jnp.linalg.solve(AtA, Atz)  # [a, b, c]

    def body(_, w):
        abc = solve(w)
        resid = z - (pts[:, 0] * abc[0] + pts[:, 1] * abc[1] + abc[2])
        return (jnp.abs(resid) < inlier_dist).astype(jnp.float32) * valid

    w = lax.fori_loop(0, iters, body, w0)
    abc = solve(w)
    n = jnp.array([-abc[0], -abc[1], 1.0])
    n = n / jnp.linalg.norm(n)
    d = -abc[2] * n[2]
    return n, d


def remove_road(pts: jnp.ndarray, valid: jnp.ndarray,
                height_thresh: float = 0.3):
    """Mask out ground points (road removal, subsampling.py:625-886).

    Returns the validity mask with ground points cleared.
    """
    n, d = estimate_ground_plane(pts, valid)
    h = jnp.einsum("nj,j->n", pts, n, precision="highest") + d
    return valid & (h > height_thresh)
