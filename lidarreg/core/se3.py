"""SE(3) rigid-motion utilities (batched, jit-friendly).

TPU-native re-design of the reference's SE(3) helpers
(reference: Experiments/utils/SE3.py:43-113 — transform / decompose_trans /
integrate_trans / concatenate). Everything here broadcasts over arbitrary
leading batch dimensions and contains no Python control flow on traced values,
so it can live inside `jit`/`vmap`/`shard_map` regions.
"""
from __future__ import annotations

import jax.numpy as jnp


def transform(pts: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Apply SE(3) transform(s): ``R @ p + t``.

    pts:   [..., N, 3]
    trans: [..., 4, 4] (leading dims broadcast against pts')
    returns [..., N, 3]

    Reference semantics: Experiments/utils/SE3.py:43-57.
    """
    R = trans[..., :3, :3]
    t = trans[..., :3, 3]
    return jnp.einsum("...ij,...nj->...ni", R, pts, precision="highest") + t[..., None, :]


def decompose(trans: jnp.ndarray):
    """Split [..., 4, 4] into R [..., 3, 3] and t [..., 3]."""
    return trans[..., :3, :3], trans[..., :3, 3]


def integrate(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Build [..., 4, 4] from R [..., 3, 3] and t [..., 3].

    Reference semantics: Experiments/utils/SE3.py:73-96.
    """
    batch = jnp.broadcast_shapes(R.shape[:-2], t.shape[:-1])
    R = jnp.broadcast_to(R, batch + (3, 3))
    t = jnp.broadcast_to(t, batch + (3,))
    top = jnp.concatenate([R, t[..., :, None]], axis=-1)  # [..., 3, 4]
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=R.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def concatenate(trans1: jnp.ndarray, trans2: jnp.ndarray) -> jnp.ndarray:
    """Compose two SE(3) transforms: result = trans1 ∘ trans2 (matrix product).

    Reference semantics: Experiments/utils/SE3.py:98-112.
    """
    return jnp.matmul(trans1, trans2, precision="highest")


def inverse(trans: jnp.ndarray) -> jnp.ndarray:
    """Invert an SE(3) transform without a general 4x4 solve."""
    R, t = decompose(trans)
    Rt = jnp.swapaxes(R, -1, -2)
    return integrate(Rt, -jnp.einsum("...ij,...j->...i", Rt, t, precision="highest"))


def euler_to_rotation(angles: jnp.ndarray, order: str = "xyz") -> jnp.ndarray:
    """Rotation matrix from Euler angles [..., 3] (radians), R = Rx @ Ry @ Rz.

    Matches the reference's sampling convention
    (Experiments/models/common.py:17-30: ``R = Rx @ Ry @ Rz``) and the
    almost-planar augmentation (Experiments/dataloader/transforms.py:59-91).
    """
    ax, ay, az = angles[..., 0], angles[..., 1], angles[..., 2]
    cx, sx = jnp.cos(ax), jnp.sin(ax)
    cy, sy = jnp.cos(ay), jnp.sin(ay)
    cz, sz = jnp.cos(az), jnp.sin(az)
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)

    Rx = jnp.stack(
        [
            jnp.stack([one, zero, zero], -1),
            jnp.stack([zero, cx, -sx], -1),
            jnp.stack([zero, sx, cx], -1),
        ],
        -2,
    )
    Ry = jnp.stack(
        [
            jnp.stack([cy, zero, sy], -1),
            jnp.stack([zero, one, zero], -1),
            jnp.stack([-sy, zero, cy], -1),
        ],
        -2,
    )
    Rz = jnp.stack(
        [
            jnp.stack([cz, -sz, zero], -1),
            jnp.stack([sz, cz, zero], -1),
            jnp.stack([zero, zero, one], -1),
        ],
        -2,
    )
    mm = lambda a, b: jnp.matmul(a, b, precision="highest")  # noqa: E731
    if order == "xyz":
        return mm(Rx, mm(Ry, Rz))
    if order == "zyx":
        return mm(Rz, mm(Ry, Rx))
    raise ValueError(f"unsupported euler order: {order}")


def rotation_to_euler(R: jnp.ndarray) -> jnp.ndarray:
    """Euler angles (radians) for R = Rx(ax) @ Ry(ay) @ Rz(az).

    Inverse of :func:`euler_to_rotation` (order='xyz'); mirrors the
    decomposition used to describe balanced-set motions
    (BalancedDatasetGenerator/utils/tools_3d.py Euler conversions).
    """
    # R = Rx @ Ry @ Rz =>
    # R[0,2] = sin(ay); R[0,1] = -cos(ay) sin(az); R[0,0] = cos(ay) cos(az)
    # R[1,2] = -sin(ax) cos(ay); R[2,2] = cos(ax) cos(ay)
    ay = jnp.arcsin(jnp.clip(R[..., 0, 2], -1.0, 1.0))
    ax = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    az = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    return jnp.stack([ax, ay, az], axis=-1)


def quat_to_rotation(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        -2,
    )
