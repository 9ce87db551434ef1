"""Host-side augmentations (numpy; applied before device transfer).

Parity targets:
  * almost-planar random rotation, max angles [5, 5, 180] degrees with
    random signs, R = Rz @ Ry @ Rx —
    Experiments/dataloader/transforms.py:59-91 and
    FCGF_FAST/dataloader/generic_balanced_loader.py:37-53;
  * feature jitter (p=0.95, sigma=0.01) — transforms.py:36-46;
  * keypoint jitter + PointDSC train-time augmentation (axis/rotation/
    translation) — Experiments/datasets/LidarFeatureExtractor.py:83-93 with
    Experiments/models/common.py:5-41.
"""
from __future__ import annotations

import numpy as np


def euler_deg_to_rotation(theta_deg: np.ndarray) -> np.ndarray:
    """R = Rz @ Ry @ Rx from degrees (transforms.py:63-79 convention)."""
    t = np.radians(np.asarray(theta_deg, dtype=np.float64))
    cx, sx = np.cos(t[0]), np.sin(t[0])
    cy, sy = np.cos(t[1]), np.sin(t[1])
    cz, sz = np.cos(t[2]), np.sin(t[2])
    Rx = np.array([[1, 0, 0], [0, cx, -sx], [0, sx, cx]])
    Ry = np.array([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]])
    Rz = np.array([[cz, -sz, 0], [sz, cz, 0], [0, 0, 1]])
    return Rz @ Ry @ Rx


def sample_almost_planar_rotation(
    rng: np.random.Generator,
    max_angles_deg=(5.0, 5.0, 180.0),
) -> np.ndarray:
    """4x4 rotation-only motion: small roll/pitch, unrestricted yaw.

    NOTE (parity): the reference builds the motion with `np.zeros([4,4])` +
    `M[3,3]=1` + rotation block (transforms.py:77-81) — translation zero.
    """
    angles = (
        rng.random(3) * np.asarray(max_angles_deg) * np.sign(rng.standard_normal(3))
    )
    M = np.eye(4)
    M[:3, :3] = euler_deg_to_rotation(angles)
    return M


def rotation_augment_pair(
    rng: np.random.Generator,
    T: np.ndarray,
    cloud_a: np.ndarray,
    cloud_b: np.ndarray,
    max_angles_deg=(5.0, 5.0, 180.0),
):
    """Per-cloud almost-planar rotation augmentation for pair training.

    Each cloud gets its own random rotation M0/M1 and the GT motion is
    composed as T' = M1 @ T @ M0^{-1} so that T' still maps the augmented
    source onto the augmented target — the reference's
    `trans = T1 @ M2 @ inv(T0)` protocol
    (Experiments/dataloader/generic_balanced_loader.py:32-98;
    FCGF_FAST/dataloader/generic_balanced_loader.py:37-53 applies the same
    [5, 5, 180]-degree rotation in FCGF training). Training WITHOUT this is
    what made the round-4 encoder collapse above ~45 degrees of yaw
    (BASELINE.md round-5 N=200 matrix: recall 100% below 15 deg yaw, 0%
    above 45 deg).
    """
    M0 = sample_almost_planar_rotation(rng, max_angles_deg)
    M1 = sample_almost_planar_rotation(rng, max_angles_deg)
    a = cloud_a @ M0[:3, :3].T
    b = cloud_b @ M1[:3, :3].T
    # rotation-only 4x4: inverse is the transpose
    M0_inv = np.eye(4)
    M0_inv[:3, :3] = M0[:3, :3].T
    T_new = M1 @ np.asarray(T, np.float64) @ M0_inv
    return T_new, a.astype(cloud_a.dtype), b.astype(cloud_b.dtype)


def yaw_rotation_4x4(yaw_deg: float) -> np.ndarray:
    """Deterministic pure-yaw motion (validation-time rotation probes)."""
    M = np.eye(4)
    M[:3, :3] = euler_deg_to_rotation(np.array([0.0, 0.0, yaw_deg]))
    return M


def random_rotation_matrix(
    rng: np.random.Generator, num_axis: int, augment_rotation: float
) -> np.ndarray:
    """PointDSC train-time rotation (Experiments/models/common.py:5-30)."""
    if num_axis == 0:
        return np.eye(3)
    angles = rng.random(3) * 2 * np.pi * augment_rotation
    c, s = np.cos(angles), np.sin(angles)
    Rx = np.array([[1, 0, 0], [0, c[0], -s[0]], [0, s[0], c[0]]])
    Ry = np.array([[c[1], 0, s[1]], [0, 1, 0], [-s[1], 0, c[1]]])
    Rz = np.array([[c[2], -s[2], 0], [s[2], c[2], 0], [0, 0, 1]])
    if num_axis == 1:
        return [Rx, Ry, Rz][rng.integers(3)]
    return Rx @ Ry @ Rz


def random_scale(rng: np.random.Generator, lo: float = 0.8, hi: float = 1.2):
    return lo + rng.random() * (hi - lo)


def jitter_features(
    rng: np.random.Generator, feats: np.ndarray, sigma: float = 0.01,
    prob: float = 0.95,
) -> np.ndarray:
    if rng.random() < prob:
        return feats + sigma * rng.standard_normal(feats.shape).astype(
            feats.dtype
        )
    return feats
