"""Dataset adapters: balanced-set pair access for each LiDAR dataset.

Public interface parity: `get_pair(ind) -> (T_gt 4x4, cloud_A, cloud_B)` +
a `pairs` table (Experiments/dataloader/balanced/ApolloSouthbay.py:137-160).

Raw point clouds load from an on-disk root (`LIDARREG_DATA`), with the
reference's `<session>_<frame>.npy` cache convention
(balanced/ApolloSouthbay.py:107-158). Raw .pcd decoding (Open3D) is not
reimplemented — Apollo/NuScenes raw archives ship their own converters; the
npy cache and KITTI .bin formats are supported natively. When the raw data
is absent the adapters raise at `get_pair`, while the pair tables (motions,
sessions) remain fully usable — they come from the published text files.

`SyntheticBalancedDataset` generates deterministic LiDAR-like scene pairs
driven by the *real* published motions, so the full benchmark harness runs
end-to-end (and on CI/TPU pools) without the multi-hundred-GB raw archives.
"""
from __future__ import annotations

import os
import zlib
from typing import Tuple

import numpy as np

from .balanced import (
    BalancedPairs,
    balanced_set_path,
    default_balanced_root,
    read_balanced_set,
    resolve_dataset_name,
)

# Session name tables mirror the reference adapters
# (Experiments/dataloader/balanced/*.py); sessions index into these.
APOLLO_TEST_SESSIONS = [
    "HighWay237/2018-10-12/",
    "SunnyvaleBigloop/Borregas/2018-10-04/",
    "MathildaAVE/2018-10-04/",
    "SanJoseDowntown/2018-10-11/2/",
    "BaylandsToSeafood/2018-10-05/",
    "ColumbiaPark/2018-10-03/4/",
]


def data_root() -> str:
    return os.environ.get("LIDARREG_DATA", "/data/lidarreg")


class BalancedDataset:
    """Base: pairs from the published balanced sets + npy point-cloud cache."""

    name: str = ""

    def __init__(self, phase: str = "test", root: str | None = None,
                 balanced_root: str | None = None):
        self.phase = phase
        self.root = root or os.path.join(data_root(), self.name)
        path = balanced_set_path(
            balanced_root or default_balanced_root(), self.name, phase
        )
        self.pairs: BalancedPairs = read_balanced_set(path)

    def __len__(self):
        return len(self.pairs)

    def _cache_path(self, session_ind: int, frame_ind: int) -> str:
        return os.path.join(
            self.root, "npy_cache", f"{session_ind}_{frame_ind}.npy"
        )

    def load_cloud(self, session_ind: int, frame_ind: int) -> np.ndarray:
        cache = self._cache_path(session_ind, frame_ind)
        if os.path.exists(cache):
            return np.load(cache)
        return self._load_raw(session_ind, frame_ind)

    def _load_raw(self, session_ind: int, frame_ind: int) -> np.ndarray:
        raise FileNotFoundError(
            f"{self.name}: no npy cache at {self._cache_path(session_ind, frame_ind)} "
            f"and no raw loader for this dataset build; set LIDARREG_DATA or "
            f"populate the cache (reference convention: "
            f"balanced/ApolloSouthbay.py:107-158)"
        )

    def get_pair(self, ind: int) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        p = self.pairs
        mot = p.motions[ind]
        a = self.load_cloud(int(p.session_ind[ind]), int(p.src_ind[ind]))
        b = self.load_cloud(int(p.session_ind[ind]), int(p.tgt_ind[ind]))
        return mot, a, b


class _FullBackedDataset(BalancedDataset):
    """Balanced set whose raw fallback goes through a full raw adapter
    (data/raw.py) when the archive is mounted under `self.root`."""

    _full_name: str = ""
    _full_phase: str = "test"

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self._full = None

    def _full_adapter(self):
        if self._full is None:
            from .raw import make_full_dataset
            self._full = make_full_dataset(
                self._full_name or self.name, self._full_phase, self.root
            )
        return self._full

    def _load_raw(self, session_ind: int, frame_ind: int) -> np.ndarray:
        try:
            return self._full_adapter().load_PC(session_ind, frame_ind)
        except (FileNotFoundError, OSError, KeyError, AssertionError):
            return super()._load_raw(session_ind, frame_ind)


class ApolloSouthbay(_FullBackedDataset):
    name = "ApolloSouthbay"


class KITTI10m(BalancedDataset):
    name = "KITTI_10m"

    def _load_raw(self, session_ind: int, frame_ind: int) -> np.ndarray:
        # KITTI odometry velodyne .bin: float32 x,y,z,reflectance
        # (Experiments/dataloader/kitti_loader.py:138)
        path = os.path.join(
            self.root, "sequences", f"{session_ind:02d}", "velodyne",
            f"{frame_ind:06d}.bin",
        )
        if not os.path.exists(path):
            return super()._load_raw(session_ind, frame_ind)
        from .raw import read_velodyne_bin
        return read_velodyne_bin(path)


class NuScenesBoston(_FullBackedDataset):
    name = "NuScenes_boston"
    _full_name = "NuScenes_boston"


class NuScenesSingapore(_FullBackedDataset):
    name = "NuScenes_singapore"
    _full_name = "NuScenes_singapore"


class LyftLEVEL5(_FullBackedDataset):
    name = "LyftLEVEL5"


def _wave_displacement(
    rng: np.random.Generator,
    pts: np.ndarray,
    n_waves: int,
    wl_lo: float,
    wl_hi: float,
    sigma: float,
) -> np.ndarray:
    """Smooth random vector field: sum of plane waves, std ~ `sigma` m.

    Unique per scene seed; wavelengths in [wl_lo, wl_hi] m so the induced
    curvature is visible inside a U-Net receptive field but the global
    shape is preserved.
    """
    wl = rng.uniform(wl_lo, wl_hi, n_waves)
    kdir = rng.normal(size=(n_waves, 3))
    kdir /= np.linalg.norm(kdir, axis=1, keepdims=True)
    kvec = (2 * np.pi / wl)[:, None] * kdir
    phase = rng.uniform(0, 2 * np.pi, n_waves)
    adir = rng.normal(size=(n_waves, 3))
    adir /= np.linalg.norm(adir, axis=1, keepdims=True)
    # per-wave amplitude ~ wavelength (red spectrum); normalized to sigma
    amp = wl / np.sqrt((wl**2).sum() / 2.0) * sigma
    ph = pts @ kvec.T + phase[None, :]          # [n, K]
    return (np.cos(ph) * amp[None, :]) @ adir   # [n, 3]


def synthesize_lidar_scene(rng: np.random.Generator, n: int) -> np.ndarray:
    """Deterministic LiDAR-like urban scene with DISTINCTIVE local geometry.

    Ground plane + a mix of structures whose local neighborhoods differ
    from one another — L-corner wall junctions, cylinders (poles/trunks),
    box surfaces (parked cars), and plain wall segments — then two layers
    of geometric TEXTURE that make every local patch globally unique:

      * ground micro-relief (short-wavelength height field, sigma 0.12 m):
        a flat plane is locally identical everywhere, so 45% of points
        would otherwise be fundamentally unmatchable;
      * a smooth random warp of the WHOLE scene (wavelengths 2-9 m,
        sigma 0.15 m): repeated primitives (every pole looks like every
        other pole) are perfect aliases for metric learning — the warp
        gives each instance a unique second-order shape.

    Round-3 matchability finding (BASELINE.md): without texture the
    hardest-contrastive optimum is DEGENERATE — feature effective rank
    collapses to ~3 and NN matchability falls below the random-init
    architecture prior; the loss plateaus at ~0.885 regardless of
    training length. Texture makes descriptor learning well-posed.
    """
    n_ground = int(n * 0.45)
    ground = np.c_[
        rng.uniform(-70, 70, (n_ground, 2)),
        rng.normal(0, 0.04, (n_ground, 1)),
    ]
    parts = [ground]
    budget = n - n_ground

    def wall(c, yaw, length, height, m):
        u = np.array([np.cos(yaw), np.sin(yaw)])
        t = rng.uniform(-length / 2, length / 2, m)
        xy = c + t[:, None] * u + rng.normal(0, 0.08, (m, 2))
        return np.c_[xy, rng.uniform(0, height, m)]

    n_corner, n_pole, n_box, n_wall = 10, 18, 10, 14
    per = budget // (n_corner * 2 + n_pole // 2 + n_box + n_wall)
    for _ in range(n_corner):
        c = rng.uniform(-60, 60, 2)
        yaw = rng.uniform(0, np.pi)
        h = rng.uniform(3, 9)
        # two walls meeting at c with a near-right angle: the junction line
        # is a locally unique feature
        parts.append(wall(c + np.array([np.cos(yaw), np.sin(yaw)])
                          * rng.uniform(1.5, 5), yaw, rng.uniform(3, 10),
                          h, per))
        yaw2 = yaw + np.pi / 2 + rng.uniform(-0.2, 0.2)
        parts.append(wall(c + np.array([np.cos(yaw2), np.sin(yaw2)])
                          * rng.uniform(1.5, 5), yaw2, rng.uniform(3, 10),
                          h, per))
    for _ in range(n_pole):
        c = rng.uniform(-60, 60, 2)
        r = rng.uniform(0.12, 0.45)
        h = rng.uniform(3, 9)
        m = per // 2
        th = rng.uniform(0, 2 * np.pi, m)
        parts.append(np.c_[
            c[0] + r * np.cos(th) + rng.normal(0, 0.02, m),
            c[1] + r * np.sin(th) + rng.normal(0, 0.02, m),
            rng.uniform(0, h, m),
        ])
    for _ in range(n_box):
        c = rng.uniform(-55, 55, 2)
        yaw = rng.uniform(0, np.pi)
        L, W, H = rng.uniform(3.8, 5.2), rng.uniform(1.6, 2.0), \
            rng.uniform(1.4, 1.8)
        u = np.array([np.cos(yaw), np.sin(yaw)])
        v = np.array([-u[1], u[0]])
        m = per
        # sample the 4 side faces + roof by area
        areas = np.array([L * H, L * H, W * H, W * H, L * W])
        face = rng.choice(5, m, p=areas / areas.sum())
        a = rng.uniform(-0.5, 0.5, m)
        b = rng.uniform(0, 1, m)
        xy = np.empty((m, 2))
        z = np.empty(m)
        side = face < 4
        sgn = np.where(face % 2 == 0, 1.0, -1.0)
        along = np.where(face < 2, L, W)
        across = np.where(face < 2, W, L)
        dir_a = np.where(face[:, None] < 2, u[None], v[None])
        dir_n = np.where(face[:, None] < 2, v[None], u[None])
        xy = c + a[:, None] * along[:, None] * dir_a \
            + 0.5 * sgn[:, None] * across[:, None] * dir_n
        z = np.where(side, b * H, H)
        roof = face == 4
        xy[roof] = (c + a[roof, None] * L * u[None]
                    + (b[roof, None] - 0.5) * W * v[None])
        parts.append(np.c_[xy + rng.normal(0, 0.03, (m, 2)), z])
    for _ in range(n_wall):
        parts.append(wall(rng.uniform(-60, 60, 2), rng.uniform(0, np.pi),
                          rng.uniform(2, 15), rng.uniform(2, 10), per))
    pts = np.vstack(parts)
    if pts.shape[0] < n:
        extra = rng.uniform(-70, 70, (n - pts.shape[0], 2))
        pts = np.vstack([pts, np.c_[extra, rng.normal(0, 0.04,
                                                      (n - pts.shape[0], 1))]])
    pts = pts[:n]

    # ground micro-relief: z += height field(x, y) for near-ground points
    # (only the z component is used: sigma 0.21 total -> ~0.12 m in z)
    relief = _wave_displacement(
        rng, np.c_[pts[:, :2], np.zeros(len(pts))], 16, 0.8, 3.0, 0.21
    )[:, 2]
    near_ground = pts[:, 2] < 0.5
    pts[:, 2] += relief * near_ground

    # smooth whole-scene warp: unique local shape for repeated primitives
    pts = pts + _wave_displacement(rng, pts, 24, 2.0, 9.0, 0.15)
    return pts.astype(np.float32)


class SyntheticBalancedDataset:
    """Deterministic LiDAR-like scenes moved by REAL published motions.

    Scene = ground plane + distinctive structures (synthesize_lidar_scene),
    hashed per (dataset, session, frame) so repeated loads are identical.
    The motion applied between the pair is the published balanced-set
    motion, so error statistics (RE/TE distributions, recall) exercise the
    true benchmark motion distribution.
    """

    def __init__(self, base: str = "ApolloSouthbay", phase: str = "test",
                 n_points: int = 120_000, noise: float = 0.02,
                 overlap_crop: bool = True,
                 balanced_root: str | None = None):
        self.name = f"Synthetic[{resolve_dataset_name(base)}]"
        path = balanced_set_path(
            balanced_root or default_balanced_root(), base, phase
        )
        self.pairs = read_balanced_set(path)
        self.n_points = n_points
        self.noise = noise
        self.overlap_crop = overlap_crop

    def __len__(self):
        return len(self.pairs)

    def _scene(self, seed: int) -> np.ndarray:
        return synthesize_lidar_scene(np.random.default_rng(seed),
                                      self.n_points)

    def get_pair(self, ind: int):
        p = self.pairs
        mot = p.motions[ind]
        # stable across processes/ranks (hash() of str is randomized per
        # process via PYTHONHASHSEED and would break run reproducibility)
        seed = zlib.crc32(
            f"{self.name}:{int(p.session_ind[ind])}:{int(p.src_ind[ind])}"
            .encode()
        ) % 2**31
        world = self._scene(seed)
        rng = np.random.default_rng(seed ^ 0x5EED)

        # cloud B observes the world; cloud A = world seen from a sensor
        # displaced by mot (so that transform(A, mot) ~ B, reference GT
        # convention at Experiments/test.py:191 / matching.py:241-249).
        inv = np.linalg.inv(mot)
        cloud_a = (world @ inv[:3, :3].T + inv[:3, 3]).astype(np.float32)
        cloud_b = world.copy()
        if self.overlap_crop:
            # keep each cloud to a sensor-like range disc -> partial overlap
            ra = np.linalg.norm(cloud_a[:, :2], axis=1) < 70.0
            rb = np.linalg.norm(cloud_b[:, :2], axis=1) < 70.0
            cloud_a = cloud_a[ra]
            cloud_b = cloud_b[rb]
        cloud_a = cloud_a + rng.normal(0, self.noise, cloud_a.shape).astype(np.float32)
        cloud_b = cloud_b + rng.normal(0, self.noise, cloud_b.shape).astype(np.float32)
        return mot, cloud_a, cloud_b


_REAL = {
    "ApolloSouthbay": ApolloSouthbay,
    "KITTI_10m": KITTI10m,
    "NuScenes_boston": NuScenesBoston,
    "NuScenes_singapore": NuScenesSingapore,
    "LyftLEVEL5": LyftLEVEL5,
}


def make_dataset(name: str, phase: str = "test", synthetic: bool = False, **kw):
    """Dataset factory; accepts nicknames K/A/B/S/L (data_loaders.py:28-62)."""
    full = resolve_dataset_name(name)
    if synthetic:
        return SyntheticBalancedDataset(base=full, phase=phase, **kw)
    return _REAL[full](phase=phase, **kw)
