"""Raw full-dataset adapters: KITTI odometry, Apollo-Southbay, NuScenes, Lyft.

Rebuilds the reference's full-dataset adapters
(BalancedDatasetGenerator/datasets/KITTI.py:15-129, ApolloSouthbay.py:15-189,
NuScenes.py:21-172, LyftLEVEL5.py:20-139) without pykitti / open3d /
nuscenes-devkit / lyft-sdk: the on-disk formats are decoded directly.

Adapter protocol (consumed by genset.BalancedSetGenerator and the loaders):
  name, phase, time_step, sessions_list, indexing_from(),
  session_count(), session_length(s), total_num_of_clouds(),
  load_PC(s, i) -> [N, 3] float, get_relative_motion(s, i, j) -> [4, 4].

`get_relative_motion(s, i, j)` returns the motion taking cloud i's frame
into cloud j's frame: inv(pose_j) @ pose_i (KITTI.py:103-107).

Format notes (all verified against the published readers):
  * KITTI odometry: `sequences/%02d/velodyne/%06d.bin` float32 x,y,z,refl;
    `sequences/%02d/calib.txt` (`Tr:` = T_cam0_velo 3x4); `poses/%02d.txt`
    12 floats/row (cam0 poses). Poses are conjugated into the velodyne
    frame: inv(Tr) @ pose @ Tr (KITTI.py:30-38 poses2velo).
  * Apollo: per-session `poses/gt_poses.txt` rows
    [index time tx ty tz qx qy qz qw] (ApolloSouthbay.py:113-124), clouds
    `pcds/%d.pcd` (PCD v0.7 ascii/binary), frame indexing starts at 1.
  * NuScenes / Lyft: the devkit JSON tables (`scene/sample/sample_data/
    ego_pose/calibrated_sensor/log .json`); the LIDAR_TOP chain is walked
    via sample_data `next` pointers (NuScenes.py:57-87); clouds are
    `.pcd.bin` float32 rows of 5 (x y z intensity ring), transformed from
    the sensor frame to the ego/car frame (NuScenes.py:103-120); pose =
    ego_pose (car -> world), quaternions stored (w, x, y, z).
"""
from __future__ import annotations

import glob
import json
import os
from typing import Dict, List, Sequence

import numpy as np

__all__ = [
    "read_velodyne_bin",
    "read_pcd",
    "read_nuscenes_bin",
    "quaternion_xyzw_to_matrix",
    "quaternion_wxyz_to_matrix",
    "KITTIOdometryFull",
    "ApolloSouthbayFull",
    "NuScenesFull",
    "LyftLEVEL5Full",
    "RawBalancedDataset",
    "make_full_dataset",
]


# --------------------------------------------------------------------------- #
# low-level format readers
# --------------------------------------------------------------------------- #

def read_velodyne_bin(path: str) -> np.ndarray:
    """KITTI velodyne scan: float32 (x, y, z, reflectance) rows -> [N, 3]
    (Experiments/dataloader/kitti_loader.py:138)."""
    pts = np.fromfile(path, dtype=np.float32).reshape(-1, 4)
    return pts[:, :3]


def read_nuscenes_bin(path: str, row_floats: int = 5) -> np.ndarray:
    """NuScenes/Lyft LIDAR_TOP blob: float32 rows of 5 (x y z intensity ring)
    -> [N, 3] (nuscenes LidarPointCloud.from_file semantics)."""
    raw = np.fromfile(path, dtype=np.float32)
    return raw.reshape(-1, row_floats)[:, :3]


_PCD_TYPES = {
    ("F", 4): np.float32, ("F", 8): np.float64,
    ("I", 1): np.int8, ("I", 2): np.int16, ("I", 4): np.int32,
    ("U", 1): np.uint8, ("U", 2): np.uint16, ("U", 4): np.uint32,
}


def read_pcd(path: str) -> np.ndarray:
    """Minimal PCD v0.7 reader (ascii + binary) -> [N, 3] float xyz.

    Covers the Apollo-Southbay `pcds/%d.pcd` files the reference reads with
    `o3d.io.read_point_cloud` (ApolloSouthbay.py:126-132). Fields other than
    x/y/z are parsed and dropped. binary_compressed is not supported (Apollo
    ships plain binary).
    """
    with open(path, "rb") as f:
        header: Dict[str, List[str]] = {}
        while True:
            line = f.readline().decode("ascii", errors="replace").strip()
            if not line or line.startswith("#"):
                continue
            key, *vals = line.split()
            header[key.upper()] = vals
            if key.upper() == "DATA":
                break
        fields = header["FIELDS"]
        sizes = [int(s) for s in header["SIZE"]]
        types = header["TYPE"]
        counts = [int(c) for c in header.get("COUNT", ["1"] * len(fields))]
        n = int(header["POINTS"][0])
        mode = header["DATA"][0].lower()

        if mode == "ascii":
            body = np.loadtxt(f, dtype=np.float64, max_rows=n)
            body = np.atleast_2d(body)
            cols = []
            c0 = 0
            for name, cnt in zip(fields, counts):
                if name in ("x", "y", "z"):
                    cols.append(body[:, c0])
                c0 += cnt
            return np.stack(cols, axis=1).astype(np.float64)

        if mode != "binary":
            raise ValueError(f"unsupported PCD DATA mode {mode!r} in {path}")
        dtype_fields = []
        for i, (name, cnt) in enumerate(zip(fields, counts)):
            base = _PCD_TYPES[(types[i], sizes[i])]
            for k in range(cnt):
                fname = name if cnt == 1 else f"{name}_{k}"
                # PCD allows duplicate padding fields named "_"
                if fname == "_" or fname in [d[0] for d in dtype_fields]:
                    fname = f"_pad{i}_{k}"
                dtype_fields.append((fname, base))
        rec = np.frombuffer(f.read(), dtype=np.dtype(dtype_fields), count=n)
        return np.stack(
            [rec["x"], rec["y"], rec["z"]], axis=1
        ).astype(np.float64)


# --------------------------------------------------------------------------- #
# quaternion -> rotation (reference conventions)
# --------------------------------------------------------------------------- #

def quaternion_xyzw_to_matrix(x: float, y: float, z: float, w: float) -> np.ndarray:
    """Apollo gt_poses quaternion (stored x,y,z,w) -> 3x3 rotation.

    The reference goes quaternion -> euler -> R_z @ R_y @ R_x
    (tools_3d.py:48-64 + :8-24); the direct q->R formula below is the exact
    same rotation (and avoids the asin clamp at gimbal lock).
    """
    n = x * x + y * y + z * z + w * w
    s = 0.0 if n == 0.0 else 2.0 / n
    xx, yy, zz = s * x * x, s * y * y, s * z * z
    xy, xz, yz = s * x * y, s * x * z, s * y * z
    wx, wy, wz = s * w * x, s * w * y, s * w * z
    return np.array([
        [1 - yy - zz, xy - wz, xz + wy],
        [xy + wz, 1 - xx - zz, yz - wx],
        [xz - wy, yz + wx, 1 - xx - yy],
    ])


def quaternion_wxyz_to_matrix(w: float, x: float, y: float, z: float) -> np.ndarray:
    """NuScenes/Lyft quaternions are stored (w, x, y, z) (pyquaternion)."""
    return quaternion_xyzw_to_matrix(x, y, z, w)


def _pose_matrix(translation: Sequence[float], rotation_wxyz: Sequence[float]) -> np.ndarray:
    """nuscenes.utils.geometry_utils.transform_matrix(inverse=False)."""
    T = np.eye(4)
    T[:3, :3] = quaternion_wxyz_to_matrix(*rotation_wxyz)
    T[:3, 3] = np.asarray(translation, np.float64)
    return T


# --------------------------------------------------------------------------- #
# shared full-dataset base
# --------------------------------------------------------------------------- #

class _FullDataset:
    """Common protocol surface over per-dataset session machinery."""

    name: str = ""
    time_step: float = 0.1
    sessions_list: List[int]

    def indexing_from(self) -> int:
        return 0

    def session_count(self) -> int:
        # genset iterates `range(session_count())` and skips absent sessions
        # via sessions_list; expose max+1 so plain ranges stay valid
        return (max(self.sessions_list) + 1) if self.sessions_list else 0

    def total_num_of_clouds(self) -> int:
        return int(np.sum([self.session_length(s) for s in self.sessions_list]))

    def session_length(self, session_ind: int) -> int:
        raise NotImplementedError

    def load_PC(self, session_ind: int, index: int) -> np.ndarray:
        raise NotImplementedError

    def get_relative_motion(self, session_ind: int, i: int, j: int) -> np.ndarray:
        raise NotImplementedError


class KITTIOdometryFull(_FullDataset):
    """KITTI odometry raw adapter (datasets/KITTI.py:72-108).

    root/
      sequences/%02d/velodyne/%06d.bin + sequences/%02d/calib.txt
      poses/%02d.txt (cam0 poses, 12 floats/row)
    """

    name = "KITTI"
    time_step = 0.1
    SPLITS = {
        "train": [0, 1, 2, 3, 4, 5],
        "validation": [6, 7],
        "test": [8, 9, 10],
    }

    def __init__(self, phase: str, root: str):
        assert phase in self.SPLITS, phase
        self.phase = phase
        self.root = root
        self.sessions_list = list(self.SPLITS[phase])
        self.GT_poses: Dict[int, np.ndarray] = {
            s: self._load_velo_poses(s) for s in self.sessions_list
        }

    # -- format decoding -- #
    def _calib_T_cam0_velo(self, s: int) -> np.ndarray:
        path = os.path.join(self.root, "sequences", f"{s:02d}", "calib.txt")
        with open(path) as f:
            for line in f:
                key, _, rest = line.partition(":")
                if key.strip() == "Tr":
                    vals = np.fromstring(rest, sep=" ")
                    T = np.eye(4)
                    T[:3, :4] = vals.reshape(3, 4)
                    return T
        raise ValueError(f"no 'Tr' entry in {path}")

    def _load_velo_poses(self, s: int) -> np.ndarray:
        path = os.path.join(self.root, "poses", f"{s:02d}.txt")
        rows = np.loadtxt(path).reshape(-1, 12)
        poses = np.tile(np.eye(4), (len(rows), 1, 1))
        poses[:, :3, :4] = rows.reshape(-1, 3, 4)
        # conjugate cam0 poses into the velodyne frame (KITTI.py:30-38)
        Tr = self._calib_T_cam0_velo(s)
        return np.linalg.inv(Tr)[None] @ poses @ Tr[None]

    # -- protocol -- #
    def session_length(self, s: int) -> int:
        return len(self.GT_poses[s])

    def load_PC(self, s: int, index: int) -> np.ndarray:
        path = os.path.join(
            self.root, "sequences", f"{s:02d}", "velodyne", f"{index:06d}.bin"
        )
        return read_velodyne_bin(path)

    def get_relative_motion(self, s: int, i: int, j: int) -> np.ndarray:
        return np.linalg.inv(self.GT_poses[s][j]) @ self.GT_poses[s][i]


class ApolloSouthbayFull(_FullDataset):
    """Apollo-Southbay raw adapter (datasets/ApolloSouthbay.py:135-172).

    Sessions are discovered by suffix-matching the published session keys
    under the root (ApolloSouthbay.py:19-72); poses come from
    `<session>/poses/gt_poses.txt`, clouds from `<session>/pcds/%d.pcd`.
    Frame indices start at 1 (indexing_from, ApolloSouthbay.py:171).
    """

    name = "ApolloSouthbay"
    time_step = 0.1
    SESSION_KEYS = [
        "MapData/HighWay237/2018-10-05/",
        "MapData/SunnyvaleBigloop/Caspian_and_Geneva/2017-12-13/",
        "MapData/SunnyvaleBigloop/Borrgas/2017-12-13/",
        "MapData/SunnyvaleBigloop/Java/2017-12-13/",
        "MapData/SunnyvaleBigloop/Mathilda_Moffet/2017-12-28/",
        "MapData/SunnyvaleBigloop/Crossman/2017-12-13/",
        "MapData/SunnyvaleBigloop/Mathilda_Carribean/2017-12-14/",
        "MapData/SunnyvaleBigloop/Bordeaux/2017-12-13/",
        "MapData/MathildaAVE/2018-09-25/",
        "MapData/SanJoseDowntown/2018-10-02/",
        "MapData/BaylandsToSeafood/2018-09-26/",
        "MapData/ColumbiaPark/2018-09-21/2/",
        "MapData/ColumbiaPark/2018-09-21/4/",
        "MapData/ColumbiaPark/2018-09-21/1/",
        "MapData/ColumbiaPark/2018-09-21/3/",
        "TrainData/HighWay237/2018-10-12/",
        "TrainData/MathildaAVE/2018-10-04/",
        "TrainData/SanJoseDowntown/2018-10-11/",
        "TrainData/BaylandsToSeafood/2018-10-05/",
        "TrainData/ColumbiaPark/2018-10-03/",
        "TestData/HighWay237/2018-10-12/",
        "TestData/SunnyvaleBigloop/2018-10-03/",
        "TestData/MathildaAVE/2018-10-12/",
        "TestData/SanJoseDowntown/2018-10-11/2/",
        "TestData/SanJoseDowntown/2018-10-11/1/",
        "TestData/BaylandsToSeafood/2018-10-12/",
        "TestData/ColumbiaPark/2018-10-11/",
    ]

    def __init__(self, phase: str, root: str):
        assert phase in ("train", "test"), phase
        self.phase = phase
        self.root = root
        # discovery and pose loading are LAZY: constructing the adapter on a
        # multi-GB archive must not os.walk it, and a partial archive only
        # errors when a missing session is actually touched
        self._session_paths: List[str | None] | None = None
        self._sessions_list: List[int] | None = None
        self._gt_rows: Dict[int, np.ndarray] = {}
        self._pose_by_frame: Dict[int, Dict[int, np.ndarray]] = {}

    @property
    def session_paths(self) -> List[str | None]:
        if self._session_paths is None:
            self._session_paths = self._find_session_paths()
        return self._session_paths

    @property
    def sessions_list(self) -> List[int]:
        if self._sessions_list is None:
            marker = "TrainData" if self.phase == "train" else "Test"
            self._sessions_list = [
                i for i, p in enumerate(self.session_paths)
                if p is not None and marker in p
            ]
        return self._sessions_list

    def _find_session_paths(self) -> List[str | None]:
        subdirs = [os.path.join(d, "") for d, _, _ in os.walk(self.root)]
        out: List[str | None] = []
        for key in self.SESSION_KEYS:
            matches = [d for d in subdirs if d.endswith(key)]
            assert len(matches) <= 1, f"multiple directories match {key}"
            out.append(matches[0] if matches else None)
        return out

    def _session_path(self, s: int) -> str:
        path = self.session_paths[s]
        if path is None:
            raise FileNotFoundError(
                f"Apollo session {s} ({self.SESSION_KEYS[s]}) is absent "
                f"under {self.root} (partial archive?)"
            )
        return path

    def _gt(self, s: int) -> np.ndarray:
        if s not in self._gt_rows:
            path = os.path.join(self._session_path(s), "poses", "gt_poses.txt")
            self._gt_rows[s] = np.loadtxt(path, ndmin=2)
        return self._gt_rows[s]

    def _pose(self, s: int, index: int) -> np.ndarray:
        # O(1) frame lookup (gt_poses.txt rows are keyed by frame index in
        # column 0 and need not be dense or sorted)
        if s not in self._pose_by_frame:
            gt = self._gt(s)
            self._pose_by_frame[s] = {int(r[0]): r for r in gt}
        try:
            row = self._pose_by_frame[s][int(index)]
        except KeyError:
            raise KeyError(
                f"Apollo session {s}: no pose row for frame {index} in "
                f"{os.path.join(self._session_path(s), 'poses/gt_poses.txt')}"
            ) from None
        T = np.eye(4)
        T[:3, 3] = row[2:5]
        T[:3, :3] = quaternion_xyzw_to_matrix(*row[5:9])
        return T

    def indexing_from(self) -> int:
        return 1

    def session_count(self) -> int:
        return len(self.SESSION_KEYS)

    def session_length(self, s: int) -> int:
        return len(self._gt(s))

    def load_PC(self, s: int, index: int) -> np.ndarray:
        return read_pcd(
            os.path.join(self._session_path(s), "pcds", f"{index}.pcd")
        )

    def get_relative_motion(self, s: int, i: int, j: int) -> np.ndarray:
        return np.linalg.inv(self._pose(s, j)) @ self._pose(s, i)


class _DevkitTables:
    """Minimal NuScenes/Lyft JSON-table database (replaces the devkits).

    Loads scene/sample/sample_data/ego_pose/calibrated_sensor (+log) tables
    and walks each scene's LIDAR_TOP sample_data chain
    (NuScenes.py:57-87 prep_list_of_sessions).
    """

    def __init__(self, json_path: str, data_path: str):
        self.data_path = data_path
        self.tables: Dict[str, Dict[str, dict]] = {}
        for name in ("scene", "sample", "sample_data", "ego_pose",
                     "calibrated_sensor", "log"):
            path = os.path.join(json_path, f"{name}.json")
            recs = json.load(open(path)) if os.path.exists(path) else []
            self.tables[name] = {r["token"]: r for r in recs}
        self.scenes = sorted(
            self.tables["scene"].values(), key=lambda r: r["name"]
        )

    def get(self, table: str, token: str) -> dict:
        return self.tables[table][token]

    def lidar_chain(self, scene: dict) -> List[str]:
        sample = self.get("sample", scene["first_sample_token"])
        token = sample["data"]["LIDAR_TOP"]
        chain = []
        while token:
            chain.append(token)
            token = self.get("sample_data", token)["next"]
        return chain

    def ego_pose_matrix(self, sd_token: str) -> np.ndarray:
        sd = self.get("sample_data", sd_token)
        ep = self.get("ego_pose", sd["ego_pose_token"])
        return _pose_matrix(ep["translation"], ep["rotation"])

    def load_cloud(self, sd_token: str) -> np.ndarray:
        sd = self.get("sample_data", sd_token)
        cs = self.get("calibrated_sensor", sd["calibrated_sensor_token"])
        pts = read_nuscenes_bin(os.path.join(self.data_path, sd["filename"]))
        car_from_sensor = _pose_matrix(cs["translation"], cs["rotation"])
        return pts @ car_from_sensor[:3, :3].T + car_from_sensor[:3, 3]

    def scene_location(self, scene: dict) -> str:
        log = self.tables["log"].get(scene.get("log_token", ""), {})
        return log.get("location", "")


class NuScenesFull(_FullDataset):
    """NuScenes raw adapter (datasets/NuScenes.py:119-147).

    `splits`: optional {phase: [scene names]} to reproduce the devkit's
    official train/val/test split lists; when omitted every scene in the
    loaded version belongs to every phase (the balanced benchmark only needs
    the location filter + published pair tables).
    """

    time_step = 0.05

    def __init__(self, location: str, phase: str, root: str,
                 splits: Dict[str, List[str]] | None = None):
        assert phase in ("train", "validation", "test"), phase
        assert location in ("boston", "singapore"), location
        self.name = f"NuScenes_{location}"
        self.phase = phase
        self.location = location
        version = "v1.0-test" if phase == "test" else "v1.0-trainval"
        self.db = _DevkitTables(os.path.join(root, version), root)
        self.chains = [self.db.lidar_chain(sc) for sc in self.db.scenes]
        names = splits.get(phase) if splits else None
        self.sessions_list = [
            i for i, sc in enumerate(self.db.scenes)
            if location in self.db.scene_location(sc)
            and (names is None or sc["name"] in names)
        ]

    def session_length(self, s: int) -> int:
        return len(self.chains[s])

    def load_PC(self, s: int, index: int) -> np.ndarray:
        return self.db.load_cloud(self.chains[s][index])

    def get_relative_motion(self, s: int, i: int, j: int) -> np.ndarray:
        pose_i = self.db.ego_pose_matrix(self.chains[s][i])
        pose_j = self.db.ego_pose_matrix(self.chains[s][j])
        return np.linalg.inv(pose_j) @ pose_i


class LyftLEVEL5Full(_FullDataset):
    """Lyft LEVEL5 raw adapter (datasets/LyftLEVEL5.py:92-116); same table
    schema as NuScenes with json tables at `<root>/<phase>_data`. Train
    session 21 ships corrupted data and is dropped (LyftLEVEL5.py:100)."""

    name = "LyftLEVEL5"
    time_step = 0.2

    def __init__(self, phase: str, root: str):
        assert phase in ("train", "test"), phase
        self.phase = phase
        self.db = _DevkitTables(os.path.join(root, f"{phase}_data"), root)
        self.chains = [self.db.lidar_chain(sc) for sc in self.db.scenes]
        self.sessions_list = [
            i for i in range(len(self.db.scenes))
            if not (phase == "train" and i == 21)
        ]

    def session_length(self, s: int) -> int:
        return len(self.chains[s])

    def load_PC(self, s: int, index: int) -> np.ndarray:
        return self.db.load_cloud(self.chains[s][index])

    def get_relative_motion(self, s: int, i: int, j: int) -> np.ndarray:
        pose_i = self.db.ego_pose_matrix(self.chains[s][i])
        pose_j = self.db.ego_pose_matrix(self.chains[s][j])
        return np.linalg.inv(pose_j) @ pose_i


class RawBalancedDataset:
    """Balanced pair table + raw archive clouds (get_pair protocol).

    The reference's *_balanced classes (e.g. KITTI.py:109-129) read the
    published pair list and fetch both clouds from the raw archive; this is
    the equivalent over any full adapter above. Falls back to the adapter's
    own motion if the pair table lacks one (never the case for published
    sets).
    """

    def __init__(self, full: _FullDataset, phase: str = "test",
                 balanced_root: str | None = None):
        from .balanced import (
            balanced_set_path, default_balanced_root, read_balanced_set,
        )
        self.full = full
        self.name = full.name
        self.phase = phase
        path = balanced_set_path(
            balanced_root or default_balanced_root(), full.name, phase
        )
        self.pairs = read_balanced_set(path)

    def __len__(self):
        return len(self.pairs)

    def get_pair(self, ind: int):
        p = self.pairs
        s = int(p.session_ind[ind])
        mot = p.motions[ind]
        a = self.full.load_PC(s, int(p.src_ind[ind]))
        b = self.full.load_PC(s, int(p.tgt_ind[ind]))
        return mot, a, b


def make_full_dataset(name: str, phase: str, root: str, **kw) -> _FullDataset:
    """Raw-adapter factory by balanced-set dataset name."""
    if name in ("KITTI", "KITTI_10m", "K"):
        return KITTIOdometryFull(phase, root)
    if name in ("ApolloSouthbay", "A"):
        return ApolloSouthbayFull(phase, root)
    if name in ("NuScenes_boston", "B"):
        return NuScenesFull("boston", phase, root, **kw)
    if name in ("NuScenes_singapore", "S"):
        return NuScenesFull("singapore", phase, root, **kw)
    if name in ("LyftLEVEL5", "L"):
        return LyftLEVEL5Full(phase, root)
    raise KeyError(f"unknown raw dataset {name!r}")
