"""Raw dataset adapters proven on tiny synthetic directory trees.

Each tree mimics the on-disk format the reference decodes with pykitti /
open3d / nuscenes-devkit / lyft-sdk (BalancedDatasetGenerator/datasets/*.py),
so the decoders are verified before any real archive mounts.
"""
import json
import os

import numpy as np
import pytest

from lidarreg.data.raw import (
    ApolloSouthbayFull,
    KITTIOdometryFull,
    LyftLEVEL5Full,
    NuScenesFull,
    make_full_dataset,
    quaternion_wxyz_to_matrix,
    quaternion_xyzw_to_matrix,
    read_pcd,
    read_velodyne_bin,
)


def rot_z(deg):
    r = np.radians(deg)
    c, s = np.cos(r), np.sin(r)
    T = np.eye(4)
    T[:2, :2] = [[c, -s], [s, c]]
    return T


def make_pose(deg, t):
    T = rot_z(deg)
    T[:3, 3] = t
    return T


def matrix_to_quat_wxyz(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    x = (R[2, 1] - R[1, 2]) / (4 * w)
    y = (R[0, 2] - R[2, 0]) / (4 * w)
    z = (R[1, 0] - R[0, 1]) / (4 * w)
    return np.array([w, x, y, z])


# --------------------------------------------------------------------------- #
# KITTI odometry
# --------------------------------------------------------------------------- #

def write_kitti_tree(root, sessions=(8, 9), n_frames=4, n_pts=300, seed=0):
    rng = np.random.default_rng(seed)
    # a deliberately non-trivial cam0<-velo calibration
    Tr = make_pose(12.0, [0.27, -0.05, 0.8])
    clouds = {}
    for s in sessions:
        seq = os.path.join(root, "sequences", f"{s:02d}")
        os.makedirs(os.path.join(seq, "velodyne"), exist_ok=True)
        os.makedirs(os.path.join(root, "poses"), exist_ok=True)
        with open(os.path.join(seq, "calib.txt"), "w") as f:
            f.write("P0: " + " ".join(["0"] * 12) + "\n")
            f.write("Tr: " + " ".join(str(v) for v in Tr[:3, :4].ravel()) + "\n")
        rows = []
        for i in range(n_frames):
            # cam0 poses: drive along +x with slight yaw
            pose_cam = make_pose(3.0 * i, [2.0 * i, 0.1 * i, 0])
            rows.append(pose_cam[:3, :4].ravel())
            pts = rng.uniform(-10, 10, (n_pts, 3)).astype(np.float32)
            refl = rng.uniform(0, 1, (n_pts, 1)).astype(np.float32)
            np.hstack([pts, refl]).tofile(
                os.path.join(seq, "velodyne", f"{i:06d}.bin")
            )
            clouds[(s, i)] = pts
        np.savetxt(os.path.join(root, "poses", f"{s:02d}.txt"),
                   np.asarray(rows))
    return Tr, clouds


class TestKITTIOdometry:
    def test_full_adapter(self, tmp_path):
        root = str(tmp_path)
        Tr, clouds = write_kitti_tree(root, sessions=(8, 9, 10))
        ds = KITTIOdometryFull("test", root)
        assert ds.sessions_list == [8, 9, 10]
        ds_val = KITTIOdometryFull  # split table parity (KITTI.py:79-84)
        assert ds_val.SPLITS["train"] == [0, 1, 2, 3, 4, 5]
        assert ds_val.SPLITS["validation"] == [6, 7]

    def test_poses_and_clouds(self, tmp_path):
        root = str(tmp_path)
        Tr, clouds = write_kitti_tree(root, sessions=(8, 9, 10))
        ds = KITTIOdometryFull("test", root)
        assert ds.session_length(8) == 4
        assert ds.total_num_of_clouds() == 12
        np.testing.assert_allclose(ds.load_PC(8, 2), clouds[(8, 2)], atol=0)

        # velodyne-frame relative motion: inv(P_j) @ P_i with
        # P = inv(Tr) @ pose_cam @ Tr (KITTI.py:30-38,103-107)
        pose_cam_i = make_pose(3.0 * 1, [2.0, 0.1, 0])
        pose_cam_j = make_pose(3.0 * 3, [6.0, 0.3, 0])
        P_i = np.linalg.inv(Tr) @ pose_cam_i @ Tr
        P_j = np.linalg.inv(Tr) @ pose_cam_j @ Tr
        want = np.linalg.inv(P_j) @ P_i
        np.testing.assert_allclose(
            ds.get_relative_motion(8, 1, 3), want, atol=1e-10
        )

    def test_velodyne_bin_reader(self, tmp_path):
        pts = np.arange(24, dtype=np.float32).reshape(6, 4)
        path = str(tmp_path / "scan.bin")
        pts.tofile(path)
        np.testing.assert_array_equal(read_velodyne_bin(path), pts[:, :3])


# --------------------------------------------------------------------------- #
# PCD reader + Apollo
# --------------------------------------------------------------------------- #

def write_pcd(path, pts, mode="binary", extra_field=False):
    n = len(pts)
    fields = "x y z" + (" intensity" if extra_field else "")
    k = 4 if extra_field else 3
    header = (
        "# .PCD v0.7 - Point Cloud Data file format\n"
        "VERSION 0.7\n"
        f"FIELDS {fields}\n"
        f"SIZE {' '.join(['4'] * k)}\n"
        f"TYPE {' '.join(['F'] * k)}\n"
        f"COUNT {' '.join(['1'] * k)}\n"
        f"WIDTH {n}\nHEIGHT 1\nVIEWPOINT 0 0 0 1 0 0 0\n"
        f"POINTS {n}\nDATA {mode}\n"
    )
    data = pts.astype(np.float32)
    if extra_field:
        data = np.hstack([data, np.full((n, 1), 7.0, np.float32)])
    with open(path, "wb") as f:
        f.write(header.encode())
        if mode == "binary":
            f.write(data.tobytes())
        else:
            for row in data:
                f.write((" ".join(f"{v:.6f}" for v in row) + "\n").encode())


class TestPCD:
    @pytest.mark.parametrize("mode", ["binary", "ascii"])
    @pytest.mark.parametrize("extra", [False, True])
    def test_roundtrip(self, tmp_path, mode, extra, rng):
        pts = rng.uniform(-50, 50, (40, 3))
        path = str(tmp_path / "c.pcd")
        write_pcd(path, pts, mode=mode, extra_field=extra)
        got = read_pcd(path)
        np.testing.assert_allclose(got, pts.astype(np.float32), atol=1e-4)


def write_apollo_tree(root, n_frames=3, seed=1):
    rng = np.random.default_rng(seed)
    sessions = {
        20: "TestData/HighWay237/2018-10-12/",   # SESSION_KEYS[20]
        18: "TrainData/BaylandsToSeafood/2018-10-05/",  # SESSION_KEYS[18]
    }
    poses, clouds = {}, {}
    for s, key in sessions.items():
        sdir = os.path.join(root, key)
        os.makedirs(os.path.join(sdir, "poses"), exist_ok=True)
        os.makedirs(os.path.join(sdir, "pcds"), exist_ok=True)
        rows = []
        for i in range(1, n_frames + 1):        # Apollo indexes from 1
            T = make_pose(10.0 * i, [3.0 * i, -1.0 * i, 0.2])
            q = matrix_to_quat_wxyz(T[:3, :3])  # store as x y z w
            rows.append(
                [i, 1000.0 + i] + list(T[:3, 3]) + [q[1], q[2], q[3], q[0]]
            )
            poses[(s, i)] = T
            pts = rng.uniform(-40, 40, (200, 3))
            write_pcd(os.path.join(sdir, "pcds", f"{i}.pcd"), pts)
            clouds[(s, i)] = pts.astype(np.float32)
        np.savetxt(os.path.join(sdir, "poses", "gt_poses.txt"),
                   np.asarray(rows))
    return poses, clouds


class TestApollo:
    def test_sessions_and_phase(self, tmp_path):
        root = str(tmp_path)
        write_apollo_tree(root)
        test_ds = ApolloSouthbayFull("test", root)
        train_ds = ApolloSouthbayFull("train", root)
        assert test_ds.sessions_list == [20]
        assert train_ds.sessions_list == [18]
        assert test_ds.indexing_from() == 1

    def test_poses_and_clouds(self, tmp_path):
        root = str(tmp_path)
        poses, clouds = write_apollo_tree(root)
        ds = ApolloSouthbayFull("test", root)
        np.testing.assert_allclose(
            ds.load_PC(20, 2), clouds[(20, 2)], atol=1e-4
        )
        want = np.linalg.inv(poses[(20, 3)]) @ poses[(20, 1)]
        np.testing.assert_allclose(
            ds.get_relative_motion(20, 1, 3), want, atol=1e-9
        )

    def test_quaternion_conventions(self, rng):
        for _ in range(5):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            w, x, y, z = q
            R = quaternion_wxyz_to_matrix(w, x, y, z)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
            np.testing.assert_allclose(np.linalg.det(R), 1.0, atol=1e-12)
            np.testing.assert_allclose(
                quaternion_xyzw_to_matrix(x, y, z, w), R, atol=0
            )


# --------------------------------------------------------------------------- #
# NuScenes / Lyft JSON-table trees
# --------------------------------------------------------------------------- #

def write_devkit_tree(json_dir, data_dir, scenes, seed=2):
    """scenes: list of (name, location, n_frames)."""
    rng = np.random.default_rng(seed)
    os.makedirs(json_dir, exist_ok=True)
    os.makedirs(os.path.join(data_dir, "sweeps"), exist_ok=True)
    tables = {k: [] for k in ("scene", "sample", "sample_data", "ego_pose",
                              "calibrated_sensor", "log")}
    cs_T = make_pose(25.0, [1.0, 0.2, 1.6])    # sensor->car
    q = matrix_to_quat_wxyz(cs_T[:3, :3])
    tables["calibrated_sensor"].append({
        "token": "cs0", "translation": list(cs_T[:3, 3]),
        "rotation": list(q),
    })
    truth = {"poses": {}, "clouds_sensor": {}, "cs_T": cs_T}
    for si, (name, location, n) in enumerate(scenes):
        log_tok = f"log{si}"
        tables["log"].append({"token": log_tok, "location": location})
        sd_toks = [f"sd{si}_{i}" for i in range(n)]
        tables["scene"].append({
            "token": f"scene{si}", "name": name, "log_token": log_tok,
            "first_sample_token": f"samp{si}",
        })
        tables["sample"].append({
            "token": f"samp{si}", "data": {"LIDAR_TOP": sd_toks[0]},
        })
        for i, tok in enumerate(sd_toks):
            pose = make_pose(5.0 * i + 7 * si, [4.0 * i, 0.5 * si, 0])
            pq = matrix_to_quat_wxyz(pose[:3, :3])
            tables["ego_pose"].append({
                "token": f"ep{si}_{i}", "translation": list(pose[:3, 3]),
                "rotation": list(pq),
            })
            fname = f"sweeps/{si}_{i}.pcd.bin"
            pts = rng.uniform(-30, 30, (150, 3)).astype(np.float32)
            blob = np.hstack([
                pts, rng.uniform(0, 255, (150, 1)).astype(np.float32),
                np.zeros((150, 1), np.float32),
            ])
            blob.tofile(os.path.join(data_dir, fname))
            tables["sample_data"].append({
                "token": tok, "next": sd_toks[i + 1] if i + 1 < n else "",
                "ego_pose_token": f"ep{si}_{i}",
                "calibrated_sensor_token": "cs0",
                "filename": fname,
            })
            truth["poses"][(si, i)] = pose
            truth["clouds_sensor"][(si, i)] = pts
    for k, rows in tables.items():
        with open(os.path.join(json_dir, f"{k}.json"), "w") as f:
            json.dump(rows, f)
    return truth


class TestNuScenes:
    def test_location_filter_and_chain(self, tmp_path):
        root = str(tmp_path)
        truth = write_devkit_tree(
            os.path.join(root, "v1.0-trainval"), root,
            [("scene-0001", "boston-seaport", 3),
             ("scene-0002", "singapore-onenorth", 2),
             ("scene-0003", "boston-seaport", 4)],
        )
        bos = NuScenesFull("boston", "train", root)
        sing = NuScenesFull("singapore", "train", root)
        assert bos.sessions_list == [0, 2]
        assert sing.sessions_list == [1]
        assert bos.session_length(2) == 4
        assert bos.total_num_of_clouds() == 7

    def test_cloud_in_car_frame(self, tmp_path):
        root = str(tmp_path)
        truth = write_devkit_tree(
            os.path.join(root, "v1.0-trainval"), root,
            [("scene-0001", "boston-seaport", 3)],
        )
        ds = NuScenesFull("boston", "train", root)
        pts_sensor = truth["clouds_sensor"][(0, 1)]
        cs = truth["cs_T"]
        want = pts_sensor @ cs[:3, :3].T + cs[:3, 3]
        np.testing.assert_allclose(ds.load_PC(0, 1), want, atol=1e-4)

    def test_relative_motion(self, tmp_path):
        root = str(tmp_path)
        truth = write_devkit_tree(
            os.path.join(root, "v1.0-trainval"), root,
            [("scene-0001", "boston-seaport", 3)],
        )
        ds = NuScenesFull("boston", "train", root)
        want = np.linalg.inv(truth["poses"][(0, 2)]) @ truth["poses"][(0, 0)]
        np.testing.assert_allclose(
            ds.get_relative_motion(0, 0, 2), want, atol=1e-9
        )

    def test_split_names(self, tmp_path):
        root = str(tmp_path)
        write_devkit_tree(
            os.path.join(root, "v1.0-trainval"), root,
            [("scene-0001", "boston-seaport", 2),
             ("scene-0002", "boston-seaport", 2)],
        )
        ds = NuScenesFull("boston", "train", root,
                          splits={"train": ["scene-0002"]})
        assert ds.sessions_list == [1]


class TestLyft:
    def test_adapter(self, tmp_path):
        root = str(tmp_path)
        truth = write_devkit_tree(
            os.path.join(root, "train_data"), root,
            [("a-1", "palo-alto", 3), ("a-2", "palo-alto", 2)],
        )
        ds = LyftLEVEL5Full("train", root)
        assert ds.sessions_list == [0, 1]
        assert ds.time_step == 0.2
        want = np.linalg.inv(truth["poses"][(0, 1)]) @ truth["poses"][(0, 0)]
        np.testing.assert_allclose(
            ds.get_relative_motion(0, 0, 1), want, atol=1e-9
        )
        cs = truth["cs_T"]
        pts = truth["clouds_sensor"][(1, 0)]
        np.testing.assert_allclose(
            ds.load_PC(1, 0), pts @ cs[:3, :3].T + cs[:3, 3], atol=1e-4
        )


class TestFactory:
    def test_names(self, tmp_path):
        root = str(tmp_path)
        write_kitti_tree(root, sessions=(6, 7))
        ds = make_full_dataset("KITTI_10m", "validation", root)
        assert isinstance(ds, KITTIOdometryFull)
        with pytest.raises(KeyError):
            make_full_dataset("nope", "test", root)


# --------------------------------------------------------------------------- #
# genset runs end-to-end over a fake on-disk KITTI tree
# --------------------------------------------------------------------------- #

class TestGensetOverRawKITTI:
    def test_balanced_set_from_fake_tree(self, tmp_path):
        from lidarreg.genset.generator import BalancedSetGenerator, GensetConfig
        from lidarreg.data.balanced import read_balanced_set

        root = str(tmp_path / "kitti")
        rng = np.random.default_rng(3)
        # a drivable world: sensor moves +x, sees +-25 m
        world = np.c_[rng.uniform(0, 120, (30000, 1)),
                      rng.uniform(-20, 20, (30000, 1)),
                      rng.uniform(0, 5, (30000, 1))].astype(np.float32)
        Tr = np.eye(4)
        n_frames = 30
        for s in (8, 9):
            seq = os.path.join(root, "sequences", f"{s:02d}")
            os.makedirs(os.path.join(seq, "velodyne"), exist_ok=True)
            os.makedirs(os.path.join(root, "poses"), exist_ok=True)
            with open(os.path.join(seq, "calib.txt"), "w") as f:
                f.write("Tr: " + " ".join(str(v) for v in Tr[:3, :4].ravel()) + "\n")
            rows = []
            for i in range(n_frames):
                x0 = 3.0 * i
                rows.append(make_pose(0, [x0, 0, 0])[:3, :4].ravel())
                m = np.abs(world[:, 0] - x0) < 25
                local = world[m] - [x0, 0, 0]
                scan = np.hstack([
                    local, np.zeros((len(local), 1), np.float32)
                ]).astype(np.float32)
                scan.tofile(os.path.join(seq, "velodyne", f"{i:06d}.bin"))
            np.savetxt(os.path.join(root, "poses", f"{s:02d}.txt"),
                       np.asarray(rows))
        os.makedirs(os.path.join(root, "sequences", "10", "velodyne"),
                    exist_ok=True)
        with open(os.path.join(root, "sequences", "10", "calib.txt"), "w") as f:
            f.write("Tr: " + " ".join(str(v) for v in Tr[:3, :4].ravel()) + "\n")
        # session 10 exists but has a single frame -> yields no candidates
        np.savetxt(os.path.join(root, "poses", "10.txt"),
                   np.eye(4)[:3, :4].ravel()[None])

        ds = KITTIOdometryFull("test", root)
        cfg = GensetConfig(
            sizes=(4, 2, 4), round_to_multiple=1, source_stride=2,
            max_spacing=25, num_workers=1, seed=0,
            cache_dir=str(tmp_path / "cache"),
            output_dir=str(tmp_path / "out"),
        )
        gen = BalancedSetGenerator(ds, cfg)
        cands = gen.extract_all_candidates()
        assert len(cands) >= 10
        # candidates only come from the phase's sessions
        assert set(np.unique(cands[:, 0].astype(int))) <= {8, 9, 10}
        out = gen.create_set()
        train_path = os.path.join(cfg.output_dir, ds.name, "train.txt")
        assert os.path.exists(train_path)
        train = read_balanced_set(train_path)
        assert len(train) == len(out["train"]) == 4
        # motions in the written set map src into tgt frame: -x shift
        assert np.all(np.abs(train.motions[:, 0, 3]) > 1.0)


class TestApolloPartialArchive:
    """Round-3 hardening: lazy discovery + O(1) poses + clear errors."""

    def test_missing_session_lists_but_errors_on_access(self, tmp_path):
        root = str(tmp_path)
        write_apollo_tree(root)   # creates sessions 18 (train) and 20 (test)
        ds = ApolloSouthbayFull("test", root)
        # only the present test session lists
        assert ds.sessions_list == [20]
        # a key absent from the archive raises a clear error when touched
        with pytest.raises(FileNotFoundError, match="partial archive"):
            ds.load_PC(21, 1)
        with pytest.raises(FileNotFoundError, match="partial archive"):
            ds.get_relative_motion(0, 1, 2)

    def test_missing_pose_frame_is_a_keyerror(self, tmp_path):
        root = str(tmp_path)
        write_apollo_tree(root, n_frames=3)
        ds = ApolloSouthbayFull("test", root)
        with pytest.raises(KeyError, match="no pose row for frame 99"):
            ds.get_relative_motion(20, 1, 99)

    def test_construction_does_not_walk(self, tmp_path, monkeypatch):
        import lidarreg.data.raw as raw

        def boom(*a, **k):
            raise AssertionError("os.walk during __init__")

        monkeypatch.setattr(raw.os, "walk", boom)
        ApolloSouthbayFull("test", str(tmp_path))  # must not raise

    def test_sparse_pose_table_o1_lookup(self, tmp_path):
        """gt_poses.txt rows keyed by frame id; gaps are fine."""
        root = str(tmp_path)
        poses, _ = write_apollo_tree(root, n_frames=3)
        # rewrite session 20's pose file with a gap (frames 1 and 3 only)
        sdir = os.path.join(root, "TestData/HighWay237/2018-10-12")
        gt = np.loadtxt(os.path.join(sdir, "poses", "gt_poses.txt"), ndmin=2)
        np.savetxt(os.path.join(sdir, "poses", "gt_poses.txt"), gt[[0, 2]])
        ds = ApolloSouthbayFull("test", root)
        want = np.linalg.inv(poses[(20, 3)]) @ poses[(20, 1)]
        np.testing.assert_allclose(
            ds.get_relative_motion(20, 1, 3), want, atol=1e-9
        )
        with pytest.raises(KeyError, match="no pose row for frame 2"):
            ds.get_relative_motion(20, 1, 2)


class TestGensetOverRawNuScenes:
    def test_balanced_set_from_fake_devkit_tree(self, tmp_path):
        """NuScenes mirror of TestGensetOverRawKITTI: a consistent world
        sampled per-frame through the ego-pose/calibrated-sensor chain."""
        from lidarreg.genset.generator import BalancedSetGenerator, GensetConfig
        from lidarreg.data.balanced import read_balanced_set

        root = str(tmp_path / "nusc")
        json_dir = os.path.join(root, "v1.0-trainval")
        os.makedirs(json_dir, exist_ok=True)
        os.makedirs(os.path.join(root, "sweeps"), exist_ok=True)
        rng = np.random.default_rng(7)
        world = np.c_[rng.uniform(0, 150, (30000, 1)),
                      rng.uniform(-20, 20, (30000, 1)),
                      rng.uniform(0, 5, (30000, 1))].astype(np.float32)
        cs_T = make_pose(10.0, [0.5, 0.1, 1.2])     # sensor -> car
        csq = matrix_to_quat_wxyz(cs_T[:3, :3])
        tables = {k: [] for k in ("scene", "sample", "sample_data",
                                  "ego_pose", "calibrated_sensor", "log")}
        tables["calibrated_sensor"].append({
            "token": "cs0", "translation": list(cs_T[:3, 3]),
            "rotation": list(csq),
        })
        n = 25
        for si in range(2):
            tables["log"].append(
                {"token": f"log{si}", "location": "boston-seaport"}
            )
            sd_toks = [f"sd{si}_{i}" for i in range(n)]
            tables["scene"].append({
                "token": f"scene{si}", "name": f"scene-{si:04d}",
                "log_token": f"log{si}",
                "first_sample_token": f"samp{si}",
            })
            tables["sample"].append({
                "token": f"samp{si}", "data": {"LIDAR_TOP": sd_toks[0]},
            })
            for i, tok in enumerate(sd_toks):
                pose = make_pose(0.0, [3.0 * i, 0.0, 0.0])   # car -> world
                pq = matrix_to_quat_wxyz(pose[:3, :3])
                tables["ego_pose"].append({
                    "token": f"ep{si}_{i}",
                    "translation": list(pose[:3, 3]),
                    "rotation": list(pq),
                })
                m = np.abs(world[:, 0] - 3.0 * i) < 25
                car_local = (world[m] - pose[:3, 3]) @ pose[:3, :3]
                sensor = (car_local - cs_T[:3, 3]) @ cs_T[:3, :3]
                blob = np.hstack([
                    sensor.astype(np.float32),
                    np.zeros((len(sensor), 2), np.float32),
                ])
                fname = f"sweeps/{si}_{i}.pcd.bin"
                blob.tofile(os.path.join(root, fname))
                tables["sample_data"].append({
                    "token": tok,
                    "next": sd_toks[i + 1] if i + 1 < n else "",
                    "ego_pose_token": f"ep{si}_{i}",
                    "calibrated_sensor_token": "cs0",
                    "filename": fname,
                })
        for k, rows in tables.items():
            with open(os.path.join(json_dir, f"{k}.json"), "w") as f:
                json.dump(rows, f)

        ds = NuScenesFull("boston", "train", root,
                          splits={"train": ["scene-0000", "scene-0001"]})
        cfg = GensetConfig(
            sizes=(4, 2, 4), round_to_multiple=1, source_stride=2,
            max_spacing=25, num_workers=1, seed=0,
            cache_dir=str(tmp_path / "cache"),
            output_dir=str(tmp_path / "out"),
        )
        gen = BalancedSetGenerator(ds, cfg)
        cands = gen.extract_all_candidates()
        assert len(cands) >= 10
        out = gen.create_set()
        train_path = os.path.join(cfg.output_dir, ds.name, "train.txt")
        assert os.path.exists(train_path)
        train = read_balanced_set(train_path)
        assert len(train) == len(out["train"]) == 4
        assert np.all(np.abs(train.motions[:, 0, 3]) > 1.0)
