"""Balanced-set generator tests on a synthetic multi-session world."""
import numpy as np
import pytest

from lidarreg.genset.generator import (
    BalancedSetGenerator,
    GensetConfig,
    motion_to_fields,
    overlap_fraction,
    rotation_matrix_euler_deg,
    voxel_downsample_np,
)


class ToyDrive:
    """Synthetic adapter: sensor drives along +x at 2 m/frame over a bumpy
    world; overlap decays with frame distance."""

    name = "Toy"

    def __init__(self, n_sessions=2, n_frames=60, seed=0):
        self.n_sessions = n_sessions
        self.n_frames = n_frames
        rngs = [np.random.default_rng(seed + s) for s in range(n_sessions)]
        self.worlds = [
            np.c_[r.uniform(0, 200, (20000, 1)), r.uniform(-25, 25, (20000, 1)),
                  r.uniform(0, 4, (20000, 1))].astype(np.float32)
            for r in rngs
        ]

    def session_count(self):
        return self.n_sessions

    def session_length(self, s):
        return self.n_frames

    def _pose(self, i):
        T = np.eye(4)
        T[0, 3] = 2.0 * i
        return T

    def load_PC(self, s, i):
        # sensor at x=2i sees +-30m
        w = self.worlds[s]
        x0 = 2.0 * i
        m = np.abs(w[:, 0] - x0) < 30
        return (w[m] - [x0, 0, 0]).astype(np.float64)

    def get_relative_motion(self, s, i, j):
        # motion mapping frame-i coords into frame-j coords
        return np.linalg.inv(self._pose(j)) @ self._pose(i)


class TestHelpers:
    def test_overlap_monotone(self):
        ds = ToyDrive()
        A = ds.load_PC(0, 0)
        near = ds.load_PC(0, 2)
        far = ds.load_PC(0, 20)
        m_near = ds.get_relative_motion(0, 0, 2)
        m_far = ds.get_relative_motion(0, 0, 20)
        A_n = A @ m_near[:3, :3].T + m_near[:3, 3]
        A_f = A @ m_far[:3, :3].T + m_far[:3, 3]
        o_near, _ = overlap_fraction(A_n, near)
        o_far, _ = overlap_fraction(A_f, far)
        assert o_near > o_far > 0

    def test_euler_roundtrip_zyx(self, rng):
        from lidarreg.data.augment import euler_deg_to_rotation

        ang = rng.uniform(-30, 30, 3)
        R = euler_deg_to_rotation(ang)  # Rz @ Ry @ Rx
        got = rotation_matrix_euler_deg(R)
        np.testing.assert_allclose(got, ang, atol=1e-8)

    def test_downsample(self, rng):
        pts = rng.uniform(0, 10, (5000, 3))
        ds = voxel_downsample_np(pts, 1.0)
        assert len(ds) <= 1000 and len(ds) > 100


class TestGenerator:
    def test_end_to_end(self, tmp_path):
        ds = ToyDrive()
        cfg = GensetConfig(
            sizes=(10, 5, 5), round_to_multiple=5, source_stride=5,
            num_workers=1, cache_dir=str(tmp_path / "cache"),
            output_dir=str(tmp_path / "out"), max_spacing=40,
        )
        gen = BalancedSetGenerator(ds, cfg)
        out = gen.create_set()
        assert len(out["train"]) == 10
        assert len(out["validation"]) == 5
        assert len(out["test"]) == 5
        # every selected pair satisfies the overlap floor
        for p in out.values():
            assert (p.overlap_symmetric >= cfg.minimum_overlap - 1e-9).all()
        # the files parse back
        from lidarreg.data.balanced import read_balanced_set

        q = read_balanced_set(str(tmp_path / "out" / "Toy" / "test.txt"))
        assert len(q) == 5
        np.testing.assert_allclose(q.motions, out["test"].motions, atol=1e-10)

    def test_session_fairness(self, tmp_path):
        ds = ToyDrive(n_sessions=2)
        cfg = GensetConfig(
            sizes=(12, 0, 0), round_to_multiple=4, source_stride=5,
            num_workers=1, cache_dir=str(tmp_path / "c"),
            output_dir=str(tmp_path / "o"), max_spacing=40,
        )
        gen = BalancedSetGenerator(ds, cfg)
        out = gen.create_set()
        counts = np.bincount(out["train"].session_ind.astype(int), minlength=2)
        assert counts.min() >= 3  # both sessions represented


class TestGensetCLI:
    """cli.genset — the reference's `python -m GenerateBalancedSet` entry."""

    def test_ceil_rounding_matches_published_sizes(self, tmp_path):
        # GenerateBalancedSet.py:138-140 rounds requested sizes UP with
        # np.ceil; the published sets confirm it (7000->7008, 200->288)
        ds = ToyDrive(n_sessions=2)
        cfg = GensetConfig(
            sizes=(10, 5, 5), round_to_multiple=4, source_stride=2,
            num_workers=1, cache_dir=str(tmp_path / "c"),
            output_dir=str(tmp_path / "o"), max_spacing=40,
        )
        out = BalancedSetGenerator(ds, cfg).create_set()
        assert len(out["train"]) == 12   # ceil(10/4)*4
        assert len(out["validation"]) == 8
        assert len(out["test"]) == 8

    def test_zero_size_splits_not_written(self, tmp_path):
        ds = ToyDrive()
        cfg = GensetConfig(
            sizes=(0, 0, 8), round_to_multiple=4, source_stride=5,
            num_workers=1, cache_dir=str(tmp_path / "c"),
            output_dir=str(tmp_path / "o"), max_spacing=40,
        )
        out = BalancedSetGenerator(ds, cfg).create_set()
        assert set(out) == {"test"}
        import os
        d = tmp_path / "o" / "Toy"
        assert (d / "test.txt").exists()
        assert not (d / "train.txt").exists()

    def test_icp_refine_recovers_perturbed_gt(self):
        from lidarreg.cli.genset import icp_refine_np

        ds = ToyDrive()
        A = ds.load_PC(0, 0)
        B = ds.load_PC(0, 4)
        M = ds.get_relative_motion(0, 0, 4)
        bad = M.copy()
        th = np.radians(1.0)
        bad[:3, :3] = bad[:3, :3] @ np.array([
            [np.cos(th), -np.sin(th), 0],
            [np.sin(th), np.cos(th), 0],
            [0, 0, 1.0],
        ])
        bad[:3, 3] += [0.25, -0.2, 0.1]
        fixed = icp_refine_np(bad, A, B)
        # overlapping world points are identical -> ICP re-finds the GT
        assert np.abs(fixed[:3, 3] - M[:3, 3]).max() < 0.05
        assert np.abs(fixed[:3, :3] - M[:3, :3]).max() < 0.01

    def _fake_kitti_tree(self, tmp_path):
        import os

        root = str(tmp_path / "kitti")
        rng = np.random.default_rng(3)
        world = np.c_[rng.uniform(0, 120, (30000, 1)),
                      rng.uniform(-20, 20, (30000, 1)),
                      rng.uniform(0, 5, (30000, 1))].astype(np.float32)
        Tr = np.eye(4)
        for s in (8, 9, 10):
            seq = os.path.join(root, "sequences", f"{s:02d}")
            os.makedirs(os.path.join(seq, "velodyne"), exist_ok=True)
            os.makedirs(os.path.join(root, "poses"), exist_ok=True)
            with open(os.path.join(seq, "calib.txt"), "w") as f:
                f.write("Tr: " + " ".join(str(v) for v in Tr[:3, :4].ravel())
                        + "\n")
            rows = []
            n_frames = 30 if s < 10 else 1
            for i in range(n_frames):
                x0 = 3.0 * i
                pose = np.eye(4)
                pose[0, 3] = x0
                rows.append(pose[:3, :4].ravel())
                m = np.abs(world[:, 0] - x0) < 25
                local = world[m] - [x0, 0, 0]
                scan = np.hstack([
                    local, np.zeros((len(local), 1), np.float32)
                ]).astype(np.float32)
                scan.tofile(os.path.join(seq, "velodyne", f"{i:06d}.bin"))
            np.savetxt(os.path.join(root, "poses", f"{s:02d}.txt"),
                       np.asarray(rows))
        return root

    def test_cli_end_to_end_kitti_test_phase(self, tmp_path, capsys):
        from lidarreg.cli.genset import main
        from lidarreg.data.balanced import read_balanced_set

        root = self._fake_kitti_tree(tmp_path)
        out = str(tmp_path / "sets")
        main([
            "--dataset", "K", "--data_root", root, "--output_dir", out,
            "--cache_dir", str(tmp_path / "cache"),
            "--phases", "test", "--sizes", "4", "2", "4",
            "--round_to_multiple", "1", "--source_stride", "2",
            "--max_spacing", "25", "--num_workers", "1",
            # --no_refine keeps the toy drive's non-translation motion
            # fields exactly degenerate; with ICP refine active all six
            # hypercube dims gain cm-scale spread and the 0.1-ball sampler
            # legitimately starves on a 24-candidate pool (the reference
            # degrades the same way). icp_refine_np has its own unit test.
            "--no_refine",
        ])
        txt = capsys.readouterr().out
        # only the test split is produced from the test archive phase
        import os
        assert os.path.exists(os.path.join(out, "KITTI", "test.txt"))
        assert not os.path.exists(os.path.join(out, "KITTI", "train.txt"))
        pairs = read_balanced_set(os.path.join(out, "KITTI", "test.txt"))
        assert len(pairs) == 4
        assert np.all(np.abs(pairs.motions[:, 0, 3]) > 1.0)
        # the trailing reference-style analysis printed text histograms
        assert "yaw (deg)" in txt and "symmetric overlap" in txt

    def test_cli_analyze_mode(self, tmp_path, capsys):
        from lidarreg.cli.genset import main

        ds = ToyDrive()
        cfg = GensetConfig(
            sizes=(8, 0, 0), round_to_multiple=4, source_stride=5,
            num_workers=1, cache_dir=str(tmp_path / "c"),
            output_dir=str(tmp_path / "o"), max_spacing=40,
        )
        BalancedSetGenerator(ds, cfg).create_set()
        main(["--analyze", str(tmp_path / "o" / "Toy" / "train.txt")])
        txt = capsys.readouterr().out
        for panel in ("dist (m)", "time diff (s)", "symmetric overlap",
                      "roll (deg)", "pitch (deg)", "yaw (deg)"):
            assert panel in txt
