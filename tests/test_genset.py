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
