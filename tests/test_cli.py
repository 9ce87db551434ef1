"""CLI smoke tests (CPU, tiny budgets) + baselines."""
import os

import numpy as np
import jax.numpy as jnp
import pytest

from lidarreg.data import default_balanced_root

HAVE_SETS = os.path.isdir(default_balanced_root())


class TestBaselines:
    def test_sm_register(self, rng):
        from lidarreg.core import registration_success
        from lidarreg.core.se3 import euler_to_rotation
        from lidarreg.solvers.baselines import spectral_matching_register

        n = 256
        T = np.eye(4, dtype=np.float32)
        T[:3, :3] = np.asarray(euler_to_rotation(jnp.asarray([0.0, 0.0, 0.5])))
        T[:3, 3] = [2.0, 1.0, 0.0]
        src = rng.uniform(-20, 20, (1, n, 3)).astype(np.float32)
        tgt = src @ T[:3, :3].T + T[:3, 3]
        out = rng.choice(n, n // 2, replace=False)
        tgt = np.asarray(tgt)
        tgt[0, out] = rng.uniform(-20, 20, (len(out), 3))
        trans, labels = spectral_matching_register(
            jnp.asarray(src), jnp.asarray(tgt), inlier_threshold=0.6
        )
        ok, re, te = registration_success(trans[0], jnp.asarray(T))
        assert bool(ok)
        # selected labels are mostly true inliers
        lab = np.asarray(labels[0]) > 0
        is_inl = np.ones(n, bool); is_inl[out] = False
        assert (lab & is_inl).sum() / lab.sum() > 0.9

    def test_pmc_register(self, rng):
        from lidarreg.core import registration_success
        from lidarreg.solvers.baselines import pmc_register

        n = 60
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = [1.0, -2.0, 0.5]
        src = rng.uniform(-10, 10, (n, 3)).astype(np.float32)
        tgt = (src + T[:3, 3]).astype(np.float32)
        out = rng.choice(n, 20, replace=False)
        tgt[out] += rng.uniform(3, 10, (20, 3))
        trans, labels = pmc_register(src, tgt, inlier_threshold=0.5)
        ok, _, _ = registration_success(jnp.asarray(trans), jnp.asarray(T))
        assert bool(ok)


@pytest.mark.skipif(not HAVE_SETS, reason="balanced sets not mounted")
class TestTestCLI:
    """cli.test smoke: tiny budgets, surrogate features, synthetic pairs."""

    def _run(self, tmp_path, algo, extra=()):
        from lidarreg.cli.test import main

        return main([
            "--dataset", "K", "--phase", "validation", "--algo", algo,
            "--features", "surrogate", "--capacity", "2048",
            "--iters", "2048", "--max_samples", "2",
            "--outdir", str(tmp_path / algo), *extra,
        ])

    def test_ransac(self, tmp_path):
        report = self._run(tmp_path, "RANSAC")
        assert "RANSAC     | recall:" in report

    def test_gc_ransac_algo(self, tmp_path):
        report = self._run(tmp_path, "GC_RANSAC")
        assert "GC_RANSAC     | recall:" in report

    def test_open3d_codebase(self, tmp_path):
        report = self._run(tmp_path, "RANSAC", ("--codebase", "open3d"))
        assert "recall:" in report

    def test_dgr(self, tmp_path):
        report = self._run(tmp_path, "DGR", ("--tiny", "true"))
        assert "DGR     | recall:" in report


@pytest.mark.skipif(not HAVE_SETS, reason="balanced sets not mounted")
class TestTrainCLI:
    def test_fcgf_smoke(self, tmp_path):
        from lidarreg.cli.train import main

        out = main([
            "--model", "fcgf", "--dataset", "K", "--epochs", "1",
            "--steps_per_epoch", "2", "--capacity", "512", "--tiny", "true",
            "--outdir", str(tmp_path / "fcgf"),
        ])
        assert os.path.exists(os.path.join(out, "model_best.msgpack"))
        assert os.path.exists(os.path.join(out, "metrics.jsonl"))

    def test_dgr_smoke(self, tmp_path):
        from lidarreg.cli.train import main

        out = main([
            "--model", "dgr", "--dataset", "K", "--epochs", "1",
            "--steps_per_epoch", "2", "--capacity", "512", "--tiny", "true",
            "--outdir", str(tmp_path / "dgr"),
        ])
        assert os.path.exists(os.path.join(out, "model_best.msgpack"))


class TestUtils:
    def test_timer(self):
        from lidarreg.utils.timer import Timer, AverageMeter, TicToc
        import time as _t

        t = Timer(); t.tic(); _t.sleep(0.01); d = t.toc(average=False)
        assert d >= 0.01
        m = AverageMeter()
        for v in (1.0, 2.0, 3.0):
            m.update(v)
        assert m.avg == 2.0 and abs(m.std - np.std([1, 2, 3])) < 1e-9
        tt = TicToc(); tt.tic("x"); _t.sleep(0.005); tt.toc()
        assert tt.records["x"][0] >= 0.005

    def test_metrics_logger(self, tmp_path):
        from lidarreg.utils.logging import MetricsLogger

        ml = MetricsLogger(str(tmp_path / "m.jsonl"))
        ml.log(1, loss=0.5)
        ml.log(2, loss=0.25, recall=90)
        recs = ml.read()
        assert len(recs) == 2 and recs[1]["recall"] == 90.0
