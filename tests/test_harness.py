"""End-to-end harness test: synthetic balanced set -> stats -> report."""
import re

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarreg.bench import (
    EvalConfig,
    FRConfig,
    analyze_stats,
    evaluate_pairs,
    make_fr_register,
    merge_shards,
    save_shard,
)
from lidarreg.data import make_dataset, default_balanced_root
from lidarreg.data.pipeline import prepare_sparse_input
import os

HAVE_SETS = os.path.isdir(default_balanced_root())

CAP = 16384


def surrogate_features(xyz, valid, T=None, seed=0):
    """Motion-invariant noisy position-encoding features (FCGF stand-in)."""
    # warp the SOURCE cloud by the GT motion so both feature sets live in
    # the target frame: p = R x + t
    p = xyz if T is None else xyz @ jnp.asarray(
        T[:3, :3].T.astype(np.float32)
    ) + jnp.asarray(T[:3, 3].astype(np.float32))
    # noisy aligned-position features: feature NN == geometric NN (the
    # matching layer's realism is covered by its own tests; here we test
    # harness plumbing + stats)
    return p + jax.random.normal(jax.random.PRNGKey(seed), p.shape) * 0.1


@pytest.mark.skipif(not HAVE_SETS, reason="published balanced sets not mounted")
class TestHarnessEndToEnd:
    def _run(self, rank=0, world=1, n=4):
        ds = make_dataset("K", phase="validation", synthetic=True, n_points=12000)
        cfg = EvalConfig(algo="RANSAC", max_samples=n)
        fr = make_fr_register(
            FRConfig(mode="GPF", iters=4096, chunk_size=2048,
                     stage1_samples=256, top_k=64)
        )

        def features_for(cloud, T_align):
            # T_align now comes explicitly from the harness (GT motion for
            # the source cloud, identity for the target)
            pad = np.zeros((24576, 3), np.float32)
            m = min(len(cloud), 24576)
            pad[:m] = cloud[:m]
            st, xyz = prepare_sparse_input(jnp.asarray(pad), 0.3, CAP,
                                           jnp.int32(m))
            is_tgt = np.allclose(T_align, np.eye(4))
            F = surrogate_features(xyz, st.valid, None if is_tgt else T_align)
            return xyz, F, st.valid

        return evaluate_pairs(
            ds, features_for, fr, cfg, jax.random.PRNGKey(0),
            rank=rank, world_size=world,
        )

    def test_stats_and_report(self, tmp_path):
        stats = self._run(n=4)
        assert stats.shape == (4, 22)
        assert stats[:, 0].mean() >= 0.75  # registered most synthetic pairs
        assert (stats[:, 9] > 0).all() and (stats[:, 11] > 0).all()
        # ICP should not break successful registrations
        assert stats[:, 12].mean() >= stats[:, 0].mean() - 0.26
        report = analyze_stats(stats, "RANSAC")
        assert re.search(r"RANSAC     \| recall: \d+\.\d\d%,", report)
        assert re.search(r"RANSAC\+ICP \| recall: ", report)
        assert "nn pairs" in report

    def test_shard_merge(self, tmp_path):
        base = str(tmp_path / "shards")
        s0 = self._run(rank=0, world=2, n=4)
        s1 = self._run(rank=1, world=2, n=4)
        save_shard(s0, base, 2, 0)
        save_shard(s1, base, 2, 1)
        merged = merge_shards(base)
        assert merged.shape == (4, 22)
