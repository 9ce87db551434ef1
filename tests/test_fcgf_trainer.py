"""FCGF hardest-contrastive trainer tests."""
import numpy as np
import jax
import jax.numpy as jnp

from lidarreg.models.fcgf import ResUNetBN2C
from lidarreg.ops import voxelize_points
from lidarreg.sparse import SparseTensor
from lidarreg.train.fcgf_trainer import (
    FCGFTrainerConfig,
    hardest_contrastive_loss,
    init_state,
    make_train_step,
)

CAP = 768
CFG = FCGFTrainerConfig(num_pos=128, neg_search=128, steps_per_epoch=10,
                        lr=0.02)
MODEL = ResUNetBN2C(channels=(0, 8, 16, 16, 32), tr_channels=(0, 8, 8, 8, 16),
                    out_channels=8, conv1_kernel_size=3)


def make_pair(rng, n=1200):
    pts = rng.uniform(-8, 8, (n, 3)).astype(np.float32)
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = [1.0, 0.5, 0.0]
    pts_b = (pts @ T[:3, :3].T + T[:3, 3] + rng.normal(0, 0.02, (n, 3))).astype(np.float32)

    def prep(cloud):
        res = voxelize_points(jnp.asarray(cloud), 0.3, CAP)
        xyz = jnp.asarray(cloud)[res.indices] * res.valid[:, None]
        st = SparseTensor(res.coords, jnp.ones((CAP, 1)) * res.valid[:, None],
                          res.valid, 1)
        return st, xyz

    st0, xyz0 = prep(pts)
    st1, xyz1 = prep(pts_b)
    return {
        "st0": st0, "st1": st1, "xyz0": xyz0, "xyz1": xyz1,
        "T_gt": jnp.asarray(T), "key": jax.random.PRNGKey(7),
    }


class TestContrastiveLoss:
    def test_pos_neg_separation(self, rng):
        # features identical for matched points, far for others
        n = 256
        xyz = jnp.asarray(rng.uniform(-10, 10, (n, 3)).astype(np.float32))
        F_good = xyz / 10.0  # position-coded: matched -> same feature
        v = jnp.ones(n, bool)
        cfg = FCGFTrainerConfig(num_pos=64, neg_search=64)
        pos, neg, npos = hardest_contrastive_loss(
            cfg, jax.random.PRNGKey(0), F_good, xyz, v, F_good, xyz, v,
        )
        assert int(npos) > 0
        assert float(pos) < 1e-4        # perfect positives
        assert float(neg) > 0.1         # spatial features are bad negatives

        F_r0 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)) * 10
        F_r1 = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)) * 10
        pos2, neg2, _ = hardest_contrastive_loss(
            cfg, jax.random.PRNGKey(0), F_r0, xyz, v, F_r1, xyz, v,
        )
        assert float(pos2) > float(pos)  # random feats: positives now violated

    def test_loss_decreases_with_training(self, rng):
        batch = make_pair(rng)
        state = init_state(MODEL, CFG, batch["st0"], jax.random.PRNGKey(0))
        step = make_train_step(MODEL, CFG)
        losses = []
        for i in range(6):
            batch["key"] = jax.random.PRNGKey(i)
            state, m = step(state, batch)
            losses.append(float(m["loss"]))
            assert float(m["grad_finite"]) == 1.0
        assert losses[-1] < losses[0]
        assert int(state.step) == 6

    def test_multichip_dp(self, rng):
        from lidarreg.parallel.mesh import get_mesh

        mesh = get_mesh()
        n_dev = len(jax.devices())
        batch = make_pair(rng)
        batched = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (n_dev,) + x.shape), batch
        )
        state = init_state(MODEL, CFG, batch["st0"], jax.random.PRNGKey(0))
        step = make_train_step(MODEL, CFG, mesh=mesh)
        new_state, m = step(state, batched)
        assert np.isfinite(float(m["loss"]))
        assert int(new_state.step) == 1
