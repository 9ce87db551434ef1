"""Trainer tests: single-device step + 8-device shard_map DP equivalence."""
import numpy as np
import jax
import jax.numpy as jnp

from lidarreg.models import PointDSC
from lidarreg.parallel.mesh import get_mesh
from lidarreg.train.pointdsc_trainer import (
    PointDSCTrainerConfig,
    init_state,
    make_train_step,
)


def make_batch(rng, bs=8, n=64):
    src = rng.uniform(-30, 30, size=(bs, n, 3)).astype(np.float32)
    R = np.eye(3, dtype=np.float32)
    tgt = src + rng.normal(size=(bs, n, 3)).astype(np.float32) * 0.05
    labels = (rng.uniform(size=(bs, n)) < 0.4).astype(np.float32)
    gt = np.broadcast_to(np.eye(4, dtype=np.float32), (bs, 4, 4)).copy()
    corr = np.concatenate([src, tgt], -1).astype(np.float32)
    return {
        "corr_pos": jnp.asarray(corr),
        "src_keypts": jnp.asarray(src),
        "tgt_keypts": jnp.asarray(tgt),
        "gt_trans": jnp.asarray(gt),
        "gt_labels": jnp.asarray(labels),
    }


MODEL = PointDSC(num_layers=1, num_channels=16, ratio=0.1, k=8)
CFG = PointDSCTrainerConfig(steps_per_epoch=10)


class TestTrainStep:
    def test_single_device_step_decreases_loss(self, rng):
        batch = make_batch(rng)
        state = init_state(MODEL, CFG, batch, jax.random.PRNGKey(0))
        step = make_train_step(MODEL, CFG)
        losses = []
        for _ in range(8):
            state, metrics = step(state, batch)
            losses.append(float(metrics["loss"]))
        assert losses[-1] < losses[0]
        assert float(metrics["grad_finite"]) == 1.0
        assert int(state.step) == 8

    def test_multichip_dp_matches_single(self, rng):
        # With 8 identical batch items, per-shard BatchNorm stats equal the
        # global stats (per-device BN matches the reference's per-GPU BN), so
        # the sharded update must match the single-device one numerically.
        assert jax.device_count() == 8, "conftest must provide 8 CPU devices"
        one = make_batch(rng, bs=1)
        batch = jax.tree.map(lambda x: jnp.repeat(x, 8, axis=0), one)
        state = init_state(MODEL, CFG, batch, jax.random.PRNGKey(0))

        step1 = make_train_step(MODEL, CFG)
        mesh = get_mesh()
        step8 = make_train_step(MODEL, CFG, mesh=mesh)

        s1, m1 = step1(state, batch)
        s8, m8 = step8(state, batch)
        np.testing.assert_allclose(
            float(m1["cls_loss"]), float(m8["cls_loss"]), rtol=1e-3
        )
        d1 = jax.tree.map(lambda a, b: np.asarray(a - b), s1.params, state.params)
        d8 = jax.tree.map(lambda a, b: np.asarray(a - b), s8.params, state.params)
        l1 = np.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(d1)])
        l8 = np.concatenate([x.ravel() for x in jax.tree_util.tree_leaves(d8)])
        cos = (l1 @ l8) / (np.linalg.norm(l1) * np.linalg.norm(l8) + 1e-12)
        assert cos > 0.99, f"DP update direction diverges: cos={cos:.3f}"

    def test_nonfinite_grad_skips_update(self, rng):
        batch = make_batch(rng)
        bad = dict(batch)
        bad["src_keypts"] = batch["src_keypts"].at[0, 0, 0].set(jnp.nan)
        bad["corr_pos"] = batch["corr_pos"].at[0, 0, 0].set(jnp.nan)
        state = init_state(MODEL, CFG, batch, jax.random.PRNGKey(0))
        step = make_train_step(MODEL, CFG)
        new_state, metrics = step(state, bad)
        assert float(metrics["grad_finite"]) == 0.0
        p0 = jax.tree_util.tree_leaves(state.params)
        p1 = jax.tree_util.tree_leaves(new_state.params)
        for a, b in zip(p0, p1):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
