"""Tests for the PointDSC model + losses."""
import numpy as np
import jax
import jax.numpy as jnp

from lidarreg.models import PointDSC, power_iteration
from lidarreg.core import registration_success
from lidarreg.core.se3 import euler_to_rotation
from lidarreg.train.losses import (
    transformation_loss,
    classification_loss,
    spectral_matching_loss,
)


def make_data(rng, n=256, inlier_frac=0.4):
    R = np.asarray(euler_to_rotation(jnp.asarray([0.02, -0.01, 0.8])))
    t = np.array([3.0, -1.0, 0.1])
    T = np.eye(4); T[:3, :3] = R; T[:3, 3] = t
    src = rng.uniform(-40, 40, size=(1, n, 3)).astype(np.float32)
    src[..., 2] = rng.uniform(-2, 2, size=(1, n))
    tgt = (src @ R.T + t).astype(np.float32)
    n_out = int(n * (1 - inlier_frac))
    sel = rng.choice(n, n_out, replace=False)
    tgt[0, sel] = rng.uniform(-40, 40, size=(n_out, 3))
    tgt += rng.normal(size=tgt.shape).astype(np.float32) * 0.03
    labels = np.ones((1, n), np.float32)
    labels[0, sel] = 0.0
    corr_pos = np.concatenate(
        [src - src.mean(1, keepdims=True), tgt - tgt.mean(1, keepdims=True)],
        axis=-1,
    ).astype(np.float32)
    data = {
        "corr_pos": jnp.asarray(corr_pos),
        "src_keypts": jnp.asarray(src),
        "tgt_keypts": jnp.asarray(tgt),
    }
    return data, T, labels


class TestPowerIteration:
    def test_matches_eigh(self, rng):
        A = rng.normal(size=(4, 16, 16)).astype(np.float32)
        M = np.abs(A @ A.transpose(0, 2, 1))  # PF-like nonneg symmetric
        v = np.asarray(power_iteration(jnp.asarray(M), 50))
        for b in range(4):
            w, V = np.linalg.eigh(M[b])
            lead = V[:, -1] * np.sign(V[:, -1].sum())
            got = v[b] / np.linalg.norm(v[b])
            got = got * np.sign(got.sum())
            np.testing.assert_allclose(got, lead, atol=1e-3)


class TestPointDSC:
    def _init(self, rng, data, **kw):
        model = PointDSC(num_layers=2, num_channels=32, ratio=0.1, k=20,
                         inlier_threshold=1.2, sigma_d=1.2, nms_radius=1.2, **kw)
        variables = model.init(jax.random.PRNGKey(0), data, testing=False,
                               train=False)
        return model, variables

    def test_untrained_geometry_pipeline_registers(self, rng):
        # Even untrained, the spatial-consistency + power-iteration + Kabsch
        # pipeline should find the rigid motion with 40% inliers.
        data, T_gt, _ = make_data(rng)
        model, variables = self._init(rng, data)
        out = model.apply(variables, data, testing=True, train=False)
        ok, re, te = registration_success(
            out["final_trans"][0], jnp.asarray(T_gt)
        )
        assert bool(ok), f"RE={float(re):.3f} TE={float(te):.3f}"

    def test_train_mode_outputs(self, rng):
        data, T_gt, labels = make_data(rng)
        model, variables = self._init(rng, data)
        out, _ = model.apply(
            variables, data, testing=False, train=True,
            mutable=["batch_stats"],
        )
        n = data["corr_pos"].shape[1]
        assert out["M"].shape == (1, n, n)
        assert out["final_labels"].shape == (1, n)
        assert out["final_trans"].shape == (1, 4, 4)
        # M diagonal zeroed
        assert float(jnp.abs(jnp.diagonal(out["M"], axis1=1, axis2=2)).max()) == 0.0

    def test_jit_forward(self, rng):
        data, T_gt, _ = make_data(rng)
        model, variables = self._init(rng, data)
        f = jax.jit(
            lambda v, d: model.apply(v, d, testing=True, train=False)
        )
        out = f(variables, data)
        assert np.isfinite(np.asarray(out["final_trans"])).all()

    def test_losses_gradient_flow(self, rng):
        data, T_gt, labels = make_data(rng)
        model, variables = self._init(rng, data)
        params = variables["params"]
        others = {k: v for k, v in variables.items() if k != "params"}

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, **others}, data, testing=False, train=True,
                mutable=["batch_stats"],
            )
            cls = classification_loss(out["final_labels"], jnp.asarray(labels))
            sm = spectral_matching_loss(out["M"], jnp.asarray(labels))
            tl = transformation_loss(
                out["final_trans"], jnp.asarray(T_gt)[None],
                data["src_keypts"], data["tgt_keypts"],
                out["final_labels"],
            )
            return cls["loss"] + sm + tl["loss"]

        g = jax.grad(loss_fn)(params)
        flat = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(x)).all() for x in flat)
        assert any(float(jnp.abs(x).max()) > 0 for x in flat)


class TestLosses:
    def test_classification_balanced(self, rng):
        gt = jnp.asarray(np.r_[np.ones(10), np.zeros(90)][None].astype(np.float32))
        pred_good = jnp.asarray(np.r_[np.ones(10) * 5, -np.ones(90) * 5][None].astype(np.float32))
        pred_bad = -pred_good
        lg = classification_loss(pred_good, gt)
        lb = classification_loss(pred_bad, gt)
        assert float(lg["loss"]) < float(lb["loss"])
        assert float(lg["precision"]) == 1.0 and float(lg["recall"]) == 1.0

    def test_transformation_loss_recall(self, rng):
        T = np.eye(4)[None].astype(np.float32)
        src = jnp.asarray(rng.normal(size=(1, 50, 3)).astype(np.float32))
        out = transformation_loss(jnp.asarray(T), jnp.asarray(T), src, src,
                                  jnp.ones((1, 50)))
        assert float(out["recall"]) == 100.0
        assert float(out["loss"]) < 1e-9

    def test_spectral_matching(self):
        labels = jnp.asarray([[1.0, 1.0, 0.0]])
        gt_M = np.array([[0, 1, 0], [1, 0, 0], [0, 0, 0]], np.float32)[None]
        assert float(spectral_matching_loss(jnp.asarray(gt_M), labels)) < 1e-9
        bad = jnp.asarray(1.0 - gt_M)
        assert float(spectral_matching_loss(bad, labels)) > 0.5
