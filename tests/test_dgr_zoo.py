"""DGR inlier-net zoo: SimpleNet / PyramidNet families run + behave."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from lidarreg.models import (
    PyramidNet,
    PyramidNet6,
    SimpleNet,
    SimpleNet2,
    SimpleNetE,
    load_model,
)
from lidarreg.sparse.tensor import SparseTensor


def make_input(rng, cap=1024, dim=6, cin=6):
    coords = np.unique(
        rng.integers(-20, 20, (cap - cap // 8, dim)).astype(np.int32), axis=0
    )
    n = len(coords)
    coords = np.concatenate([coords, np.full((cap - n, dim), 2**20, np.int32)])
    valid = np.arange(cap) < n
    feats = rng.standard_normal((cap, cin)).astype(np.float32)
    feats[~valid] = 0
    return SparseTensor(
        jnp.asarray(coords), jnp.asarray(feats), jnp.asarray(valid), 1
    ), n


MODELS = [
    ("SimpleNet", SimpleNet),
    ("SimpleNetE", SimpleNetE),
    ("SimpleNet2", SimpleNet2),
    ("PyramidNet", PyramidNet),
]


class TestZoo:
    @pytest.mark.parametrize("name,ctor", MODELS)
    def test_forward_shapes(self, rng, name, ctor):
        # the DGR inlier nets run over 6-D pair coordinates (D=6 —
        # DGR/core/deep_global_registration.py:140-159)
        x, n = make_input(rng, cap=512)
        model = ctor(in_channels=6, out_channels=1, dim=6)
        params = model.init(jax.random.PRNGKey(0), x, train=False)
        out = model.apply(params, x, train=False)
        f = np.asarray(out.feats)
        assert f.shape == (512, 1)
        assert np.isfinite(f).all()
        assert np.abs(f[n:]).max() == 0.0        # padding stays dead
        assert np.abs(f[:n]).std() > 0           # logits vary

    def test_registry(self):
        assert load_model("SimpleNet2") is SimpleNet2
        assert load_model("PyramidNet6") is PyramidNet6
        assert load_model("ResUNetBN2C").__name__ == "ResUNetBN2C"
        with pytest.raises(KeyError):
            load_model("NopeNet")

    def test_simplenet_padding_invariance(self, rng):
        # same valid voxels, different padding -> same output on valid rows
        x1, n = make_input(rng, cap=512)
        coords = np.asarray(x1.coords).copy()
        feats = np.asarray(x1.feats).copy()
        coords[n:] = 2**19  # different junk coords
        x2 = SparseTensor(jnp.asarray(coords), jnp.asarray(feats),
                          x1.valid, 1)
        model = SimpleNet(in_channels=6, out_channels=1, dim=6,
                          compute_dtype=None)
        params = model.init(jax.random.PRNGKey(0), x1, train=False)
        o1 = np.asarray(model.apply(params, x1, train=False).feats)
        o2 = np.asarray(model.apply(params, x2, train=False).feats)
        np.testing.assert_allclose(o1[:n], o2[:n], atol=1e-4)

    def test_pyramidnet_grad_flows(self, rng):
        x, n = make_input(rng, cap=256, dim=3, cin=3)
        model = PyramidNet(in_channels=3, out_channels=1,
                           channels=(8, 16, 16), tr_channels=(16, 16, 16),
                           depths=(1, 1, 1), compute_dtype=None)
        params = model.init(jax.random.PRNGKey(0), x, train=True)

        def loss(p):
            out = model.apply(
                p, x, train=True, mutable=["batch_stats"]
            )[0]
            return jnp.sum(out.feats**2)

        g = jax.grad(lambda p: loss(p))(params)
        leaves = jax.tree_util.tree_leaves(g["params"])
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves)
