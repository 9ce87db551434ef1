"""FCGF .pth porting tool tests against a synthetic reference state_dict."""
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from lidarreg.models.fcgf import ResUNetBN2C
from lidarreg.models.port_fcgf import (
    _offset_perm,
    load_torch_state,
    port_fcgf_state,
    validate_port,
)

CH = [None, 32, 64, 128, 256]
TR = [None, 64, 64, 64, 128]


def fake_state(rng):
    """state_dict with the reference's exact key/shape layout
    (misc/fcgf.py:229-798 + MinkowskiBatchNorm '.bn.' nesting). Kernel scale
    ~fan-in so the 14-layer synthetic stack keeps sane magnitudes (random
    std-1 weights overflow f32 in the final L2-norm)."""
    sd = {}

    def conv(name, j, cin, cout, bias=False, k1=False):
        s = 1.0 / np.sqrt(max(cin * j, 1))
        if k1:
            sd[f"{name}.kernel"] = (s * rng.standard_normal((cin, cout))).astype(np.float32)
        else:
            sd[f"{name}.kernel"] = (s * rng.standard_normal((j, cin, cout))).astype(np.float32)
        if bias:
            sd[f"{name}.bias"] = rng.standard_normal((1, cout)).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.bn.weight"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.bn.bias"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.bn.running_mean"] = rng.standard_normal(c).astype(np.float32)
        sd[f"{name}.bn.running_var"] = rng.uniform(0.5, 2, c).astype(np.float32)
        sd[f"{name}.bn.num_batches_tracked"] = np.asarray(7)

    def block(name, c):
        conv(f"{name}.conv1", 27, c, c)
        bn(f"{name}.norm1", c)
        conv(f"{name}.conv2", 27, c, c)
        bn(f"{name}.norm2", c)

    conv("conv1", 125, 1, CH[1])
    bn("norm1", CH[1])
    block("block1", CH[1])
    for lvl in (2, 3, 4):
        conv(f"conv{lvl}", 27, CH[lvl - 1], CH[lvl])
        bn(f"norm{lvl}", CH[lvl])
        block(f"block{lvl}", CH[lvl])
    conv("conv4_tr", 27, CH[4], TR[4])
    bn("norm4_tr", TR[4])
    block("block4_tr", TR[4])
    conv("conv3_tr", 27, TR[4] + CH[3], TR[3])
    bn("norm3_tr", TR[3])
    block("block3_tr", TR[3])
    conv("conv2_tr", 27, TR[3] + CH[2], TR[2])
    bn("norm2_tr", TR[2])
    block("block2_tr", TR[2])
    conv("conv1_tr", 1, TR[2] + CH[1], TR[1], k1=True)
    conv("final", 1, TR[1], 32, bias=True, k1=True)
    return sd


class TestOffsetPerm:
    def test_identity_zyx(self):
        np.testing.assert_array_equal(_offset_perm(3, 3, "zyx"), np.arange(27))

    def test_xyz_is_transpose(self):
        # x-fastest <-> z-fastest is the axis-reversal permutation
        perm = _offset_perm(3, 3, "xyz")
        ours = np.arange(27).reshape(3, 3, 3)          # [x, y, z], z fastest
        np.testing.assert_array_equal(
            perm.reshape(3, 3, 3), ours.transpose(2, 1, 0)
        )

    def test_involution(self):
        perm = _offset_perm(5, 3, "xyz")
        np.testing.assert_array_equal(perm[perm], np.arange(125))


class TestPort:
    def test_structural_match(self, rng):
        sd = fake_state(rng)
        variables = port_fcgf_state(sd)
        problems = validate_port(variables, ResUNetBN2C())
        assert problems == [], problems[:10]

    def test_numeric_validation_against_me_oracle(self, rng):
        """Every ported K>1 conv kernel reproduces the dense ME oracle."""
        sd = fake_state(rng)
        variables = port_fcgf_state(sd)
        problems = validate_port(variables, ResUNetBN2C(), state=sd)
        assert problems == [], problems[:10]

    def test_numeric_validation_catches_wrong_flip(self, rng):
        sd = fake_state(rng)
        variables = port_fcgf_state(sd, transpose_flip=False)
        problems = validate_port(
            variables, ResUNetBN2C(), state=sd, transpose_flip=False
        )
        assert any(p.startswith("numeric conv") and "_tr" in p
                   for p in problems), problems[:10]

    def test_values_land(self, rng):
        sd = fake_state(rng)
        variables = port_fcgf_state(sd, offset_order="zyx")
        np.testing.assert_array_equal(
            variables["params"]["conv1"]["kernel"], sd["conv1.kernel"]
        )
        np.testing.assert_array_equal(
            variables["batch_stats"]["norm2_tr"]["var"],
            sd["norm2_tr.bn.running_var"],
        )
        np.testing.assert_array_equal(
            variables["params"]["final"]["bias"], sd["final.bias"].reshape(-1)
        )
        assert variables["params"]["final"]["kernel"].shape == (1, TR[1], 32)

    def test_offset_order_permutes_conv1(self, rng):
        sd = fake_state(rng)
        vz = port_fcgf_state(sd, offset_order="zyx")
        vx = port_fcgf_state(sd, offset_order="xyz")
        kz = vz["params"]["conv1"]["kernel"]
        kx = vx["params"]["conv1"]["kernel"]
        assert not np.array_equal(kz, kx)
        perm = _offset_perm(5, 3, "xyz")
        np.testing.assert_array_equal(kx, kz[perm])

    def test_ported_forward_runs(self, rng):
        import jax
        import jax.numpy as jnp
        from lidarreg.sparse.tensor import SparseTensor

        sd = fake_state(rng)
        variables = port_fcgf_state(sd)
        coords = np.unique(
            rng.integers(-30, 30, (512, 3)).astype(np.int32), axis=0
        )
        cap = 512
        n = len(coords)
        coords = np.concatenate(
            [coords, np.full((cap - n, 3), 2**20, np.int32)]
        )
        x = SparseTensor(
            jnp.asarray(coords), jnp.ones((cap, 1), jnp.float32),
            jnp.asarray(np.arange(cap) < n), 1,
        )
        model = ResUNetBN2C()
        out = model.apply(
            jax.tree_util.tree_map(jnp.asarray, variables), x, train=False
        )
        feats = np.asarray(out.feats)
        assert np.isfinite(feats).all()
        np.testing.assert_allclose(
            np.linalg.norm(feats[:n], axis=1), 1.0, atol=1e-2
        )

    def test_load_torch_file(self, rng, tmp_path):
        sd = fake_state(rng)
        blob = {"state_dict": {k: torch.as_tensor(v) for k, v in sd.items()},
                "epoch": 99}
        path = str(tmp_path / "ckpt.pth")
        torch.save(blob, path)
        loaded = load_torch_state(path)
        np.testing.assert_array_equal(loaded["conv1.kernel"], sd["conv1.kernel"])

    def test_cli_main_ports_and_validates(self, rng, tmp_path):
        # `python -m lidarreg.models.port_fcgf IN.pth OUT.msgpack`
        from lidarreg.models.port_fcgf import main
        from lidarreg.utils.checkpoint import load_variables

        sd = fake_state(rng)
        blob = {"state_dict": {k: torch.as_tensor(v) for k, v in sd.items()}}
        src = str(tmp_path / "ref.pth")
        dst = str(tmp_path / "ported.msgpack")
        torch.save(blob, src)
        main([src, dst])
        variables = load_variables(dst)
        assert "params" in variables and "batch_stats" in variables
        import json, os
        cfgf = dst + ".config.json"
        if os.path.exists(cfgf):
            assert json.load(open(cfgf))["ported_from"] == src
