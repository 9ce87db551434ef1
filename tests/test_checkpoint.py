"""Checkpoint save/load contract, incl. bf16 storage compression.

The DGR inlier net's 6-D convs carry 3^6-point stencils (~944 MB at f32);
`save_variables(..., store_bf16=True)` halves the on-disk artifact while
`load_variables` restores f32 in memory (params are ALWAYS f32 in memory in
this repo — bf16 is only ever a compute dtype, so a bf16 leaf in a msgpack
unambiguously means storage compression).

Parity: the reference snapshots model + config per run
(Experiments/train.py:31-43, libs/trainer.py:284-292).
"""
import json

import numpy as np
import jax.numpy as jnp

from lidarreg.utils.checkpoint import load_config, load_variables, save_variables


def _tree():
    return {
        "params": {
            "w": np.linspace(-3.0, 3.0, 1000).astype(np.float32).reshape(10, 100),
            "idx": np.arange(7, dtype=np.int32),
        },
        "batch_stats": {"mean": np.full((4,), 0.25, np.float32)},
    }


def test_f32_roundtrip_bitexact(tmp_path):
    p = str(tmp_path / "m.msgpack")
    save_variables(p, _tree(), config={"a": 1})
    back = load_variables(p)
    np.testing.assert_array_equal(
        np.asarray(back["params"]["w"]), _tree()["params"]["w"]
    )
    assert load_config(p) == {"a": 1}


def test_bf16_storage_halves_and_upcasts(tmp_path):
    t = _tree()
    p32 = str(tmp_path / "f32.msgpack")
    pbf = str(tmp_path / "bf16.msgpack")
    save_variables(p32, t)
    save_variables(pbf, t, store_bf16=True)
    import os

    # float payload halves (msgpack overhead is small at this size)
    assert os.path.getsize(pbf) < 0.62 * os.path.getsize(p32)

    back = load_variables(pbf)
    w = np.asarray(back["params"]["w"])
    assert w.dtype == np.float32  # upcast on load
    # bf16 has 8 mantissa bits -> relative error <= 2^-8
    np.testing.assert_allclose(w, t["params"]["w"], rtol=1 / 256, atol=1e-6)
    # non-float leaves untouched
    assert np.asarray(back["params"]["idx"]).dtype == np.int32
    np.testing.assert_array_equal(np.asarray(back["params"]["idx"]), t["params"]["idx"])


def test_bf16_roundtrip_is_idempotent(tmp_path):
    """Saving an already-bf16-stored tree again must not degrade further."""
    p1 = str(tmp_path / "a.msgpack")
    p2 = str(tmp_path / "b.msgpack")
    save_variables(p1, _tree(), store_bf16=True)
    once = load_variables(p1)
    save_variables(p2, once, store_bf16=True)
    twice = load_variables(p2)
    np.testing.assert_array_equal(
        np.asarray(once["params"]["w"]), np.asarray(twice["params"]["w"])
    )
