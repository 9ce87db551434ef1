"""Checkpoint save/load: flax msgpack + config-snapshot discipline.

Parity: the reference snapshots model + config JSON per run
(Experiments/train.py:31-43, libs/trainer.py:284-292; FCGF .t7 with
model/optimizer/scheduler state, FCGF_FAST/net/train_FCGF.py:91-121).
"""
from __future__ import annotations

import json
import os
from typing import Any

import flax.serialization


def save_variables(path: str, variables: Any, config: dict | None = None,
                   store_bf16: bool = False):
    """Write a flax msgpack snapshot (+ optional config JSON).

    ``store_bf16=True`` downcasts float32 leaves to bfloat16 on disk —
    used for the DGR inlier net whose 6-D convs carry 3^6-point stencils
    (~944 MB at f32). Params in this repo are ALWAYS f32 in memory (bf16 is
    only ever a compute dtype), so ``load_variables`` upcasts any bf16 leaf
    back to f32 unambiguously.
    """
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    if store_bf16:
        import jax
        import jax.numpy as jnp

        variables = jax.tree_util.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == jnp.float32 else x,
            variables,
        )
    with open(path, "wb") as f:
        f.write(flax.serialization.to_bytes(variables))
    if config is not None:
        with open(path + ".config.json", "w") as f:
            json.dump(config, f, indent=2, default=str)


def load_variables(path: str, template: Any = None) -> Any:
    with open(path, "rb") as f:
        data = f.read()
    if template is not None:
        tree = flax.serialization.from_bytes(template, data)
    else:
        tree = flax.serialization.msgpack_restore(data)
    # Commit leaves to the default device once: msgpack_restore yields numpy
    # arrays, and feeding those to a jitted fn re-uploads the full tree on
    # EVERY call (~8 MB of FCGF weights -> ~760 ms/call over the TPU tunnel).
    # bf16 leaves are storage compression (see save_variables) -> back to f32.
    import jax
    import jax.numpy as jnp

    def _put(x):
        if not hasattr(x, "shape"):
            return x
        if getattr(x, "dtype", None) == jnp.bfloat16:
            return jax.device_put(x).astype(jnp.float32)
        return jax.device_put(x)

    return jax.tree_util.tree_map(_put, tree)


def load_config(path: str) -> dict:
    with open(path + ".config.json") as f:
        return json.load(f)
