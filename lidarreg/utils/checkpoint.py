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


def save_variables(path: str, variables: Any, config: dict | None = None):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
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
    import jax

    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x) if hasattr(x, "shape") else x, tree
    )


def load_config(path: str) -> dict:
    with open(path + ".config.json") as f:
        return json.load(f)
