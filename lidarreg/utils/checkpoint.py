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
        return flax.serialization.from_bytes(template, data)
    return flax.serialization.msgpack_restore(data)


def load_config(path: str) -> dict:
    with open(path + ".config.json") as f:
        return json.load(f)
