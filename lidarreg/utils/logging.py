"""Run logging: output dirs, tee printing, and a jsonl metrics writer.

Parity: FCGF_FAST/utils/experiment_utils.py:134-146 (print_to_file_and_screen)
and :547-560 (generate_output_dir, `outputs/<dataset>.<phase>.<timestamp>/`);
the jsonl MetricsLogger replaces the reference's TensorBoard SummaryWriter
(Experiments/libs/trainer.py:31,188-189 etc.) with a dependency-free format
that any dashboard can tail.
"""
from __future__ import annotations

import json
import os
import sys
import time
from typing import IO, Any


def generate_output_dir(base: str, dataset: str, phase: str,
                        tag: str = "") -> str:
    stamp = time.strftime("%y%m%d_%H%M%S")
    name = f"{dataset}.{phase}.{stamp}" + (f".{tag}" if tag else "")
    path = os.path.join(base, name)
    os.makedirs(path, exist_ok=True)
    return path


class Tee:
    """print to screen and a log file (print_to_file_and_screen)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.fid: IO = open(path, "a")

    def __call__(self, *args: Any):
        msg = " ".join(str(a) for a in args)
        print(msg, flush=True)
        self.fid.write(msg + "\n")
        self.fid.flush()

    def close(self):
        self.fid.close()


class MetricsLogger:
    """Append-only jsonl scalar stream (TensorBoard stand-in)."""

    def __init__(self, path: str):
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        self.path = path

    def log(self, step: int, **scalars):
        rec = {"step": int(step), "time": time.time()}
        for k, v in scalars.items():
            try:
                rec[k] = float(v)
            except (TypeError, ValueError):
                rec[k] = str(v)
        with open(self.path, "a") as f:
            f.write(json.dumps(rec) + "\n")

    def read(self):
        if not os.path.exists(self.path):
            return []
        with open(self.path) as f:
            return [json.loads(line) for line in f if line.strip()]
