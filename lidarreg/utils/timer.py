"""Wall-clock timers — benchmark timing is a first-class output.

Parity: Experiments/utils/timer.py:4-56 (Timer with tic/toc/avg/diff,
AverageMeter) and the TicToc stack (FCGF_FAST/general/TicToc.py). On TPU,
callers must `jax.block_until_ready` the timed computation's outputs before
`toc()` — async dispatch otherwise makes every region look free (the
harness does this; see bench/harness.py).
"""
from __future__ import annotations

import time


class Timer:
    def __init__(self):
        self.reset()

    def reset(self):
        self.total_time = 0.0
        self.calls = 0
        self.start_time = 0.0
        self.diff = 0.0
        self.avg = 0.0

    def tic(self):
        self.start_time = time.perf_counter()

    def toc(self, average: bool = True) -> float:
        self.diff = time.perf_counter() - self.start_time
        self.total_time += self.diff
        self.calls += 1
        self.avg = self.total_time / self.calls
        return self.avg if average else self.diff


class AverageMeter:
    def __init__(self):
        self.reset()

    def reset(self):
        self.val = 0.0
        self.avg = 0.0
        self.sum = 0.0
        self.sq_sum = 0.0
        self.count = 0

    def update(self, val, n: int = 1):
        self.val = val
        self.sum += val * n
        self.count += n
        self.avg = self.sum / self.count
        self.sq_sum += val * val * n

    @property
    def std(self) -> float:
        if self.count < 2:
            return 0.0
        var = self.sq_sum / self.count - self.avg**2
        return max(var, 0.0) ** 0.5


class TicToc:
    """Named timer stack (FCGF_FAST/general/TicToc.py semantics)."""

    def __init__(self):
        self._stack = []
        self.records = {}

    def tic(self, name: str = ""):
        self._stack.append((name, time.perf_counter()))

    def toc(self, name: str | None = None) -> float:
        tag, t0 = self._stack.pop()
        dt = time.perf_counter() - t0
        key = name or tag
        self.records.setdefault(key, []).append(dt)
        return dt
