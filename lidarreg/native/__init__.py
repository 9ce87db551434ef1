"""ctypes bindings for the native C++ components.

The reference leans on four native libraries (SURVEY.md §2a); this package
hosts the rebuilt ones. Currently:
  * max_clique — exact branch-and-bound maximum clique (PMC replacement;
    Experiments/utils/max_clique.py:9-40) with a wall-clock budget that
    mirrors the TEASER FAIL_TOLERANT watchdog semantics.

The shared library builds on demand with the baked-in g++ (`make -C
native/`); `ensure_built()` does this lazily so fresh clones work without a
separate build step.
"""
from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB_PATH = os.path.abspath(os.path.join(_NATIVE_DIR, "liblidarreg_native.so"))
_lib = None


def ensure_built() -> str:
    global _lib
    if not os.path.exists(_LIB_PATH):
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True,
        )
    return _LIB_PATH


def _load():
    global _lib
    if _lib is None:
        lib = ctypes.CDLL(ensure_built())
        lib.max_clique.restype = ctypes.c_int
        lib.max_clique.argtypes = [
            ctypes.POINTER(ctypes.c_uint8),
            ctypes.c_int,
            ctypes.POINTER(ctypes.c_int),
            ctypes.c_double,
        ]
        _lib = lib
    return _lib


def max_clique(adj: np.ndarray, time_budget_sec: float = 10.0) -> np.ndarray:
    """Exact maximum clique of a boolean adjacency matrix.

    Returns the vertex indices of the best clique found within the budget
    (exact if the search completes; the reference's PMC watchdog also
    truncates at 10 s — TEASER_plus_plus.py:16-59).
    """
    lib = _load()
    adj = np.ascontiguousarray(adj.astype(np.uint8))
    n = adj.shape[0]
    assert adj.shape == (n, n)
    out = np.zeros(n, dtype=np.int32)
    size = lib.max_clique(
        adj.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        float(time_budget_sec),
    )
    return np.sort(out[:size])
