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
        dp = ctypes.POINTER(ctypes.c_double)
        lib.gc_local_optimize.restype = ctypes.c_int
        lib.gc_local_optimize.argtypes = [
            dp, dp, ctypes.c_int, dp,
            ctypes.c_double, ctypes.c_double, ctypes.c_double,
            ctypes.c_int, ctypes.c_int,
            dp, ctypes.POINTER(ctypes.c_uint8),
        ]
        lib.graph_cut_labeling.restype = ctypes.c_int
        lib.graph_cut_labeling.argtypes = [
            dp, dp, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int, dp,
            ctypes.c_double, ctypes.c_double,
            ctypes.POINTER(ctypes.c_uint8),
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


def gc_local_optimize(
    src: np.ndarray,
    dst: np.ndarray,
    init_pose: np.ndarray,
    threshold: float = 0.6,
    spatial_coherence_weight: float = 0.0,
    neighborhood_radius: float = 20.0,
    max_lo_iters: int = 20,
    max_degree: int = 32,
):
    """Graph-cut local optimization oracle (GC-RANSAC LO semantics, CPU).

    Mirrors the LO stage bound by the reference
    (GC-RANSAC/src/pygcransac/src/gcransac_python.cpp:404-624): exact s-t
    min-cut labeling under the Barath-Matas energy on the 6-D radius
    neighborhood graph, iterated with least-squares Kabsch refits. The
    reference harness runs it with spatial_coherence_weight=0.0
    (Experiments/test.py:306) and neighborhood_size=20
    (algorithms/GC_RANSAC.py:21).

    Returns (pose [4,4] float64, labels [N] bool, inlier_count).
    """
    src = np.ascontiguousarray(src, np.float64)
    dst = np.ascontiguousarray(dst, np.float64)
    n = src.shape[0]
    assert src.shape == dst.shape == (n, 3)
    init = np.ascontiguousarray(init_pose, np.float64).reshape(16)
    out_pose = np.zeros(16, np.float64)
    out_labels = np.zeros(n, np.uint8)
    lib = _load()
    dp = ctypes.POINTER(ctypes.c_double)
    count = lib.gc_local_optimize(
        src.ctypes.data_as(dp), dst.ctypes.data_as(dp), n,
        init.ctypes.data_as(dp),
        float(threshold), float(spatial_coherence_weight),
        float(neighborhood_radius), int(max_lo_iters), int(max_degree),
        out_pose.ctypes.data_as(dp),
        out_labels.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out_pose.reshape(4, 4), out_labels.astype(bool), int(count)
