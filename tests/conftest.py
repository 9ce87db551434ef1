"""Test configuration: run everything on an 8-device virtual CPU mesh.

Replaces the reference's "N GPUs via bash + CUDA_VISIBLE_DEVICES" parallelism
testing story (Experiments/test_parallel.sh) with an actually-testable
mechanism: XLA host-platform device-count override (SURVEY.md §4).
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

# The container sitecustomize may have already registered a TPU backend and
# pinned jax_platforms before conftest runs; force CPU for the test suite.
jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(51)  # set_seed(51): Experiments/evaluation/benchmark_utils.py:27-38
