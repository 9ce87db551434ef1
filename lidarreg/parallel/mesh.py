"""Device-mesh helpers — the TPU-native replacement for the reference's NCCL
single-collective data parallelism (SURVEY.md §2c).

The reference's only parallelism is DP: one process per GPU, manual
`dist.all_reduce(grad, SUM)` (Experiments/libs/trainer.py:47-54,143-155).
Here the same thing is one jitted step under `shard_map` over a 1-D `data`
axis: gradients/metrics reduce with `lax.pmean` over ICI. Eval sharding
(test_parallel.sh's per-GPU process split) becomes the same mesh axis over
the pairs dimension — no tmp-file shard merge needed on a single host.
"""
from __future__ import annotations

from typing import Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(devices: Sequence[jax.Device] | None = None) -> Mesh:
    """1-D data-parallel mesh over all (or the given) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/pairs) axis across the data mesh axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
