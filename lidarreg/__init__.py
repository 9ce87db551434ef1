"""lidarreg — TPU-native LiDAR point-cloud registration benchmark stack."""
from . import core, ops, match, solvers, models, sparse, data, bench  # noqa: F401

__version__ = "0.1.0"
