from .gpf import grid_prioritized_filter  # noqa: F401
from .pipeline import match_pair, Correspondences  # noqa: F401
