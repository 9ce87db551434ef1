from .posegraph import PoseGraphEdge, optimize_pose_graph  # noqa: F401
from .trajectory import (  # noqa: F401
    ate_rmse,
    multiway_register,
    read_trajectory,
    write_trajectory,
)
