from .posegraph import PoseGraphEdge, optimize_pose_graph  # noqa: F401
from .trajectory import (  # noqa: F401
    ate_rmse,
    multiway_register,
    read_trajectory,
    write_trajectory,
)
from .fragments import (  # noqa: F401
    CameraIntrinsic,
    TSDFVolume,
    depth_to_points,
    extract_surface_points,
    integrate_frame,
    make_fragment,
    rgbd_odometry,
)
from .fileio import (  # noqa: F401
    get_rgbd_file_lists,
    initialize_config,
    make_clean_folder,
    read_depth_png,
    sorted_alphanum,
)
