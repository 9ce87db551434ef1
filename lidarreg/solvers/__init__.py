from .ransac import ransac_register, RansacConfig, RansacResult  # noqa: F401
from .icp import icp_point_to_point, grid_nn, build_grid  # noqa: F401
from .dgr import (  # noqa: F401
    DGRConfig,
    DGRResult,
    calibrate_clip_weight_thresh,
    global_registration,
    high_dim_smooth_l1,
    make_dgr_register,
    ortho6d_to_rotation,
)
from .teaser import TeaserConfig, TeaserResult, teaser_register  # noqa: F401
from .refinement import bbr_f, estimate_normals, refine_all, symmetric_icp  # noqa: F401
from .baselines import pmc_register, spectral_matching_register  # noqa: F401
