from . import knn, voxelize, subsample, fpfh  # noqa: F401
from .knn import find_nn, mutual_nn_mask, feature_distance_ratio, knn_graph  # noqa: F401
from .voxelize import voxelize as voxelize_points  # noqa: F401
from .voxelize import voxel_down_sample, quantize_coords, VoxelizeResult  # noqa: F401
from .subsample import farthest_point_sampling, radius_normalized_sampling, remove_road  # noqa: F401
from .fpfh import fpfh  # noqa: F401
