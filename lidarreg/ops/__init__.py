from . import knn, voxelize  # noqa: F401
from .knn import find_nn, mutual_nn_mask, feature_distance_ratio, knn_graph  # noqa: F401
from .voxelize import voxelize as voxelize_points  # noqa: F401
from .voxelize import voxel_down_sample, quantize_coords, VoxelizeResult  # noqa: F401
