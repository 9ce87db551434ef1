from .balanced import (  # noqa: F401
    BalancedPairs,
    read_balanced_set,
    write_balanced_set,
    resolve_dataset_name,
    balanced_set_path,
    default_balanced_root,
    DATASET_NICKNAMES,
)
from .adapters import make_dataset, SyntheticBalancedDataset  # noqa: F401
from .raw import (  # noqa: F401
    KITTIOdometryFull,
    ApolloSouthbayFull,
    NuScenesFull,
    LyftLEVEL5Full,
    RawBalancedDataset,
    make_full_dataset,
    read_pcd,
    read_velodyne_bin,
    read_nuscenes_bin,
)
from .pipeline import (  # noqa: F401
    FeaturePipeline,
    pad_cloud,
    prepare_sparse_input,
    prepare_pair_sparse_input,
    build_pointdsc_input,
)
from . import augment  # noqa: F401
from .fileio import read_ply, write_ply  # noqa: F401
