from . import se3, kabsch, metrics  # noqa: F401
from .se3 import transform, integrate, decompose, concatenate, inverse  # noqa: F401
from .kabsch import weighted_kabsch, rigid_transform_3d, kabsch_svd  # noqa: F401
from .metrics import (  # noqa: F401
    registration_errors,
    registration_success,
    rotation_error_deg,
    translation_error,
    inlier_ratio,
)
