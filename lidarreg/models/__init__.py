from .pointdsc import PointDSC, NonLocalNet, NonLocalBlock, power_iteration  # noqa: F401
from .fcgf import (  # noqa: F401
    ResUNetBN2,
    ResUNetBN2B,
    ResUNetBN2C,
    ResUNetBN2D,
    ResUNetBN2E,
    ResUNetBN2F,
    MODEL_REGISTRY,
)
from .dgr_zoo import (  # noqa: F401
    PyramidNet,
    PyramidNet6,
    SimpleNet,
    SimpleNet2,
    SimpleNetE,
)
from .oanet import OANet  # noqa: F401
from .port_fcgf import load_torch_state, port_fcgf_state, validate_port  # noqa: F401

# full model registry (DGR/model/__init__.py:12-38 load_model equivalent,
# spanning the ResUNet + SimpleNet + PyramidNet families)
MODEL_REGISTRY = dict(
    MODEL_REGISTRY,
    SimpleNet=SimpleNet,
    SimpleNetE=SimpleNetE,
    SimpleNet2=SimpleNet2,
    PyramidNet=PyramidNet,
    PyramidNet6=PyramidNet6,
)


def load_model(name: str):
    """Model-name lookup across every family (DGR/model/__init__.py:32-38)."""
    if name not in MODEL_REGISTRY:
        raise KeyError(f"unknown model {name}; have {sorted(MODEL_REGISTRY)}")
    return MODEL_REGISTRY[name]
