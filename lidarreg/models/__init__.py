from .pointdsc import PointDSC, NonLocalNet, NonLocalBlock, power_iteration  # noqa: F401
