from .ransac import ransac_register, RansacConfig, RansacResult  # noqa: F401
