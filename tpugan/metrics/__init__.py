from tpugan.metrics.fid import (  # noqa: F401
    activation_statistics,
    frechet_distance,
    fid_from_features,
)
