from vq_tpu.core.config import (
    PQConfig,
    OPQConfig,
    SQConfig,
    RaBitQConfig,
    SAQConfig,
    LVQConfig,
    RankAwareConfig,
    KMeansConfig,
    IVFConfig,
    SearchConfig,
    Metric,
)

__all__ = [
    "PQConfig",
    "OPQConfig",
    "SQConfig",
    "RaBitQConfig",
    "SAQConfig",
    "LVQConfig",
    "RankAwareConfig",
    "KMeansConfig",
    "IVFConfig",
    "SearchConfig",
    "Metric",
]
