from vq_tpu.metrics.recall import recall_at_k, recall_at_ks, evaluate_recall
from vq_tpu.metrics.distortion import (
    compute_distortion,
    reconstruction_mse,
)
from vq_tpu.metrics.pairwise import (
    compute_asymmetric_pairwise_distortion,
    compute_pairwise_distortion,
)
from vq_tpu.metrics.rank import compute_rank_distortion, compute_rank_distortion_per_query
from vq_tpu.metrics.performance import time_compress, time_decompress, measure_qps

__all__ = [
    "recall_at_k",
    "recall_at_ks",
    "evaluate_recall",
    "compute_distortion",
    "reconstruction_mse",
    "compute_pairwise_distortion",
    "compute_asymmetric_pairwise_distortion",
    "compute_rank_distortion",
    "compute_rank_distortion_per_query",
    "time_compress",
    "time_decompress",
    "measure_qps",
]
