from vq_tpu.kernels.kmeans import kmeans, kmeans_batched, assign, assign_batched
from vq_tpu.kernels.adc import (
    pairwise_sqdist,
    decode_pq,
    build_lut,
    scan_codes_topk,
    scan_generic_topk,
    exact_topk,
)

__all__ = [
    "kmeans",
    "kmeans_batched",
    "assign",
    "assign_batched",
    "pairwise_sqdist",
    "decode_pq",
    "build_lut",
    "scan_codes_topk",
    "scan_generic_topk",
    "exact_topk",
]
