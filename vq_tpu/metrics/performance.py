"""Latency / throughput metrics (reference metrics/performance.py:19-89,
benchmarks/search_bench.py:115-126).

All timings block on device completion (`block_until_ready` via np.asarray)
and use best-of-N wall clocks.  `measure_qps` times end-to-end index search —
the honest definition (the reference's codebook-probe proxy,
performance.py:35-89, is kept out; search QPS is what BASELINE.json's
north-star metric asks for).
"""

from __future__ import annotations

from time import perf_counter
from typing import Dict, Tuple

import numpy as np


def time_compress(model, X: np.ndarray) -> Tuple[np.ndarray, float]:
    start = perf_counter()
    codes = model.compress(X)
    codes = np.asarray(codes)
    return codes, float(perf_counter() - start)


def time_decompress(model, codes: np.ndarray) -> Tuple[np.ndarray, float]:
    start = perf_counter()
    rec = np.asarray(model.decompress(codes))
    return rec, float(perf_counter() - start)


def measure_qps(
    index,
    queries: np.ndarray,
    k: int = 10,
    repeats: int = 3,
    warmup: int = 1,
) -> Dict[str, float]:
    """End-to-end search throughput, best-of-`repeats` after `warmup` runs
    (warmup absorbs jit compilation)."""
    queries = np.asarray(queries, dtype=np.float32)
    if queries.ndim == 1:
        queries = queries[None, :]
    for _ in range(warmup):
        index.search_with_scores(queries, k=k)
    durations = []
    for _ in range(max(1, repeats)):
        start = perf_counter()
        index.search_with_scores(queries, k=k)
        durations.append(max(perf_counter() - start, 1e-12))
    nq = float(len(queries))
    qps = [nq / d for d in durations]
    lat = [d / nq * 1000.0 for d in durations]
    return {
        "qps": float(np.max(qps)),
        "qps_mean": float(np.mean(qps)),
        "qps_std": float(np.std(qps)),
        "avg_query_latency_ms": float(np.min(lat)),
        "latency_ms_std": float(np.std(lat)),
    }
