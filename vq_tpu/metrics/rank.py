"""Rank distortion (reference metrics/rank_distortion.py:47-144).

Fraction of the true top-k neighbors missing from the retrieved top-k —
equal to 1 − recall@k.  The reference recomputes a full
decompress-then-brute-force scan here (its third redundant scan,
SURVEY.md §3.1); this implementation takes the retrieved ids from the one
fused ADC search instead.
"""

from __future__ import annotations

import numpy as np


def compute_rank_distortion_per_query(
    true_ids: np.ndarray, retrieved_ids: np.ndarray, k: int = 10
) -> np.ndarray:
    true_ids = np.asarray(true_ids)[:, :k]
    retrieved_ids = np.asarray(retrieved_ids)[:, :k]
    out = np.zeros(len(true_ids))
    for i, (t, r) in enumerate(zip(true_ids, retrieved_ids)):
        missing = len(set(t.tolist()) - set(r.tolist()))
        out[i] = missing / k
    return out


def compute_rank_distortion(
    true_ids: np.ndarray, retrieved_ids: np.ndarray, k: int = 10
) -> float:
    return float(np.mean(compute_rank_distortion_per_query(true_ids, retrieved_ids, k)))
