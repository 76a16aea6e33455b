"""Recall metrics.

One implementation for all recall paths (the reference computes recall three
different ways — metrics/recall.py:6-42, metrics/rank_distortion.py:47-102,
benchmarks/exact_search.py:80-101 — over redundant full decompress-and-scan
passes; SURVEY.md §3.1 flags this as a design bug to fix).  Here recall is a
pure set-overlap on (nq, k) id arrays; the scans that produce the ids live in
kernels/adc.py and run once.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np


def recall_at_k(true_ids: np.ndarray, retrieved_ids: np.ndarray, k: int) -> float:
    """Mean |gt_top_k ∩ retrieved_top_k| / k over queries.

    Matches reference metrics/recall.py:26-42 semantics: both arrays sorted
    best-first, truncated to k columns here.
    """
    true_ids = np.asarray(true_ids)[:, :k]
    retrieved_ids = np.asarray(retrieved_ids)[:, :k]
    hits = 0.0
    for t, r in zip(true_ids, retrieved_ids):
        hits += len(set(t.tolist()) & set(r.tolist())) / k
    return float(hits / len(true_ids))


def recall_at_ks(
    true_ids: np.ndarray, retrieved_ids: np.ndarray, ks: Sequence[int] = (1, 10, 100)
) -> Dict[int, float]:
    """Recall at several cutoffs (reference benchmarks/exact_search.py:80-101)."""
    max_k = min(true_ids.shape[1], retrieved_ids.shape[1])
    return {k: recall_at_k(true_ids, retrieved_ids, k) for k in ks if k <= max_k}


def evaluate_recall(index, queries: np.ndarray, ground_truth: np.ndarray) -> Dict[str, float]:
    """Search `index` and report recall@10/@100 (reference metrics/recall.py:6-24)."""
    k = min(100, ground_truth.shape[1])
    ids, _ = index.search_with_scores(queries, k=k)
    out = {}
    for kk in (10, 100):
        if kk <= k:
            out[f"recall@{kk}"] = recall_at_k(ground_truth, ids, kk)
    return out
