"""Pairwise distance distortion (reference metrics/pairwise_distortion.py:37-106).

For random distinct pairs (i, j):  distortion = |‖x̂_i−x̂_j‖ / ‖x_i−x_j‖ − 1|.
Reported as mean/median/max/std.  Computed on decompressed pairs only (2·P
rows), never the full corpus.
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def compute_pairwise_distortion(
    X: np.ndarray,
    X_hat: np.ndarray,
    num_pairs: int = 1000,
    seed: int = 42,
) -> Dict[str, float]:
    rng = np.random.default_rng(seed)
    n = len(X)
    idx1 = rng.integers(0, n, num_pairs)
    idx2 = rng.integers(0, n, num_pairs)
    mask = idx1 != idx2
    idx1, idx2 = idx1[mask], idx2[mask]
    if len(idx1) == 0:
        m = min(num_pairs, n - 1)
        idx1 = np.arange(m)
        idx2 = np.arange(m) + 1

    X = np.asarray(X, dtype=np.float32)
    X_hat = np.asarray(X_hat, dtype=np.float32)
    orig = np.linalg.norm(X[idx1] - X[idx2], axis=1)
    comp = np.linalg.norm(X_hat[idx1] - X_hat[idx2], axis=1)
    rel = np.abs(comp / (orig + 1e-10) - 1.0)
    return {
        "mean": float(np.mean(rel)),
        "median": float(np.median(rel)),
        "max": float(np.max(rel)),
        "std": float(np.std(rel)),
        "num_pairs": int(len(idx1)),
    }
