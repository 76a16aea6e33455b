"""Reconstruction distortion metrics.

Two conventions coexist in the reference and both are kept:
- `compute_distortion` — mean per-vector squared error, Σ_d (x−x̂)² averaged
  over rows (reference metrics/distortion.py:4-7, the sweep pipeline).
- `reconstruction_mse` — mean per-element squared error (reference
  benchmarks/exact_search.py:104-121, the study pipeline; the 5e-6-scale
  numbers in BASELINE.md).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def compute_distortion(X: np.ndarray, X_hat: np.ndarray) -> float:
    diffs = np.asarray(X, dtype=np.float32) - np.asarray(X_hat, dtype=np.float32)
    return float(np.mean(np.sum(diffs**2, axis=1)))


def reconstruction_mse(
    X: np.ndarray, X_hat: np.ndarray, sample: Optional[int] = None
) -> float:
    X = np.asarray(X, dtype=np.float32)
    X_hat = np.asarray(X_hat, dtype=np.float32)
    if sample is not None and len(X) > sample:
        X, X_hat = X[:sample], X_hat[:sample]
    return float(np.mean((X - X_hat) ** 2))
