"""Pairwise distance distortion (reference metrics/pairwise_distortion.py:37-140).

For random distinct pairs (i, j):  distortion = |‖x̂_i−x̂_j‖ / ‖x_i−x_j‖ − 1|.
Reported as mean/median/max/std.  Computed on decompressed pairs only (2·P
rows), never the full corpus.

`compute_asymmetric_pairwise_distortion` is the asymmetric-distance variant
(reference pairwise_distortion.py:109-140): one side of each pair stays
uncompressed (the query side of an ADC scan), the other is reconstructed
from codes — |‖x_i−x̂_j‖ / ‖x_i−x_j‖ − 1|.  The reference left this as a
TODO that silently fell back to the symmetric computation; here it is real.
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


def compute_asymmetric_pairwise_distortion(
    X: np.ndarray,
    codes: np.ndarray,
    model,
    num_pairs: int = 1000,
    seed: int = 42,
) -> Dict[str, float]:
    """Asymmetric pairwise distortion: |‖x_i − x̂_j‖ / ‖x_i − x_j‖ − 1|.

    The i side stays exact (an ADC query), the j side is decompressed from
    `codes` via `model.decompress` — the realistic error model for a
    vector DB where queries are uncompressed but the corpus is not
    (reference pairwise_distortion.py:109-140, whose body was a TODO).
    """
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
    x_j_hat = np.asarray(model.decompress(np.asarray(codes)[idx2]), dtype=np.float32)
    orig = np.linalg.norm(X[idx1] - X[idx2], axis=1)
    asym = np.linalg.norm(X[idx1] - x_j_hat, axis=1)
    rel = np.abs(asym / (orig + 1e-10) - 1.0)
    return {
        "mean": float(np.mean(rel)),
        "median": float(np.median(rel)),
        "max": float(np.max(rel)),
        "std": float(np.std(rel)),
        "num_pairs": int(len(idx1)),
    }
