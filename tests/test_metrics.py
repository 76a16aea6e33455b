import numpy as np

from vq_tpu.metrics.distortion import compute_distortion, reconstruction_mse
from vq_tpu.metrics.pairwise import compute_pairwise_distortion
from vq_tpu.metrics.rank import compute_rank_distortion
from vq_tpu.metrics.recall import recall_at_k, recall_at_ks


def test_recall_at_k_exact():
    gt = np.array([[1, 2, 3, 4], [5, 6, 7, 8]])
    pred = np.array([[1, 2, 9, 10], [8, 7, 6, 5]])
    assert recall_at_k(gt, pred, 2) == 0.5 * (1.0 + 0.0)  # q0: {1,2} hit; q1: {8,7} vs {5,6}
    assert recall_at_k(gt, pred, 4) == 0.5 * (0.5 + 1.0)


def test_recall_at_ks_dict():
    gt = np.tile(np.arange(100), (3, 1))
    pred = gt.copy()
    out = recall_at_ks(gt, pred, ks=(1, 10, 100))
    assert out == {1: 1.0, 10: 1.0, 100: 1.0}


def test_rank_distortion_is_one_minus_recall():
    gt = np.array([[1, 2, 3, 4, 5, 6, 7, 8, 9, 10]])
    pred = np.array([[1, 2, 3, 4, 5, 11, 12, 13, 14, 15]])
    rd = compute_rank_distortion(gt, pred, k=10)
    assert abs(rd - 0.5) < 1e-9
    assert abs((1 - recall_at_k(gt, pred, 10)) - rd) < 1e-9


def test_distortion_conventions():
    x = np.ones((10, 4), dtype=np.float32)
    xh = np.zeros((10, 4), dtype=np.float32)
    assert compute_distortion(x, xh) == 4.0  # per-vector sum
    assert reconstruction_mse(x, xh) == 1.0  # per-element


def test_pairwise_distortion_zero_for_identity():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((500, 8)).astype(np.float32)
    out = compute_pairwise_distortion(x, x, num_pairs=200)
    assert out["mean"] < 1e-6
    assert out["max"] < 1e-5
    assert out["num_pairs"] > 0


def test_pairwise_distortion_positive_for_noise():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((500, 8)).astype(np.float32)
    xh = x + 0.5 * rng.standard_normal(x.shape).astype(np.float32)
    out = compute_pairwise_distortion(x, xh, num_pairs=200)
    assert out["mean"] > 0.01
