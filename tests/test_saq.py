import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vq_tpu.core.config import Metric, SAQConfig
from vq_tpu.data.datasets import load_dummy_dataset
from vq_tpu.index.flat import FlatQuantizedIndex
from vq_tpu.kernels.adc import exact_topk
from vq_tpu.methods.saq import SAQ, _allocate_dp, _allocate_greedy, make_plan
from vq_tpu.metrics.recall import recall_at_k


def _decaying_data(rng, n=2000, d=96):
    """Decaying per-dim variance — the regime adaptive allocation exploits."""
    sigma = np.linspace(3.0, 0.05, d)
    return (rng.standard_normal((n, d)) * sigma).astype(np.float32)


def test_greedy_allocator_prefers_high_variance_blocks():
    # 2 blocks, second has negligible MSE at any bits
    mse = np.array([[100.0, 25.0, 6.0, 1.5, 0.4], [1.0, 0.25, 0.06, 0.015, 0.004]])
    lens = np.array([4, 4])
    bits = _allocate_greedy(mse, lens, budget_bits=16, max_bits=4)
    assert bits[0] >= bits[1]
    assert (bits * lens).sum() <= 16


def test_dp_allocator_optimal_vs_greedy():
    rng = np.random.default_rng(0)
    mse = np.sort(rng.uniform(0.1, 10, (4, 6)), axis=1)[:, ::-1].copy()
    lens = np.array([2, 2, 2, 2])
    for budget in (8, 12, 16):
        bg = _allocate_greedy(mse, lens, budget, 5)
        bd = _allocate_dp(mse, lens, budget, 5)
        cost_g = sum(mse[i, b] for i, b in enumerate(bg))
        cost_d = sum(mse[i, b] for i, b in enumerate(bd))
        assert (bd * lens).sum() <= budget
        assert cost_d <= cost_g + 1e-9  # DP at least as good


def test_saq_plan_segments_cover_budget():
    rng = np.random.default_rng(1)
    x = _decaying_data(rng)
    saq = SAQ(SAQConfig(bits_per_dim=2.0, block_dims=16)).fit(x)
    plan = saq.plan
    total_bits = sum(l * b for l, b in zip(plan.seg_lens, plan.seg_bits))
    assert total_bits <= 2.0 * 96 + 1e-9
    assert all(b >= 1 for b in plan.seg_bits)
    # adaptive: first (high-variance PCA) segment gets more bits than last
    assert plan.seg_bits[0] >= plan.seg_bits[-1]


def test_saq_roundtrip_and_row_independence():
    rng = np.random.default_rng(2)
    x = _decaying_data(rng)
    saq = SAQ(SAQConfig(bits_per_dim=4.0, block_dims=16)).fit(x)
    codes = saq.compress(x)
    assert codes.dtype == np.uint8
    assert codes.shape == (len(x), saq.plan.code_bytes)
    ids = np.array([1, 99, 1500])
    np.testing.assert_allclose(
        saq.decompress(codes[ids]), saq.decompress(codes)[ids], rtol=1e-5, atol=1e-5
    )


def test_saq_mse_decreases_with_budget():
    rng = np.random.default_rng(3)
    x = _decaying_data(rng)
    mses = []
    for bpd in (1.0, 2.0, 4.0):
        saq = SAQ(SAQConfig(bits_per_dim=bpd, block_dims=16)).fit(x)
        rec = saq.decompress(saq.compress(x))
        mses.append(np.mean((x - rec) ** 2))
    assert mses[0] > mses[1] > mses[2]


def test_saq_beats_uniform_allocation_on_decaying_spectrum():
    rng = np.random.default_rng(4)
    x = _decaying_data(rng, n=3000)
    greedy = SAQ(SAQConfig(bits_per_dim=2.0, block_dims=16, allocator="greedy")).fit(x)
    unif = SAQ(SAQConfig(bits_per_dim=2.0, block_dims=16, allocator="uniform")).fit(x)
    mse_g = np.mean((x - greedy.decompress(greedy.compress(x))) ** 2)
    mse_u = np.mean((x - unif.decompress(unif.compress(x))) ** 2)
    assert mse_g < mse_u, (mse_g, mse_u)


def test_saq_scan_matches_exact_over_reconstructions():
    rng = np.random.default_rng(5)
    x = _decaying_data(rng, n=1500)
    q = _decaying_data(rng, n=20)
    saq = SAQ(SAQConfig(bits_per_dim=3.0, block_dims=16)).fit(x)
    codes = jnp.asarray(saq.compress(x))
    dec = saq.decompress(np.asarray(codes))
    s1, i1 = saq.scan_topk(jnp.asarray(q), codes, 10, Metric.L2,
                           tile_rows=256, use_bf16=False)
    s2, i2 = exact_topk(jnp.asarray(q), jnp.asarray(dec), k=10, metric=Metric.L2)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-3, atol=1e-2)


def test_saq_index_recall_beats_pq_at_same_budget():
    rng = np.random.default_rng(6)
    n, d = 3000, 64
    sigma = np.linspace(2.0, 0.05, d)
    x = (rng.standard_normal((n, d)) * sigma).astype(np.float32)
    q = (x[rng.integers(0, n, 40)] +
         0.1 * sigma * rng.standard_normal((40, d))).astype(np.float32)
    from vq_tpu.data.datasets import compute_ground_truth

    gt = compute_ground_truth(x, q, k=10)
    saq_idx = FlatQuantizedIndex(
        SAQ(SAQConfig(bits_per_dim=2.0, block_dims=16))
    ).fit(x)
    r = recall_at_k(gt, saq_idx.search(q, k=10), 10)
    assert r > 0.75, r


def test_saq_save_load(tmp_path):
    rng = np.random.default_rng(7)
    x = _decaying_data(rng, n=800)
    saq = SAQ(SAQConfig(bits_per_dim=2.0, block_dims=16)).fit(x)
    codes = saq.compress(x[:50])
    p = str(tmp_path / "saq.pkl")
    saq.save(p)
    saq2 = SAQ(SAQConfig(bits_per_dim=2.0, block_dims=16)).load(p)
    np.testing.assert_array_equal(saq2.compress(x[:50]), codes)
    np.testing.assert_allclose(saq2.decompress(codes), saq.decompress(codes))
