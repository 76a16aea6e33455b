"""Two-phase prune/rerank SAQ search (the 3-stage searcher analog)."""

import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import Metric, SAQConfig
from vq_tpu.methods.saq import SAQ
from vq_tpu.metrics.recall import recall_at_k


def _fit(rng, n=4000, d=96):
    sigma = np.linspace(2.5, 0.05, d)
    x = (rng.standard_normal((n, d)) * sigma).astype(np.float32)
    q = (x[rng.integers(0, n, 30)] +
         0.1 * sigma * rng.standard_normal((30, d))).astype(np.float32)
    saq = SAQ(SAQConfig(bits_per_dim=3.0, block_dims=16)).fit(x)
    codes = jnp.asarray(saq.compress(x))
    return saq, x, q, codes


def test_rerank_matches_full_scan_at_high_factor():
    rng = np.random.default_rng(0)
    saq, x, q, codes = _fit(rng)
    assert saq.plan.num_segments >= 2, saq.plan
    s_full, i_full = saq.scan_topk(jnp.asarray(q), codes, 10, Metric.L2,
                                   use_bf16=False)
    s_rr, i_rr = saq.scan_topk(jnp.asarray(q), codes, 10, Metric.L2,
                               use_bf16=False, prune_segments=1,
                               rerank_factor=100)
    # with 1000 candidates out of 4000 rows, stage 1 recall is ~complete
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / 10
        for a, b in zip(np.asarray(i_full), np.asarray(i_rr))
    ])
    assert overlap > 0.95, overlap
    # surviving candidates carry their exact full-precision scores
    both = set(np.asarray(i_full)[0]) & set(np.asarray(i_rr)[0])
    sf = dict(zip(np.asarray(i_full)[0].tolist(), np.asarray(s_full)[0].tolist()))
    sr = dict(zip(np.asarray(i_rr)[0].tolist(), np.asarray(s_rr)[0].tolist()))
    for rid in both:
        np.testing.assert_allclose(sf[rid], sr[rid], rtol=1e-3, atol=1e-2)


def test_rerank_recall_close_to_full():
    rng = np.random.default_rng(1)
    saq, x, q, codes = _fit(rng)
    from vq_tpu.data.datasets import compute_ground_truth

    gt = compute_ground_truth(x, q, k=10)
    _, i_full = saq.scan_topk(jnp.asarray(q), codes, 10, Metric.L2, use_bf16=False)
    _, i_rr = saq.scan_topk(jnp.asarray(q), codes, 10, Metric.L2,
                            use_bf16=False, prune_segments=1, rerank_factor=20)
    r_full = recall_at_k(gt, np.asarray(i_full), 10)
    r_rr = recall_at_k(gt, np.asarray(i_rr), 10)
    assert r_rr >= r_full - 0.05, (r_rr, r_full)


def test_rerank_disabled_for_tiny_corpora():
    rng = np.random.default_rng(2)
    sigma = np.linspace(2.0, 0.1, 32)
    x = (rng.standard_normal((100, 32)) * sigma).astype(np.float32)
    saq = SAQ(SAQConfig(bits_per_dim=3.0, block_dims=16)).fit(x)
    codes = jnp.asarray(saq.compress(x))
    q = x[:5]
    # n <= 2·rerank_factor·k → falls back to the full scan, still correct
    s, i = saq.scan_topk(jnp.asarray(q), codes, 10, Metric.L2,
                         use_bf16=False, prune_segments=1, rerank_factor=10)
    assert np.asarray(i).shape == (5, 10)
    assert np.all(np.asarray(i)[:, 0] == np.arange(5))  # self is nearest
