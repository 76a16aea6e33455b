import numpy as np

from vq_tpu.core.config import KMeansConfig, Metric, PQConfig, SearchConfig, SQConfig
from vq_tpu.data.datasets import load_dummy_dataset
from vq_tpu.index.flat import FlatQuantizedIndex
from vq_tpu.methods.pq import PQ
from vq_tpu.methods.sq import SQ
from vq_tpu.metrics.recall import recall_at_k


def _pq(m=8, b=8):
    return PQ(PQConfig(num_subquantizers=m, num_bits=b, kmeans=KMeansConfig(iters=10)))


def test_flat_pq_search_shapes_and_dtype():
    data = load_dummy_dataset(num_vectors=1200, dim=32, num_queries=20, seed=0)
    idx = FlatQuantizedIndex(_pq(4, 6)).fit(data.vectors)
    ids, scores = idx.search_with_scores(data.queries, k=7)
    assert ids.shape == (20, 7)
    assert ids.dtype == np.uint32
    assert scores.shape == (20, 7)
    # L2 scores ascending
    assert np.all(np.diff(scores, axis=1) >= -1e-4)


def test_flat_pq_recall_on_gaussian():
    data = load_dummy_dataset(num_vectors=3000, dim=64, num_queries=50, seed=1)
    idx = FlatQuantizedIndex(_pq(8, 8)).fit(data.vectors)
    ids = idx.search(data.queries, k=10)
    r = recall_at_k(data.ground_truth, ids, 10)
    # iid gaussian is PQ's worst case — the reference's own demo_sweep on
    # random data gets 0.32 at M=16 B=8 (BASELINE.md, logs/benchmark_runs.db);
    # 0.25 guards quality while 1/300 would be chance.
    assert r > 0.25, r


def test_flat_sq_recall_high():
    data = load_dummy_dataset(num_vectors=2000, dim=32, num_queries=30, seed=2)
    idx = FlatQuantizedIndex(SQ(SQConfig(num_bits=8))).fit(data.vectors)
    ids = idx.search(data.queries, k=10)
    r = recall_at_k(data.ground_truth, ids, 10)
    assert r > 0.95, r  # 8-bit SQ is near-lossless for ranking


def test_flat_index_nip_metric():
    data = load_dummy_dataset(num_vectors=1500, dim=32, num_queries=25, seed=3,
                              metric=Metric.NIP)
    idx = FlatQuantizedIndex(
        SQ(SQConfig(num_bits=8)), SearchConfig(metric=Metric.NIP)
    ).fit(data.vectors)
    ids = idx.search(data.queries, k=10)
    r = recall_at_k(data.ground_truth, ids, 10)
    assert r > 0.9, r


def test_flat_index_save_load(tmp_path):
    data = load_dummy_dataset(num_vectors=800, dim=16, num_queries=10, seed=4)
    idx = FlatQuantizedIndex(_pq(4, 4)).fit(data.vectors)
    ids, scores = idx.search_with_scores(data.queries, k=5)
    path = str(tmp_path / "flat.pkl")
    idx.save(path)
    idx2 = FlatQuantizedIndex(_pq(4, 4)).load(path)
    ids2, scores2 = idx2.search_with_scores(data.queries, k=5)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_allclose(scores, scores2, rtol=1e-5)


def test_flat_index_memory_footprint():
    data = load_dummy_dataset(num_vectors=1000, dim=32, num_queries=5, seed=5)
    idx = FlatQuantizedIndex(_pq(4, 8)).fit(data.vectors)
    fp = idx.memory_footprint()
    # codes 4 B/vec + norms 4 B/vec + codebooks 4*256*8*4 B
    assert fp == 1000 * 4 + 1000 * 4 + 4 * 256 * 8 * 4


def test_flat_index_save_load_saq_rankaware(tmp_path):
    """Regression (round-2 advisor): FlatQuantizedIndex.load() crashed for
    quantizers whose state lives outside `params` (SAQ plan, RankAware
    bits/layout) because _state pickled params only.  The whole quantizer is
    pickled now; search-after-restore must match exactly."""
    from vq_tpu.core.config import RankAwareConfig, SAQConfig
    from vq_tpu.methods.rankaware import RankAware
    from vq_tpu.methods.saq import SAQ

    data = load_dummy_dataset(num_vectors=800, dim=32, num_queries=8, seed=6)
    for make in (
        lambda: SAQ(SAQConfig(bits_per_dim=2.0)),
        lambda: RankAware(RankAwareConfig(bits_per_dim=2.0)),
    ):
        idx = FlatQuantizedIndex(make()).fit(data.vectors)
        ids, scores = idx.search_with_scores(data.queries, k=5)
        path = str(tmp_path / f"flat_{idx.quantizer.name}.pkl")
        idx.save(path)
        idx2 = FlatQuantizedIndex(make()).load(path)
        ids2, scores2 = idx2.search_with_scores(data.queries, k=5)
        np.testing.assert_array_equal(ids, ids2)
        np.testing.assert_allclose(scores, scores2, rtol=1e-5)
