import numpy as np

from vq_tpu.core.config import KMeansConfig, Metric, PQConfig, SearchConfig
from vq_tpu.data.datasets import load_dummy_dataset
from vq_tpu.dist.mesh import make_mesh
from vq_tpu.dist.sharded_index import ShardedFlatPQIndex
from vq_tpu.index.flat import FlatQuantizedIndex
from vq_tpu.methods.pq import PQ


def _pq():
    return PQ(PQConfig(num_subquantizers=4, num_bits=6, kmeans=KMeansConfig(iters=8)))


def test_sharded_index_matches_flat_index():
    data = load_dummy_dataset(num_vectors=2005, dim=32, num_queries=20, seed=0)
    sc = SearchConfig(use_bf16=False)
    flat = FlatQuantizedIndex(_pq(), sc).fit(data.vectors)
    sharded = ShardedFlatPQIndex(_pq(), sc).fit(data.vectors)
    assert sharded.num_shards == 8
    ids_f, s_f = flat.search_with_scores(data.queries, k=10)
    ids_s, s_s = sharded.search_with_scores(data.queries, k=10)
    np.testing.assert_array_equal(ids_f, ids_s)
    np.testing.assert_allclose(s_f, s_s, rtol=1e-4, atol=1e-4)


def test_sharded_index_nip_metric():
    data = load_dummy_dataset(num_vectors=1001, dim=32, num_queries=15, seed=1,
                              metric=Metric.NIP)
    sc = SearchConfig(metric=Metric.NIP, use_bf16=False)
    flat = FlatQuantizedIndex(_pq(), sc).fit(data.vectors)
    sharded = ShardedFlatPQIndex(_pq(), sc).fit(data.vectors)
    np.testing.assert_array_equal(
        flat.search(data.queries, 10), sharded.search(data.queries, 10)
    )


def test_sharded_flat_generic_matches_flat_index():
    """ShardedFlatIndex (any-quantizer decode_fn scan) equals the
    single-device flat index — SAQ (multi-segment rotations) and SQ."""
    from vq_tpu.core.config import SAQConfig, SQConfig
    from vq_tpu.dist.sharded_index import ShardedFlatIndex
    from vq_tpu.methods.saq import SAQ
    from vq_tpu.methods.sq import SQ

    data = load_dummy_dataset(num_vectors=1413, dim=24, num_queries=12, seed=3)
    sc = SearchConfig(use_bf16=False)
    for q_new in (lambda: SQ(SQConfig(num_bits=8)),
                  lambda: SAQ(SAQConfig(bits_per_dim=3.0, use_pca=False))):
        flat = FlatQuantizedIndex(q_new(), sc).fit(data.vectors)
        sh = ShardedFlatIndex(q_new(), sc).fit(data.vectors)
        ids_f, s_f = flat.search_with_scores(data.queries, k=10)
        ids_s, s_s = sh.search_with_scores(data.queries, k=10)
        np.testing.assert_array_equal(ids_f, ids_s)
        np.testing.assert_allclose(s_f, s_s, rtol=1e-4, atol=1e-4)
        # overlapped-merge mode is exact too
        ids_o, _ = sh.search_with_scores(data.queries, k=10, overlap_chunks=4)
        np.testing.assert_array_equal(ids_f, ids_o)


def test_sharded_ingestion_path():
    data = load_dummy_dataset(num_vectors=900, dim=16, num_queries=10, seed=2)
    pq = _pq().fit(data.vectors)
    codes = pq.compress(data.vectors)
    norms = np.linalg.norm(data.vectors, axis=1)
    idx = ShardedFlatPQIndex(pq, SearchConfig(use_bf16=False))
    idx.add_sharded(codes, norms, len(data.vectors))
    ids = idx.search(data.queries, k=5)
    flat = FlatQuantizedIndex(pq, SearchConfig(use_bf16=False)).fit(data.vectors)
    np.testing.assert_array_equal(flat.search(data.queries, 5), ids)
