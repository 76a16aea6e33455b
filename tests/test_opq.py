import numpy as np

from vq_tpu.core.config import KMeansConfig, OPQConfig
from vq_tpu.data.datasets import load_dummy_dataset
from vq_tpu.index.flat import FlatQuantizedIndex
from vq_tpu.methods.opq import OPQ
from vq_tpu.methods.pq import PQ
from vq_tpu.core.config import PQConfig
from vq_tpu.metrics.recall import recall_at_k


def _cfg(m=4, b=6, iters=6, opq_iters=6):
    return OPQConfig(num_subquantizers=m, num_bits=b, opq_iters=opq_iters,
                     kmeans=KMeansConfig(iters=iters))


def _correlated_data(rng, n=2000, d=32):
    """Correlated dims — the regime where OPQ beats PQ."""
    z = rng.standard_normal((n, d)).astype(np.float32)
    mix = rng.standard_normal((d, d)).astype(np.float32)
    mix = mix @ mix.T / d + np.diag(np.linspace(3, 0.1, d)).astype(np.float32)
    return (z @ mix).astype(np.float32)


def test_opq_rotation_is_orthogonal():
    rng = np.random.default_rng(0)
    x = _correlated_data(rng, 800, 16)
    opq = OPQ(_cfg(4, 4, opq_iters=3)).fit(x)
    r = np.asarray(opq.params.rotation)
    np.testing.assert_allclose(r @ r.T, np.eye(16), atol=1e-4)


def test_opq_roundtrip_and_row_independence():
    rng = np.random.default_rng(1)
    x = _correlated_data(rng, 1000, 16)
    opq = OPQ(_cfg(4, 6, opq_iters=3)).fit(x)
    codes = opq.compress(x)
    assert codes.shape == (1000, 4)
    rec = opq.decompress(codes)
    assert rec.shape == x.shape
    ids = np.array([2, 30, 500])
    np.testing.assert_allclose(
        opq.decompress(codes[ids]), opq.decompress(codes)[ids], rtol=1e-5, atol=1e-5
    )


def test_opq_beats_pq_on_correlated_data():
    rng = np.random.default_rng(2)
    x = _correlated_data(rng, 3000, 32)
    pq = PQ(PQConfig(num_subquantizers=4, num_bits=6,
                     kmeans=KMeansConfig(iters=8))).fit(x)
    opq = OPQ(_cfg(4, 6, iters=8, opq_iters=8)).fit(x)
    mse_pq = np.mean((x - pq.decompress(pq.compress(x))) ** 2)
    mse_opq = np.mean((x - opq.decompress(opq.compress(x))) ** 2)
    assert mse_opq < mse_pq, (mse_opq, mse_pq)


def test_opq_index_search():
    rng = np.random.default_rng(3)
    x = _correlated_data(rng, 2000, 32)
    q = x[:30] + 0.01 * rng.standard_normal((30, 32)).astype(np.float32)
    from vq_tpu.data.datasets import compute_ground_truth

    gt = compute_ground_truth(x, q, k=10)
    idx = FlatQuantizedIndex(OPQ(_cfg(8, 8, opq_iters=4))).fit(x)
    ids = idx.search(q, k=10)
    assert recall_at_k(gt, ids, 10) > 0.6


def test_opq_registry():
    from vq_tpu.bench.registry import build_quantizer

    q = build_quantizer("opq", 32, M=4, B=6, opq_iters=2)
    assert q.name == "opq"
