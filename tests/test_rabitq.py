import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import Metric, RaBitQConfig
from vq_tpu.core.packing import packed_bytes
from vq_tpu.data.datasets import load_dummy_dataset
from vq_tpu.index.flat import FlatQuantizedIndex
from vq_tpu.kernels.adc import exact_topk
from vq_tpu.methods.rabitq import RaBitQ
from vq_tpu.metrics.recall import recall_at_k


def test_rabitq_code_layout_and_shapes(gaussian_data):
    x, _ = gaussian_data
    rq = RaBitQ(RaBitQConfig(num_bits=4)).fit(x)
    codes = rq.compress(x)
    # ceil(64*4/8) + 8 side-channel bytes (reference extended_rabitq code_size)
    assert codes.shape == (len(x), packed_bytes(64, 4) + 8)
    assert codes.dtype == np.uint8
    assert rq.code_bytes_per_vector() == 32 + 8


def test_rabitq_rows_self_contained(gaussian_data):
    x, _ = gaussian_data
    rq = RaBitQ(RaBitQConfig(num_bits=2)).fit(x)
    codes = rq.compress(x)
    ids = np.array([0, 17, 1999])
    np.testing.assert_allclose(
        rq.decompress(codes[ids]), rq.decompress(codes)[ids], rtol=1e-5, atol=1e-5
    )


def test_rabitq_mse_decreases_with_bits(gaussian_data):
    x, _ = gaussian_data
    mses = []
    for b in (1, 2, 4, 8):
        rq = RaBitQ(RaBitQConfig(num_bits=b)).fit(x)
        rec = rq.decompress(rq.compress(x))
        mses.append(np.mean((x - rec) ** 2))
    assert mses[0] > mses[1] > mses[2] > mses[3]
    # 4-bit gaussian-optimal scalar quantization of unit directions should
    # reconstruct well
    assert mses[2] < 0.02 * np.var(x)


def test_rabitq_unit_norm_preserved(gaussian_data):
    x, _ = gaussian_data
    rq = RaBitQ(RaBitQConfig(num_bits=8)).fit(x)
    rec = rq.decompress(rq.compress(x))
    # reconstruction restores ‖x − c‖ up to the rescale-factor fit
    r = x - x.mean(0)
    rr = rec - x.mean(0)
    np.testing.assert_allclose(
        np.linalg.norm(rr, axis=1), np.linalg.norm(r, axis=1), rtol=0.05
    )


def test_rabitq_scan_matches_unbiased_estimator(gaussian_data):
    """The fused scan implements the paper's UNBIASED estimator — divide by
    the alignment ⟨o,ō⟩ — not exact search over the (projection) decode.
    Check it against a dense numpy implementation of the same formula."""
    x, q = gaussian_data
    rq = RaBitQ(RaBitQConfig(num_bits=4)).fit(x)
    codes = rq.compress(x)
    d = x.shape[1]
    ib = packed_bytes(d, 4)

    from vq_tpu.core.packing import bytes_to_f32, unpack_bits

    idx = np.asarray(unpack_bits(jnp.asarray(codes[:, :ib]), 4, d))
    s_hat = np.asarray(rq.params.levels)[idx]
    nrm = np.asarray(bytes_to_f32(jnp.asarray(codes[:, ib : ib + 4])))
    t = np.asarray(bytes_to_f32(jnp.asarray(codes[:, ib + 4 : ib + 8])))
    P, c = np.asarray(rq.params.rotation), np.asarray(rq.params.centroid)
    snorm = (s_hat * s_hat).sum(1)
    alpha = nrm * np.sqrt(d) / np.maximum(t * snorm, 1e-12)
    ip = alpha[None, :] * (q @ P @ s_hat.T) + (q @ c)[:, None]
    xsq = nrm * nrm + 2.0 * alpha * (s_hat @ (c @ P)) + (c * c).sum()
    d2 = (q * q).sum(1)[:, None] + xsq[None, :] - 2.0 * ip
    ref_idx = np.argsort(d2, axis=1)[:, :10]
    ref_scores = np.take_along_axis(d2, ref_idx, axis=1)

    s1, i1 = rq.scan_topk(
        jnp.asarray(q), jnp.asarray(codes), 10, Metric.L2, tile_rows=512,
        use_bf16=False,
    )
    np.testing.assert_array_equal(np.asarray(i1), ref_idx)
    np.testing.assert_allclose(np.asarray(s1), ref_scores, rtol=1e-3, atol=1e-3)


def test_rabitq_unbiased_beats_projection_recall(gaussian_data):
    """Ranking by the unbiased estimator must recall true neighbors at least
    as well as exact search over the projection reconstruction (the per-row
    ⟨o,ō⟩² bias of the latter reorders neighbors)."""
    x, q = gaussian_data
    gt = np.asarray(exact_topk(jnp.asarray(q), jnp.asarray(x), k=10,
                               metric=Metric.L2)[1])
    rq = RaBitQ(RaBitQConfig(num_bits=1)).fit(x)
    codes = rq.compress(x)
    _, i_scan = rq.scan_topk(jnp.asarray(q), jnp.asarray(codes), 10, Metric.L2,
                             use_bf16=False)
    dec = rq.decompress(codes)
    _, i_proj = exact_topk(jnp.asarray(q), jnp.asarray(dec), k=10, metric=Metric.L2)
    r_scan = recall_at_k(gt, np.asarray(i_scan), 10)
    r_proj = recall_at_k(gt, np.asarray(i_proj), 10)
    assert r_scan >= r_proj - 0.01, (r_scan, r_proj)


def test_rabitq_index_recall():
    data = load_dummy_dataset(num_vectors=3000, dim=64, num_queries=40, seed=7,
                              normalized=True)
    idx = FlatQuantizedIndex(RaBitQ(RaBitQConfig(num_bits=4))).fit(data.vectors)
    ids = idx.search(data.queries, k=10)
    r = recall_at_k(data.ground_truth, ids, 10)
    assert r > 0.5, r  # 4-bit rabitq on unit sphere


def test_rabitq_registry_dispatch():
    from vq_tpu.bench.registry import build_quantizer

    q = build_quantizer("rabitq", 64)
    assert q.cfg.num_bits == 1
    q = build_quantizer("extended_rabitq", 64)
    assert q.cfg.num_bits == 4
