import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import KMeansConfig, Metric, PQConfig
from vq_tpu.kernels.adc import (
    build_lut,
    decode_pq,
    exact_topk,
    scan_codes_topk,
    scan_generic_topk,
)
from vq_tpu.methods import pq as pq_mod


def _fit_pq(x, m=8, b=6):
    cfg = PQConfig(num_subquantizers=m, num_bits=b, kmeans=KMeansConfig(iters=8))
    params = pq_mod.fit(jax.random.PRNGKey(0), jnp.asarray(x), cfg)
    codes = pq_mod.encode(params, jnp.asarray(x))
    return params, codes


def test_scan_matches_exact_over_reconstructions(gaussian_data):
    x, q = gaussian_data
    params, codes = _fit_pq(x)
    dec = np.asarray(decode_pq(params.codebooks, codes))

    s_scan, i_scan = scan_codes_topk(
        jnp.asarray(q), codes, params.codebooks, k=10, metric=Metric.L2,
        tile_rows=256, use_bf16=False,
    )
    s_ex, i_ex = exact_topk(jnp.asarray(q), jnp.asarray(dec), k=10, metric=Metric.L2)
    np.testing.assert_array_equal(np.asarray(i_scan), np.asarray(i_ex))
    np.testing.assert_allclose(np.asarray(s_scan), np.asarray(s_ex), rtol=1e-4, atol=1e-3)


def test_scan_l2_distances_are_true_distances(gaussian_data):
    x, q = gaussian_data
    params, codes = _fit_pq(x, m=4, b=8)
    dec = np.asarray(decode_pq(params.codebooks, codes))
    s, i = scan_codes_topk(
        jnp.asarray(q[:5]), codes, params.codebooks, k=3, metric=Metric.L2,
        use_bf16=False,
    )
    s, i = np.asarray(s), np.asarray(i)
    for qi in range(5):
        for j in range(3):
            true = np.sum((q[qi] - dec[i[qi, j]]) ** 2)
            np.testing.assert_allclose(s[qi, j], true, rtol=1e-3, atol=1e-3)


def test_scan_nip_metric(gaussian_data):
    x, q = gaussian_data
    params, codes = _fit_pq(x)
    dec = np.asarray(decode_pq(params.codebooks, codes))
    norms = np.linalg.norm(x, axis=1)
    s, i = scan_codes_topk(
        jnp.asarray(q[:8]), codes, params.codebooks, k=5, metric=Metric.NIP,
        norms=jnp.asarray(norms), use_bf16=False,
    )
    # reference study convention: score = q·x̂ / ‖x‖ (exact_search.py:4-8)
    manual = (q[:8] @ dec.T) / norms[None, :]
    np.testing.assert_allclose(
        np.asarray(s), np.sort(manual, axis=1)[:, ::-1][:, :5], rtol=1e-4, atol=1e-4
    )


def test_generic_scan_matches_pq_scan(gaussian_data):
    x, q = gaussian_data
    params, codes = _fit_pq(x)
    s1, i1 = scan_codes_topk(
        jnp.asarray(q), codes, params.codebooks, k=10, metric=Metric.L2, use_bf16=False
    )
    s2, i2 = scan_generic_topk(
        jnp.asarray(q), codes, lambda ct: decode_pq(params.codebooks, ct),
        k=10, metric=Metric.L2, use_bf16=False,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-5)


def test_exact_topk_small_n_and_odd_sizes():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((37, 16)).astype(np.float32)
    q = rng.standard_normal((3, 16)).astype(np.float32)
    s, i = exact_topk(jnp.asarray(q), jnp.asarray(x), k=5, metric=Metric.L2, tile_rows=8)
    d = ((q[:, None, :] - x[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(np.asarray(i), np.argsort(d, axis=1)[:, :5])


def test_lut_consistency_with_decode(gaussian_data):
    x, q = gaussian_data
    params, codes = _fit_pq(x, m=4, b=4)
    lut = np.asarray(build_lut(params.codebooks, jnp.asarray(q[:4]), Metric.L2))
    dec = np.asarray(decode_pq(params.codebooks, codes))
    c = np.asarray(codes)
    # summing LUT entries along each row's codes == exact distance to recon
    for qi in range(4):
        adc = lut[qi, np.arange(c.shape[1]), c[7]].sum()
        true = np.sum((q[qi] - dec[7]) ** 2)
        np.testing.assert_allclose(adc, true, rtol=1e-4, atol=1e-4)
