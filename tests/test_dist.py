"""Multi-chip sharding tests on the 8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import KMeansConfig, Metric, PQConfig
from vq_tpu.dist.mesh import make_mesh, pad_rows_to_multiple, replicate, shard_rows
from vq_tpu.dist.sharded import dp_lloyd_step, sharded_exact_topk, sharded_scan_topk
from vq_tpu.kernels.adc import exact_topk, scan_codes_topk
from vq_tpu.kernels.kmeans import _lloyd_iter
from vq_tpu.methods import pq as pq_mod


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def _fit(x, m=4, b=6):
    cfg = PQConfig(num_subquantizers=m, num_bits=b, kmeans=KMeansConfig(iters=6))
    params = pq_mod.fit(jax.random.PRNGKey(0), jnp.asarray(x), cfg)
    return params, pq_mod.encode(params, jnp.asarray(x))


def test_sharded_scan_matches_single_device(gaussian_data):
    x, q = gaussian_data
    params, codes = _fit(x)
    mesh = make_mesh()

    s1, i1 = scan_codes_topk(
        jnp.asarray(q), codes, params.codebooks, k=10, metric=Metric.L2, use_bf16=False
    )
    codes_p = pad_rows_to_multiple(np.asarray(codes), mesh.devices.size)
    s2, i2 = sharded_scan_topk(
        mesh,
        replicate(mesh, jnp.asarray(q)),
        shard_rows(mesh, jnp.asarray(codes_p)),
        replicate(mesh, params.codebooks),
        k=10,
        metric=Metric.L2,
        true_n=len(x),
        use_bf16=False,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


def test_sharded_scan_with_ragged_padding():
    # n deliberately NOT divisible by 8 and pad rows would otherwise win
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1003, 32)).astype(np.float32)
    q = rng.standard_normal((9, 32)).astype(np.float32)
    params, codes = _fit(x)
    mesh = make_mesh()
    s1, i1 = scan_codes_topk(
        jnp.asarray(q), codes, params.codebooks, k=20, metric=Metric.L2, use_bf16=False
    )
    codes_p = pad_rows_to_multiple(np.asarray(codes), mesh.devices.size)
    s2, i2 = sharded_scan_topk(
        mesh, jnp.asarray(q), jnp.asarray(codes_p), params.codebooks,
        k=20, metric=Metric.L2, true_n=1003, use_bf16=False,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    assert np.all(np.asarray(i2) < 1003)


def test_sharded_exact_matches_single(gaussian_data):
    x, q = gaussian_data
    mesh = make_mesh()
    s1, i1 = exact_topk(jnp.asarray(q), jnp.asarray(x), k=10)
    s2, i2 = sharded_exact_topk(mesh, jnp.asarray(q), jnp.asarray(x), k=10, true_n=len(x))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-4, atol=1e-4)


def test_dp_lloyd_step_matches_single_device():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1600, 16)).astype(np.float32)
    c0 = x[:8].copy()
    mesh = make_mesh()
    ref = np.asarray(_lloyd_iter(jnp.asarray(x), jnp.asarray(c0)))
    out = np.asarray(dp_lloyd_step(mesh, jnp.asarray(x), jnp.asarray(c0)))
    np.testing.assert_allclose(ref, out, rtol=1e-5, atol=1e-5)
