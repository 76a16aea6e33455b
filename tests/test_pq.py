import numpy as np

from vq_tpu.core.config import KMeansConfig, PQConfig
from vq_tpu.methods.pq import PQ


def _cfg(m, b, iters=8):
    return PQConfig(num_subquantizers=m, num_bits=b, kmeans=KMeansConfig(iters=iters))


def test_pq_roundtrip_shapes_and_dtype(gaussian_data):
    x, _ = gaussian_data
    pq = PQ(_cfg(8, 8)).fit(x)
    codes = pq.compress(x)
    assert codes.shape == (len(x), 8)
    assert codes.dtype == np.uint8
    rec = pq.decompress(codes)
    assert rec.shape == x.shape
    assert rec.dtype == np.float32


def test_pq_mse_decreases_with_bits(gaussian_data):
    x, _ = gaussian_data
    mses = []
    for b in (4, 6, 8):
        pq = PQ(_cfg(8, b)).fit(x)
        rec = pq.decompress(pq.compress(x))
        mses.append(np.mean((x - rec) ** 2))
    assert mses[0] > mses[1] > mses[2]


def test_pq_codes_are_row_independent(gaussian_data):
    x, _ = gaussian_data
    pq = PQ(_cfg(4, 6)).fit(x)
    full = pq.compress(x)
    part = pq.compress(x[100:200])
    np.testing.assert_array_equal(full[100:200], part)
    # decompress self-containment (reference test_lvq_quantization.py pattern)
    ids = np.array([3, 7, 500])
    np.testing.assert_allclose(
        pq.decompress(full[ids]), pq.decompress(full)[ids], rtol=1e-6
    )


def test_pq_compression_ratio(gaussian_data):
    x, _ = gaussian_data
    pq = PQ(_cfg(8, 8)).fit(x)
    # 64 dims * 4 bytes / 8 code bytes = 32x
    assert abs(pq.get_compression_ratio(x) - 32.0) < 1e-6


def test_pq_rejects_bad_dim():
    x = np.zeros((10, 30), dtype=np.float32)
    try:
        PQ(_cfg(7, 4)).fit(x)
        raised = False
    except ValueError:
        raised = True
    assert raised


def test_pq_save_load_roundtrip(tmp_path, gaussian_data):
    x, _ = gaussian_data
    pq = PQ(_cfg(4, 4)).fit(x)
    codes = pq.compress(x[:50])
    path = str(tmp_path / "pq.pkl")
    pq.save(path)
    pq2 = PQ(_cfg(4, 4)).load(path)
    np.testing.assert_array_equal(pq2.compress(x[:50]), codes)


def test_pq_encode_chunked_ragged_tail(gaussian_data):
    """Multi-chunk encode with a ragged last chunk must equal single-chunk
    encode (the clamped overlap-write path)."""
    import jax.numpy as jnp

    from vq_tpu.methods.pq import encode_chunked

    x, _ = gaussian_data  # (2000, 64)
    pq = PQ(_cfg(8, 8)).fit(x)
    full = np.asarray(encode_chunked(pq.params.codebooks, jnp.asarray(x)))
    ragged = np.asarray(
        encode_chunked(pq.params.codebooks, jnp.asarray(x), chunk=256)
    )  # 2000 = 7*256 + 208 → clamped tail
    np.testing.assert_array_equal(full, ragged)


def test_opq_encode_matches_rotation_then_pq(gaussian_data):
    """OPQ's fused rotate+encode must equal rotating first and PQ-encoding
    second, including with a ragged chunk split."""
    import jax.numpy as jnp

    from vq_tpu.methods.opq import OPQ, OPQConfig
    from vq_tpu.methods.pq import encode_chunked

    x, _ = gaussian_data
    opq = OPQ(OPQConfig(num_subquantizers=8, num_bits=8, opq_iters=3,
                        kmeans=KMeansConfig(iters=6))).fit(x)
    xr = np.asarray(x) @ np.asarray(opq.params.rotation)
    direct = np.asarray(encode_chunked(opq.params.codebooks, jnp.asarray(xr)))
    fused = np.asarray(
        encode_chunked(opq.params.codebooks, jnp.asarray(x),
                       rotation=opq.params.rotation, chunk=512)
    )
    assert (direct == fused).mean() > 0.999  # fp assoc. may flip rare ties
