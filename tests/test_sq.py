import numpy as np

from vq_tpu.core.config import SQConfig
from vq_tpu.methods.sq import SQ


def test_sq_roundtrip_error_bound(gaussian_data):
    x, _ = gaussian_data
    sq = SQ(SQConfig(num_bits=8)).fit(x)
    rec = sq.decompress(sq.compress(x))
    # uniform quantization error ≤ half a step per dim
    step = (x.max(0) - x.min(0)) / 255.0
    assert np.all(np.abs(rec - x) <= step[None, :] * 0.5 + 1e-5)


def test_sq_mse_monotonic_in_bits(gaussian_data):
    x, _ = gaussian_data
    mses = []
    for b in (4, 8, 16):
        sq = SQ(SQConfig(num_bits=b)).fit(x)
        rec = sq.decompress(sq.compress(x))
        mses.append(np.mean((x - rec) ** 2))
    assert mses[0] > mses[1] > mses[2]


def test_sq_4bit_nibble_packing(gaussian_data):
    x, _ = gaussian_data
    sq = SQ(SQConfig(num_bits=4)).fit(x)
    codes = sq.compress(x)
    # two dims per byte (reference scalar_quantization.py:58-66)
    assert codes.shape == (len(x), x.shape[1] // 2)
    assert codes.dtype == np.uint8
    assert sq.code_bytes_per_vector() == x.shape[1] / 2
    rec = sq.decompress(codes)
    assert rec.shape == x.shape


def test_sq_codes_row_independent(gaussian_data):
    x, _ = gaussian_data
    sq = SQ(SQConfig(num_bits=8)).fit(x)
    codes = sq.compress(x)
    ids = np.array([1, 5, 1500])
    np.testing.assert_allclose(
        sq.decompress(codes[ids]), sq.decompress(codes)[ids], rtol=1e-6
    )
