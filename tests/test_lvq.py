import numpy as np

from vq_tpu.core.config import LVQConfig
from vq_tpu.core.packing import packed_bytes
from vq_tpu.methods.lvq import LVQ


def test_lvq_layout(gaussian_data):
    x, _ = gaussian_data
    lvq = LVQ(LVQConfig(num_bits=8)).fit(x)
    codes = lvq.compress(x)
    # ceil(D*B/8) + 8 (lo + delta f32), reference lvq_quantization.py:8-13
    assert codes.shape == (len(x), packed_bytes(64, 8) + 8)
    assert codes.dtype == np.uint8


def test_lvq_rows_self_contained(gaussian_data):
    x, _ = gaussian_data
    lvq = LVQ(LVQConfig(num_bits=4)).fit(x)
    codes = lvq.compress(x)
    ids = np.array([5, 123, 1987])
    np.testing.assert_allclose(
        lvq.decompress(codes[ids]), lvq.decompress(codes)[ids], rtol=1e-6
    )


def test_lvq_error_bound(gaussian_data):
    x, _ = gaussian_data
    lvq = LVQ(LVQConfig(num_bits=8)).fit(x)
    rec = lvq.decompress(lvq.compress(x))
    r = x - x.mean(0)
    span = r.max(1) - r.min(1)
    step = span / 255.0
    assert np.all(np.abs(rec - x) <= step[:, None] * 0.5 + 1e-5)


def test_lvq_mse_monotonic(gaussian_data):
    x, _ = gaussian_data
    mses = []
    for b in (2, 4, 8):
        lvq = LVQ(LVQConfig(num_bits=b)).fit(x)
        mses.append(np.mean((x - lvq.decompress(lvq.compress(x))) ** 2))
    assert mses[0] > mses[1] > mses[2]
