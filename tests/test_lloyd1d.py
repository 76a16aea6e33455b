import jax.numpy as jnp
import numpy as np

from vq_tpu.kernels.lloyd1d import (
    lloyd_1d,
    lloyd_1d_columns,
    lloyd_1d_normal,
    quantize_to_levels,
    quantize_to_levels_per_dim,
)


def test_lloyd_1bit_normal_is_half_normal_mean():
    # optimal 2-level codebook for N(0,1) is ±E|z| = ±0.7979
    levels = np.asarray(lloyd_1d_normal(2, seed=0))
    np.testing.assert_allclose(levels, [-0.7979, 0.7979], atol=0.02)


def test_lloyd_levels_sorted_and_mse_decreases():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(50_000).astype(np.float32))
    mses = []
    for L in (2, 4, 16):
        levels = lloyd_1d(x, L)
        lv = np.asarray(levels)
        assert np.all(np.diff(lv) > 0)
        idx = np.asarray(quantize_to_levels(x, levels))
        mses.append(np.mean((np.asarray(x) - lv[idx]) ** 2))
    assert mses[0] > mses[1] > mses[2]
    # known distortion of optimal 4-level gaussian quantizer ≈ 0.1175
    assert abs(mses[1] - 0.1175) < 0.01


def test_quantize_to_levels_is_nearest():
    levels = jnp.asarray([-1.0, 0.0, 2.0])
    x = jnp.asarray([-5.0, -0.6, -0.4, 0.9, 1.1, 10.0])
    idx = np.asarray(quantize_to_levels(x, levels))
    np.testing.assert_array_equal(idx, [0, 0, 1, 1, 2, 2])


def test_per_dim_codebooks():
    rng = np.random.default_rng(1)
    x = np.stack(
        [rng.standard_normal(5000), 10 + 5 * rng.standard_normal(5000)], axis=1
    ).astype(np.float32)
    levels = lloyd_1d_columns(jnp.asarray(x), 8)
    assert levels.shape == (2, 8)
    lv = np.asarray(levels)
    # codebooks adapt to each column's scale/location
    assert lv[0].max() < 4 and lv[1].mean() > 5
    idx = np.asarray(quantize_to_levels_per_dim(jnp.asarray(x), levels))
    assert idx.shape == (5000, 2)
    rec = np.take_along_axis(lv.T, idx, axis=0)  # wrong axis mapping guard
    rec = np.stack([lv[0][idx[:, 0]], lv[1][idx[:, 1]]], axis=1)
    mse = np.mean((x - rec) ** 2, axis=0)
    assert mse[0] < 0.05 and mse[1] < 1.2  # ~var/30 at 8 levels
