import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import Metric, RankAwareConfig
from vq_tpu.kernels.adc import exact_topk
from vq_tpu.methods.rankaware import RankAware, allocate_bits


def _decaying(rng, n=2500, d=48):
    sigma = np.linspace(2.5, 0.05, d)
    return (rng.standard_normal((n, d)) * sigma).astype(np.float32)


def test_allocate_bits_budget_and_monotone_in_variance():
    var = np.array([100.0, 10.0, 1.0, 0.1])
    dg = np.array([1.0, 0.36, 0.12, 0.037, 0.011])  # normalized gaussian MSEs
    bits = allocate_bits(var, dg, budget_bits=8, alpha=0.5, max_bits=4)
    assert bits.sum() <= 8
    assert np.all(np.diff(bits) <= 0)  # higher variance never gets fewer bits


def test_alpha_concentrates_bits():
    var = np.linspace(10, 0.1, 16) ** 2
    dg = np.array([1.0, 0.36, 0.12, 0.037, 0.011, 0.003, 8e-4, 2e-4, 5e-5])
    flat = allocate_bits(var, dg, 32, alpha=0.0, max_bits=8)
    sharp = allocate_bits(var, dg, 32, alpha=2.0, max_bits=8)
    # higher alpha pushes bits toward the high-variance head
    assert sharp[:4].sum() >= flat[:4].sum()
    assert sharp.sum() <= 32 and flat.sum() <= 32


def test_rankaware_roundtrip_dense_and_ffd():
    rng = np.random.default_rng(0)
    x = _decaying(rng)
    for packing in ("dense", "ffd"):
        ra = RankAware(
            RankAwareConfig(bits_per_dim=3.0, packing=packing, codebook="gaussian")
        ).fit(x)
        codes = ra.compress(x)
        assert codes.dtype == np.uint8
        rec = ra.decompress(codes)
        assert rec.shape == x.shape
        ids = np.array([3, 700, 2400])
        np.testing.assert_allclose(
            ra.decompress(codes[ids]), rec[ids], rtol=1e-5, atol=1e-5
        )
        mse = np.mean((x - rec) ** 2)
        assert mse < 0.05 * np.var(x), (packing, mse)


def test_rankaware_lloyd_beats_gaussian_on_nongaussian_columns():
    rng = np.random.default_rng(1)
    d = 32
    sigma = np.linspace(2.0, 0.1, d)
    # strongly bimodal per-dim distribution — analytic gaussian codebooks misfit
    x = ((rng.integers(0, 2, (3000, d)) * 2 - 1) * 2.0 +
         0.15 * rng.standard_normal((3000, d))).astype(np.float32) * sigma
    g = RankAware(RankAwareConfig(bits_per_dim=2.0, codebook="gaussian")).fit(x)
    l = RankAware(RankAwareConfig(bits_per_dim=2.0, codebook="lloyd")).fit(x)
    mse_g = np.mean((x - g.decompress(g.compress(x))) ** 2)
    mse_l = np.mean((x - l.decompress(l.compress(x))) ** 2)
    assert mse_l < mse_g, (mse_l, mse_g)


def test_rankaware_scan_matches_exact():
    rng = np.random.default_rng(2)
    x = _decaying(rng, n=1200)
    q = _decaying(rng, n=15)
    ra = RankAware(RankAwareConfig(bits_per_dim=3.0, codebook="lloyd")).fit(x)
    codes = jnp.asarray(ra.compress(x))
    dec = ra.decompress(np.asarray(codes))
    s1, i1 = ra.scan_topk(jnp.asarray(q), codes, 10, Metric.L2,
                          tile_rows=256, use_bf16=False)
    s2, i2 = exact_topk(jnp.asarray(q), jnp.asarray(dec), k=10, metric=Metric.L2)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(s1), np.asarray(s2), rtol=1e-3, atol=1e-2)


def test_rankaware_registry():
    from vq_tpu.bench.registry import build_quantizer

    ra = build_quantizer("rankaware", 32, bpd=2.0)
    assert ra.cfg.alpha == 0.5
    pm = build_quantizer("perdim_mse", 32, bpd=2.0)
    assert pm.cfg.alpha == 0.0
