import numpy as np
import pytest

from vq_tpu import native
from vq_tpu.methods.saq import _allocate_dp, _allocate_greedy


def test_native_library_builds():
    assert native.available(), native.build_error()


def test_native_greedy_matches_python():
    rng = np.random.default_rng(0)
    for _ in range(10):
        nb = rng.integers(1, 8)
        mb = rng.integers(3, 9)
        mse = np.sort(rng.uniform(0.01, 50, (nb, mb + 1)), axis=1)[:, ::-1].copy()
        lens = rng.integers(4, 64, nb)
        budget = int(rng.integers(1, mb * lens.sum()))
        py = _allocate_greedy(mse, lens, budget, mb)
        nat = native.allocate_greedy_native(mse, lens, budget, mb)
        np.testing.assert_array_equal(py, nat)


def test_native_dp_matches_python_cost():
    rng = np.random.default_rng(1)
    for _ in range(10):
        nb = rng.integers(1, 6)
        mb = 5
        mse = np.sort(rng.uniform(0.01, 50, (nb, mb + 1)), axis=1)[:, ::-1].copy()
        lens = rng.integers(2, 16, nb)
        budget = int(rng.integers(1, mb * lens.sum()))
        py = _allocate_dp(mse, lens, budget, mb)
        nat = native.allocate_dp_native(mse, lens, budget, mb)
        cost_py = sum(mse[i, b] for i, b in enumerate(py))
        cost_nat = sum(mse[i, b] for i, b in enumerate(nat))
        assert (nat * lens).sum() <= budget
        np.testing.assert_allclose(cost_nat, cost_py, rtol=1e-12)


def test_codebook_exact_beats_or_matches_lloyd():
    rng = np.random.default_rng(2)
    x = np.concatenate([
        rng.normal(-3, 0.2, 4000), rng.normal(0, 1.0, 4000), rng.normal(5, 0.5, 4000)
    ]).astype(np.float32)
    levels = native.codebook_exact(x, 8)
    assert len(levels) == 8
    assert np.all(np.diff(levels) >= 0)

    def mse(lv):
        d = np.abs(x[:, None] - lv[None, :])
        return float(np.mean(np.min(d, axis=1) ** 2))

    import jax.numpy as jnp

    from vq_tpu.kernels.lloyd1d import lloyd_1d

    lloyd = np.asarray(lloyd_1d(jnp.asarray(x), 8))
    assert mse(levels) <= mse(lloyd) * 1.001  # exact DP is optimal


def test_codebook_exact_small_inputs():
    x = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    lv = native.codebook_exact(x, 8)  # k >= n path
    assert len(lv) == 8
    lv2 = native.codebook_exact(x, 2)
    # two optimal 2-level solutions exist ({1},{2,3} and {1,2},{3}), both
    # with SSE 0.5 — assert optimality, not a particular tie-break
    sse = np.min(np.abs(x[:, None] - np.asarray(lv2)[None, :]), axis=1) ** 2
    np.testing.assert_allclose(sse.sum(), 0.5, atol=1e-6)


def test_rankaware_exact_codebook_path():
    from vq_tpu.core.config import RankAwareConfig
    from vq_tpu.methods.rankaware import RankAware

    rng = np.random.default_rng(3)
    sigma = np.linspace(2.0, 0.2, 16)
    x = (rng.standard_normal((2000, 16)) * sigma).astype(np.float32)
    ra = RankAware(RankAwareConfig(bits_per_dim=3.0, codebook="exact")).fit(x)
    rec = ra.decompress(ra.compress(x))
    mse = np.mean((x - rec) ** 2)
    assert mse < 0.05 * np.var(x)
