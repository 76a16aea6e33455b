import jax.numpy as jnp
import numpy as np

from vq_tpu.kernels.caq import caq_cosine, caq_decode, caq_encode


def test_caq_codes_in_range(gaussian_data):
    x, _ = gaussian_data
    for b in (1, 2, 4, 8):
        caq = caq_encode(jnp.asarray(x[:200]), b, rounds=3)
        c = np.asarray(caq.codes)
        assert c.min() >= 0 and c.max() < (1 << b)


def test_caq_adjustment_improves_cosine(gaussian_data):
    x, _ = gaussian_data
    xj = jnp.asarray(x[:500])
    base = caq_encode(xj, 3, rounds=0)
    adj = caq_encode(xj, 3, rounds=6)
    v = np.max(np.abs(x[:500]), axis=1, keepdims=True)
    ou = jnp.asarray(x[:500] / v)
    cos0 = np.asarray(caq_cosine(ou, base.codes, 3))
    cos6 = np.asarray(caq_cosine(ou, adj.codes, 3))
    assert np.all(cos6 >= cos0 - 1e-6)
    assert cos6.mean() > cos0.mean() + 1e-4  # strictly better on average


def test_caq_reconstruction_quality(gaussian_data):
    x, _ = gaussian_data
    xj = jnp.asarray(x)
    mses = []
    for b in (2, 4, 6):
        caq = caq_encode(xj, b, rounds=6)
        rec = np.asarray(caq_decode(caq.codes, caq.rescale, b))
        mses.append(np.mean((x - rec) ** 2))
    assert mses[0] > mses[1] > mses[2]
    assert mses[1] < 0.02 * np.var(x)  # 4-bit CAQ ≈ SQ-quality or better


def test_caq_rescale_factor_semantics(gaussian_data):
    # fac_rescale = ‖o‖²/⟨o,ô⟩ (caq_encoder.h:220-232): the scale making
    # ⟨o, rescale·ô⟩ = ‖o‖² — the unbiased-IP-estimator property RaBitQ-style
    # distance estimation relies on (not the least-squares projection).
    x, _ = gaussian_data
    xj = jnp.asarray(x[:100])
    caq = caq_encode(xj, 4, rounds=4)
    rec = np.asarray(caq_decode(caq.codes, caq.rescale, 4))
    ip = np.einsum("nd,nd->n", x[:100], rec)
    np.testing.assert_allclose(ip, np.sum(x[:100] ** 2, axis=1), rtol=1e-4)


def test_caq_norm_factor(gaussian_data):
    x, _ = gaussian_data
    caq = caq_encode(jnp.asarray(x[:50]), 4)
    np.testing.assert_allclose(
        np.asarray(caq.o_l2norm), np.linalg.norm(x[:50], axis=1), rtol=1e-5
    )
