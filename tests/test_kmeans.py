import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import KMeansConfig
from vq_tpu.kernels.kmeans import assign, assign_batched, kmeans, kmeans_batched


def _blobs(rng, n_per=200, k=4, d=16, spread=0.05):
    centers = rng.standard_normal((k, d)).astype(np.float32) * 3.0
    pts = np.concatenate(
        [c + spread * rng.standard_normal((n_per, d)).astype(np.float32) for c in centers]
    )
    return pts, centers


def test_kmeans_recovers_separated_blobs():
    rng = np.random.default_rng(0)
    x, centers = _blobs(rng)
    c = kmeans(jax.random.PRNGKey(0), jnp.asarray(x), 4, KMeansConfig(iters=15))
    assert c.shape == (4, 16)
    # every true center should have a learned centroid nearby
    d = np.linalg.norm(centers[:, None, :] - np.asarray(c)[None, :, :], axis=-1)
    assert np.all(d.min(axis=1) < 0.5)


def test_kmeans_quantization_error_decreases_with_k():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1500, 24)).astype(np.float32)
    errs = []
    for k in (4, 16, 64):
        c = kmeans(jax.random.PRNGKey(0), jnp.asarray(x), k, KMeansConfig(iters=10))
        a = assign(jnp.asarray(x), c)
        rec = np.asarray(c)[np.asarray(a)]
        errs.append(np.mean((x - rec) ** 2))
    assert errs[0] > errs[1] > errs[2]


def test_kmeans_batched_matches_shapes_and_is_independent():
    rng = np.random.default_rng(2)
    xs = rng.standard_normal((3, 800, 8)).astype(np.float32)
    c = kmeans_batched(jax.random.PRNGKey(0), jnp.asarray(xs), 16, KMeansConfig(iters=8))
    assert c.shape == (3, 16, 8)
    a = assign_batched(jnp.asarray(xs), c)
    assert a.shape == (3, 800)
    assert a.dtype == jnp.int32
    # each subspace problem got its own solution
    assert not np.allclose(np.asarray(c[0]), np.asarray(c[1]))


def test_assign_is_nearest_centroid():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((300, 8)).astype(np.float32)
    c = rng.standard_normal((10, 8)).astype(np.float32)
    a = np.asarray(assign(jnp.asarray(x), jnp.asarray(c)))
    d = ((x[:, None, :] - c[None, :, :]) ** 2).sum(-1)
    np.testing.assert_array_equal(a, d.argmin(1))
