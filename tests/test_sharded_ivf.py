"""Sharded IVF (EP analog) + overlapped cross-shard merge, on the
8-virtual-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import (
    IVFConfig,
    KMeansConfig,
    Metric,
    PQConfig,
    SearchConfig,
    SQConfig,
)
from vq_tpu.dist.mesh import make_mesh, pad_rows_to_multiple, replicate, shard_rows
from vq_tpu.dist.sharded import sharded_scan_topk
from vq_tpu.dist.sharded_ivf import ShardedIVFIndex, balance_clusters
from vq_tpu.index.ivf import IvfQuantizedIndex
from vq_tpu.methods import pq as pq_mod
from vq_tpu.methods.sq import SQ


def _data(n=2000, d=32, nq=12, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((n, d)).astype(np.float32)
    q = (x[rng.integers(0, n, nq)]
         + 0.05 * rng.standard_normal((nq, d))).astype(np.float32)
    return x, q


def _ivf(nq=16, nprobe=8):
    return IVFConfig(num_clusters=nq, nprobe=nprobe,
                     kmeans=KMeansConfig(iters=8, seed=0))


def test_balance_clusters_spreads_load():
    sizes = np.array([100, 90, 10, 10, 10, 10, 10, 10])
    sh = balance_clusters(sizes, 2)
    loads = [sizes[sh == p].sum() for p in (0, 1)]
    assert abs(loads[0] - loads[1]) <= 40, loads
    assert sh[0] != sh[1]  # the two big lists land on different shards


def test_sharded_ivf_matches_single_device():
    """Same coarse k-means + same quantizer → identical neighbors as the
    single-device IvfQuantizedIndex (scores equal; exact merge)."""
    x, q = _data()
    mesh = make_mesh()

    ref = IvfQuantizedIndex(SQ(SQConfig(num_bits=8)), _ivf()).fit(x)
    sh = ShardedIVFIndex(SQ(SQConfig(num_bits=8)), _ivf(), mesh=mesh).fit(x)

    ids_r, s_r = ref.search_with_scores(q, k=5)
    ids_s, s_s = sh.search_with_scores(q, k=5)
    np.testing.assert_allclose(s_s, s_r, rtol=1e-4, atol=1e-4)
    # ids may only differ on exact score ties
    same = ids_s == ids_r
    tied = np.isclose(s_s, s_r, rtol=1e-4)
    assert np.all(same | tied)


def test_sharded_ivf_nip_metric():
    x, q = _data(seed=3)
    mesh = make_mesh()
    cfgs = dict(ivf_cfg=_ivf(), search_cfg=SearchConfig(metric=Metric.NIP))
    ref = IvfQuantizedIndex(SQ(SQConfig(num_bits=8)), **cfgs).fit(x)
    sh = ShardedIVFIndex(SQ(SQConfig(num_bits=8)), **cfgs, mesh=mesh).fit(x)
    ids_r, s_r = ref.search_with_scores(q, k=5)
    ids_s, s_s = sh.search_with_scores(q, k=5)
    np.testing.assert_allclose(s_s, s_r, rtol=1e-4, atol=1e-4)


def test_sharded_ivf_skewed_lists():
    """Skewed list sizes: greedy balancing keeps every list intact on one
    shard and results stay exact vs single-device."""
    rng = np.random.default_rng(9)
    blob = rng.standard_normal((1500, 16)).astype(np.float32) * 0.05
    spread = rng.standard_normal((500, 16)).astype(np.float32) * 8.0 + 20.0
    x = np.concatenate([blob, spread])
    q = np.concatenate([blob[:6], spread[:6]]) + 0.01
    mesh = make_mesh()
    ref = IvfQuantizedIndex(SQ(SQConfig(num_bits=8)), _ivf(nprobe=16)).fit(x)
    sh = ShardedIVFIndex(SQ(SQConfig(num_bits=8)), _ivf(nprobe=16),
                         mesh=mesh).fit(x)
    _, s_r = ref.search_with_scores(q, k=5)
    _, s_s = sh.search_with_scores(q, k=5)
    np.testing.assert_allclose(s_s, s_r, rtol=1e-4, atol=1e-4)


def test_overlapped_merge_matches_single_gather():
    """overlap_chunks > 1 (chunked scan + per-chunk all_gather merge) is
    exact: identical results to the single post-scan gather."""
    rng = np.random.default_rng(5)
    x = rng.standard_normal((1027, 32)).astype(np.float32)
    q = rng.standard_normal((9, 32)).astype(np.float32)
    cfg = PQConfig(num_subquantizers=4, num_bits=6,
                   kmeans=KMeansConfig(iters=6))
    params = pq_mod.fit(jax.random.PRNGKey(0), jnp.asarray(x), cfg)
    codes = np.asarray(pq_mod.encode(params, jnp.asarray(x)))
    mesh = make_mesh()
    codes_p = pad_rows_to_multiple(codes, 8 * 4)  # divisible into 4 chunks
    qd = replicate(mesh, jnp.asarray(q))
    csh = shard_rows(mesh, jnp.asarray(codes_p))
    cb = replicate(mesh, params.codebooks)
    for metric in (Metric.L2, Metric.IP):
        s1, i1 = sharded_scan_topk(
            mesh, qd, csh, cb, k=7, metric=metric, true_n=len(x),
            tile_rows=64, overlap_chunks=1,
        )
        s4, i4 = sharded_scan_topk(
            mesh, qd, csh, cb, k=7, metric=metric, true_n=len(x),
            tile_rows=64, overlap_chunks=4,
        )
        np.testing.assert_array_equal(np.asarray(i4), np.asarray(i1))
        np.testing.assert_allclose(np.asarray(s4), np.asarray(s1), rtol=1e-5)


def test_sharded_ivf_union_matches_windows():
    """The sharded union scan (ownership mask folded into the membership
    mask) must equal the sharded per-probe window scan."""
    x, q = _data(seed=9)
    mesh = make_mesh()
    sh = ShardedIVFIndex(SQ(SQConfig(num_bits=8)), _ivf(), mesh=mesh).fit(x)
    ids_u, s_u = sh.search_with_scores(q, k=6, strategy="union")
    ids_w, s_w = sh.search_with_scores(q, k=6, strategy="windows")
    np.testing.assert_allclose(s_u, s_w, rtol=1e-4, atol=1e-4)
    same = ids_u == ids_w
    tied = np.isclose(s_u, s_w, rtol=1e-4)
    assert np.all(same | tied)
