"""IVF routing as a TILE MASK over the packed Pallas flat scan.

The measured round-4 finding (BENCH_NOTES IVF strategy ablation, N=1M):
even the query-shared union scan decodes probed rows into f32 code space
(≈6 KB/row at D=1536) while the packed bitplane kernel streams 384 B/row
— a ~16× HBM handicap candidate restriction cannot repay at 1M rows, so
the DENSE packed scan beat every IVF strategy at every batch size.  This
index keeps the packed kernel as the scorer and uses IVF coarse routing
only to SKIP tiles:

  fit    — coarse k-means (or a shared `coarse=`), rows sorted by cluster,
           FLAT-encoded (original rows, not residuals — measured better
           recall than residual quantization on the flagship corpus, and
           it keeps the packed layout's score algebra untouched), packed
           with the order-preserving tile cache
           (methods/base.prepare_tile_cache).  Per-tile cluster ranges
           (first/last cluster in each 512-row tile) are precomputed.
  search — one MXU matmul routes each query to its top-nprobe clusters;
           a (K,) probed flag + per-cluster prefix sums turn the batch's
           probed set into a (num_tiles,) mask in O(K + tiles); the packed
           kernel scans ONLY masked-in tiles (kernels/pallas_packed.py
           tile_mask) — at the full packed-kernel rate, in one dispatch.

Semantics: candidates are all rows in tiles OVERLAPPING a probed cluster
— a superset of per-query probed lists (tile-boundary rows and
co-probed-by-the-batch lists are scored too, exactly), so recall is ≥ the
per-query probing path's at equal nprobe; scores are the flat packed
scores.  Reference contrast: the engine scans per (query, cluster) with
AVX heaps (external/saq/include/index/ivf_index.h:249-266); the TPU-native
reformulation makes probing a grid-step predicate on the flat kernel.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import IVFConfig, Metric, SearchConfig
from vq_tpu.data.sampling import chunk_rows_for_bytes, host_sample_rows
from vq_tpu.index.base import BaseSearchIndex
from vq_tpu.index.ivf import chunked_assign, encode_rows_ordered
from vq_tpu.kernels.adc import _bf16_supported, _finalize
from vq_tpu.kernels.kmeans import kmeans, pairwise_sqdist_xc
from vq_tpu.methods.base import BaseQuantizer

_TILE = 512  # kernels/pallas_packed._TILE


class IvfPackedFlatIndex(BaseSearchIndex):
    """Probed-tile packed scan for SAQ/RaBitQ/RankAware-family quantizers
    (anything with prepare_tile_cache + packed_scan_raw)."""

    name = "ivf_packed"

    def __init__(
        self,
        quantizer: BaseQuantizer,
        ivf_cfg: IVFConfig = IVFConfig(),
        search_cfg: SearchConfig = SearchConfig(),
    ):
        self.quantizer = quantizer
        self.ivf_cfg = ivf_cfg
        self.search_cfg = search_cfg
        self.centroids: Optional[jax.Array] = None
        self.cache = None  # order-preserving PackedCorpus
        self.ids_sorted: Optional[jax.Array] = None  # (N,) position → gid
        self.cl_first: Optional[jax.Array] = None  # (nb,) first cluster/tile
        self.cl_last: Optional[jax.Array] = None  # (nb,)
        self.num_rows = 0
        self._search_fn = None

    # ------------------------------------------------------------------ fit
    def fit(self, X, chunk_rows: int = 0, coarse=None) -> "IvfPackedFlatIndex":
        n, d = X.shape
        chunk = chunk_rows or chunk_rows_for_bytes(d)
        if coarse is not None:
            self.centroids = jnp.asarray(coarse[0], jnp.float32)
            assignment = np.asarray(coarse[1], np.int32)
            k = self.centroids.shape[0]
        else:
            k = min(self.ivf_cfg.num_clusters, max(1, n // 2))
            key = jax.random.PRNGKey(self.ivf_cfg.kmeans.seed)
            cap = min(n, max(
                200_000, self.ivf_cfg.kmeans.max_points_per_centroid * k
            ))
            xs = host_sample_rows(X, cap, self.ivf_cfg.kmeans.seed)
            self.centroids = kmeans(
                key, jnp.asarray(xs, jnp.float32), k, self.ivf_cfg.kmeans
            )
            del xs
            assignment = chunked_assign(X, self.centroids, chunk)
        order = np.argsort(assignment, kind="stable")
        if self.quantizer.params is None:
            xs = host_sample_rows(X, 200_000, self.ivf_cfg.kmeans.seed)
            self.quantizer.fit(np.asarray(xs) if not isinstance(xs, jax.Array)
                               else xs)
            del xs
        # FLAT encode in cluster order (zero centroid: row == "residual")
        codes, norms = encode_rows_ordered(
            X, order, np.zeros(n, np.int32),
            jnp.zeros((1, d), jnp.float32), self.quantizer, chunk,
        )
        cache = self.quantizer.prepare_tile_cache(
            jnp.asarray(codes), norms=jnp.asarray(norms),
            num_queries=self.search_cfg.prepare_queries,
        )
        if cache is None:
            raise RuntimeError(
                f"{self.quantizer.name} has no packed tile cache at this "
                "geometry — use IvfQuantizedIndex instead"
            )
        assert cache.perm is None  # order-preserving contract
        self.cache = cache
        self.ids_sorted = jnp.asarray(order.astype(np.int32))
        # per-tile cluster ranges: rows are cluster-sorted, so tile t spans
        # clusters [assignment[order][t·512], assignment[order][min(end)−1]]
        asn_sorted = assignment[order]
        nb = -(-n // _TILE)
        firsts = asn_sorted[np.arange(nb) * _TILE]
        last_rows = np.minimum((np.arange(nb) + 1) * _TILE, n) - 1
        lasts = asn_sorted[last_rows]
        self.cl_first = jnp.asarray(firsts.astype(np.int32))
        self.cl_last = jnp.asarray(lasts.astype(np.int32))
        self.num_rows = n
        self._search_fn = None
        return self

    # --------------------------------------------------------------- search
    def _build_search_fn(self):
        metric = self.search_cfg.metric
        quantizer = self.quantizer
        k_cl = int(self.centroids.shape[0])
        use_bf16 = self.search_cfg.use_bf16 and _bf16_supported()
        interp = jax.default_backend() != "tpu"

        @functools.partial(jax.jit, static_argnames=("kk", "np_"))
        def run(q, centroids, cache, ids_sorted, cl_first, cl_last, kk, np_):
            q = q.astype(jnp.float32)
            cd = pairwise_sqdist_xc(q, centroids)  # (Q, K)
            _, probe = jax.lax.top_k(-cd, np_)
            probed = jnp.zeros((k_cl,), jnp.int32)
            probed = probed.at[probe.reshape(-1)].set(1)
            # tile mask in O(K + tiles): a tile is scanned iff any cluster
            # in its [first, last] range is probed — prefix sums over the
            # probed flag make the range-any a two-gather subtraction
            pref = jnp.cumsum(probed)  # (K,) inclusive
            hi = pref[cl_last]
            lo = jnp.where(cl_first > 0, pref[jnp.maximum(cl_first - 1, 0)], 0)
            mask = (hi - lo > 0).astype(jnp.int32)  # (nb,)
            s, pos = quantizer.packed_scan_raw(
                q, cache, kk, metric, use_bf16=use_bf16, interpret=interp,
                tile_mask=mask,
            )
            gid = jnp.take(ids_sorted, jnp.clip(pos, 0, ids_sorted.shape[0] - 1))
            q_sq = jnp.sum(q * q, axis=-1)
            scores, ids = _finalize(s, gid, metric, q_sq)
            return scores, ids, jnp.sum(mask)

        return run

    def search_with_scores(
        self, queries: np.ndarray, k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        nprobe = min(self.ivf_cfg.nprobe, int(self.centroids.shape[0]))
        if self._search_fn is None:
            self._search_fn = self._build_search_fn()
        scores, ids, tiles = self._search_fn(
            jnp.asarray(queries, jnp.float32), self.centroids, self.cache,
            self.ids_sorted, self.cl_first, self.cl_last,
            kk=k, np_=nprobe,
        )
        self.last_tiles_scanned = int(tiles)
        ids = np.asarray(ids)
        return np.where(ids < 0, 0, ids).astype(np.uint32), np.asarray(scores)

    # ---------------------------------------------------------------- misc
    def memory_footprint(self) -> int:
        total = 0
        leaves = list(self.cache.words) + [
            self.cache.factors, self.cache.tile_stats, self.ids_sorted,
            self.centroids, self.cl_first, self.cl_last,
        ]
        for a in leaves:
            if a is not None:
                total += int(np.asarray(a).nbytes)
        total += sum(
            np.asarray(p).nbytes
            for p in jax.tree_util.tree_leaves(self.quantizer.params)
        )
        return total

    def reconstruction_mse(self, X: np.ndarray, sample: Optional[int] = 10000) -> float:
        return self.quantizer.reconstruction_mse(X, sample)
