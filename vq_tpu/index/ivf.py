"""IVF index: coarse k-means cells + residual-quantized inverted lists.

Capability parity with the reference's three IVF paths — IvfQuantizedIndex
(methods/search/ivf_quantized_index.py:16-259), faiss IndexIVFPQ baseline
(faiss_ivfpq_index.py), RaBitQIVFIndex (rabitq_ivf_index.py:42) and the SAQ
engine's IVF (external/saq/src/ivf_index.cpp:28-374) — as ONE index
parameterized by any BaseQuantizer for the residual codes (PQ → IVFPQ,
RaBitQ → IVF+RaBitQ, SAQ → the engine's index).

TPU-first layout (SURVEY.md §7.3 "ragged IVF lists"): rows are sorted by
cluster into CSR form (codes_sorted, ids_sorted, offsets); search
  1. scores all K centroids with one MXU matmul and takes top-nprobe,
  2. gathers each probed cluster as a fixed-size `max_cluster` window via
     vmapped dynamic slices (padding masked),
  3. rescores candidates against the query's per-cluster RESIDUAL with the
     quantizer's jax decode, entirely on device,
  4. top-k over the (nprobe · max_cluster) candidate strip per query.
Cluster-size padding is bounded by sorting cells; the Pallas bucketed list
scan replaces step 2-3 at pod scale.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import IVFConfig, Metric, SearchConfig
from vq_tpu.index.base import BaseSearchIndex
from vq_tpu.kernels.kmeans import assign, kmeans, pairwise_sqdist_xc
from vq_tpu.methods.base import BaseQuantizer


class IvfQuantizedIndex(BaseSearchIndex):
    name = "ivf"

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
        self.codes_sorted: Optional[jax.Array] = None
        self.ids_sorted: Optional[jax.Array] = None
        self.norms_sorted: Optional[jax.Array] = None
        self.offsets: Optional[jax.Array] = None  # (K,) start row of each cluster
        self.sizes: Optional[jax.Array] = None  # (K,)
        self.max_cluster = 0
        self.num_rows = 0

    # ------------------------------------------------------------------ fit
    def fit(self, X: np.ndarray) -> "IvfQuantizedIndex":
        x = jnp.asarray(X, dtype=jnp.float32)
        n = x.shape[0]
        k = min(self.ivf_cfg.num_clusters, max(1, n // 2))
        key = jax.random.PRNGKey(self.ivf_cfg.kmeans.seed)
        self.centroids = kmeans(key, x, k, self.ivf_cfg.kmeans)
        assignment = np.asarray(assign(x, self.centroids))

        order = np.argsort(assignment, kind="stable")
        sizes = np.bincount(assignment, minlength=k)
        offsets = np.concatenate([[0], np.cumsum(sizes)[:-1]])

        residuals = np.asarray(x) - np.asarray(self.centroids)[assignment]
        if self.quantizer.params is None:
            self.quantizer.fit(residuals)
        codes = self.quantizer.compress(residuals[order])

        self.max_cluster = int(sizes.max())
        # pad the tail so a fixed-size window slice never runs off the array
        pad = self.max_cluster
        self.codes_sorted = jnp.asarray(
            np.pad(codes, ((0, pad),) + ((0, 0),) * (codes.ndim - 1))
        )
        self.ids_sorted = jnp.asarray(
            np.pad(order.astype(np.int32), (0, pad), constant_values=-1)
        )
        self.norms_sorted = jnp.asarray(
            np.pad(
                np.linalg.norm(np.asarray(X, np.float32), axis=1)[order],
                (0, pad),
                constant_values=1.0,
            )
        )
        self.offsets = jnp.asarray(offsets.astype(np.int32))
        self.sizes = jnp.asarray(sizes.astype(np.int32))
        self.num_rows = n
        return self

    # --------------------------------------------------------------- search
    def _search_device(
        self, queries: jax.Array, k: int, nprobe: int
    ) -> Tuple[jax.Array, jax.Array]:
        metric = self.search_cfg.metric
        decode_fn = self.quantizer.decode_fn()
        cap = self.max_cluster
        centroids = self.centroids
        codes = self.codes_sorted
        ids = self.ids_sorted
        norms = self.norms_sorted
        offsets = self.offsets
        sizes = self.sizes

        @functools.partial(jax.jit, static_argnames=("kk", "np_"))
        def run(q, kk, np_):
            q = q.astype(jnp.float32)
            cd = pairwise_sqdist_xc(q, centroids)  # (Q, K)
            _, probe = jax.lax.top_k(-cd, np_)  # nearest centroids (Q, P)

            def per_query(qi, probes):
                def per_cluster(c):
                    start = offsets[c]
                    size = sizes[c]
                    ct = jax.lax.dynamic_slice_in_dim(codes, start, cap, axis=0)
                    rid = jax.lax.dynamic_slice_in_dim(ids, start, cap, axis=0)
                    nrm = jax.lax.dynamic_slice_in_dim(norms, start, cap, axis=0)
                    r_hat = decode_fn(ct)  # (cap, D) residual reconstruction
                    cent = centroids[c]
                    qr = qi - cent
                    ip_r = jnp.dot(r_hat, qr, precision=jax.lax.Precision.HIGHEST)
                    if metric == Metric.L2:
                        # ‖q − c − r̂‖² ranked by −(‖r̂‖² − 2 qr·r̂) + const(c)
                        rsq = jnp.sum(r_hat * r_hat, axis=1)
                        qr_sq = jnp.sum(qr * qr)
                        s = -(qr_sq - 2.0 * ip_r + rsq)
                    elif metric == Metric.IP:
                        s = ip_r + jnp.dot(qi, cent)
                    else:
                        s = (ip_r + jnp.dot(qi, cent)) / jnp.maximum(nrm, 1e-30)
                    valid = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0] < size
                    s = jnp.where(valid, s, -jnp.inf)
                    return s, rid

                s_all, id_all = jax.vmap(per_cluster)(probes)  # (P, cap)
                s_flat = s_all.reshape(-1)
                id_flat = id_all.reshape(-1)
                kk_eff = min(kk, s_flat.shape[0])
                ts, ti = jax.lax.top_k(s_flat, kk_eff)
                return ts, id_flat[ti]

            ts, ti = jax.vmap(per_query)(q, probe)
            if metric == Metric.L2:
                ts = -ts
            return ts, ti

        return run(queries, kk=k, np_=nprobe)

    def search_with_scores(
        self, queries: np.ndarray, k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        nprobe = min(self.ivf_cfg.nprobe, self.centroids.shape[0])
        scores, ids = self._search_device(jnp.asarray(queries), k, nprobe)
        ids = np.asarray(ids)
        scores = np.asarray(scores)
        ids = np.where(ids < 0, 0, ids)  # pad guard (masked scores are ±inf)
        return ids.astype(np.uint32), scores

    # ---------------------------------------------------------------- misc
    def memory_footprint(self) -> int:
        total = 0
        for a in (self.codes_sorted, self.ids_sorted, self.norms_sorted,
                  self.centroids, self.offsets, self.sizes):
            if a is not None:
                total += int(np.asarray(a).nbytes)
        total += sum(
            np.asarray(p).nbytes for p in jax.tree_util.tree_leaves(self.quantizer.params)
        )
        return total

    def reconstruction_mse(self, X: np.ndarray, sample: Optional[int] = 10000) -> float:
        xs = np.asarray(X[: sample or len(X)], np.float32)
        a = np.asarray(assign(jnp.asarray(xs), self.centroids))
        res = xs - np.asarray(self.centroids)[a]
        rec = self.quantizer.decompress(self.quantizer.compress(res))
        return float(np.mean((res - rec) ** 2))

    def _state(self) -> dict:
        import pickle

        return {
            "centroids": np.asarray(self.centroids),
            "codes_sorted": np.asarray(self.codes_sorted),
            "ids_sorted": np.asarray(self.ids_sorted),
            "norms_sorted": np.asarray(self.norms_sorted),
            "offsets": np.asarray(self.offsets),
            "sizes": np.asarray(self.sizes),
            "max_cluster": self.max_cluster,
            "num_rows": self.num_rows,
            "ivf_cfg": self.ivf_cfg,
            "search_cfg": self.search_cfg,
            "quantizer": pickle.dumps(self.quantizer),
        }

    def _restore(self, state: dict) -> None:
        import pickle

        self.quantizer = pickle.loads(state["quantizer"])
        for name in ("centroids", "codes_sorted", "ids_sorted", "norms_sorted",
                     "offsets", "sizes"):
            setattr(self, name, jnp.asarray(state[name]))
        self.max_cluster = state["max_cluster"]
        self.num_rows = state["num_rows"]
        self.ivf_cfg = state["ivf_cfg"]
        self.search_cfg = state["search_cfg"]
