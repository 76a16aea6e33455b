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
  2. streams each probed list in fixed `chunk`-row windows inside a
     lax.while_loop whose trip count is the LARGEST PROBED size this
     batch (scan_probed_lists) — peak memory is Q_block·nprobe·chunk
     decoded rows, not nprobe·max_cluster, and work adapts to the probed
     sizes instead of the global maximum,
  3. rescores candidates against the query's per-cluster RESIDUAL with the
     quantizer's jax decode, entirely on device,
  4. folds every window into a running top-k per query.
Queries run in fixed-size blocks so the decoded-window buffer stays
bounded at serving batch sizes.  decompress() reconstructs any row by
GLOBAL id (residual decode + centroid add), the reference engine's
IVF::decompress (external/saq/src/ivf_index.cpp:245-374).

Scan-strategy note (BENCH_NOTES crossover table): the flat packed-kernel
cascades don't transfer here by design — IVF probing IS the candidate-
restriction stage (it reads ~nprobe/K of the corpus before any scoring),
the probed windows are far below the 512-row tile the variance bound
amortizes over, and cluster residuals are norm-concentrated by
construction (the coarse assignment removes the norm heterogeneity the
flat-scan bound feeds on).  Dense decode_fn windows on the MXU are the
measured-right default for list scanning, as for the flat scan.
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


def scan_probed_lists(
    q: jax.Array,
    probes: jax.Array,
    centroids: jax.Array,
    codes_sorted: jax.Array,
    ids_sorted: jax.Array,
    norms_sorted: jax.Array,
    offsets: jax.Array,
    sizes: jax.Array,
    decode_fn,
    k: int,
    metric: Metric,
    chunk: int = 512,
    probe_mask: Optional[jax.Array] = None,
):
    """Scan the probed inverted lists in bounded windows → maximize-form
    (scores (Q, k), global ids (Q, k)).

    The memory-bounded replacement for the fixed max_cluster window: a
    lax.while_loop walks each probed list `chunk` rows at a time and stops
    at the largest size actually probed by THIS query batch, folding each
    window into a running top-k.  Peak live memory is the (Q, P, chunk)
    decoded window; one skewed cluster costs extra iterations only for the
    queries that probe it, never a bigger buffer.  (Reference scale path:
    per-cluster heap scans, external/saq/src/ivf_index.cpp:28-194.)

    probes (Q, P) int32; probe_mask (Q, P) bool optionally disables probes
    (the sharded IVF masks lists owned by other devices).  codes/ids/norms
    must carry ≥ chunk rows of tail padding so window slices never run off
    the array (fit() pads).  Scores for masked/invalid rows are −inf.
    """
    num_q, p_cnt = probes.shape
    qr = q[:, None, :] - centroids[probes]  # (Q, P, D) residual queries
    qr_sq = jnp.sum(qr * qr, axis=-1)  # (Q, P)
    q_cent = jnp.einsum("qd,qpd->qp", q, centroids[probes],
                        precision=jax.lax.Precision.HIGHEST)
    starts = offsets[probes]  # (Q, P)
    szs = sizes[probes]  # (Q, P)
    if probe_mask is not None:
        szs = jnp.where(probe_mask, szs, 0)
    max_sz = jnp.max(szs)

    def window(c, run_s, run_i):
        off = c * chunk

        def per_probe(start, size, qr_1, qr_sq_1, q_cent_1):
            ct = jax.lax.dynamic_slice_in_dim(
                codes_sorted, start + off, chunk, axis=0)
            rid = jax.lax.dynamic_slice_in_dim(
                ids_sorted, start + off, chunk, axis=0)
            nrm = jax.lax.dynamic_slice_in_dim(
                norms_sorted, start + off, chunk, axis=0)
            r_hat = decode_fn(ct)  # (chunk, D)
            ip_r = jnp.dot(r_hat, qr_1, precision=jax.lax.Precision.HIGHEST)
            if metric == Metric.L2:
                rsq = jnp.sum(r_hat * r_hat, axis=1)
                s = -(qr_sq_1 - 2.0 * ip_r + rsq)
            elif metric == Metric.IP:
                s = ip_r + q_cent_1
            else:
                s = (ip_r + q_cent_1) / jnp.maximum(nrm, 1e-30)
            valid = jax.lax.broadcasted_iota(jnp.int32, (chunk, 1), 0)[:, 0] \
                < (size - off)
            return jnp.where(valid, s, -jnp.inf), rid

        s_all, id_all = jax.vmap(jax.vmap(per_probe))(
            starts, szs, qr, qr_sq, q_cent
        )  # (Q, P, chunk)
        cat_s = jnp.concatenate([run_s, s_all.reshape(num_q, -1)], axis=1)
        cat_i = jnp.concatenate([run_i, id_all.reshape(num_q, -1)], axis=1)
        ms, mi = jax.lax.top_k(cat_s, k)
        return ms, jnp.take_along_axis(cat_i, mi, axis=-1)

    init = (
        jnp.zeros((1,), jnp.int32),
        jnp.full((num_q, k), -jnp.inf, jnp.float32),
        jnp.zeros((num_q, k), jnp.int32),
    )

    def cond(carry):
        return carry[0][0] * chunk < max_sz

    def body(carry):
        c, run_s, run_i = carry
        run_s, run_i = window(c[0], run_s, run_i)
        return (c + 1, run_s, run_i)

    _, run_s, run_i = jax.lax.while_loop(cond, body, init)
    return run_s, run_i


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
        # pad the tail so a window slice never runs off the array (valid
        # windows read ≤ chunk rows past a cluster's end; see
        # scan_probed_lists)
        pad = max(self.max_cluster, 512) + 512
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
        # inverse permutation: global row id → position in the sorted layout
        # (decompress-by-id, reference ivf_index.cpp:245-374)
        inv = np.empty(n, dtype=np.int64)
        inv[order] = np.arange(n)
        self._inv_perm = inv
        self._assignment = assignment
        self.num_rows = n
        return self

    # --------------------------------------------------------- decompress
    def decompress(self, ids: np.ndarray) -> np.ndarray:
        """Reconstruct rows by GLOBAL id: residual decode + centroid add —
        the engine's IVF::decompress (external/saq/src/ivf_index.cpp:
        245-374: dequantize raw codes, un-rotate per segment, restore norm,
        inverse PCA — all of which the quantizer's own decode performs)."""
        ids = np.asarray(ids).reshape(-1)
        pos = self._inv_perm[ids]
        rows = np.asarray(self.codes_sorted)[pos]
        res = self.quantizer.decompress(rows)
        cents = np.asarray(self.centroids)[self._assignment[ids]]
        return res + cents

    # --------------------------------------------------------------- search
    def _search_device(
        self, queries: jax.Array, k: int, nprobe: int, chunk: int = 512
    ) -> Tuple[jax.Array, jax.Array]:
        metric = self.search_cfg.metric
        decode_fn = self.quantizer.decode_fn()
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
            ts, ti = scan_probed_lists(
                q, probe, centroids, codes, ids, norms, offsets, sizes,
                decode_fn, kk, metric, chunk=chunk,
            )
            if metric == Metric.L2:
                ts = -ts
            return ts, ti

        return run(queries, kk=k, np_=nprobe)

    def search_with_scores(
        self, queries: np.ndarray, k: int = 10,
        query_block: Optional[int] = None, chunk: int = 512,
        decode_budget_bytes: int = 2 << 30,
    ) -> Tuple[np.ndarray, np.ndarray]:
        nprobe = min(self.ivf_cfg.nprobe, self.centroids.shape[0])
        q = jnp.asarray(queries)
        if query_block is None:
            # the scan window decodes (block, nprobe, chunk) rows of D f32
            # — auto-size the query block so that buffer stays under the
            # budget at any (D, nprobe): e.g. D=1536, nprobe=64 → block 8
            # (a fixed 256 block measured 24 GB HBM → OOM)
            d = self.centroids.shape[1]
            rows = max(1, decode_budget_bytes // (4 * d * nprobe * chunk))
            query_block = int(np.clip(1 << int(np.log2(rows)), 8, 256))
        # fixed-size query blocks bound the decoded-window buffer at
        # (block, nprobe, chunk) rows regardless of the serving batch
        outs = []
        for i0 in range(0, q.shape[0], query_block):
            outs.append(self._search_device(q[i0 : i0 + query_block], k,
                                            nprobe, chunk=chunk))
        scores = np.concatenate([np.asarray(o[0]) for o in outs], axis=0)
        ids = np.concatenate([np.asarray(o[1]) for o in outs], axis=0)
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
            "inv_perm": self._inv_perm,
            "assignment": self._assignment,
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
        self._inv_perm = state.get("inv_perm")
        self._assignment = state.get("assignment")
