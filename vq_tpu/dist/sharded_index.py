"""Sharded flat index: the multi-host/multi-chip serving path.

The BASELINE.json north star: compressed corpus tensor-sharded across the
mesh along N, codebooks replicated, queries replicated via continuous
batches, cross-shard top-k merge collectives overlapped with the scan.
This class owns that layout for the PQ family (the flagship model); the
same pattern serves any method whose scan accepts `num_valid` masking.

On one chip every sharding is a no-op (same kernels at toy and pod scale,
SURVEY.md §4.3); the unit tests exercise an 8-virtual-device CPU mesh and
the driver's dryrun compiles the same path.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import Metric, PQConfig, SearchConfig
from vq_tpu.dist.mesh import make_mesh, pad_rows_to_multiple, replicate, shard_rows
from vq_tpu.dist.sharded import sharded_generic_scan_topk, sharded_scan_topk
from vq_tpu.index.base import BaseSearchIndex, nbytes_of
from vq_tpu.methods.base import BaseQuantizer
from vq_tpu.methods.pq import PQ


class ShardedFlatPQIndex(BaseSearchIndex):
    """PQ flat index with the code tensor row-sharded over a device mesh."""

    name = "sharded_flat_pq"

    def __init__(
        self,
        pq: Optional[PQ] = None,
        search_cfg: SearchConfig = SearchConfig(),
        mesh=None,
    ):
        self.pq = pq or PQ(PQConfig())
        self.search_cfg = search_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.codes = None
        self.norms = None
        self.num_rows = 0

    @property
    def num_shards(self) -> int:
        return int(self.mesh.devices.size)

    def fit(self, X: np.ndarray) -> "ShardedFlatPQIndex":
        if self.pq.params is None:
            self.pq.fit(X)
        codes = np.asarray(self.pq.compress(X))
        norms = np.linalg.norm(np.asarray(X, np.float32), axis=1)
        self.num_rows = len(X)
        codes_p = pad_rows_to_multiple(codes, self.num_shards)
        norms_p = np.pad(
            norms, (0, codes_p.shape[0] - len(norms)), constant_values=1.0
        )
        self.codes = shard_rows(self.mesh, jnp.asarray(codes_p))
        self.norms = shard_rows(self.mesh, jnp.asarray(norms_p))
        return self

    def add_sharded(self, codes: np.ndarray, norms: np.ndarray, num_rows: int) -> None:
        """Install pre-encoded codes directly (multi-host ingestion path:
        each host encodes its local shard, then hands rows here)."""
        self.num_rows = num_rows
        codes_p = pad_rows_to_multiple(np.asarray(codes), self.num_shards)
        norms_p = np.pad(
            np.asarray(norms, np.float32),
            (0, codes_p.shape[0] - len(norms)),
            constant_values=1.0,
        )
        self.codes = shard_rows(self.mesh, jnp.asarray(codes_p))
        self.norms = shard_rows(self.mesh, jnp.asarray(norms_p))

    def search_with_scores(
        self, queries: np.ndarray, k: int = 10
    ) -> Tuple[np.ndarray, np.ndarray]:
        q = replicate(self.mesh, jnp.asarray(queries, dtype=jnp.float32))
        scores, ids = sharded_scan_topk(
            self.mesh,
            q,
            self.codes,
            replicate(self.mesh, self.pq.params.codebooks),
            k=k,
            metric=self.search_cfg.metric,
            norms=self.norms if self.search_cfg.metric == Metric.NIP else None,
            true_n=self.num_rows,
            tile_rows=self.search_cfg.tile_rows,
            use_bf16=self.search_cfg.use_bf16,
        )
        return np.asarray(ids).astype(np.uint32), np.asarray(scores)

    def memory_footprint(self) -> int:
        total = 0
        for a in (self.codes, self.norms):
            if a is not None:
                total += nbytes_of(a)
        total += sum(
            nbytes_of(p) for p in jax.tree_util.tree_leaves(self.pq.params)
        )
        return total

    def reconstruction_mse(self, X: np.ndarray, sample: Optional[int] = 10000) -> float:
        return self.pq.reconstruction_mse(X, sample)


class ShardedFlatIndex(BaseSearchIndex):
    """Flat index for ANY quantizer, code rows sharded over the mesh.

    The generic-method companion of ShardedFlatPQIndex: each shard runs
    the fused decode→score→top-k scan (kernels/adc.scan_generic_topk) with
    the quantizer's `decode_fn`, candidates merge exactly across chips
    (dist/sharded.sharded_generic_scan_topk).  Covers sharded serving for
    SQ/LVQ/SAQ/RaBitQ/RankAware — any BaseQuantizer."""

    name = "sharded_flat"

    def __init__(
        self,
        quantizer: BaseQuantizer,
        search_cfg: SearchConfig = SearchConfig(),
        mesh=None,
    ):
        self.quantizer = quantizer
        self.search_cfg = search_cfg
        self.mesh = mesh if mesh is not None else make_mesh()
        self.codes = None
        self.norms = None
        self.num_rows = 0

    @property
    def num_shards(self) -> int:
        return int(self.mesh.devices.size)

    def fit(self, X: np.ndarray) -> "ShardedFlatIndex":
        if self.quantizer.params is None:
            self.quantizer.fit(X)
        codes = np.asarray(self.quantizer.compress(np.asarray(X)))
        norms = np.linalg.norm(np.asarray(X, np.float32), axis=1)
        self.num_rows = len(X)
        codes_p = pad_rows_to_multiple(codes, self.num_shards)
        norms_p = np.pad(
            norms, (0, codes_p.shape[0] - len(norms)), constant_values=1.0
        )
        self.codes = shard_rows(self.mesh, jnp.asarray(codes_p))
        self.norms = shard_rows(self.mesh, jnp.asarray(norms_p))
        return self

    def search_with_scores(
        self, queries: np.ndarray, k: int = 10, overlap_chunks: int = 1
    ) -> Tuple[np.ndarray, np.ndarray]:
        q = replicate(self.mesh, jnp.asarray(queries, dtype=jnp.float32))
        scores, ids = sharded_generic_scan_topk(
            self.mesh,
            q,
            self.codes,
            self.quantizer.decode_fn(),
            k=k,
            metric=self.search_cfg.metric,
            norms=self.norms if self.search_cfg.metric == Metric.NIP else None,
            true_n=self.num_rows,
            tile_rows=self.search_cfg.tile_rows,
            use_bf16=self.search_cfg.use_bf16,
            overlap_chunks=overlap_chunks,
        )
        return np.asarray(ids).astype(np.uint32), np.asarray(scores)

    def memory_footprint(self) -> int:
        total = 0
        for a in (self.codes, self.norms):
            if a is not None:
                total += nbytes_of(a)
        total += sum(
            nbytes_of(p)
            for p in jax.tree_util.tree_leaves(self.quantizer.params)
        )
        return total

    def reconstruction_mse(self, X: np.ndarray, sample: Optional[int] = 10000) -> float:
        return self.quantizer.reconstruction_mse(X, sample)
