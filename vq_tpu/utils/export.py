"""Codebook export / query tooling.

Parity with the reference's faiss_export helpers
(src/haag_vq/utils/faiss_export.py:126-506): `export_codebook` persists a
trained quantizer's codebook vectors to `.fvecs` (plus optional codes to
`.ivecs`), and `query_codebook` searches the exported codebook for the
nearest entries to a batch of queries — per-chunk for product quantizers
(reference _query_product_codebook, faiss_export.py:352-414).  The faiss
index machinery is replaced by the engine's own exact scan
(kernels/adc.py::exact_topk).
"""

from __future__ import annotations

import os
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import Metric
from vq_tpu.data.io import write_fvecs, write_ivecs
from vq_tpu.kernels.adc import exact_topk
from vq_tpu.methods.base import BaseQuantizer


def extract_codebook(model: BaseQuantizer) -> np.ndarray:
    """2-D float32 codebook matrix for fvecs export.

    PQ/OPQ → (M·K, dsub) concatenated per-chunk centroids
    (reference _extract_codebook, faiss_export.py:150-178); SQ → the
    (2, D) [min-row, max-row] stack; RankAware → the (D, 2^max_bits)
    per-dim level table.  Bit-level methods (SAQ/RaBitQ/LVQ) have no static
    codebook and raise, matching the reference.
    """
    name = getattr(model, "name", "")
    params = model.params
    if params is None and name not in ("saq",):
        raise ValueError(f"{name}: fit the quantizer before exporting")
    if name in ("pq", "opq"):
        cb = np.asarray(params.codebooks, dtype=np.float32)  # (M, K, dsub)
        return cb.reshape(-1, cb.shape[-1])
    if name == "sq":
        lo = np.asarray(params.lo, dtype=np.float32)
        levels = (1 << model.cfg.num_bits) - 1
        hi = lo + np.asarray(params.scale, dtype=np.float32) * levels
        return np.stack([lo, hi])
    if name in ("rankaware", "perdim_mse"):
        return np.asarray(params.codebooks, dtype=np.float32)
    raise RuntimeError(
        f"{name}: this quantizer does not expose a static codebook for "
        "export (reference faiss_export.py:172-178 raises identically)"
    )


def export_codebook(
    model: BaseQuantizer,
    output_dir: str,
    codes: Optional[np.ndarray] = None,
    codebook_filename: str = "codebook.fvecs",
    codes_filename: str = "codes.ivecs",
) -> Dict[str, object]:
    """Persist a quantizer's codebook (and optional codes) to fvecs/ivecs
    (reference export_codebook, faiss_export.py:304-349)."""
    os.makedirs(output_dir, exist_ok=True)
    codebook = extract_codebook(model)
    codebook_path = os.path.join(output_dir, codebook_filename)
    write_fvecs(codebook_path, codebook)
    out: Dict[str, object] = {
        "codebook_path": codebook_path,
        "codebook": codebook,
    }
    if codes is not None:
        codes2d = np.asarray(codes)
        if codes2d.ndim == 1:
            codes2d = codes2d[:, None]
        codes_path = os.path.join(output_dir, codes_filename)
        write_ivecs(codes_path, codes2d.astype(np.int32))
        out["codes_path"] = codes_path
    return out


def _query_product_codebook(
    queries: np.ndarray,
    model: BaseQuantizer,
    codebook_vectors: np.ndarray,
    topk: int,
    metric: Metric,
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-chunk nearest-centroid search for PQ/OPQ codebooks (reference
    faiss_export.py:352-414): queries are split into M sub-vectors, each
    searched against its chunk's K centroids; results are flattened across
    chunks as (Q, M·topk)."""
    cb = np.asarray(model.params.codebooks, dtype=np.float32)  # (M, K, dsub)
    m, k_size, dsub = cb.shape
    expected = (m * k_size, dsub)
    if codebook_vectors.shape != expected:
        raise ValueError(
            f"product codebook shape {codebook_vectors.shape} != {expected}"
        )
    q = np.asarray(queries, dtype=np.float32)
    if getattr(model, "name", "") == "opq":
        import jax

        q = np.asarray(
            jnp.dot(jnp.asarray(q), model.params.rotation,
                    precision=jax.lax.Precision.HIGHEST)
        )
    if q.shape[1] != m * dsub:
        raise ValueError(f"query dim {q.shape[1]} != {m * dsub}")
    qs = q.reshape(-1, m, dsub)
    dists, ids = [], []
    for mm in range(m):
        s, i = exact_topk(
            jnp.asarray(qs[:, mm, :]), jnp.asarray(cb[mm]),
            k=min(topk, k_size), metric=metric,
        )
        dists.append(np.asarray(s))
        ids.append(np.asarray(i) + mm * k_size)  # global codebook row ids
    return np.concatenate(dists, axis=1), np.concatenate(ids, axis=1)


def query_codebook(
    queries: np.ndarray,
    model: Optional[BaseQuantizer] = None,
    codebook_vectors: Optional[np.ndarray] = None,
    codebook_path: Optional[str] = None,
    topk: int = 1,
    metric: Metric = Metric.L2,
) -> Tuple[np.ndarray, np.ndarray]:
    """Search the (exported) codebook for the nearest entries to `queries`
    (reference query_codebook, faiss_export.py:417-506).

    Returns (distances, indices).  For product quantizers the search is
    per chunk with results flattened across chunks.
    """
    if codebook_vectors is None:
        if codebook_path is not None:
            from vq_tpu.data.io import load_fvecs

            codebook_vectors = load_fvecs(codebook_path)
        elif model is not None:
            codebook_vectors = extract_codebook(model)
        else:
            raise ValueError(
                "provide model, codebook_vectors, or codebook_path"
            )
    queries = np.atleast_2d(np.asarray(queries, dtype=np.float32))
    if model is not None and getattr(model, "name", "") in ("pq", "opq"):
        return _query_product_codebook(
            queries, model, np.asarray(codebook_vectors, np.float32), topk,
            metric,
        )
    s, i = exact_topk(
        jnp.asarray(queries), jnp.asarray(codebook_vectors, jnp.float32),
        k=min(topk, len(codebook_vectors)), metric=metric,
    )
    return np.asarray(s), np.asarray(i)
