#!/usr/bin/env python
"""Study pipeline (Metric.NIP) at the flagship corpus, packed path engaged.

VERDICT r4 task 8: the variance-prune NIP bound (norm-envelope columns,
kernels/pallas_packed.py) is implemented and bench-asserted but no
recorded STUDY run used it — this runs the study metric (normalized inner
product, reference exact_search.py:4-8) at the flagship geometry
(N=1M, D=1536, the full-rank power-law corpus of bench.gen_fullrank_corpus)
through the SAME packed scan serving uses, recording recall@{1,10,100},
sustained QPS, and the staged prune counters (reference
caq_estimator.h:33-37 fast_bitsum / acc_bitsum / total_comp_cnt) for the
SAQ rows.

Method fits use a 131k sample (the engine trains codebooks on a ≤200k
sample, external/saq/src/ivf_index.cpp:55-86); encoding streams the corpus
through the device in chunks via encode_fn.

Usage: python scripts/study_nip_flagship.py   (VQ_FAST=1 shrinks to 131k)
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    import bench
    from vq_tpu.bench.registry import build_quantizer
    from vq_tpu.bench.study import _study_params
    from vq_tpu.cli import _enable_compilation_cache
    from vq_tpu.core.config import Metric
    from vq_tpu.kernels.adc import exact_topk
    from vq_tpu.methods import saq as saq_mod
    from vq_tpu.metrics.recall import recall_at_k
    from vq_tpu.utils.profiling import ScanStats

    _enable_compilation_cache()
    fast = os.environ.get("VQ_FAST", "") == "1"
    n = 131_072 if fast else 1_048_576
    d, nq, kmax = 1536, 256, 100

    x, q = bench.gen_fullrank_corpus(jax, jnp, n, d, nq)
    x.block_until_ready()
    norms = jnp.maximum(jnp.linalg.norm(x, axis=1), 1e-12)
    _, gt = exact_topk(q, x, k=kmax, metric=Metric.NIP, norms=norms)
    gt = np.asarray(gt)

    # bpd {1, 4, 8} mirror the reference study table's comparison points
    # (results_full_20260612_235308.csv: pq/ours/saq_paper at 1/4/8)
    grid = [("pq", 1.0), ("saq_paper", 1.0), ("saq_paper", 2.0),
            ("saq_paper", 4.0), ("saq_paper", 8.0), ("ours", 2.0),
            ("ours", 4.0)]
    if fast:
        grid = [("saq_paper", 2.0)]
    xs_fit = x[:131_072]
    chunk = 131_072
    for method, bpd in grid:
        base, params_kw = _study_params(method, bpd, d)
        model = build_quantizer(base, d, **params_kw)
        t0 = time.perf_counter()
        model.fit(xs_fit)
        fit_s = time.perf_counter() - t0

        enc = jax.jit(model.encode_fn())
        t0 = time.perf_counter()
        codes = jnp.concatenate(
            [enc(x[i0:i0 + chunk]) for i0 in range(0, n, chunk)], axis=0)
        codes.block_until_ready()
        enc_s = time.perf_counter() - t0

        cache = model.prepare_scan(codes, norms=norms, num_queries=nq)
        _, ids = model.scan_topk(q, codes, kmax, Metric.NIP, norms=norms,
                                 cache=cache)
        ids = np.asarray(ids)
        row = {
            "method": method, "bpd": bpd, "n": n, "metric": "NIP",
            "packed_cache": cache is not None,
            "fit_s": round(fit_s, 1),
            "encode_s": round(enc_s, 1),
        }
        for kk in (1, 10, 100):
            row[f"recall{kk}"] = round(recall_at_k(gt, ids, kk), 4)

        reps = 5

        @jax.jit
        def run_reps(q, codes, cache, model=model):
            def body(_, acc):
                s, i = model.scan_topk(q + acc * 0, codes, kmax, Metric.NIP,
                                       norms=norms, cache=cache)
                return acc + s[0, 0] * 1e-30
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        float(run_reps(q, codes, cache))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(run_reps(q, codes, cache))
            best = min(best, (time.perf_counter() - t0) / reps)
        row["qps_per_chip"] = round(nq / best, 1)

        # staged prune counters for the SAQ family (NIP norm-envelope
        # bound): the kernel's scanned-tile count feeds the reference's
        # QueryRuntimeMetrics analog
        if cache is not None and isinstance(model, saq_mod.SAQ) \
                and cache.tile_stats is not None:
            _, _, scanned = saq_mod._packed_scan(
                model.plan, model.params, q, cache, kmax, Metric.NIP,
                prune=True)
            nb = cache.factors.shape[0] // 512
            staged = ScanStats(
                num_rows=nb * 512, num_queries=nq, dim=d,
                code_bytes_per_row=float(model.plan.code_bytes),
            ).report_staged(best, int(scanned), nb)
            row["prune_tiles_frac"] = round(int(scanned) / nb, 4)
            row["fast_bitsum"] = staged["fast_bitsum"]
            row["acc_bitsum"] = staged["acc_bitsum"]
            row["total_comp_cnt"] = staged["total_comp_cnt"]
        print(json.dumps(row), flush=True)
        del model, codes, cache


if __name__ == "__main__":
    main()
