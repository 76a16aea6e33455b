"""Headline benchmark: ADC queries/sec/chip at recall@10, PQ M=16 B=8, D=1536.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Setup mirrors BASELINE.json's north-star config (dbpedia-1536 geometry:
N=100k, D=1536, PQ M=16 B=8, k=10).  Corpus is synthetic when the real
dbpedia files are absent (QPS is geometry-bound, not data-bound; recall is
reported for the same data the GT was computed on, so it is self-consistent).

vs_baseline: the reference's measured single-core ADC scoring rate is
~2.4 M vec/s for uniform-width ADC (reference bench/ffd_speed.cpp:10-16, at
D=1024); at N=100k rows that is 24 queries/s/core.  vs_baseline = our
QPS/chip ÷ 24.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vq_tpu.core.config import KMeansConfig, Metric, PQConfig
    from vq_tpu.kernels.adc import exact_topk, scan_codes_topk
    from vq_tpu.methods import pq as pq_mod
    from vq_tpu.metrics.recall import recall_at_k

    n = int(os.environ.get("VQ_BENCH_N", 100_000))
    d = int(os.environ.get("VQ_BENCH_D", 1536))
    nq = int(os.environ.get("VQ_BENCH_Q", 1024))
    k = 10

    # power-law spectrum mimicking text-embedding covariance decay; queries
    # are jittered corpus rows so GT neighbors are findable.  Note M=16 B=8
    # at D=1536 is 0.083 bits/dim (512x compression) — recall@10 is
    # intrinsically modest at this geometry on ANY data; the headline here
    # is the scan throughput at the north-star code shape.
    # Data is generated ON DEVICE: at N=1M the corpus is 6.1 GB and the
    # host<->TPU tunnel would spend minutes just transferring it.
    sigma = jnp.asarray(((1.0 + np.arange(d)) ** -0.75).astype(np.float32))
    kx, kq, kj = jax.random.split(jax.random.PRNGKey(0), 3)

    @jax.jit
    def gen_data():
        x = jax.random.normal(kx, (n, d), dtype=jnp.float32) * sigma
        qidx = jax.random.randint(kq, (nq,), 0, n)
        q = x[qidx] + 0.25 * sigma * jax.random.normal(kj, (nq, d),
                                                       dtype=jnp.float32)
        return x, q

    xd, qd = gen_data()
    xd.block_until_ready()

    cfg = PQConfig(num_subquantizers=16, num_bits=8, kmeans=KMeansConfig(iters=20))
    params = pq_mod.fit(jax.random.PRNGKey(0), xd, cfg)
    codes = pq_mod.encode(params, xd)
    codes.block_until_ready()

    # ground truth on-device
    _, gt = exact_topk(qd, xd, k=k, metric=Metric.L2)
    gt = np.asarray(gt)

    tile = int(os.environ.get("VQ_BENCH_TILE", 16384))

    def run():
        s, i = scan_codes_topk(
            qd, codes, params.codebooks, k=k, metric=Metric.L2,
            tile_rows=tile, use_bf16=True,
        )
        return i

    ids = np.asarray(run())  # compile + warmup
    recall = recall_at_k(gt, ids, k)

    # Sustained throughput: R dependent scans inside one jit (a serving loop
    # that keeps the chip busy), amortizing the host<->TPU tunnel round-trip
    # (~28 ms/call on this setup, which would otherwise dominate).
    reps = 10

    @jax.jit
    def run_reps(qd, codes, cb):
        def body(_, acc):
            s, i = scan_codes_topk(
                qd + acc * 0, codes, cb, k=k, metric=Metric.L2,
                tile_rows=tile, use_bf16=True,
            )
            return acc + s[0, 0] * 1e-30
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    float(run_reps(qd, codes, params.codebooks))  # compile
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        float(run_reps(qd, codes, params.codebooks))
        best = min(best, time.perf_counter() - t0)
    per_scan = best / reps
    qps = nq / per_scan

    # encode throughput (north-star aux metric: encode vecs/sec), sustained.
    # Measured on a ≤100k-row subset: throughput is per-row constant, and
    # perturbing the full corpus per rep (xd + acc·0) doubles the corpus
    # footprint inside the loop — OOM at N=1M.
    enc_reps = 3
    n_enc = min(n, 100_000)
    xe = xd[:n_enc]

    @jax.jit
    def enc_reps_fn(xe):
        def body(i, acc):
            c = pq_mod.encode(params, xe + acc * 0)
            return acc + c[0, 0].astype(jnp.float32) * 1e-30
        return jax.lax.fori_loop(0, enc_reps, body, jnp.float32(0))

    float(enc_reps_fn(xe))
    t0 = time.perf_counter()
    float(enc_reps_fn(xe))
    encode_vps = n_enc / ((time.perf_counter() - t0) / enc_reps)

    from vq_tpu.utils.profiling import ScanStats

    stats = ScanStats(
        num_rows=n, num_queries=nq, dim=d, code_bytes_per_row=16.0
    ).report(per_scan)

    baseline_qps = 2.4e6 / n  # reference 1-core uniform-ADC rate / corpus size
    print(
        json.dumps(
            {
                "metric": "adc_qps_per_chip@recall10_pq16x8_d1536_n100k",
                "value": round(qps, 1),
                "unit": "queries/s/chip",
                "vs_baseline": round(qps / baseline_qps, 1),
                "recall_at_10": round(recall, 4),
                "scan_wall_s": round(per_scan, 5),
                "n": n,
                "num_queries": nq,
                "encode_vecs_per_s": round(encode_vps, 1),
                "effective_tflops": round(stats["effective_tflops"], 2),
            }
        )
    )


if __name__ == "__main__":
    main()
