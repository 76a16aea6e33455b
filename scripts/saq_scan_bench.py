#!/usr/bin/env python
"""SAQ scan throughput on the real chip (the BENCH_NOTES SAQ table).

Times the fused full scan and the prune+rerank cascade at the reference's
SAQ demo geometry, with dependent in-jit repetition.

Usage: python scripts/saq_scan_bench.py [N] [D] [Q] [bpd]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vq_tpu.core.config import Metric, SAQConfig
    from vq_tpu.methods.saq import SAQ, scan_topk
    from vq_tpu.kernels.adc import exact_topk
    from vq_tpu.metrics.recall import recall_at_k

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
    d = int(sys.argv[2]) if len(sys.argv) > 2 else 384
    nq = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    bpd = float(sys.argv[4]) if len(sys.argv) > 4 else 2.0
    k = 10

    rng = np.random.default_rng(0)
    sigma = (1.0 + np.arange(d)) ** -0.75
    x = (rng.standard_normal((n, d)) * sigma).astype(np.float32)
    q = (x[rng.integers(0, n, nq)]
         + 0.25 * sigma * rng.standard_normal((nq, d))).astype(np.float32)

    qz = SAQ(SAQConfig(bits_per_dim=bpd)).fit(x)
    codes = jnp.asarray(qz.compress(x))
    qd, xd = jnp.asarray(q), jnp.asarray(x)
    _, gt = exact_topk(qd, xd, k=k, metric=Metric.L2)
    gt = np.asarray(gt)

    def timed(fn, reps=10, tries=3):
        @jax.jit
        def loop():
            def body(_, acc):
                s, i = fn(acc)
                return acc + s[0, 0] * 1e-30
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        float(loop())
        best = float("inf")
        for _ in range(tries):
            t0 = time.perf_counter()
            float(loop())
            best = min(best, time.perf_counter() - t0)
        return best / reps

    plan, params = qz.plan, qz.params

    def full(acc):
        return scan_topk(plan, params, qd + acc * 0, codes, k, Metric.L2)

    def cascade(acc):
        return scan_topk(plan, params, qd + acc * 0, codes, k, Metric.L2,
                         prune_segments=1, rerank_factor=2000 // k)

    for name, fn in [("full", full), ("prune+rerank", cascade)]:
        t = timed(fn)
        _, ids = fn(jnp.float32(0))
        r = recall_at_k(gt, np.asarray(ids), k)
        print(f"{name:<14} {t*1e3:7.2f} ms/scan  {nq/t:9.0f} qps  recall@10 {r:.4f}",
              flush=True)


if __name__ == "__main__":
    main()
