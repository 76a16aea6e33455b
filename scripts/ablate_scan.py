#!/usr/bin/env python
"""Ablate the headline ADC scan: where do the milliseconds go?

Times each stage of the fused scan separately on the real chip with
dependent in-jit repetition (single-call timing is meaningless over the
axon tunnel — see CLAUDE.md):

  scores            Pallas fused decode+score only, (Q, N) f32 out
  scores+exact_topk scores then one exact lax.top_k over all N columns
  scores+approx     scores then lax.approx_max_k (recall_target=0.99)
  scan_exact        scan_codes_topk (the bench headline path)
  scan_approx       scan_codes_topk(approx=True)

Usage: python scripts/ablate_scan.py [N] [tile]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timed(fn, reps: int = 10, tries: int = 3) -> float:
    """Best-of-`tries` wall time of a jitted dependent-repetition loop."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def loop():
        def body(_, acc):
            return acc + fn(acc)

        return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

    float(loop())  # compile + warm
    best = float("inf")
    for _ in range(tries):
        t0 = time.perf_counter()
        float(loop())
        best = min(best, time.perf_counter() - t0)
    return best / reps


def main() -> None:
    import jax
    import jax.numpy as jnp

    from vq_tpu.core.config import KMeansConfig, Metric, PQConfig
    from vq_tpu.kernels.adc import scan_codes_topk
    from vq_tpu.kernels.pallas_scan import pq_score_all
    from vq_tpu.methods import pq as pq_mod

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_352  # multiple of 512
    tile = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    d, nq, k = 1536, 1024, 10

    rng = np.random.default_rng(0)
    sigma = (1.0 + np.arange(d)) ** -0.75
    x = (rng.standard_normal((n, d)) * sigma).astype(np.float32)
    q = jnp.asarray(x[rng.integers(0, n, nq)])
    xd = jnp.asarray(x)

    cfg = PQConfig(num_subquantizers=16, num_bits=8, kmeans=KMeansConfig(iters=4))
    params = pq_mod.fit(jax.random.PRNGKey(0), xd, cfg)
    codes = pq_mod.encode(params, xd)
    codes.block_until_ready()
    cb = params.codebooks

    results = {}

    def scores_fn(acc):
        s = pq_score_all(q + acc * 0, codes, cb, tile=tile, l2=True)
        return s[0, 0] * 1e-30

    results["scores"] = timed(scores_fn)

    def scores_exact_fn(acc):
        s = pq_score_all(q + acc * 0, codes, cb, tile=tile, l2=True)
        ts, ti = jax.lax.top_k(s, k)
        return ts[0, 0] * 1e-30

    results["scores+exact_topk"] = timed(scores_exact_fn)

    def scores_approx_fn(acc):
        s = pq_score_all(q + acc * 0, codes, cb, tile=tile, l2=True)
        ts, ti = jax.lax.approx_max_k(s, k, recall_target=0.99)
        return ts[0, 0] * 1e-30

    results["scores+approx"] = timed(scores_approx_fn)

    def scan_fn(acc):
        s, i = scan_codes_topk(q + acc * 0, codes, cb, k=k, metric=Metric.L2,
                               tile_rows=16384, use_bf16=True)
        return s[0, 0] * 1e-30

    results["scan_exact"] = timed(scan_fn)

    def scan_approx_fn(acc):
        s, i = scan_codes_topk(q + acc * 0, codes, cb, k=k, metric=Metric.L2,
                               tile_rows=16384, use_bf16=True, approx=True)
        return s[0, 0] * 1e-30

    results["scan_approx"] = timed(scan_approx_fn)

    from vq_tpu.kernels.pallas_scan import pq_scan_topk_fused

    def fused_fn(acc):
        ts, ti = pq_scan_topk_fused(q + acc * 0, codes, cb, k=k, tile=tile,
                                    l2=True)
        return ts[0, 0] * 1e-30

    results["fused_inkernel_topk"] = timed(fused_fn)

    flops = nq * n * d * 2 + n * 256 * d * 2  # score + one-hot decode
    print(f"\nN={n} D={d} Q={nq} tile={tile}")
    for name, t in results.items():
        print(f"{name:<20} {t*1e3:8.2f} ms   {nq/t:10.0f} qps   "
              f"{flops/t/1e12:6.1f} eff TFLOP/s")


if __name__ == "__main__":
    main()
