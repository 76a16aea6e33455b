"""Measure the B >= 5 value-plane packed path vs the B <= 4 select-sum path
on the real chip (VERDICT r3 missing #4 / task 5: high-bit derived-codebook
segments were select-sum bound at 51.5 ms vs ~6 ms for B <= 4).

Shapes match the BENCH_NOTES round-3 kernel table: N=131072, D=1024, Q=256,
k=10, L2, bf16.  Prints one JSON line per config.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.cli import _enable_compilation_cache
from vq_tpu.core.config import Metric, RaBitQConfig, SAQConfig


def sustained(fn, reps=5, outer=3):
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        fn()
        times.append((time.perf_counter() - t0) / reps)
    return min(times)


def main():
    _enable_compilation_cache()
    n, d, nq, k = 131_072, 1024, 256, 10
    sigma = jnp.asarray(((1.0 + np.arange(d)) ** -0.6).astype(np.float32))
    x = jax.random.normal(jax.random.PRNGKey(0), (n, d), jnp.float32) * sigma
    q = x[:nq] + 0.1 * sigma * jax.random.normal(
        jax.random.PRNGKey(1), (nq, d), jnp.float32)

    # RaBitQ at B in {4, 8}: 8 takes the value-plane path
    from vq_tpu.methods import rabitq as rb
    for bits in (4, 8):
        m = rb.RaBitQ(RaBitQConfig(num_bits=bits))
        m.fit(x[:65536])
        enc = jax.jit(lambda xx: rb.encode(m.params, xx, bits))
        codes = jnp.concatenate(
            [enc(x[i0:i0 + 32768]) for i0 in range(0, n, 32768)])
        cache = rb.prepare_packed(m.params, codes, bits)
        kinds = [s for s in [rb._packed_segspec(d, bits)]]

        reps = 5

        @jax.jit
        def run(qq, codes, cache):
            def body(_, acc):
                s, i = rb.scan_topk(m.params, qq + acc * 0, codes, k,
                                    Metric.L2, bits, packed_cache=cache,
                                    use_packed=True)
                return acc + s[0, 0] * 1e-30
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        float(run(q, codes, cache))
        best = sustained(lambda: float(run(q, codes, cache)), reps=reps)
        print(json.dumps({
            "config": f"rabitq_b{bits}", "dequant": kinds[0].dequant,
            "ms_per_scan": round(best * 1e3, 2),
        }), flush=True)
        del cache, codes

    # SAQ derived-codebook (lloyd) at bpd in {2, 6}
    from vq_tpu.methods import saq as sq
    for bpd in (2.0, 6.0):
        cfg = SAQConfig(bits_per_dim=bpd, use_pca=True, codebook="lloyd")
        m = sq.SAQ(cfg)
        m._dim = d
        m.plan, m.params = sq.fit(jax.random.PRNGKey(0), x[:65536], cfg)
        enc = jax.jit(lambda xx: sq.encode(m.plan, m.params, xx))
        codes = jnp.concatenate(
            [enc(x[i0:i0 + 32768]) for i0 in range(0, n, 32768)])
        cache = sq.prepare_packed(m.plan, m.params, codes)
        segs = sq.packed_segspecs(m.plan, m.params)[0]

        reps = 5

        @jax.jit
        def run(qq, codes, cache):
            def body(_, acc):
                s, i = sq.scan_topk(m.plan, m.params, qq + acc * 0, codes,
                                    k, Metric.L2, packed_cache=cache,
                                    use_packed=True)
                return acc + s[0, 0] * 1e-30
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0))

        float(run(q, codes, cache))
        best = sustained(lambda: float(run(q, codes, cache)), reps=reps)
        print(json.dumps({
            "config": f"saq_lloyd_bpd{bpd}",
            "segs": [(s.bits, s.ln, s.dequant) for s in segs],
            "ms_per_scan": round(best * 1e3, 2),
        }), flush=True)
        del cache, codes


if __name__ == "__main__":
    main()
