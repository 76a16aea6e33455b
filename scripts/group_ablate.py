#!/usr/bin/env python
"""Time the fused scan-topk kernel at decode group sizes 1/2/4/8 on the
real chip (see kernels/pallas_scan.py::_decode_tile for what `group`
trades: g× decode FLOPs for 1/g the matmul count).

Usage: python scripts/group_ablate.py [N]
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

    from vq_tpu.kernels.pallas_scan import pq_scan_topk_fused

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100_352
    d, nq, k, m, ksz = 1536, 1024, 10, 16, 256
    rng = np.random.default_rng(0)
    kx = jax.random.PRNGKey(0)

    codes = jax.device_put(rng.integers(0, ksz, (n, m)).astype(np.int32))
    cb = jax.device_put(rng.standard_normal((m, ksz, d // m)).astype(np.float32))
    q = jax.random.normal(kx, (nq, d), dtype=jnp.float32)

    for group in (1, 2, 4, 8):
        @jax.jit
        def loop(q=q, group=group):
            def body(_, acc):
                s, i = pq_scan_topk_fused(q + acc * 0, codes, cb, k=k,
                                          tile=512, l2=True, group=group)
                return acc + s[0, 0] * 1e-30
            return jax.lax.fori_loop(0, 10, body, jnp.float32(0))

        float(loop())  # compile + warm
        best = min(
            (lambda t0: (float(loop()), time.perf_counter() - t0)[1])(
                time.perf_counter()
            )
            for _ in range(3)
        )
        per = best / 10
        print(f"group={group}: {per*1e3:8.2f} ms/scan   {nq/per:10.0f} qps")


if __name__ == "__main__":
    main()
