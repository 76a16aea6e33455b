#!/usr/bin/env python
"""Run only the gate-corpus rows the round-5 parity retry lost (the run
died at opq M=192 — decode_pq one-hot OOM, now fixed via chunked Xᵀ·X̂
accumulation in methods/opq.py) and print them in the same [gate] format
so PARITY_RESULTS.md can be assembled from the two logs.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from parity_check import GATE_GRID  # noqa: E402

from vq_tpu.cli import _enable_compilation_cache  # noqa: E402
from vq_tpu.core.config import SearchConfig  # noqa: E402
from vq_tpu.data.datasets import load_planted_dataset  # noqa: E402
from vq_tpu.index.flat import FlatQuantizedIndex  # noqa: E402
from vq_tpu.metrics.recall import recall_at_k  # noqa: E402

ONLY = ("opq M=192 B=8", "sq 8-bit", "lvq 8-bit")


def main() -> None:
    _enable_compilation_cache()
    data = load_planted_dataset(num_vectors=100_000, dim=1536,
                                num_queries=1024, seed=0)
    for label, make, ref10 in GATE_GRID:
        if label not in ONLY:
            continue
        idx = FlatQuantizedIndex(make(), SearchConfig()).fit(data.vectors)
        ids = idx.search(data.queries, k=100)
        r10 = recall_at_k(data.ground_truth, ids, 10)
        r100 = recall_at_k(data.ground_truth, ids, 100)
        anchor = f" (dbpedia anchor {ref10:.3f})" if ref10 else ""
        print(f"[gate] {label:<28} R@10 {r10:.3f}{anchor}  R@100 {r100:.3f}",
              flush=True)
        del idx


if __name__ == "__main__":
    main()
