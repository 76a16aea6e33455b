#!/usr/bin/env python
"""Env-parameterized full-benchmark driver with checkpoint-CSV resume.

Parity with the reference's scripts/run_full_benchmark.py +
run_remaining_benchmark.py (SURVEY.md §2.1 P44, §5 "checkpoint-CSV
resume"): configuration via env vars, completed (method, bpd) cells are
skipped on restart by reading the checkpoint CSV, results append as each
cell finishes so a killed run loses at most one cell.

Env:
  VQ_DATA_DIR   directory holding {base,query}.{npy,fvecs}   [data]
  VQ_DATASET    dataset name for the registry                [dbpedia-100k]
  VQ_OUT_DIR    output directory                             [results/full]
  VQ_METHODS    comma list of study methods                  [pq,ours,saq_paper]
  VQ_BPD        comma list of bits-per-dim                   [1,2,4,8]
  VQ_KS         comma list of recall cutoffs                 [1,10,100]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from vq_tpu.bench.study import run_study_arrays
from vq_tpu.data.datasets import get_dataset


def main() -> int:
    data_dir = os.environ.get("VQ_DATA_DIR", "data")
    dataset = os.environ.get("VQ_DATASET", "dbpedia-100k")
    out_dir = os.environ.get("VQ_OUT_DIR", "results/full")
    methods = os.environ.get("VQ_METHODS", "pq,ours,saq_paper").split(",")
    bpds = [float(b) for b in os.environ.get("VQ_BPD", "1,2,4,8").split(",")]
    ks = tuple(int(k) for k in os.environ.get("VQ_KS", "1,10,100").split(","))

    os.makedirs(out_dir, exist_ok=True)
    ckpt = os.path.join(out_dir, "results_checkpoint.csv")
    done = set()
    if os.path.exists(ckpt):
        prev = pd.read_csv(ckpt)
        done = {(r["method"], float(r["bpd"])) for _, r in prev.iterrows()}
        print(f"resuming: {len(done)} cells already in {ckpt}")

    data = get_dataset(dataset, data_dir=data_dir)
    for method in methods:
        for bpd in bpds:
            if (method, bpd) in done:
                print(f"skip {method} bpd={bpd} (checkpointed)")
                continue
            df = run_study_arrays(
                data.vectors, data.queries, [method], [bpd], ks=ks
            )
            df.insert(1, "dataset", dataset)
            header = not os.path.exists(ckpt)
            df.to_csv(ckpt, mode="a", header=header, index=False)
    print(f"done; results in {ckpt}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
