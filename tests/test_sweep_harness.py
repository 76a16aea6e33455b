import json
import os

import numpy as np
import pytest

from vq_tpu.bench.registry import ALL_METHODS, bpd_to_pq_m, build_quantizer, largest_divisor_leq
from vq_tpu.bench.sweep import generate_configs, run_single_config, sweep
from vq_tpu.data.datasets import load_dummy_dataset
from vq_tpu.utils.run_logger import load_runs, log_run


def test_largest_divisor():
    assert largest_divisor_leq(1536, 16) == 16
    assert largest_divisor_leq(30, 7) == 6
    assert largest_divisor_leq(7, 3) == 1


def test_bpd_to_pq_m():
    # 1 bpd at D=1536, B=8 → M=192
    assert bpd_to_pq_m(1.0, 1536, 8) == 192
    assert bpd_to_pq_m(0.5, 64, 8) == 4


def test_generate_configs_grid():
    cfgs = generate_configs("pq", {"M": [4, 8], "B": [4, 8]})
    assert len(cfgs) == 4
    assert {"M": 4, "B": 8} in cfgs


def test_registry_dispatch_pq_sq():
    q = build_quantizer("pq", 64, M=8, B=8)
    assert q.name == "pq"
    q = build_quantizer("sq", 64, bits=8)
    assert q.name == "sq"
    with pytest.raises(ValueError):
        build_quantizer("nope", 64)


def test_run_single_config_and_sqlite_logging(tmp_path):
    db = str(tmp_path / "runs.db")
    data = load_dummy_dataset(num_vectors=1000, dim=32, num_queries=20, seed=0)
    m = run_single_config(
        data, "pq", {"M": 4, "B": 6, "kmeans_iters": 6},
        k=10, num_queries=20, db_path=db, sweep_id="sweep_test_1",
    )
    for key in (
        "recall@10", "mse", "distortion", "pairwise_distortion",
        "rank_distortion", "compression_ratio", "qps", "fit_time_s",
    ):
        assert key in m, key
    assert 0.0 <= m["recall@10"] <= 1.0
    assert abs(m["rank_distortion"] - (1 - m["recall@10"])) < 1e-9
    assert m["compression_ratio"] == 32.0  # 32*4 / 4 bytes

    runs = load_runs(db_path=db, sweep_id="sweep_test_1")
    assert len(runs) == 1
    assert runs[0]["method"] == "pq"
    assert runs[0]["config"] == {"M": 4, "B": 6, "kmeans_iters": 6}
    assert abs(runs[0]["metrics"]["recall@10"] - m["recall@10"]) < 1e-12


def test_sweep_multiple_methods(tmp_path):
    db = str(tmp_path / "runs.db")
    data = load_dummy_dataset(num_vectors=600, dim=16, num_queries=10, seed=1)
    results = sweep(
        methods=["pq", "sq"],
        grid={"pq": {"M": [4], "B": [4]}, "sq": {"bits": [8]}},
        k=5, num_queries=10, db_path=db, data=data, verbose=False,
    )
    assert len(results) == 2
    assert len(load_runs(db_path=db)) == 2


def test_sqlite_schema_matches_reference(tmp_path):
    # the reference's plot suite reads these exact columns
    # (reference utils/run_logger.py:71-99, visualization/plot.py:122-157)
    import sqlite3

    db = str(tmp_path / "runs.db")
    log_run("pq", "dummy", {"recall@10": 0.5}, {"M": 8}, "sweepX", db_path=db)
    conn = sqlite3.connect(db)
    cols = {r[1] for r in conn.execute("PRAGMA table_info(runs)")}
    conn.close()
    assert {
        "id", "timestamp", "git_branch", "git_commit", "package_version",
        "method", "dataset", "cli_command", "metrics_json", "config_json",
        "sweep_id",
    } <= cols


def test_cli_run_command(tmp_path, capsys):
    from vq_tpu.cli import main

    db = str(tmp_path / "runs.db")
    rc = main([
        "run", "--dataset", "dummy-600x16", "--method", "pq",
        "--param", "M=4", "--param", "B=4", "--param", "kmeans_iters=5",
        "--num-queries", "10", "--db-path", db, "--no-bf16",
    ])
    assert rc == 0
    out = capsys.readouterr().out
    metrics = json.loads(out)
    assert "recall@10" in metrics
    assert len(load_runs(db_path=db)) == 1
