import os

import numpy as np

from vq_tpu.bench.study import (
    STUDY_METHODS,
    StudyConfig,
    load_study_config,
    pareto_curves,
    run_study,
    run_study_arrays,
)
from vq_tpu.data.io import write_fvecs


def _data(rng, n=1200, d=48):
    sigma = np.linspace(2.0, 0.1, d)
    x = (rng.standard_normal((n, d)) * sigma).astype(np.float32)
    q = (x[rng.integers(0, n, 25)] +
         0.1 * sigma * rng.standard_normal((25, d))).astype(np.float32)
    return x, q


def test_run_study_arrays_schema_and_ranges():
    # reference tests/test_quantizer_study.py:7-28 pattern
    rng = np.random.default_rng(0)
    x, q = _data(rng)
    df = run_study_arrays(
        x, q, methods=["pq", "ours"], bpds=[2.0, 4.0], ks=(1, 10),
        verbose=False,
    )
    assert len(df) == 4
    for col in ("timestamp", "method", "bpd", "mse", "compression",
                "recall@1", "recall@10"):
        assert col in df.columns, col
    assert df["recall@10"].between(0, 1).all()
    assert (df["mse"] > 0).all()
    assert (df["compression"] > 1).all()
    # more bits → better recall, lower mse, lower compression (per method)
    for m, g in df.groupby("method"):
        g = g.sort_values("bpd")
        assert g["mse"].iloc[0] >= g["mse"].iloc[1]
        assert g["compression"].iloc[0] >= g["compression"].iloc[1]


def test_saq_study_beats_pq_on_decaying_spectrum():
    rng = np.random.default_rng(1)
    x, q = _data(rng, n=2500)
    df = run_study_arrays(
        x, q, methods=["pq", "ours"], bpds=[2.0], ks=(10,), verbose=False
    )
    r = {m: g["recall@10"].iloc[0] for m, g in df.groupby("method")}
    assert r["ours"] > r["pq"] - 0.02, r  # SAQ ≥ PQ on adaptive-friendly data


def test_study_yaml_and_csv_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    x, q = _data(rng, n=600)
    base = str(tmp_path / "base.fvecs")
    queries = str(tmp_path / "query.fvecs")
    write_fvecs(base, x)
    write_fvecs(queries, q)
    yaml_path = str(tmp_path / "study.yaml")
    with open(yaml_path, "w") as f:
        f.write(
            f"base_path: {base}\nquery_path: {queries}\n"
            "methods: [pq, sq]\nbpd: [4.0]\nks: [1, 10]\n"
            f"output_dir: {tmp_path}/out\nplot: true\n"
        )
    cfg = load_study_config(yaml_path)
    assert cfg.methods == ["pq", "sq"]
    out_csv = run_study(cfg)
    assert os.path.exists(out_csv)
    # ISO-8601 timestamped filename (reference test_results_timestamping.py)
    assert os.path.basename(out_csv).startswith("results_")
    import pandas as pd

    df = pd.read_csv(out_csv)
    assert len(df) == 2
    assert os.path.exists(os.path.join(f"{tmp_path}/out", "pareto.png"))


def test_pareto_curves_output(tmp_path):
    import pandas as pd

    df = pd.DataFrame(
        {
            "method": ["pq", "pq", "ours", "ours"],
            "bpd": [1, 4, 1, 4],
            "compression": [32, 8, 30, 7.5],
            "mse": [1e-3, 1e-5, 8e-4, 9e-6],
            "recall@10": [0.8, 0.96, 0.85, 0.97],
        }
    )
    p = pareto_curves(df, str(tmp_path / "pareto.png"), ks=(10,))
    assert os.path.getsize(p) > 0


def test_study_method_aliases_all_resolve():
    from vq_tpu.bench.registry import build_quantizer
    from vq_tpu.bench.study import _study_params

    for alias in STUDY_METHODS:
        base, params = _study_params(alias, 2.0, 48)
        q = build_quantizer(base, 48, **dict(params))
        assert q is not None, alias
