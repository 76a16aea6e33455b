"""Round-2 parity closures: asymmetric pairwise distortion, fac_error,
derived SAQ codebooks, registry kwarg validation, codebook export tooling,
mocked HF loader streaming."""

import numpy as np
import jax.numpy as jnp
import pytest

from vq_tpu.bench.registry import build_quantizer
from vq_tpu.core.config import Metric, RankAwareConfig, SAQConfig


# ---------------------------------------------------------------------------
# asymmetric pairwise distortion
# ---------------------------------------------------------------------------


class _IdentityModel:
    def decompress(self, codes):
        return np.asarray(codes, dtype=np.float32)


def test_asymmetric_pairwise_identity_is_zero(rng):
    from vq_tpu.metrics import compute_asymmetric_pairwise_distortion

    x = rng.standard_normal((200, 16)).astype(np.float32)
    out = compute_asymmetric_pairwise_distortion(x, x, _IdentityModel(), 300)
    assert out["mean"] < 1e-6
    assert out["num_pairs"] > 0


def test_asymmetric_pairwise_detects_lossy(rng):
    from vq_tpu.metrics import (
        compute_asymmetric_pairwise_distortion,
        compute_pairwise_distortion,
    )

    x = rng.standard_normal((500, 32)).astype(np.float32)
    model = build_quantizer("sq", 32, bits=4)
    model.fit(x)
    codes = model.compress(x)
    asym = compute_asymmetric_pairwise_distortion(x, codes, model, 400)
    sym = compute_pairwise_distortion(x, model.decompress(codes), 400)
    assert 0 < asym["mean"] < 1.0
    # one exact side → asymmetric distortion should not exceed ~2x symmetric
    assert asym["mean"] < 2.0 * sym["mean"] + 0.05


# ---------------------------------------------------------------------------
# fac_error
# ---------------------------------------------------------------------------


def test_fac_error_nonnegative_and_shrinks_with_bits(rng):
    from vq_tpu.kernels.caq import caq_encode

    o = jnp.asarray(rng.standard_normal((64, 48)).astype(np.float32))
    e2 = np.asarray(caq_encode(o, 2).fac_error)
    e6 = np.asarray(caq_encode(o, 6).fac_error)
    assert np.all(e2 >= 0) and np.all(e6 >= 0)
    # more bits → better cosine → smaller error bound (on average)
    assert e6.mean() < e2.mean()


def test_fac_error_zero_for_exact_vectors():
    from vq_tpu.kernels.caq import caq_encode

    # a vector living exactly on the 1-bit grid {-0.5, +0.5} (v_mx folds)
    o = jnp.asarray(np.array([[1.0, -1.0, 1.0, -1.0]] * 4, dtype=np.float32))
    c = caq_encode(o, 1)
    assert np.allclose(np.asarray(c.fac_error), 0.0, atol=1e-4)


# ---------------------------------------------------------------------------
# CAQ with derived level codebooks
# ---------------------------------------------------------------------------


def test_caq_levels_roundtrip_and_rescale(rng):
    from vq_tpu.kernels.caq import caq_decode_levels, caq_encode_levels
    from vq_tpu.kernels.lloyd1d import lloyd_1d_columns

    o = rng.standard_normal((256, 24)).astype(np.float32) * np.linspace(
        0.2, 3.0, 24, dtype=np.float32
    )
    levels = lloyd_1d_columns(jnp.asarray(o), 8)  # (D, 8) 3-bit
    code = caq_encode_levels(jnp.asarray(o), levels, rounds=4)
    rec = np.asarray(caq_decode_levels(code.codes, code.rescale, levels))
    mse = np.mean((o - rec) ** 2)
    assert mse < np.var(o)  # strictly better than zero-bits
    assert np.asarray(code.codes).min() >= 0
    assert np.asarray(code.codes).max() < 8


def test_saq_derived_codebooks_improve_mse_on_nonuniform_data():
    # bimodal per-dim data → Lloyd levels (modes) beat the uniform mid-rise
    # grid robustly (heavy-tailed data is draw-dependent: per-vector v_mx
    # normalization adapts to tails, so the uniform grid sometimes wins).
    # Local rng: the session-scoped fixture's stream depends on execution
    # order and this comparison must be order-independent.
    rng = np.random.default_rng(7)
    m = 1.0 + rng.random(32).astype(np.float32) * 2
    signs = rng.choice([-1.0, 1.0], size=(1500, 32)).astype(np.float32)
    x = (signs * m + 0.05 * rng.standard_normal((1500, 32))).astype(np.float32)

    uni = build_quantizer("saq", 32, bpd=2.0, codebook="uniform", use_pca=False)
    llo = build_quantizer("saq", 32, bpd=2.0, codebook="lloyd", use_pca=False)
    uni.fit(x)
    llo.fit(x)
    mse_u = uni.reconstruction_mse(x, sample=400)
    mse_l = llo.reconstruction_mse(x, sample=400)
    assert mse_l < mse_u

    # fused scan agrees with a brute-force scan over reconstructions
    from vq_tpu.kernels.adc import exact_topk

    q = rng.standard_normal((8, 32)).astype(np.float32)
    codes = jnp.asarray(llo.compress(x[:512]))
    s, ids = llo.scan_topk(jnp.asarray(q), codes, 5, Metric.L2, use_bf16=False)
    rec = jnp.asarray(llo.decompress(np.asarray(codes)))
    s2, ids2 = exact_topk(jnp.asarray(q), rec, 5, Metric.L2)
    assert np.array_equal(np.asarray(ids), np.asarray(ids2))


def test_saq_save_load_with_levels(tmp_path, rng):
    x = rng.standard_normal((600, 16)).astype(np.float32)
    m = build_quantizer("saq", 16, bpd=2.0, codebook="lloyd")
    m.fit(x)
    codes = m.compress(x[:32])
    p = str(tmp_path / "saq_lloyd.pkl")
    m.save(p)
    from vq_tpu.methods.saq import SAQ

    m2 = SAQ(SAQConfig(codebook="lloyd")).load(p)
    assert np.allclose(m2.decompress(codes), m.decompress(codes))


# ---------------------------------------------------------------------------
# registry kwarg validation + wiring
# ---------------------------------------------------------------------------


def test_registry_rejects_unknown_kwargs():
    with pytest.raises(TypeError, match="unknown kwargs"):
        build_quantizer("pq", 32, M=4, nonsense=1)
    with pytest.raises(TypeError, match="unknown kwargs"):
        build_quantizer("rankaware", 32, bpd=2.0, codebok="exact")


def test_registry_passes_codebook_and_packing():
    m = build_quantizer("rankaware", 32, bpd=2.0, codebook="gaussian",
                        packing="ffd")
    assert m.cfg.codebook == "gaussian" and m.cfg.packing == "ffd"
    s = build_quantizer("saq", 32, bpd=2.0, codebook="lloyd")
    assert s.cfg.codebook == "lloyd"


def test_study_exact_variant_differs(rng):
    """perdim_mse_exact must actually differ from perdim_mse
    (VERDICT weak #4: they were silently identical in round 1)."""
    from vq_tpu.bench.study import STUDY_METHODS, _study_params

    base_l, p_l = _study_params("perdim_mse", 2.0, 24)
    base_e, p_e = _study_params("perdim_mse_exact", 2.0, 24)
    assert base_l == base_e == "rankaware"
    assert p_l["codebook"] == "lloyd" and p_e["codebook"] == "exact"
    assert p_l["packing"] == p_e["packing"] == "ffd"
    assert STUDY_METHODS["ours_exact"][1]["codebook"] == "exact"

    x = rng.standard_normal((800, 24)).astype(np.float32) ** 3
    m_l = build_quantizer(base_l, 24, **p_l).fit(x)
    m_e = build_quantizer(base_e, 24, **p_e).fit(x)
    cb_l = np.asarray(m_l.params.codebooks)
    cb_e = np.asarray(m_e.params.codebooks)
    assert not np.allclose(cb_l, cb_e)


# ---------------------------------------------------------------------------
# codebook export / query
# ---------------------------------------------------------------------------


def test_export_and_query_pq_codebook(tmp_path, rng):
    from vq_tpu.data.io import load_fvecs
    from vq_tpu.utils.export import export_codebook, query_codebook

    x = rng.standard_normal((600, 32)).astype(np.float32)
    m = build_quantizer("pq", 32, M=4, B=4).fit(x)
    codes = m.compress(x[:50])
    out = export_codebook(m, str(tmp_path), codes=codes)
    cb = load_fvecs(out["codebook_path"])
    assert cb.shape == (4 * 16, 8)  # (M·K, dsub)

    q = rng.standard_normal((5, 32)).astype(np.float32)
    d, i = query_codebook(q, model=m, codebook_vectors=cb, topk=2)
    assert d.shape == (5, 8) and i.shape == (5, 8)  # M chunks × topk
    # chunk m's ids must index into chunk m's rows
    for mm in range(4):
        ids = i[:, mm * 2 : (mm + 1) * 2]
        assert ids.min() >= mm * 16 and ids.max() < (mm + 1) * 16

    from vq_tpu.data.io import load_ivecs

    assert load_ivecs(out["codes_path"]).shape == (50, 4)


def test_export_sq_and_flat_query(tmp_path, rng):
    from vq_tpu.utils.export import export_codebook, query_codebook

    x = rng.standard_normal((300, 16)).astype(np.float32)
    m = build_quantizer("sq", 16, bits=8).fit(x)
    out = export_codebook(m, str(tmp_path))
    cb = out["codebook"]
    assert cb.shape == (2, 16)
    assert np.all(cb[1] >= cb[0])  # max row ≥ min row
    d, i = query_codebook(cb[0], codebook_vectors=cb, topk=1)
    assert i[0, 0] == 0  # min row is nearest to itself


def test_export_saq_raises(rng):
    from vq_tpu.utils.export import export_codebook

    x = rng.standard_normal((400, 16)).astype(np.float32)
    m = build_quantizer("saq", 16, bpd=2.0).fit(x)
    with pytest.raises(RuntimeError, match="static codebook"):
        export_codebook(m, "/tmp/nope")


# ---------------------------------------------------------------------------
# HF loaders with a mocked datasets module (VERDICT weak #8)
# ---------------------------------------------------------------------------


class _FakeDatasets:
    """Stands in for the `datasets` module: load_dataset returns an
    iterable of dicts shaped like the real streaming rows."""

    def __init__(self, rows):
        self._rows = rows
        self.calls = []

    def load_dataset(self, name, *args, **kw):
        self.calls.append((name, args, kw))
        return iter(self._rows)


def test_stream_to_array_fills_and_truncates():
    from vq_tpu.data.hf_loaders import _stream_to_array

    rows = [{"emb": [float(i)] * 4} for i in range(10)]
    out = _stream_to_array(iter(rows), "emb", 6, 4)
    assert out.shape == (6, 4) and out[5, 0] == 5.0
    short = _stream_to_array(iter(rows), "emb", 20, 4)
    assert short.shape == (10, 4)  # stream ended early → truncated


def test_cohere_stream_batches(monkeypatch, rng):
    import vq_tpu.data.hf_loaders as hf

    rows = [{"emb": rng.standard_normal(8).tolist()} for _ in range(25)]
    fake = _FakeDatasets(rows)
    monkeypatch.setattr(hf, "_require_datasets", lambda: fake)
    batches = list(hf.stream_cohere_msmarco_passages(batch_size=10))
    assert [b.shape for b in batches] == [(10, 8), (10, 8), (5, 8)]
    assert fake.calls[0][0].startswith("Cohere/")

    capped = list(hf.stream_cohere_msmarco_passages(batch_size=10, max_vectors=12))
    assert sum(len(b) for b in capped) == 12


def test_dbpedia_loader_mock(monkeypatch, rng):
    import vq_tpu.data.hf_loaders as hf

    rows = [{"openai": rng.standard_normal(16).tolist()} for _ in range(30)]
    fake = _FakeDatasets(rows)
    monkeypatch.setattr(hf, "_require_datasets", lambda: fake)
    ds = hf.load_dbpedia_openai(num_rows=20, dim=16, num_queries=5)
    assert ds.vectors.shape == (20, 16)
    assert ds.queries.shape == (5, 16)
