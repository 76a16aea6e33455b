import numpy as np

from vq_tpu.data.io import load_fvecs, load_ivecs, write_fvecs, write_ivecs


def test_fvecs_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((20, 13)).astype(np.float32)
    p = str(tmp_path / "x.fvecs")
    write_fvecs(p, x)
    np.testing.assert_array_equal(load_fvecs(p), x)


def test_ivecs_roundtrip(tmp_path):
    x = np.arange(60, dtype=np.int32).reshape(6, 10)
    p = str(tmp_path / "x.ivecs")
    write_ivecs(p, x)
    np.testing.assert_array_equal(load_ivecs(p), x)


def test_fvecs_format_matches_reference_layout(tmp_path):
    # row = int32 dim header + dim float32 payload (faiss_export.py:46-69)
    x = np.array([[1.5, -2.0, 3.0]], dtype=np.float32)
    p = str(tmp_path / "one.fvecs")
    write_fvecs(p, x)
    raw = np.fromfile(p, dtype=np.int32)
    assert raw[0] == 3
    np.testing.assert_array_equal(
        np.fromfile(p, dtype=np.float32)[1:], x[0]
    )
