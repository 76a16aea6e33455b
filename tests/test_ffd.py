import jax.numpy as jnp
import numpy as np

from vq_tpu.core.ffd import (
    dense_decode_codes,
    dense_encode,
    ffd_decode_codes,
    ffd_encode,
    ffd_layout,
)


def test_ffd_layout_invariants():
    # reference test_ffd_packing.py invariants: every field fits one byte,
    # no overlap, byte count within bounds
    rng = np.random.default_rng(0)
    for _ in range(20):
        bits = rng.integers(0, 9, 32)
        lay = ffd_layout(bits)
        used = {}
        for d in range(32):
            if bits[d] == 0:
                assert lay.byte_idx[d] == -1
                continue
            assert 0 <= lay.shift[d] <= 8 - bits[d]
            span = set(range(lay.shift[d], lay.shift[d] + bits[d]))
            key = int(lay.byte_idx[d])
            assert not (used.get(key, set()) & span), "overlapping fields"
            used.setdefault(key, set()).update(span)
        total = int(bits.sum())
        assert lay.n_bytes >= (total + 7) // 8
        assert lay.n_bytes <= max(1, total)  # trivial upper bound


def test_ffd_4fix_optimality_case():
    # 4+3+1 and 5+3 style combinations must pack tightly: widths [5,4,4,3,3,1]
    # = 20 bits → optimal 3 bytes (5+3, 4+4, 3+1)
    lay = ffd_layout(np.array([5, 4, 4, 3, 3, 1]))
    assert lay.n_bytes == 3


def test_ffd_encode_decode_roundtrip():
    rng = np.random.default_rng(1)
    bits = np.array([5, 0, 3, 8, 4, 4, 2, 1, 7, 3])
    lay = ffd_layout(bits)
    codes = np.stack(
        [rng.integers(0, 1 << max(b, 1), 50) if b else np.zeros(50, int) for b in bits],
        axis=1,
    )
    packed = ffd_encode(jnp.asarray(codes), lay)
    assert packed.shape == (50, lay.n_bytes)
    out = np.asarray(ffd_decode_codes(packed, lay))
    np.testing.assert_array_equal(out, codes)


def test_dense_encode_decode_roundtrip():
    rng = np.random.default_rng(2)
    bits = np.array([3, 7, 0, 1, 8, 2, 5])
    codes = np.stack(
        [rng.integers(0, 1 << max(b, 1), 40) if b else np.zeros(40, int) for b in bits],
        axis=1,
    )
    packed = dense_encode(jnp.asarray(codes), bits)
    assert packed.shape == (40, (int(bits.sum()) + 7) // 8)
    out = np.asarray(dense_decode_codes(packed, bits))
    np.testing.assert_array_equal(out, codes)
