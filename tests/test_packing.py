import jax.numpy as jnp
import numpy as np

from vq_tpu.core.packing import (
    bytes_to_f32,
    f32_to_bytes,
    pack_bits,
    packed_bytes,
    unpack_bits,
)


def test_pack_unpack_roundtrip_various_bits():
    rng = np.random.default_rng(0)
    for bits in (1, 2, 3, 4, 5, 6, 7, 8):
        d = 37  # deliberately not byte-aligned
        idx = rng.integers(0, 1 << bits, (20, d))
        packed = pack_bits(jnp.asarray(idx), bits)
        assert packed.shape == (20, packed_bytes(d, bits))
        assert packed.dtype == jnp.uint8
        out = np.asarray(unpack_bits(packed, bits, d))
        np.testing.assert_array_equal(out, idx)


def test_pack_bits_matches_numpy_packbits():
    # MSB-first convention parity with the reference
    # (extended_rabitq.py:155-160 uses np.packbits)
    rng = np.random.default_rng(1)
    bits, d = 4, 16
    idx = rng.integers(0, 16, (5, d))
    positions = np.arange(bits - 1, -1, -1)
    b = ((idx[:, :, None] >> positions) & 1).astype(np.uint8).reshape(5, d * bits)
    expected = np.packbits(b, axis=1)
    np.testing.assert_array_equal(np.asarray(pack_bits(jnp.asarray(idx), bits)), expected)


def test_f32_byte_view_roundtrip():
    x = np.array([1.5, -2.25, 1e-20, 3e20], dtype=np.float32)
    b = f32_to_bytes(jnp.asarray(x))
    assert b.shape == (4, 4)
    np.testing.assert_array_equal(np.asarray(bytes_to_f32(b)), x)
    # raw bytes match numpy's view (little-endian parity with reference rows)
    np.testing.assert_array_equal(np.asarray(b), x.view(np.uint8).reshape(4, 4))
