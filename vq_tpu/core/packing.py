"""Bit-packing of per-dimension quantization indices, jax-native.

Row layout parity with the reference's self-contained code rows
(methods/extended_rabitq.py:150-170, lvq_quantization.py:87-102): B-bit
indices MSB-first packed into uint8 bytes, optionally followed by float32
side-channel fields viewed as 4 raw bytes each.  All ops are pure jnp
(shift/mask + small matmuls) so pack/unpack fuse into encode/scan kernels.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def packed_bytes(d: int, bits: int) -> int:
    """ceil(D*B/8) — code bytes for D dims at B bits."""
    return (d * bits + 7) // 8


def pack_bits(idx: jax.Array, bits: int) -> jax.Array:
    """(N, D) integer indices in [0, 2^bits) → (N, ceil(D*bits/8)) uint8.

    MSB-first within each index and within each byte (numpy packbits
    convention, matching the reference layout).
    """
    n, d = idx.shape
    positions = jnp.arange(bits - 1, -1, -1, dtype=jnp.int32)  # MSB..LSB
    b = (idx.astype(jnp.int32)[:, :, None] >> positions[None, None, :]) & 1
    b = b.reshape(n, d * bits)
    pad = (-b.shape[1]) % 8
    if pad:
        b = jnp.pad(b, ((0, 0), (0, pad)))
    b = b.reshape(n, -1, 8)
    weights = (1 << jnp.arange(7, -1, -1, dtype=jnp.int32))  # MSB-first bytes
    return jnp.sum(b * weights[None, None, :], axis=-1).astype(jnp.uint8)


def unpack_bits(packed: jax.Array, bits: int, d: int) -> jax.Array:
    """(N, nbytes) uint8 → (N, D) int32 indices (inverse of pack_bits)."""
    n = packed.shape[0]
    positions = jnp.arange(7, -1, -1, dtype=jnp.int32)
    b = (packed.astype(jnp.int32)[:, :, None] >> positions[None, None, :]) & 1
    b = b.reshape(n, -1)[:, : d * bits].reshape(n, d, bits)
    weights = (1 << jnp.arange(bits - 1, -1, -1, dtype=jnp.int32))
    return jnp.sum(b * weights[None, None, :], axis=-1)


def f32_to_bytes(x: jax.Array) -> jax.Array:
    """(N,) float32 → (N, 4) uint8 raw little-endian view."""
    return jax.lax.bitcast_convert_type(x.astype(jnp.float32), jnp.uint8)


def bytes_to_f32(b: jax.Array) -> jax.Array:
    """(N, 4) uint8 → (N,) float32 (inverse of f32_to_bytes)."""
    return jax.lax.bitcast_convert_type(b, jnp.float32).reshape(b.shape[:-1])
