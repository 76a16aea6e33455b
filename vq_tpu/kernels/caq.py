"""CAQ encoder — batched, TPU-native.

Re-design of the SAQ engine's CAQEncoder
(external/saq/include/saq/caq_encoder.h:58-220):

  * per-vector symmetric range v_mx = max|o_i|, mid-rise uniform code
    ô_j = (c_j + 0.5)·δ − v_mx with δ = 2·v_mx / 2^b  (caq_encoder.h:170-205)
  * code adjustment maximizing cos(o, ô) by ±1 coordinate steps
    (caq_encoder.h:67-140) — the reference is sequential Gauss-Seidel per
    vector; here it is a BATCHED JACOBI sweep (SURVEY.md §7.3): each round
    evaluates the ±1 improvement test for all N vectors × all D coordinates
    at once on the VPU, applies only individually-improving moves, then
    recomputes the global ⟨o,ô⟩ / ‖ô‖² exactly (the reference does the same
    per-round correction, caq_encoder.h:123-138).  The GPU build of the
    reference ships the same parallel variant behind `caq_sequential=false`
    (gpu_encoder.cuh:27).
  * factors: o_l2norm and fac_rescale = ‖o‖²/⟨o,ô⟩ (caq_encoder.h:220-232);
    v_mx is normalized to 1 by folding it into the rescale factor
    (the engine's rescale_vmx_to1), so δ is the static 2/2^b and only TWO
    floats per (vector, segment) are stored — the reference's 64-bit
    per-segment factor overhead (quantization_plan.h:166).
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class CAQCode(NamedTuple):
    codes: jax.Array  # (N, D) int32 in [0, 2^b)
    rescale: jax.Array  # (N,) — multiply dequantized unit-grid ô to estimate o
    o_l2norm: jax.Array  # (N,) — ‖o‖ (error-bound factor, kept for parity)


def _dequant_unit(codes: jax.Array, bits: int) -> jax.Array:
    """Mid-rise dequantization on the v_mx=1 grid: (c + .5)·δ − 1, δ=2/2^b."""
    delta = 2.0 / (1 << bits)
    return (codes.astype(jnp.float32) + 0.5) * delta - 1.0


def _adjust_round(o, codes, bits, ip, l2):
    """One Jacobi adjustment round.  o: (N, D) normalized by v_mx."""
    delta = 2.0 / (1 << bits)
    cmax = (1 << bits) - 1
    oa = _dequant_unit(codes, bits)  # (N, D)
    l2_wo = l2[:, None] - oa * oa  # ‖ô‖² without coord j

    def gain(step):
        new_oa = oa + step * delta
        new_ip = ip[:, None] + step * delta * o
        new_l2 = l2_wo + new_oa * new_oa
        # improvement test: new_ip²/new_l2 > ip²/l2  (cosine², caq_encoder.h:90)
        return new_ip * new_ip * l2[:, None] - ip[:, None] * ip[:, None] * new_l2, new_ip, new_l2

    g_up, _, _ = gain(1.0)
    g_dn, _, _ = gain(-1.0)
    can_up = (codes < cmax) & (g_up > 0)
    can_dn = (codes > 0) & (g_dn > 0)
    step = jnp.where(can_up & (g_up >= g_dn), 1, jnp.where(can_dn, -1, 0))
    new_codes = jnp.clip(codes + step, 0, cmax)
    # exact recompute of global factors (the reference's per-round correction)
    oa = _dequant_unit(new_codes, bits)
    new_ip = jnp.sum(o * oa, axis=1)
    new_l2 = jnp.sum(oa * oa, axis=1)
    # a Jacobi round with interacting moves can overshoot: keep it only if
    # the true cosine improved, else keep previous codes
    better = new_ip * new_ip * l2 > ip * ip * new_l2
    codes = jnp.where(better[:, None], new_codes, codes)
    ip = jnp.where(better, new_ip, ip)
    l2 = jnp.where(better, new_l2, l2)
    return codes, ip, l2


@functools.partial(jax.jit, static_argnames=("bits", "rounds"))
def caq_encode(o: jax.Array, bits: int, rounds: int = 6) -> CAQCode:
    """Encode (N, D) vectors at `bits` per dim with CAQ code adjustment.

    Returns codes plus the two per-vector factors.  Reconstruction:
    ô = rescale · ((codes + .5)·2/2^b − 1).
    """
    o = jnp.asarray(o, dtype=jnp.float32)
    n, d = o.shape
    v_mx = jnp.max(jnp.abs(o), axis=1)  # (N,)
    v_safe = jnp.maximum(v_mx, 1e-20)
    ou = o / v_safe[:, None]  # normalized to [-1, 1]

    delta = 2.0 / (1 << bits)
    cmax = (1 << bits) - 1
    codes = jnp.clip(jnp.floor((ou + 1.0) / delta), 0, cmax).astype(jnp.int32)

    oa = _dequant_unit(codes, bits)
    ip = jnp.sum(ou * oa, axis=1)
    l2 = jnp.sum(oa * oa, axis=1)

    def body(_, carry):
        return _adjust_round(ou, carry[0], bits, carry[1], carry[2])

    codes, ip, l2 = jax.lax.fori_loop(0, rounds, body, (codes, ip, l2))

    o_l2sqr = jnp.sum(ou * ou, axis=1)
    # fac_rescale = ‖o‖²/⟨o,ô⟩ on the unit grid; multiply back v_mx to undo
    # the normalization (rescale_vmx_to1)
    rescale_unit = jnp.where(ip != 0, o_l2sqr / ip, 0.0)
    rescale = rescale_unit * v_safe
    o_l2norm = jnp.linalg.norm(o, axis=1)
    return CAQCode(codes=codes, rescale=rescale, o_l2norm=o_l2norm)


def caq_decode(codes: jax.Array, rescale: jax.Array, bits: int) -> jax.Array:
    """(N, D) codes + (N,) rescale → (N, D) reconstruction of o."""
    return _dequant_unit(codes, bits) * rescale[:, None]


def caq_cosine(o: jax.Array, codes: jax.Array, bits: int) -> jax.Array:
    """cos(o, ô) per vector — the quantity code adjustment maximizes."""
    oa = _dequant_unit(codes, bits)
    ip = jnp.sum(o * oa, axis=1)
    return ip / jnp.maximum(
        jnp.linalg.norm(o, axis=1) * jnp.linalg.norm(oa, axis=1), 1e-20
    )
