"""Pallas TPU kernel: fused scan over bit-packed per-dim codes (non-PQ).

Generalizes the PQ one-hot kernel (pallas_scan.py) to the segmented scalar
quantizers — SAQ, RankAware, RaBitQ/Extended-RaBitQ — whose codes are
B-bit per-dimension indices plus per-row float factors.  This is the TPU
analog of the reference's packed fastscan over short/long codes
(external/saq/include/saq/fast_scan.h:73-110, code_helper.h): where the CPU
unpacks AVX-512 lanes with bit-width-specialized shuffles, the TPU unpacks
32-bit words with VPU shift/mask ops and feeds the dequantized tile straight
into the resident-query MXU matmul, folding the tile into the same running
in-VMEM top-k as the PQ kernel — the (Q, N) score matrix never exists.

Word layout ("row-interleaved bitplane words", built by pack_words): a
segment's (N, ln) B-bit indices become (N/u, ln) int32 words with
u = 32 // b_eff (b_eff = B rounded up to a power of two); word row r lane d
packs rows {r·u + j : j < u} at shift b_eff·j.  Lanes stay the full segment
width (native (8,128) tiling — a column-interleaved layout instead pads
every (T, W) slice to 128 lanes and blows scoped VMEM ~u×), and the
in-kernel unpack is u shift+mask ops whose sublane re-stack restores natural
row order:

    idx = stack_j((words >> (b_eff·j)) & (2^B−1), axis=1).reshape(T, ln)

Dequantization kinds per segment:
  "uniform" — mid-rise grid (c+.5)·δ−1 (kernels/caq.py _dequant_unit)
  "perdim"  — per-dim sorted level tables (SAQ derived codebooks, RankAware)
  "shared"  — one level table for all dims (RaBitQ Gaussian codebook)
Per-row factors (rescale, norms, RaBitQ t) ride in a (N, F) f32 side array.

Score assembly families:
  "seg"    — SAQ/RankAware: x̂ = mean + Rᵀô per segment; maximize-form
             L2 = 2(ip+q·mean) − (‖mean‖² + 2 mean·r̂ + ‖r̂‖²)
  "rabitq" — unbiased estimator: α = ‖r‖√D/(t‖ŝ‖²), q·x̂ = α(qP)·ŝ + q·c
Both emit the same maximize-form contract as kernels/adc.py, so _finalize
and recall paths are shared.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vq_tpu.kernels.pallas_scan import _KPAD, fold_running_topk


def _b_eff(bits: int) -> int:
    """Storage width: bits rounded up to a power of two ≤ 16."""
    for p in (1, 2, 4, 8, 16):
        if bits <= p:
            return p
    raise ValueError(f"bits={bits} too large")


def choose_beff(bits: int, ln: int, tile: int = 512) -> int:
    """Storage width for a segment, avoiding a measured Mosaic DMA
    miscompile: gridded (tile/u, ln) int32 blocks with 16 sublanes AND
    ln < 128 lanes fetch the wrong block for grid steps > 0 on v5e
    (every other (rows, lanes) combination probed exact — see
    tests/test_pallas_packed.py and BENCH_NOTES).  Widening 1-bit storage
    to 2 bits keeps ≥32 sublanes per block for skinny segments; full-lane
    segments (ln % 128 == 0) keep the dense width."""
    beff = _b_eff(bits)
    while ln % 128 != 0 and tile // (32 // beff) < 32 and beff < 16:
        beff *= 2
    return beff


def make_segspec(bits: int, ln: int, dequant: str, scale_col: int,
                 tile: int = 512) -> "SegSpec":
    return SegSpec(bits, choose_beff(bits, ln, tile), ln, dequant, scale_col)


class SegSpec(NamedTuple):
    """Static per-segment layout (hashable, closed over by the kernel).

    bits      true code width B
    beff      storage width (power of two); u = 32 // beff rows per word
    ln        segment length in dims (= lane width of its words array)
    dequant   "uniform" | "perdim" | "shared"
    scale_col column of the factors array holding the per-row scale
              multiplier (−1 = no scale)
    """

    bits: int
    beff: int
    ln: int
    dequant: str
    scale_col: int

    @property
    def u(self) -> int:
        return 32 // self.beff


class PackedCorpus(NamedTuple):
    """Scan-optimized corpus layout: row-interleaved words + factors.

    The TPU analog of the reference's ClusterPacker fastscan layout
    (external/saq/include/saq/cluster_packer.h:21-80): the stored row format
    stays the reference-compatible byte rows; this derived layout is built
    once per index (FlatQuantizedIndex caches it via prepare_scan) so the
    hot scan never re-parses byte rows.  Rows are padded to a 512 multiple;
    `num_rows` masks the tail.  words[s] has shape (N_pad/u_s, ln_s).
    """

    words: Tuple[jax.Array, ...]
    factors: jax.Array  # (N_pad512, F) f32
    num_rows: int


@functools.partial(jax.jit, static_argnames=("bits", "beff"))
def pack_words(idx: jax.Array, bits: int, beff: Optional[int] = None) -> jax.Array:
    """(N, ln) indices in [0, 2^bits) → (N/u, ln) int32 row-interleaved
    words (N must be a multiple of u = 32 // beff; callers pad rows).
    `beff` must match the SegSpec's (choose_beff); defaults to the dense
    power-of-two width."""
    n, ln = idx.shape
    if beff is None:
        beff = _b_eff(bits)
    u = 32 // beff
    assert n % u == 0, (n, u)
    r = n // u
    acc = jnp.zeros((r, ln), dtype=jnp.uint32)
    idx = idx.astype(jnp.uint32).reshape(r, u, ln)
    for j in range(u):
        acc = acc | (idx[:, j, :] << (beff * j))
    return acc.astype(jnp.int32)


def _unpack_words(words: jax.Array, seg: SegSpec) -> jax.Array:
    """(T/u, ln) int32 → (T, ln) int32 indices in natural row order."""
    u = seg.u
    mask = (1 << seg.bits) - 1
    uw = words.astype(jnp.uint32)
    chunks = [
        ((uw >> (seg.beff * j)) & jnp.uint32(mask)).astype(jnp.int32)
        for j in range(u)
    ]
    if u == 1:
        return chunks[0]
    r = words.shape[0]
    return jnp.stack(chunks, axis=1).reshape(r * u, seg.ln)


def _dequant_seg(idx: jax.Array, seg: SegSpec, lv_ref, fac, f32) -> jax.Array:
    """(T, ln) indices → (T, ln) values, per-row scale applied."""
    if seg.dequant == "uniform":
        delta = 2.0 / (1 << seg.bits)
        val = (idx.astype(f32) + f32(0.5)) * f32(delta) - f32(1.0)
    elif seg.dequant == "shared":
        # select-sum against the (1, L) table: L scalar broadcasts on the VPU
        val = jnp.zeros(idx.shape, dtype=f32)
        for l in range(1 << seg.bits):
            val = val + jnp.where(idx == l, lv_ref[0, l], f32(0.0))
    else:  # perdim: (ln, L) table, one (ln,) row vector per level
        val = jnp.zeros(idx.shape, dtype=f32)
        for l in range(1 << seg.bits):
            lv_col = lv_ref[:, l]  # (ln,)
            val = val + jnp.where(idx == l, lv_col[None, :], f32(0.0))
    if seg.scale_col >= 0:
        val = val * fac[:, seg.scale_col][:, None]
    return val


def _packed_kernel(
    limit_ref, q_ref, qa_ref, mean_ref, fac_ref, *rest,
    segs: Tuple[SegSpec, ...], n_lv: int, k: int, nb: int, tile: int,
    family: str, metric_kind: str, norm_col: int, nrm_col: int, t_col: int,
    sqrt_d: float, use_bf16: bool,
):
    """One grid step: unpack+dequant `tile` rows, score, fold running top-k.

    limit_ref (1,) i32 SMEM — rows with global id ≥ limit score −inf
    q_ref   (Q, D)          — pre-rotated queries (resident)
    qa_ref  (Q, 1) f32      — per-query additive term (see callers)
    mean_ref (1, D) f32     — mean/centroid in code space (L2 cross term)
    fac_ref (tile, F) f32   — per-row factors
    rest = per-segment words refs ((tile/u_s, ln_s) i32), then n_lv level
           tables, then outs/outi (HBM), then run_s/run_i (Q, _KPAD) VMEM
    """
    word_refs = rest[: len(segs)]
    lv_refs = rest[len(segs) : len(segs) + n_lv]
    outs_ref, outi_ref, run_s_ref, run_i_ref = rest[len(segs) + n_lv :]
    f32 = jnp.float32
    step = pl.program_id(0)
    num_q = q_ref.shape[0]

    @pl.when(step == 0)
    def _init():
        run_s_ref[:] = jnp.full((num_q, _KPAD), -jnp.inf, dtype=f32)
        run_i_ref[:] = jnp.zeros((num_q, _KPAD), dtype=jnp.int32)

    fac = fac_ref[:]
    parts = []
    li = 0
    for s, seg in enumerate(segs):
        idx = _unpack_words(word_refs[s][:], seg)
        lv = None
        if seg.dequant != "uniform":
            lv = lv_refs[li]
            li += 1
        parts.append(_dequant_seg(idx, seg, lv, fac, f32))
    ohat = jnp.concatenate(parts, axis=1) if len(parts) > 1 else parts[0]
    if use_bf16:
        ip = jnp.dot(q_ref[:], ohat.astype(jnp.bfloat16).T,
                     preferred_element_type=f32)  # (Q, T)
    else:
        # TPU f32 dots silently degrade to bf16 without HIGHEST (CLAUDE.md);
        # Mosaic lowers this to the multi-pass f32 MXU emulation
        ip = jax.lax.dot_general(
            q_ref[:], ohat, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=f32,
        )
    qa = qa_ref[:]  # (Q, 1)

    if family == "rabitq":
        snorm = jnp.sum(ohat * ohat, axis=1)  # ‖ŝ‖² (T,)
        nrm = fac[:, nrm_col]
        tt = fac[:, t_col]
        alpha = nrm * f32(sqrt_d) / jnp.maximum(tt * snorm, f32(1e-12))
        if metric_kind == "l2":
            # centroid cross term as broadcast-mul + row reduce (Mosaic has
            # no general mat-vec contraction; this is the native VPU form)
            cdot = jnp.sum(ohat * mean_ref[:], axis=1)
            s = (2.0 * alpha)[None, :] * ip + qa - (
                2.0 * alpha * cdot + nrm * nrm
            )[None, :]
        elif metric_kind == "ip":
            s = alpha[None, :] * ip + qa
        else:  # nip
            s = (alpha[None, :] * ip + qa) / jnp.maximum(
                fac[:, norm_col], f32(1e-30)
            )[None, :]
    else:  # "seg"
        if metric_kind == "l2":
            res_sq = jnp.sum(ohat * ohat, axis=1)  # ‖r̂‖² (T,)
            md = jnp.sum(ohat * mean_ref[:], axis=1)  # mean·r̂ (T,)
            s = 2.0 * ip + qa - (2.0 * md + res_sq)[None, :]
        elif metric_kind == "ip":
            s = ip + qa
        else:  # nip
            s = (ip + qa) / jnp.maximum(fac[:, norm_col], f32(1e-30))[None, :]

    start = step * tile
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (num_q, tile), 1) + start
    s = jnp.where(col_ids < limit_ref[0], s, -jnp.inf)
    fold_running_topk(run_s_ref, run_i_ref, s, col_ids, k)

    @pl.when(step == nb - 1)
    def _emit():
        outs_ref[:] = run_s_ref[:]
        outi_ref[:] = run_i_ref[:]


@functools.partial(
    jax.jit,
    static_argnames=(
        "segs", "k", "tile", "family", "metric_kind", "norm_col", "nrm_col",
        "t_col", "sqrt_d", "interpret", "use_bf16",
    ),
)
def packed_scan_topk(
    q_cat: jax.Array,
    qa: jax.Array,
    mean_cat: jax.Array,
    words: Tuple[jax.Array, ...],
    factors: jax.Array,
    lv_tables: Tuple[jax.Array, ...],
    segs: Tuple[SegSpec, ...],
    k: int,
    tile: int = 512,
    family: str = "seg",
    metric_kind: str = "l2",
    norm_col: int = -1,
    nrm_col: int = 0,
    t_col: int = 1,
    sqrt_d: float = 1.0,
    limit: Optional[jax.Array] = None,
    interpret: bool = False,
    use_bf16: bool = True,
):
    """Fused unpack+dequant+score+top-k → ((Q, k) maximize-form, (Q, k) i32).

    q_cat   (Q, D) queries pre-rotated into code space (D = Σ ln_s)
    qa      (Q,) per-query additive term (mean/centroid ip, const folded)
    mean_cat(D,) mean/centroid in code space (zeros unless L2)
    words   per-segment (N/u_s, ln_s) int32 — N % tile == 0 (pad rows
            masked via `limit`)
    factors (N, F) f32 per-row factors
    lv_tables — one per non-uniform segment, in segment order:
              (ln_s, 2^B) for "perdim", (1, 2^B) for "shared"
    """
    num_q, d = q_cat.shape
    n = factors.shape[0]
    assert n % tile == 0 and 0 < k <= min(_KPAD, tile), (n, tile, k)
    for w, seg in zip(words, segs):
        assert w.shape == (n // seg.u, seg.ln), (w.shape, seg)
        # guard the measured Mosaic mis-DMA geometry (see choose_beff)
        assert interpret or tile // seg.u >= 32 or seg.ln % 128 == 0, seg
    nf = factors.shape[1]
    n_lv = len(lv_tables)
    nb = n // tile
    f32 = jnp.float32
    mm_dt = jnp.bfloat16 if use_bf16 else f32

    lim = jnp.full((1,), n if limit is None else limit, dtype=jnp.int32)
    kernel = functools.partial(
        _packed_kernel, segs=segs, n_lv=n_lv, k=k, nb=nb, tile=tile,
        family=family, metric_kind=metric_kind, norm_col=norm_col,
        nrm_col=nrm_col, t_col=t_col, sqrt_d=float(sqrt_d),
        use_bf16=use_bf16,
    )

    def _wspec(seg):
        r = tile // seg.u
        return pl.BlockSpec((r, seg.ln), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    word_specs = [_wspec(seg) for seg in segs]
    lv_specs = [
        pl.BlockSpec(t.shape, lambda i: (0, 0), memory_space=pltpu.VMEM)
        for t in lv_tables
    ]
    outs, outi = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((num_q, _KPAD), f32),
            jax.ShapeDtypeStruct((num_q, _KPAD), jnp.int32),
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((num_q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_q, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, nf), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ]
        + word_specs
        + lv_specs,
        out_specs=(
            pl.BlockSpec((num_q, _KPAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_q, _KPAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((num_q, _KPAD), f32),
            pltpu.VMEM((num_q, _KPAD), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )(
        lim,
        q_cat.astype(mm_dt),
        qa.reshape(num_q, 1).astype(f32),
        mean_cat.reshape(1, d).astype(f32),
        factors.astype(f32),
        *words,
        *[t.astype(f32) for t in lv_tables],
    )
    return outs[:, :k], outi[:, :k]


def packed_scan_available(
    segs: Sequence[SegSpec], num_q: int, d: int, nf: int,
    lv_sizes: Sequence[int], tile: int = 512, max_bits: int = 6,
) -> bool:
    """Gate: TPU backend, select-sum-friendly bit widths, VMEM budget.

    Level lookups unroll 2^B VPU select ops per non-uniform segment, so
    B > max_bits (64 levels) routes back to the XLA scan.  The VMEM model
    counts resident queries, the per-tile words/factors/dequant values, the
    (Q, tile) score tile and the top-k working set, against the raised
    100 MB scoped-vmem limit (with double-buffering headroom)."""
    if jax.default_backend() != "tpu":
        return False
    for seg in segs:
        if seg.dequant != "uniform" and seg.bits > max_bits:
            return False
    lane_pad_d = sum(-(-seg.ln // 128) * 128 for seg in segs)
    vmem = (
        num_q * max(d, 128) * 2  # resident queries bf16
        + num_q * (1 + _KPAD * 4) * 4  # qa + running top-k + out blocks
        + tile * lane_pad_d * 4  # words tiles (2 buffers ≈ idx plane)
        + tile * nf * 4  # factors tile
        + tile * lane_pad_d * 4 * 2  # idx + dequant values f32
        + num_q * tile * 4  # score tile
        + num_q * (tile + _KPAD) * 8  # fold candidate set
        + sum(lv_sizes) * 4  # level tables
    )
    return vmem < 60 * 1024 * 1024
