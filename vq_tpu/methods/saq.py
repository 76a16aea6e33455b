"""SAQ — variance-aware segmented CAQ quantization, TPU-native.

Re-design of the reference's native SAQ C++20 engine (SURVEY.md §2.2
N1-N9): the quantization plan (external/saq/include/saq/quantization_plan.h),
greedy/DP bit allocators (bit_allocator_greedy.cpp, quantization_plan.cpp:
144-255), per-segment rotators (rotator.h:20-88), CAQ encoder
(caq_encoder.h — see kernels/caq.py), and the K=1 fit/decompress path the
study pipeline uses (SaqEngineAdapter, benchmarks/quantizer_adapters.py:
62-135; ivf_index.cpp:196-374).

Pipeline:
  fit:    (optional) PCA → per-dim variance → empirical per-block MSE table
          (uniform-CAQ quantizer MSE on a sample, the analog of the engine's
          Lloyd MSE table, quantization_plan.cpp:21-51) → greedy or DP bit
          allocation over 64-dim blocks under budget D·bpd − segment factor
          overhead → merge equal-bit blocks into segments → per-segment
          seeded random rotations.
  encode: per segment: slice + rotate + batched-Jacobi CAQ encode + bit-pack;
          row layout [seg codes...][rescale f32 × S][o_l2norm f32 × S] —
          self-contained rows, 2 float factors per segment (the engine's
          64-bit factor overhead, quantization_plan.h:166).
  search: queries are PCA-projected and segment-rotated ONCE; each corpus
          tile needs only bit-unpack + dequant + per-segment MXU matmuls
          (no per-tile rotations) — the TPU analog of the engine's LUT scan.

Allocation cost is a tiny host-side scalar loop (SURVEY.md §7.3: scalar DPs
don't vectorize; everything per-vector runs on device).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import Metric, SAQConfig
from vq_tpu.core.packing import (
    bytes_to_f32,
    f32_to_bytes,
    pack_bits,
    packed_bytes,
    unpack_bits,
)
from vq_tpu.kernels.adc import _bf16_supported, _finalize, _streaming_topk
from vq_tpu.kernels.caq import (
    caq_decode,
    caq_decode_levels,
    caq_encode,
    caq_encode_levels,
)
from vq_tpu.kernels.lloyd1d import lloyd_1d_columns
from vq_tpu.kernels.pallas_packed import PackedCorpus
from vq_tpu.methods.base import BaseQuantizer


@dataclass(frozen=True)
class SAQPlan:
    """Static quantization plan (host-side; hashable for jit closures).

    Parity with the engine's SaqData plan container
    (quantization_plan.h:98-163): per-segment (start, length, bits) over the
    PCA-rotated, variance-descending dimension order.
    """

    dim: int
    seg_starts: Tuple[int, ...]
    seg_lens: Tuple[int, ...]
    seg_bits: Tuple[int, ...]

    @property
    def num_segments(self) -> int:
        return len(self.seg_starts)

    @property
    def code_bytes(self) -> int:
        return sum(
            packed_bytes(l, b) for l, b in zip(self.seg_lens, self.seg_bits)
        ) + 8 * self.num_segments


class SAQParams(NamedTuple):
    pca_mean: jax.Array  # (D,)
    pca_rot: jax.Array  # (D, D) orthogonal (identity when use_pca=False)
    seg_rots: Tuple[jax.Array, ...]  # per-segment (len, len) rotations
    # per-segment (len, 2^bits) sorted level tables when cfg.codebook is
    # "lloyd"/"exact" (engine derive_codebooks, ivf_index.cpp:55-117);
    # empty tuple for the uniform CAQ grid.
    seg_levels: Tuple[jax.Array, ...] = ()


# ---------------------------------------------------------------------------
# fit: PCA, MSE table, allocation
# ---------------------------------------------------------------------------


def _pca(x: jax.Array) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """mean, rotation (descending eigenvalue order), variances."""
    mean = jnp.mean(x, axis=0)
    xc = x - mean
    cov = jnp.dot(xc.T, xc, precision=jax.lax.Precision.HIGHEST) / x.shape[0]
    w, v = jnp.linalg.eigh(cov)  # ascending
    order = jnp.argsort(-w)
    return mean, v[:, order], w[order]


def _uniform_caq_mse_table(
    x_rot: jax.Array, max_bits: int, block_dims: int, seed: int = 0
) -> np.ndarray:
    """Empirical per-dim MSE at each bit width 0..max_bits under the CAQ
    encoder the segments actually use — the engine's
    build_mse_table_for_allocation (quantization_plan.cpp:21-51).

    Models the full encoder per allocation block: seeded random rotation of
    the block (segments are rotated before CAQ), per-vector per-block
    symmetric range v_mx, mid-rise codes, AND the per-vector rescale factor
    ‖o‖²/⟨o,ô⟩.  Without the rescale, 1-bit mid-rise is WORSE than zero
    bits on scale-spread data (levels ±v_mx/2 overshoot every small
    coordinate) and the marginal-gain greedy stops at 0 bits.
    → (D, max_bits+1); only block sums feed the allocators.
    """
    d = x_rot.shape[1]
    rng = np.random.default_rng(seed)
    nfull = d // block_dims
    rem = d % block_dims

    @functools.partial(jax.jit, static_argnames=("mb",))
    def blocks_table(xb, rots, mb):
        """(nb, n, L) × (nb, L, L) → (nb, L, mb+1) — all blocks, all bit
        widths, one compiled program (the eager per-block loop cost ~70 s in
        tunnel dispatches at D=384)."""

        def one(xo, r):
            o = jnp.dot(xo, r, precision=jax.lax.Precision.HIGHEST)
            v_mx = jnp.maximum(jnp.max(jnp.abs(o), axis=1, keepdims=True), 1e-20)
            ou = o / v_mx
            out = [jnp.mean(o * o, axis=0)]  # b=0 → MSE = E[x²]
            for b in range(1, mb + 1):
                delta = 2.0 / (1 << b)
                cmax = (1 << b) - 1
                codes = jnp.clip(jnp.floor((ou + 1.0) / delta), 0, cmax)
                oau = (codes + 0.5) * delta - 1.0
                ip = jnp.sum(ou * oau, axis=1)
                ousq = jnp.sum(ou * ou, axis=1)
                rescale = jnp.where(jnp.abs(ip) > 1e-20, ousq / ip, 0.0)
                oa = oau * rescale[:, None] * v_mx
                out.append(jnp.mean((o - oa) ** 2, axis=0))
            return jnp.stack(out, axis=1)

        return jax.vmap(one)(xb, rots)

    cols = []
    if nfull:
        rots = np.stack(
            [
                np.linalg.qr(rng.standard_normal((block_dims, block_dims)))[0]
                for _ in range(nfull)
            ]
        ).astype(np.float32)
        xb = (
            x_rot[:, : nfull * block_dims]
            .reshape(-1, nfull, block_dims)
            .transpose(1, 0, 2)
        )
        cols.append(
            np.asarray(blocks_table(xb, jnp.asarray(rots), max_bits)).reshape(
                nfull * block_dims, max_bits + 1
            )
        )
    if rem:
        r = np.linalg.qr(rng.standard_normal((rem, rem)))[0].astype(np.float32)
        xb = x_rot[:, nfull * block_dims :][None].transpose(0, 1, 2)
        cols.append(
            np.asarray(blocks_table(xb, jnp.asarray(r)[None], max_bits)).reshape(
                rem, max_bits + 1
            )
        )
    return np.concatenate(cols, axis=0)


def _allocate_greedy(
    block_mse: np.ndarray, block_lens: np.ndarray, budget_bits: int, max_bits: int
) -> np.ndarray:
    """Greedy marginal-gain allocation: repeatedly grant +1 bit/dim to the
    block with the best ΔMSE per bit (bit_allocator_greedy.cpp semantics).
    block_mse: (nblocks, max_bits+1) summed-over-dims MSE."""
    nb = len(block_lens)
    bits = np.zeros(nb, dtype=np.int64)
    spent = 0
    while True:
        gains = np.full(nb, -np.inf)
        for i in range(nb):
            b = bits[i]
            if b < max_bits and spent + block_lens[i] <= budget_bits:
                gains[i] = (block_mse[i, b] - block_mse[i, b + 1]) / block_lens[i]
        best = int(np.argmax(gains))
        if not np.isfinite(gains[best]) or gains[best] <= 0:
            break
        bits[best] += 1
        spent += int(block_lens[best])
    return bits


def _allocate_dp(
    block_mse: np.ndarray, block_lens: np.ndarray, budget_bits: int, max_bits: int
) -> np.ndarray:
    """Exact DP over (block, spent-bits) minimizing total MSE
    (quantization_plan.cpp:144-255 dynamic_programming, without the
    segment-overhead term which is charged up-front here)."""
    nb = len(block_lens)
    # quantize budget in units of the (uniform) block length when possible
    INF = np.inf
    dp = np.full(budget_bits + 1, INF)
    dp[0] = 0.0
    choice = np.zeros((nb, budget_bits + 1), dtype=np.int64)
    for i in range(nb):
        ndp = np.full(budget_bits + 1, INF)
        nch = np.zeros(budget_bits + 1, dtype=np.int64)
        for b in range(0, max_bits + 1):
            cost_bits = b * int(block_lens[i])
            if cost_bits > budget_bits:
                break
            mse = block_mse[i, b]
            prev = dp[: budget_bits + 1 - cost_bits]
            cand = prev + mse
            sl = np.s_[cost_bits : budget_bits + 1]
            upd = cand < ndp[sl]
            ndp[sl] = np.where(upd, cand, ndp[sl])
            nch[sl] = np.where(upd, b, nch[sl])
        dp = ndp
        choice[i] = nch
    # backtrack from the best total ≤ budget
    j = int(np.argmin(dp))
    bits = np.zeros(nb, dtype=np.int64)
    for i in range(nb - 1, -1, -1):
        b = int(choice[i, j])
        bits[i] = b
        j -= b * int(block_lens[i])
    return bits


def make_plan(
    variances: np.ndarray,
    mse_table: np.ndarray,
    cfg: SAQConfig,
) -> SAQPlan:
    """Build the segment plan from per-dim stats (host-side scalar work)."""
    d = len(variances)
    block = cfg.block_dims
    nb = (d + block - 1) // block
    block_lens = np.array(
        [min(block, d - i * block) for i in range(nb)], dtype=np.int64
    )
    block_mse = np.stack(
        [
            mse_table[i * block : i * block + block_lens[i]].sum(axis=0)
            for i in range(nb)
        ]
    )  # (nb, max_bits+1)

    total_budget = int(round(cfg.bits_per_dim * d))
    if cfg.allocator == "uniform":
        b = max(1, min(cfg.max_bits, int(round(cfg.bits_per_dim))))
        bits = np.full(nb, b, dtype=np.int64)
    elif cfg.allocator == "dp":
        from vq_tpu.native import allocate_dp_native

        bits = allocate_dp_native(block_mse, block_lens, total_budget, cfg.max_bits)
        if bits is None:
            bits = _allocate_dp(block_mse, block_lens, total_budget, cfg.max_bits)
    else:
        from vq_tpu.native import allocate_greedy_native

        bits = allocate_greedy_native(block_mse, block_lens, total_budget, cfg.max_bits)
        if bits is None:
            bits = _allocate_greedy(block_mse, block_lens, total_budget, cfg.max_bits)

    # merge adjacent equal-bit blocks into segments; drop 0-bit tails
    seg_starts: List[int] = []
    seg_lens: List[int] = []
    seg_bits: List[int] = []
    pos = 0
    for i in range(nb):
        ln, b = int(block_lens[i]), int(bits[i])
        if b > 0:
            if seg_bits and seg_bits[-1] == b and seg_starts[-1] + seg_lens[-1] == pos:
                seg_lens[-1] += ln
            else:
                seg_starts.append(pos)
                seg_lens.append(ln)
                seg_bits.append(b)
        pos += ln
    if not seg_starts:  # degenerate budget → at least one 1-bit segment
        seg_starts, seg_lens, seg_bits = [0], [min(block, d)], [1]
    return SAQPlan(
        dim=d,
        seg_starts=tuple(seg_starts),
        seg_lens=tuple(seg_lens),
        seg_bits=tuple(seg_bits),
    )


def fit(
    key: jax.Array, x, cfg: SAQConfig, sample_cap: int = 200_000
) -> Tuple[SAQPlan, SAQParams]:
    # host-side subsampling before device transfer (53M-safe): numpy/mmap
    # corpora never fully reach HBM (VERDICT weak #3)
    from vq_tpu.data.sampling import host_sample_rows

    xs = jnp.asarray(host_sample_rows(x, sample_cap, cfg.seed), jnp.float32)
    d = xs.shape[1]

    if cfg.use_pca:
        mean, rot, variances = _pca(xs)
    else:
        mean = jnp.zeros((d,), jnp.float32)
        rot = jnp.eye(d, dtype=jnp.float32)
        variances = jnp.var(xs, axis=0)

    x_rot = jnp.dot(xs - mean, rot, precision=jax.lax.Precision.HIGHEST)
    mse_table = _uniform_caq_mse_table(x_rot, cfg.max_bits, cfg.block_dims, cfg.seed)
    plan = make_plan(np.asarray(variances), mse_table, cfg)

    rng = np.random.default_rng(cfg.seed)
    seg_rots = tuple(
        jnp.asarray(np.linalg.qr(rng.standard_normal((l, l)))[0], dtype=jnp.float32)
        for l in plan.seg_lens
    )

    seg_levels: Tuple[jax.Array, ...] = ()
    if cfg.codebook != "uniform":
        # derive per-dim codebooks on the rotated sample (the engine's
        # derive_codebooks pass, ivf_index.cpp:55-117: allocation first,
        # then data-fit levels at the allocated widths)
        levels_list = []
        for s in range(plan.num_segments):
            st, ln, b = plan.seg_starts[s], plan.seg_lens[s], plan.seg_bits[s]
            o = jnp.dot(x_rot[:, st : st + ln], seg_rots[s],
                        precision=jax.lax.Precision.HIGHEST)
            if cfg.codebook == "exact":
                from vq_tpu.native import codebook_exact

                on = np.asarray(o)
                lv = np.stack([
                    codebook_exact(on[:, dd], 1 << b, sample_cap=16384,
                                   seed=cfg.seed)
                    for dd in range(ln)
                ])
                levels_list.append(jnp.asarray(lv, dtype=jnp.float32))
            else:  # lloyd
                levels_list.append(lloyd_1d_columns(o, 1 << b))
        seg_levels = tuple(levels_list)
    return plan, SAQParams(
        pca_mean=mean, pca_rot=rot, seg_rots=seg_rots, seg_levels=seg_levels
    )


# ---------------------------------------------------------------------------
# encode / decode
# ---------------------------------------------------------------------------


def _seg_dequant(plan: SAQPlan, params: SAQParams, s: int, idx: jax.Array,
                 rescale: jax.Array) -> jax.Array:
    """Dequantize one segment's code indices (uniform grid or derived
    levels) including the per-vector rescale factor."""
    if params.seg_levels:
        return caq_decode_levels(idx, rescale, params.seg_levels[s])
    return caq_decode(idx, rescale, plan.seg_bits[s])


def encode(plan: SAQPlan, params: SAQParams, x: jax.Array, caq_rounds: int = 6) -> jax.Array:
    x = jnp.asarray(x, dtype=jnp.float32)
    xp = jnp.dot(x - params.pca_mean, params.pca_rot,
                 precision=jax.lax.Precision.HIGHEST)
    packed_parts, rescales, norms = [], [], []
    for s in range(plan.num_segments):
        st, ln, b = plan.seg_starts[s], plan.seg_lens[s], plan.seg_bits[s]
        o = jnp.dot(xp[:, st : st + ln], params.seg_rots[s],
                    precision=jax.lax.Precision.HIGHEST)
        if params.seg_levels:
            caq = caq_encode_levels(o, params.seg_levels[s], rounds=caq_rounds)
        else:
            caq = caq_encode(o, b, rounds=caq_rounds)
        packed_parts.append(pack_bits(caq.codes, b))
        rescales.append(f32_to_bytes(caq.rescale))
        norms.append(f32_to_bytes(caq.o_l2norm))
    return jnp.concatenate(packed_parts + rescales + norms, axis=1)


def _split_row(plan: SAQPlan, codes: jax.Array):
    """Slice a code-row batch into per-segment (packed, rescale, norm)."""
    offs = []
    pos = 0
    for s in range(plan.num_segments):
        nb = packed_bytes(plan.seg_lens[s], plan.seg_bits[s])
        offs.append((pos, nb))
        pos += nb
    out = []
    fpos = pos
    for s, (p, nb) in enumerate(offs):
        packed = codes[:, p : p + nb]
        rescale = bytes_to_f32(codes[:, fpos + 4 * s : fpos + 4 * s + 4])
        npos = fpos + 4 * plan.num_segments
        norm = bytes_to_f32(codes[:, npos + 4 * s : npos + 4 * s + 4])
        out.append((packed, rescale, norm))
    return out


def decode(plan: SAQPlan, params: SAQParams, codes: jax.Array) -> jax.Array:
    n = codes.shape[0]
    parts = _split_row(plan, codes)
    xp = jnp.zeros((n, plan.dim), dtype=jnp.float32)
    for s, (packed, rescale, _norm) in enumerate(parts):
        st, ln, b = plan.seg_starts[s], plan.seg_lens[s], plan.seg_bits[s]
        idx = unpack_bits(packed, b, ln)
        o_hat = _seg_dequant(plan, params, s, idx, rescale)
        seg = jnp.dot(o_hat, params.seg_rots[s].T,
                      precision=jax.lax.Precision.HIGHEST)
        xp = xp.at[:, st : st + ln].set(seg)
    return (
        jnp.dot(xp, params.pca_rot.T, precision=jax.lax.Precision.HIGHEST)
        + params.pca_mean
    )


# ---------------------------------------------------------------------------
# packed-word scan layout (Pallas fast path, kernels/pallas_packed.py)
# ---------------------------------------------------------------------------


# Derived-codebook segments at B ≥ this width use the precomputed f32
# value-plane layout instead of the 2^B-select lookup (measured select-sum
# bound at B=8: 51.5 ms vs ~6 ms for B ≤ 4 — kernels/pallas_packed.py
# "values" docstring; reference covers all widths via code_helper.h tables).
_VALUES_MIN_BITS = 5


def packed_segspecs(plan: SAQPlan, params: SAQParams):
    """→ (segspecs tuple, per-SEGMENT level-table tuple) for
    kernels/pallas_packed.py.

    factors column s carries segment s's rescale (scale_col=s).  Derived
    codebooks ("lloyd"/"exact") emit per-dim level tables for B <
    _VALUES_MIN_BITS segments and switch to the f32 value-plane layout
    ("values", entry None) above; the uniform grid needs neither.  The
    level tuple aligns with SEGMENT ids (None = no in-kernel table) —
    callers filter Nones in segment order when passing lv_tables to the
    kernel."""
    from vq_tpu.kernels.pallas_packed import make_segspec

    segs = []
    lv_list = []
    for s in range(plan.num_segments):
        ln, b = plan.seg_lens[s], plan.seg_bits[s]
        if params.seg_levels and b >= _VALUES_MIN_BITS:
            segs.append(make_segspec(b, ln, "values", s))
            lv_list.append(None)
        elif params.seg_levels:
            segs.append(make_segspec(b, ln, "perdim", s))
            lv_list.append(params.seg_levels[s])  # (ln, 2^b)
        else:
            segs.append(make_segspec(b, ln, "uniform", s))
            lv_list.append(None)
    return tuple(segs), tuple(lv_list)


def _tile_stats(rhat_sq: jax.Array, me: jax.Array, n: int,
                norms: Optional[jax.Array] = None) -> jax.Array:
    """Per-512-row-tile (min ‖r̂‖, max ‖r̂‖, max error margin, min norm,
    max norm) — the variance-prune stage's block factors
    (kernels/pallas_packed.py module docstring; reference
    caq_estimator.h:95-115 varsEstDist reads the same per-block o_l2norm
    array).  Pad rows (id ≥ n) are excluded.  Columns 3-4 are the min/max
    ORIGINAL row norm per tile (the Metric.NIP score divisor, reference
    exact_search.py:4-8); with norms=None they are 1.0 — consistent with
    the scoring path's norm column default."""
    n_pad = rhat_sq.shape[0]
    valid = jnp.arange(n_pad) < n
    r = jnp.sqrt(jnp.maximum(rhat_sq, 0.0))
    min_r = jnp.where(valid, r, jnp.inf).reshape(-1, 512).min(axis=1)
    min_r = jnp.where(jnp.isfinite(min_r), min_r, 0.0)
    max_r = jnp.where(valid, r, 0.0).reshape(-1, 512).max(axis=1)
    max_me = jnp.where(valid, me, 0.0).reshape(-1, 512).max(axis=1)
    if norms is None:
        min_n = jnp.ones_like(min_r)
        max_n = jnp.ones_like(max_r)
    else:
        nn = norms.astype(jnp.float32)
        min_n = jnp.where(valid, nn, jnp.inf).reshape(-1, 512).min(axis=1)
        min_n = jnp.where(jnp.isfinite(min_n), min_n, 1.0)
        max_n = jnp.where(valid, nn, 0.0).reshape(-1, 512).max(axis=1)
        max_n = jnp.where(max_n > 0, max_n, 1.0)
    return jnp.stack([min_r, max_r, max_me, min_n, max_n],
                     axis=1).astype(jnp.float32)


def prune_hint_from_stats(stats) -> bool:
    """Can the variance-prune bound ever fire on this corpus?

    A tile is skippable only if its score bound differs from other tiles',
    i.e. the per-tile norm envelopes vary.  On iid corpora every tile spans
    the same [min, max] norm range and the stage scans 100% of tiles while
    paying its (measured ~3%, BENCH_NOTES.md) bookkeeping — so auto mode
    turns it off when the across-tile spread of max ‖r̂‖ is under 5% of its
    median (host-side, once per corpus build)."""
    mr = np.asarray(stats[:, 1])
    mr = mr[mr > 0]
    if mr.size < 2:
        return False
    med = float(np.median(mr))
    if med <= 0:
        return False
    return bool((mr.max() - mr.min()) / med > 0.05)


def _row_norm_key(plan: SAQPlan, codes: jax.Array,
                  row_chunk: int = 1 << 20) -> jax.Array:
    """Σ_s o_l2norm_s² per row, parsed from the byte rows' float columns
    only (no code unpacking) — the norm-ordering sort key."""
    nbytes = sum(
        packed_bytes(plan.seg_lens[s], plan.seg_bits[s])
        for s in range(plan.num_segments)
    )
    npos = nbytes + 4 * plan.num_segments

    @jax.jit
    def key_chunk(rows):
        acc = jnp.zeros((rows.shape[0],), jnp.float32)
        for s in range(plan.num_segments):
            nrm = bytes_to_f32(rows[:, npos + 4 * s : npos + 4 * s + 4])
            acc = acc + nrm * nrm
        return acc

    parts = [
        key_chunk(codes[i0 : i0 + row_chunk])
        for i0 in range(0, codes.shape[0], row_chunk)
    ]
    return jnp.concatenate(parts) if len(parts) > 1 else parts[0]


@functools.partial(jax.jit, static_argnames=("plan",))
def _convert_rows(plan: SAQPlan, params: SAQParams, rows: jax.Array):
    """One chunk of byte rows → (per-segment words/value-planes, factors,
    per-row ‖r̂‖², CAQ error margin).  Module-level jit (plan static,
    params an argument) so repeated prepare_packed calls — e.g. the 53M
    per-chunk streaming build — share ONE trace instead of re-jitting a
    fresh closure per call."""
    from vq_tpu.kernels.caq import _CONST_EPSILON
    from vq_tpu.kernels.pallas_packed import pack_words

    segspecs = packed_segspecs(plan, params)[0]
    # mean in code space, per segment (the L2 cross-term side of r2_s)
    mean_p = jnp.dot(params.pca_mean, params.pca_rot,
                     precision=jax.lax.Precision.HIGHEST)
    mean_segs = [
        jnp.dot(mean_p[plan.seg_starts[s] : plan.seg_starts[s]
                       + plan.seg_lens[s]], params.seg_rots[s],
                precision=jax.lax.Precision.HIGHEST)
        for s in range(plan.num_segments)
    ]
    parts = _split_row(plan, rows)
    words = []
    fac_cols = []
    r2_cols = []
    rhat_sq = jnp.zeros((rows.shape[0],), jnp.float32)
    me = jnp.zeros((rows.shape[0],), jnp.float32)
    for s, (packed, rescale, nrm) in enumerate(parts):
        ln = plan.seg_lens[s]
        idx = unpack_bits(packed, plan.seg_bits[s], ln)
        if segspecs[s].dequant == "values":
            # f32 value plane (unscaled — the kernel applies the rescale
            # column), the full-speed B ≥ 5 derived-codebook layout;
            # natural row order, no bitplane interleave
            words.append(
                caq_decode_levels(
                    idx, jnp.ones_like(rescale), params.seg_levels[s]
                ).astype(jnp.float32)
            )
        else:
            words.append(pack_words(idx, plan.seg_bits[s],
                                    segspecs[s].beff, tile=512))
        fac_cols.append(rescale[:, None])
        val = _seg_dequant(plan, params, s, idx, rescale)
        rsq_s = jnp.sum(val * val, axis=1)
        md_s = jnp.dot(val, mean_segs[s],
                       precision=jax.lax.Precision.HIGHEST)
        r2_cols.append((2.0 * md_s + rsq_s)[:, None])
        rhat_sq = rhat_sq + rsq_s
        osq_s = jnp.maximum(nrm * nrm, 1e-30)
        cos_term = jnp.maximum(rsq_s / osq_s - 1.0, 0.0)
        me = me + nrm * _CONST_EPSILON * jnp.sqrt(
            cos_term / max(ln - 1, 1)
        )
    fac = jnp.concatenate(fac_cols + r2_cols, axis=1)
    return tuple(words), fac, rhat_sq, me


def prepare_packed(
    plan: SAQPlan,
    params: SAQParams,
    codes: jax.Array,
    norms: Optional[jax.Array] = None,
    row_chunk: int = 131072,
    sort_rows: bool = False,
    num_valid_rows: Optional[int] = None,
) -> "PackedCorpus":
    """Byte rows → PackedCorpus (factors col s = segment s rescale; col
    S+s = segment s's precomputed L2 shift r2_s = 2·mean_s·r̂_s + ‖r̂_s‖²,
    summed in-kernel per scanned segment subset; col 2S = original row
    norm for Metric.NIP, 1.0 when absent), chunked so the (chunk, D, 8)
    unpack intermediates stay bounded at multi-million-row corpora.

    Also derives the variance-prune tile stats: per-row ‖r̂‖² (dequantized
    residual norm) and the CAQ error margin Σ_s fac_error_s/‖o_s‖.  The
    margin reconstructs fac_error (reference caq_encoder.h:26,228) from the
    STORED factors — ⟨o, r̂⟩ = ‖o‖² by the rescale construction, so
    cos² = ‖o‖²/‖r̂‖² and fac_error_s/‖o_s‖ = ‖o_s‖·ε·√((‖r̂_s‖²/‖o_s‖²−1)
    /(ln_s−1)) — no extra bytes in the row format.

    sort_rows=True NORM-ORDERS the corpus (rows sorted by the stored
    o_l2norm key) before packing so each 512-row tile spans a narrow norm
    band and the variance-prune bound can actually fire — the flat-scan
    analog of the reference's per-cluster norm locality.  Result ids are
    mapped back through `perm` by the scan wrappers; a sorted corpus cannot
    honor num_valid prefix masking (scan_topk raises) — EXCEPT under the
    num_valid_rows contract below.

    num_valid_rows=v declares rows ≥ v to be PAD rows (the sharded serving
    path hands each shard an equal-size block whose tail may be padding):
    they sort to the TAIL (+inf key), are excluded from the tile stats,
    and the caller masks them by passing num_valid == v at scan time —
    prefix masking stays valid on the sorted layout because the valid
    rows occupy exactly positions [0, v)."""
    from vq_tpu.kernels.pallas_packed import PackedCorpus

    n = codes.shape[0]
    nv = n if num_valid_rows is None else int(num_valid_rows)
    perm = None
    order = None
    if sort_rows and n > 512:
        key = _row_norm_key(plan, codes)
        if nv < n:  # pad rows sort to the tail
            key = jnp.where(jnp.arange(n) < nv, key, jnp.inf)
        order = jnp.argsort(key)
        if norms is not None:
            norms = jnp.take(norms, order)
        perm = order.astype(jnp.int32)
    s_count = plan.num_segments
    row_chunk = max(512, row_chunk - row_chunk % 512)  # keep chunks % u == 0
    pad = (-n) % 512
    if pad and order is None:
        # zero byte rows parse to idx 0 / rescale 0; `limit` masks them
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
    n_pad = n + pad

    def chunk_rows(i0):
        """Conversion-loop input chunk; when norm-ordering, gather the
        chunk's rows by `order` here instead of materializing the whole
        sorted byte array (a second full copy — 3 GB at 10M×bpd2, the
        difference between fitting in HBM and not)."""
        i1 = min(i0 + row_chunk, n_pad)
        if order is None:
            return codes[i0:i1]
        rows = jnp.take(codes, order[i0:min(i1, n)], axis=0)
        if i1 > n:  # boundary chunk: zero pad rows at the sorted tail
            rows = jnp.pad(rows, ((0, i1 - max(i0, n)), (0, 0)))
        return rows

    w_chunks, f_chunks, r_chunks, m_chunks = [], [], [], []
    for i0 in range(0, n_pad, row_chunk):  # row_chunk % 512 == 0
        w, f, r, m = _convert_rows(plan, params, chunk_rows(i0))
        w_chunks.append(w)
        f_chunks.append(f)
        r_chunks.append(r)
        m_chunks.append(m)

    def _cat(chunks):
        return jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]

    words = tuple(
        _cat([c[s] for c in w_chunks]) for s in range(s_count)
    )
    fac = _cat(f_chunks)
    nrm_col = (
        jnp.ones((n, 1), jnp.float32)
        if norms is None
        else norms.reshape(n, 1).astype(jnp.float32)
    )
    if pad:
        nrm_col = jnp.pad(nrm_col, ((0, pad), (0, 0)), constant_values=1.0)
    stats = _tile_stats(
        _cat(r_chunks), _cat(m_chunks), nv,
        norms=nrm_col[:, 0] if norms is not None else None,
    )
    fac = jnp.concatenate([fac, nrm_col], axis=1)
    return PackedCorpus(words=words, factors=fac, num_rows=n,
                        tile_stats=stats, has_norms=norms is not None,
                        perm=perm, prune_hint=prune_hint_from_stats(stats))


def _packed_query_side(plan, params, queries, seg_ids):
    """Rotate queries/mean into the kernel's concatenated code space.

    → (q_cat (Q, Σln), mean_cat (Σln,), q_mean (Q,), mean_sq scalar)
    restricted to `seg_ids` (stage-1 pruning uses a head-segment prefix).
    """
    qp = jnp.dot(queries, params.pca_rot, precision=jax.lax.Precision.HIGHEST)
    mean_p = jnp.dot(params.pca_mean, params.pca_rot,
                     precision=jax.lax.Precision.HIGHEST)
    q_parts, m_parts = [], []
    for s in seg_ids:
        st, ln = plan.seg_starts[s], plan.seg_lens[s]
        q_parts.append(jnp.dot(qp[:, st : st + ln], params.seg_rots[s],
                               precision=jax.lax.Precision.HIGHEST))
        m_parts.append(jnp.dot(mean_p[st : st + ln], params.seg_rots[s],
                               precision=jax.lax.Precision.HIGHEST))
    q_cat = jnp.concatenate(q_parts, axis=1)
    mean_cat = jnp.concatenate(m_parts)
    q_mean = jnp.dot(queries, params.pca_mean,
                     precision=jax.lax.Precision.HIGHEST)
    mean_sq = jnp.sum(params.pca_mean**2)
    return q_cat, mean_cat, q_mean, mean_sq


def _packed_scan(plan, params, queries, packed: PackedCorpus, k, metric,
                 seg_ids=None, num_valid=None, interpret=False,
                 use_bf16=True, prune=False, tile_mask=None, mask_cap=None):
    """Run the fused packed kernel over (a segment subset of) the corpus.

    Returns maximize-form (scores, ids) — callers finalize.  seg_ids selects
    a subset of segments (stage 1 uses the high-variance head); each segment
    carries its own words array, so any subset works.

    prune=True enables the in-kernel variance-prune stage (full segment set
    only — the tile stats bound the FULL reconstruction norm, so a
    head-subset scan would under-bound) and returns a third element, the
    number of tiles scanned.
    """
    from vq_tpu.kernels.pallas_packed import packed_scan_topk

    segs, lv_list = packed_segspecs(plan, params)
    if seg_ids is None:
        seg_ids = tuple(range(plan.num_segments))
    seg_sub = tuple(segs[s] for s in seg_ids)
    lv_sub = tuple(
        lv_list[s] for s in seg_ids if lv_list[s] is not None
    )
    words = tuple(packed.words[s] for s in seg_ids)
    q_cat, mean_cat, q_mean, mean_sq = _packed_query_side(
        plan, params, queries, seg_ids
    )
    if metric == Metric.L2:
        kind, qa = "l2", 2.0 * q_mean - mean_sq
    elif metric == Metric.IP:
        kind, qa = "ip", q_mean
    else:
        kind, qa = "nip", q_mean
    limit = packed.num_rows if num_valid is None else jnp.minimum(
        packed.num_rows, num_valid
    )
    qprune = None
    if prune:
        assert len(seg_ids) == plan.num_segments
        assert packed.tile_stats is not None
        if metric == Metric.L2:
            b = jnp.linalg.norm(q_cat - mean_cat[None, :], axis=1)
        else:  # IP and NIP share the numerator bound ‖q_cat‖·(rmax+me)
            b = jnp.linalg.norm(q_cat, axis=1)
        qprune = jnp.stack([qa, b], axis=1)
    s_cnt = plan.num_segments
    return packed_scan_topk(
        q_cat, qa, words, packed.factors, lv_sub, seg_sub, k,
        family="seg", metric_kind=kind, norm_col=2 * s_cnt,
        r2_cols=tuple(s_cnt + s for s in seg_ids),
        limit=limit, interpret=interpret, use_bf16=use_bf16,
        prune=prune, tile_stats=packed.tile_stats if prune else None,
        qprune=qprune, tile_mask=tile_mask, mask_cap=mask_cap,
    )


def _packed_available(plan, params, num_q, interpret=False):
    from vq_tpu.kernels.pallas_packed import packed_scan_available

    segs, lv_list = packed_segspecs(plan, params)
    d = sum(s.ln for s in segs)
    ok = packed_scan_available(
        segs, num_q, d, 2 * plan.num_segments + 1,
        [int(np.prod(t.shape)) for t in lv_list if t is not None],
    )
    return ok or (interpret and all(
        s.bits <= 8 or s.dequant in ("uniform", "values") for s in segs
    ))


# ---------------------------------------------------------------------------
# fused scan (queries rotated once; no per-tile rotations)
# ---------------------------------------------------------------------------


def scan_topk(
    plan: SAQPlan,
    params: SAQParams,
    queries: jax.Array,
    codes: jax.Array,
    k: int,
    metric: Metric,
    norms: Optional[jax.Array] = None,
    tile_rows: int = 16384,
    use_bf16: bool = True,
    num_valid: Optional[jax.Array] = None,
    approx: bool = False,
    prune_segments: int = 0,
    rerank_factor: int = 10,
    packed_cache: Optional[PackedCorpus] = None,
    use_packed: Optional[bool] = None,
    interpret: bool = False,
    prune_tiles: Optional[bool] = None,
):
    """Fused SAQ scan, optionally with the engine's pruning cascades.

    Two cascade strategies mirror the reference's 3-stage searcher
    (external/saq/include/saq/saq_searcher.h:83-155):

    * prune_tiles — the varsEstDist analog (stage 1): each 512-row tile's
      factor-derived score bound is checked against the running kth score
      INSIDE the packed kernel and losing tiles skip all unpack/dequant/
      matmul work (kernels/pallas_packed.py module docstring).  Exact
      w.r.t. the dense result; auto-enabled whenever the packed corpus
      carries tile stats and the metric supports it.

    * prune_segments > 0 — the fastscan-estimate analog (stage 2): score
      every row using only the first `prune_segments` PCA segments (the
      high-variance head), keep rerank_factor·k candidates, gather and
      rescore exactly with all segments.  Measured LOSING at every scale
      (v5e crossover grid, BENCH_NOTES.md: 5–7× slower than dense at
      N ∈ {1M, 4M, 10M}, all bpd — the stage-2 row gather is TPU's weak
      spot, the analog of the reference's gather-bound CPU finding,
      bench/ffd_speed.cpp:10-16 — and it OOMs beside a 10M resident
      corpus at bpd≥2).  Kept for capability parity; default off.
    """
    n = codes.shape[0]
    num_q = queries.shape[0]
    tile = min(tile_rows, max(8, n))
    use_bf16 = use_bf16 and _bf16_supported()
    dt = jnp.bfloat16 if use_bf16 else jnp.float32
    prec = jax.lax.Precision.DEFAULT if use_bf16 else jax.lax.Precision.HIGHEST

    queries = jnp.asarray(queries, dtype=jnp.float32)
    q_sq = jnp.sum(queries * queries, axis=-1)

    # Pallas packed-word fast path: in-kernel bit-unpack + dequant +
    # in-VMEM running top-k — the non-PQ analog of pq_scan_topk_fused.
    if use_packed is None:
        use_packed = (
            n >= 512 and k <= 128
            and _packed_available(plan, params, num_q, interpret=interpret)
        )
    if use_packed:
        if metric == Metric.NIP:
            # a cache built without real norms fills the norm column with
            # 1.0 and would silently return un-normalized scores
            if packed_cache is not None and not packed_cache.has_norms:
                raise ValueError(
                    "Metric.NIP needs a packed cache built with norms"
                )
            if packed_cache is None and norms is None:
                raise ValueError("Metric.NIP requires original row norms")
        packed = packed_cache if packed_cache is not None else prepare_packed(
            plan, params, codes, norms if metric == Metric.NIP else None
        )
        if packed.perm is not None and num_valid is not None:
            raise ValueError(
                "num_valid prefix masking is incompatible with a norm-"
                "ordered (sort_rows) packed cache"
            )
        want_prune = (
            0 < prune_segments < plan.num_segments
            and n > 2 * rerank_factor * k
            and rerank_factor * k <= 128
        )
        if not want_prune:
            from vq_tpu.kernels.pallas_packed import PRUNE_MAX_TILES

            prune = (
                prune_tiles
                if prune_tiles is not None
                else (packed.tile_stats is not None and packed.prune_hint)
            )
            # (5, nb) SMEM stats blow the ~1 MB scalar memory past ~26M
            # rows (measured at 53M) — the stage must stay off there
            prune = prune and (
                packed.factors.shape[0] // 512 <= PRUNE_MAX_TILES
            )
            if prune:
                outs, outi, _ = _packed_scan(
                    plan, params, queries, packed, k, metric,
                    num_valid=num_valid, interpret=interpret,
                    use_bf16=use_bf16, prune=True,
                )
            else:
                outs, outi = _packed_scan(
                    plan, params, queries, packed, k, metric,
                    num_valid=num_valid, interpret=interpret,
                    use_bf16=use_bf16,
                )
            if packed.perm is not None:
                outi = jnp.take(packed.perm, outi)
            return _finalize(outs, outi, metric, q_sq)
        # stage 1 in-kernel over the high-variance head segments
        k1 = min(n, rerank_factor * k)
        s1, cand = _packed_scan(
            plan, params, queries, packed, k1, metric,
            seg_ids=tuple(range(prune_segments)), num_valid=num_valid,
            interpret=interpret, use_bf16=use_bf16,
        )
        if packed.perm is not None:
            cand = jnp.take(packed.perm, cand)  # back to corpus row ids
        return _saq_rerank(
            plan, params, queries, codes, cand, jnp.isfinite(s1), k, metric,
            norms=norms, q_sq=q_sq,
        )
    qp = jnp.dot(queries - 0.0, params.pca_rot, precision=jax.lax.Precision.HIGHEST)
    # q·x̂ = q·mean + Σ_s (q R)_s · ô_s   with (qR)_s the segment-rotated query
    q_mean = jnp.dot(queries, params.pca_mean, precision=jax.lax.Precision.HIGHEST)
    mean_sq = jnp.sum(params.pca_mean**2)
    q_segs = []
    for s in range(plan.num_segments):
        st, ln = plan.seg_starts[s], plan.seg_lens[s]
        q_segs.append(
            jnp.dot(qp[:, st : st + ln], params.seg_rots[s],
                    precision=jax.lax.Precision.HIGHEST).astype(dt)
        )

    # mean in segment space, for the ‖x̂‖² cross term: x̂ = mean + r̂ with
    # r̂ = xp_hat @ rotᵀ, so mean·r̂ = (mean @ rot)_s · ô_s summed over segments
    mean_p = jnp.dot(params.pca_mean, params.pca_rot,
                     precision=jax.lax.Precision.HIGHEST)
    mean_segs = [
        jnp.dot(mean_p[plan.seg_starts[s] : plan.seg_starts[s] + plan.seg_lens[s]],
                params.seg_rots[s], precision=jax.lax.Precision.HIGHEST)
        for s in range(plan.num_segments)
    ]

    n_pad = (-n) % tile
    codes_p = jnp.pad(codes, ((0, n_pad), (0, 0)))
    norms_p = None
    if metric == Metric.NIP:
        if norms is None:
            raise ValueError("Metric.NIP requires original row norms")
        norms_p = jnp.pad(norms.astype(jnp.float32), (0, n_pad), constant_values=1.0)

    def make_score_tile(seg_ids):
        # one full-width matmul instead of one K=block_dims matmul per
        # segment: Σ_s (qR)_s·ô_s = concat(qR) · concat(ô) since segments
        # are disjoint — 64-wide K dims leave the MXU mostly idle
        q_cat = jnp.concatenate([q_segs[s] for s in seg_ids], axis=1)
        mean_cat = jnp.concatenate([mean_segs[s] for s in seg_ids])

        def score_tile(start):
            ct = jax.lax.dynamic_slice_in_dim(codes_p, start, tile, axis=0)
            parts = _split_row(plan, ct)
            o_parts = []
            for s in seg_ids:
                packed, rescale, _nrm = parts[s]
                ln, b = plan.seg_lens[s], plan.seg_bits[s]
                idx = unpack_bits(packed, b, ln)
                o_parts.append(_seg_dequant(plan, params, s, idx, rescale))
            o_cat = jnp.concatenate(o_parts, axis=1)  # (T, Σ len)
            ip_res = jnp.dot(
                q_cat, o_cat.astype(dt).T,
                preferred_element_type=jnp.float32, precision=prec,
            )
            if metric == Metric.L2:
                res_sq = jnp.sum(o_cat * o_cat, axis=1)  # ‖x̂−mean‖²
                md = jnp.dot(o_cat, mean_cat,
                             precision=jax.lax.Precision.HIGHEST)  # mean·r̂
            ip = ip_res + q_mean[:, None]
            if metric == Metric.L2:
                # maximize 2q·x̂ − ‖x̂‖² with
                # ‖x̂‖² = ‖mean‖² + 2·mean·r̂ + ‖r̂‖² (rotations orthogonal)
                s_val = 2.0 * ip - (mean_sq + 2.0 * md[None, :] + res_sq[None, :])
            elif metric == Metric.IP:
                s_val = ip
            else:
                nt = jax.lax.dynamic_slice_in_dim(norms_p, start, tile, axis=0)
                s_val = ip / jnp.maximum(nt, 1e-30)[None, :]
            col = start + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
            limit = n if num_valid is None else jnp.minimum(n, num_valid)
            return jnp.where(col < limit, s_val, -jnp.inf)

        return score_tile

    all_segs = tuple(range(plan.num_segments))
    if not (0 < prune_segments < plan.num_segments) or n <= 2 * rerank_factor * k:
        scores, idx = _streaming_topk(
            make_score_tile(all_segs), n, num_q, k, tile, approx=approx
        )
        return _finalize(scores, idx, metric, q_sq)

    # ---- stage 1: head-segments estimate over all rows -------------------
    k1 = min(n, rerank_factor * k)
    s1, cand = _streaming_topk(
        make_score_tile(all_segs[:prune_segments]), n, num_q, k1, tile,
        approx=True,
    )
    alive = jnp.isfinite(s1)  # pad/invalid rows carry -inf from stage 1
    return _saq_rerank(
        plan, params, queries, codes, cand, alive, k, metric,
        norms=norms, q_sq=q_sq,
    )


def _saq_rerank(plan, params, queries, codes, cand, alive, k, metric,
                norms=None, q_sq=None):
    """Stage 2/3 of the pruning cascade: gather candidate rows, rescore
    exactly with ALL segments (the TPU form of the reference's
    compAccurateDist rescore, caq_estimator.h:152-180), merge to top-k.

    cand (Q, k1) global row ids (< N); alive masks stage-1 −inf entries.
    """
    num_q, k1 = cand.shape
    q_cat, mean_cat, q_mean, mean_sq = _packed_query_side(
        plan, params, queries, tuple(range(plan.num_segments))
    )
    rows = codes[cand.reshape(-1)]  # (Q·k1, bytes)
    parts = _split_row(plan, rows)
    o_parts = []
    for s in range(plan.num_segments):
        packed, rescale, _nrm = parts[s]
        ln, b = plan.seg_lens[s], plan.seg_bits[s]
        idx = unpack_bits(packed, b, ln)
        o_parts.append(_seg_dequant(plan, params, s, idx, rescale))
    o_cat = jnp.concatenate(o_parts, axis=1).reshape(num_q, k1, -1)
    ip_res = jnp.einsum(
        "ql,qkl->qk", q_cat.astype(jnp.float32), o_cat,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == Metric.L2:
        res_sq = jnp.sum(o_cat * o_cat, axis=-1)
        md = jnp.einsum("qkl,l->qk", o_cat, mean_cat,
                        precision=jax.lax.Precision.HIGHEST)
    ip = ip_res + q_mean[:, None]
    if metric == Metric.L2:
        s_val = 2.0 * ip - (mean_sq + 2.0 * md + res_sq)
    elif metric == Metric.IP:
        s_val = ip
    else:
        if norms is None:
            raise ValueError("Metric.NIP requires original row norms")
        s_val = ip / jnp.maximum(norms[cand], 1e-30)
    s_val = jnp.where(alive, s_val, -jnp.inf)
    ts, ti = jax.lax.top_k(s_val, min(k, k1))
    ids = jnp.take_along_axis(cand, ti, axis=-1)
    return _finalize(ts, ids, metric, q_sq)


class SAQ(BaseQuantizer):
    name = "saq"

    def __init__(self, cfg: SAQConfig = SAQConfig()):
        super().__init__()
        self.cfg = cfg
        self.plan: Optional[SAQPlan] = None

    def fit(self, X: np.ndarray) -> "SAQ":
        self._dim = X.shape[1]
        self.plan, self.params = fit(
            jax.random.PRNGKey(self.cfg.seed), X, self.cfg
        )
        return self

    def compress(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(
            encode(self.plan, self.params, jnp.asarray(X), self.cfg.caq_rounds)
        )

    def decompress(self, codes: np.ndarray) -> np.ndarray:
        return np.asarray(decode(self.plan, self.params, jnp.asarray(codes)))

    def decode_fn(self):
        plan, params = self.plan, self.params
        return lambda ct: decode(plan, params, ct)

    def encode_fn(self):
        plan, params, rounds = self.plan, self.params, self.cfg.caq_rounds
        return lambda x: encode(plan, params, x, rounds)

    def scan_topk(self, queries, codes, k, metric, norms=None, tile_rows=16384,
                  use_bf16=True, approx=False, prune_segments=0,
                  rerank_factor=10, cache=None, num_valid=None,
                  prune_tiles=None):
        return scan_topk(
            self.plan, self.params, queries, codes, k, metric,
            norms=norms, tile_rows=tile_rows, use_bf16=use_bf16, approx=approx,
            prune_segments=prune_segments, rerank_factor=rerank_factor,
            packed_cache=cache, num_valid=num_valid, prune_tiles=prune_tiles,
        )

    def prepare_scan(self, codes, norms=None, num_queries=8):
        """Build the PackedCorpus scan cache (FlatQuantizedIndex calls this
        once at fit; scan_topk(cache=...) then skips per-call repacking).
        num_queries is the expected query-batch size the availability gate
        models (VMEM scales with it; a cache built for small batches is dead
        weight if searches arrive much larger — see base.prepare_scan).
        The cache is norm-ordered (sort_rows) so the variance-prune stage
        can fire; indexes that need num_valid masking must build their own
        unsorted cache via prepare_packed."""
        if not _packed_available(self.plan, self.params, num_queries):
            return None
        return prepare_packed(self.plan, self.params, jnp.asarray(codes),
                              norms=norms, sort_rows=True)

    def prepare_shard_cache(self, codes, norms=None, num_queries=8,
                            num_valid_rows=None):
        """Per-shard packed cache for dist/sharded_packed.py: NORM-ORDERED
        locally (each shard sorts its own rows, which is what makes the
        variance-prune stage compose with sharding — VERDICT r3 weak #3)
        with pad rows sorted to the tail so the scan-time num_valid prefix
        limit stays exact."""
        interp = jax.default_backend() != "tpu"
        if not _packed_available(self.plan, self.params, num_queries,
                                 interpret=interp):
            return None
        return prepare_packed(self.plan, self.params, jnp.asarray(codes),
                              norms=norms, sort_rows=True,
                              num_valid_rows=num_valid_rows)

    def prepare_tile_cache(self, codes, norms=None, num_queries=8):
        """Order-preserving packed cache for tile-masked scans (base
        contract): rows keep the caller's (cluster-sorted) order so tiles
        map to contiguous cluster ranges; no norm-ordering, no perm."""
        interp = jax.default_backend() != "tpu"
        if not _packed_available(self.plan, self.params, num_queries,
                                 interpret=interp):
            return None
        return prepare_packed(self.plan, self.params, jnp.asarray(codes),
                              norms=norms, sort_rows=False)

    def packed_scan_raw(self, queries, packed, k, metric, num_valid=None,
                        use_bf16=True, interpret=False, tile_mask=None,
                        mask_cap=None):
        from vq_tpu.kernels.pallas_packed import PRUNE_MAX_TILES

        prune = (packed.tile_stats is not None and packed.prune_hint
                 and packed.factors.shape[0] // 512 <= PRUNE_MAX_TILES)
        out = _packed_scan(
            self.plan, self.params, queries, packed, k, metric,
            num_valid=num_valid, interpret=interpret, use_bf16=use_bf16,
            prune=prune, tile_mask=tile_mask, mask_cap=mask_cap,
        )
        return out[0], out[1]

    def residual_scorer(self):
        """Code-space window scorer for IVF list scans (base contract):
        v·decode(ct) = q_map(v)_cat·ô + v·pca_mean, ‖decode(ct)‖² =
        ‖mean‖² + 2·mean_cat·ô + ‖ô‖² (orthogonal rotations) — windows
        need only the per-segment dequant, not the seg/PCA un-rotations
        decode_fn pays per window."""
        plan, params = self.plan, self.params
        seg_ids = tuple(range(plan.num_segments))
        mean_p = jnp.dot(params.pca_mean, params.pca_rot,
                         precision=jax.lax.Precision.HIGHEST)
        mean_cat = jnp.concatenate([
            jnp.dot(mean_p[plan.seg_starts[s] : plan.seg_starts[s]
                           + plan.seg_lens[s]], params.seg_rots[s],
                    precision=jax.lax.Precision.HIGHEST)
            for s in seg_ids
        ])
        mean_sq = jnp.sum(params.pca_mean ** 2)

        def q_map(v):
            q_cat, _mc, q_mean, _ms = _packed_query_side(
                plan, params, jnp.asarray(v, jnp.float32), seg_ids
            )
            return q_cat, q_mean

        def window(ct):
            parts = _split_row(plan, ct)
            o_parts = []
            for s, (packed_b, rescale, _nrm) in enumerate(parts):
                idx = unpack_bits(packed_b, plan.seg_bits[s],
                                  plan.seg_lens[s])
                o_parts.append(_seg_dequant(plan, params, s, idx, rescale))
            o = (jnp.concatenate(o_parts, axis=1) if len(o_parts) > 1
                 else o_parts[0])
            r2 = mean_sq + 2.0 * jnp.dot(
                o, mean_cat, precision=jax.lax.Precision.HIGHEST
            ) + jnp.sum(o * o, axis=1)
            return o, r2

        return q_map, window

    def code_bytes_per_vector(self) -> float:
        return float(self.plan.code_bytes)

    def config_dict(self):
        return {
            "bpd": self.cfg.bits_per_dim,
            "allocator": self.cfg.allocator,
            "use_pca": self.cfg.use_pca,
            "codebook": self.cfg.codebook,
            "segments": [
                {"start": s, "len": l, "bits": b}
                for s, l, b in zip(
                    self.plan.seg_starts, self.plan.seg_lens, self.plan.seg_bits
                )
            ]
            if self.plan
            else None,
        }

    def save(self, path: str) -> None:
        import pickle, os

        host = jax.tree_util.tree_map(np.asarray, self.params)
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        with open(path, "wb") as f:
            pickle.dump(
                {"name": self.name, "dim": self._dim, "plan": self.plan,
                 "params": host, "config": self.config_dict()},
                f,
            )

    def load(self, path: str) -> "SAQ":
        import pickle

        with open(path, "rb") as f:
            payload = pickle.load(f)
        self._dim = payload["dim"]
        self.plan = payload["plan"]
        self.params = jax.tree_util.tree_map(jnp.asarray, payload["params"])
        return self
