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

Word layout ("tile-ordered bitplane words", built by pack_words(tile=512)):
a segment's (N, ln) B-bit indices become (N/u, ln) int32 words with
u = 32 // b_eff (b_eff = B rounded up to a power of two); within each
512-row tile, word r shift-slot j packs tile-local row j·(512/u) + r.
Lanes stay the full segment width (native (8,128) tiling — a
column-interleaved layout instead pads every (T, W) slice to 128 lanes and
blows scoped VMEM ~u×), and the in-kernel unpack is u shift+mask ops whose
shift-planes are already contiguous natural-order row blocks:

    idx = concat_j((words >> (b_eff·j)) & (2^B−1), axis=0)   # (T, ln)

(The earlier row-interleaved layout — word r holds rows {r·u + j} — needed
a stack(axis=1).reshape to restore row order, a cross-sublane interleave
Mosaic executes as u full-plane shuffles; at u=16 that relayout dominated
the kernel.  Packing is where the order is chosen, so the fix is free.)

Dequantization kinds per segment:
  "uniform" — mid-rise grid (c+.5)·δ−1 (kernels/caq.py _dequant_unit)
  "perdim"  — per-dim sorted level tables (SAQ derived codebooks, RankAware)
  "shared"  — one level table for all dims (RaBitQ Gaussian codebook)
  "values"  — precomputed f32 VALUE PLANE: the builder dequantizes (without
              the per-row scale) at pack time and the segment's "words"
              array is the (N, ln) f32 values themselves.  This is the
              full-speed path for B ≥ 5 derived-codebook segments
              (VERDICT r3 missing #4): the "perdim"/"shared" lookup unrolls
              2^B VPU selects per tile — measured select-sum-bound at B=8
              (51.5 ms vs ~6 ms for B ≤ 4, BENCH_NOTES) — while the value
              plane is a straight VMEM load feeding the MXU, trading 32
              bits/dim of scan-cache HBM (the stored BYTE ROWS stay at B
              bits/dim; only the derived PackedCorpus grows).  The
              reference covers high widths with bit-width-specialized CPU
              function tables (external/saq/include/saq/code_helper.h);
              on TPU the equivalent "specialization" is removing the
              lookup from the hot loop entirely.  Exact: the plane holds
              the same f32 level values the select-sum would produce, and
              the per-row scale is applied identically in-kernel.
Per-row factors (rescale, norms, RaBitQ t) ride in a (N, F) f32 side array.

Score assembly (unified; see _packed_kernel): every family's maximize-form
score is an affine map of the tile matmul,  s = (2·)ip + qa − shift, with
the row-side constants PRECOMPUTED into factor columns at pack time:
  "seg"    — SAQ/RankAware: x̂ = mean + Rᵀô per segment; maximize-form
             L2 = 2(ip+q·mean) − (‖mean‖² + 2 mean·r̂ + ‖r̂‖²); the per-
             segment r2_s = 2·mean_s·r̂_s + ‖r̂_s‖² are factor columns
             (r2_cols), summed in-kernel so segment-subset scans work
  "rabitq" — unbiased estimator: α = ‖r‖√D/(t‖ŝ‖²), q·x̂ = α(qP)·ŝ + q·c;
             α is folded into the dequant scale (scale_col) so the MXU
             emits α·⟨q,ŝ⟩ directly, and c2 = 2α·(ŝ·c_rot) + ‖r‖² is the
             precomputed L2 shift column
Both emit the same maximize-form contract as kernels/adc.py, so _finalize
and recall paths are shared.  (Scaling the matmul OUTPUT by a factor-
derived (1, T) row instead measured 6× slower on v5e — see
_packed_kernel.)

Variance-prune stage (prune=True): the TPU analog of the reference
searcher's stage-1 `varsEstDist` block skip (external/saq/include/saq/
saq_searcher.h:83-104, caq_estimator.h:95-115), which bounds each 32-row
block's distance from the stored o_l2norm factor alone and skips blocks
that cannot beat the running kth distance.  Here the block is a 512-row
grid tile: `tile_stats[t] = (min ‖r̂‖, max ‖r̂‖, max CAQ-error-margin)`
over the tile's rows — derived at pack time from the stored per-row
factors (caq_encoder.h:26 fac_error ≡ ‖o‖·ε·√((‖r̂‖²/‖o‖²−1)/(D−1)),
reconstructed from rescale/o_l2norm, see methods/saq.prepare_packed) —
and the per-query prune row is `qprune[q] = (A_q, B_q)` with A the
additive term and B = ‖q̃‖.  Cauchy-Schwarz gives a true upper bound on
every maximize-form score in the tile; for the seg family the L2 bound
is the tight interval form (dist ≥ qdrop² + min_{r∈[rmin,rmax]} (B−r)²,
with A = q² − qdrop² − B²):

    L2 seg:    s ≤ A + B² − (B − clamp(B, rmin, rmax))² + 2·B·margin
    L2 rabitq: s ≤ A − rmin² + 2·B·(rmax + margin)
    IP:        s ≤ A + B·(rmax + margin)
    NIP:       s ≤ max(U/nmin, U/nmax) with U the IP bound above and
               (nmin, nmax) the tile's original-row-norm envelope
               (tile_stats columns 3-4) — the max covers both signs of U,
               so the bound holds whether the best numerator is positive
               (divide by the smallest norm) or negative (largest)

The bound only has teeth when tiles differ in their norm envelopes, so
builders can NORM-ORDER the corpus (PackedCorpus.perm) — the flat-scan
analog of the reference's per-cluster norm locality — and emit a
prune_hint so homogeneous corpora skip the stage's bookkeeping.

When the bound is below the running kth score for EVERY resident query,
the whole tile's unpack/dequant/matmul/fold work is skipped under
`pl.when` (the tile DMA still streams — Pallas prefetch is index-mapped —
so the win is compute, which dominates this kernel).  Because the bound
is exact w.r.t. the scores the kernel folds, pruning never changes the
result (up to bf16 rounding of the matmul); unlike the reference's
4σ-heuristic `vars·m` bound it cannot drop true candidates.  The
max_margin column consumes fac_error: it widens the keep-region by the
CAQ estimator's certified |⟨q,o⟩ − ⟨q,r̂⟩| ≤ ‖q̃‖·Σ_s fac_error_s/‖o_s‖
bound, so a tile is kept whenever its TRUE inner products (not just the
quantized estimates) could still matter.  (The reference stores
fac_error in ExFactor but never reads it in any search path —
cluster_packer.h:77 is write-only; this margin is where it becomes
load-bearing here.)
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vq_tpu.kernels.pallas_scan import (
    _KPAD,
    fold_running_topk,
    fold_running_topk_merge,
)


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
    if dequant == "values":
        # value-plane segment: the words array is (N, ln) f32 values
        # (u = 1, no bit packing) — see module docstring
        return SegSpec(bits, 32, ln, "values", scale_col)
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


@jax.tree_util.register_pytree_node_class
class PackedCorpus:
    """Scan-optimized corpus layout: row-interleaved words + factors.

    The TPU analog of the reference's ClusterPacker fastscan layout
    (external/saq/include/saq/cluster_packer.h:21-80): the stored row format
    stays the reference-compatible byte rows; this derived layout is built
    once per index (FlatQuantizedIndex caches it via prepare_scan) so the
    hot scan never re-parses byte rows.  Rows are padded to a 512 multiple;
    `num_rows` masks the tail.  words[s] has shape (N_pad/u_s, ln_s).

    tile_stats (N_pad/512, 5) f32 — per-tile (min ‖r̂‖, max ‖r̂‖,
    max CAQ error margin, min row norm, max row norm) feeding the
    variance-prune stage (module docstring; the norm envelope columns
    serve the Metric.NIP bound); None when the builder skipped them.

    perm (N_pad,) i32 — set when the builder NORM-ORDERED the rows (sorted
    by reconstruction norm so tiles are norm-homogeneous and the
    variance-prune bound has teeth; the TPU analog of the reference's
    per-cluster locality).  Scan positions then differ from corpus row ids;
    scan wrappers map results through perm afterwards.  A permuted corpus
    cannot honor `num_valid` prefix masking — builders only sort when the
    caller allows it.

    Registered as a pytree with (num_rows, has_norms, prune_hint) as STATIC
    aux data so a PackedCorpus can cross jit boundaries as an argument while
    python control flow on those fields keeps working.  has_norms records
    whether REAL original row norms were baked into the norm factors column
    — Metric.NIP must refuse a cache built without them.  prune_hint is the
    builder's measured heterogeneity verdict: False means the tile bounds
    are too uniform to ever fire, so auto mode skips the (small) prune
    overhead.
    """

    def __init__(self, words, factors, num_rows, tile_stats=None,
                 has_norms=False, perm=None, prune_hint=False):
        self.words = tuple(words)
        self.factors = factors
        self.num_rows = num_rows
        self.tile_stats = tile_stats
        self.has_norms = has_norms
        self.perm = perm
        self.prune_hint = prune_hint

    def tree_flatten(self):
        children = (self.words, self.factors, self.tile_stats, self.perm)
        aux = (self.num_rows, self.has_norms, self.prune_hint)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        words, factors, tile_stats, perm = children
        num_rows, has_norms, prune_hint = aux
        return cls(words, factors, num_rows, tile_stats=tile_stats,
                   has_norms=has_norms, perm=perm, prune_hint=prune_hint)


@functools.partial(jax.jit, static_argnames=("bits", "beff", "tile"))
def pack_words(
    idx: jax.Array, bits: int, beff: Optional[int] = None,
    tile: Optional[int] = 512,
) -> jax.Array:
    """(N, ln) indices in [0, 2^bits) → (N/u, ln) int32 words
    (u = 32 // beff rows per word; N must be a multiple of u).  `beff` must
    match the SegSpec's (choose_beff); defaults to the dense power-of-two
    width.

    tile defaults to the kernel's _TILE (512): _unpack_words assumes
    tile-ordered words, so a caller on the default always produces the
    layout the kernel consumes.  Pass tile=None EXPLICITLY for the legacy
    row-interleaved diagnostic layout, which the kernel must never see.

    tile=None → row-interleaved: word w shift-slot j holds row w·u + j.
    tile=T (the kernel layout; N % T == 0) → TILE-ORDERED: within each
    T-row tile, word r shift-slot j holds tile-local row j·(T/u) + r, so
    the kernel's unpack restores natural row order by CONCATENATING the u
    shift-planes along sublanes — a free register stack — instead of the
    row-interleaving stack+reshape, whose cross-sublane shuffle was
    measured dominating the kernel at small bit widths (u=16: every f32
    value moved once per plane).  The HBM footprint and shapes are
    identical; only which row lands in which (word, shift) changes."""
    n, ln = idx.shape
    if beff is None:
        beff = _b_eff(bits)
    u = 32 // beff
    assert n % u == 0, (n, u)
    if tile is not None and u > 1:
        assert n % tile == 0 and tile % u == 0, (n, tile, u)
        rt = tile // u
        # tile-local transpose of the (u, rt) row grid: feed the packer
        # rows'[r·u + j] = rows[j·rt + r]
        idx = (
            idx.reshape(n // tile, u, rt, ln)
            .transpose(0, 2, 1, 3)
            .reshape(n, ln)
        )
    r = n // u
    acc = jnp.zeros((r, ln), dtype=jnp.uint32)
    idx = idx.astype(jnp.uint32).reshape(r, u, ln)
    for j in range(u):
        acc = acc | (idx[:, j, :] << (beff * j))
    return acc.astype(jnp.int32)


def _unpack_words(words: jax.Array, seg: SegSpec) -> jax.Array:
    """One tile's (T/u, ln) int32 TILE-ORDERED words → (T, ln) int32 indices
    in natural row order (see pack_words: shift-plane j IS rows
    [j·T/u, (j+1)·T/u), so restoring order is a sublane concatenation, not
    an interleave)."""
    u = seg.u
    mask = (1 << seg.bits) - 1
    uw = words.astype(jnp.uint32)
    chunks = [
        ((uw >> (seg.beff * j)) & jnp.uint32(mask)).astype(jnp.int32)
        for j in range(u)
    ]
    if u == 1:
        return chunks[0]
    return jnp.concatenate(chunks, axis=0)


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


def _packed_kernel_gather(
    ids_ref, cnt2_ref, limit_ref, *rest, **kw,
):
    """Scalar-prefetch entry for the tile-GATHER masked path: the pipeline
    walks the compacted masked-in tile-id list (ids_ref) instead of the
    dense grid, so masked-out tiles are never DMA'd from HBM (the previous
    pl.when-only mask skipped COMPUTE but still streamed every tile — a
    memory-bound scan saved ~nothing; VERDICT r4 missing #2).  Steps past
    cnt2_ref[0] revisit the last valid tile id, which Pallas' pipeline
    elides (same block index → no copy), and their fold is predicated
    off."""
    _packed_kernel(limit_ref, *rest, _gather=(ids_ref, cnt2_ref), **kw)


def _packed_kernel(
    limit_ref, *rest,
    segs: Tuple[SegSpec, ...], n_lv: int, k: int, nb: int, tile: int,
    family: str, metric_kind: str, norm_col: int, r2_cols: Tuple[int, ...],
    use_bf16: bool, prune: bool, masked: bool, _gather=None,
):
    """One grid step: unpack+dequant `tile` rows, score, fold running top-k.

    ALL row-side score constants are precomputed into factor columns at
    pack time (methods/*.prepare_packed), so the in-kernel score assembly
    is the same affine form for every family:

        L2:  s = 2·ip + qa − (Σ_c fac[:, c] for c in r2_cols)[None, :]
        IP:  s = ip + qa
        NIP: s = (ip + qa) / fac[:, norm_col]

    with per-row multiplicative scales (SAQ rescale, RaBitQ's estimator
    α = ‖r‖√D/(t‖ŝ‖²)) folded into the dequantized values via each
    segment's scale_col — i.e. into the MATMUL INPUT.  Measured v5e
    motivation: scaling the matmul OUTPUT by a data-dependent (1, T) row
    (`alpha[None, :] * ip`) serialized the kernel 6× (37 ms vs 6 ms at
    N=131k — a constant-foldable alpha was fast, a factor-derived one
    slow), while the same information as an input-side row scale plus a
    precomputed additive column is free.  `family` remains only to pick
    the variance-prune BOUND shape.

    limit_ref (1,) i32 SMEM — rows with global id ≥ limit score −inf
    [mask_ref (nb,) i32 SMEM — per-tile scan mask, masked=True only: tiles
     with mask 0 are skipped entirely (the IVF probed-tile restriction,
     index/ivf_packed.py; composes with prune — a tile scans only when
     masked in AND not pruned)]
    [stats_ref (3, nb) f32 SMEM — per-tile prune stats, prune=True only]
    q_ref   (Q, D)          — pre-rotated queries (resident)
    qa_ref  (Q, 1) f32      — per-query additive term (see callers)
    [qpr_ref (Q, 2) f32     — per-query (A, B) prune row, prune=True only]
    fac_ref (tile, F) f32   — per-row factors
    rest continues: per-segment words refs ((tile/u_s, ln_s) i32), then n_lv
    level tables, then outs/outi [+ outn (1,1) i32 tiles-scanned count when
    prune] (HBM), then run_s/run_i (Q, _KPAD) VMEM [+ cnt (1,) i32 SMEM]
    """
    pos = 0
    mask_ref = None
    if masked and _gather is None:
        mask_ref = rest[pos]
        pos += 1
    stats_ref = None
    if prune:
        stats_ref = rest[pos]
        pos += 1
    q_ref, qa_ref = rest[pos], rest[pos + 1]
    pos += 2
    qpr_ref = None
    if prune:
        qpr_ref = rest[pos]
        pos += 1
    fac_ref = rest[pos]
    pos += 1
    word_refs = rest[pos : pos + len(segs)]
    lv_refs = rest[pos + len(segs) : pos + len(segs) + n_lv]
    tail = rest[pos + len(segs) + n_lv :]
    merge = k >= 32  # merge-fold scratch present only at large k
    top_s_ref = top_i_ref = None
    if prune:
        if merge:
            (outs_ref, outi_ref, outn_ref, run_s_ref, run_i_ref, top_s_ref,
             top_i_ref, cnt_ref) = tail
        else:
            outs_ref, outi_ref, outn_ref, run_s_ref, run_i_ref, cnt_ref = tail
    elif merge:
        (outs_ref, outi_ref, run_s_ref, run_i_ref, top_s_ref,
         top_i_ref) = tail
    else:
        outs_ref, outi_ref, run_s_ref, run_i_ref = tail
    f32 = jnp.float32
    step = pl.program_id(0)
    # tid: the GLOBAL tile this step scores.  Dense grid: tid == step.
    # Gather mode: the pipeline's index maps already fetched blocks for
    # tile ids_ref[step]; stats lookups and global row offsets must use
    # the same indirection.
    if _gather is not None:
        ids_ref, cnt2_ref = _gather
        tid = ids_ref[step]
    else:
        tid = step
    num_q = q_ref.shape[0]

    @pl.when(step == 0)
    def _init():
        run_s_ref[:] = jnp.full((num_q, _KPAD), -jnp.inf, dtype=f32)
        run_i_ref[:] = jnp.zeros((num_q, _KPAD), dtype=jnp.int32)
        if prune:
            cnt_ref[0] = 0

    if prune:
        # stage-1 variance/factor bound (module docstring): tile upper bound
        # on every query's best maximize-form score vs the running kth.
        # stats_ref is the TRANSPOSED (5, nb) stats in SMEM: SMEM pads per
        # ROW, so (nb, 5) would cost nb padded rows (1 MB SMEM blown at
        # N=1M) while (5, nb) costs five.
        rmin = stats_ref[0, tid]
        rmax = stats_ref[1, tid]
        me = stats_ref[2, tid]  # CAQ error margin (×‖q̃‖)
        a = qpr_ref[:, 0]
        b = qpr_ref[:, 1]
        if metric_kind == "l2" and family == "seg":
            # interval bound: dist ≥ qdrop² + min_{r∈[rmin,rmax]} (B−r)²,
            # and a = q² − qdrop² − B², so s ≤ a + B² − (B−clamp(B))²
            c = jnp.clip(b, rmin, rmax)
            s_ub = a + b * b - (b - c) * (b - c) + 2.0 * b * me
        elif metric_kind == "l2":
            # rabitq: the −‖r‖² term and the Cauchy-Schwarz scale α‖ŝ‖
            # come from different factors, so no perfect square — use the
            # loose endpoint form
            s_ub = a - rmin * rmin + 2.0 * b * (rmax + me)
        elif metric_kind == "nip":
            # numerator bound U over the tile, divided by the norm
            # envelope endpoint that maximizes it (covers both signs of U)
            u = a + b * (rmax + me)
            nmin = jnp.maximum(stats_ref[3, tid], 1e-30)
            nmax = jnp.maximum(stats_ref[4, tid], 1e-30)
            s_ub = jnp.maximum(u / nmin, u / nmax)
        else:
            s_ub = a + b * (rmax + me)
        kth = run_s_ref[:, k - 1]  # (Q,) current kth-best (−inf until full)
        go = jnp.any(s_ub >= kth)
        if _gather is not None:
            go = jnp.logical_and(go, step < cnt2_ref[0])
        elif masked:
            go = jnp.logical_and(go, mask_ref[step] != 0)
        cnt_ref[0] = cnt_ref[0] + jnp.where(go, 1, 0)
    elif _gather is not None:
        go = step < cnt2_ref[0]
    elif masked:
        go = mask_ref[step] != 0
    else:
        go = None

    def _scan_tile():
        # fac rides HBM as a (nb, tile·nf) row-major bitcast of the
        # public (N, nf) array: a windowed (tile, nf) input would be
        # copied to a T(8, 128)-tiled layout — minor dim nf (3-10)
        # padded to 128 lanes, 27 GB at 53M rows (measured compile-time
        # OOM); the flat view keeps lanes dense and the per-tile
        # reshape below is a small in-VMEM relayout.
        fac = fac_ref[:].reshape(tile, fac_ref.shape[1] // tile)
        parts = []
        li = 0
        for s, seg in enumerate(segs):
            if seg.dequant == "values":
                # precomputed f32 value plane: straight load + per-row scale
                val = word_refs[s][:]
                if seg.scale_col >= 0:
                    val = val * fac[:, seg.scale_col][:, None]
                parts.append(val)
                continue
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
            # TPU f32 dots silently degrade to bf16 without HIGHEST
            # (CLAUDE.md); Mosaic lowers this to the multi-pass f32 MXU
            # emulation
            ip = jax.lax.dot_general(
                q_ref[:], ohat, (((1,), (1,)), ((), ())),
                precision=jax.lax.Precision.HIGHEST,
                preferred_element_type=f32,
            )
        qa = qa_ref[:]  # (Q, 1)

        if metric_kind == "l2":
            shift = fac[:, r2_cols[0]]
            for c in r2_cols[1:]:
                shift = shift + fac[:, c]
            s = 2.0 * ip + qa - shift[None, :]
        elif metric_kind == "ip":
            s = ip + qa
        else:  # nip
            s = (ip + qa) / jnp.maximum(
                fac[:, norm_col], f32(1e-30)
            )[None, :]

        start = tid * tile
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (num_q, tile), 1) + start
        s = jnp.where(col_ids < limit_ref[0], s, -jnp.inf)
        # merge-fold amortizes large k (hit-gated extraction + bitonic
        # merge); the k-round extraction stays cheaper below its fixed
        # overhead (see fold_running_topk_merge docstring)
        if k >= 32:
            fold_running_topk_merge(run_s_ref, run_i_ref, s, col_ids, k,
                                    top_s_ref, top_i_ref)
        else:
            fold_running_topk(run_s_ref, run_i_ref, s, col_ids, k)

    if prune or masked:
        pl.when(go)(_scan_tile)
    else:
        _scan_tile()

    @pl.when(step == nb - 1)
    def _emit():
        outs_ref[:] = run_s_ref[:]
        outi_ref[:] = run_i_ref[:]
        if prune:
            outn_ref[0, 0] = cnt_ref[0]


# Variance-prune stats ride SMEM as a (5, nb) f32 table; TPU SMEM is
# ~1 MB and pads per ROW, and the measured requirement at nb=32768 was
# already 1.00 MB (compile-time reject at 16.7M rows) — past this many
# tiles (≈8.4M rows) the stage must stay off; at that scale per-tile
# bounds carry little information per byte anyway.  Callers gate on it.
PRUNE_MAX_TILES = 16_384

_TILE = 512  # rows per grid step; pinned — SegSpec beff choices (choose_beff)
# and the Mosaic mis-DMA geometry guard are validated against this value.


@functools.partial(
    jax.jit,
    static_argnames=(
        "segs", "k", "family", "metric_kind", "norm_col", "r2_cols",
        "interpret", "use_bf16", "prune", "mask_cap",
    ),
)
def packed_scan_topk(
    q_cat: jax.Array,
    qa: jax.Array,
    words: Tuple[jax.Array, ...],
    factors: jax.Array,
    lv_tables: Tuple[jax.Array, ...],
    segs: Tuple[SegSpec, ...],
    k: int,
    family: str = "seg",
    metric_kind: str = "l2",
    norm_col: int = -1,
    r2_cols: Tuple[int, ...] = (),
    limit: Optional[jax.Array] = None,
    interpret: bool = False,
    use_bf16: bool = True,
    prune: bool = False,
    tile_stats: Optional[jax.Array] = None,
    qprune: Optional[jax.Array] = None,
    tile_mask: Optional[jax.Array] = None,
    mask_cap: Optional[int] = None,
):
    """Fused unpack+dequant+score+top-k → ((Q, k) maximize-form, (Q, k) i32).

    q_cat   (Q, D) queries pre-rotated into code space (D = Σ ln_s)
    qa      (Q,) per-query additive term (mean/centroid ip, const folded)
    words   per-segment (N/u_s, ln_s) int32 — N % 512 == 0 (pad rows
            masked via `limit`), tile-ordered (pack_words(tile=512))
    factors (N, F) f32 per-row factors: per-segment scales (scale_col),
            precomputed L2 row shifts (r2_cols — summed and subtracted
            from 2·ip for metric "l2"; see _packed_kernel), original row
            norm (norm_col, NIP only)
    lv_tables — one per non-uniform segment, in segment order:
              (ln_s, 2^B) for "perdim", (1, 2^B) for "shared"
    family  — "seg" | "rabitq": selects the variance-prune BOUND shape
              only (scoring is unified; see _packed_kernel)
    prune   — enable the stage-1 variance/factor tile skip (module
              docstring); requires tile_stats (N/512, 5) f32 and qprune
              (Q, 2) f32, and returns a THIRD element: the number of
              tiles actually scanned (i32 scalar) for QueryRuntimeMetrics
              parity (reference caq_estimator.h:33-37).
    tile_mask — optional (N/512,) i32: tiles with mask 0 are skipped
              entirely — no DMA, no compute (round 5: the mask is
              compacted into a tile-id list scalar-prefetched into the
              pipeline's index maps, so the kernel walks only masked-in
              tiles; padding steps revisit the last block and Pallas
              elides the copy).  The IVF probed-tile restriction
              (index/ivf_packed.py).  Composes with prune (a tile scans
              only when masked in AND its bound survives).  Skipped
              tiles never fold, so the result equals a scan of the
              masked-in rows alone.
    mask_cap — optional STATIC step cap for the masked path: when the
              masked-in count fits, a short grid of mask_cap steps runs
              instead of nb (kills the no-op-tail sequencing floor);
              exact fallback to the full grid otherwise (lax.cond).
    """
    tile = _TILE
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
    if prune:
        assert tile_stats is not None and qprune is not None
        assert tile_stats.shape == (nb, 5), (tile_stats.shape, nb)
        assert qprune.shape == (num_q, 2), qprune.shape
        # (5, nb) f32 in SMEM: 53M rows (103k tiles) measured a 3.3 MB
        # SMEM allocation against the ~1 MB budget — callers must gate
        assert nb <= PRUNE_MAX_TILES, (
            f"prune stats exceed SMEM at nb={nb}; gate prune on "
            "PRUNE_MAX_TILES")

    if metric_kind == "l2":
        assert r2_cols and all(0 <= c < nf for c in r2_cols), (r2_cols, nf)

    masked = tile_mask is not None
    if masked:
        assert tile_mask.shape == (nb,), (tile_mask.shape, nb)
        # GATHER compaction: the pipeline walks masked-in tile ids (in
        # ascending order) and pads the step tail by repeating the last
        # valid id — Pallas elides copies when consecutive steps map to
        # the same block, so masked-out tiles cost neither HBM traffic
        # nor compute (the previous SMEM-mask path predicated compute
        # only and still streamed every tile).
        maskb = tile_mask.astype(jnp.int32) > 0
        cnt = jnp.sum(maskb.astype(jnp.int32))
        perm = jnp.argsort(jnp.logical_not(maskb)).astype(jnp.int32)
        last_valid = perm[jnp.maximum(cnt - 1, 0)]
        steps_arr = jnp.arange(nb, dtype=jnp.int32)
        tile_ids = jnp.where(steps_arr < cnt, perm, last_valid)
    lim = jnp.full((1,), n if limit is None else limit, dtype=jnp.int32)
    kernel = functools.partial(
        _packed_kernel,
        segs=segs, n_lv=n_lv, k=k, nb=nb, tile=tile,
        family=family, metric_kind=metric_kind, norm_col=norm_col,
        r2_cols=tuple(r2_cols), use_bf16=use_bf16, prune=prune,
        masked=masked,
    )

    if masked:
        def _tile_ix(i, ids, cnt_r):
            return (ids[i], 0)

        def _const_ix(i, ids, cnt_r):
            return (0, 0)
    else:
        def _tile_ix(i):
            return (i, 0)

        def _const_ix(i):
            return (0, 0)

    def _wspec(seg):
        r = tile // seg.u
        return pl.BlockSpec((r, seg.ln), _tile_ix,
                            memory_space=pltpu.VMEM)

    word_specs = [_wspec(seg) for seg in segs]
    lv_specs = [
        pl.BlockSpec(t.shape, _const_ix, memory_space=pltpu.VMEM)
        for t in lv_tables
    ]
    out_shape = [
        jax.ShapeDtypeStruct((num_q, _KPAD), f32),
        jax.ShapeDtypeStruct((num_q, _KPAD), jnp.int32),
    ]
    out_specs = [
        pl.BlockSpec((num_q, _KPAD), _const_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((num_q, _KPAD), _const_ix, memory_space=pltpu.VMEM),
    ]
    scratch = [
        pltpu.VMEM((num_q, _KPAD), f32),
        pltpu.VMEM((num_q, _KPAD), jnp.int32),
    ]
    if k >= 32:  # merge-fold tile-top scratch (scores + ids)
        scratch += [
            pltpu.VMEM((num_q, _KPAD), f32),
            pltpu.VMEM((num_q, _KPAD), jnp.int32),
        ]
    in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM)]
    inputs = [lim]
    if prune:
        in_specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        inputs.append(tile_stats.astype(f32).T)  # (5, nb) — see kernel note
    in_specs += [
        pl.BlockSpec((num_q, d), _const_ix, memory_space=pltpu.VMEM),
        pl.BlockSpec((num_q, 1), _const_ix, memory_space=pltpu.VMEM),
    ]
    inputs += [q_cat.astype(mm_dt), qa.reshape(num_q, 1).astype(f32)]
    if prune:
        in_specs.append(
            pl.BlockSpec((num_q, 2), _const_ix, memory_space=pltpu.VMEM)
        )
        inputs.append(qprune.astype(f32))
        out_shape.append(jax.ShapeDtypeStruct((1, 1), jnp.int32))
        out_specs.append(
            pl.BlockSpec((1, 1), _const_ix, memory_space=pltpu.SMEM)
        )
        scratch.append(pltpu.SMEM((1,), jnp.int32))
    in_specs += [
        pl.BlockSpec((1, tile * nf), _tile_ix, memory_space=pltpu.VMEM),
    ] + word_specs + lv_specs
    inputs += [
        factors.astype(f32).reshape(nb, tile * nf),
        *words,
        *[t.astype(f32) for t in lv_tables],
    ]
    cparams = pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
    if masked:
        def _call_gather(grid_n):
            kg = functools.partial(
                _packed_kernel_gather,
                segs=segs, n_lv=n_lv, k=k, nb=grid_n, tile=tile,
                family=family, metric_kind=metric_kind, norm_col=norm_col,
                r2_cols=tuple(r2_cols), use_bf16=use_bf16, prune=prune,
                masked=True,
            )
            ids = (tile_ids if grid_n == nb
                   else jax.lax.dynamic_slice_in_dim(tile_ids, 0, grid_n, 0))
            return pl.pallas_call(
                kg,
                out_shape=tuple(out_shape),
                grid_spec=pltpu.PrefetchScalarGridSpec(
                    num_scalar_prefetch=2,
                    grid=(grid_n,),
                    in_specs=in_specs,
                    out_specs=tuple(out_specs),
                    scratch_shapes=scratch,
                ),
                compiler_params=cparams,
                interpret=interpret,
            )(ids, cnt.reshape(1), *inputs)

        if mask_cap is not None and 0 < mask_cap < nb:
            # short-grid fast path: when the mask fits under the static
            # cap, run a grid of only mask_cap steps (the full-grid tail
            # of no-op steps still costs ~2-3 µs each in sequencing — at
            # 10M rows / 19531 tiles that is a ~50 ms floor).  Falls back
            # to the full grid — exact either way — when the mask
            # overflows the cap.
            out = jax.lax.cond(
                cnt <= mask_cap,
                lambda: _call_gather(int(mask_cap)),
                lambda: _call_gather(nb),
            )
        else:
            out = _call_gather(nb)
    else:
        out = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shape),
            grid=(nb,),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            scratch_shapes=scratch,
            compiler_params=cparams,
            interpret=interpret,
        )(*inputs)
    if prune:
        outs, outi, outn = out
        return outs[:, :k], outi[:, :k], outn[0, 0]
    outs, outi = out
    return outs[:, :k], outi[:, :k]


def packed_scan_available(
    segs: Sequence[SegSpec], num_q: int, d: int, nf: int,
    lv_sizes: Sequence[int], tile: int = 512, max_bits: int = 8,
) -> bool:
    """Gate: TPU backend, select-sum bit widths, VMEM budget.

    Level lookups unroll 2^B VPU select ops per non-uniform segment.  Up to
    B=8 (256 selects) stays in-kernel so derived-codebook SAQ at high bpd
    keeps the fused path (the reference's fastscan covers all widths via
    code_helper.h function tables); the select-sum VPU cost grows 2^B-fold,
    so B=7/8 segments trade VPU time for staying fused — measured against
    the XLA fallback in BENCH_NOTES.md.  The VMEM model counts resident
    queries, the per-tile words/factors/dequant values, the (Q, tile) score
    tile and the top-k working set, against the raised 100 MB scoped-vmem
    limit (with double-buffering headroom)."""
    if jax.default_backend() != "tpu":
        return False
    for seg in segs:
        if seg.dequant in ("perdim", "shared") and seg.bits > max_bits:
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
