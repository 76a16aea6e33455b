"""Pallas TPU kernel: fused PQ decode + ADC scoring.

The XLA scan path (kernels/adc.py) lowers decode (one-hot × codebook) and
scoring (q·x̂ᵀ) as separate HLOs with a (T, D) bf16 decoded tile in between;
at T=16384, D=1536 that intermediate is ~50 MB and cannot stay in VMEM, so
it round-trips HBM between the two matmuls.  This kernel fuses them: per
grid step a small corpus tile's codes are decoded into a VMEM scratch
(one-hot built from a broadcasted iota compare, multiplied on the MXU) and
scored against the resident queries immediately — HBM traffic per tile is
the packed codes in and the (Q, T) scores out.

This is the TPU analog of the reference's AVX-512 fastscan inner loop
(external/saq/include/saq/fast_scan.h:73-110): where the CPU uses vpshufb
16-way LUT shuffles, the MXU's native "gather" is a one-hot matmul
(SURVEY.md §7.3).

Emits the L2 maximize-form scores (2·q·x̂ − ‖x̂‖²) or raw inner products;
masking/top-k stay in the caller (kernels/adc.py).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _decode_tile(codes_ref, cb_ref, dec_ref, *, num_sub, k_size, dsub, tile,
                 group):
    """Decode one tile of PQ codes into dec_ref via one-hot × codebook.

    group=1: one (tile, K)@(K, dsub) matmul per subquantizer — minimal
    FLOPs, but M small matmuls pay M MXU pipeline fills.  group=g>1: g
    subquantizers share one (tile, g·K)@(g·K, g·dsub) matmul against a
    block-diagonal codebook — g× the FLOPs but 1/g the matmul count, which
    wins while the small matmuls are overhead-bound.  cb_ref layout depends
    on group: (M·K, dsub) for group=1, (M·K, g·dsub) block-diagonal
    (built by _stack_codebooks) otherwise.
    """
    # codes arrive as uint8 and widen PER TILE in VMEM: a whole-corpus
    # astype(int32) in HBM pays the (8,128)-tiled layout's 128-lane pad —
    # 32 bytes/row-of-16-codes becomes 512, 27 GB at N=53M (measured OOM)
    if group == 1:
        for m in range(num_sub):
            idx = codes_ref[:, m].astype(jnp.int32)  # (tile,)
            cols = jax.lax.broadcasted_iota(jnp.int32, (tile, k_size), 1)
            onehot = (cols == idx[:, None]).astype(jnp.bfloat16)
            dec_ref[:, m * dsub : (m + 1) * dsub] = jnp.dot(
                onehot,
                cb_ref[m * k_size : (m + 1) * k_size, :],
                preferred_element_type=jnp.float32,  # MXU acc must be 32-bit
            ).astype(jnp.bfloat16)
        return
    gk = group * k_size
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, gk), 1)
    modk = cols % k_size
    divk = cols // k_size
    for g0 in range(0, num_sub, group):
        # concatenated one-hot over the group's flattened (m_local, code)
        oh = jnp.zeros((tile, gk), dtype=jnp.bool_)
        for ml in range(group):
            idx_ml = codes_ref[:, g0 + ml].astype(jnp.int32)
            oh = oh | ((divk == ml) & (modk == idx_ml[:, None]))
        dec_ref[:, g0 * dsub : (g0 + group) * dsub] = jnp.dot(
            oh.astype(jnp.bfloat16),
            cb_ref[g0 * k_size : (g0 + group) * k_size, :],
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)


def _stack_codebooks(codebooks: jax.Array, group: int) -> jax.Array:
    """(M, K, dsub) → the cb_ref layout _decode_tile expects (bf16)."""
    num_sub, k_size, dsub = codebooks.shape
    cb = codebooks.astype(jnp.bfloat16)
    if group == 1:
        return cb.reshape(num_sub * k_size, dsub)
    assert num_sub % group == 0, (num_sub, group)
    # block-diagonal within each group: row (g0+ml)·K+j holds cb[g0+ml, j]
    # in columns [ml·dsub, (ml+1)·dsub)
    blocks = []
    for g0 in range(0, num_sub, group):
        bd = jnp.zeros((group * k_size, group * dsub), dtype=jnp.bfloat16)
        for ml in range(group):
            bd = jax.lax.dynamic_update_slice(
                bd, cb[g0 + ml], (ml * k_size, ml * dsub)
            )
        blocks.append(bd)
    return jnp.concatenate(blocks, axis=0)  # (M·K, group·dsub)


def _scan_kernel(q_ref, codes_ref, cb_ref, out_ref, dec_ref, *, num_sub, k_size,
                 dsub, tile, l2: bool, group: int = 1):
    """One grid step: decode `tile` rows, score against all queries.

    q_ref   (Q, D) bf16      — resident queries (rotated/unchanged)
    codes_ref (tile, M) u8   — this tile's PQ codes (widened per tile)
    cb_ref  stacked codebooks bf16 (see _decode_tile)
    out_ref (Q, tile) f32    — maximize-form scores
    dec_ref (tile, M·dsub) bf16 VMEM scratch — decoded tile
    """
    _decode_tile(codes_ref, cb_ref, dec_ref, num_sub=num_sub, k_size=k_size,
                 dsub=dsub, tile=tile, group=group)
    dec = dec_ref[:]
    ip = jnp.dot(q_ref[:], dec.T, preferred_element_type=jnp.float32)  # (Q, tile)
    if l2:
        dec_f32 = dec.astype(jnp.float32)
        recon_sq = jnp.sum(dec_f32 * dec_f32, axis=-1)  # (tile,)
        out_ref[:] = 2.0 * ip - recon_sq[None, :]
    else:
        out_ref[:] = ip


@functools.partial(
    jax.jit, static_argnames=("tile", "l2", "interpret", "group")
)
def pq_score_all(
    queries: jax.Array,
    codes: jax.Array,
    codebooks: jax.Array,
    tile: int = 512,
    l2: bool = True,
    interpret: bool = False,
    group: int = 1,
) -> jax.Array:
    """Fused decode+score over the whole (padded) corpus → (Q, N) f32.

    queries (Q, D) f32/bf16; codes (N, M) integer with N % tile == 0;
    codebooks (M, K, dsub).  Returns maximize-form scores (2·q·x̂ − ‖x̂‖²
    for l2=True, else q·x̂).
    """
    num_q, d = queries.shape
    n, num_sub = codes.shape
    _, k_size, dsub = codebooks.shape
    assert n % tile == 0, (n, tile)

    group = _validate_group(group, num_sub)
    q = queries.astype(jnp.bfloat16)
    cb = _stack_codebooks(codebooks, group)
    codes_i = codes.astype(jnp.uint8)  # widened per tile IN the kernel

    kernel = functools.partial(
        _scan_kernel, num_sub=num_sub, k_size=k_size, dsub=dsub, tile=tile,
        l2=l2, group=group,
    )
    grid = (n // tile,)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_q, n), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((num_q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, num_sub), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_sub * k_size, group * dsub), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec((num_q, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((tile, num_sub * dsub), jnp.bfloat16)],
        interpret=interpret,
    )(q, codes_i, cb)


_KPAD = 128  # output lane width; k ≤ _KPAD


def fold_running_topk(run_s_ref, run_i_ref, s, col_ids, k):
    """Fold a (Q, T) score tile into the running (Q, _KPAD) top-k scratch.

    k rounds of max-extraction over the (tile ∪ running) candidate set; ties
    break to the lowest global id (matches lax.top_k).  Pure dataflow — no
    data-dependent control — so Mosaic software-pipelines it behind the next
    tile's MXU matmuls (see BENCH_NOTES.md "measured dead ends").  Shared by
    the PQ one-hot kernel and the packed-code kernel (pallas_packed.py).
    """
    cat_s = jnp.concatenate([s, run_s_ref[:]], axis=1)
    cat_i = jnp.concatenate([col_ids, run_i_ref[:]], axis=1)
    big = jnp.int32(2**31 - 1)
    for j in range(k):
        m = jnp.max(cat_s, axis=1)  # (Q,)
        am = jnp.min(jnp.where(cat_s >= m[:, None], cat_i, big), axis=1)
        am = jnp.where(m > -jnp.inf, am, 0)
        run_s_ref[:, j] = m
        run_i_ref[:, j] = am
        # ids are unique across the tile ∪ running union, so matching the
        # extracted id alone removes exactly one candidate
        cat_s = jnp.where(cat_i == am[:, None], -jnp.inf, cat_s)


def fold_running_topk_merge(run_s_ref, run_i_ref, s, col_ids, k,
                            top_s_ref, top_i_ref):
    """Exact fold via hit-gated extraction + one bitonic MERGE.

    fold_running_topk pays k max-extraction rounds over the (tile ∪
    running) union EVERY tile — measured linear in k (17/31/69 ms at
    k=10/32/100, N=1M dense packed scan): at k=100 the fold, not the
    matmul, is the kernel.  This variant exploits two invariants:

      1. after warmup, almost no tile entry beats the running kth score
         — count the hits (one pass) and extract the tile's own sorted
         top only as deep as needed: 16 unconditional rounds cover the
         steady state; the full 128-round re-extraction runs under
         pl.when(h > 16) and fires only for the first ~dozen tiles;
      2. the running buffer is already SORTED (desc, ties id-asc), so
         folding is a 2-way merge of sorted lists — one 8-stage bitonic
         merge over (Q, 2·_KPAD) lanes (roll-based compare-exchange, no
         3-D relayouts), not k re-extraction rounds.

    Both paths are exact under the same (score desc, id asc) total
    order; entries with score −inf keep id 0 (fold_running_topk's
    convention).  Correctness: a tile entry below the old kth score can
    never enter the top-k (k entries already beat it), and all entries
    ≥ that score lie in the tile's comparator-top-h ⊆ top-16 (or the
    gated full extraction).  The merged buffer keeps _KPAD sorted
    entries — a superset of the k the caller reads.

    top_s/top_i (Q, _KPAD) VMEM scratch — the tile's sorted top
    candidates (invalid slots −inf / id 2³¹−1 so they sort last).
    """
    num_q, t = s.shape
    big = jnp.int32(2**31 - 1)
    thr = run_s_ref[:, k - 1]  # kth-best so far (−inf until warm)
    h = jnp.max(jnp.sum((s >= thr[:, None]).astype(jnp.int32), axis=1))

    # tile-top is stored REVERSED (ascending, best candidate in the last
    # column): round j writes column _KPAD−1−j, so the merge needs no
    # lane reversal (Mosaic has no `rev` lowering)
    n_fast = 16
    top_s_ref[:] = jnp.full((num_q, _KPAD), -jnp.inf, jnp.float32)
    top_i_ref[:] = jnp.full((num_q, _KPAD), big, jnp.int32)
    ws = s
    for j in range(n_fast):
        m = jnp.max(ws, axis=1)
        am = jnp.min(jnp.where(ws >= m[:, None], col_ids, big), axis=1)
        top_s_ref[:, _KPAD - 1 - j] = m
        top_i_ref[:, _KPAD - 1 - j] = jnp.where(m > -jnp.inf, am, big)
        ws = jnp.where(col_ids == am[:, None], -jnp.inf, ws)

    @pl.when(h > n_fast)
    def _deep():  # rare: more than n_fast tile entries beat the kth
        ws = s
        for j in range(_KPAD):
            m = jnp.max(ws, axis=1)
            am = jnp.min(jnp.where(ws >= m[:, None], col_ids, big), axis=1)
            top_s_ref[:, _KPAD - 1 - j] = m
            top_i_ref[:, _KPAD - 1 - j] = jnp.where(m > -jnp.inf, am, big)
            ws = jnp.where(col_ids == am[:, None], -jnp.inf, ws)

    # bitonic merge: buffer (desc) ++ tile-top (asc) is bitonic
    cat_s = jnp.concatenate([run_s_ref[:], top_s_ref[:]], axis=1)
    cat_i = jnp.concatenate([run_i_ref[:], top_i_ref[:]], axis=1)
    w = 2 * _KPAD
    pos = jax.lax.broadcasted_iota(jnp.int32, (num_q, w), 1)

    def _rot(x, d):  # static lane rotation via concat (no roll/rev prim)
        return jnp.concatenate([x[:, d:], x[:, :d]], axis=1)

    d = _KPAD
    while d >= 1:
        first = (pos & d) == 0  # lane's partner is pos ^ d
        p_s = jnp.where(first, _rot(cat_s, d), _rot(cat_s, w - d))
        p_i = jnp.where(first, _rot(cat_i, d), _rot(cat_i, w - d))
        p_wins = (p_s > cat_s) | ((p_s == cat_s) & (p_i <= cat_i))
        # take = first XNOR p_wins, in int arithmetic — Mosaic cannot
        # lower a select over i1 vectors (trunci i8→i1)
        take = (first.astype(jnp.int32) + p_wins.astype(jnp.int32)) != 1
        cat_s = jnp.where(take, p_s, cat_s)
        cat_i = jnp.where(take, p_i, cat_i)
        d //= 2
    new_s = cat_s[:, :_KPAD]
    new_i = cat_i[:, :_KPAD]
    run_s_ref[:] = new_s
    run_i_ref[:] = jnp.where(new_s > -jnp.inf, new_i, 0)


def _scan_topk_kernel(limit_ref, q_ref, codes_ref, cb_ref, outs_ref, outi_ref,
                      dec_ref, run_s_ref, run_i_ref, *tops, num_sub, k_size,
                      dsub, tile, k, nb, l2: bool, group: int = 1):
    """One grid step: decode `tile` rows, score against all queries, and fold
    the tile into a RUNNING exact top-k kept in VMEM scratch (iterative
    max + first-index + mask on the VPU, overlapped with the next tile's MXU
    matmuls).  The TPU grid is sequential, so scratch persists across steps;
    only the final (Q, _KPAD) result is written to HBM at the last step —
    the (Q, N) score buffer never exists anywhere.

    limit_ref (1,) i32 SMEM     — rows with global id ≥ limit score -inf
    run_s/run_i (Q, _KPAD) VMEM — running top-k scores / global row ids
    outs/outi (Q, _KPAD) HBM    — final result (first k columns valid)
    """
    step = pl.program_id(0)
    start = step * tile
    num_q = q_ref.shape[0]

    @pl.when(step == 0)
    def _init():
        run_s_ref[:] = jnp.full((num_q, _KPAD), -jnp.inf, dtype=jnp.float32)
        run_i_ref[:] = jnp.zeros((num_q, _KPAD), dtype=jnp.int32)

    _decode_tile(codes_ref, cb_ref, dec_ref, num_sub=num_sub, k_size=k_size,
                 dsub=dsub, tile=tile, group=group)
    dec = dec_ref[:]
    ip = jnp.dot(q_ref[:], dec.T, preferred_element_type=jnp.float32)
    if l2:
        dec_f32 = dec.astype(jnp.float32)
        recon_sq = jnp.sum(dec_f32 * dec_f32, axis=-1)
        s = 2.0 * ip - recon_sq[None, :]
    else:
        s = ip
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (num_q, tile), 1) + start
    s = jnp.where(col_ids < limit_ref[0], s, -jnp.inf)

    if k >= 32:  # merge-fold amortizes large k (see its docstring)
        fold_running_topk_merge(run_s_ref, run_i_ref, s, col_ids, k,
                                tops[0], tops[1])
    else:
        fold_running_topk(run_s_ref, run_i_ref, s, col_ids, k)

    @pl.when(step == nb - 1)
    def _emit():
        outs_ref[:] = run_s_ref[:]
        outi_ref[:] = run_i_ref[:]


@functools.partial(jax.jit, static_argnames=("k", "tile", "l2", "interpret",
                                              "group"))
def pq_scan_topk_fused(
    queries: jax.Array,
    codes: jax.Array,
    codebooks: jax.Array,
    k: int,
    tile: int = 512,
    l2: bool = True,
    limit: Optional[jax.Array] = None,
    interpret: bool = False,
    group: int = 1,
):
    """Fully fused decode+score+top-k → ((Q, k) f32 maximize-form, (Q, k) i32).

    Exact: every tile's candidates pass through the running top-k, which is
    equivalent to top-k over the concatenation of all tiles.  HBM traffic is
    the packed codes in and (Q, 128) out — the (Q, N) score matrix of the
    two-pass path never exists.  `limit` (traced i32 scalar) masks padded /
    invalid rows.
    """
    num_q, d = queries.shape
    n, num_sub = codes.shape
    _, k_size, dsub = codebooks.shape
    assert n % tile == 0 and 0 < k <= min(_KPAD, tile), (n, tile, k)

    group = _validate_group(group, num_sub)
    q = queries.astype(jnp.bfloat16)
    cb = _stack_codebooks(codebooks, group)
    codes_i = codes.astype(jnp.uint8)  # widened per tile IN the kernel
    nb = n // tile
    lim = jnp.full((1,), n if limit is None else limit, dtype=jnp.int32)

    kernel = functools.partial(
        _scan_topk_kernel, num_sub=num_sub, k_size=k_size, dsub=dsub,
        tile=tile, k=k, nb=nb, l2=l2, group=group,
    )
    outs, outi = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((num_q, _KPAD), jnp.float32),
            jax.ShapeDtypeStruct((num_q, _KPAD), jnp.int32),
        ),
        grid=(nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((num_q, d), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, num_sub), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_sub * k_size, group * dsub), lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec((num_q, _KPAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((num_q, _KPAD), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile, num_sub * dsub), jnp.bfloat16),
            pltpu.VMEM((num_q, _KPAD), jnp.float32),
            pltpu.VMEM((num_q, _KPAD), jnp.int32),
        ] + ([
            pltpu.VMEM((num_q, _KPAD), jnp.float32),  # merge-fold tile-top
            pltpu.VMEM((num_q, _KPAD), jnp.int32),
        ] if k >= 32 else []),
        interpret=interpret,
    )(lim, q, codes_i, cb)
    return outs[:, :k], outi[:, :k]


def _validate_group(group: int, num_sub: int) -> int:
    """Normalize the grouped-decode knob.  group must be a positive divisor
    of num_sub; non-divisible values fall back to 1 WITH a warning so
    ablation timings are never silently mislabeled (a tuned group=3 that
    quietly ran as group=1 would corrupt the ablation table)."""
    if group == 1:
        return 1
    if group < 1:
        raise ValueError(f"group must be >= 1, got {group}")
    if num_sub % group != 0:
        import warnings

        warnings.warn(
            f"group={group} does not divide num_sub={num_sub}; "
            "falling back to group=1",
            stacklevel=3,
        )
        return 1
    return group


def pallas_scan_available(d: int, num_q: int, k_size: int, num_sub: int,
                          dsub: int, tile: int = 512, group: int = 1) -> bool:
    """VMEM budget check: queries + codebooks + decode scratch + out tile.

    With group>1 the kernel loads a (num_sub*k_size, group*dsub)
    block-diagonal codebook (group× larger) and builds a (tile, group*k_size)
    one-hot intermediate — both scale with group, so the gate must too.

    k_size > 256 (PQ num_bits > 8) is refused: the kernel stores codes as
    uint8 and widens per tile (the 53M enabler, see _decode_tile), so wider
    codes would silently truncate.  >8-bit PQ stays on the XLA path, whose
    int32 one-hot handles any width.
    """
    if jax.default_backend() != "tpu" or k_size > 256:
        return False
    if group > 1 and num_sub % group != 0:
        group = 1
    vmem = (
        num_q * d * 2  # queries bf16
        + num_sub * k_size * (group * dsub) * 2  # stacked codebooks bf16
        + tile * num_sub * dsub * 2  # decode scratch
        + tile * (group * k_size) * 2  # one-hot intermediate bf16
        + num_q * tile * 4  # out tile
        + tile * num_sub * 4  # codes tile
    )
    return vmem < 12 * 1024 * 1024


def pallas_topk_fused_available(d: int, num_q: int, k_size: int, num_sub: int,
                                dsub: int, tile: int = 512,
                                group: int = 1) -> bool:
    """VMEM budget for pq_scan_topk_fused: the (Q, tile) score tile and the
    (Q, tile+_KPAD) candidate values replace the two-pass kernel's HBM out
    block; measured headroom against the 16 MB scoped-vmem limit.
    k_size > 256 refused — uint8 codes would truncate (see
    pallas_scan_available)."""
    if jax.default_backend() != "tpu" or k_size > 256:
        return False
    if group > 1 and num_sub % group != 0:
        group = 1
    vmem = (
        num_q * d * 2  # queries bf16
        + num_sub * k_size * (group * dsub) * 2  # stacked codebooks bf16
        + tile * num_sub * dsub * 2  # decode scratch
        + tile * (group * k_size) * 2  # one-hot intermediate bf16
        + tile * num_sub * 4  # codes tile
        + num_q * tile * 4  # score tile value
        + num_q * (tile + _KPAD) * 8  # cat_s f32 + cat_i i32 values
        + num_q * _KPAD * 8 * 2  # running top-k scratch + out blocks
    )
    return vmem < 15 * 1024 * 1024
