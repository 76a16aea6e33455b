"""RaBitQ / Extended RaBitQ, TPU-native.

Capability parity with the reference's two RaBitQ paths: the faiss 1-bit
wrapper (methods/rabit_quantization.py:9-40) and the standalone multi-bit
Extended RaBitQ (methods/extended_rabitq.py:47-204).  One implementation
covers both (num_bits=1 → classic RaBitQ up to the shared-codebook scale,
which the per-vector rescale factor t absorbs).

Model (Gao & Long, Extended RaBitQ): centroid c, seeded random orthogonal
rotation P, and a shared B-bit Gaussian-optimal scalar codebook (1-D Lloyd
on N(0,1) — kernels/lloyd1d.py).  Encode: r = x−c, s = (r/‖r‖)·P·√D,
per-coord nearest level, rescale t = ⟨s,ŝ⟩/⟨ŝ,ŝ⟩.  Code row layout matches
the reference byte-for-byte: [packed B-bit indices ‖ ‖r‖ f32 ‖ t f32] =
ceil(D·B/8)+8 bytes, self-contained rows.

TPU-first search: the rotation is orthogonal, so the scan rotates the
QUERIES once (q·x̂ = α·(qP)·ŝ + q·c with α = ‖r‖·t/√D) and each corpus tile
only needs bit-unpack + tiny level lookup + one MXU matmul — never a D×D
rotation per tile.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from vq_tpu.core.config import Metric, RaBitQConfig
from vq_tpu.core.packing import (
    bytes_to_f32,
    f32_to_bytes,
    pack_bits,
    packed_bytes,
    unpack_bits,
)
from vq_tpu.kernels.adc import _bf16_supported, _finalize, _streaming_topk
from vq_tpu.kernels.lloyd1d import lloyd_1d_normal, quantize_to_levels
from vq_tpu.methods.base import BaseQuantizer


class RaBitQParams(NamedTuple):
    centroid: jax.Array  # (D,)
    rotation: jax.Array  # (D, D) orthogonal, applied as v @ rotation
    levels: jax.Array  # (2^B,) shared scalar codebook


def fit(key: jax.Array, x: jax.Array, cfg: RaBitQConfig) -> RaBitQParams:
    x = jnp.asarray(x, dtype=jnp.float32)
    d = x.shape[1]
    centroid = jnp.mean(x, axis=0)
    # seeded random orthogonal rotation via host float64 QR (one-time; exact
    # orthogonality matters because decode applies P^T)
    rng = np.random.default_rng(cfg.seed)
    q, _ = np.linalg.qr(rng.standard_normal((d, d)))
    rotation = jnp.asarray(q, dtype=jnp.float32)
    levels = lloyd_1d_normal(1 << cfg.num_bits, seed=cfg.seed)
    return RaBitQParams(centroid=centroid, rotation=rotation, levels=levels)


def _encode_arrays(params: RaBitQParams, x: jax.Array):
    """→ (idx (N,D) int32, nrm (N,), t (N,))."""
    x = jnp.asarray(x, dtype=jnp.float32)
    d = x.shape[1]
    r = x - params.centroid
    nrm = jnp.linalg.norm(r, axis=1)
    o = r / jnp.maximum(nrm, 1e-12)[:, None]
    s = jnp.dot(o, params.rotation, precision=jax.lax.Precision.HIGHEST) * jnp.sqrt(
        jnp.float32(d)
    )
    idx = quantize_to_levels(s, params.levels)
    s_hat = params.levels[idx]
    num = jnp.sum(s * s_hat, axis=1)
    den = jnp.sum(s_hat * s_hat, axis=1)
    t = jnp.where(den > 1e-12, num / den, 1.0)
    return idx, nrm, t


def encode(params: RaBitQParams, x: jax.Array, num_bits: int) -> jax.Array:
    """→ (N, ceil(D·B/8)+8) uint8 self-contained rows."""
    idx, nrm, t = _encode_arrays(params, x)
    packed = pack_bits(idx, num_bits)
    return jnp.concatenate([packed, f32_to_bytes(nrm), f32_to_bytes(t)], axis=1)


def _shat_from_packed(
    packed: jax.Array, levels: jax.Array, num_bits: int, d: int
) -> jax.Array:
    """Unpack indices and look up levels as a one-hot matmul (MXU-native
    gather; the level table has ≤ 256 entries)."""
    idx = unpack_bits(packed, num_bits, d)
    onehot = jax.nn.one_hot(idx, levels.shape[0], dtype=levels.dtype)
    return jnp.dot(onehot, levels, precision=jax.lax.Precision.HIGHEST)


def decode(params: RaBitQParams, codes: jax.Array, num_bits: int) -> jax.Array:
    d = params.centroid.shape[0]
    ib = packed_bytes(d, num_bits)
    s_hat = _shat_from_packed(codes[:, :ib], params.levels, num_bits, d)
    nrm = bytes_to_f32(codes[:, ib : ib + 4])
    t = bytes_to_f32(codes[:, ib + 4 : ib + 8])
    o_hat = s_hat / jnp.sqrt(jnp.float32(d)) * t[:, None]
    return (
        jnp.dot(o_hat, params.rotation.T, precision=jax.lax.Precision.HIGHEST)
        * nrm[:, None]
        + params.centroid
    )


# ---------------------------------------------------------------------------
# packed-word scan layout (Pallas fast path, kernels/pallas_packed.py)
# ---------------------------------------------------------------------------


# B ≥ this width stores the precomputed f32 value plane instead of packed
# codes + 2^B-select shared-table lookup (the B=8 path measured select-sum
# bound at 51.5 ms vs ~6 ms for B ≤ 4 — kernels/pallas_packed.py "values").
_VALUES_MIN_BITS = 5


def _packed_segspec(d: int, num_bits: int):
    from vq_tpu.kernels.pallas_packed import make_segspec

    # scale_col 0 = the estimator scale α = ‖r‖√D/(t‖ŝ‖²), folded into the
    # dequantized values so the MXU emits α·⟨q,ŝ⟩ directly (an output-side
    # (1, T) row scale measured 6× slower — kernels/pallas_packed.py)
    if num_bits >= _VALUES_MIN_BITS:
        return make_segspec(num_bits, d, "values", 0)
    return make_segspec(num_bits, d, "shared", 0)


def prepare_packed(
    params: RaBitQParams,
    codes: jax.Array,
    num_bits: int,
    norms: Optional[jax.Array] = None,
    row_chunk: int = 131072,
):
    """Byte rows → PackedCorpus.  factors = (α, c2, original-norm-or-1):
    α = ‖r‖√D/(t‖ŝ‖²) is the estimator scale the kernel folds into the
    dequantized values (scale_col 0), c2 = 2α·(ŝ·c_rot) + ‖r‖² is the
    precomputed L2 shift (r2_cols) — all row-side score constants leave
    the kernel (kernels/pallas_packed.py module docstring)."""
    from vq_tpu.kernels.pallas_packed import PackedCorpus, pack_words

    d = params.centroid.shape[0]
    ib = packed_bytes(d, num_bits)
    n = codes.shape[0]
    row_chunk = max(512, row_chunk - row_chunk % 512)
    pad = (-n) % 512
    if pad:  # zero rows parse to idx 0 / nrm 0 / t 0; `limit` masks them
        codes = jnp.pad(codes, ((0, pad), (0, 0)))
    n_pad = n + pad

    seg = _packed_segspec(d, num_bits)
    c_rot = jnp.dot(params.centroid, params.rotation,
                    precision=jax.lax.Precision.HIGHEST)

    @jax.jit
    def convert(rows):
        idx = unpack_bits(rows[:, :ib], num_bits, d)
        nrm = bytes_to_f32(rows[:, ib : ib + 4])
        t = bytes_to_f32(rows[:, ib + 4 : ib + 8])
        # variance-prune stats: the estimator's effective residual scale is
        # α‖ŝ‖ = ‖r‖·√D/(t·‖ŝ‖); ‖r‖² is the exact residual norm² term in
        # the L2 score (methods/saq._tile_stats contract: min r², max r)
        s_hat = params.levels[idx]
        snorm_sq = jnp.sum(s_hat * s_hat, axis=1)
        alpha = nrm * jnp.sqrt(jnp.float32(d)) / jnp.maximum(
            t * snorm_sq, 1e-12
        )
        r_eff = alpha * jnp.sqrt(snorm_sq)
        cdot = jnp.dot(s_hat, c_rot, precision=jax.lax.Precision.HIGHEST)
        c2 = 2.0 * alpha * cdot + nrm * nrm
        if seg.dequant == "values":
            # f32 value plane (unscaled ŝ — the kernel applies α via
            # scale_col), the full-speed B ≥ 5 layout
            w = s_hat.astype(jnp.float32)
        else:
            w = pack_words(idx, num_bits, seg.beff, tile=512)
        return w, jnp.stack([alpha, c2], axis=1), nrm, r_eff

    w_chunks, f_chunks, n_chunks, r_chunks = [], [], [], []
    for i0 in range(0, n_pad, row_chunk):
        w, f, nr, r = convert(codes[i0 : min(i0 + row_chunk, n_pad)])
        w_chunks.append(w)
        f_chunks.append(f)
        n_chunks.append(nr)
        r_chunks.append(r)
    words = jnp.concatenate(w_chunks, axis=0) if len(w_chunks) > 1 else w_chunks[0]
    fac = jnp.concatenate(f_chunks, axis=0) if len(f_chunks) > 1 else f_chunks[0]
    nrm_r = jnp.concatenate(n_chunks, axis=0) if len(n_chunks) > 1 else n_chunks[0]
    r_eff = jnp.concatenate(r_chunks, axis=0) if len(r_chunks) > 1 else r_chunks[0]
    # min/max columns: min over rows of ‖r‖ (the −nrm² score term), max of
    # the Cauchy-Schwarz scale α‖ŝ‖; no CAQ margin for this estimator.
    # Columns 3-4: original-row-norm envelope for the Metric.NIP bound
    # (1.0 when no norms — consistent with the scoring default).
    nrm_col = (
        jnp.ones((n, 1), jnp.float32)
        if norms is None
        else norms.reshape(n, 1).astype(jnp.float32)
    )
    if pad:
        nrm_col = jnp.pad(nrm_col, ((0, pad), (0, 0)), constant_values=1.0)
    valid = jnp.arange(n_pad) < n
    min_r = jnp.where(valid, nrm_r, jnp.inf).reshape(-1, 512).min(axis=1)
    min_r = jnp.where(jnp.isfinite(min_r), min_r, 0.0)
    max_r = jnp.where(valid, r_eff, 0.0).reshape(-1, 512).max(axis=1)
    if norms is None:
        min_n = jnp.ones_like(min_r)
        max_n = jnp.ones_like(max_r)
    else:
        nn = nrm_col[:, 0]
        min_n = jnp.where(valid, nn, jnp.inf).reshape(-1, 512).min(axis=1)
        min_n = jnp.where(jnp.isfinite(min_n), min_n, 1.0)
        max_n = jnp.where(valid, nn, 0.0).reshape(-1, 512).max(axis=1)
        max_n = jnp.where(max_n > 0, max_n, 1.0)
    stats = jnp.stack(
        [min_r, max_r, jnp.zeros_like(max_r), min_n, max_n], axis=1
    ).astype(jnp.float32)
    fac = jnp.concatenate([fac, nrm_col], axis=1)
    from vq_tpu.methods.saq import prune_hint_from_stats

    return PackedCorpus(words=(words,), factors=fac, num_rows=n,
                        tile_stats=stats, has_norms=norms is not None,
                        prune_hint=prune_hint_from_stats(stats))


def _packed_scan(params, queries, packed, k, metric, num_bits,
                 num_valid=None, interpret=False, use_bf16=True,
                 prune=False, tile_mask=None, mask_cap=None):
    from vq_tpu.kernels.pallas_packed import packed_scan_topk

    d = params.centroid.shape[0]
    seg = _packed_segspec(d, num_bits)
    qr = jnp.dot(queries, params.rotation, precision=jax.lax.Precision.HIGHEST)
    cr = jnp.dot(params.centroid, params.rotation,
                 precision=jax.lax.Precision.HIGHEST)
    qc = jnp.dot(queries, params.centroid, precision=jax.lax.Precision.HIGHEST)
    c_sq = jnp.sum(params.centroid**2)
    q_cat = qr
    if metric == Metric.L2:
        kind, qa = "l2", 2.0 * qc - c_sq
    elif metric == Metric.IP:
        kind, qa = "ip", qc
    else:
        kind, qa = "nip", qc
    limit = packed.num_rows if num_valid is None else jnp.minimum(
        packed.num_rows, num_valid
    )
    lv_tables = (
        () if seg.dequant == "values" else (params.levels.reshape(1, -1),)
    )
    qprune = None
    if prune:
        assert packed.tile_stats is not None
        b = jnp.linalg.norm(
            (qr - cr[None, :]) if metric == Metric.L2 else qr, axis=1
        )
        qprune = jnp.stack([qa, b], axis=1)
    return packed_scan_topk(
        q_cat, qa, packed.words, packed.factors, lv_tables, (seg,), k,
        family="rabitq", metric_kind=kind, norm_col=2, r2_cols=(1,),
        limit=limit, interpret=interpret,
        use_bf16=use_bf16, prune=prune,
        tile_stats=packed.tile_stats if prune else None, qprune=qprune,
        tile_mask=tile_mask, mask_cap=mask_cap,
    )


def _packed_available(d, num_bits, num_q, interpret=False):
    from vq_tpu.kernels.pallas_packed import packed_scan_available

    seg = _packed_segspec(d, num_bits)
    lv_sizes = [] if seg.dequant == "values" else [1 << num_bits]
    ok = packed_scan_available((seg,), num_q, d, 3, lv_sizes)
    return ok or (interpret and num_bits <= 8)


def scan_topk(
    params: RaBitQParams,
    queries: jax.Array,
    codes: jax.Array,
    k: int,
    metric: Metric,
    num_bits: int,
    norms: Optional[jax.Array] = None,
    tile_rows: int = 16384,
    use_bf16: bool = True,
    num_valid: Optional[jax.Array] = None,
    approx: bool = False,
    packed_cache=None,
    use_packed: Optional[bool] = None,
    interpret: bool = False,
    prune_tiles: Optional[bool] = None,
):
    """Fused RaBitQ scan: rotated queries, per-tile bit-unpack + level
    lookup + MXU scoring; no per-tile D×D rotation.  prune_tiles enables
    the packed kernel's variance-prune stage (auto when stats exist)."""
    d = params.centroid.shape[0]
    ib = packed_bytes(d, num_bits)
    n = codes.shape[0]
    num_q = queries.shape[0]
    tile = min(tile_rows, max(8, n))
    use_bf16 = use_bf16 and _bf16_supported()

    queries = jnp.asarray(queries, dtype=jnp.float32)
    if use_packed is None:
        use_packed = (
            n >= 512 and k <= 128
            and _packed_available(d, num_bits, num_q, interpret=interpret)
        )
    if use_packed:
        from vq_tpu.kernels.adc import _finalize as _fin

        if metric == Metric.NIP:
            if packed_cache is not None and not packed_cache.has_norms:
                raise ValueError(
                    "Metric.NIP needs a packed cache built with norms"
                )
            if packed_cache is None and norms is None:
                raise ValueError("Metric.NIP requires original row norms")
        packed = packed_cache if packed_cache is not None else prepare_packed(
            params, codes, num_bits,
            norms=norms if metric == Metric.NIP else None,
        )
        prune = (
            prune_tiles
            if prune_tiles is not None
            else (packed.tile_stats is not None and packed.prune_hint)
        )
        if prune:
            outs, outi, _ = _packed_scan(
                params, queries, packed, k, metric, num_bits,
                num_valid=num_valid, interpret=interpret, use_bf16=use_bf16,
                prune=True,
            )
        else:
            outs, outi = _packed_scan(
                params, queries, packed, k, metric, num_bits,
                num_valid=num_valid, interpret=interpret, use_bf16=use_bf16,
            )
        return _fin(outs, outi, metric,
                    jnp.sum(queries * queries, axis=-1))
    dt = jnp.bfloat16 if use_bf16 else jnp.float32
    prec = jax.lax.Precision.DEFAULT if use_bf16 else jax.lax.Precision.HIGHEST

    queries = jnp.asarray(queries, dtype=jnp.float32)
    q_sq = jnp.sum(queries * queries, axis=-1)
    qr = jnp.dot(queries, params.rotation, precision=jax.lax.Precision.HIGHEST)
    qc = jnp.dot(queries, params.centroid, precision=jax.lax.Precision.HIGHEST)  # (Q,)
    cr = jnp.dot(params.centroid, params.rotation, precision=jax.lax.Precision.HIGHEST)
    c_sq = jnp.sum(params.centroid**2)

    n_pad = (-n) % tile
    codes_p = jnp.pad(codes, ((0, n_pad), (0, 0)))
    norms_p = None
    if metric == Metric.NIP:
        if norms is None:
            raise ValueError("Metric.NIP requires original row norms")
        norms_p = jnp.pad(norms.astype(jnp.float32), (0, n_pad), constant_values=1.0)

    qrd = qr.astype(dt)

    def score_tile(start):
        ct = jax.lax.dynamic_slice_in_dim(codes_p, start, tile, axis=0)
        s_hat = _shat_from_packed(ct[:, :ib], params.levels, num_bits, d)  # (T, D)
        nrm = bytes_to_f32(ct[:, ib : ib + 4])
        t = bytes_to_f32(ct[:, ib + 4 : ib + 8])
        # Unbiased RaBitQ estimator (Gao & Long): ⟨q,o⟩ ≈ ⟨q,ō⟩/⟨o,ō⟩, i.e.
        # divide by the alignment rather than project onto ō.  The stored
        # factor is the projection coefficient t = ⟨s,ŝ⟩/⟨ŝ,ŝ⟩ (best for
        # decode MSE); the unbiased scale is recovered per tile from
        # ⟨s,ŝ⟩ = t·‖ŝ‖², so alpha = ‖r‖·√D/(t·‖ŝ‖²).  Projection scoring
        # multiplies each row by ⟨o,ō⟩² — a per-row bias that reorders
        # neighbors (measured: 1-bit R@10 0.374 → 0.395 on the parity set).
        snorm = jnp.sum(s_hat * s_hat, axis=-1)  # (T,)
        alpha = nrm * jnp.sqrt(jnp.float32(d)) / jnp.maximum(t * snorm, 1e-12)
        sdot = jnp.dot(qrd, s_hat.astype(dt).T, preferred_element_type=jnp.float32,
                       precision=prec)  # (Q, T)
        ip = alpha[None, :] * sdot + qc[:, None]  # q·x̂
        if metric == Metric.L2:
            cdot = jnp.dot(s_hat, cr, precision=jax.lax.Precision.HIGHEST)
            # ‖x‖² = ‖c‖² + 2⟨c,r⟩ + ‖r‖² with ⟨c,r⟩ estimated unbiasedly
            xhat_sq = nrm * nrm + 2.0 * alpha * cdot + c_sq
            s = 2.0 * ip - xhat_sq[None, :]
        elif metric == Metric.IP:
            s = ip
        else:
            nt = jax.lax.dynamic_slice_in_dim(norms_p, start, tile, axis=0)
            s = ip / jnp.maximum(nt, 1e-30)[None, :]
        col = start + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        limit = n if num_valid is None else jnp.minimum(n, num_valid)
        return jnp.where(col < limit, s, -jnp.inf)

    scores, idx = _streaming_topk(score_tile, n, num_q, k, tile, approx=approx)
    return _finalize(scores, idx, metric, q_sq)


class RaBitQ(BaseQuantizer):
    name = "rabitq"

    def __init__(self, cfg: RaBitQConfig = RaBitQConfig()):
        super().__init__()
        if not 1 <= cfg.num_bits <= 8:
            raise ValueError("num_bits must be in [1, 8]")
        self.cfg = cfg

    def fit(self, X: np.ndarray) -> "RaBitQ":
        self._dim = X.shape[1]
        self.params = fit(jax.random.PRNGKey(self.cfg.seed), jnp.asarray(X), self.cfg)
        return self

    def compress(self, X: np.ndarray) -> np.ndarray:
        return np.asarray(encode(self.params, jnp.asarray(X), self.cfg.num_bits))

    def decompress(self, codes: np.ndarray) -> np.ndarray:
        return np.asarray(decode(self.params, jnp.asarray(codes), self.cfg.num_bits))

    def decode_fn(self):
        params, bits = self.params, self.cfg.num_bits
        return lambda ct: decode(params, ct, bits)

    def encode_fn(self):
        params, bits = self.params, self.cfg.num_bits
        return lambda x: encode(params, x, bits)

    def scan_topk(self, queries, codes, k, metric, norms=None, tile_rows=16384,
                  use_bf16=True, approx=False, cache=None, num_valid=None,
                  prune_tiles=None):
        return scan_topk(
            self.params, queries, codes, k, metric, self.cfg.num_bits,
            norms=norms, tile_rows=tile_rows, use_bf16=use_bf16, approx=approx,
            packed_cache=cache, num_valid=num_valid, prune_tiles=prune_tiles,
        )

    def prepare_scan(self, codes, norms=None, num_queries=8):
        if not _packed_available(self._dim, self.cfg.num_bits, num_queries):
            return None
        return prepare_packed(self.params, jnp.asarray(codes),
                              self.cfg.num_bits, norms=norms)

    def prepare_shard_cache(self, codes, norms=None, num_queries=8,
                            num_valid_rows=None):
        """Per-shard packed cache (dist/sharded_packed.py).  Unsorted, so
        pad rows stay at the tail and the scan-time num_valid prefix
        limit masks them directly."""
        interp = jax.default_backend() != "tpu"
        if not _packed_available(self._dim, self.cfg.num_bits, num_queries,
                                 interpret=interp):
            return None
        return prepare_packed(self.params, jnp.asarray(codes),
                              self.cfg.num_bits, norms=norms)

    def prepare_tile_cache(self, codes, norms=None, num_queries=8):
        """Order-preserving packed cache for tile-masked scans (base
        contract) — the shard cache is already unsorted."""
        return self.prepare_shard_cache(codes, norms=norms,
                                        num_queries=num_queries)

    def packed_scan_raw(self, queries, packed, k, metric, num_valid=None,
                        use_bf16=True, interpret=False, tile_mask=None,
                        mask_cap=None):
        from vq_tpu.kernels.pallas_packed import PRUNE_MAX_TILES

        prune = (packed.tile_stats is not None and packed.prune_hint
                 and packed.factors.shape[0] // 512 <= PRUNE_MAX_TILES)
        out = _packed_scan(
            self.params, queries, packed, k, metric, self.cfg.num_bits,
            num_valid=num_valid, interpret=interpret, use_bf16=use_bf16,
            prune=prune, tile_mask=tile_mask, mask_cap=mask_cap,
        )
        return out[0], out[1]

    def residual_scorer(self):
        """Code-space window scorer (base contract): with
        ô = ŝ·(‖r‖·t/√D), decode(ct) = rotᵀ(ô) + centroid, so
        v·decode = (v@rot)·ô + v·centroid and ‖decode‖² = ‖c‖² +
        2·(c@rot)·ô + ‖ô‖² — no per-window D×D rotation.  Matches
        decode_fn's projection-form scoring (the flat scan's unbiased
        estimator is a different score; IVF windows follow decode)."""
        params, bits = self.params, self.cfg.num_bits
        d = params.centroid.shape[0]
        ib = packed_bytes(d, bits)
        c_rot = jnp.dot(params.centroid, params.rotation,
                        precision=jax.lax.Precision.HIGHEST)
        c_sq = jnp.sum(params.centroid ** 2)
        sqrt_d = jnp.sqrt(jnp.float32(d))

        def q_map(v):
            v = jnp.asarray(v, jnp.float32)
            v_cat = jnp.dot(v, params.rotation,
                            precision=jax.lax.Precision.HIGHEST)
            v_add = jnp.dot(v, params.centroid,
                            precision=jax.lax.Precision.HIGHEST)
            return v_cat, v_add

        def window(ct):
            s_hat = _shat_from_packed(ct[:, :ib], params.levels, bits, d)
            nrm = bytes_to_f32(ct[:, ib : ib + 4])
            t = bytes_to_f32(ct[:, ib + 4 : ib + 8])
            o = s_hat * (nrm * t / sqrt_d)[:, None]
            r2 = c_sq + 2.0 * jnp.dot(
                o, c_rot, precision=jax.lax.Precision.HIGHEST
            ) + jnp.sum(o * o, axis=1)
            return o, r2

        return q_map, window

    def code_bytes_per_vector(self) -> float:
        return float(packed_bytes(self._dim, self.cfg.num_bits) + 8)

    def config_dict(self):
        return {"B": self.cfg.num_bits}
