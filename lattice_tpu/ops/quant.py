"""Int8 quantized scoring: half the HBM traffic, double the MXU rate.

BASELINE §"recall at equal memory" points at quantization: v5e's MXU runs
int8 at 2x its bf16 rate and an int8 row costs half the HBM bytes of bf16,
so a quantized flat scan is ~2x faster at equal corpus size — or holds 2x
the corpus at equal memory. Scheme: symmetric per-row scales,

    q_i8[i, :] = round(127 * e[i, :] / max_abs(e[i, :]))
    score(q, i) ~= (q_q . q_i8[i]) * scale_q * scale_i

Scores stay exact enough for retrieval (cosine error ~1e-2, like bf16);
the quantized path reuses the same -inf masking + top_k select. The
dequantized rescore of the top candidates (two-stage search) recovers
full-precision ordering when needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def quantize_rows(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int8 quantization. Returns (values i8, scales f32)."""
    x = np.asarray(x, dtype=np.float32)
    amax = np.abs(x).max(axis=-1, keepdims=True)
    scales = (amax / 127.0).astype(np.float32)
    safe = np.maximum(scales, 1e-12)
    values = np.clip(np.rint(x / safe), -127, 127).astype(np.int8)
    return values, scales[:, 0]


# Rows per quantization block: XLA materializes a full-corpus int32
# intermediate for the round/clip/convert chain when quantizing in one
# shot (12 GB at 4M x 768 — OOMed a 16 GB chip, R3 batch 5); a lax.map
# over row blocks bounds the temp to block-size.
QUANT_BLOCK = 1 << 17


def _blocked_rows(x: jax.Array, fn):
    """Apply a per-row-block quantizer via lax.map when the corpus is
    large; a non-multiple row count quantizes its tail separately (rows
    are independent), so every size stays bounded."""
    n = x.shape[0]
    if n <= QUANT_BLOCK:
        return fn(x)
    n_main = (n // QUANT_BLOCK) * QUANT_BLOCK
    blocks = x[:n_main].reshape(-1, QUANT_BLOCK, x.shape[1])
    values, scales = jax.lax.map(fn, blocks)
    values, scales = values.reshape(n_main, -1), scales.reshape(n_main)
    if n_main < n:
        tail_v, tail_s = fn(x[n_main:])
        values = jnp.concatenate([values, tail_v])
        scales = jnp.concatenate([scales, tail_s])
    return values, scales


def _quant8_block(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scales = amax / 127.0
    safe = jnp.maximum(scales, 1e-12)
    values = jnp.clip(jnp.round(x / safe), -127, 127).astype(jnp.int8)
    return values, scales[:, 0]


@jax.jit
def quantize_rows_device(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Device-side row quantization (no host round-trip at corpus scale)."""
    return _blocked_rows(x, _quant8_block)


@functools.partial(jax.jit, static_argnames=("k",))
def int8_topk(
    q_values: jax.Array,    # [B, d] i8
    q_scales: jax.Array,    # [B] f32
    e_values: jax.Array,    # [N, d] i8
    e_scales: jax.Array,    # [N] f32
    valid: jax.Array,       # [N] bool
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Quantized cosine top-k: int8 matmul with i32 accumulation, rescaled."""
    acc = jax.lax.dot_general(
        q_values, e_values,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )  # [B, N] i32
    scores = acc.astype(jnp.float32) * q_scales[:, None] * e_scales[None, :]
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return top_scores, top_idx.astype(jnp.int32)


def quantized_search(
    queries: np.ndarray,
    e_values: jax.Array, e_scales: jax.Array, valid: jax.Array,
    k: int,
) -> tuple[np.ndarray, np.ndarray]:
    """Host entry: quantize queries, run the int8 kernel."""
    q_values, q_scales = quantize_rows(np.atleast_2d(queries))
    s, i = int8_topk(jnp.asarray(q_values), jnp.asarray(q_scales),
                     e_values, e_scales, valid, k)
    return np.asarray(s), np.asarray(i)


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:
        return False


def _l2n(q: jax.Array) -> jax.Array:
    q = q.astype(jnp.float32)
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


@functools.partial(jax.jit,
                   static_argnames=("k", "k1", "tile", "bits", "interpret"))
def _fused_two_stage(q, values, scales_col, valid, full_precision,
                     k: int, k1: int, tile: int, bits: int,
                     interpret: bool = False):
    """Normalize + quantize + scan + exact rescore in ONE XLA execution.

    Dispatch count is a first-order serving cost: through the axon relay
    each execution carries ~1-2 ms of fixed overhead, and the previous
    3-execution pipeline (quantize / scan / rescore) measured ~6.9 ms
    wall against a 3.4 ms device module (R2_TPU_RESULTS7 trace). One
    module also lets XLA overlap the query prep with the scan's first
    DMAs."""
    from lattice_tpu.ops.pallas_topk import (_exact_rescore,
                                             binned_topk_int4,
                                             binned_topk_int8)
    q = _l2n(q)
    qv, qs = quantize_rows_device(q)
    kern = binned_topk_int8 if bits == 8 else binned_topk_int4
    s1, c1 = kern(qv, qs, values, scales_col, valid, k1, tile=tile,
                  interpret=interpret)
    return _exact_rescore(q, full_precision, s1, c1, k)


@functools.partial(jax.jit,
                   static_argnames=("k", "k1", "tile", "bits", "interpret"))
def _fused_two_stage_scanned(q3, values, scales_col, valid, full_precision,
                             k: int, k1: int, tile: int, bits: int,
                             interpret: bool = False):
    """Bulk serving: `lax.scan` the fused search over [G, B, d] query
    chunks inside ONE XLA execution.

    Per-execution dispatch overhead (~3 ms through the axon relay,
    R2_TPU_RESULTS8: 5.5 ms wall against a 2.4 ms device module) is paid
    once for G batches instead of G times — the pattern for offline
    eval, bulk dedup, and any caller holding more queries than one
    batch. Returns ([G, B, k], [G, B, k])."""
    def body(_, qc):
        return None, _fused_two_stage(qc, values, scales_col, valid,
                                      full_precision, k=k, k1=k1, tile=tile,
                                      bits=bits, interpret=interpret)
    return jax.lax.scan(body, None, q3)[1]


@functools.partial(jax.jit, static_argnames=("k", "tile", "bits"))
def _fused_first(q, values, scales_col, valid, k: int, tile: int, bits: int):
    """Single-execution first-stage-only variant (no resident rows)."""
    from lattice_tpu.ops.pallas_topk import (binned_topk_int4,
                                             binned_topk_int8)
    qv, qs = quantize_rows_device(_l2n(q))
    kern = binned_topk_int8 if bits == 8 else binned_topk_int4
    s, i = kern(qv, qs, values, scales_col, valid, k, tile=tile)
    return s[:, :k], i[:, :k]


class QuantizedView:
    """Int8 shadow of an embedding matrix for fast first-stage scanning.

    Two-stage search: int8 scan selects `rescore_factor * k` candidates,
    then the full-precision rows rescore them (gather of k' rows — tiny).
    """

    def __init__(self, embeddings: np.ndarray | jax.Array):
        if isinstance(embeddings, jax.Array):
            self.values, self.scales = quantize_rows_device(embeddings)
        else:
            values, scales = quantize_rows(embeddings)
            self.values = jnp.asarray(values)
            self.scales = jnp.asarray(scales)
        self.n, self.d = self.values.shape
        # kernel-layout scales, converted ONCE: the per-call [N]->[N,1]
        # relayout measured ~3.4 ms at 1M — 1.5x the kernel itself
        # (R2_TPU_RESULTS6 trace decomposition)
        from lattice_tpu.ops.pallas_topk import scales_col
        self._scales_col = scales_col(self.scales)

    def memory_bytes(self) -> int:
        return self.values.size + self.scales.size * 4

    def update_rows(self, rows: jax.Array, idx: jax.Array) -> None:
        """O(delta) upsert: re-quantize just the changed rows on device
        (watch-mode mutations must not trigger a full re-quantization)."""
        v, s = quantize_rows_device(rows.astype(jnp.float32))
        self.values = self.values.at[idx].set(v)
        self.scales = self.scales.at[idx].set(s)
        from lattice_tpu.ops.pallas_topk import relayout_col
        self._scales_col = relayout_col(self._scales_col.at[idx, 0].set(s))

    def _first_stage(self, q_values: jax.Array, q_scales: jax.Array,
                     valid: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
        """Pallas fused int8 scan on TPU (XLA upcasts int8 dots and is ~100x
        slower there); XLA path elsewhere. The binned-max kernel serves
        (35.8k qps vs the insertion scan's 29.5k at 1M x 768 B=256,
        R2_TPU_RESULTS3); its output is sorted, so slicing to k is exact."""
        try:
            on_tpu = jax.devices()[0].platform.lower() in ("tpu", "axon")
        except Exception:
            on_tpu = False
        if on_tpu:
            from lattice_tpu.ops.pallas_topk import binned_topk_int8, pick_tile
            tile = pick_tile(self.n, q_values.shape[0], k=k)
            if tile is not None:
                s, i = binned_topk_int8(q_values, q_scales,
                                        self.values, self._scales_col,
                                        valid, k, tile=tile)
                return s[:, :k], i[:, :k]
        if valid.ndim == 2:          # kernel-layout mask; XLA wants [N] bool
            valid = valid.reshape(-1).astype(bool)
        return int8_topk(q_values, q_scales,
                         self.values, self.scales, valid, k)

    def search_device(self, queries: jax.Array, valid: jax.Array, k: int,
                      full_precision: jax.Array | None = None,
                      rescore_factor: int = 4
                      ) -> tuple[jax.Array, jax.Array]:
        """Device-resident two-stage search: no host sync anywhere.

        Query quantization runs jitted on-device and the result stays a
        jax.Array, so back-to-back calls pipeline (measured on v5e over
        the relay: the host-synchronous wrapper throttled to ~2.5k qps on
        readback stalls; this path sustains ~26k — int8 at bf16 parity).

        First-stage width is `max(k, 16)` capped by `rescore_factor * k`:
        16 keeps the tile-2048 fast path and measured recall@10 at 1M
        matches a 40-wide first stage exactly (0.9953, the storage
        ceiling).
        """
        from lattice_tpu.ops.pallas_topk import pick_tile
        k1 = min(max(k, 16), max(rescore_factor * k, k), self.n)
        if _on_tpu():
            tile = pick_tile(self.n, queries.shape[0], k=max(k1, 16))
            if tile is not None:
                if full_precision is None:
                    return _fused_first(queries, self.values,
                                        self._scales_col, valid, k=k,
                                        tile=tile, bits=8)
                return _fused_two_stage(queries, self.values,
                                        self._scales_col, valid,
                                        full_precision, k=k, k1=k1,
                                        tile=tile, bits=8)
        # fallback path must normalize too: callers (ChunkStore) now pass
        # RAW queries on every route, not just the fused one
        q = _l2n(queries)
        q_values, q_scales = quantize_rows_device(q)
        if full_precision is None:
            return self._first_stage(q_values, q_scales, valid, k)
        s1, cand = self._first_stage(q_values, q_scales, valid, k1)
        # masked rescore: first-stage -inf slots (fewer valid rows than k1)
        # carry garbage indices that must never be promoted
        from lattice_tpu.ops.pallas_topk import _exact_rescore
        return _exact_rescore(q, full_precision, s1, cand, k)

    def search(self, queries: np.ndarray, valid: jax.Array, k: int,
               full_precision: jax.Array | None = None,
               rescore_factor: int = 4) -> tuple[np.ndarray, np.ndarray]:
        """Host entry: numpy in/out around `search_device`."""
        s, i = self.search_device(
            jnp.asarray(np.atleast_2d(queries), dtype=jnp.float32),
            valid, k, full_precision, rescore_factor)
        return np.asarray(s), np.asarray(i)


# ---- int4 tier -------------------------------------------------------------
#
# 4x capacity vs bf16 at near-full scan speed: two int4 values pack per
# byte, the kernel unpacks nibbles with VPU shifts and feeds the int8 MXU.
# Columns are NOT interleaved: dims [0, d/2) live in low nibbles and
# [d/2, d) in high nibbles, so the in-kernel unpack is two shift passes +
# a lane concat (an interleave would force a Mosaic relayout). Dot
# products are permutation-invariant as long as the query is permuted the
# same way — and here the permutation is identity (lo block keeps its
# position, hi block keeps its). Queries stay int8 (asymmetric scoring:
# query error is shared across the whole ranking, so halving only the
# CORPUS bytes costs almost no recall — same argument as ADC in PQ).


def quantize_rows_int4(x: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Symmetric per-row int4, packed two-per-byte. Returns
    (packed [N, d/2] int8, scales [N] f32). d must be even."""
    x = np.asarray(x, dtype=np.float32)
    n, d = x.shape
    if d % 2:
        raise ValueError("int4 packing needs an even dim")
    amax = np.abs(x).max(axis=-1, keepdims=True)
    scales = (amax / 7.0).astype(np.float32)
    safe = np.maximum(scales, 1e-12)
    v = np.clip(np.rint(x / safe), -7, 7).astype(np.int32)
    lo = v[:, : d // 2]
    hi = v[:, d // 2:]
    # biased low nibble (lo+8 in [1, 15]): makes lo = (x & 0xF) - 8 a
    # LINEAR function of the raw byte, which the Pallas matmul-unpack
    # kernel exploits (pallas_topk._binned_kernel_int4_matmul)
    packed = ((hi << 4) | (lo + 8)).astype(np.int8)
    return packed, scales[:, 0]


def _quant4_block(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    x = x.astype(jnp.float32)
    d = x.shape[-1]
    amax = jnp.max(jnp.abs(x), axis=-1, keepdims=True)
    scales = amax / 7.0
    safe = jnp.maximum(scales, 1e-12)
    v = jnp.clip(jnp.round(x / safe), -7, 7).astype(jnp.int32)
    lo = v[:, : d // 2]
    hi = v[:, d // 2:]
    packed = ((hi << 4) | (lo + 8)).astype(jnp.int8)  # biased low nibble
    return packed, scales[:, 0]


@jax.jit
def quantize_rows_int4_device(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    return _blocked_rows(x, _quant4_block)


def unpack_int4(packed: jax.Array) -> jax.Array:
    """[N, d/2] packed -> [N, d] int8 (lo block then hi block)."""
    x = packed.astype(jnp.int32)
    lo = (x & 0xF) - 8                # biased low nibble
    hi = x >> 4                       # arithmetic shift sign-extends
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("k",))
def int4_dequant_rescore(q_norm: jax.Array, e_packed: jax.Array,
                         e_scales: jax.Array, s1: jax.Array,
                         cand: jax.Array, k: int
                         ) -> tuple[jax.Array, jax.Array]:
    """Capacity-tier second stage: rescore first-stage candidates from
    the PACKED rows themselves — no bf16 corpus resident, so the 4x-
    capacity HBM budget holds. The first stage quantizes the QUERY to
    int8 and selects through bin-max packed keys; dequantizing the
    winners and scoring them against the full-precision query recovers
    the ordering those two quantizations blurred (r2 width sweep at 1M:
    16-wide 0.888 -> 40-wide 0.9887 -> 80-wide 0.9996 recall@10).
    [B, k1, d] gather + einsum — microseconds next to the 4M scan."""
    rows = unpack_int4(e_packed[cand]).astype(jnp.float32)   # [B, k1, d]
    rows = rows * e_scales[cand][..., None]
    scores = jnp.einsum("bd,bkd->bk", q_norm.astype(jnp.float32), rows,
                        precision=jax.lax.Precision.HIGHEST)
    # padded/filtered first-stage slots carry NEG_INF with garbage ids —
    # never promote them
    scores = jnp.where(s1 > NEG_INF / 2, scores, NEG_INF)
    top, pos = jax.lax.top_k(scores, min(k, int(scores.shape[-1])))
    return top, jnp.take_along_axis(cand, pos, axis=-1)


def unpack_int4_oracle(packed: np.ndarray) -> np.ndarray:
    x = np.asarray(packed, dtype=np.int32)
    lo = (x & 0xF) - 8
    hi = x >> 4
    return np.concatenate([lo, hi], axis=-1).astype(np.int8)


@functools.partial(jax.jit, static_argnames=("k",))
def int4_topk(
    q_values: jax.Array,    # [B, d] i8
    q_scales: jax.Array,    # [B] f32
    e_packed: jax.Array,    # [N, d/2] i8
    e_scales: jax.Array,    # [N] f32
    valid: jax.Array,       # [N] bool
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """XLA fallback for non-TPU backends: unpack then int8-score.

    Materializes the [N, d] unpacked matrix, so it is for CPU tests and
    small corpora only — the Pallas kernel (pallas_topk.binned_topk_int4)
    never materializes it."""
    e_full = unpack_int4(e_packed)
    acc = jax.lax.dot_general(
        q_values, e_full,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    scores = acc.astype(jnp.float32) * q_scales[:, None] * e_scales[None, :]
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return top_scores, top_idx.astype(jnp.int32)


class Int4View:
    """Packed-int4 shadow of an embedding matrix: the 4x capacity tier.

    Sits between int8 (2x, near-lossless) and PQ (8x+, ADC-slow): 4M x 768
    rows fit one v5e chip UNDER the 1M-bf16 HBM budget (4M x 388 B =
    1.48 GiB vs 1.5 GiB) and the scan still rides the int8 MXU, unlike
    PQ's one-hot-traffic-bound ADC. Measured on v5e (R2_TPU_RESULTS5):
    4M x 768 B=256 k=10 serves at 11,036 qps / recall 0.9941 with a
    device rescore (0.9902 host-rescored, the true capacity mode) — PQ's
    ADC managed 187 qps on the same corpus at equal memory. At 1M:
    33.1k qps / 0.9887 two-stage (bf16 binned: 37.4k / 0.9973).
    Replaces the reference's memory ceiling story (Qdrant scalar
    quantization, /root/reference/src/lattice/embeddings/client.py) with
    an MXU-native layout.

    Two-stage search mirrors QuantizedView: int4 scan selects a widened
    candidate set, then optional full-precision rows rescore (when the
    deployment keeps them; the pure capacity tier rescores from the int4
    values themselves, which only fixes selection ties, not quant error).
    """

    def __init__(self, embeddings: np.ndarray | jax.Array):
        if isinstance(embeddings, jax.Array):
            self.values, self.scales = quantize_rows_int4_device(embeddings)
        else:
            values, scales = quantize_rows_int4(embeddings)
            self.values = jnp.asarray(values)
            self.scales = jnp.asarray(scales)
        self.n = self.values.shape[0]
        self.d = self.values.shape[1] * 2
        from lattice_tpu.ops.pallas_topk import scales_col
        self._scales_col = scales_col(self.scales)

    @classmethod
    def from_packed(cls, values: jax.Array, scales: jax.Array) -> "Int4View":
        """Adopt already-packed [N, d/2] int8 nibbles + [N] scales.

        The block-wise build path for corpora whose f32 form would not
        fit HBM (4M x 768 f32 is 12 GB): quantize 512k-row blocks with
        `quantize_rows_int4_device`, concatenate the packed outputs, and
        hand them here."""
        self = cls.__new__(cls)
        self.values = values
        self.scales = scales
        self.n = values.shape[0]
        self.d = values.shape[1] * 2
        from lattice_tpu.ops.pallas_topk import scales_col
        self._scales_col = scales_col(self.scales)
        return self

    def memory_bytes(self) -> int:
        return self.values.size + self.scales.size * 4

    def update_rows(self, rows: jax.Array, idx: jax.Array) -> None:
        """O(delta) upsert: re-quantize only the changed rows on device."""
        v, s = quantize_rows_int4_device(rows.astype(jnp.float32))
        self.values = self.values.at[idx].set(v)
        self.scales = self.scales.at[idx].set(s)
        from lattice_tpu.ops.pallas_topk import relayout_col
        self._scales_col = relayout_col(self._scales_col.at[idx, 0].set(s))

    def _first_stage(self, q_values: jax.Array, q_scales: jax.Array,
                     valid: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
        try:
            on_tpu = jax.devices()[0].platform.lower() in ("tpu", "axon")
        except Exception:
            on_tpu = False
        if on_tpu:
            from lattice_tpu.ops.pallas_topk import (binned_topk_int4,
                                                     pick_tile_packed)
            tile = pick_tile_packed(self.n, q_values.shape[0], k=k)
            if tile is not None:
                s, i = binned_topk_int4(q_values, q_scales,
                                        self.values, self._scales_col,
                                        valid, k, tile=tile)
                return s[:, :k], i[:, :k]
        if valid.ndim == 2:          # kernel-layout mask; XLA wants [N] bool
            valid = valid.reshape(-1).astype(bool)
        return int4_topk(q_values, q_scales,
                         self.values, self.scales, valid, k)

    def search_device(self, queries: jax.Array, valid: jax.Array, k: int,
                      full_precision: jax.Array | None = None,
                      rescore_factor: int = 8,
                      dequant_rescore: bool = False
                      ) -> tuple[jax.Array, jax.Array]:
        """Device-resident two-stage search (queries int8, corpus int4).

        `dequant_rescore=True` (capacity mode, no resident bf16): widen
        the first stage and rescore winners from the packed rows
        themselves (`int4_dequant_rescore`) — recovers the query-int8 +
        bin-max selection error at zero extra HBM residency. BENCH r5:
        capacity_4m_recall 0.72 first-stage-only at 4M/B=1024."""
        if _on_tpu():
            from lattice_tpu.ops.pallas_topk import pick_tile_packed
            k1w = min(max(rescore_factor * k, 32), self.n)
            first_only = full_precision is None and not dequant_rescore
            tile = pick_tile_packed(
                self.n, queries.shape[0],
                k=k if first_only else max(k1w, 16))
            if tile is not None:
                if first_only:
                    return _fused_first(queries, self.values,
                                        self._scales_col, valid, k=k,
                                        tile=tile, bits=4)
                if full_precision is None:
                    s1, cand = _fused_first(queries, self.values,
                                            self._scales_col, valid,
                                            k=k1w, tile=tile, bits=4)
                    return int4_dequant_rescore(
                        _l2n(queries), self.values, self.scales,
                        s1, cand, k)
                return _fused_two_stage(queries, self.values,
                                        self._scales_col, valid,
                                        full_precision, k=k, k1=k1w,
                                        tile=tile, bits=4)
        # fallback path must normalize too (callers pass RAW queries)
        q = _l2n(queries)
        q_values, q_scales = quantize_rows_device(q)
        if full_precision is None:
            if dequant_rescore:
                k1 = min(max(rescore_factor * k, 32), self.n)
                s1, cand = self._first_stage(q_values, q_scales, valid, k1)
                return int4_dequant_rescore(q, self.values, self.scales,
                                            s1, cand, k)
            return self._first_stage(q_values, q_scales, valid, k)
        # int4 quantization reorders more than int8 (step = amax/7 vs
        # amax/127), so the first stage widens to 8k (floor 32) where the
        # int8 view's 16 sufficed: measured on v5e at 1M x 768 (width
        # sweep, R2_TPU_RESULTS6): 16-wide rescores to 0.8805 recall@10,
        # 40-wide 0.9887, 80-wide 0.9996 (+0.1 ms), 160-wide 1.0000
        # (+1.8 ms) — 80 is the knee.
        k1 = min(max(rescore_factor * k, 32), self.n)
        s1, cand = self._first_stage(q_values, q_scales, valid, k1)
        from lattice_tpu.ops.pallas_topk import _exact_rescore
        return _exact_rescore(q, full_precision, s1, cand, k)

    def search(self, queries: np.ndarray, valid: jax.Array, k: int,
               full_precision: jax.Array | None = None,
               rescore_factor: int = 8) -> tuple[np.ndarray, np.ndarray]:
        s, i = self.search_device(
            jnp.asarray(np.atleast_2d(queries), dtype=jnp.float32),
            valid, k, full_precision, rescore_factor)
        return np.asarray(s), np.asarray(i)
