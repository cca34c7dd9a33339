"""Pallas fused score+select top-k kernel.

SURVEY §7 step 4: fuse the Q@E^T score matmul with top-k selection so the
[B, N] score matrix never round-trips to HBM. The XLA path
(`ops/topk.py`) materializes scores [B, N] (N x 4 bytes per query of HBM
write+read traffic before `lax.top_k`); at 1M rows that is ~8 MB per query
of pure overhead. This kernel streams the embedding matrix through VMEM
tile by tile and keeps a running [B, k] selection in VMEM scratch, so HBM
traffic is exactly one read of E plus the [B, k] result — the memory lower
bound for a flat scan.

Design (per the Pallas TPU guide):
- grid over row tiles of E; the TPU grid is sequential, so VMEM scratch
  carries the running top-k between iterations
- per tile: scores = Q @ tile^T on the MXU (bf16 in, f32 accumulate),
  invalid rows masked to -inf
- selection: concatenate running [B, k] with tile scores [B, T] and take
  k maxima by an unrolled argmax-and-mask loop (k is small and static; the
  VPU work is negligible next to the MXU tile)
- outputs written once, on the final tile

Correctness oracle: `ops/topk.topk_oracle`; tests run this kernel in
interpreter mode on CPU and compiled on TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Row-tile size: 1024 rows x 768 dims x 2B (bf16) = 1.5 MB per buffered
# tile, comfortably inside the ~16 MB VMEM budget alongside Q and scratch.
# Measured on v5e (131072x768, k=10): tile 1024 is fastest at B<=128 and
# tile 2048 at larger batches (`pick_tile`).
DEFAULT_TILE = 1024

# ---- packed-key selection ------------------------------------------------
#
# The selection loop is the kernel's bottleneck at scale (measured: ~8 ms of
# a 16 ms 1M-row scan at B=256 — the matmul is ~2 ms). A naive top-k
# iteration costs 4 full-width VPU passes (max, argmax, one-hot id extract,
# clear). Packing (quantized score, column id) into one monotonic int32 key
# collapses max+argmax+extract into a single reduction:
#
#   key = (bits(clip(score)+2.0) >> SHIFT) << SHIFT | col
#
# score+2 is positive, so its IEEE-754 bits are order-preserving as int32;
# truncating to the top (32-SHIFT) bits leaves ~11 mantissa bits of score
# resolution (~1e-3 — comparable to bf16's own rounding) and SHIFT bits for
# the column. Two passes per iteration: max(keys), then clear-by-equality.

_KEY_SHIFT = 12            # supports tile + k <= 4096 candidate columns
_MASKED_SCORE = -1.5       # masked entries sort below all real cosines


def _pack_keys_fast(scores, cols, shift: int = _KEY_SHIFT):
    """Branch-free pack for the binned kernels: no clip, no where.

    score+2 is a positive normal float for every real cosine, so its
    bits are order-preserving; NEG_INF-masked entries go NEGATIVE and
    two's-complement i32 ordering puts every negative below every
    positive — the mask is free. (The insertion kernel keeps the clipped
    variant because its unpacked kth-score comparisons need the masked
    sentinel at a known value.) `shift` is the column bit budget: 12
    covers tile <= 4096 at ~1e-3 score resolution; 13 covers 8192 at
    ~2e-3 (both below bf16 storage rounding, and the exact rescore
    recomputes winners anyway).
    """
    bits = jax.lax.bitcast_convert_type(scores + 2.0, jnp.int32)
    return (bits & ~((1 << shift) - 1)) | cols


def _pack_keys(scores, cols):
    clipped = jnp.clip(scores, -1.2, 1.2)
    clipped = jnp.where(scores <= NEG_INF / 2, _MASKED_SCORE, clipped)
    bits = jax.lax.bitcast_convert_type(clipped + 2.0, jnp.int32)
    return ((bits >> _KEY_SHIFT) << _KEY_SHIFT) | cols


def _unpack_score(keys, shift: int = _KEY_SHIFT):
    bits = (keys >> shift) << shift
    score = jax.lax.bitcast_convert_type(bits, jnp.float32) - 2.0
    return jnp.where(score < -1.3, NEG_INF, score)


def _unpack_col(keys, shift: int = _KEY_SHIFT):
    return keys & ((1 << shift) - 1)


def _tile_shift(tile: int) -> int:
    """Column bits needed for `tile` candidate positions."""
    return max((tile - 1).bit_length(), _KEY_SHIFT)


def _select_topk_insertion(scores, row_base, best_s_ref, best_i_ref, k):
    """Data-dependent merge: insert tile winners until none improves.

    The packed unrolled loop always pays k iterations per improving tile;
    after the first few tiles a typical tile contributes 0-2 of the global
    top-k, so a `while_loop` that stops when the tile max no longer beats
    the running k-th cuts expected selection work ~k/2x. Each iteration:
    one full-width clear + one full-width max (2 VPU passes), plus k-wide
    insertion bookkeeping.
    """
    b = scores.shape[0]
    cols = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    keys0 = _pack_keys(scores, cols)                        # [B, T]
    cur_max0 = jnp.max(keys0, axis=-1, keepdims=True)       # [B, 1]
    lane_k = jax.lax.broadcasted_iota(jnp.int32, (b, k), 1)

    def improving(cur_max, best_s):
        kth = jnp.min(best_s, axis=-1, keepdims=True)
        return _unpack_score(cur_max) > kth                 # [B, 1]

    # best arrays travel as loop VALUES: a ref read inside cond/body is
    # traced once against the pre-loop state (stale kth -> infinite loop).
    def cond(carry):
        _keys, cur_max, best_s, _best_i = carry
        return jnp.any(improving(cur_max, best_s))

    def body(carry):
        keys, cur_max, best_s, best_i = carry
        does = improving(cur_max, best_s)                   # [B, 1]
        slot = jnp.argmin(best_s, axis=-1).astype(jnp.int32)  # [B]
        hit_slot = (lane_k == slot[:, None]) & does
        new_score = _unpack_score(cur_max)
        new_id = row_base + _unpack_col(cur_max)
        best_s = jnp.where(hit_slot, new_score, best_s)
        best_i = jnp.where(hit_slot, new_id, best_i)
        keys = jnp.where((keys == cur_max) & does, jnp.int32(0), keys)
        cur_max = jnp.max(keys, axis=-1, keepdims=True)
        return keys, cur_max, best_s, best_i

    _, _, final_s, final_i = jax.lax.while_loop(
        cond, body, (keys0, cur_max0, best_s_ref[:], best_i_ref[:]))
    best_s_ref[:] = final_s
    best_i_ref[:] = final_i


# Scoped-VMEM budget for the [B, tile] score+key slabs (~8 bytes/cell);
# the 16 MB limit minus kernel overhead. Measured anchors: B=512 @ 2048
# = 11 MB total fits; B=1024 @ 2048 = 20.45 MB OOMs (R3 batch 7).
_SLAB_BUDGET = 12 * (1 << 20)


def _slabs_fit(batch: int, inner: int) -> bool:
    return 8 * max(batch, 32) * inner <= _SLAB_BUDGET


def pick_tile(capacity: int, batch: int, k: int = 10) -> int | None:
    """Largest measured-good tile that divides the store capacity.

    Large k (the int8 rescore first stage asks for rescore_factor*k)
    inflates the selection buffers; shrink the tile to stay inside the
    ~16 MB VMEM scoped limit (measured OOM: tile 2048, B=256, k=40).
    Very large batches inflate them too — the [B, tile] score + key
    slabs cost ~8*B*tile bytes, so B=1024 with tile 2048 asks for
    20.45 MB of scoped VMEM (measured OOM, R3 batch 7; B=512 at 2048
    serves 58.6k qps — batch amortizes the corpus read).
    """
    if batch >= 128 and k <= 16:
        preferred = (2048, 1024, 512)
    else:
        preferred = (1024, 512, 2048)
    for tile in preferred:
        if capacity % tile == 0 and _slabs_fit(batch, tile):
            return tile
    return None



def pick_tile_packed(capacity: int, batch: int, k: int = 10) -> int | None:
    """Tile preference for the packed-int4 kernel: rows are 4x smaller,
    so tile 4096 double-buffers in 3 MB and measured slightly faster than
    2048 at 1M/B=256 (33.1k vs 32.1k qps, R2_TPU_RESULTS5; the compute
    sub-tiles to [B, 2048] slabs either way). bf16/int8 still OOM scoped
    VMEM at 4096 — they keep `pick_tile`."""
    for tile in (4096, 2048, 1024, 512):
        # compute sub-tiles to <= 2048-wide slabs (`inner`); the VMEM
        # budget keys on that, not the DMA tile
        if capacity % tile == 0 and _slabs_fit(batch, min(tile, 2048)):
            return tile
    return None


def _topk_kernel(q_ref, e_ref, valid_ref, out_s_ref, out_i_ref,
                 best_s, best_i, *, k: int, tile: int, n_rows: int):
    j = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        best_s[:] = jnp.full_like(best_s, NEG_INF)
        best_i[:] = jnp.zeros_like(best_i)

    q = q_ref[:]                                  # [B, d]
    e_tile = e_ref[:]                             # [T, d]
    scores = jax.lax.dot_general(
        q.astype(e_tile.dtype), e_tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                             # [B, T]
    b = scores.shape[0]
    row_base = j * tile
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1) + row_base
    alive = valid_ref[:].reshape(1, tile) != 0
    in_range = col_ids < n_rows
    scores = jnp.where(alive & in_range, scores, NEG_INF)

    # Threshold skip: after the first few tiles the running k-th score
    # usually dominates a whole tile's max, so the (VPU-serial) selection
    # loop is predicated away and the tile costs only its MXU matmul.
    kth = jnp.min(best_s[:], axis=-1)                            # [B]
    tile_max = jnp.max(scores, axis=-1)                          # [B]
    any_improves = jnp.any(tile_max > kth)

    @pl.when(any_improves)
    def _merge():
        _select_topk_insertion(scores, row_base, best_s, best_i, k)

    @pl.when(j == n_tiles - 1)
    def _emit():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "interpret"))
def fused_topk(
    queries: jax.Array,      # [B, d] f32 (normalized)
    embeddings: jax.Array,   # [N, d] bf16/f32, N % tile == 0 (pad rows invalid)
    valid: jax.Array,        # [N] bool/int8
    k: int,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused flat-scan top-k. Returns (scores [B,k] f32, indices [B,k] i32)."""
    n, d = embeddings.shape
    b_in = queries.shape[0]
    # Mosaic needs >= one full sublane group of rows; pad tiny batches
    # (B=1 single-query serving) up to 8 and slice the outputs back.
    b = max(8, ((b_in + 7) // 8) * 8)
    if b != b_in:
        queries = jnp.concatenate(
            [queries, jnp.zeros((b - b_in, d), queries.dtype)], axis=0)
    assert n % tile == 0, f"N={n} must be a multiple of tile={tile}"
    n_tiles = n // tile
    valid_i8 = _as_valid_col(valid, n)

    kernel = functools.partial(_topk_kernel, k=k, tile=tile, n_rows=n)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * embeddings.dtype.itemsize + b * d * 4
            + 2 * b * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, embeddings, valid_i8)
    # insertion selection fills slots unordered; contract is sorted desc
    out_s, order = jax.lax.top_k(out_s, k)
    out_i = jnp.take_along_axis(out_i, order, axis=-1)
    return out_s[:b_in], out_i[:b_in]


def _topk_kernel_int8(q_ref, qs_ref, e_ref, es_ref, valid_ref,
                      out_s_ref, out_i_ref, best_s, best_i,
                      *, k: int, tile: int, n_rows: int):
    """Int8 variant: i8 x i8 -> i32 on the MXU, rescaled to f32 cosine."""
    j = pl.program_id(0)
    n_tiles = pl.num_programs(0)

    @pl.when(j == 0)
    def _init():
        best_s[:] = jnp.full_like(best_s, NEG_INF)
        best_i[:] = jnp.zeros_like(best_i)

    q = q_ref[:]                                  # [B, d] i8
    e_tile = e_ref[:]                             # [T, d] i8
    acc = jax.lax.dot_general(
        q, e_tile,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )                                             # [B, T] i32
    b = acc.shape[0]
    scores = acc.astype(jnp.float32) * qs_ref[:] * es_ref[:].reshape(1, tile)
    row_base = j * tile
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1) + row_base
    alive = valid_ref[:].reshape(1, tile) != 0
    in_range = col_ids < n_rows
    scores = jnp.where(alive & in_range, scores, NEG_INF)

    kth = jnp.min(best_s[:], axis=-1)
    tile_max = jnp.max(scores, axis=-1)
    any_improves = jnp.any(tile_max > kth)

    @pl.when(any_improves)
    def _merge():
        _select_topk_insertion(scores, row_base, best_s, best_i, k)

    @pl.when(j == n_tiles - 1)
    def _emit():
        out_s_ref[:] = best_s[:]
        out_i_ref[:] = best_i[:]


# Measured on v5e at 1M x 768, B=256, k=10: int8 runs at parity with bf16
# (~16 ms/batch) — the scan is SELECTION-bound, not bandwidth-bound: the
# k-iteration argmax merge costs ~k*B*N VPU element-visits (~8 ms) and
# dominates once the matmul drops below it. Round-2 lever: hierarchical
# in-tile selection (sub-block maxima first) or an early-exit while_loop
# merge, which would let the int8 path realize its 2x byte advantage.
@functools.partial(jax.jit, static_argnames=("k", "tile", "interpret"))
def fused_topk_int8(
    q_values: jax.Array,     # [B, d] i8
    q_scales: jax.Array,     # [B] f32
    e_values: jax.Array,     # [N, d] i8, N % tile == 0
    e_scales: jax.Array,     # [N] f32
    valid: jax.Array,        # [N] bool/int8
    k: int,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Quantized fused scan: half the HBM bytes of bf16, int8 MXU rate."""
    n, d = e_values.shape
    b_in = q_values.shape[0]
    b = max(32, ((b_in + 31) // 32) * 32)   # int8 sublane group is 32
    if b != b_in:
        q_values = jnp.concatenate(
            [q_values, jnp.zeros((b - b_in, d), q_values.dtype)], axis=0)
        q_scales = jnp.concatenate(
            [q_scales, jnp.zeros((b - b_in,), q_scales.dtype)], axis=0)
    assert n % tile == 0, f"N={n} must be a multiple of tile={tile}"
    n_tiles = n // tile
    valid_i8 = _as_valid_col(valid, n)
    q_scales_col = q_scales.reshape(b, 1)
    e_scales_col = e_scales.reshape(n, 1)

    kernel = functools.partial(_topk_kernel_int8, k=k, tile=tile, n_rows=n)
    out_s, out_i = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((b, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, k), lambda j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, k), jnp.float32),
            jax.ShapeDtypeStruct((b, k), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, k), jnp.float32),
            pltpu.VMEM((b, k), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d + b * d + 2 * b * k * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_values, q_scales_col, e_values, e_scales_col, valid_i8)
    out_s, order = jax.lax.top_k(out_s, k)
    out_i = jnp.take_along_axis(out_i, order, axis=-1)
    return out_s[:b_in], out_i[:b_in]


# ---- binned-max selection --------------------------------------------------
#
# The insertion kernel above is still selection-bound at scale: its
# while_loop serializes one winner per iteration and runs to the max
# improvement count over the whole batch (measured: ~2.6 ms of the 7.8 ms
# 1M/B=256 scan; the matmul+rowmax floor is 5.2 ms). The binned kernel
# removes the serial loop entirely, after the TPU-KNN recipe (Chern et al.
# 2022, "TPU-KNN: K Nearest Neighbor Search at Peak FLOP/s" — public
# method, reimplemented here): each tile reduces its [B, T] score slab to
# per-bin packed-key maxima with two static reductions, and a small XLA
# top_k over all (tile, bin) winners + exact rescore finishes selection
# outside the kernel.
#
# Bin assignment is STRIDED: bin(col) = col % 128 (one sublane-axis max
# over [B, T/128, 128] — the 128-lane layout's native reduction, and the
# only output block shape Mosaic accepts without relayout), so ADJACENT
# columns always land in different bins. That matters for this workload:
# a store lays chunks of one file in consecutive rows, and near-duplicate
# chunks of the hot file ARE the expected top-k — contiguous binning
# would keep one per window. With stride, any run of <= 128 adjacent rows
# survives intact; losses need two top-k rows exactly 128*i apart inside
# one tile (measured-rare; the recall tests pin it).

BINS = 128


def _binned_kernel(q_ref, e_ref, valid_ref, out_keys_ref,
                   *, tile: int, n_rows: int, inner: int, shift: int):
    """`inner` sub-tiles the COMPUTE, not the DMA: the BlockSpec still
    streams `tile` rows per grid step (fewer steps -> less per-step issue
    overhead, measured ~14 us/step on v5e), while the [B, inner] score/key
    slabs stay small enough for the 16 MB scoped-VMEM limit (tile 4096
    with full-width slabs at B=256 overflows by 664 KB —
    R2_TPU_RESULTS4). Sub-tile bin maxima merge with an elementwise max:
    sub-tile h's cols are offset by h*inner, and inner % 128 == 0 keeps
    col % 128 bin identity across sub-tiles."""
    q = q_ref[:]                                  # [B, d]
    maxes = None
    for h in range(tile // inner):
        e_half = e_ref[pl.ds(h * inner, inner), :]    # [inner, d]
        scores = jax.lax.dot_general(
            q.astype(e_half.dtype), e_half,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )                                         # [B, inner]
        b = scores.shape[0]
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (b, inner), 1) + h * inner
        alive = valid_ref[pl.ds(h * inner, inner), :].reshape(1, inner) != 0
        # no in-range test: wrappers assert n % tile == 0 and padding
        # rows are invalid, so the valid mask already covers the tail
        scores = jnp.where(alive, scores, NEG_INF)
        keys = _pack_keys_fast(scores, cols, shift)  # [B, inner] i32
        m = jnp.max(keys.reshape(b, inner // BINS, BINS), axis=1)  # [B, 128]
        maxes = m if maxes is None else jnp.maximum(maxes, m)
    out_keys_ref[:] = maxes


def _binned_kernel_int8(q_ref, qs_ref, e_ref, es_ref, valid_ref,
                        out_keys_ref, *, tile: int, n_rows: int, inner: int,
                        shift: int):
    q = q_ref[:]
    maxes = None
    for h in range(tile // inner):
        acc = jax.lax.dot_general(
            q, e_ref[pl.ds(h * inner, inner), :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                         # [B, inner] i32
        b = acc.shape[0]
        es_half = es_ref[pl.ds(h * inner, inner), :].reshape(1, inner)
        scores = acc.astype(jnp.float32) * qs_ref[:] * es_half
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (b, inner), 1) + h * inner
        alive = valid_ref[pl.ds(h * inner, inner), :].reshape(1, inner) != 0
        # no in-range test: wrappers assert n % tile == 0 and padding
        # rows are invalid, so the valid mask already covers the tail
        scores = jnp.where(alive, scores, NEG_INF)
        keys = _pack_keys_fast(scores, cols, shift)
        m = jnp.max(keys.reshape(b, inner // BINS, BINS), axis=1)
        maxes = m if maxes is None else jnp.maximum(maxes, m)
    out_keys_ref[:] = maxes


def _binned_kernel_int8_hoistq(q_ref, inv2_ref, e_ref, es_ref, valid_ref,
                               out_keys_ref, *, tile: int, n_rows: int,
                               inner: int, shift: int):
    """Int8 scan with the hoistq chain (see `_binned_kernel_int4_hoistq`).

    Same algebra: the per-row query scale is order-invariant so it
    hoists to the wrapper, the +2 positivity bias becomes 2/qs applied
    inside the fma, the where-mask stays (no bias slab). The int8 scan
    is closer to DMA-bound than int4 (2x the bytes), so the expected
    win is smaller — opt-in until measured on chip."""
    q = q_ref[:]
    inv2 = inv2_ref[:]                                # [B, 1] f32: 2/qs
    maxes = None
    for h in range(tile // inner):
        acc = jax.lax.dot_general(
            q, e_ref[pl.ds(h * inner, inner), :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32,
        )                                             # [B, inner] i32
        b = acc.shape[0]
        es_half = es_ref[pl.ds(h * inner, inner), :].reshape(1, inner)
        scores = acc.astype(jnp.float32) * es_half + inv2
        alive = valid_ref[pl.ds(h * inner, inner), :].reshape(1, inner) != 0
        scores = jnp.where(alive, scores, NEG_INF)
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (b, inner), 1) + h * inner
        bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
        keys = (bits & ~((1 << shift) - 1)) | cols
        m = jnp.max(keys.reshape(b, inner // BINS, BINS), axis=1)
        maxes = m if maxes is None else jnp.maximum(maxes, m)
    out_keys_ref[:] = maxes


def _binned_candidates(keys_all: jax.Array, k1: int, tile: int,
                       shift: int = _KEY_SHIFT
                       ) -> tuple[jax.Array, jax.Array]:
    """Finish: top-k1 over all (tile, bin) winner keys.

    `lax.top_k` over the [B, n_tiles*128] key table lowers to a FULL SORT
    on TPU — measured 80 ms/batch at 1M rows (xprof, R2_TPU_RESULTS2),
    10x the kernel itself. `approx_max_k` lowers to the TPU PartialReduce
    unit instead. It wants floats: packed keys are non-negative i32
    (masked entries pack negative and sort below), and non-negative IEEE
    bit patterns order identically as i32 and as f32, so a bitcast is
    order-exact — then recall_target only governs PartialReduce's own
    candidate retention (rescore absorbs the slack).
    """
    keys_f = jax.lax.bitcast_convert_type(keys_all, jnp.float32)
    vals, pos = jax.lax.approx_max_k(keys_f, k1, recall_target=0.99)
    top_keys = jax.lax.bitcast_convert_type(vals, jnp.int32)
    ids = (pos // BINS) * tile + _unpack_col(top_keys, shift)
    return _unpack_score(top_keys, shift), ids.astype(jnp.int32)


def _pick_inner(tile: int, inner: int | None) -> int:
    """Compute-slab width: full-width up to 2048 (measured-good), sub-
    tiled above it (scoped VMEM holds [B, inner] slabs, not [B, tile])."""
    inner = inner or min(tile, 2048)
    assert tile % inner == 0 and inner % BINS == 0, (tile, inner)
    assert tile <= 16384, f"tile {tile}: col bits would eat score resolution"
    return inner


def _as_valid_col(valid: jax.Array, n: int) -> jax.Array:
    """Normalize validity to the kernel's [N, 1] int8 block form.

    Callers that hold a persistent corpus should pass it PRE-SHAPED
    (`valid_col` below): the xprof decomposition (R2_TPU_RESULTS6)
    showed the in-jit `[N] bool -> [N,1] i8` relayout costs ~0.65 ms
    per call at 1M rows — a quarter of the kernel itself — because XLA
    must re-run the layout conversion every call."""
    if valid.ndim == 2 and valid.dtype == jnp.int8:
        return valid
    return valid.astype(jnp.int8).reshape(n, 1)


def _as_scales_col(scales: jax.Array, n: int) -> jax.Array:
    """Normalize per-row scales to [N, 1]. Pre-shape persistent scales:
    the [N] -> [N,1] relayout measured ~3.4 ms/call at 1M (four sliced
    DMA passes, R2_TPU_RESULTS6) — 1.5x the kernel's own runtime."""
    if scales.ndim == 2:
        return scales
    return scales.reshape(n, 1)


_COL_FNS: dict = {}


def _col_fns():
    """Jitted [N]->[N,1] converters with a FORCED row-major output layout.

    XLA's natural layout for a reshape-to-column is {0,1:T(1,128)}, but
    the Pallas custom-call constrains operands to row-major {1,0:T(8,128)}
    — so a merely pre-shaped array gets a fresh conversion copy at the
    call boundary EVERY search (the copies the R2_TPU_RESULTS6/7 traces
    show surviving the first hoist attempt: 0.8 ms f32 + 0.3 ms i8 per
    call at 1M, 4x that at 4M). Forcing major_to_minor=(0,1) at
    conversion time makes the stored array bit-compatible with the
    kernel's demand, deleting the per-call copy."""
    dev = jax.devices()[0]
    fns = _COL_FNS.get(dev)
    if fns is None:
        from jax.experimental.layout import Format, Layout
        from jax.sharding import SingleDeviceSharding
        fmt = Format(Layout((0, 1)), SingleDeviceSharding(dev))
        to_i8 = jax.jit(lambda v: v.astype(jnp.int8).reshape(v.shape[0], 1),
                        out_shardings=fmt)
        to_f32 = jax.jit(
            lambda s: s.astype(jnp.float32).reshape(s.shape[0], 1),
            out_shardings=fmt)
        relayout_i8 = jax.jit(lambda x: x + jnp.int8(0), out_shardings=fmt)
        relayout_f32 = jax.jit(lambda x: x + 0.0, out_shardings=fmt)
        fns = _COL_FNS[dev] = (to_i8, to_f32, relayout_i8, relayout_f32)
    return fns


def valid_col(valid: jax.Array) -> jax.Array:
    """One-time conversion of a [N] validity mask to kernel block form."""
    return _col_fns()[0](valid)


def scales_col(scales: jax.Array) -> jax.Array:
    """One-time conversion of [N] per-row scales to kernel block form."""
    return _col_fns()[1](scales)


def relayout_col(col: jax.Array) -> jax.Array:
    """Restore the kernel layout after an `.at[].set` update (scatter
    outputs revert to XLA's preferred layout)."""
    return _col_fns()[2 if col.dtype == jnp.int8 else 3](col)


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "inner", "normalize",
                                    "interpret"))
def binned_topk(
    queries: jax.Array,      # [B, d] f32 (normalized, or normalize=True)
    embeddings: jax.Array,   # [N, d] bf16/f32, N % tile == 0
    valid: jax.Array,        # [N] bool/int8
    k: int,
    tile: int = DEFAULT_TILE,
    inner: int | None = None,
    normalize: bool = False,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Binned-max scan + exact rescore. Returns (scores [B,k], ids [B,k]).

    Selection cost per tile is two static reductions — no serial loop —
    so the scan runs at the matmul+reduction floor regardless of k
    (k <= BINS * n_tiles). Candidates widen to max(k, 16) and rescore at
    f32/HIGHEST exactly as refined_topk."""
    n, d = embeddings.shape
    if normalize:
        # fold query prep into this execution: through the axon relay
        # every separate dispatch costs ~1-2 ms fixed (R2_TPU_RESULTS7)
        queries = queries.astype(jnp.float32)
        queries = queries / jnp.maximum(
            jnp.linalg.norm(queries, axis=-1, keepdims=True), 1e-12)
    b_in = queries.shape[0]
    b = max(8, ((b_in + 7) // 8) * 8)
    if b != b_in:
        queries = jnp.concatenate(
            [queries, jnp.zeros((b - b_in, d), queries.dtype)], axis=0)
    assert n % tile == 0, f"N={n} must be a multiple of tile={tile}"
    assert tile % 128 == 0 and 128 % BINS == 0
    n_tiles = n // tile
    valid_i8 = _as_valid_col(valid, n)
    kernel = functools.partial(_binned_kernel, tile=tile, n_rows=n,
                               inner=_pick_inner(tile, inner),
                               shift=_tile_shift(tile))
    keys_all = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, BINS), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * BINS), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d * embeddings.dtype.itemsize + b * d * 4
            + b * n_tiles * BINS * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(queries, embeddings, valid_i8)
    k1 = min(max(k, 16), n_tiles * BINS)
    s1, c1 = _binned_candidates(keys_all, k1, tile, _tile_shift(tile))
    out_s, out_i = _exact_rescore(queries, embeddings, s1, c1,
                                  min(k, k1))
    if k > k1:  # corpus smaller than k: pad the contract shape
        padw = k - k1
        out_s = jnp.concatenate(
            [out_s, jnp.full((b, padw), NEG_INF, jnp.float32)], axis=-1)
        out_i = jnp.concatenate(
            [out_i, jnp.full((b, padw), -1, jnp.int32)], axis=-1)
    return out_s[:b_in], out_i[:b_in]


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "normalize", "interpret"))
def binned_topk_scanned(
    q3: jax.Array,           # [G, B, d] query chunks
    embeddings: jax.Array,   # [N, d] bf16/f32
    valid: jax.Array,
    k: int,
    tile: int = DEFAULT_TILE,
    normalize: bool = True,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Bulk serving: scan the binned scan over G query chunks in ONE XLA
    execution — per-execution dispatch (~3 ms over the axon relay,
    R2_TPU_RESULTS8) is paid once for all G batches. Returns
    ([G, B, k], [G, B, k])."""
    def body(_, qc):
        return None, binned_topk(qc, embeddings, valid, k, tile=tile,
                                 normalize=normalize, interpret=interpret)
    return jax.lax.scan(body, None, q3)[1]


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "inner", "interpret",
                                    "selection"))
def binned_topk_int8(
    q_values: jax.Array,     # [B, d] i8
    q_scales: jax.Array,     # [B] f32
    e_values: jax.Array,     # [N, d] i8, N % tile == 0
    e_scales: jax.Array,     # [N] f32
    valid: jax.Array,        # [N] bool/int8
    k: int,
    tile: int = DEFAULT_TILE,
    inner: int | None = None,
    interpret: bool = False,
    selection: str = "mul",
) -> tuple[jax.Array, jax.Array]:
    """Int8 binned-max scan; rescore happens in the caller (the int8 view
    holds no full-precision rows — QuantizedView passes them separately).
    Returns widened (scores [B,k1], ids [B,k1]) with k1 = max(k, 16).
    `selection="hoistq"` swaps in the hoisted-scale chain
    (`_binned_kernel_int8_hoistq`) — opt-in until measured on chip (the
    int8 scan is closer to DMA-bound than int4's, where the same chain
    won by ~2-5%, R4_TPU_RESULTS6)."""
    n, d = e_values.shape
    b_in = q_values.shape[0]
    b = max(32, ((b_in + 31) // 32) * 32)
    if b != b_in:
        q_values = jnp.concatenate(
            [q_values, jnp.zeros((b - b_in, d), q_values.dtype)], axis=0)
        q_scales = jnp.concatenate(
            [q_scales, jnp.zeros((b - b_in,), q_scales.dtype)], axis=0)
    assert n % tile == 0, f"N={n} must be a multiple of tile={tile}"
    n_tiles = n // tile
    valid_i8 = _as_valid_col(valid, n)
    use_hoistq = selection == "hoistq"
    if use_hoistq:
        body = _binned_kernel_int8_hoistq
        qs_safe = jnp.where(q_scales > 0, q_scales, 1.0)
        q_col = (2.0 / qs_safe).reshape(b, 1).astype(jnp.float32)
    else:
        body = _binned_kernel_int8
        q_col = q_scales.reshape(b, 1)
    kernel = functools.partial(body, tile=tile, n_rows=n,
                               inner=_pick_inner(tile, inner),
                               shift=_tile_shift(tile))
    keys_all = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, d), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, BINS), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * BINS), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * d + b * d + b * n_tiles * BINS * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_values, q_col, e_values,
      _as_scales_col(e_scales, n), valid_i8)
    k1 = min(max(k, 16), n_tiles * BINS)
    s1, c1 = _binned_candidates(keys_all, k1, tile, _tile_shift(tile))
    if use_hoistq:
        qs_b = qs_safe.reshape(b, 1)
        s1 = jnp.where(s1 > NEG_INF / 2, (s1 + 2.0) * qs_b - 2.0, NEG_INF)
    return s1[:b_in], c1[:b_in]


def _binned_kernel_int4_matmul(q_ref, qs_ref, e_ref, es_ref, valid_ref,
                               out_keys_ref, *, tile: int, n_rows: int,
                               inner: int, shift: int):
    """Packed-int4 scan with the unpack folded into the MXU.

    The original kernel sign-extends both nibble planes on the VPU (an
    int32 widen + 4 bitops per element) — measured compute-bound at
    ~7.8 us/tile while its DMA is only half of int8's (R2/R3 pipelined:
    int4 62.8k qps vs int8 80k despite half the bytes). Identity used
    here: with x the raw packed byte, ulo = x & 0xF (in [0, 15]) and
    hi = (x - ulo) / 16 exactly, so

        q_lo.lo + q_hi.hi = q_lo.ulo - 8*sum(q_lo)
                            + (q_hi.x - q_hi.ulo) / 16

    i.e. ONE int8 AND plus three half-width int8 matmuls on raw bytes —
    and the two dots against `ulo` fuse into a single [2B, dh] matmul.
    All integer math is exact (x - ulo is a multiple of 16, so the >> 4
    is exact division even for negatives)."""
    q = q_ref[:]                                      # [B, d] i8
    dims = (((1,), (1,)), ((), ()))
    b = q.shape[0]
    dh = q.shape[1] // 2
    q_lo = q[:, :dh]
    q_hi = q[:, dh:]
    q_cat = jnp.concatenate([q_lo, q_hi], axis=0)     # [2B, dh] i8
    sum_qlo = jnp.sum(q_lo.astype(jnp.int32), axis=1, keepdims=True)
    maxes = None
    for h in range(tile // inner):
        x = e_ref[pl.ds(h * inner, inner), :]         # [inner, dh] i8 raw
        ulo = x & 0xF                                 # i8, values 0..15
        m_cat = jax.lax.dot_general(q_cat, ulo, dimension_numbers=dims,
                                    preferred_element_type=jnp.int32)
        m1 = m_cat[:b]                                # q_lo . ulo
        m3 = m_cat[b:]                                # q_hi . ulo
        m2 = jax.lax.dot_general(q_hi, x, dimension_numbers=dims,
                                 preferred_element_type=jnp.int32)
        acc = m1 - 8 * sum_qlo + ((m2 - m3) >> 4)
        es_half = es_ref[pl.ds(h * inner, inner), :].reshape(1, inner)
        scores = acc.astype(jnp.float32) * qs_ref[:] * es_half
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (b, inner), 1) + h * inner
        alive = valid_ref[pl.ds(h * inner, inner), :].reshape(1, inner) != 0
        scores = jnp.where(alive, scores, NEG_INF)
        keys = _pack_keys_fast(scores, cols, shift)
        m = jnp.max(keys.reshape(b, inner // BINS, BINS), axis=1)
        maxes = m if maxes is None else jnp.maximum(maxes, m)
    out_keys_ref[:] = maxes


def _binned_kernel_int4_fma(q_ref, inv2_ref, e_ref, es_ref, neg_ref,
                            out_keys_ref, *, tile: int, n_rows: int,
                            inner: int, shift: int):
    """Int4 scan with the selection chain cut from ~9 to ~6 VPU ops.

    The measured 1M/B=256 floor (6.2 ms, R3_TPU_RESULTS6) is the
    per-element pack-keys/bin-max pass over [B, inner], not the unpack or
    the DMA. Three algebraic moves shrink it:

      * the query scale qs is positive and constant per row, so it
        cannot change within-row ordering — hoisted out of the kernel
        entirely (the wrapper restores true stage scores on the [B, k1]
        winners);
      * the +2.0 positivity bias becomes per-row 2/qs, so the packed
        float is (true_score + 2) / qs — still positive for every real
        cosine (> -2), and float truncation resolution becomes
        RELATIVE (~5e-4 at winning scores vs the absolute 1e-3 of the
        +2.0 scheme);
      * the validity mask folds into an additive per-column term
        (0 valid / -1e9 invalid), replacing the compare+select pair.

    Chain: astype f32 -> bias add -> fma(es) -> bitcast -> and -> or.
    """
    q = q_ref[:]                                      # [B, d] i8
    dims = (((1,), (1,)), ((), ()))
    inv2 = inv2_ref[:]                                # [B, 1] f32: 2/qs
    maxes = None
    for h in range(tile // inner):
        x = e_ref[pl.ds(h * inner, inner), :].astype(jnp.int32)
        lo = ((x & 0xF) - 8).astype(jnp.int8)         # biased low nibble
        hi = (x >> 4).astype(jnp.int8)                # dims [d/2, d)
        dh = x.shape[1]
        acc = jax.lax.dot_general(q[:, :dh], lo, dimension_numbers=dims,
                                  preferred_element_type=jnp.int32)
        acc = acc + jax.lax.dot_general(q[:, dh:], hi,
                                        dimension_numbers=dims,
                                        preferred_element_type=jnp.int32)
        b = acc.shape[0]
        es_half = es_ref[pl.ds(h * inner, inner), :].reshape(1, inner)
        neg_half = neg_ref[pl.ds(h * inner, inner), :].reshape(1, inner)
        bias = inv2 + neg_half                        # [B, inner]
        scores = acc.astype(jnp.float32) * es_half + bias
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (b, inner), 1) + h * inner
        bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
        keys = (bits & ~((1 << shift) - 1)) | cols
        m = jnp.max(keys.reshape(b, inner // BINS, BINS), axis=1)
        maxes = m if maxes is None else jnp.maximum(maxes, m)
    out_keys_ref[:] = maxes


def _binned_kernel_int4_hoistq(q_ref, inv2_ref, e_ref, es_ref, valid_ref,
                               out_keys_ref, *, tile: int, n_rows: int,
                               inner: int, shift: int):
    """Hoisted-query-scale chain at the mul chain's VMEM footprint.

    The fma chain's two losses are repaired separately here: keep its
    hoisted qs + bias-inside-the-fma (astype/fma/where/bitcast/and/or =
    6 VPU ops vs mul's 8) but keep mul's WHERE-mask — the additive
    mask column is what forced fma to pre-materialize an extra
    [B, inner] bias slab (`inv2 + neg_half`) and pushed tile 4096 over
    scoped VMEM, stranding it in the DMA-issue-bound tile-2048 regime
    (6.5-7.6 ms vs mul@4096's 5.3-5.5, R4 batch 3). Packed float is
    (true + 2) / qs: positive for every real cosine and row-monotonic
    (qs > 0 per query row); the wrapper restores true winner scores.
    `_pack_keys_fast`'s +2.0 is NOT applied — the bias is already in.
    """
    q = q_ref[:]                                      # [B, d] i8
    dims = (((1,), (1,)), ((), ()))
    inv2 = inv2_ref[:]                                # [B, 1] f32: 2/qs
    maxes = None
    for h in range(tile // inner):
        x = e_ref[pl.ds(h * inner, inner), :].astype(jnp.int32)
        lo = ((x & 0xF) - 8).astype(jnp.int8)         # biased low nibble
        hi = (x >> 4).astype(jnp.int8)                # dims [d/2, d)
        dh = x.shape[1]
        acc = jax.lax.dot_general(q[:, :dh], lo, dimension_numbers=dims,
                                  preferred_element_type=jnp.int32)
        acc = acc + jax.lax.dot_general(q[:, dh:], hi,
                                        dimension_numbers=dims,
                                        preferred_element_type=jnp.int32)
        b = acc.shape[0]
        es_half = es_ref[pl.ds(h * inner, inner), :].reshape(1, inner)
        scores = acc.astype(jnp.float32) * es_half + inv2
        alive = valid_ref[pl.ds(h * inner, inner), :].reshape(1, inner) != 0
        scores = jnp.where(alive, scores, NEG_INF)
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (b, inner), 1) + h * inner
        bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
        keys = (bits & ~((1 << shift) - 1)) | cols
        m = jnp.max(keys.reshape(b, inner // BINS, BINS), axis=1)
        maxes = m if maxes is None else jnp.maximum(maxes, m)
    out_keys_ref[:] = maxes


def _binned_kernel_int4(q_ref, qs_ref, e_ref, es_ref, valid_ref,
                        out_keys_ref, *, tile: int, n_rows: int, inner: int,
                        shift: int):
    """Packed-int4 corpus scan: nibbles unpack on the VPU, dots on the MXU.

    `e_ref` is [T, d/2] with dims [0, d/2) in low nibbles and [d/2, d)
    in high nibbles (ops/quant.quantize_rows_int4). The kernel never
    materializes the [T, d] row: it sign-extends each nibble plane and
    runs TWO half-width int8 matmuls against the matching query halves —
    sum of partial dots == full dot, and no lane concat/relayout is ever
    asked of Mosaic."""
    q = q_ref[:]                                      # [B, d] i8
    dims = (((1,), (1,)), ((), ()))
    maxes = None
    for h in range(tile // inner):
        x = e_ref[pl.ds(h * inner, inner), :].astype(jnp.int32)
        lo = ((x & 0xF) - 8).astype(jnp.int8)         # biased low nibble
        hi = (x >> 4).astype(jnp.int8)                # dims [d/2, d)
        dh = x.shape[1]
        acc = jax.lax.dot_general(q[:, :dh], lo, dimension_numbers=dims,
                                  preferred_element_type=jnp.int32)
        acc = acc + jax.lax.dot_general(q[:, dh:], hi,
                                        dimension_numbers=dims,
                                        preferred_element_type=jnp.int32)
        b = acc.shape[0]
        es_half = es_ref[pl.ds(h * inner, inner), :].reshape(1, inner)
        scores = acc.astype(jnp.float32) * qs_ref[:] * es_half
        cols = jax.lax.broadcasted_iota(
            jnp.int32, (b, inner), 1) + h * inner
        alive = valid_ref[pl.ds(h * inner, inner), :].reshape(1, inner) != 0
        # no in-range test: wrappers assert n % tile == 0 and padding
        # rows are invalid, so the valid mask already covers the tail
        scores = jnp.where(alive, scores, NEG_INF)
        keys = _pack_keys_fast(scores, cols, shift)
        m = jnp.max(keys.reshape(b, inner // BINS, BINS), axis=1)
        maxes = m if maxes is None else jnp.maximum(maxes, m)
    out_keys_ref[:] = maxes


@functools.partial(jax.jit,
                   static_argnames=("k", "tile", "inner", "interpret",
                                    "unpack", "selection"))
def binned_topk_int4(
    q_values: jax.Array,     # [B, d] i8 (queries stay int8 — asymmetric)
    q_scales: jax.Array,     # [B] f32
    e_packed: jax.Array,     # [N, d/2] i8, two int4 per byte, N % tile == 0
    e_scales: jax.Array,     # [N] f32
    valid: jax.Array,        # [N] bool/int8
    k: int,
    tile: int = DEFAULT_TILE,
    inner: int | None = None,
    interpret: bool = False,
    unpack: str = "vpu",
    selection: str = "hoistq",
) -> tuple[jax.Array, jax.Array]:
    """Int4-corpus binned-max scan: 4x capacity vs bf16 at ~int8 speed.

    Returns widened (scores [B,k1], ids [B,k1]) with k1 = max(k, 16);
    rescore happens in the caller (Int4View). `unpack` picks the nibble
    strategy: "vpu" (default) sign-extends the planes on the VPU;
    "matmul" folds the extension into a third MXU dot via the
    biased-nibble identity (`_binned_kernel_int4_matmul`) — measured
    A/B on v5e at 1M x 768 B=256: 6.22 vs 6.75 ms/call (R3_TPU_RESULTS6,
    winners identical), i.e. the extra half-width matmul costs more than
    the VPU unpack it removes, so the kernel is NOT unpack-bound.
    `selection` picks the pack-keys chain:
      * "hoistq" (default): fma's hoisted per-row query scale +
        bias-inside-the-fma at mul's VMEM footprint (where-mask, no
        [B, inner] bias slab) — measured v5e 1M x 768 B=256 k=16:
        4.42 vs mul's 4.51 ms at tile 2048 (4.56 vs 4.68 at 4096);
        4M: 12.51 vs 13.08 ms (R4_TPU_RESULTS6, winner agreement
        0.987 = packed-truncation near-ties, exact parity pinned in
        tests/test_pallas_ivf.py);
      * "mul" is the original 8-op chain;
      * "fma" is the additive-mask variant — measured a LOSS (R4
        batch 3): its extra bias slab pushes tile 4096 over the
        scoped-VMEM stack at every inner (16.2M vs the 16.0M limit),
        and at tile 2048 the kernel is DMA-issue-bound (6.5-7.6 ms).
        Kept for A/B evidence."""
    n, dh = e_packed.shape
    d = dh * 2
    assert q_values.shape[1] == d, (q_values.shape, d)
    b_in = q_values.shape[0]
    b = max(32, ((b_in + 31) // 32) * 32)
    if b != b_in:
        q_values = jnp.concatenate(
            [q_values, jnp.zeros((b - b_in, d), q_values.dtype)], axis=0)
        q_scales = jnp.concatenate(
            [q_scales, jnp.zeros((b - b_in,), q_scales.dtype)], axis=0)
    assert n % tile == 0, f"N={n} must be a multiple of tile={tile}"
    n_tiles = n // tile
    valid_i8 = _as_valid_col(valid, n)
    use_fma = selection == "fma" and unpack == "vpu"
    use_hoistq = selection == "hoistq" and unpack == "vpu"
    if use_hoistq:
        # hoisted scale + in-fma bias, mul's where-mask and VMEM shape:
        # compiles at tile 4096 (the selection-bound regime) unlike fma
        body = _binned_kernel_int4_hoistq
        qs_safe = jnp.where(q_scales > 0, q_scales, 1.0)
        q_col = (2.0 / qs_safe).reshape(b, 1).astype(jnp.float32)
        mask_col = valid_i8
    elif use_fma:
        body = _binned_kernel_int4_fma
        # the fma chain carries one extra [B, inner] f32 slab (the
        # broadcast bias); at inner=2048/B=256 that overflows the 16 MB
        # scoped-VMEM stack by ~0.9 MB and inner=1024 still by ~0.4 MB
        # (Mosaic's scoped accounting is not purely slab-proportional —
        # r4 batches 1/2) — 512 compiles with margin
        if inner is None:
            inner = min(tile, 512)
        # hoisted-scale form: per-row bias 2/qs (padded rows -> 1.0) and
        # the validity mask as an additive column (0 / -1e9)
        qs_safe = jnp.where(q_scales > 0, q_scales, 1.0)
        q_col = (2.0 / qs_safe).reshape(b, 1).astype(jnp.float32)
        mask_col = jnp.where(valid_i8 != 0, 0.0, -1e9).astype(jnp.float32)
    else:
        body = (_binned_kernel_int4_matmul if unpack == "matmul"
                else _binned_kernel_int4)
        q_col = q_scales.reshape(b, 1)
        mask_col = valid_i8
    kernel = functools.partial(body, tile=tile, n_rows=n,
                               inner=_pick_inner(tile, inner),
                               shift=_tile_shift(tile))
    keys_all = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((b, d), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((b, 1), lambda j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, dh), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile, 1), lambda j: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((b, BINS), lambda j: (0, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, n_tiles * BINS), jnp.int32),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * n * d,
            bytes_accessed=n * dh + b * d + b * n_tiles * BINS * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_values, q_col, e_packed,
      _as_scales_col(e_scales, n), mask_col)
    k1 = min(max(k, 16), n_tiles * BINS)
    s1, c1 = _binned_candidates(keys_all, k1, tile, _tile_shift(tile))
    if use_fma or use_hoistq:
        # keys packed (true + 2)/qs; _unpack_score subtracted 2.0, so the
        # true stage score is (u + 2) * qs - 2 per row
        qs_b = qs_safe.reshape(b, 1)
        s1 = jnp.where(s1 > NEG_INF / 2, (s1 + 2.0) * qs_b - 2.0, NEG_INF)
    return s1[:b_in], c1[:b_in]


@functools.partial(jax.jit, static_argnames=("k",))
def _exact_rescore(queries: jax.Array, embeddings: jax.Array,
                   stage_scores: jax.Array, candidates: jax.Array,
                   k: int) -> tuple[jax.Array, jax.Array]:
    """f32 rescore of first-stage candidates; padded slots stay -inf.

    Padded/filtered first-stage slots carry NEG_INF scores with
    meaningless indices — mask by stage score before re-ranking so a
    garbage candidate can never be promoted.
    """
    rows = embeddings[candidates].astype(jnp.float32)   # [B, k1, d]
    scores = jnp.einsum("bd,bkd->bk", queries.astype(jnp.float32), rows,
                        precision=jax.lax.Precision.HIGHEST)
    scores = jnp.where(stage_scores > NEG_INF / 2, scores, NEG_INF)
    top_scores, pos = jax.lax.top_k(scores, min(k, scores.shape[-1]))
    top_idx = jnp.take_along_axis(candidates, pos, axis=-1)
    return top_scores, top_idx


def refined_topk(
    queries: jax.Array,
    embeddings: jax.Array,
    valid: jax.Array,
    k: int,
    widen: int = 16,
    tile: int = DEFAULT_TILE,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused scan widened to `max(k, widen)` candidates + exact f32 rescore.

    The packed-key selection quantizes scores to ~1e-3, which costs ~2pp
    recall@10 at 1M rows: near-ties at the k-th place resolve by column id
    instead of true score. Selecting a wider candidate set and re-scoring
    those rows at f32/HIGHEST (a [B, k1, d] gather — microseconds next to
    the scan) recovers the ordering the quantization blurred. `widen=16`
    keeps `pick_tile`'s k<=16 fast path valid.
    """
    k1 = min(max(k, widen), embeddings.shape[0])
    s1, i1 = fused_topk(queries, embeddings, valid, k1, tile=tile,
                        interpret=interpret)
    if k1 <= k:
        return s1, i1
    return _exact_rescore(queries, embeddings, s1, i1, k)


def pad_for_tile(embeddings: np.ndarray, valid: np.ndarray,
                 tile: int = DEFAULT_TILE) -> tuple[np.ndarray, np.ndarray]:
    """Pad rows to a tile multiple; padded rows marked invalid."""
    n, d = embeddings.shape
    pad = (-n) % tile
    if pad == 0:
        return embeddings, valid
    emb = np.concatenate(
        [embeddings, np.zeros((pad, d), dtype=embeddings.dtype)], axis=0)
    val = np.concatenate([valid, np.zeros(pad, dtype=bool)])
    return emb, val
