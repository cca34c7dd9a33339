"""Flat cosine score + top-k selection over the resident embedding matrix.

This replaces the reference's Qdrant ANN search (`embeddings/client.py:132-176`
`query_points` with cosine distance + payload must-match filters). The
TPU-native design keeps the chunk-embedding matrix `[N, d]` resident in HBM
(bf16), streams it through the MXU against the query block, and fuses payload
filtering as a `-inf` additive mask before `lax.top_k`:

    scores = Q @ E^T          (MXU, bf16 inputs, f32 accumulation)
    scores += (mask - 1) * inf
    top_k(scores, k)

Embeddings are L2-normalized at insert time, so the dot product IS cosine
similarity. A NumPy oracle (`topk_oracle`) provides the mock-backend analog
of the reference's AsyncMock Qdrant in tests (SURVEY §4).

The fused Pallas score+select kernel lives in `ops/pallas_topk.py`; this
module is the pure-XLA path that also runs on CPU (BASELINE config 1).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30


def l2_normalize(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    """Host-side normalization applied at insert/query time."""
    x = np.asarray(x, dtype=np.float32)
    norms = np.linalg.norm(x, axis=-1, keepdims=True)
    return x / np.maximum(norms, eps)


@functools.partial(jax.jit, static_argnames=("k",))
def flat_topk(
    queries: jax.Array,      # [B, d] f32 (normalized)
    embeddings: jax.Array,   # [N, d] bf16/f32 (normalized rows)
    valid: jax.Array,        # [N] bool - live rows (freelist holes False)
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Exact cosine top-k. Returns (scores [B,k] f32, indices [B,k] i32)."""
    q = queries.astype(embeddings.dtype)
    scores = jax.lax.dot_general(
        q, embeddings,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )  # [B, N]
    scores = jnp.where(valid[None, :], scores, NEG_INF)
    top_scores, top_idx = jax.lax.top_k(scores, k)
    return top_scores, top_idx.astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def flat_topk_filtered(
    queries: jax.Array,      # [B, d]
    embeddings: jax.Array,   # [N, d]
    valid: jax.Array,        # [N] bool
    filter_mask: jax.Array,  # [N] bool - payload filter (True = keep)
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Top-k restricted to rows passing the payload filter.

    The reference builds Qdrant must-match filters from file_path /
    entity_type / language / project_name payload fields
    (`embeddings/client.py:142-176`); here those become boolean masks over
    payload columns, ANDed into one `filter_mask`.
    """
    return flat_topk(queries, embeddings, valid & filter_mask, k)


@functools.partial(jax.jit, static_argnames=("k",))
def merge_topk(
    scores_a: jax.Array, idx_a: jax.Array,   # [B, k]
    scores_b: jax.Array, idx_b: jax.Array,   # [B, k]
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Merge two top-k lists into one (the ICI tree-reduce ladder step).

    Used by the sharded index: each chip produces a local (score, id) list;
    lists merge pairwise over the mesh (SURVEY §2.4 'distributed top-k').
    """
    scores = jnp.concatenate([scores_a, scores_b], axis=-1)
    idx = jnp.concatenate([idx_a, idx_b], axis=-1)
    top_scores, pos = jax.lax.top_k(scores, k)
    top_idx = jnp.take_along_axis(idx, pos, axis=-1)
    return top_scores, top_idx


def flat_topk_blocked(
    queries: jax.Array,      # [B, d] f32 (normalized)
    embeddings: jax.Array,   # [N, d] bf16/f32 (normalized rows)
    valid: jax.Array,        # [N] bool
    k: int,
    block: int = 1 << 17,
    score_dtype=jnp.float32,
) -> tuple[jax.Array, jax.Array]:
    """Exact top-k with bounded device memory: row blocks + merge ladder.

    `flat_topk` over 1M x 768 materializes a [B, N] f32 slab (1 GB at
    B=256) and, when the oracle upcasts a bf16 corpus, a full f32 copy
    (3 GB) — that transient is what tipped the r4 bench into
    RESOURCE_EXHAUSTED mid-run. This walks `block`-row slices (f32 cast
    [block, d] + [B, block] scores, ~0.5 GB at the default), merging
    per-block winners with `merge_topk`. Exact for any block split
    because top-k is associative under merge. Dispatch overhead
    (ceil(N/block) executions) is irrelevant for an oracle.
    """
    n = embeddings.shape[0]
    if n == 0:
        raise ValueError("flat_topk_blocked: empty embeddings")
    best_s = best_i = None
    for lo in range(0, n, block):
        hi = min(lo + block, n)
        s, i = flat_topk(queries,
                         embeddings[lo:hi].astype(score_dtype),
                         valid[lo:hi], min(k, hi - lo))
        i = i + lo
        if s.shape[-1] < k:  # block smaller than k: pad to merge width
            pad = k - s.shape[-1]
            s = jnp.pad(s, ((0, 0), (0, pad)), constant_values=NEG_INF)
            i = jnp.pad(i, ((0, 0), (0, pad)))
        if best_s is None:
            best_s, best_i = s, i
        else:
            best_s, best_i = merge_topk(best_s, best_i, s, i, k)
        # The bound is only real if the host can't run ahead: async
        # dispatch would otherwise enqueue every block's f32 cast (and
        # its result buffer) before any executes. Negligible oracle cost.
        best_s.block_until_ready()
    return best_s, best_i


def batched_matmul_scores(
    queries: jax.Array, embeddings: jax.Array,
) -> jax.Array:
    """Raw [B, N] cosine scores (used by the ranking fuse)."""
    return jax.lax.dot_general(
        queries.astype(embeddings.dtype), embeddings,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


# ---- NumPy oracle ------------------------------------------------------


def topk_oracle(
    queries: np.ndarray, embeddings: np.ndarray, valid: np.ndarray, k: int,
    filter_mask: np.ndarray | None = None,
) -> tuple[np.ndarray, np.ndarray]:
    """Exact brute-force reference implementation (float64)."""
    q = np.asarray(queries, dtype=np.float64)
    e = np.asarray(embeddings, dtype=np.float64)
    scores = q @ e.T
    keep = np.asarray(valid, dtype=bool)
    if filter_mask is not None:
        keep = keep & np.asarray(filter_mask, dtype=bool)
    scores[:, ~keep] = -np.inf
    idx = np.argsort(-scores, axis=1, kind="stable")[:, :k]
    top = np.take_along_axis(scores, idx, axis=1)
    return top, idx.astype(np.int32)
