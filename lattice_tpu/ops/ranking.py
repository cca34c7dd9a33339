"""Vectorized hybrid-ranking fuse over node-aligned device arrays.

SURVEY §7 step 6: the reference scores each result in a Python loop
(`query/ranking/scorer.py:9-126`) over <=70 materialized results. On device
the same formulas evaluate for *every graph node at once* — graph evidence
(BFS depth, relationship class, degree) and vector evidence (cosine
similarity scattered to node rows) fuse in one elementwise pass followed by
`top_k`, so corpus-scale candidate sets (the 1M-chunk regime) rank without
leaving HBM.

Formula parity with `ResultScorer` / `HybridRanker`:
  side_g = w_g·(decay^depth · relevance) + bonus·match + w_c·cent + w_x·rich
  side_v = w_v·sim + bonus·match + w_c·cent + w_x·quality
  fused  = both present ? (side_g + side_v)/2 · boost : side_g + side_v
with centrality = min(1, degree/cap) (`scorer.py:60`) and the mean x 1.1
duplicate-merge rule (`ranker.py:171-202`).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from lattice_tpu.ops.graph_kernels import UNREACHED

NEG_INF = -1e30


@dataclass(frozen=True)
class FuseWeights:
    graph_weight: float = 0.5
    vector_weight: float = 0.5
    centrality_weight: float = 0.2
    context_weight: float = 0.1
    entity_match_bonus: float = 0.3
    hybrid_boost: float = 1.1
    depth_decay: float = 0.8
    degree_cap: float = 50.0


def _fuse_scores(graph_depth, relevance, vector_scores, entity_match,
                 degree, quality, weights) -> jax.Array:
    """The elementwise fuse shared by every ranking entry point."""
    w_g, w_v, w_c, w_x, bonus, boost, decay, cap = (
        weights[0], weights[1], weights[2], weights[3], weights[4],
        weights[5], weights[6], weights[7])
    in_graph = graph_depth < UNREACHED
    has_vec = vector_scores > NEG_INF / 2
    depth_f = jnp.where(in_graph, graph_depth, 0).astype(jnp.float32)
    base = jnp.power(decay, depth_f) * relevance
    cent = jnp.minimum(1.0, degree.astype(jnp.float32) / cap)
    richness = jnp.where(in_graph, 0.5, 0.0) + jnp.where(has_vec, 0.5, 0.0)

    side_g = jnp.where(
        in_graph,
        w_g * base + bonus * entity_match + w_c * cent + w_x * richness,
        0.0)
    side_v = jnp.where(
        has_vec,
        w_v * jnp.maximum(vector_scores, 0.0) + bonus * entity_match
        + w_c * cent + w_x * quality,
        0.0)
    both = in_graph & has_vec
    fused = jnp.where(both, (side_g + side_v) * 0.5 * boost, side_g + side_v)
    return jnp.where(in_graph | has_vec, fused, NEG_INF)


def _select_topk(fused: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """Top-k over the [N] fused row: `lax.top_k` lowers to a FULL SORT on
    TPU (R2_TPU_RESULTS2, ~80 ms at 1M) — widen through `approx_max_k`
    (PartialReduce) then exact-sort the tiny candidate set. Exact on CPU
    (approx_max_k falls back to top_k there)."""
    n = fused.shape[0]
    k_eff = min(k, n)
    kw = min(max(4 * k_eff, 32), n)
    val, idx = jax.lax.approx_max_k(fused, kw)
    top, pos = jax.lax.top_k(val, k_eff)
    return top, jnp.take_along_axis(idx, pos, axis=-1).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("k",))
def fused_rank(
    graph_depth: jax.Array,     # [N] i32, UNREACHED where node not in context
    relevance: jax.Array,       # [N] f32, relationship relevance (0 if none)
    vector_scores: jax.Array,   # [N] f32 cosine, NEG_INF where no vector hit
    entity_match: jax.Array,    # [N] f32 in [0, 1]
    degree: jax.Array,          # [N] i32 (in+out CALLS degree)
    quality: jax.Array,         # [N] f32 content-quality heuristic
    weights: jax.Array,         # [8] f32: packed FuseWeights
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns (fused scores [k], node ids [k]) over all N nodes."""
    fused = _fuse_scores(graph_depth, relevance, vector_scores, entity_match,
                         degree, quality, weights)
    return _select_topk(fused, k)


@functools.partial(jax.jit, static_argnames=("k",))
def fused_rank_rows(
    dist_nodes: jax.Array,      # [M] i32 BFS hop distances in NODE space
    degree_nodes: jax.Array,    # [M] i32 degree vector in NODE space
    row_node_ids: jax.Array,    # [N] i32 graph node id per chunk row (-1 none)
    relevance: jax.Array,       # [M] f32 relationship relevance in NODE space
    vector_scores: jax.Array,   # [N] f32 cosine per row, NEG_INF invalid
    entity_match: jax.Array,    # [N] f32
    quality: jax.Array,         # [N] f32
    weights: jax.Array,         # [8] f32
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Device-native hybrid rank: gather graph evidence node->row, fuse,
    select — one execution, one O(k) readback.

    The host `deep_search` assembly loops over payloads per query
    (`query/engine.py`), which is O(corpus) Python — at 1M rows that
    dominates end-to-end latency. Here the graph side stays in node space
    (`bfs_distances` output + `degree_counts`), chunk rows join through
    the resident `row_node_ids` column (the `graph_node_id` payload key
    the reference stores per point, `embeddings/chunker.py:13-37`), and
    the fuse + selection never leave HBM.
    """
    m = dist_nodes.shape[0]
    safe = jnp.clip(row_node_ids, 0, m - 1)
    has_node = (row_node_ids >= 0) & (row_node_ids < m)
    depth = jnp.where(has_node, dist_nodes[safe], UNREACHED).astype(jnp.int32)
    degree = jnp.where(has_node, degree_nodes[safe], 0).astype(jnp.int32)
    rel = jnp.where(has_node, relevance[safe], 0.0)
    fused = _fuse_scores(depth, rel, vector_scores, entity_match,
                         degree, quality, weights)
    return _select_topk(fused, k)


@functools.partial(jax.jit, static_argnames=("k",))
def hybrid_rank_device(
    query: jax.Array,           # [d] f32 (unnormalized ok)
    embeddings: jax.Array,      # [N, d] bf16/f32 corpus rows
    valid: jax.Array,           # [N] bool
    reach_rows: jax.Array,      # [R] i32 (-1 pad)
    reach_depths: jax.Array,    # [R] i32
    reach_rel: jax.Array,       # [R] f32
    row_degree: jax.Array,      # [N] i32
    entity_match: jax.Array,    # [N] f32
    quality: jax.Array,         # [N] f32
    weights: jax.Array,         # [8] f32
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """The full hybrid query device side in ONE execution: normalize ->
    corpus cosine (MXU) -> sparse reach scatter -> fuse -> selection.
    Each separate eager op costs a ~2 ms dispatch through the axon relay
    (and a sequential caller pays a full ~25 ms round trip per
    execution), so the vector pass and the fuse must not be separate
    calls."""
    q = query.astype(jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    scores = jax.lax.dot_general(
        q[None, :], embeddings,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    vec = jnp.where(valid, scores, NEG_INF)
    return fused_rank_rows_sparse(reach_rows, reach_depths, reach_rel,
                                  row_degree, vec, entity_match, quality,
                                  weights, k)


@functools.partial(jax.jit, static_argnames=("k",))
def fused_rank_rows_sparse(
    reach_rows: jax.Array,      # [R] i32 ROW ids the BFS reached (-1 pad)
    reach_depths: jax.Array,    # [R] i32 hop depths per row
    reach_rel: jax.Array,       # [R] f32 relationship relevance per row
    row_degree: jax.Array,      # [N] i32 resident degree column
    vector_scores: jax.Array,   # [N] f32
    entity_match: jax.Array,    # [N] f32
    quality: jax.Array,         # [N] f32
    weights: jax.Array,         # [8] f32
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """The hybrid fuse fed by a SPARSE reach set, entirely in ROW space.

    The graph side comes from the vectorized host CSR walk (O(edges
    touched), 4 ms p50 at 1M/10M — the dense device BFS re-scans all E
    edges per hop through XLA's serial scalar gather, ~1.5 s/query), and
    the node->row expansion happens host-side through the resident
    reverse CSR (`ChunkStore.RankColumns.rows_for_nodes`) — a per-query
    device-side node->row gather over [N] rows costs ~50 ms at 1M
    through the same serial gather. Static node-derived signals (degree
    centrality) live as resident row columns. Host->device traffic is
    O(reached); scatter + fuse + selection stay one execution. Duplicate
    rows keep the MINIMUM depth (multi-direction reach)."""
    n = vector_scores.shape[0]
    on = reach_rows >= 0
    safe = jnp.clip(reach_rows, 0, n - 1)
    depth = jnp.full((n,), UNREACHED, dtype=jnp.int32).at[safe].min(
        jnp.where(on, reach_depths, UNREACHED).astype(jnp.int32))
    rel = jnp.zeros((n,), dtype=jnp.float32).at[safe].max(
        jnp.where(on, reach_rel, 0.0))
    fused = _fuse_scores(depth, rel, vector_scores, entity_match,
                         row_degree, quality, weights)
    return _select_topk(fused, k)


# ---- packed sparse reach ---------------------------------------------------
# One int32 per reached row: row id (25 bits) | depth (4 bits) | rel
# class (2 bits); sign bit marks padding. A query's reach evidence used
# to ride to the device as three arrays (i32 rows + i32 depths + f32
# rel) = 12 B/entry; through the ~2 ms/23 MB-s axon relay the upload
# dominated single-query hybrid latency (46 ms p50 at a 64K-entry
# bucket, VERDICT r3 weak #2). Packing cuts it to 4 B/entry and folds
# the per-query entity-match scatter into the same execution.

REACH_ROW_BITS = 25
REACH_ROW_MASK = (1 << REACH_ROW_BITS) - 1
REACH_DEPTH_MAX = 15


def pack_reach(rows: np.ndarray, depths: np.ndarray, rel_cls: np.ndarray,
               r_cap: int) -> np.ndarray:
    """[r_cap] i32 packed reach; entries beyond len(rows) are -1 pads.
    Truncates to r_cap when the reach overflows the bucket."""
    m = min(len(rows), r_cap)
    out = np.full(r_cap, -1, dtype=np.int32)
    if m:
        r = rows[:m].astype(np.int64)
        if r.max(initial=0) > REACH_ROW_MASK:
            raise ValueError("row id exceeds 25-bit packed capacity")
        d = np.minimum(depths[:m].astype(np.int64), REACH_DEPTH_MAX)
        c = rel_cls[:m].astype(np.int64) & 3
        out[:m] = (r | (d << REACH_ROW_BITS) | (c << 29)).astype(np.int32)
    return out


@functools.partial(jax.jit, static_argnames=("k",))
def hybrid_rank_device_packed(
    query: jax.Array,           # [d] f32 (unnormalized ok)
    embeddings: jax.Array,      # [N, d] bf16/f32 corpus rows
    valid: jax.Array,           # [N] bool
    packed_reach: jax.Array,    # [R] i32 (pack_reach format, -1 pad)
    rel_table: jax.Array,       # [4] f32 relevance per rel class
    match_rows: jax.Array,      # [M] i32 entity-match rows (-1 pad)
    row_degree: jax.Array,      # [N] i32
    quality: jax.Array,         # [N] f32
    weights: jax.Array,         # [8] f32
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Single-execution hybrid rank with 4 B/entry reach upload.

    Same math as `hybrid_rank_device` (normalize -> MXU cosine ->
    sparse reach scatter -> fuse -> selection) but the reach arrives
    packed (see `pack_reach`) and the entity-match column is scattered
    from `match_rows` on device instead of being materialized per query
    by an extra eager execution."""
    q = query.astype(jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    scores = jax.lax.dot_general(
        q[None, :], embeddings,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    vec = jnp.where(valid, scores, NEG_INF)
    n = vec.shape[0]

    on = packed_reach >= 0
    rows = packed_reach & REACH_ROW_MASK
    depth_p = (packed_reach >> REACH_ROW_BITS) & REACH_DEPTH_MAX
    rel_p = rel_table[(packed_reach >> 29) & 3]
    safe = jnp.clip(rows, 0, n - 1)
    depth = jnp.full((n,), UNREACHED, dtype=jnp.int32).at[safe].min(
        jnp.where(on, depth_p, UNREACHED).astype(jnp.int32))
    rel = jnp.zeros((n,), dtype=jnp.float32).at[safe].max(
        jnp.where(on, rel_p, 0.0))

    m_on = match_rows >= 0
    m_safe = jnp.clip(match_rows, 0, n - 1)
    match = jnp.zeros((n,), dtype=jnp.float32).at[m_safe].max(
        jnp.where(m_on, 1.0, 0.0))

    fused = _fuse_scores(depth, rel, vec, match, row_degree, quality,
                         weights)
    return _select_topk(fused, k)


@functools.partial(jax.jit, static_argnames=("k",))
def hybrid_rank_device_packed_batch(
    queries: jax.Array,         # [Q, d] f32 (unnormalized ok)
    embeddings: jax.Array,      # [N, d] bf16/f32 corpus rows
    valid: jax.Array,           # [N] bool
    packed_reach: jax.Array,    # [Q, R] i32 (pack_reach rows, -1 pad)
    rel_table: jax.Array,       # [4] f32, or [Q, 4] per-intent
    match_rows: jax.Array,      # [Q, M] i32 (-1 pad)
    row_degree: jax.Array,      # [N] i32
    quality: jax.Array,         # [N] f32
    weights: jax.Array,         # [8] f32, or [Q, 8] per-intent
    k: int,
) -> tuple[jax.Array, jax.Array]:
    """Q hybrid queries in ONE execution: batched cosine on the MXU,
    then a `lax.scan` over per-query reach scatter + fuse + selection.

    The single-query path pays ~two synchronous relay cycles (~36 ms
    each on axon: one for the fresh evidence upload, one for the
    dependent execution — R4_TPU_RESULTS3 stage breakdown), independent
    of evidence BYTES. Batching Q queries' evidence into one [Q, R]
    upload + one execution amortizes those cycles to ~cycles/Q; the
    scatter/fuse is ~1.5 ms per query of device time at 1M rows.
    Returns ([Q, k] scores, [Q, k] rows)."""
    q = queries.astype(jnp.float32)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    scores = jax.lax.dot_general(
        q, embeddings, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)      # [Q, N]
    vec_all = jnp.where(valid[None, :], scores, NEG_INF)
    n = embeddings.shape[0]
    nq = queries.shape[0]
    # per-query intent tables: [8]/[4] broadcast to [Q, 8]/[Q, 4] so a
    # mixed-intent batch fuses each query with its own weights
    w_q = (weights if weights.ndim == 2
           else jnp.broadcast_to(weights, (nq,) + weights.shape))
    rel_q = (rel_table if rel_table.ndim == 2
             else jnp.broadcast_to(rel_table, (nq,) + rel_table.shape))

    def body(_, per_q):
        vec, packed, m_rows, w, rel_t = per_q
        on = packed >= 0
        rows = packed & REACH_ROW_MASK
        depth_p = (packed >> REACH_ROW_BITS) & REACH_DEPTH_MAX
        rel_p = rel_t[(packed >> 29) & 3]
        safe = jnp.clip(rows, 0, n - 1)
        depth = jnp.full((n,), UNREACHED, dtype=jnp.int32).at[safe].min(
            jnp.where(on, depth_p, UNREACHED).astype(jnp.int32))
        rel = jnp.zeros((n,), dtype=jnp.float32).at[safe].max(
            jnp.where(on, rel_p, 0.0))
        m_on = m_rows >= 0
        m_safe = jnp.clip(m_rows, 0, n - 1)
        match = jnp.zeros((n,), dtype=jnp.float32).at[m_safe].max(
            jnp.where(m_on, 1.0, 0.0))
        fused = _fuse_scores(depth, rel, vec, match, row_degree,
                             quality, w)
        return None, _select_topk(fused, k)

    _, (top_s, top_i) = jax.lax.scan(
        body, None, (vec_all, packed_reach, match_rows, w_q, rel_q))
    return top_s, top_i


def pack_weights(w: FuseWeights) -> np.ndarray:
    return np.asarray([
        w.graph_weight, w.vector_weight, w.centrality_weight,
        w.context_weight, w.entity_match_bonus, w.hybrid_boost,
        w.depth_decay, w.degree_cap,
    ], dtype=np.float32)


def rank_oracle(graph_depth, relevance, vector_scores, entity_match, degree,
                quality, w: FuseWeights, k: int):
    """NumPy reference of the fuse for kernel tests."""
    n = len(graph_depth)
    fused = np.full(n, NEG_INF, dtype=np.float64)
    for i in range(n):
        in_graph = graph_depth[i] < UNREACHED
        has_vec = vector_scores[i] > NEG_INF / 2
        cent = min(1.0, degree[i] / w.degree_cap)
        richness = (0.5 if in_graph else 0.0) + (0.5 if has_vec else 0.0)
        side_g = (w.graph_weight * (w.depth_decay ** graph_depth[i])
                  * relevance[i] + w.entity_match_bonus * entity_match[i]
                  + w.centrality_weight * cent
                  + w.context_weight * richness) if in_graph else 0.0
        side_v = (w.vector_weight * max(vector_scores[i], 0.0)
                  + w.entity_match_bonus * entity_match[i]
                  + w.centrality_weight * cent
                  + w.context_weight * quality[i]) if has_vec else 0.0
        if in_graph and has_vec:
            fused[i] = (side_g + side_v) / 2.0 * w.hybrid_boost
        elif in_graph or has_vec:
            fused[i] = side_g + side_v
    order = np.argsort(-fused, kind="stable")[:k]
    return fused[order], order.astype(np.int32)
