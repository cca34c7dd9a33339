"""Frontier-expansion kernels over COO/CSR relationship graphs.

These replace the reference's variable-length Cypher traversals executed by
Memgraph (`query/graph_reasoning/queries.py`):
- `FIND_TRANSITIVE_CALLERS/CALLEES` `[:CALLS*1..k]` (`queries.py:2-50`)
- `FIND_CALL_CHAIN` shortestPath (`queries.py:52-67`)
- `FIND_FULL_HIERARCHY` EXTENDS*1..5 both directions (`queries.py:88-128`)
- `GET_ENTITY_CENTRALITY` in/out degree (`queries.py:314-329`)

TPU-native design: the graph is an edge list `(src[E], dst[E])` per
relationship type, padded to a bucket size with (0,0) self-loops (self-loops
are idempotent under reachability and so are safe padding). One BFS step is
a dense scatter-max — `next[dst] |= frontier[src]` — which XLA compiles to a
vectorized segment operation; `lax.scan` runs the bounded hop loop (the
reference bounds traversals at 5 hops / path length 10, which maps cleanly
to a static scan length). Distances live in an `[N]` int array (UNREACHED
sentinel), giving the depth-ordering the Cypher queries return.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

UNREACHED = np.int32(2**30)


def geometric_bucket(n: int, floor: int = 1024) -> int:
    """Next power-of-two capacity >= n (min `floor`). Padding to geometric
    buckets keeps jit cache keys stable while a graph grows incrementally
    (watch mode adds edges file by file; linear buckets would retrace every
    1024 edges)."""
    cap = floor
    while cap < n:
        cap *= 2
    return cap


def csr_expand(indptr: np.ndarray, indices: np.ndarray, ids: np.ndarray,
               *values: np.ndarray) -> tuple[np.ndarray, ...]:
    """Vectorized CSR adjacency expansion on the host.

    Gathers `indices[indptr[i]:indptr[i+1]]` for every i in `ids` with
    three NumPy primitives (repeat/arange/fancy-index) — no Python loop
    over rows. Aligned per-id `values` come back repeated per expanded
    entry. Shared by the host BFS frontier walk and the node->row join
    (`ChunkStore.RankColumns`)."""
    ids = np.asarray(ids, dtype=np.int64)
    starts = indptr[ids]
    degs = (indptr[ids + 1] - starts).astype(np.int64)
    total = int(degs.sum())
    if total == 0:
        return (np.empty(0, indices.dtype),
                *(np.empty(0, v.dtype) for v in values))
    offs = np.arange(total, dtype=np.int64) - np.repeat(
        np.cumsum(degs) - degs, degs)
    out = indices[np.repeat(starts, degs) + offs]
    return (out, *(np.repeat(v, degs) for v in values))


def pad_edges(src: np.ndarray, dst: np.ndarray, bucket: int = 1024,
              geometric: bool = False) -> tuple[np.ndarray, np.ndarray]:
    """Pad the edge list with (0,0) self-loops so jit retraces only at
    bucket boundaries (self-loops are idempotent under reachability)."""
    e = len(src)
    if geometric:
        padded = geometric_bucket(e, bucket)
    else:
        padded = max(bucket, ((e + bucket - 1) // bucket) * bucket)
    ps = np.zeros(padded, dtype=np.int32)
    pd = np.zeros(padded, dtype=np.int32)
    ps[:e] = src
    pd[:e] = dst
    return ps, pd


@functools.partial(jax.jit, static_argnames=("n_nodes", "max_hops"))
def bfs_distances(
    src: jax.Array,        # [E] i32
    dst: jax.Array,        # [E] i32
    seeds: jax.Array,      # [N] bool
    n_nodes: int,
    max_hops: int,
) -> jax.Array:
    """Hop distance from the seed set along src->dst edges; UNREACHED else.

    One scan step = one frontier expansion (SpMV over the boolean semiring).
    """
    dist0 = jnp.where(seeds, 0, UNREACHED).astype(jnp.int32)

    def step(carry, hop):
        dist, reached = carry
        msg = reached[src]                                   # gather
        nxt = jnp.zeros(n_nodes, dtype=bool).at[dst].max(msg)  # scatter-or
        newly = nxt & ~reached
        dist = jnp.where(newly, hop + 1, dist)
        return (dist, reached | nxt), None

    (dist, _), _ = jax.lax.scan(
        step, (dist0, seeds), jnp.arange(max_hops, dtype=jnp.int32))
    return dist


@functools.partial(jax.jit, static_argnames=("n_nodes",))
def degree_counts(indices: jax.Array, n_nodes: int,
                  weights: jax.Array | None = None) -> jax.Array:
    """Degree vector via segment-sum scatter (centrality, `queries.py:314-329`)."""
    ones = jnp.ones_like(indices, dtype=jnp.int32) if weights is None else weights
    return jnp.zeros(n_nodes, dtype=jnp.int32).at[indices].add(ones)


@functools.partial(jax.jit, static_argnames=("n_nodes", "max_hops"))
def nodes_on_paths(
    src: jax.Array, dst: jax.Array,
    source_seeds: jax.Array,   # [N] bool
    target_seeds: jax.Array,   # [N] bool
    n_nodes: int,
    max_hops: int,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """(dist_from_source, dist_to_target, on_path mask).

    A node lies on some source->target path of length <= max_hops iff
    dist_from_source + dist_to_target <= max_hops. This is the dense
    equivalent of `FIND_ALL_PATHS` (`queries.py:69-86`): the device computes
    the path *corridor*; explicit path enumeration (irregular output) is
    done host-side inside the corridor, which is tiny.
    """
    d_fwd = bfs_distances(src, dst, source_seeds, n_nodes, max_hops)
    d_bwd = bfs_distances(dst, src, target_seeds, n_nodes, max_hops)
    # Clamp before adding: UNREACHED + UNREACHED overflows int32.
    cap = jnp.int32(2**20)
    total = jnp.minimum(d_fwd, cap) + jnp.minimum(d_bwd, cap)
    on_path = total <= max_hops
    return d_fwd, d_bwd, on_path


@functools.partial(jax.jit, static_argnames=("n_nodes", "max_hops"))
def bidirectional_closure(
    src: jax.Array, dst: jax.Array,
    seeds: jax.Array, n_nodes: int, max_hops: int,
) -> tuple[jax.Array, jax.Array]:
    """(ancestor_dist, descendant_dist) along one edge type.

    Replaces `FIND_FULL_HIERARCHY`'s EXTENDS*1..5 in both directions
    (`queries.py:88-128`).
    """
    up = bfs_distances(src, dst, seeds, n_nodes, max_hops)     # e.g. toward bases
    down = bfs_distances(dst, src, seeds, n_nodes, max_hops)   # toward subclasses
    return up, down


@functools.partial(jax.jit, static_argnames=("n_nodes", "max_hops"))
def bfs_distances_batch(
    src: jax.Array,        # [E] i32
    dst: jax.Array,        # [E] i32
    seed_ids: jax.Array,   # [Q, S] i32 seed node ids (pad with -1)
    n_nodes: int,
    max_hops: int,
) -> jax.Array:
    """[Q, N] hop distances for Q independent seed sets in ONE execution.

    The serving-throughput shape: a batch of traversal queries (e.g. the
    reference's transitive-caller lookups, `queries.py:2-50`) shares one
    pass over the edge list. The frontier lives as [N, Q] so the per-hop
    gather/scatter moves Q-lane rows (lane-major traffic) instead of Q
    scalar passes.
    """
    q, s = seed_ids.shape
    safe = jnp.clip(seed_ids, 0, n_nodes - 1)
    onhot = jnp.zeros((n_nodes, q), dtype=bool)
    # scatter seeds: rows = seed ids, cols = query index
    cols = jnp.broadcast_to(jnp.arange(q, dtype=jnp.int32)[:, None], (q, s))
    reached0 = onhot.at[safe.reshape(-1), cols.reshape(-1)].max(
        (seed_ids >= 0).reshape(-1))
    dist0 = jnp.where(reached0, 0, UNREACHED).astype(jnp.int32)

    def step(carry, hop):
        dist, reached = carry
        msg = reached[src]                                  # [E, Q] row gather
        nxt = jnp.zeros((n_nodes, q), dtype=bool).at[dst].max(msg)
        newly = nxt & ~reached
        dist = jnp.where(newly, hop + 1, dist)
        return (dist, reached | nxt), None

    (dist, _), _ = jax.lax.scan(
        step, (dist0, reached0), jnp.arange(max_hops, dtype=jnp.int32))
    return dist.T                                           # [Q, N]


@functools.partial(jax.jit, static_argnames=("limit", "exact"))
def khop_select(dist: jax.Array, alive: jax.Array, limit: int,
                exact: bool = False) -> tuple[jax.Array, jax.Array]:
    """Depth-ordered top-`limit` reached nodes from a distance row.

    Device-side result extraction: instead of reading the full [N] distance
    vector back over the relay (4 MB at 1M nodes), select the `limit`
    closest reached nodes on-device and read back O(limit). Mirrors the
    Cypher `ORDER BY depth LIMIT 50` tail of every traversal query
    (`query/graph_reasoning/queries.py:2-50`; result cap 50 at
    `models.py:5-8`). `lax.top_k` lowers to a full sort on TPU
    (R2_TPU_RESULTS2) — `approx_min_k` (PartialReduce) keeps it cheap; the
    widened candidate set makes misses at the depth boundary unlikely, and
    ties within a depth are arbitrary exactly as in Cypher. `exact=True`
    keeps the sort-based path for small graphs/oracles.
    """
    masked = jnp.where(alive & (dist > 0), dist, UNREACHED).astype(jnp.float32)
    n = masked.shape[-1]
    k = min(limit, n)
    if exact:
        neg_d, idx = jax.lax.top_k(-masked, k)
        return -neg_d.astype(jnp.int32), idx
    d, idx = jax.lax.approx_min_k(masked, k)
    return d.astype(jnp.int32), idx


@functools.partial(jax.jit,
                   static_argnames=("n_nodes", "max_hops", "limit"))
def khop_batch_bounded(
    src: jax.Array, dst: jax.Array,
    seed_ids: jax.Array,       # [Q, S] i32, pad with -1
    alive: jax.Array,          # [N] bool
    n_nodes: int, max_hops: int, limit: int,
) -> tuple[jax.Array, jax.Array]:
    """Batched traversals + per-query depth selection in ONE execution
    ([Q, limit] readback)."""
    dist = bfs_distances_batch(src, dst, seed_ids, n_nodes, max_hops)
    return jax.vmap(lambda row: khop_select(row, alive, limit))(dist)


@functools.partial(jax.jit,
                   static_argnames=("n_nodes", "max_hops", "limit"))
def khop_bounded(
    src: jax.Array, dst: jax.Array,
    seed_ids: jax.Array,       # [S] i32, pad with -1
    alive: jax.Array,          # [N] bool
    n_nodes: int, max_hops: int, limit: int,
) -> tuple[jax.Array, jax.Array]:
    """Seed scatter + BFS + depth-ordered selection fused in ONE
    execution: per-traversal dispatch cost is one call + one O(limit)
    readback (each separate eager op costs ~2 ms through the axon relay,
    so the unfused sequence paid ~5x the kernel's own time at small
    graphs)."""
    safe = jnp.clip(seed_ids, 0, n_nodes - 1)
    seeds = jnp.zeros(n_nodes, dtype=bool).at[safe].max(seed_ids >= 0)
    dist = bfs_distances(src, dst, seeds, n_nodes, max_hops)
    return khop_select(dist, alive, limit)


# ---- NumPy oracle ------------------------------------------------------


def bfs_oracle(src: np.ndarray, dst: np.ndarray, seeds: np.ndarray,
               n_nodes: int, max_hops: int) -> np.ndarray:
    """Reference BFS on the edge list (python loops, exact)."""
    adj: list[list[int]] = [[] for _ in range(n_nodes)]
    for s, d in zip(np.asarray(src), np.asarray(dst)):
        if s == 0 and d == 0:
            continue  # padding
        adj[int(s)].append(int(d))
    dist = np.full(n_nodes, UNREACHED, dtype=np.int64)
    frontier = [i for i, on in enumerate(np.asarray(seeds, dtype=bool)) if on]
    for i in frontier:
        dist[i] = 0
    for hop in range(max_hops):
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if dist[v] > hop + 1:
                    dist[v] = hop + 1
                    nxt.append(v)
        frontier = nxt
        if not frontier:
            break
    return dist
