"""Multi-chip graph traversal: edge-partitioned BFS with ICI frontier
exchange.

SURVEY §2.4 row 3 ("CSR shards by node range; frontier exchange via
collective permute over ICI") — the multi-chip tier of the traversals the
reference ran in Memgraph (`query/graph_reasoning/queries.py:2-50`
CALLS*1..k, `:88-128` EXTENDS hierarchy).

Partitioning choice: the *edge list* is row-sharded over the `data` axis
and the frontier bitmap is replicated. For code graphs E >> N (every call
site is an edge; nodes are entities), so the O(E) gather/scatter work is
what must shard, while the [N] frontier is small (1M nodes = 1 MB as
int8). One hop inside `shard_map`:

    local:   msg = frontier[src_shard]; nxt |= scatter_max(dst_shard, msg)
    exchange: psum over ICI of the [N] next-frontier bitmap (an OR
              all-reduce; equivalent to the all-gather+OR formulation and
              one collective instead of two)

`lax.scan` runs the bounded hop loop exactly like the single-chip kernel
(`ops/graph_kernels.bfs_distances`), which doubles as this module's
oracle in tests.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lattice_tpu.ops import graph_kernels as gk
from lattice_tpu.parallel.mesh import DATA_AXIS, make_mesh

UNREACHED = gk.UNREACHED


def _build_bfs(mesh: Mesh, n_nodes: int, max_hops: int):
    def local_bfs(src_shard, dst_shard, seeds):
        # src/dst: this chip's edge rows; seeds: replicated [N] bool
        dist0 = jnp.where(seeds, 0, UNREACHED).astype(jnp.int32)

        def step(carry, hop):
            dist, reached = carry
            msg = reached[src_shard]                              # gather
            local = jnp.zeros(n_nodes, dtype=jnp.int32).at[dst_shard].max(
                msg.astype(jnp.int32))                            # scatter-or
            nxt = jax.lax.psum(local, DATA_AXIS) > 0              # ICI OR
            newly = nxt & ~reached
            dist = jnp.where(newly, hop + 1, dist)
            return (dist, reached | nxt), None

        (dist, _), _ = jax.lax.scan(
            step, (dist0, seeds), jnp.arange(max_hops, dtype=jnp.int32))
        return dist

    fn = shard_map(
        local_bfs, mesh=mesh,
        in_specs=(P(DATA_AXIS), P(DATA_AXIS), P()),
        out_specs=P(),
        check_vma=False,
    )
    return jax.jit(fn)


class ShardedGraph:
    """Edge-partitioned multi-chip view of one relationship's edge list."""

    def __init__(self, src: np.ndarray, dst: np.ndarray, n_nodes: int,
                 mesh: Mesh | None = None):
        self.mesh = mesh or make_mesh()
        self.n_nodes = int(n_nodes)
        n_data = self.mesh.shape[DATA_AXIS]
        # pad edges to a shard multiple with (0,0) self-loops (idempotent
        # under reachability, same trick as the single-chip kernel)
        src, dst = gk.pad_edges(np.asarray(src, np.int32),
                                np.asarray(dst, np.int32),
                                bucket=max(n_data, 8))
        extra = (-len(src)) % n_data
        if extra:
            src = np.concatenate([src, np.zeros(extra, np.int32)])
            dst = np.concatenate([dst, np.zeros(extra, np.int32)])
        edge_sharding = NamedSharding(self.mesh, P(DATA_AXIS))
        self.src = jax.device_put(jnp.asarray(src), edge_sharding)
        self.dst = jax.device_put(jnp.asarray(dst), edge_sharding)
        self._bfs_cache: dict[tuple[int, bool], callable] = {}

    def bfs_distances(self, seeds: np.ndarray, max_hops: int,
                      reverse: bool = False) -> np.ndarray:
        """[N] hop distances from the seed set (UNREACHED sentinel), with
        the per-hop frontier exchanged over ICI."""
        fn = self._bfs_cache.get((max_hops, reverse))
        if fn is None:
            fn = _build_bfs(self.mesh, self.n_nodes, max_hops)
            self._bfs_cache[(max_hops, reverse)] = fn
        seeds_dev = jnp.asarray(np.asarray(seeds, dtype=bool))
        if reverse:
            return np.asarray(fn(self.dst, self.src, seeds_dev))
        return np.asarray(fn(self.src, self.dst, seeds_dev))

    def k_hop(self, node_ids: list[int], max_hops: int,
              reverse: bool = False) -> dict[int, int]:
        """{node_id: depth} within `max_hops`, excluding seeds — the same
        contract as `GraphStore.k_hop` (FIND_TRANSITIVE_* semantics)."""
        seeds = np.zeros(self.n_nodes, dtype=bool)
        if node_ids:
            seeds[np.asarray(node_ids, dtype=np.int64)] = True
        dist = self.bfs_distances(seeds, max_hops, reverse=reverse)
        hit = np.flatnonzero((dist > 0) & (dist < UNREACHED))
        return {int(i): int(dist[i]) for i in hit}
