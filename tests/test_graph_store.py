"""GraphStore construction + traversal; device kernels vs the BFS oracle."""

import numpy as np
import pytest

from lattice_tpu.core.types import EdgeType, EntityType
from lattice_tpu.index.graph_store import GraphStore
from lattice_tpu.ops import graph_kernels as gk


@pytest.fixture
def call_graph():
    """a -> b -> c -> d, a -> c, e isolated; User extends Base."""
    g = GraphStore()
    ids = {}
    for name in ("a", "b", "c", "d", "e"):
        ids[name] = g.add_node(f"m.{name}", EntityType.FUNCTION, "m.py",
                               start_line=1)
    for s, d in (("a", "b"), ("b", "c"), ("c", "d"), ("a", "c")):
        g.add_edge(ids[s], ids[d], EdgeType.CALLS)
    ids["Base"] = g.add_node("m.Base", EntityType.CLASS, "m.py")
    ids["User"] = g.add_node("m.User", EntityType.CLASS, "m.py")
    g.add_edge(ids["User"], ids["Base"], EdgeType.EXTENDS)
    g.finalize()
    return g, ids


class TestGraphStore:
    def test_neighbors(self, call_graph):
        g, ids = call_graph
        assert sorted(g.neighbors([ids["a"]], EdgeType.CALLS)[0]) == \
            sorted([ids["b"], ids["c"]])
        assert sorted(g.neighbors([ids["c"]], EdgeType.CALLS, reverse=True)[0]) == \
            sorted([ids["b"], ids["a"]])

    def test_k_hop_callees_with_depth(self, call_graph):
        g, ids = call_graph
        result = g.k_hop([ids["a"]], EdgeType.CALLS, hops=2)
        assert result == {ids["b"]: 1, ids["c"]: 1, ids["d"]: 2}

    def test_k_hop_callers(self, call_graph):
        g, ids = call_graph
        result = g.k_hop([ids["d"]], EdgeType.CALLS, hops=5, reverse=True)
        assert result == {ids["c"]: 1, ids["b"]: 2, ids["a"]: 2}

    def test_shortest_path(self, call_graph):
        g, ids = call_graph
        path = g.shortest_path(ids["a"], ids["d"], EdgeType.CALLS)
        assert path == [ids["a"], ids["c"], ids["d"]]
        assert g.shortest_path(ids["d"], ids["a"], EdgeType.CALLS) is None

    def test_all_paths(self, call_graph):
        g, ids = call_graph
        paths = g.all_paths(ids["a"], ids["d"], EdgeType.CALLS)
        as_sets = {tuple(p) for p in paths}
        assert (ids["a"], ids["c"], ids["d"]) in as_sets
        assert (ids["a"], ids["b"], ids["c"], ids["d"]) in as_sets

    def test_degree(self, call_graph):
        g, ids = call_graph
        (out_deg, in_deg), = g.degree([ids["c"]], EdgeType.CALLS)
        assert (out_deg, in_deg) == (1, 2)

    def test_merge_idempotent(self, call_graph):
        g, ids = call_graph
        nid = g.add_node("m.a", EntityType.FUNCTION, "m.py", start_line=7)
        assert nid == ids["a"]
        assert g.node(nid).start_line == 7

    def test_remove_file_nodes(self, call_graph):
        g, ids = call_graph
        removed = g.remove_file_nodes("m.py")
        assert removed == 7
        assert g.id_of("m.a") is None
        assert g.n_edges(EdgeType.CALLS) == 0

    def test_fuzzy_find(self, call_graph):
        g, ids = call_graph
        hits = g.find_fuzzy("User")
        assert hits[0][0] == ids["User"] and hits[0][1] == 1.0
        hits = g.find_fuzzy("use")
        assert any(h[0] == ids["User"] for h in hits)

    def test_stats(self, call_graph):
        g, _ = call_graph
        s = g.stats
        assert s["nodes"] == 7
        assert s["edges"]["CALLS"] == 4
        assert s["by_type"]["class"] == 2


class TestDeviceKernelsVsOracle:
    def _random_graph(self, n, e, seed):
        rng = np.random.default_rng(seed)
        src = rng.integers(0, n, size=e).astype(np.int32)
        dst = rng.integers(0, n, size=e).astype(np.int32)
        return src, dst

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_bfs_matches_oracle(self, seed):
        import jax.numpy as jnp
        n, e = 100, 300
        src, dst = self._random_graph(n, e, seed)
        psrc, pdst = gk.pad_edges(src, dst)
        seeds = np.zeros(n, dtype=bool)
        seeds[[3, 50]] = True
        dev = np.asarray(gk.bfs_distances(
            jnp.asarray(psrc), jnp.asarray(pdst), jnp.asarray(seeds), n, 5))
        oracle = gk.bfs_oracle(src, dst, seeds, n, 5)
        reached_dev = dev < gk.UNREACHED
        reached_o = oracle < gk.UNREACHED
        np.testing.assert_array_equal(reached_dev, reached_o)
        np.testing.assert_array_equal(dev[reached_dev], oracle[reached_o])

    def test_degree_counts(self):
        import jax.numpy as jnp
        src = np.array([0, 0, 1, 2, 2, 2], dtype=np.int32)
        deg = np.asarray(gk.degree_counts(jnp.asarray(src), 4))
        np.testing.assert_array_equal(deg, [2, 1, 3, 0])

    def test_nodes_on_paths_corridor(self):
        import jax.numpy as jnp
        # chain 0->1->2->3 plus spur 0->4
        src = np.array([0, 1, 2, 0], dtype=np.int32)
        dst = np.array([1, 2, 3, 4], dtype=np.int32)
        psrc, pdst = gk.pad_edges(src, dst, bucket=8)
        s = np.zeros(5, dtype=bool); s[0] = True
        t = np.zeros(5, dtype=bool); t[3] = True
        _, _, on_path = gk.nodes_on_paths(
            jnp.asarray(psrc), jnp.asarray(pdst),
            jnp.asarray(s), jnp.asarray(t), 5, 5)
        np.testing.assert_array_equal(
            np.asarray(on_path), [True, True, True, True, False])

    def test_bidirectional_closure(self):
        import jax.numpy as jnp
        # EXTENDS: child(0) -> parent(1) -> grandparent(2); sibling(3) -> 1
        src = np.array([0, 1, 3], dtype=np.int32)
        dst = np.array([1, 2, 1], dtype=np.int32)
        psrc, pdst = gk.pad_edges(src, dst, bucket=8)
        seeds = np.zeros(4, dtype=bool); seeds[1] = True
        up, down = gk.bidirectional_closure(
            jnp.asarray(psrc), jnp.asarray(pdst), jnp.asarray(seeds), 4, 5)
        up, down = np.asarray(up), np.asarray(down)
        assert up[2] == 1 and up[0] == gk.UNREACHED      # ancestors of node 1
        assert down[0] == 1 and down[3] == 1             # descendants of node 1


class TestDeviceDispatch:
    def test_device_khop_equals_host(self, call_graph):
        g, ids = call_graph
        host = g.k_hop([ids["a"]], EdgeType.CALLS, hops=3, device=False)
        dev = g.k_hop([ids["a"]], EdgeType.CALLS, hops=3, device=True)
        assert host == dev
        host_r = g.k_hop([ids["d"]], EdgeType.CALLS, hops=5, reverse=True,
                         device=False)
        dev_r = g.k_hop([ids["d"]], EdgeType.CALLS, hops=5, reverse=True,
                        device=True)
        assert host_r == dev_r


class TestBatchedBFS:
    def _random_graph(self, n, e, seed):
        rng = np.random.default_rng(seed)
        return (rng.integers(0, n, size=e).astype(np.int32),
                rng.integers(0, n, size=e).astype(np.int32))

    def test_batch_matches_single(self):
        import jax.numpy as jnp
        n, e = 128, 400
        src, dst = self._random_graph(n, e, 7)
        psrc, pdst = gk.pad_edges(src, dst)
        seed_sets = [[3], [50, 10], [90]]
        seed_arr = np.full((3, 2), -1, dtype=np.int32)
        for i, s in enumerate(seed_sets):
            seed_arr[i, :len(s)] = s
        batch = np.asarray(gk.bfs_distances_batch(
            jnp.asarray(psrc), jnp.asarray(pdst), jnp.asarray(seed_arr),
            n, 4))
        for i, s in enumerate(seed_sets):
            seeds = np.zeros(n, dtype=bool)
            seeds[s] = True
            single = np.asarray(gk.bfs_distances(
                jnp.asarray(psrc), jnp.asarray(pdst), jnp.asarray(seeds),
                n, 4))
            np.testing.assert_array_equal(batch[i], single)

    def test_khop_select_depth_order(self):
        import jax.numpy as jnp
        dist = np.full(64, gk.UNREACHED, dtype=np.int32)
        dist[0] = 0          # seed: excluded
        dist[[5, 9]] = 1
        dist[[20, 30, 40]] = 2
        dist[50] = 3         # dead node: excluded
        alive = np.ones(64, dtype=bool)
        alive[50] = False
        d, idx = gk.khop_select(jnp.asarray(dist), jnp.asarray(alive), 16,
                                exact=True)
        d, idx = np.asarray(d), np.asarray(idx)
        keep = d < gk.UNREACHED
        got = sorted(zip(d[keep].tolist(), idx[keep].tolist()))
        assert got == [(1, 5), (1, 9), (2, 20), (2, 30), (2, 40)]


class TestDeviceResidency:
    def test_edge_cache_reused_across_calls(self, call_graph):
        g, ids = call_graph
        e1 = g.device_edges(EdgeType.CALLS)
        e2 = g.device_edges(EdgeType.CALLS)
        assert e1[0] is e2[0] and e1[1] is e2[1]  # no per-call upload
        a1, a2 = g.device_alive(), g.device_alive()
        assert a1 is a2

    def test_no_pad_per_query(self, call_graph, monkeypatch):
        g, ids = call_graph
        g.k_hop([ids["a"]], EdgeType.CALLS, hops=2, device=True)  # warm
        calls = {"n": 0}
        real = gk.pad_edges

        def counting(*a, **k):
            calls["n"] += 1
            return real(*a, **k)

        monkeypatch.setattr(gk, "pad_edges", counting)
        for _ in range(3):
            g.k_hop([ids["a"]], EdgeType.CALLS, hops=2, device=True)
        assert calls["n"] == 0  # the host edge list never re-pads/re-uploads

    def test_cache_invalidated_by_finalize(self, call_graph):
        g, ids = call_graph
        e1 = g.device_edges(EdgeType.CALLS)
        g.add_edge(ids["d"], ids["e"], EdgeType.CALLS)  # marks dirty
        dev = g.k_hop([ids["a"]], EdgeType.CALLS, hops=4, device=True)
        assert dev[ids["e"]] == 3  # new edge visible through the cache
        assert g.device_edges(EdgeType.CALLS)[0] is not e1[0]

    def test_khop_limit_matches_unlimited_prefix(self, call_graph):
        g, ids = call_graph
        full = g.k_hop([ids["a"]], EdgeType.CALLS, hops=3, device=True)
        lim = g.k_hop([ids["a"]], EdgeType.CALLS, hops=3, device=True,
                      limit=2)
        assert len(lim) == 2
        want = sorted(full.items(), key=lambda t: (t[1], t[0]))[:2]
        assert sorted(lim.items(), key=lambda t: (t[1], t[0])) == want

    def test_k_hop_batch_equals_single(self):
        rng = np.random.default_rng(3)
        g = GraphStore()
        n = 300
        for i in range(n):
            g.add_node(f"m.f{i}", EntityType.FUNCTION, "m.py")
        for s, d in zip(rng.integers(0, n, 900), rng.integers(0, n, 900)):
            if s != d:
                g.add_edge(int(s), int(d), EdgeType.CALLS)
        g.finalize()
        g.DEVICE_BFS_THRESHOLD = 1  # force the device path at toy scale
        seed_sets = [[1], [5, 17], [200]]
        batch = g.k_hop_batch(seed_sets, EdgeType.CALLS, hops=3, limit=500,
                              device=True)
        for s, got in zip(seed_sets, batch):
            want = g.k_hop(s, EdgeType.CALLS, hops=3, device=False)
            assert got == want


class TestPathCorridor:
    def _graph(self, n=200, e=600, seed=11):
        rng = np.random.default_rng(seed)
        g = GraphStore()
        for i in range(n):
            g.add_node(f"m.f{i}", EntityType.FUNCTION, "m.py")
        for s, d in zip(rng.integers(0, n, e), rng.integers(0, n, e)):
            if s != d:
                g.add_edge(int(s), int(d), EdgeType.CALLS)
        g.finalize()
        return g

    def test_corridor_paths_equal_plain_dfs(self):
        g = self._graph()
        pairs = [(1, 50), (3, 120), (7, 7)]
        plain = [sorted(map(tuple, g.all_paths(a, b, EdgeType.CALLS,
                                               max_len=4, max_paths=50)))
                 for a, b in pairs]
        g.DEVICE_BFS_THRESHOLD = 1  # force the device corridor
        pruned = [sorted(map(tuple, g.all_paths(a, b, EdgeType.CALLS,
                                                max_len=4, max_paths=50)))
                  for a, b in pairs]
        assert plain == pruned

    def test_corridor_shortest_path_same_length(self):
        g = self._graph(seed=5)
        found = None
        for a, b in [(0, 99), (2, 150), (10, 30), (4, 77)]:
            p = g.shortest_path(a, b, EdgeType.CALLS, max_len=8)
            if p is not None:
                found = (a, b, len(p))
                break
        assert found is not None, "graph too sparse for the test seed"
        a, b, plain_len = found
        g.DEVICE_BFS_THRESHOLD = 1
        p2 = g.shortest_path(a, b, EdgeType.CALLS, max_len=8)
        assert p2 is not None and len(p2) == plain_len
        # corridor correctly reports unreachable pairs as None
        iso = g.add_node("m.isolated", EntityType.FUNCTION, "m.py")
        g.finalize()
        g.DEVICE_BFS_THRESHOLD = 1
        assert g.shortest_path(a, iso, EdgeType.CALLS, max_len=8) is None


class TestBulkConstruction:
    def test_bulk_equals_incremental(self):
        g1, g2 = GraphStore(), GraphStore()
        names = [f"m.f{i}" for i in range(50)]
        rng = np.random.default_rng(0)
        src = rng.integers(0, 50, 120)
        dst = rng.integers(0, 50, 120)
        ids = g1.add_nodes_bulk(names, EntityType.FUNCTION, "m.py")
        g1.add_edges_bulk(src, dst, EdgeType.CALLS)
        for n in names:
            g2.add_node(n, EntityType.FUNCTION, "m.py")
        for s, d in zip(src, dst):
            g2.add_edge(int(s), int(d), EdgeType.CALLS)
        g1.finalize()
        g2.finalize()
        assert ids.tolist() == list(range(50))
        assert g1.id_of("m.f7") == g2.id_of("m.f7") == 7
        assert g1.k_hop([3], EdgeType.CALLS, hops=3, device=False) == \
            g2.k_hop([3], EdgeType.CALLS, hops=3, device=False)
        assert g1.stats == g2.stats

    def test_bulk_rejects_duplicates(self):
        from lattice_tpu.core.errors import GraphError
        g = GraphStore()
        g.add_node("m.a", EntityType.FUNCTION, "m.py")
        with pytest.raises(GraphError):
            g.add_nodes_bulk(["m.b", "m.a"], EntityType.FUNCTION, "m.py")


class TestTracer:
    def test_span_aggregation(self):
        from lattice_tpu.utils.tracing import Tracer
        tracer = Tracer()
        for _ in range(3):
            with tracer.span("phase.x"):
                pass
        report = tracer.report()
        assert report["phase.x"]["count"] == 3
        assert report["phase.x"]["total_ms"] >= 0
        tracer.reset()
        assert tracer.report() == {}


class TestNativeBFS:
    """C++ bounded k-hop (native/lattice_native.cpp lattice_bfs_khop*)
    vs the NumPy fallback walk — the two must agree exactly, including
    tombstone relay semantics and the (depth, id) limit trim.
    Reference semantic: transitive caller/callee traversals with
    ORDER BY depth LIMIT n (`query/graph_reasoning/queries.py:2-50`)."""

    @pytest.fixture
    def random_graph(self):
        rng = np.random.default_rng(7)
        n, e = 600, 4000
        g = GraphStore()
        g.add_nodes_bulk([f"r.n{i}" for i in range(n)],
                         EntityType.FUNCTION)
        g.add_edges_bulk(rng.integers(0, n, e).astype(np.int32),
                         rng.integers(0, n, e).astype(np.int32),
                         EdgeType.CALLS)
        # tombstone a stripe WITHOUT dropping edges: dead nodes must
        # relay frontiers but never surface in results
        for i in range(0, n, 13):
            g._alive[i] = False
        g.finalize()
        return g, rng

    def test_native_library_has_bfs(self):
        from lattice_tpu.utils import native
        lib = native.get_lib()
        if lib is None:
            pytest.skip("native toolchain unavailable")
        assert hasattr(lib, "lattice_bfs_khop")
        assert hasattr(lib, "lattice_bfs_khop_batch")

    def _force_numpy(self, monkeypatch):
        from lattice_tpu.utils import native
        monkeypatch.setattr(native, "bfs_khop", lambda *a, **k: None)
        monkeypatch.setattr(native, "bfs_khop_batch",
                            lambda *a, **k: None)

    @pytest.mark.parametrize("limit", [None, 25, 3])
    @pytest.mark.parametrize("reverse", [False, True])
    def test_khop_parity_vs_numpy(self, random_graph, monkeypatch,
                                  limit, reverse):
        g, rng = random_graph
        for hops in (1, 2, 4):
            seeds = rng.integers(0, 600, 3).tolist()
            native_out = g.k_hop(seeds, EdgeType.CALLS, hops,
                                 reverse=reverse, limit=limit)
            with monkeypatch.context() as m:
                self._force_numpy(m)
                numpy_out = g.k_hop(seeds, EdgeType.CALLS, hops,
                                    reverse=reverse, limit=limit)
            assert native_out == numpy_out

    def test_dead_nodes_relay_but_never_surface(self, random_graph):
        g, _ = random_graph
        out = g.k_hop([1, 2, 3], EdgeType.CALLS, 4)
        assert out and all(g._alive[v] for v in out)

    def test_dead_seed_expands(self, call_graph):
        g, ids = call_graph
        g._alive[ids["a"]] = False
        g._alive_np = None   # invalidate cached alive array
        out = g.k_hop([ids["a"]], EdgeType.CALLS, 1)
        assert ids["b"] in out and ids["c"] in out

    def test_batch_parity_vs_numpy(self, random_graph, monkeypatch):
        g, rng = random_graph
        seed_sets = [rng.integers(0, 600, 2).tolist() for _ in range(12)]
        seed_sets.append([])          # empty seed set row
        seed_sets.append([9999, -1])  # out-of-range seeds dropped
        native_out = g.k_hop_batch(seed_sets, EdgeType.CALLS, 3, limit=25)
        with monkeypatch.context() as m:
            self._force_numpy(m)
            numpy_out = g.k_hop_batch(seed_sets, EdgeType.CALLS, 3,
                                      limit=25)
        assert native_out == numpy_out

    def test_limit_is_depth_then_id_prefix(self, random_graph):
        g, rng = random_graph
        seeds = rng.integers(0, 600, 2).tolist()
        full = g.k_hop(seeds, EdgeType.CALLS, 3)
        trimmed = g.k_hop(seeds, EdgeType.CALLS, 3, limit=10)
        want = dict(sorted(full.items(),
                           key=lambda t: (t[1], t[0]))[:10])
        assert trimmed == want


class TestHostBfsBatch:
    """`_host_bfs_batch` (r4): the engine's batched deep-evidence walks
    must equal Q sequential `_host_bfs` calls exactly — same bounded
    shallowest-(depth, id) prefix, same alive filtering."""

    def _graph(self, n=400, e=1600, seed=9):
        rng = np.random.default_rng(seed)
        g = GraphStore()
        for i in range(n):
            g.add_node(f"m.f{i}", EntityType.FUNCTION, "m.py")
        for s, d in zip(rng.integers(0, n, e), rng.integers(0, n, e)):
            if s != d:
                g.add_edge(int(s), int(d), EdgeType.CALLS)
        g.finalize()
        return g

    def test_forced_native_batch_equals_sequential(self):
        g = self._graph()
        seed_sets = [[1], [5, 17], [], [200, 3, 7]]
        for reverse in (False, True):
            for limit in (0, 25):
                batch = g._host_bfs_batch(seed_sets, EdgeType.CALLS, 4,
                                          reverse=reverse, limit=limit,
                                          force_batch=True)
                for ss, (ids, depths) in zip(seed_sets, batch):
                    w_ids, w_d = g._host_bfs(ss, EdgeType.CALLS, 4,
                                             reverse=reverse, limit=limit)
                    np.testing.assert_array_equal(ids, w_ids)
                    np.testing.assert_array_equal(depths, w_d)

    def test_small_host_falls_back_to_loop(self, monkeypatch):
        """On a <=2-core host the per-query loop serves (OpenMP contends
        with the TPU runtime in-process — 7.4k vs 16.3k walks/s, r4)."""
        import os

        from lattice_tpu.utils import native

        g = self._graph(seed=10)
        monkeypatch.setattr(os, "cpu_count", lambda: 1)
        called = []
        orig = native.bfs_khop_batch
        monkeypatch.setattr(native, "bfs_khop_batch",
                            lambda *a, **kw: called.append(1) or orig(*a, **kw))
        out = g._host_bfs_batch([[1], [2], [3], [4]], EdgeType.CALLS, 3,
                                limit=10)
        assert called == [] and len(out) == 4
