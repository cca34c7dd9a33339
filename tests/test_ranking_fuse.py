"""Device ranking fuse vs NumPy oracle + language config registry checks."""

import numpy as np

import jax.numpy as jnp

from lattice_tpu.core.types import Language
from lattice_tpu.ops.graph_kernels import UNREACHED
from lattice_tpu.ops.ranking import (
    FuseWeights,
    NEG_INF,
    fused_rank,
    pack_weights,
    rank_oracle,
)


class TestFusedRank:
    def _inputs(self, n=200, seed=0):
        rng = np.random.default_rng(seed)
        depth = np.where(rng.random(n) < 0.3,
                         rng.integers(0, 5, n), UNREACHED).astype(np.int32)
        relevance = rng.random(n).astype(np.float32)
        vec = np.where(rng.random(n) < 0.4,
                       rng.random(n), NEG_INF).astype(np.float32)
        match = (rng.random(n) < 0.1).astype(np.float32)
        degree = rng.integers(0, 100, n).astype(np.int32)
        quality = rng.random(n).astype(np.float32)
        return depth, relevance, vec, match, degree, quality

    def test_matches_oracle(self):
        w = FuseWeights()
        depth, rel, vec, match, deg, qual = self._inputs()
        s, i = fused_rank(
            jnp.asarray(depth), jnp.asarray(rel), jnp.asarray(vec),
            jnp.asarray(match), jnp.asarray(deg), jnp.asarray(qual),
            jnp.asarray(pack_weights(w)), 20)
        o_s, o_i = rank_oracle(depth, rel, vec, match, deg, qual, w, 20)
        np.testing.assert_allclose(np.asarray(s), o_s, atol=1e-5)
        # ties can permute; compare as score-sorted sets
        assert set(np.asarray(i).tolist()) == set(o_i.tolist())

    def test_hybrid_beats_single_side(self):
        w = FuseWeights()
        depth = np.asarray([0, 0, UNREACHED], np.int32)
        rel = np.asarray([1.0, 1.0, 0.0], np.float32)
        vec = np.asarray([0.9, NEG_INF, 0.9], np.float32)
        match = np.zeros(3, np.float32)
        deg = np.zeros(3, np.int32)
        qual = np.ones(3, np.float32)
        s, i = fused_rank(
            jnp.asarray(depth), jnp.asarray(rel), jnp.asarray(vec),
            jnp.asarray(match), jnp.asarray(deg), jnp.asarray(qual),
            jnp.asarray(pack_weights(w)), 3)
        i = np.asarray(i)
        assert i[0] == 0  # hybrid node ranks first

    def test_absent_nodes_excluded(self):
        w = FuseWeights()
        depth = np.full(5, UNREACHED, np.int32)
        vec = np.full(5, NEG_INF, np.float32)
        s, _ = fused_rank(
            jnp.asarray(depth), jnp.zeros(5), jnp.asarray(vec),
            jnp.zeros(5), jnp.zeros(5, np.int32), jnp.zeros(5),
            jnp.asarray(pack_weights(w)), 5)
        assert np.all(np.asarray(s) <= NEG_INF / 2)


class TestFusedRankRows:
    def test_row_join_matches_flat_fuse(self):
        """fused_rank_rows (node->row gather form) must equal fused_rank
        on pre-gathered arrays when rows map 1:1 to nodes."""
        import jax.numpy as jnp

        from lattice_tpu.ops.graph_kernels import UNREACHED
        from lattice_tpu.ops.ranking import (FuseWeights, fused_rank,
                                             fused_rank_rows, pack_weights)
        rng = np.random.default_rng(0)
        n = 96
        depth = np.full(n, UNREACHED, np.int32)
        depth[rng.choice(n, 20, replace=False)] = rng.integers(1, 4, 20)
        degree = rng.integers(0, 80, n).astype(np.int32)
        vec = np.where(rng.random(n) < 0.5,
                       rng.random(n).astype(np.float32), -1e30)
        match = (rng.random(n) < 0.2).astype(np.float32)
        quality = rng.random(n).astype(np.float32)
        rel_scalar = 0.7
        rel_nodes = np.full(n, rel_scalar, np.float32)
        w = jnp.asarray(pack_weights(FuseWeights()))
        rel_flat = np.where(depth < UNREACHED, rel_scalar, 0.0).astype(
            np.float32)
        s1, i1 = fused_rank(jnp.asarray(depth), jnp.asarray(rel_flat),
                            jnp.asarray(vec), jnp.asarray(match),
                            jnp.asarray(degree), jnp.asarray(quality), w, 10)
        s2, i2 = fused_rank_rows(
            jnp.asarray(depth), jnp.asarray(degree),
            jnp.arange(n, dtype=jnp.int32), jnp.asarray(rel_nodes),
            jnp.asarray(vec), jnp.asarray(match), jnp.asarray(quality),
            w, 10)
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   atol=1e-6)
        np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))

    def test_rows_without_nodes_rank_on_vector_side(self):
        import jax.numpy as jnp

        from lattice_tpu.ops.graph_kernels import UNREACHED
        from lattice_tpu.ops.ranking import (FuseWeights, fused_rank_rows,
                                             pack_weights)
        n_nodes, n_rows = 16, 8
        dist = np.zeros(n_nodes, np.int32)  # every NODE reached
        node_ids = np.full(n_rows, -1, np.int32)  # but no row joins one
        vec = np.linspace(0.9, 0.2, n_rows).astype(np.float32)
        s, rows = fused_rank_rows(
            jnp.asarray(dist), jnp.zeros(n_nodes, jnp.int32),
            jnp.asarray(node_ids),
            jnp.full(n_nodes, 0.7, jnp.float32), jnp.asarray(vec),
            jnp.zeros(n_rows, jnp.float32), jnp.ones(n_rows, jnp.float32),
            jnp.asarray(pack_weights(FuseWeights())), 4)
        assert np.asarray(rows)[0] == 0  # best cosine wins, no graph side


class TestHybridRankDevice:
    def test_matches_composition(self):
        """The single-execution hybrid (normalize + cosine + scatter +
        fuse + select) must equal the op-by-op composition."""
        import jax.numpy as jnp

        from lattice_tpu.ops.ranking import (FuseWeights,
                                             fused_rank_rows_sparse,
                                             hybrid_rank_device,
                                             pack_weights)
        rng = np.random.default_rng(4)
        n, d = 256, 32
        emb = rng.normal(size=(n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        valid = np.ones(n, bool)
        valid[[5, 99]] = False
        q = rng.normal(size=(d,)).astype(np.float32) * 3.0  # unnormalized
        reach = np.full(32, -1, np.int32)
        reach[:4] = [7, 11, 40, 99]  # 99 is invalid: vector side masked
        depths = np.zeros(32, np.int32)
        depths[:4] = [0, 1, 2, 1]
        rel = np.zeros(32, np.float32)
        rel[:4] = 0.7
        degree = rng.integers(0, 60, n).astype(np.int32)
        match = np.zeros(n, np.float32)
        quality = np.ones(n, np.float32)
        w = jnp.asarray(pack_weights(FuseWeights()))

        s1, r1 = hybrid_rank_device(
            jnp.asarray(q), jnp.asarray(emb), jnp.asarray(valid),
            jnp.asarray(reach), jnp.asarray(depths), jnp.asarray(rel),
            jnp.asarray(degree), jnp.asarray(match), jnp.asarray(quality),
            w, 8)
        qn = q / np.linalg.norm(q)
        vec = np.where(valid, emb @ qn, -1e30).astype(np.float32)
        s2, r2 = fused_rank_rows_sparse(
            jnp.asarray(reach), jnp.asarray(depths), jnp.asarray(rel),
            jnp.asarray(degree), jnp.asarray(vec), jnp.asarray(match),
            jnp.asarray(quality), w, 8)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   atol=1e-5)


class TestHybridRankDevicePacked:
    """The 4 B/entry packed-reach path must equal the three-array path
    entry for entry, including the in-execution entity-match scatter."""

    def _setup(self, seed=9):
        import jax.numpy as jnp

        from lattice_tpu.ops.ranking import FuseWeights, pack_weights
        rng = np.random.default_rng(seed)
        n, d = 300, 32
        emb = rng.normal(size=(n, d)).astype(np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        valid = np.ones(n, bool)
        valid[[5, 120]] = False
        q = rng.normal(size=(d,)).astype(np.float32) * 2.0
        degree = rng.integers(0, 60, n).astype(np.int32)
        quality = np.ones(n, np.float32)
        w = jnp.asarray(pack_weights(FuseWeights()))
        return rng, n, emb, valid, q, degree, quality, w

    def test_matches_unpacked(self):
        import jax.numpy as jnp

        from lattice_tpu.ops.ranking import (hybrid_rank_device,
                                             hybrid_rank_device_packed,
                                             pack_reach)
        rng, n, emb, valid, q, degree, quality, w = self._setup()
        rel_table = np.asarray([1.0, 0.9, 0.7, 0.0], np.float32)
        rows = rng.choice(n, size=20, replace=False).astype(np.int32)
        depths = rng.integers(0, 6, 20).astype(np.int32)
        cls = rng.integers(0, 3, 20).astype(np.uint8)
        match_rows = np.asarray([3, 17, -1, -1], np.int32)

        packed = pack_reach(rows, depths, cls, 32)
        s1, r1 = hybrid_rank_device_packed(
            jnp.asarray(q), jnp.asarray(emb), jnp.asarray(valid),
            jnp.asarray(packed), jnp.asarray(rel_table),
            jnp.asarray(match_rows), jnp.asarray(degree),
            jnp.asarray(quality), w, 10)

        reach = np.full(32, -1, np.int32)
        reach[:20] = rows
        dep = np.zeros(32, np.int32)
        dep[:20] = depths
        rel = np.zeros(32, np.float32)
        rel[:20] = rel_table[cls]
        match = np.zeros(n, np.float32)
        match[[3, 17]] = 1.0
        s2, r2 = hybrid_rank_device(
            jnp.asarray(q), jnp.asarray(emb), jnp.asarray(valid),
            jnp.asarray(reach), jnp.asarray(dep), jnp.asarray(rel),
            jnp.asarray(degree), jnp.asarray(match),
            jnp.asarray(quality), w, 10)
        np.testing.assert_array_equal(np.asarray(r1), np.asarray(r2))
        np.testing.assert_allclose(np.asarray(s1), np.asarray(s2),
                                   atol=1e-5)

    def test_pack_reach_roundtrip_and_bounds(self):
        from lattice_tpu.ops.ranking import (REACH_ROW_BITS,
                                             REACH_ROW_MASK, pack_reach)
        rows = np.asarray([0, REACH_ROW_MASK, 12345], np.int64)
        depths = np.asarray([0, 15, 99], np.int64)   # 99 clamps to 15
        cls = np.asarray([0, 3, 2], np.uint8)
        p = pack_reach(rows, depths, cls, 8)
        assert (p[3:] == -1).all()
        got_rows = p[:3] & REACH_ROW_MASK
        got_depth = (p[:3] >> REACH_ROW_BITS) & 15
        got_cls = (p[:3] >> 29) & 3
        np.testing.assert_array_equal(got_rows, rows)
        np.testing.assert_array_equal(got_depth, [0, 15, 15])
        np.testing.assert_array_equal(got_cls, cls)
        with np.testing.assert_raises(ValueError):
            pack_reach(np.asarray([1 << REACH_ROW_BITS]),
                       np.zeros(1), np.zeros(1), 4)

    def test_truncates_overflowing_reach(self):
        from lattice_tpu.ops.ranking import pack_reach
        p = pack_reach(np.arange(100), np.zeros(100), np.zeros(100), 16)
        assert len(p) == 16 and (p >= 0).all()

    def test_batch_matches_per_query(self):
        """The one-execution Q-query scan must equal Q single packed
        calls exactly (same scatter, fuse, and selection per row)."""
        import jax.numpy as jnp

        from lattice_tpu.ops.ranking import (
            hybrid_rank_device_packed, hybrid_rank_device_packed_batch,
            pack_reach)
        rng, n, emb, valid, q, degree, quality, w = self._setup(11)
        rel_table = np.asarray([1.0, 0.9, 0.7, 0.0], np.float32)
        Q = 5
        queries = rng.normal(size=(Q, 32)).astype(np.float32)
        packed = np.stack([
            pack_reach(rng.choice(n, size=12, replace=False),
                       rng.integers(0, 6, 12), rng.integers(0, 3, 12), 16)
            for _ in range(Q)])
        match = np.full((Q, 4), -1, np.int32)
        match[0, :2] = [3, 17]
        match[2, 0] = 40
        bs, bi = hybrid_rank_device_packed_batch(
            jnp.asarray(queries), jnp.asarray(emb), jnp.asarray(valid),
            jnp.asarray(packed), jnp.asarray(rel_table),
            jnp.asarray(match), jnp.asarray(degree),
            jnp.asarray(quality), w, 7)
        for qi in range(Q):
            s1, i1 = hybrid_rank_device_packed(
                jnp.asarray(queries[qi]), jnp.asarray(emb),
                jnp.asarray(valid), jnp.asarray(packed[qi]),
                jnp.asarray(rel_table), jnp.asarray(match[qi]),
                jnp.asarray(degree), jnp.asarray(quality), w, 7)
            np.testing.assert_array_equal(np.asarray(bi)[qi],
                                          np.asarray(i1))
            np.testing.assert_allclose(np.asarray(bs)[qi],
                                       np.asarray(s1), atol=1e-5)


class TestResultSerialization:
    def test_reference_dict_shape(self):
        """Parity: `query/ranking/utils.py:6-30` transport layout."""
        from lattice_tpu.core.types import ResultSource
        from lattice_tpu.query.ranking.models import RankedResult
        from lattice_tpu.query.ranking.utils import (
            ranked_results_to_search_results,
        )
        r = RankedResult(
            name="create_user", qualified_name="app.svc.create_user",
            entity_type="function", file_path="app/svc.py",
            start_line=10, end_line=30, source=ResultSource.HYBRID,
            score=0.91, content="def create_user(): ...",
            depth=2, relationship="caller")
        out = ranked_results_to_search_results([r])
        assert len(out) == 1
        d = out[0]
        assert d["source"] == "hybrid" and d["score"] == 0.91
        assert d["entity_name"] == "create_user"
        assert d["graph_node_id"] == "app.svc.create_user"
        assert d["metadata"]["depth_from_query"] == 2
        assert d["metadata"]["relationship"] == "caller"
        assert isinstance(d["metadata"]["signal_scores"], dict)


class TestLanguageConfigs:
    def test_nine_configs(self):
        from lattice_tpu.parsing.language_config import (
            LANGUAGE_CONFIGS,
            config_for_extension,
            get_language_config,
            wired_languages,
        )
        assert len(LANGUAGE_CONFIGS) == 9
        assert get_language_config(Language.RUST).fqn.separator == "::"
        assert config_for_extension(".tsx").supports_interfaces
        assert set(wired_languages()) == {
            Language.PYTHON, Language.JAVASCRIPT, Language.JSX,
            Language.TYPESCRIPT, Language.TSX,
        }

    def test_extension_map_consistent(self):
        from lattice_tpu.parsing.language_config import EXTENSION_TO_CONFIG
        for ext, cfg in EXTENSION_TO_CONFIG.items():
            assert ext.startswith(".")
            assert ext in cfg.extensions


class TestGraphStatistics:
    def test_project_stats(self):
        from lattice_tpu.core.types import EdgeType, EntityType
        from lattice_tpu.graph.statistics import GraphStatistics
        from lattice_tpu.index.graph_store import GraphStore
        store = GraphStore()
        a = store.add_node("a.f", EntityType.FUNCTION, "proj_a/m.py")
        b = store.add_node("b.f", EntityType.FUNCTION, "proj_b/m.py")
        store.add_edge(a, b, EdgeType.CALLS)
        store.finalize()
        stats = GraphStatistics(store)
        pa = stats.get_project_statistics("proj_a/")
        assert pa["nodes"] == 1
        assert pa["edges"]["CALLS"] == 1
        hist = stats.degree_histogram()
        assert sum(hist.values()) == 2
