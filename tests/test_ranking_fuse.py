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
