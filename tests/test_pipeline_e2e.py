"""End-to-end pipeline + query tests over the fixture project.

Parity model: reference `tests/test_pipeline.py` (orchestrator sequencing,
ProgressTracker state) + `TestPipelineIntegration` full-pipeline run — here
runnable unconditionally because the default providers are offline.
"""

import asyncio

import pytest

from lattice_tpu.core.types import EdgeType, PipelineStage
from lattice_tpu.embeddings.embedder import Embedder
from lattice_tpu.pipeline.orchestrator import PipelineOrchestrator
from lattice_tpu.pipeline.progress import ProgressTracker
from lattice_tpu.providers.hash_provider import HashEmbedder
from lattice_tpu.query.engine import QueryEngine
from lattice_tpu.query.query_planner import QueryIntent


@pytest.fixture(scope="module")
def indexed(sample_project_path):
    from lattice_tpu.config.settings import Settings
    settings = Settings()
    # keep the checked-in fixture tree pristine (no .lattice side effects)
    settings.metadata.enabled = False
    embedder = Embedder(HashEmbedder(dimensions=256))
    orchestrator = PipelineOrchestrator(
        sample_project_path, embedder, project_name="sample",
        settings=settings)
    ctx = asyncio.run(orchestrator.run())
    return ctx


class TestPipeline:
    def test_all_files_parsed(self, indexed):
        assert len(indexed.files) == 7 + 5  # source + __init__ files
        parsed_paths = {p.file_info.relative_path for p in indexed.parsed}
        assert "app/services/user_service.py" in parsed_paths
        assert "web/components/UserCard.tsx" in parsed_paths

    def test_graph_built(self, indexed):
        store = indexed.graph_builder.store
        stats = store.stats
        assert stats["nodes"] > 20
        assert stats["edges"]["CALLS"] > 5
        assert stats["edges"]["EXTENDS"] >= 2  # User->BaseModel, AdminUser->User
        assert stats["edges"]["IMPORTS"] >= 2

    def test_inheritance_chain(self, indexed):
        store = indexed.graph_builder.store
        admin = store.id_of("app.models.user.AdminUser")
        base = store.id_of("app.models.base.BaseModel")
        assert admin is not None and base is not None
        closure = store.k_hop([admin], EdgeType.EXTENDS, hops=5)
        assert base in closure and closure[base] == 2

    def test_cross_file_call_edge(self, indexed):
        store = indexed.graph_builder.store
        create = store.id_of("app.services.user_service.UserService.create_user")
        validator = store.id_of("app.utils.validators.validate_email_format")
        assert create is not None and validator is not None
        callees = store.k_hop([create], EdgeType.CALLS, hops=1)
        assert validator in callees

    def test_chunks_embedded(self, indexed):
        assert len(indexed.indexer.code) > 20
        assert indexed.indexer.stats["files_indexed"] > 0

    def test_incremental_skip_on_rerun(self, indexed, sample_project_path):
        from lattice_tpu.config.settings import Settings
        settings = Settings()
        settings.metadata.enabled = False
        embedder = Embedder(HashEmbedder(dimensions=256))
        orchestrator = PipelineOrchestrator(
            sample_project_path, embedder, project_name="sample",
            indexer=indexed.indexer, settings=settings)
        ctx2 = asyncio.run(orchestrator.run())
        # every file that produced chunks on run 1 is hash-skipped on run 2
        # (empty __init__.py files produce no chunks and are counted in
        # neither bucket)
        assert ctx2.indexer.stats["files_skipped"] == \
            ctx2.indexer.stats["files_indexed"] > 0


class TestProgressTracker:
    def test_stage_weighting(self):
        tracker = ProgressTracker()
        tracker.start()
        assert tracker.overall_pct == 0.0
        tracker.start_stage(PipelineStage.SCANNING, total=10)
        tracker.advance(10)
        tracker.finish_stage()
        assert tracker.overall_pct == pytest.approx(5.0)
        for stage in (PipelineStage.PARSING, PipelineStage.GRAPH_BUILDING,
                      PipelineStage.SUMMARIZING, PipelineStage.METADATA,
                      PipelineStage.EMBEDDING):
            tracker.start_stage(stage, total=1)
            tracker.advance(1)
            tracker.finish_stage()
        assert tracker.overall_pct == pytest.approx(100.0)

    def test_callback_fanout_and_stats(self):
        tracker = ProgressTracker()
        seen = []
        tracker.add_callback(lambda snap: seen.append(snap))
        tracker.start()
        tracker.start_stage(PipelineStage.PARSING, total=2)
        tracker.advance(1, files_parsed=1, entities_found=3)
        assert seen[-1].files_parsed == 1
        assert seen[-1].entities_found == 3
        assert 0 < seen[-1].stage_pct <= 50

    def test_failure_records_error(self):
        tracker = ProgressTracker()
        tracker.start()
        tracker.fail("boom")
        assert tracker.failed
        assert tracker.stats["errors"] == 1


class TestQueryEngine:
    @pytest.fixture(scope="class")
    def engine(self, indexed):
        return QueryEngine(indexed.graph_builder.store, indexed.indexer)

    def test_find_usage(self, engine):
        result = engine.search_sync("who calls validate_email_format?")
        assert result.query_plan.intent == QueryIntent.FIND_USAGE
        names = [r.qualified_name for r in result.results]
        assert "app.services.user_service.UserService.create_user" in names

    def test_hierarchy_query(self, engine):
        result = engine.search_sync("what is the class hierarchy of AdminUser?")
        assert result.query_plan.intent == QueryIntent.FIND_HIERARCHY
        names = [r.qualified_name for r in result.results]
        assert "app.models.user.User" in names
        assert "app.models.base.BaseModel" in names

    def test_semantic_search(self, engine):
        result = engine.search_sync("check email address format validity")
        names = [r.qualified_name for r in result.results[:5]]
        assert any("validate" in n for n in names)

    def test_call_chain(self, engine):
        result = engine.search_sync(
            "call chain from handle_create_user to save")
        assert result.query_plan.intent == QueryIntent.FIND_CALL_CHAIN
        assert result.graph_context.paths, "expected at least one path"
        rendered = result.graph_context.paths[0].render()
        assert "handle_create_user" in rendered

    def test_query_produces_answer_offline(self, engine):
        result = engine.query_sync("explain UserService.get_user")
        assert result.answer
        assert "get_user" in result.answer
        assert result.phase_times_ms["response_ms"] >= 0

    def test_graceful_on_gibberish(self, engine):
        result = engine.search_sync("zzqx nonexistent_thing_xyz")
        assert isinstance(result.results, list)


class TestPersistence:
    def test_mutated_roundtrip_preserves_rankings(self, sample_project_path,
                                                  tmp_path):
        """Save/load AFTER real churn (file delete, row removal,
        compaction): the reloaded index must return exactly the live
        store's search ranking and graph reach — freelist holes and
        compaction remaps must survive the manifest. Builds its OWN
        index: the churn below must not leak into the shared
        module-scoped fixture."""
        import numpy as np

        from lattice_tpu.config.settings import Settings
        from lattice_tpu.core.types import EdgeType
        from lattice_tpu.storage import persistence

        settings = Settings()
        settings.metadata.enabled = False
        embedder0 = Embedder(HashEmbedder(dimensions=256))
        orch = PipelineOrchestrator(sample_project_path, embedder0,
                                    project_name="mut",
                                    settings=settings)
        indexed = asyncio.run(orch.run())
        store = indexed.graph_builder.store
        code = indexed.indexer.code
        victim = indexed.files[0].relative_path
        code.delete_file(victim)
        store.remove_file_nodes(victim)
        store.finalize()
        live_rows = [r for r, p in enumerate(code._payloads)
                     if p is not None]
        code.remove(live_rows[:2])
        code.compact()
        persistence.save_index(
            tmp_path, store, indexed.indexer, project="mut",
            provider="hash", file_hashes={})
        embedder = Embedder(HashEmbedder(dimensions=256))
        graph2, indexer2, _ = persistence.load_index(tmp_path, embedder)
        assert len(indexer2.code) == len(code)
        q = np.random.default_rng(0).normal(size=256).astype(np.float32)
        want = code.search(q, k=8, method="flat")[0]
        got = indexer2.code.search(q, k=8, method="flat")[0]
        assert [(r, p.get("content_hash")) for r, _, p in got] == \
               [(r, p.get("content_hash")) for r, _, p in want]
        seeds = [n for n in range(store.n_nodes())
                 if store._alive_arr()[n]][:3]
        assert graph2.k_hop(seeds, EdgeType.CALLS, hops=3) == \
               store.k_hop(seeds, EdgeType.CALLS, hops=3)

    def test_roundtrip(self, indexed, tmp_path):
        from lattice_tpu.storage import persistence
        store = indexed.graph_builder.store
        persistence.save_index(
            tmp_path, store, indexed.indexer, project="sample",
            provider="hash",
            file_hashes={f.relative_path: f.content_hash
                         for f in indexed.files})
        embedder = Embedder(HashEmbedder(dimensions=256))
        graph2, indexer2, manifest = persistence.load_index(tmp_path, embedder)
        assert manifest["project"] == "sample"
        assert graph2.stats["nodes"] == store.stats["nodes"]
        assert graph2.stats["edges"] == store.stats["edges"]
        assert len(indexer2.code) == len(indexed.indexer.code)
        # loaded index answers the same query
        engine = QueryEngine(graph2, indexer2)
        result = engine.search_sync("who calls validate_email_format?")
        names = [r.qualified_name for r in result.results]
        assert "app.services.user_service.UserService.create_user" in names

    def test_ivf_partition_roundtrip(self, tmp_path):
        # clustering + recall self-measure are the expensive build parts;
        # they must survive save/load (only bucket data regenerates)
        import numpy as np
        from lattice_tpu.index.chunk_store import ChunkStore
        from lattice_tpu.storage import persistence
        rng = np.random.default_rng(0)
        centers = rng.normal(size=(4, 32))
        centers /= np.linalg.norm(centers, axis=1, keepdims=True)
        assign = rng.integers(0, 4, size=200)
        emb = centers[assign] + 0.05 * rng.normal(size=(200, 32))
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        s = ChunkStore(dim=32, dtype="float32")
        s.add(emb, [{"file_path": f"f{i}.py", "content_hash": "h"}
                    for i in range(200)])
        s.build_ivf(n_clusters=4)
        assert s._ivf.measured_recall is not None
        persistence.save_chunks(s, tmp_path, "code_chunks")
        s2 = persistence.load_chunks(tmp_path, "code_chunks", 32, "float32")
        assert s2._ivf is not None and not s2._ivf_dirty
        assert s2._ivf.measured_recall == s._ivf.measured_recall
        # restored partition serves: same top hit as a fresh search
        q = emb[:2] + 0.001
        got = s2.search_ivf(q, k=3, nprobe=4)
        want = s.search_ivf(q, k=3, nprobe=4)
        assert [h[0][0] for h in got] == [h[0][0] for h in want]

    def test_hollow_ivf_verdict_roundtrip(self, tmp_path):
        # a recall-refused partition reloads as hollow WITH its verdict,
        # so the dispatcher never rebuilds just to refuse again
        import numpy as np
        from lattice_tpu.index.chunk_store import ChunkStore
        from lattice_tpu.storage import persistence
        rng = np.random.default_rng(1)
        emb = rng.normal(size=(100, 16))
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        s = ChunkStore(dim=16, dtype="float32")
        s.add(emb, [{"file_path": "a.py", "content_hash": "h"}] * 100)
        s.build_ivf(n_clusters=4)
        s._ivf.measured_recall = 0.2       # simulate the refusal verdict
        s._ivf.release_buckets()
        persistence.save_chunks(s, tmp_path, "code_chunks")
        s2 = persistence.load_chunks(tmp_path, "code_chunks", 16, "float32")
        assert s2._ivf is not None and s2._ivf.hollow
        assert s2._ivf.measured_recall == 0.2
        assert not s2._ivf_dirty           # verdict stands, no rebuild

    def test_weights_fingerprint_saved_and_mismatch_warns(
            self, indexed, tmp_path, caplog):
        import logging
        from lattice_tpu.storage import persistence
        persistence.save_index(
            tmp_path, indexed.graph_builder.store, indexed.indexer,
            project="sample", provider="hash", file_hashes={})
        manifest = persistence.read_manifest(tmp_path)
        assert manifest["weights_fingerprint"]
        # same embedder: no warning
        embedder = Embedder(HashEmbedder(dimensions=256))
        with caplog.at_level(logging.WARNING,
                             logger="lattice_tpu.storage.persistence"):
            persistence.load_index(tmp_path, embedder)
        assert "encoder" not in caplog.text
        # different weights (fingerprint forged): loud warning
        class OtherWeights(HashEmbedder):
            fingerprint = "unixcoder-pretrained+ft-deadbeef"
        with caplog.at_level(logging.WARNING,
                             logger="lattice_tpu.storage.persistence"):
            persistence.load_index(tmp_path, Embedder(OtherWeights(dimensions=256)))
        assert "encoder" in caplog.text

    def test_dim_mismatch_rejected(self, indexed, tmp_path):
        from lattice_tpu.core.errors import StorageError
        from lattice_tpu.storage import persistence
        persistence.save_index(
            tmp_path, indexed.graph_builder.store, indexed.indexer,
            project="sample", provider="hash", file_hashes={})
        embedder = Embedder(HashEmbedder(dimensions=128))
        with pytest.raises(StorageError):
            persistence.load_index(tmp_path, embedder)


class TestMetadataInPipeline:
    def test_metadata_generated_by_default(self, tmp_path, sample_project_path):
        import shutil
        from lattice_tpu.metadata.repository import MetadataRepository
        root = tmp_path / "proj"
        shutil.copytree(sample_project_path, root)
        embedder = Embedder(HashEmbedder(dimensions=64))
        orchestrator = PipelineOrchestrator(root, embedder, project_name="mp")
        asyncio.run(orchestrator.run())
        repo = MetadataRepository(root / ".lattice")
        meta = repo.get_latest("mp")
        assert meta is not None
        assert meta["status"] in ("completed", "partial")
        assert meta["tech_stack"]["languages"]["python"] > 0


class TestAsyncProviderPath:
    def test_pipeline_with_async_factory_provider(self, tmp_path,
                                                  sample_project_path):
        """The CLI path uses async providers; the summarize stage must not
        call sync embeds on the event loop (regression: on-device E2E)."""
        import shutil
        from lattice_tpu.config.settings import Settings
        from lattice_tpu.providers.hash_provider import HashEmbeddingProvider
        from lattice_tpu.providers.base import ProviderConfig
        root = tmp_path / "proj"
        shutil.copytree(sample_project_path, root)
        settings = Settings()
        settings.metadata.enabled = False
        provider = HashEmbeddingProvider(
            ProviderConfig(name="hash", dimensions=64))
        orchestrator = PipelineOrchestrator(
            root, Embedder(provider), project_name="async-path",
            settings=settings)
        ctx = asyncio.run(orchestrator.run())
        assert not ctx.errors, ctx.errors[:3]
        assert len(ctx.indexer.code) > 0
        assert len(ctx.indexer.summaries) > 0


class TestDeepSearch:
    def test_deep_matches_known_targets(self, indexed):
        engine = QueryEngine(indexed.graph_builder.store, indexed.indexer)
        result = engine.deep_search("who calls validate_email_format?", limit=10)
        names = [r.qualified_name for r in result.results]
        assert "app.utils.validators.validate_email_format" in names or \
            "app.services.user_service.UserService.create_user" in names
        # graph-backed rows marked hybrid
        from lattice_tpu.core.types import ResultSource
        assert any(r.source == ResultSource.HYBRID for r in result.results)
        assert result.phase_times_ms["deep_fuse_ms"] >= 0

    def test_deep_semantic_only(self, indexed):
        engine = QueryEngine(indexed.graph_builder.store, indexed.indexer)
        result = engine.deep_search("email address format check", limit=5)
        assert result.results
        names = " ".join(r.qualified_name for r in result.results)
        assert "validate" in names

    def test_deep_device_path_matches_host(self, indexed):
        """The corpus-scale device join (fused_rank_rows) must agree with
        the host payload-walk path on the same query."""
        engine = QueryEngine(indexed.graph_builder.store, indexed.indexer)
        q = "who calls validate_email_format?"
        host = engine.deep_search(q, limit=10)
        engine.DEEP_DEVICE_THRESHOLD = 1  # force the device route
        dev = engine.deep_search(q, limit=10)
        host_names = [r.qualified_name for r in host.results]
        dev_names = [r.qualified_name for r in dev.results]
        # same leading result and strong overlap (device relevance is
        # direction-scalar where the host tags per-relationship)
        assert dev_names[0] == host_names[0]
        overlap = len(set(dev_names) & set(host_names)) / max(
            len(host_names), 1)
        assert overlap >= 0.7
        from lattice_tpu.core.types import ResultSource
        assert any(r.source == ResultSource.HYBRID for r in dev.results)

    def test_deep_search_batch_matches_sequential(self, indexed):
        """`deep_search_batch` (one [Q,N] cosine pass + per-query fuse
        scan in ONE execution, r4) must return exactly the sequential
        device path's rows per query — mixed intents ride per-query
        weight/relevance tables."""
        engine = QueryEngine(indexed.graph_builder.store, indexed.indexer)
        engine.DEEP_DEVICE_THRESHOLD = 1  # force the device route
        queries = [
            "who calls validate_email_format?",
            "email address format check",
            "how does UserService create users?",
        ]
        seq = [engine.deep_search(q, limit=8) for q in queries]
        batch = engine.deep_search_batch(queries, limit=8)
        assert len(batch) == len(seq)
        for one, many in zip(seq, batch):
            assert many.query_plan.intent == one.query_plan.intent
            assert ([r.qualified_name for r in many.results]
                    == [r.qualified_name for r in one.results])
            assert ([r.source for r in many.results]
                    == [r.source for r in one.results])

    def test_deep_search_batch_chunked_parity(self, indexed, monkeypatch):
        """Q above DEEP_BATCH_CHUNK splits across executions, each padded
        to a geometric Q bucket (the pad repeats the last real query);
        results must be identical to one monolithic execution and the
        pad rows must never leak into the output."""
        engine = QueryEngine(indexed.graph_builder.store, indexed.indexer)
        engine.DEEP_DEVICE_THRESHOLD = 1  # force the device route
        queries = [
            "who calls validate_email_format?",
            "email address format check",
            "how does UserService create users?",
            "where is promote used?",
            "what imports validators?",
        ]
        whole = engine.deep_search_batch(queries, limit=8)
        # 5 queries -> chunks of (2, 2, 1); the odd chunk pads 1 -> 2
        monkeypatch.setattr(type(engine), "DEEP_BATCH_CHUNK", 2)
        chunked = engine.deep_search_batch(queries, limit=8)
        assert len(chunked) == len(queries)
        for one, many in zip(whole, chunked):
            assert many.query == one.query
            assert ([r.qualified_name for r in many.results]
                    == [r.qualified_name for r in one.results])

    def test_deep_search_sharded_matches_single_chip(self, indexed,
                                                     monkeypatch):
        """LATTICE_SHARDED=1 on the 8-device mesh routes deep search
        through ShardedHybridRank (rows + rank columns sharded, ICI
        merge); single and batched results must EQUAL the replicated
        single-chip kernel's — the fuse is row-local."""
        engine = QueryEngine(indexed.graph_builder.store, indexed.indexer)
        engine.DEEP_DEVICE_THRESHOLD = 1  # force the device route
        queries = [
            "who calls validate_email_format?",
            "how does UserService create users?",
        ]
        single = [engine.deep_search(q, limit=8) for q in queries]
        batch = engine.deep_search_batch(queries, limit=8)
        monkeypatch.setenv("LATTICE_SHARDED", "1")
        sh_single = [engine.deep_search(q, limit=8) for q in queries]
        sh_batch = engine.deep_search_batch(queries, limit=8)
        for want, got in zip(single + batch, sh_single + sh_batch):
            assert ([r.qualified_name for r in got.results]
                    == [r.qualified_name for r in want.results])
            for a, b in zip(want.results, got.results):
                assert abs(a.score - b.score) < 1e-4


class TestGraphReasoningDispatch:
    @pytest.fixture(scope="class")
    def grengine(self, indexed):
        from lattice_tpu.query.graph_reasoning.engine import GraphReasoningEngine
        return GraphReasoningEngine(indexed.graph_builder.store)

    def _plan(self, text):
        from lattice_tpu.query.query_planner import QueryPlanner
        return QueryPlanner().plan_heuristic(text)

    def test_find_methods_dispatch(self, grengine):
        ctx = grengine.execute_query_plan(self._plan("methods of UserService"))
        names = {n.name for n in ctx.methods}
        assert {"create_user", "get_user", "promote"} <= names
        assert all(n.relationship == "method" for n in ctx.methods)

    def test_find_imports_dispatch(self, grengine):
        ctx = grengine.execute_query_plan(
            self._plan("what does user_service.py import?"))
        files = {n.name for n in ctx.imports}
        assert "user.py" in files or "validators.py" in files

    def test_file_context_dispatch(self, grengine):
        ctx = grengine.execute_query_plan(
            self._plan("what's in the file validators.py?"))
        names = {n.name for n in ctx.file_entities}
        assert "validate_email_format" in names
        assert any(n.in_degree + n.out_degree >= 0 for n in ctx.file_entities)

    def test_fuzzy_entity_lookup(self, grengine):
        hits = grengine.find_entity("UserServ")
        assert hits, "prefix fuzzy should match UserService"
        rec = grengine.store.node(hits[0])
        assert rec.name == "UserService"

    def test_fuzzy_gate_blocks_low_confidence_seeds(self, grengine):
        """fuzzy=False stops at the exact tiers: a 0.5-confidence
        capitalized English word ('Python') must not seed the BFS with
        arbitrary contains-matches (r5 review finding — the junk-seed
        pathology lives here, not in search_type)."""
        assert grengine.find_entity("UserServ", fuzzy=False) == []
        # exact names still resolve regardless of the gate
        assert grengine.find_entity("UserService", fuzzy=False)

    def test_unknown_entity_noted(self, grengine):
        ctx = grengine.execute_query_plan(
            self._plan("who calls totally_missing_fn?"))
        assert any("not found" in n for n in ctx.notes)

    def test_comprehensive_fallback(self, grengine):
        plan = self._plan("tell me about UserService generally please")
        ctx = grengine.execute_query_plan(plan)
        assert ctx.primary_entities
        assert ctx.methods or ctx.callers or ctx.callees


class TestIncrementalEqualsFresh:
    """THE watcher/incremental invariant: re-indexing a mutated tree
    incrementally (hash-skip + delete-stale, the watch-mode path) must
    produce the same index a from-scratch build of the final tree does.
    Reference semantic: `file_needs_update` hash checks + stale deletes
    (`embeddings/client.py:178-202`, `pipeline/orchestrator.py:326-426`)."""

    def _index(self, path, name):
        from lattice_tpu.config.settings import Settings
        settings = Settings()
        settings.metadata.enabled = False
        embedder = Embedder(HashEmbedder(dimensions=256))
        orch = PipelineOrchestrator(path, embedder, project_name=name,
                                    settings=settings)
        return asyncio.run(orch.run())

    def _signature(self, ctx):
        store = ctx.graph_builder.store
        alive = store._alive_arr()
        nodes = {store.node(n).qualified_name
                 for n in range(store.n_nodes()) if alive[n]}
        chunks = sorted(
            (p.get("qualified_name") or p.get("name") or "",
             p["content_hash"])
            for p in ctx.indexer.code._payloads if p is not None)
        edge_counts = ctx.graph_builder.store.stats["edges"]
        return nodes, chunks, edge_counts

    def test_mutate_reindex_equals_fresh(self, sample_project_path,
                                         tmp_path):
        import shutil as _shutil

        work = tmp_path / "work"
        _shutil.copytree(sample_project_path, work)
        self._index(work, "inc")

        # mutate: edit one file, add one, delete one, rename one
        svc = work / "app" / "services" / "user_service.py"
        svc.write_text(svc.read_text().replace(
            "def create_user", "def create_user_v2"))
        (work / "app" / "newmod.py").write_text(
            "def fresh_fn(x):\n    return x + 1\n")
        (work / "app" / "models" / "user.py").rename(
            work / "app" / "models" / "person.py")
        inc_ctx = self._index(work, "inc")      # incremental second pass

        fresh = tmp_path / "fresh"
        _shutil.copytree(work, fresh, ignore=_shutil.ignore_patterns(
            ".lattice"))
        fresh_ctx = self._index(fresh, "fresh")

        inc_nodes, inc_chunks, inc_edges = self._signature(inc_ctx)
        fr_nodes, fr_chunks, fr_edges = self._signature(fresh_ctx)
        assert inc_nodes == fr_nodes
        assert inc_chunks == fr_chunks
        assert inc_edges == fr_edges
        # and both answer a post-mutation query identically
        from lattice_tpu.query.engine import QueryEngine as _QE
        e_inc = _QE(inc_ctx.graph_builder.store, inc_ctx.indexer)
        e_fr = _QE(fresh_ctx.graph_builder.store, fresh_ctx.indexer)
        r_inc = e_inc.search_sync("create_user_v2")
        r_fr = e_fr.search_sync("create_user_v2")
        assert ([r.qualified_name for r in r_inc.results]
                == [r.qualified_name for r in r_fr.results])
