"""Watcher, summarizer, metadata, projects, and MCP server tests.

Parity model: reference `tests/test_summarization.py` (mocked LLM),
`tests/test_metadata_generator.py` (mocked agent), plus watcher/MCP flows
the reference leaves untested (SURVEY §2.2 notes its watcher bugs).
"""

import asyncio
import json
import os
import shutil
from pathlib import Path

import numpy as np

import pytest

from lattice_tpu.config.settings import Settings
from lattice_tpu.core.types import EdgeType
from lattice_tpu.embeddings.embedder import Embedder
from lattice_tpu.pipeline.orchestrator import PipelineOrchestrator
from lattice_tpu.pipeline.watcher import FileWatcher
from lattice_tpu.providers.hash_provider import HashEmbedder


class FakeLLM:
    """Canned-response provider (reference `test_summarization.py:21-25`)."""

    def __init__(self, response="A canned summary."):
        self.response = response
        self.calls = []

    async def complete(self, messages, **kwargs):
        self.calls.append(messages)
        return self.response


@pytest.fixture()
def workspace(tmp_path, sample_project_path):
    root = tmp_path / "proj"
    shutil.copytree(sample_project_path, root)
    return root


@pytest.fixture()
def indexed_ws(workspace):
    embedder = Embedder(HashEmbedder(dimensions=128))
    orchestrator = PipelineOrchestrator(workspace, embedder,
                                        project_name="ws")
    ctx = asyncio.run(orchestrator.run())
    return workspace, ctx


class TestWatcher:
    def test_change_detection_and_reindex(self, indexed_ws):
        workspace, ctx = indexed_ws
        watcher = FileWatcher(workspace, ctx.graph_builder, ctx.indexer,
                              ctx.parser, project_name="ws")
        watcher.prime(ctx.parsed)
        assert watcher.poll_once() == []  # steady state

        target = workspace / "app" / "utils" / "validators.py"
        target.write_text(target.read_text() + (
            "\n\ndef brand_new_helper(x):\n"
            "    \"\"\"Completely new function.\"\"\"\n"
            "    return normalize_name(x)\n"))
        events = watcher.poll_once()
        assert [e.kind for e in events] == ["changed"]
        asyncio.run(watcher.process_events(events))
        assert watcher.stats.updated == 1
        store = ctx.graph_builder.store
        nid = store.id_of("app.utils.validators.brand_new_helper")
        assert nid is not None
        # new CALLS edge resolved to the sibling function
        callees = store.k_hop([nid], EdgeType.CALLS, hops=1)
        target_id = store.id_of("app.utils.validators.normalize_name")
        assert target_id in callees
        # vectors updated too
        rows = ctx.indexer.code.scroll(
            {"graph_node_id": "app.utils.validators.brand_new_helper"})
        assert rows

    def test_delete_detection(self, indexed_ws):
        workspace, ctx = indexed_ws
        watcher = FileWatcher(workspace, ctx.graph_builder, ctx.indexer,
                              ctx.parser, project_name="ws")
        watcher.prime(ctx.parsed)
        (workspace / "app" / "api" / "routes.py").unlink()
        events = watcher.poll_once()
        assert [e.kind for e in events] == ["deleted"]
        asyncio.run(watcher.process_events(events))
        assert watcher.stats.deleted == 1
        store = ctx.graph_builder.store
        assert store.id_of("app.api.routes.handle_create_user") is None
        assert ctx.indexer.code.scroll(
            {"file_path": "app/api/routes.py"}) == []

    def test_delete_triggers_compaction(self, indexed_ws, monkeypatch):
        """Past the hole threshold the watcher compacts the stores and
        search still serves the survivors."""
        workspace, ctx = indexed_ws
        watcher = FileWatcher(workspace, ctx.graph_builder, ctx.indexer,
                              ctx.parser, project_name="ws")
        watcher.prime(ctx.parsed)
        store = ctx.indexer.code
        monkeypatch.setattr(type(store), "COMPACT_MIN_CAPACITY", 8)
        monkeypatch.setattr(type(store), "COMPACT_HOLE_FRACTION", 0.001)
        cap_before = store.capacity
        (workspace / "app" / "api" / "routes.py").unlink()
        events = watcher.poll_once()
        asyncio.run(watcher.process_events(events))
        assert store.capacity <= cap_before
        assert not store._free  # compacted: no holes left
        hits = store.search(np.ones(store.dim, np.float32), k=3)[0]
        assert hits and all(h[2] for h in hits)

    def test_directory_rename_end_to_end(self, indexed_ws):
        """A subtree move must delete every old path's nodes/vectors and
        re-index them under the new module names (the reference's watcher
        missed these — SURVEY §2.2 relative-vs-absolute delete bug)."""
        workspace, ctx = indexed_ws
        watcher = FileWatcher(workspace, ctx.graph_builder, ctx.indexer,
                              ctx.parser, project_name="ws")
        watcher.prime(ctx.parsed)
        (workspace / "app" / "utils").rename(workspace / "app" / "helpers")
        events = watcher.poll_once()
        kinds = sorted(e.kind for e in events)
        assert "deleted" in kinds and "created" in kinds
        asyncio.run(watcher.process_events(events))
        store = ctx.graph_builder.store
        # old module names gone from the graph and the vector store
        assert store.id_of("app.utils.validators.normalize_name") is None
        assert ctx.indexer.code.scroll(
            {"file_path": "app/utils/validators.py"}) == []
        # re-registered under the new package name
        moved = store.id_of("app.helpers.validators.normalize_name")
        assert moved is not None
        rows = ctx.indexer.code.scroll(
            {"graph_node_id": "app.helpers.validators.normalize_name"})
        assert rows
        # steady state afterwards: no phantom events
        assert watcher.poll_once() == []


class TestInotifyWatcher:
    """Kernel-event detection path (pipeline/inotify.py)."""

    @pytest.fixture()
    def inotify_watcher(self, indexed_ws):
        from lattice_tpu.pipeline.inotify import InotifyBackend
        if not InotifyBackend.available():
            pytest.skip("inotify unavailable")
        workspace, ctx = indexed_ws
        watcher = FileWatcher(workspace, ctx.graph_builder, ctx.indexer,
                              ctx.parser, project_name="ws",
                              backend="inotify")
        watcher.prime(ctx.parsed)
        yield workspace, ctx, watcher
        watcher.close()

    def test_backend_selected(self, inotify_watcher):
        _, _, watcher = inotify_watcher
        assert watcher.backend_name == "inotify"
        assert watcher.detect_once() == []  # steady state, no scan needed

    def test_change_create_delete_cycle(self, inotify_watcher):
        workspace, ctx, watcher = inotify_watcher
        target = workspace / "app" / "utils" / "validators.py"
        target.write_text(target.read_text() + "\n\nWATCH_SENTINEL = 1\n")
        events = watcher.detect_once()
        assert [(e.kind, e.relative_path) for e in events] == [
            ("changed", "app/utils/validators.py")]
        asyncio.run(watcher.process_events(events))

        new = workspace / "app" / "utils" / "fresh.py"
        new.write_text("def fresh():\n    return 1\n")
        events = watcher.detect_once()
        assert [(e.kind, e.relative_path) for e in events] == [
            ("created", "app/utils/fresh.py")]
        asyncio.run(watcher.process_events(events))
        assert ctx.graph_builder.store.id_of("app.utils.fresh.fresh")

        new.unlink()
        events = watcher.detect_once()
        assert [(e.kind, e.relative_path) for e in events] == [
            ("deleted", "app/utils/fresh.py")]
        asyncio.run(watcher.process_events(events))
        assert ctx.graph_builder.store.id_of("app.utils.fresh.fresh") is None

    def test_irrelevant_paths_filtered(self, inotify_watcher):
        workspace, _, watcher = inotify_watcher
        (workspace / "notes.txt").write_text("not source")
        (workspace / "app" / "data.json").write_text("{}")
        assert watcher.detect_once() == []

    def test_new_subtree_discovered(self, inotify_watcher):
        workspace, _, watcher = inotify_watcher
        sub = workspace / "app" / "newpkg"
        sub.mkdir()
        (sub / "mod.py").write_text("def in_new_pkg():\n    return 2\n")
        # mkdir event registers the watch and surfaces pre-existing files;
        # two drains cover either event ordering
        events = watcher.detect_once() + watcher.detect_once()
        assert ("created", "app/newpkg/mod.py") in [
            (e.kind, e.relative_path) for e in events]

    def test_recursive_move_of_deep_tree(self, inotify_watcher):
        """Recursive-move stress (the round-2 leftover): a nested package
        (3x3 dirs, 27 files) moves in ONE rename(2). The kernel emits no
        per-file events for the children — correctness rides on
        IN_MOVED_TO's recursive watch-tree walk plus the IN_MOVED_FROM /
        IN_MOVE_SELF full-rescan degrade (`pipeline/inotify.py:179-193`),
        and every old module must leave the graph + vector store while
        every new one registers (reference watcher parity,
        `src/lattice/pipeline/watcher.py:21-99`)."""
        import shutil
        workspace, ctx, watcher = inotify_watcher
        store = ctx.graph_builder.store
        root = workspace / "app" / "bigpkg"
        for a in range(3):
            for b in range(3):
                d = root / f"l{a}" / f"m{b}"
                d.mkdir(parents=True, exist_ok=True)
                for c in range(3):
                    (d / f"mod{c}.py").write_text(
                        f"def fn_{a}_{b}_{c}():\n    return {a + b + c}\n")
        # two drains cover dir-create vs watch-registration ordering
        events = watcher.detect_once() + watcher.detect_once()
        created = {e.relative_path for e in events if e.kind == "created"}
        assert len(created) == 27
        asyncio.run(watcher.process_events(events))
        assert store.id_of("app.bigpkg.l2.m2.mod2.fn_2_2_2") is not None

        shutil.move(str(root), str(workspace / "app" / "movedpkg"))
        events = watcher.detect_once() + watcher.detect_once()
        seen = {(e.kind, e.relative_path) for e in events}
        for a in range(3):
            for b in range(3):
                for c in range(3):
                    old = f"app/bigpkg/l{a}/m{b}/mod{c}.py"
                    new = f"app/movedpkg/l{a}/m{b}/mod{c}.py"
                    assert ("deleted", old) in seen
                    assert ("created", new) in seen
        asyncio.run(watcher.process_events(events))
        assert store.id_of("app.bigpkg.l1.m1.mod1.fn_1_1_1") is None
        assert store.id_of("app.movedpkg.l1.m1.mod1.fn_1_1_1") is not None
        assert ctx.indexer.code.scroll(
            {"file_path": "app/bigpkg/l0/m0/mod0.py"}) == []
        assert ctx.indexer.code.scroll(
            {"graph_node_id": "app.movedpkg.l0.m0.mod0.fn_0_0_0"})
        # the moved tree is still WATCHED under its new root: a write
        # there must surface without a full rescan
        tweak = workspace / "app" / "movedpkg" / "l0" / "m0" / "mod0.py"
        tweak.write_text(tweak.read_text() + "\ndef late_fn():\n"
                                             "    return 9\n")
        kinds = [(e.kind, e.relative_path) for e in watcher.detect_once()]
        assert ("changed", "app/movedpkg/l0/m0/mod0.py") in kinds
        # steady state afterwards
        assert watcher.detect_once() == []

    def test_poll_backend_forced(self, indexed_ws):
        workspace, ctx = indexed_ws
        watcher = FileWatcher(workspace, ctx.graph_builder, ctx.indexer,
                              ctx.parser, project_name="ws", backend="poll")
        assert watcher.backend_name == "poll"
        watcher.prime(ctx.parsed)
        (workspace / "app" / "extra.py").write_text("X = 1\n")
        kinds = [e.kind for e in watcher.detect_once()]
        assert kinds == ["created"]


class TestSummarizer:
    def test_llm_path(self, indexed_ws):
        from lattice_tpu.summarization.summarizer import CodeSummarizer
        _, ctx = indexed_ws
        llm = FakeLLM("Validates user emails and normalizes names.")
        summarizer = CodeSummarizer(llm)
        parsed = next(p for p in ctx.parsed
                      if p.file_info.relative_path.endswith("validators.py"))
        summary = asyncio.run(summarizer.summarize_file(parsed))
        assert summary == "Validates user emails and normalizes names."
        assert llm.calls

    def test_offline_fallback(self, indexed_ws):
        from lattice_tpu.summarization.summarizer import CodeSummarizer
        _, ctx = indexed_ws
        summarizer = CodeSummarizer(None)
        parsed = next(p for p in ctx.parsed
                      if p.file_info.relative_path.endswith("validators.py"))
        summary = asyncio.run(summarizer.summarize_file(parsed))
        assert "validators" in summary
        assert "validate_email_format" in summary

    def test_entity_summary(self, indexed_ws):
        from lattice_tpu.summarization.summarizer import CodeSummarizer
        _, ctx = indexed_ws
        summarizer = CodeSummarizer(None)
        parsed = next(p for p in ctx.parsed
                      if p.file_info.relative_path.endswith("user_service.py"))
        entity = parsed.classes[0]
        summary = asyncio.run(summarizer.summarize_entity(entity))
        assert "UserService" in summary


class TestMetadata:
    def test_generate_all_offline(self, indexed_ws, tmp_path):
        from lattice_tpu.metadata.generator import MetadataGenerator
        from lattice_tpu.metadata.repository import MetadataRepository
        workspace, ctx = indexed_ws
        repo = MetadataRepository(tmp_path / "meta")
        generator = MetadataGenerator(
            workspace, "ws", repository=repo,
            graph_store=ctx.graph_builder.store)
        record = asyncio.run(generator.generate_all())
        assert record["status"] == "completed"
        assert record["tech_stack"]["languages"]["python"] >= 5
        dep_names = [d["name"] for d in record["dependencies"]]
        assert isinstance(dep_names, list)
        assert record["folder_structure"]["name"]
        assert any(e["kind"] for e in record["entry_points"]) or \
            record["entry_points"] == []
        assert record["core_features"]
        assert "graph TD" in record["architecture_diagram"]
        # versioning + log
        assert repo.get_latest("ws")["version"] == 1
        record2 = asyncio.run(generator.generate_all())
        assert record2["version"] == 2
        log = repo.get_log("ws")
        assert len(log) == 14  # 7 fields x 2 runs
        assert all(entry["status"] == "completed" for entry in log)

    def test_llm_polish(self, workspace, tmp_path):
        from lattice_tpu.metadata.generator import MetadataGenerator
        llm = FakeLLM("A polished overview.")
        generator = MetadataGenerator(workspace, "ws", llm=llm)
        record = asyncio.run(generator.generate_all())
        assert record["project_overview"] == "A polished overview."


class TestProjects:
    def test_register_list_delete(self, indexed_ws, tmp_path):
        from lattice_tpu.projects.manager import ProjectManager
        from lattice_tpu.storage import persistence
        workspace, ctx = indexed_ws
        data_dir = workspace / ".lattice"
        persistence.save_index(
            data_dir, ctx.graph_builder.store, ctx.indexer, project="ws",
            provider="hash",
            file_hashes={f.relative_path: f.content_hash for f in ctx.files})
        manager = ProjectManager(registry_path=tmp_path / "registry.json")
        manager.repository.register("ws", workspace)
        index = manager.list_projects()
        assert index.get("ws") is not None
        assert index.get("ws").chunk_count > 0
        assert index.total_files > 0
        assert manager.delete_project("ws")
        assert not data_dir.exists()
        assert manager.get_project("ws") is None

    def test_cleanup_stale(self, tmp_path):
        from lattice_tpu.projects.manager import ProjectManager
        manager = ProjectManager(registry_path=tmp_path / "registry.json")
        manager.repository.register("ghost", tmp_path / "nowhere")
        assert manager.cleanup() == 1
        assert manager.list_projects().projects == ()


class TestMCPServer:
    @pytest.fixture()
    def server(self, indexed_ws):
        from lattice_tpu.mcp.server import MCPServer
        from lattice_tpu.storage import persistence
        workspace, ctx = indexed_ws
        persistence.save_index(
            workspace / ".lattice", ctx.graph_builder.store, ctx.indexer,
            project="ws", provider="hash", file_hashes={})
        settings = Settings()
        settings.ai.embedding_provider = "hash"
        settings.ai.embedding_dimensions = 128
        return MCPServer(workspace, settings)

    def _call(self, server, method, params=None, rid=1):
        return asyncio.run(server.handle_request(
            {"jsonrpc": "2.0", "id": rid, "method": method,
             "params": params or {}}))

    def test_initialize_and_list(self, server):
        resp = self._call(server, "initialize")
        assert resp["result"]["serverInfo"]["name"] == "lattice-tpu"
        resp = self._call(server, "tools/list")
        names = [t["name"] for t in resp["result"]["tools"]]
        assert names == ["index_repository", "query_code_graph",
                         "get_code_snippet", "semantic_search",
                         "deep_search_batch"]

    def test_semantic_search_tool(self, server):
        resp = self._call(server, "tools/call", {
            "name": "semantic_search",
            "arguments": {"query": "validate email format", "limit": 5},
        })
        payload = json.loads(resp["result"]["content"][0]["text"])
        assert payload["results"]
        assert any("validate" in r["name"] for r in payload["results"])

    def test_query_tool(self, server):
        resp = self._call(server, "tools/call", {
            "name": "query_code_graph",
            "arguments": {"question": "who calls validate_email_format?"},
        })
        payload = json.loads(resp["result"]["content"][0]["text"])
        assert payload["intent"] == "find_usage"
        assert payload["answer"]

    def test_snippet_tool_and_guard(self, server):
        resp = self._call(server, "tools/call", {
            "name": "get_code_snippet",
            "arguments": {"entity": "UserService"},
        })
        payload = json.loads(resp["result"]["content"][0]["text"])
        assert "class UserService" in payload["code"]
        # unknown entity -> error payload, not crash
        resp = self._call(server, "tools/call", {
            "name": "get_code_snippet",
            "arguments": {"entity": "DoesNotExist"},
        })
        payload = json.loads(resp["result"]["content"][0]["text"])
        assert "error" in payload

    def test_deep_search_batch_tool(self, server):
        resp = self._call(server, "tools/call", {
            "name": "deep_search_batch",
            "arguments": {"questions": [
                "who calls validate_email_format?",
                "email address format check",
            ], "limit": 5},
        })
        payload = json.loads(resp["result"]["content"][0]["text"])
        assert len(payload["answers"]) == 2
        assert payload["answers"][0]["intent"] == "find_usage"
        for ans in payload["answers"]:
            assert ans["results"]
            names = " ".join(r["name"] for r in ans["results"])
            assert "validate" in names or "UserService" in names

    def test_unknown_method(self, server):
        resp = self._call(server, "nope/nope")
        assert resp["error"]["code"] == -32601


class TestGraphSearcher:
    @pytest.fixture()
    def searcher(self, indexed_ws):
        from lattice_tpu.query.graph_search import GraphSearcher
        _, ctx = indexed_ws
        return GraphSearcher(ctx.graph_builder.store)

    def test_find_by_name_with_type_filter(self, searcher):
        hits = searcher.find_entity_by_name("UserService", entity_type="class")
        assert hits and hits[0].entity_type == "class"

    def test_invalid_entity_type_raises(self, searcher):
        from lattice_tpu.core.errors import QueryError
        with pytest.raises(QueryError):
            searcher.search_by_name("x", entity_type="nonsense")

    def test_callers_by_name(self, searcher):
        callers = searcher.find_callers("validate_email_format")
        names = [r.entity.qualified_name for r in callers]
        assert "app.services.user_service.UserService.create_user" in names

    def test_hierarchy_by_name(self, searcher):
        rels = searcher.find_class_hierarchy("AdminUser")
        kinds = {(r.entity.name, r.relationship) for r in rels}
        assert ("User", "ancestor") in kinds
        assert ("BaseModel", "ancestor") in kinds

    def test_file_entities_and_deps(self, searcher):
        ents = searcher.get_file_entities("app/services/user_service.py")
        assert any(e.name == "UserService" for e in ents)
        deps = searcher.find_file_dependencies("app/services/user_service.py")
        dep_paths = {d.qualified_name for d in deps}
        assert any("models/user" in p for p in dep_paths)

    def test_related_entities_dedup(self, searcher):
        rels = searcher.find_related_entities("UserService")
        names = [r.entity.qualified_name for r in rels]
        assert len(names) == len(set(names))


class TestOfflineSummariesIndexed:
    def test_summaries_collection_populated(self, indexed_ws):
        _, ctx = indexed_ws
        assert len(ctx.indexer.summaries) > 0
        rows = ctx.indexer.summaries.scroll(
            {"file_path": "app/utils/validators.py"}, limit=10)
        assert rows
        assert any(p["entity_type"] == "file" for _, p in rows)
        assert any(p["entity_type"] == "function" for _, p in rows)


class TestLocalDatabase:
    def test_crud_roundtrip(self, tmp_path):
        from lattice_tpu.storage.database import LocalDatabase

        async def run():
            async with LocalDatabase(tmp_path / "t.sqlite3") as db:
                await db.executescript(
                    "CREATE TABLE kv (k TEXT PRIMARY KEY, v TEXT);")
                n = await db.execute(
                    "INSERT INTO kv (k, v) VALUES (?, ?)", "a", "1")
                assert n == 1
                row = await db.fetchrow("SELECT * FROM kv WHERE k = ?", "a")
                assert row == {"k": "a", "v": "1"}
                assert await db.fetchval("SELECT COUNT(*) FROM kv") == 1
                rows = await db.fetch("SELECT * FROM kv")
                assert len(rows) == 1
                assert await db.health_check()

        asyncio.run(run())

    def test_error_wrapped(self, tmp_path):
        from lattice_tpu.core.errors import StorageError
        from lattice_tpu.storage.database import LocalDatabase

        async def run():
            db = LocalDatabase(tmp_path / "t.sqlite3")
            with pytest.raises(StorageError):
                await db.fetch("SELECT * FROM missing_table")

        asyncio.run(run())


class TestMCPIndexTool:
    def test_index_repository_tool(self, workspace, tmp_path):
        from lattice_tpu.mcp.server import MCPServer
        settings = Settings()
        settings.ai.embedding_provider = "hash"
        settings.ai.embedding_dimensions = 64
        settings.metadata.enabled = False
        server = MCPServer(workspace, settings)
        resp = asyncio.run(server.handle_request({
            "jsonrpc": "2.0", "id": 7, "method": "tools/call",
            "params": {"name": "index_repository",
                       "arguments": {"path": str(workspace),
                                     "project": "mcp-idx"}},
        }))
        payload = json.loads(resp["result"]["content"][0]["text"])
        assert payload["project"] == "mcp-idx"
        assert payload["nodes"] > 20
        assert payload["chunks"] > 10
        # index persisted -> query tool works against it
        resp = asyncio.run(server.handle_request({
            "jsonrpc": "2.0", "id": 8, "method": "tools/call",
            "params": {"name": "semantic_search",
                       "arguments": {"query": "validate email"}},
        }))
        payload = json.loads(resp["result"]["content"][0]["text"])
        assert payload["results"]

    def test_index_bad_path_errors(self, workspace):
        from lattice_tpu.mcp.server import MCPServer
        settings = Settings()
        settings.ai.embedding_provider = "hash"
        server = MCPServer(workspace, settings)
        resp = asyncio.run(server.handle_request({
            "jsonrpc": "2.0", "id": 9, "method": "tools/call",
            "params": {"name": "index_repository",
                       "arguments": {"path": "/nonexistent/nope"}},
        }))
        assert resp["result"]["isError"]


class TestWatcherLoop:
    def test_run_with_max_polls(self, indexed_ws):
        workspace, ctx = indexed_ws
        watcher = FileWatcher(workspace, ctx.graph_builder, ctx.indexer,
                              ctx.parser, project_name="ws",
                              poll_interval_s=0.01)
        watcher.prime(ctx.parsed)
        (workspace / "app" / "newmod.py").write_text(
            "def fresh_function():\n    return 1\n")
        asyncio.run(watcher.run(max_polls=2))
        assert watcher.stats.updated == 1
        assert ctx.graph_builder.store.id_of("app.newmod.fresh_function") \
            is not None

    def test_stop_flag(self, indexed_ws):
        workspace, ctx = indexed_ws
        watcher = FileWatcher(workspace, ctx.graph_builder, ctx.indexer,
                              ctx.parser, poll_interval_s=0.01)
        watcher.prime(ctx.parsed)
        watcher.stop()
        asyncio.run(watcher.run(max_polls=1))  # returns promptly
        assert watcher.stats.polls <= 1


class TestInotifyRecursiveMoveStress:
    """Large-tree rename stress (VERDICT r1 weak #7): after `mv` of a
    deep populated subtree, every file must stay trackable — via
    surfaced events, or via the need_full_rescan flag the watcher's
    reconcile pass honors — and post-move edits must report NEW paths,
    never stale pre-move ones."""

    @pytest.fixture()
    def backend_tree(self, tmp_path):
        from lattice_tpu.pipeline.inotify import InotifyBackend
        if not InotifyBackend.available():
            pytest.skip("inotify unavailable")
        # 3 levels x 4 dirs x 10 files = 640+ files, 85 watched dirs
        def populate(base, depth):
            for i in range(10):
                (base / f"f{i}.py").write_text(f"x = {i}\n")
            if depth:
                for j in range(4):
                    d = base / f"d{j}"
                    d.mkdir()
                    populate(d, depth - 1)
        root = tmp_path / "repo"
        (root / "pkg").mkdir(parents=True)
        populate(root / "pkg", 2)
        backend = InotifyBackend(root)
        yield root, backend
        backend.close()

    def test_subtree_rename_within_tree(self, backend_tree):
        root, backend = backend_tree
        (root / "pkg").rename(root / "pkg_renamed")
        touched, need_full = backend.drain()
        # the moved-in tree re-registers: either its files surface as
        # events or the rescan flag covers them
        assert need_full or any(
            p.startswith("pkg_renamed/") for p in touched)
        surfaced = {p for p in touched if p.startswith("pkg_renamed/")}
        if not need_full:
            assert len(surfaced) >= 200
        # post-move edits must arrive under the NEW path
        target = root / "pkg_renamed" / "d0" / "d1" / "f3.py"
        target.write_text("x = 999\n")
        touched2, _ = backend.drain()
        assert "pkg_renamed/d0/d1/f3.py" in touched2
        assert not any(p.startswith("pkg/") for p in touched2)

    def test_subtree_move_out_of_tree(self, backend_tree, tmp_path):
        root, backend = backend_tree
        (root / "pkg" / "d0").rename(tmp_path / "outside")
        touched, need_full = backend.drain()
        assert need_full          # files under it got no per-file events
        # the tree keeps working afterwards
        (root / "pkg" / "fresh.py").write_text("y = 1\n")
        touched2, _ = backend.drain()
        assert "pkg/fresh.py" in touched2

    def test_rapid_rename_churn_stays_consistent(self, backend_tree):
        """Stress (r2 leftover): several successive subtree renames with
        interleaved writes, drained only at the end. Whatever mix of
        per-file events and rescan flags the kernel queue produced, the
        final state must be reachable: either the full-rescan flag is
        up, or the last write under the FINAL path surfaced — and the
        backend must keep delivering events afterwards."""
        root, backend = backend_tree
        cur = root / "pkg"
        for i in range(5):
            nxt = root / f"pkg_m{i}"
            cur.rename(nxt)
            # interleave a write under the new name while events pile up
            (nxt / "d0" / f"churn{i}.py").write_text(f"c = {i}\n")
            cur = nxt
        touched, need_full = backend.drain()
        assert need_full or any(
            p == "pkg_m4/d0/churn4.py" or p.startswith("pkg_m4/")
            for p in touched)
        # liveness after the churn: a fresh write under the final name
        # must surface as a normal per-file event
        (cur / "d0" / "after.py").write_text("ok = 1\n")
        touched2, _ = backend.drain()
        assert "pkg_m4/d0/after.py" in touched2

    def test_deep_move_in_from_outside(self, backend_tree, tmp_path):
        root, backend = backend_tree
        outside = tmp_path / "import_me"
        outside.mkdir()
        for i in range(30):
            (outside / f"g{i}.py").write_text("z = 1\n")
        (outside / "sub").mkdir()
        (outside / "sub" / "inner.py").write_text("w = 1\n")
        outside.rename(root / "pkg" / "imported")
        touched, need_full = backend.drain()
        got = {p for p in touched if p.startswith("pkg/imported/")}
        assert need_full or len(got) == 31
        if not need_full:
            assert "pkg/imported/sub/inner.py" in got
        # the imported subtree is live-watched now
        (root / "pkg" / "imported" / "sub" / "inner.py").write_text("w = 2\n")
        touched2, _ = backend.drain()
        assert "pkg/imported/sub/inner.py" in touched2


class TestDeviceTraceSummary:
    def test_cpu_capture_parses(self, tmp_path):
        import jax
        import jax.numpy as jnp
        from lattice_tpu.utils.tracing import (device_trace,
                                               summarize_device_trace)
        with device_trace(str(tmp_path)):
            x = jnp.ones((256, 256))
            float((x @ x).sum())
        out = summarize_device_trace(str(tmp_path))
        assert "error" not in out
        assert any("CPU" in p or "TPU" in p for p in out["planes"])
        # CPU device plane ops aggregate (dot or fusion must appear)
        assert out["total_ms"] >= 0.0
        names = " ".join(n for n, _, _ in out["ops"])
        assert names == "" or "dot" in names or "fusion" in names \
            or "jit" in names

    def test_missing_capture(self, tmp_path):
        from lattice_tpu.utils.tracing import summarize_device_trace
        assert "error" in summarize_device_trace(str(tmp_path / "nope"))


class TestMCPStdioTransport:
    """The real transport end to end: a subprocess `lattice mcp` speaks
    newline-delimited JSON-RPC over stdin/stdout (the in-process tests
    above cover dispatch; this pins framing, the reader loop, and
    shutdown)."""

    def test_stdio_initialize_list_shutdown(self, tmp_path):
        import subprocess
        import sys as _sys

        fixture = Path(__file__).parent / "fixtures" / "golden_project"
        proj = tmp_path / "proj"
        shutil.copytree(fixture, proj)
        repo_root = Path(__file__).resolve().parents[1]
        env = dict(os.environ, LATTICE_PLATFORM="cpu",
                   PYTHONPATH=str(repo_root))
        reqs = "\n".join(json.dumps(r) for r in [
            {"jsonrpc": "2.0", "id": 1, "method": "initialize",
             "params": {}},
            {"jsonrpc": "2.0", "id": 2, "method": "tools/list",
             "params": {}},
            {"jsonrpc": "2.0", "id": 3, "method": "shutdown",
             "params": {}},
        ]) + "\n"
        out = subprocess.run(
            [_sys.executable, "-m", "lattice_tpu.main", "mcp",
             "--path", str(proj)],
            input=reqs, capture_output=True, text=True, timeout=240,
            env=env, cwd=str(repo_root))
        lines = [json.loads(l) for l in out.stdout.splitlines()
                 if l.strip().startswith("{")]
        by_id = {r.get("id"): r for r in lines}
        assert by_id[1]["result"]["serverInfo"]["name"] == "lattice-tpu"
        names = [t["name"] for t in by_id[2]["result"]["tools"]]
        assert "deep_search_batch" in names and len(names) == 5
        assert out.returncode == 0
