"""Golden-corpus tests: the full pipeline over a ~4K-LoC polyglot fixture.

VERDICT r2 #2: the 150-LoC sample project was a toy bar; this corpus
(`tests/fixtures/golden_project`, authored for this repo — a task-management
app with Python services/repos/models/api plus a TS/TSX/JS frontend) is the
equivalent of the reference's `tests/fixtures/sample_project` golden corpus
(SURVEY §4): decorators, multi-level inheritance chains, cross-module and
cross-language calls, CommonJS+ESM, interfaces/type aliases, JSX nesting.
Counts are pinned EXACTLY — a lexer or resolution regression surfaces as a
test diff, not silence.
"""

import asyncio
import shutil

import pytest

from lattice_tpu.core.types import EdgeType
from lattice_tpu.embeddings.embedder import Embedder
from lattice_tpu.pipeline.orchestrator import PipelineOrchestrator
from lattice_tpu.providers.hash_provider import HashEmbedder
from lattice_tpu.query.engine import QueryEngine

# Pinned against the checked-in corpus. If you EDIT the fixture, re-run
# the pipeline and update these deliberately.
EXPECTED = {
    # r4: + app/integrations (webhooks, slack — a 3-level inheritance
    # chain BaseService -> WebhookService -> SlackIntegration) and
    # web/src/integrations/webhookPanel.ts; deltas hand-verified against
    # the authored entities (+4 files, +9 classes, +32 methods,
    # +6 functions, +2 interfaces, +1 alias = +54 nodes; +2 EXTENDS,
    # +12 IMPORTS)
    "files": 68,
    "nodes": 698,
    "calls": 693,
    "extends": 31,
    "imports": 157,
    "defines": 630,
    "defines_method": 347,
    "functions": 161,
    "classes": 86,
    "methods": 347,
    "interfaces": 25,
    "type_aliases": 11,
    "chunks": 651,
}


@pytest.fixture(scope="module")
def golden(tmp_path_factory):
    """Index a throwaway copy (no .lattice side effects on the fixture)."""
    from pathlib import Path

    from lattice_tpu.config.settings import Settings

    src = Path(__file__).parent / "fixtures" / "golden_project"
    tmp = tmp_path_factory.mktemp("golden_corpus") / "golden"
    shutil.copytree(src, tmp)
    settings = Settings()
    settings.metadata.enabled = False
    orchestrator = PipelineOrchestrator(
        tmp, Embedder(HashEmbedder(dimensions=256)),
        project_name="golden", settings=settings)
    ctx = asyncio.run(orchestrator.run())
    assert not ctx.errors, ctx.errors[:3]
    return ctx


class TestPinnedCounts:
    def test_every_file_parses(self, golden):
        assert len(golden.files) == EXPECTED["files"]
        assert len(golden.parsed) == EXPECTED["files"]

    def test_graph_counts_exact(self, golden):
        stats = golden.graph_builder.store.stats
        assert stats["nodes"] == EXPECTED["nodes"]
        assert stats["edges"]["CALLS"] == EXPECTED["calls"]
        assert stats["edges"]["EXTENDS"] == EXPECTED["extends"]
        assert stats["edges"]["IMPORTS"] == EXPECTED["imports"]
        assert stats["edges"]["DEFINES"] == EXPECTED["defines"]
        assert stats["edges"]["DEFINES_METHOD"] == EXPECTED["defines_method"]

    def test_entity_type_census(self, golden):
        by_type = golden.graph_builder.store.stats["by_type"]
        assert by_type["function"] == EXPECTED["functions"]
        assert by_type["class"] == EXPECTED["classes"]
        assert by_type["method"] == EXPECTED["methods"]
        assert by_type["interface"] == EXPECTED["interfaces"]
        assert by_type["type_alias"] == EXPECTED["type_aliases"]

    def test_chunk_count_exact(self, golden):
        assert len(golden.indexer.code) == EXPECTED["chunks"]
        assert len(golden.indexer.summaries) > 200


class TestInheritanceChains:
    """Multi-level chains crossing modules must resolve transitively."""

    @pytest.mark.parametrize("leaf,root,depth", [
        ("app.models.user.AdminUser", "app.models.base.Entity", 3),
        ("app.models.task.Subtask", "app.models.base.Entity", 3),
        ("app.models.task.RecurringTask", "app.models.task.Task", 1),
        ("app.core.exceptions.QuotaExceededError",
         "app.core.exceptions.TaskforgeError", 2),
        ("app.db.memory.UserRepository", "app.db.base.Repository", 2),
        ("app.services.report_service.ReportService",
         "app.services.base.BaseService", 2),
        ("app.api.middleware.AuthMiddleware",
         "app.api.middleware.Middleware", 1),
        ("app.integrations.slack.SlackIntegration",
         "app.services.base.BaseService", 2),
    ])
    def test_chain(self, golden, leaf, root, depth):
        store = golden.graph_builder.store
        leaf_id, root_id = store.id_of(leaf), store.id_of(root)
        assert leaf_id is not None, leaf
        assert root_id is not None, root
        closure = store.k_hop([leaf_id], EdgeType.EXTENDS, hops=5)
        assert root_id in closure, f"{leaf} !-> {root}"
        assert closure[root_id] == depth

    def test_descendants_of_entity(self, golden):
        """Entity's EXTENDS closure covers the whole model family."""
        store = golden.graph_builder.store
        entity = store.id_of("app.models.base.Entity")
        down = store.k_hop([entity], EdgeType.EXTENDS, hops=5, reverse=True)
        names = {store.node(n).qualified_name for n in down}
        for expected in ("app.models.user.User", "app.models.user.AdminUser",
                         "app.models.task.Task", "app.models.task.Subtask",
                         "app.models.project.Project",
                         "app.models.workflow.Workflow"):
            assert expected in names


class TestCrossModuleCalls:
    @pytest.mark.parametrize("caller,callee", [
        # service -> validator (cross-package)
        ("app.services.user_service.UserService.register_user",
         "app.utils.validators.validate_email"),
        ("app.services.task_service.TaskService.create_task",
         "app.utils.validators.validate_priority"),
        # model -> util
        ("app.models.project.Project.summary_line",
         "app.utils.formatting.truncate"),
        # service -> service
        ("app.services.project_service.ProjectService.staff",
         "app.services.notification_service.NotificationService.notify_user"),
        # importer -> service method
        ("app.importers.csv_import.TaskImporter.import_row",
         "app.services.task_service.TaskService.create_task"),
        # scheduled job -> report function (module-level)
        ("app.scheduling.digests.DigestRunner.send_weekly",
         "app.services.report_service.weekly_digest"),
        ("app.scheduling.digests.install_digest_jobs",
         "app.scheduling.scheduler.Scheduler.register"),
    ])
    def test_call_edge(self, golden, caller, callee):
        store = golden.graph_builder.store
        src, dst = store.id_of(caller), store.id_of(callee)
        assert src is not None, caller
        assert dst is not None, callee
        reached = store.k_hop([src], EdgeType.CALLS, hops=1)
        assert dst in reached, f"no CALLS edge {caller} -> {callee}"

    def test_transitive_call_chain(self, golden):
        """cli.seed_demo -> ProjectService.create_project -> Project
        validate chain is traversable in <= 3 hops."""
        store = golden.graph_builder.store
        seed = store.id_of("app.cli.seed_demo")
        create = store.id_of(
            "app.services.project_service.ProjectService.create_project")
        reached = store.k_hop([seed], EdgeType.CALLS, hops=3)
        assert create in reached

    def test_callers_of_hot_validator(self, golden):
        """validate_email is called from user paths across packages."""
        store = golden.graph_builder.store
        target = store.id_of("app.utils.validators.validate_email")
        callers = store.k_hop([target], EdgeType.CALLS, hops=1, reverse=True)
        names = {store.node(n).qualified_name for n in callers}
        assert "app.services.user_service.UserService.register_user" in names
        assert "app.models.user.User.validate" in names


class TestFrontendExtraction:
    def test_ts_interfaces_and_aliases(self, golden):
        store = golden.graph_builder.store
        for qn in ("web.src.types.TaskDto", "web.src.types.UserDto",
                   "web.src.api.client.ClientOptions",
                   "web.src.store.store.AppState"):
            nid = store.id_of(qn)
            assert nid is not None, qn
            assert store.node(nid).entity_type.value == "interface"
        alias = store.id_of("web.src.types.TaskStatus")
        assert alias is not None
        assert store.node(alias).entity_type.value == "type_alias"

    def test_tsx_components_and_nested_fns(self, golden):
        store = golden.graph_builder.store
        for qn in ("web.src.components.TaskCard.TaskCard",
                   "web.src.components.TaskList.TaskList",
                   "web.src.components.Dashboard.Dashboard",
                   "web.src.components.Dashboard.StatTile",
                   "web.src.components.ProjectPanel.ProgressMeter"):
            assert store.id_of(qn) is not None, qn

    def test_class_methods_in_ts(self, golden):
        store = golden.graph_builder.store
        client = store.id_of("web.src.api.client.ApiClient")
        assert client is not None
        methods = {store.node(m).name
                   for m in store.methods_of_class(client)}
        assert {"setToken", "request", "get", "post"} <= methods

    def test_commonjs_and_esm_mix(self, golden):
        store = golden.graph_builder.store
        # CommonJS module.exports functions extracted
        for qn in ("web.src.legacy.helpers.slugify",
                   "web.src.legacy.helpers.parseQuery",
                   "web.src.utils.format.priorityColor"):
            assert store.id_of(qn) is not None, qn

    def test_hooks_arrow_and_named(self, golden):
        store = golden.graph_builder.store
        for qn in ("web.src.hooks.useTasks.useTasks",
                   "web.src.hooks.useTasks.useTasksByStatus",
                   "web.src.hooks.useAuth.useAuth"):
            assert store.id_of(qn) is not None, qn

    def test_form_state_class_and_interfaces(self, golden):
        store = golden.graph_builder.store
        form = store.id_of("web.src.forms.taskForm.FormState")
        assert form is not None
        methods = {store.node(m).name
                   for m in store.methods_of_class(form)}
        assert {"setValue", "errors", "isValid", "toValues"} <= methods
        spec = store.id_of("web.src.forms.taskForm.FieldSpec")
        assert spec is not None
        assert store.node(spec).entity_type.value == "interface"


class TestGoldenQueries:
    @pytest.fixture(scope="class")
    def engine(self, golden):
        return QueryEngine(golden.graph_builder.store, golden.indexer)

    def test_search_finds_validators(self, engine):
        result = engine.search_sync("validate email address format")
        names = " ".join(r.qualified_name for r in result.results)
        assert "validate_email" in names

    def test_callers_query_routes_through_graph(self, engine):
        result = engine.search_sync("who calls validate_email?")
        assert result.results
        from lattice_tpu.core.types import ResultSource
        assert any(r.source in (ResultSource.GRAPH, ResultSource.HYBRID)
                   for r in result.results)

    def test_deep_search_on_golden(self, engine):
        result = engine.deep_search("notification delivery queue flush")
        names = " ".join(r.qualified_name for r in result.results)
        assert "notification" in names.lower()

    def test_integrations_callers_query(self, engine, golden):
        """The r4 integrations module resolves through the engine: the
        super()-delegating SlackIntegration methods surface as callers
        of WebhookService.fire, and the cross-module call into
        utils.formatting resolves."""
        store = golden.graph_builder.store
        fire = store.id_of("app.integrations.webhooks.WebhookService.fire")
        assert fire is not None
        callers = store.k_hop([fire], EdgeType.CALLS, hops=1, reverse=True)
        names = {store.node(n).qualified_name for n in callers}
        assert ("app.integrations.slack.SlackIntegration.post_message"
                in names)
        result = engine.search_sync("who calls WebhookService.fire?")
        assert result.results

    def test_integrations_inheritance_through_engine(self, engine):
        """Hierarchy intent over the 3-level chain answers with the
        middle and root of BaseService -> WebhookService ->
        SlackIntegration."""
        result = engine.search_sync(
            "what does SlackIntegration inherit from?")
        names = " ".join(r.qualified_name for r in result.results)
        assert "WebhookService" in names or "BaseService" in names

    def test_reach_budget_floor(self, engine, monkeypatch):
        """LATTICE_REACH_BUDGET=1 must still bound the walk AND keep
        graph evidence (the pre-fix behavior passed limit=0 = UNBOUNDED
        to the walk, then trimmed every reached node away)."""
        monkeypatch.setenv("LATTICE_REACH_BUDGET", "1")
        # the budget is read only on the device path (_deep_evidence);
        # the golden corpus is far below the 100k-row threshold, so force
        # the routing or this test never executes the guarded code
        monkeypatch.setattr(type(engine), "DEEP_DEVICE_THRESHOLD", 1)
        result = engine.deep_search("who calls validate_email?")
        assert result.results
        names = " ".join(r.qualified_name for r in result.results)
        assert "validate_email" in names

    def test_device_route_keeps_subject_for_non_calls_intents(
            self, engine, monkeypatch):
        """The device deep branch's evidence walk is CALLS-only, so for
        methods/hierarchy intents the relation answers can never appear
        in the reach to be promoted — the subject must NOT be demoted
        there (r5 review finding: demotion without a compensating
        answer signal is a pure ordering regression)."""
        monkeypatch.setattr(type(engine), "DEEP_DEVICE_THRESHOLD", 1)
        result = engine.deep_search("what methods does DeliveryQueue have?")
        assert result.results
        top = [r.qualified_name for r in result.results[:3]]
        assert any("DeliveryQueue" in qn for qn in top), top

    def test_device_route_demotes_subject_for_usage_intent(
            self, engine, monkeypatch):
        """Usage answers (callers) DO ride the CALLS reach, so there the
        subject demotion stands: callers outrank the subject."""
        monkeypatch.setattr(type(engine), "DEEP_DEVICE_THRESHOLD", 1)
        result = engine.deep_search("who calls validate_email?")
        assert result.results
        qns = [r.qualified_name for r in result.results]
        subject = next((i for i, qn in enumerate(qns)
                        if qn.endswith(".validate_email")), None)
        callers = [i for i, qn in enumerate(qns)
                   if not qn.endswith(".validate_email")]
        assert subject is None or any(i < subject for i in callers), qns

    def test_host_deep_demotes_dotted_subject(self, engine):
        """Host deep branch, dotted entity: 'DeliveryQueue.drain' never
        equals a row's bare name, so pre-fix the subject skipped
        subject_rows and the lexical channel handed its match straight
        back (r5 review finding) — callers must outrank the subject."""
        result = engine.deep_search("who calls WebhookService.fire?")
        assert result.results
        qns = [r.qualified_name for r in result.results]
        subject = next((i for i, qn in enumerate(qns)
                        if qn.endswith("WebhookService.fire")), None)
        answers = [i for i, qn in enumerate(qns)
                   if qn.endswith(("SlackIntegration.post_message",
                                   "webhooks._on_task_completed"))]
        assert answers, qns
        assert subject is None or min(answers) < subject, qns

    def test_per_entity_caller_lists_are_entity_specific(self, golden):
        """Each primary's EntityContext carries its OWN depth-1 callers
        (reference `context/builder.py:141-151`), not the union across
        every primary in the plan."""
        from lattice_tpu.query.context.builder import ContextBuilder
        from lattice_tpu.query.graph_reasoning.engine import GraphReasoningEngine
        from lattice_tpu.query.query_planner import QueryPlanner

        store = golden.graph_builder.store
        gre = GraphReasoningEngine(store)
        email = store.id_of("app.utils.validators.validate_email")
        prio = store.id_of("app.utils.validators.validate_priority")
        gctx = gre.implementation_context([email, prio])
        plan = QueryPlanner().plan_heuristic(
            "how are validate_email and validate_priority implemented?")
        builder = ContextBuilder(golden.indexer.code, golden.indexer.summaries,
                                 graph_store=store)
        ctx = builder.build_enriched_context(plan, gctx, [])
        by_qn = {e.qualified_name: e for e in ctx.entity_contexts}
        email_callers = set(by_qn["app.utils.validators.validate_email"].callers)
        prio_callers = set(by_qn["app.utils.validators.validate_priority"].callers)
        assert "app.services.user_service.UserService.register_user" in email_callers
        assert "app.services.task_service.TaskService.create_task" in prio_callers
        # distinct entities -> distinct caller lists (not the union)
        assert email_callers != prio_callers
        assert "app.services.task_service.TaskService.create_task" not in email_callers


class TestGoldenWatchMode:
    def test_file_change_reindexes_and_counts_move(self, golden):
        """Editing a file updates its nodes, resolves new cross-module
        calls, and leaves the rest of the graph stable."""
        from lattice_tpu.pipeline.watcher import FileWatcher

        store = golden.graph_builder.store
        before = store.stats["nodes"]
        watcher = FileWatcher(golden.repo_path, golden.graph_builder,
                              golden.indexer, golden.parser,
                              project_name="golden")
        watcher.prime(golden.parsed)
        assert watcher.poll_once() == []  # steady state

        target = golden.repo_path / "app" / "utils" / "dates.py"
        original = target.read_text()
        target.write_text(original + (
            "\n\ndef added_by_watch_test(ts: float) -> float:\n"
            "    return add_days(ts, 1.0)\n"))
        events = watcher.poll_once()
        assert [e.kind for e in events] == ["changed"]
        asyncio.run(watcher.process_events(events))
        nid = store.id_of("app.utils.dates.added_by_watch_test")
        assert nid is not None
        assert store.stats["nodes"] == before + 1
        # the new function's call resolves to its sibling
        callees = store.k_hop([nid], EdgeType.CALLS, hops=1)
        assert store.id_of("app.utils.dates.add_days") in callees
