"""Generate tests/fixtures/golden_eval.jsonl (round-5 authoring tool).

Hand-authored natural-language queries; the graph-relation expectations
(callers/callees/ancestors/descendants/methods) are DERIVED from the
indexed golden graph at generation time, verified non-empty, and frozen
into the jsonl. Re-run only when the fixture corpus changes, and review
the diff — the eval is a contract, not a snapshot.

Usage:  LATTICE_PLATFORM=cpu python scripts/gen_golden_eval.py [--score]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax

jax.config.update("jax_platforms", "cpu")

from lattice_tpu.core.types import EdgeType  # noqa: E402
from lattice_tpu.query.golden_eval import (  # noqa: E402
    CASES_PATH,
    build_golden_engine,
    evaluate,
    load_cases,
)

# ---- hand-authored cases ----------------------------------------------------
# Semantic/general search: descriptive NL, answer is the named entity.
SEMANTIC = [
    ("convert a byte count into a human readable size",
     ["app.utils.formatting.humanize_bytes"]),
    ("format a duration in seconds as hours and minutes",
     ["app.utils.formatting.humanize_duration"]),
    ("truncate long text and append an ellipsis",
     ["app.utils.formatting.truncate"]),
    ("longest common subsequence table for diffing lines",
     ["app.utils.textdiff.lcs_table"]),
    ("produce a unified diff with hunk headers",
     ["app.utils.textdiff.unified", "app.utils.textdiff.group_hunks",
      "app.utils.textdiff.Hunk.header"]),
    ("validate an email address format",
     ["app.utils.validators.validate_email"]),
    ("validate a url slug format",
     ["app.utils.validators.validate_slug"]),
    ("count business days until a deadline",
     ["app.utils.dates.business_days_until"]),
    ("format a timestamp relative to now like 2 days ago",
     ["app.utils.dates.format_relative"]),
    ("exponential backoff delay between retries",
     ["web.src.legacy.helpers.retryDelay", "web.src.api.client.sleep"]),
    ("slugify a title into a url safe string",
     ["web.src.legacy.helpers.slugify", "app.models.base.NamedEntity.slug",
      "app.utils.validators.validate_slug"]),
    ("parse a query string into key value parameters",
     ["web.src.legacy.helpers.parseQuery"]),
    ("tokenize text for the inverted search index",
     ["app.search.text_index.tokenize"]),
    ("autocomplete a prefix from the index vocabulary",
     ["app.search.text_index.TextIndex.complete"]),
    ("does one version vector dominate another",
     ["app.sync.sync_engine.VersionVector.dominates"]),
    ("reconcile queued offline operations against the server",
     ["app.sync.sync_engine.SyncEngine.reconcile"]),
    ("parse a cron like schedule expression",
     ["app.scheduling.scheduler.Schedule._parse"]),
    ("send the weekly digest to managers",
     ["app.scheduling.digests.DigestRunner.send_weekly",
      "app.services.report_service.weekly_digest"]),
    ("drain the webhook delivery queue",
     ["app.integrations.webhooks.DeliveryQueue.drain"]),
    ("post a formatted message to a slack channel",
     ["app.integrations.slack.SlackIntegration.post_message"]),
    ("parse a keyboard shortcut chord like ctrl+shift+k",
     ["web.src.utils.keyboard.parseChord"]),
    ("emoji for a task status",
     ["web.src.utils.format.statusEmoji"]),
    ("burndown report for a project",
     ["app.services.report_service.ReportService.burndown"]),
    ("register a new user account",
     ["app.services.user_service.UserService.register_user",
      "app.api.handlers.users.register"]),
    ("import tasks from a csv file",
     ["app.importers.csv_import.TaskImporter",
      "app.importers.csv_import.TaskImporter.run",
      "app.importers.csv_import.TaskImporter.import_row"]),
    ("split one csv line respecting quoted commas",
     ["app.importers.csv_import.split_csv_line"]),
    ("check whether a task is overdue",
     ["app.models.task.Task.is_overdue",
      "app.models.task.filter_overdue"]),
    ("middleware that rate limits requests",
     ["app.api.middleware.RateLimitMiddleware",
      "app.api.middleware.RateLimitMiddleware.handle"]),
    ("subscribe to store state changes",
     ["web.src.store.store.Store.subscribe"]),
    ("group tasks into board columns by status",
     ["web.src.store.selectors.selectColumns",
      "web.src.components.Dashboard.boardColumnsFor"]),
]

# Definition intent: phrased to hit FIND_DEFINITION, answer is the entity.
DEFINITION = [
    ("where is the class TaskService defined?",
     ["app.services.task_service.TaskService"]),
    ("where is validate_email defined?",
     ["app.utils.validators.validate_email"]),
    ("find the class DeliveryQueue",
     ["app.integrations.webhooks.DeliveryQueue"]),
    ("find the class Scheduler",
     ["app.scheduling.scheduler.Scheduler"]),
    ("definition of WorkflowBinding",
     ["app.models.workflow.WorkflowBinding"]),
    ("where is the function build_chain defined?",
     ["app.api.middleware.build_chain"]),
    ("locate the UserRepository class",
     ["app.db.memory.UserRepository"]),
    ("definition of priorityWeight",
     ["web.src.types.priorityWeight"]),
    ("where is openLiveChannel declared?",
     ["web.src.api.websocket.openLiveChannel"]),
    ("find the class FormState",
     ["web.src.forms.taskForm.FormState"]),
    ("definition of MetricsHub",
     ["app.analytics.metrics.MetricsHub"]),
    ("where is bootstrap_admin defined?",
     ["app.services.user_service.bootstrap_admin"]),
]

# Graph-derived: (query, relation, target qualified name). Expectations
# computed from the indexed graph and frozen.
USAGE = [  # who calls X -> direct callers of X
    ("who calls validate_email?", "app.utils.validators.validate_email"),
    ("who calls WebhookService.fire?",
     "app.integrations.webhooks.WebhookService.fire"),
    ("callers of Task.transition", "app.models.task.Task.transition"),
    ("who calls next_id?", "app.models.base.next_id"),
    ("who calls get_config?", "app.core.config.get_config"),
    ("callers of notify_user",
     "app.services.notification_service.NotificationService.notify_user"),
    ("who calls now_ts?", "app.utils.dates.now_ts"),
    ("where is humanize_duration used?",
     "app.utils.formatting.humanize_duration"),
    ("who calls Schedule.next_after?",
     "app.scheduling.scheduler.Schedule.next_after"),
    ("callers of tokenize", "app.search.text_index.tokenize"),
    ("who calls fetchTasks?", "web.src.api.endpoints.fetchTasks"),
    ("where is getStore used?", "web.src.store.store.getStore"),
    # robustness shapes (r5 review pass): a noise capitalized word must
    # not hijack the seeds; a second sentence must not extract its
    # opening word as an entity
    ("who calls tokenize in the Python backend?",
     "app.search.text_index.tokenize"),
    ("where is now_ts used? Keep the answer short",
     "app.utils.dates.now_ts"),
]

CALLEES = [  # what does X call -> direct callees of X
    ("what does cmd_report call?", "app.cli.cmd_report"),
    ("what does WebhookService.fire call?",
     "app.integrations.webhooks.WebhookService.fire"),
    ("callees of TaskService.finish",
     "app.services.task_service.TaskService.finish"),
    ("what does DigestRunner.send_weekly call?",
     "app.scheduling.digests.DigestRunner.send_weekly"),
    ("what does seed_demo call?", "app.cli.seed_demo"),
    ("callees of SyncEngine.reconcile",
     "app.sync.sync_engine.SyncEngine.reconcile"),
]

ANCESTORS = [  # what does X inherit from -> EXTENDS ancestors
    ("what does SlackIntegration inherit from?",
     "app.integrations.slack.SlackIntegration"),
    ("what is the base class of RecurringTask?",
     "app.models.task.RecurringTask"),
    ("what does AdminUser extend?", "app.models.user.AdminUser"),
    ("superclasses of UserRepository", "app.db.memory.UserRepository"),
]

DESCENDANTS = [  # what inherits from X -> EXTENDS descendants
    ("what inherits from BaseService?", "app.services.base.BaseService"),
    ("subclasses of Middleware", "app.api.middleware.Middleware"),
    ("what extends TaskforgeError?",
     "app.core.exceptions.TaskforgeError"),
    ("subclasses of Repository", "app.db.base.Repository"),
    # abbreviation period mid-query must not suppress the entity
    ("list the subclasses of Middleware, e.g. for auth or logging",
     "app.api.middleware.Middleware"),
]

METHODS = [  # what methods does X have -> its method children
    ("what methods does Workflow have?", "app.models.workflow.Workflow"),
    ("methods of DeliveryQueue",
     "app.integrations.webhooks.DeliveryQueue"),
    ("what methods does TextIndex have?",
     "app.search.text_index.TextIndex"),
    ("methods of ApiClient", "web.src.api.client.ApiClient"),
    ("what methods does AuditService have?",
     "app.services.audit_service.AuditService"),
]

CHAIN = [  # call chain endpoints: expect the target to surface
    ("how does cmd_report reach humanize_duration?",
     ["app.utils.formatting.humanize_duration", "app.cli.cmd_report"]),
    ("call chain from activate to DeliveryQueue.enqueue",
     ["app.integrations.webhooks.DeliveryQueue.enqueue",
      "app.integrations.webhooks.activate"]),
]

IMPORTS = [  # what does <file> import -> its IMPORTS-edge file targets
    ("what does app/sync/sync_engine.py import?",
     "app/sync/sync_engine.py"),
    ("what does app/services/task_service.py import?",
     "app/services/task_service.py"),
    ("what does app/integrations/slack.py import?",
     "app/integrations/slack.py"),
    ("dependencies of app/scheduling/digests.py",
     "app/scheduling/digests.py"),
]

FILE_CONTEXT = [  # what's in <file> -> entities defined in it
    ("what's in the file app/models/task.py?", "app/models/task.py"),
    ("what's in the file app/search/text_index.py?",
     "app/search/text_index.py"),
    ("file overview of web/src/store/store.ts", "web/src/store/store.ts"),
    ("what's in the file app/utils/dates.py?", "app/utils/dates.py"),
]

IMPLEMENTATION = [  # how is X implemented -> the implementing entities
    ("how is the delivery queue implemented?",
     ["app.integrations.webhooks.DeliveryQueue",
      "app.integrations.webhooks.DeliveryQueue.enqueue",
      "app.integrations.webhooks.DeliveryQueue.drain"]),
    ("how is the text index implemented?",
     ["app.search.text_index.TextIndex",
      "app.search.text_index.TextIndex.index_document",
      "app.search.text_index.TextIndex.search"]),
    ("how is rate limiting implemented?",
     ["app.api.middleware.RateLimitMiddleware",
      "app.api.middleware.RateLimitMiddleware.handle"]),
]

EXAMPLES = [  # how to use X -> the entity and its public surface
    ("how to use the Scheduler?",
     ["app.scheduling.scheduler.Scheduler",
      "app.scheduling.scheduler.Scheduler.register",
      "app.scheduling.scheduler.Scheduler.tick"]),
    ("how to use the ApiClient?",
     ["web.src.api.client.ApiClient", "web.src.api.client.getClient",
      "web.src.api.client.ApiClient.get",
      "web.src.api.client.ApiClient.post"]),
    ("examples of using validate_username",
     ["app.utils.validators.validate_username"]),
]

# Subset re-run through the deep (hybrid device-rank) path — the two
# paths share evidence but rank differently; both must find the answer.
DEEP_SEMANTIC_IDX = [0, 3, 5, 13, 16, 18, 22, 26]
DEEP_USAGE_IDX = [0, 1, 4, 7]


def main() -> None:
    engine, ctx = build_golden_engine()
    store = ctx.graph_builder.store

    def must_id(qn: str) -> int:
        nid = store.id_of(qn)
        if nid is None:
            raise SystemExit(f"no such node in golden graph: {qn}")
        return nid

    def rel_names(qn: str, edge: EdgeType, reverse: bool,
                  hops: int = 1) -> list[str]:
        nid = must_id(qn)
        reached = store.k_hop([nid], edge, hops=hops, reverse=reverse,
                              limit=64)
        names = sorted(store.node(n).qualified_name for n in reached
                       if n != nid)
        if not names:
            raise SystemExit(f"empty expectation for {qn} ({edge})")
        return names

    def methods_of(qn: str) -> list[str]:
        must_id(qn)
        prefix = qn + "."
        names = sorted(
            store.node(i).qualified_name for i in range(store.n_nodes())
            if store.node(i).qualified_name.startswith(prefix)
            and "." not in store.node(i).qualified_name[len(prefix):])
        if not names:
            raise SystemExit(f"no methods found for {qn}")
        return names

    cases: list[dict] = []

    def add(intent, path, query, expect):
        for qn in expect:
            must_id(qn)
        cases.append({"intent": intent, "path": path, "query": query,
                      "expect": expect})

    for i, (q, exp) in enumerate(SEMANTIC):
        add("general_search", "search", q, exp)
    for q, exp in DEFINITION:
        add("find_definition", "search", q, exp)
    for q, target in USAGE:
        # callers: CALLS edges reversed (who points AT the target)
        add("find_usage", "search", q,
            rel_names(target, EdgeType.CALLS, reverse=True))
    for q, target in CALLEES:
        add("find_callees", "search", q,
            rel_names(target, EdgeType.CALLS, reverse=False))
    for q, target in ANCESTORS:
        add("find_hierarchy", "search", q,
            rel_names(target, EdgeType.EXTENDS, reverse=False, hops=3))
    for q, target in DESCENDANTS:
        add("find_hierarchy", "search", q,
            rel_names(target, EdgeType.EXTENDS, reverse=True, hops=3))
    for q, target in METHODS:
        add("find_methods", "search", q, methods_of(target))
    for q, exp in CHAIN:
        add("find_call_chain", "search", q, exp)

    def file_imports(path: str) -> list[str]:
        nid = must_id(f"file:{path}")
        reached = store.k_hop([nid], EdgeType.IMPORTS, hops=1, limit=64)
        names = sorted(store.node(n).qualified_name for n in reached
                       if n != nid)
        if not names:
            raise SystemExit(f"no imports for {path}")
        return names

    def file_entities(path: str) -> list[str]:
        names = sorted(
            store.node(i).qualified_name for i in range(store.n_nodes())
            if store.node(i).file_path == path
            and not store.node(i).qualified_name.startswith("file:"))
        if not names:
            raise SystemExit(f"no entities in {path}")
        return names

    for q, path in IMPORTS:
        add("find_imports", "search", q, file_imports(path))
    for q, path in FILE_CONTEXT:
        add("find_file_context", "search", q, file_entities(path))
    for q, exp in IMPLEMENTATION:
        add("find_implementation", "search", q, exp)
    for q, exp in EXAMPLES:
        add("find_examples", "search", q, exp)
    for i in DEEP_SEMANTIC_IDX:
        q, exp = SEMANTIC[i]
        add("general_search", "deep", q, exp)
    for i in DEEP_USAGE_IDX:
        q, target = USAGE[i]
        add("find_usage", "deep", q,
            rel_names(target, EdgeType.CALLS, reverse=True))

    with open(CASES_PATH, "w", encoding="utf-8") as f:
        for c in cases:
            f.write(json.dumps(c) + "\n")
    print(f"wrote {len(cases)} cases -> {CASES_PATH}")

    if "--score" in sys.argv:
        scores = evaluate(engine, load_cases())
        misses = scores.pop("misses")
        print(json.dumps(scores, indent=1))
        for m in misses:
            print("MISS", m["intent"], m["path"], "|", m["query"],
                  "| got:", ", ".join(m["got"][:3]))


if __name__ == "__main__":
    main()
