"""The query engine: plan -> (graph || vector) -> rank -> context -> answer.

Parity target: reference `src/lattice/query/engine.py:57-556`:
- lazy sub-engine init (`:57-90`)
- `query()` pipeline with per-phase wall-clock stats (`:102-220`)
- graph + vector searches run concurrently (`:139-146`)
- graceful degradation: empty GraphContext / empty vector list on
  sub-failure (`:150-169`)
- summary-collection search added for explain-type intents (`:332-346`)
- centrality prefetch for top entities (`:348-377`)
- `search()` = retrieval without the LLM answer (`:222-260`) — the
  benchmark path (SURVEY §3.3)
- `get_statistics` (`:281-309`)
"""

from __future__ import annotations

import asyncio
import logging
import time
from dataclasses import dataclass, field

from lattice_tpu.config.settings import QuerySettings
from lattice_tpu.embeddings.indexer import VectorIndexer, VectorSearcher
from lattice_tpu.index.graph_store import GraphStore
from lattice_tpu.query.context.builder import ContextBuilder
from lattice_tpu.query.context.models import EnrichedContext
from lattice_tpu.query.graph_reasoning.engine import GraphReasoningEngine
from lattice_tpu.query.graph_reasoning.models import GraphContext
from lattice_tpu.query.query_planner import (
    SUMMARY_INTENTS,
    QueryPlan,
    QueryPlanner,
)
from lattice_tpu.query.ranking.models import RankedResult
from lattice_tpu.query.ranking.ranker import HybridRanker
from lattice_tpu.query.responder import ResponseGenerator

logger = logging.getLogger(__name__)


@dataclass(slots=True)
class QueryResult:
    """Reference: `query/engine.py:21-28`. The reference's MCP tool read a
    nonexistent `query_analysis` attribute (SURVEY §2.2); `query_plan` is
    the one true name here and MCP uses it."""

    query: str
    answer: str
    results: list[RankedResult]
    query_plan: QueryPlan
    graph_context: GraphContext
    enriched_context: EnrichedContext | None = None
    phase_times_ms: dict[str, float] = field(default_factory=dict)


class QueryEngine:
    def __init__(
        self,
        graph_store: GraphStore,
        indexer: VectorIndexer,
        llm_provider=None,
        settings: QuerySettings | None = None,
    ):
        self.settings = settings or QuerySettings()
        self.graph_store = graph_store
        self.indexer = indexer
        self.planner = QueryPlanner(llm_provider)
        self.graph_engine = GraphReasoningEngine(graph_store)
        self.vector_searcher = VectorSearcher(indexer)
        self.ranker = HybridRanker()
        self.context_builder = ContextBuilder(indexer.code, indexer.summaries)
        self.responder = ResponseGenerator(llm_provider)

    # ---- phases --------------------------------------------------------

    def _graph_phase(self, plan: QueryPlan) -> GraphContext:
        try:
            return self.graph_engine.execute_query_plan(plan)
        except Exception as exc:
            logger.warning("graph phase failed: %s", exc)
            ctx = GraphContext()
            ctx.notes.append(f"graph search failed: {exc}")
            return ctx

    def _vector_phase(self, plan: QueryPlan, limit: int,
                      project_name: str | None = None):
        try:
            filters = {"project_name": project_name} if project_name else None
            results = self.vector_searcher.search_code(
                plan.raw_query, limit=min(limit, self.settings.max_vector_results),
                filters=filters)
            if plan.intent in SUMMARY_INTENTS and len(self.indexer.summaries):
                results += self.vector_searcher.search_summaries(
                    plan.raw_query, limit=5, filters=filters)
            return results
        except Exception as exc:
            logger.warning("vector phase failed: %s", exc)
            return []

    async def _plan_and_retrieve(self, query_text: str, limit: int,
                                 project_name: str | None):
        times: dict[str, float] = {}
        t0 = time.perf_counter()
        plan = await self.planner.plan_query(query_text)
        times["planning_ms"] = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        graph_task = asyncio.to_thread(self._graph_phase, plan)
        vector_task = asyncio.to_thread(
            self._vector_phase, plan, 2 * limit, project_name)
        graph_context, vector_results = await asyncio.gather(
            graph_task, vector_task)
        elapsed = (time.perf_counter() - t0) * 1000
        times["graph_ms"] = elapsed
        times["vector_ms"] = elapsed

        # Centrality prefetch for top vector entities not already covered
        # (reference `engine.py:348-377`, capped at max_centrality_lookups).
        t0 = time.perf_counter()
        missing = []
        for vres in vector_results[: self.settings.max_centrality_lookups]:
            qn = vres.graph_node_id
            if qn and qn not in graph_context.centrality:
                nid = self.graph_store.id_of(qn)
                if nid is not None:
                    missing.append(nid)
        if missing:
            graph_context.centrality.update(
                self.graph_engine.get_centrality(missing))
        times["centrality_ms"] = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        ranked = self.ranker.rank_results(graph_context, vector_results, plan,
                                          limit=limit)
        times["ranking_ms"] = (time.perf_counter() - t0) * 1000
        return plan, graph_context, vector_results, ranked, times

    # ---- public API ----------------------------------------------------

    async def query(self, query_text: str, limit: int | None = None,
                    project_name: str | None = None) -> QueryResult:
        """Full pipeline with context + answer. Reference: `engine.py:102-220`."""
        limit = limit or self.settings.search_limit
        plan, graph_context, _vec, ranked, times = \
            await self._plan_and_retrieve(query_text, limit, project_name)

        t0 = time.perf_counter()
        enriched = self.context_builder.build_enriched_context(
            plan, graph_context, ranked)
        times["context_ms"] = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        answer = await self.responder.generate(plan, enriched, ranked)
        times["response_ms"] = (time.perf_counter() - t0) * 1000

        return QueryResult(
            query=query_text, answer=answer, results=ranked,
            query_plan=plan, graph_context=graph_context,
            enriched_context=enriched, phase_times_ms=times,
        )

    async def search(self, query_text: str, limit: int | None = None,
                     project_name: str | None = None) -> QueryResult:
        """Retrieval without synthesis — the benchmark path.

        Reference: `engine.py:222-260` (SURVEY §3.3).
        """
        limit = limit or self.settings.search_limit
        plan, graph_context, _vec, ranked, times = \
            await self._plan_and_retrieve(query_text, limit, project_name)
        return QueryResult(
            query=query_text, answer="", results=ranked, query_plan=plan,
            graph_context=graph_context, phase_times_ms=times,
        )

    def search_sync(self, query_text: str, limit: int | None = None,
                    project_name: str | None = None) -> QueryResult:
        return asyncio.run(self.search(query_text, limit, project_name))

    def query_sync(self, query_text: str, limit: int | None = None,
                   project_name: str | None = None) -> QueryResult:
        return asyncio.run(self.query(query_text, limit, project_name))

    def get_statistics(self) -> dict:
        """Reference: `engine.py:281-309`."""
        return {
            "graph": self.graph_store.stats,
            "vector": {
                "code": self.indexer.code.stats,
                "summaries": self.indexer.summaries.stats,
            },
        }
