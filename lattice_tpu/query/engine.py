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
from lattice_tpu.query.ranking.scorer import (
    DEEP_CALLS_DEMOTE_INTENTS,
    SUBJECT_DEMOTE_INTENTS,
    SUBJECT_EXACT_CAP,
)
from lattice_tpu.query.responder import ResponseGenerator
from lattice_tpu.utils.tracing import get_tracer

logger = logging.getLogger(__name__)


def _weights_tuple(cfg, plan):
    """RankingConfig -> packed FuseWeights field order."""
    g_weight, v_weight = cfg.weights_for(plan.intent)
    return (g_weight, v_weight, cfg.centrality_weight, cfg.context_weight,
            cfg.entity_match_bonus, cfg.hybrid_boost, cfg.depth_decay,
            float(cfg.centrality_degree_cap))


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
        self.context_builder = ContextBuilder(indexer.code, indexer.summaries,
                                              graph_store=graph_store)
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
            # exact-identifier channel (round 5): queries that name an
            # entity in plain words surface it even when the embedding
            # misses; duplicate rows merge (and boost) in the ranker
            results += self.vector_searcher.search_lexical(
                plan.raw_query, limit=min(limit,
                                          self.settings.max_vector_results),
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
        tracer = get_tracer()
        times: dict[str, float] = {}
        t0 = time.perf_counter()
        with tracer.span("query.planning"):
            plan = await self.planner.plan_query(query_text)
        times["planning_ms"] = (time.perf_counter() - t0) * 1000

        t0 = time.perf_counter()
        with tracer.span("query.retrieve"):
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

    # ---- device-fused corpus ranking ------------------------------------

    def deep_search(self, query_text: str, limit: int | None = None
                    ) -> QueryResult:
        """Corpus-wide hybrid ranking on device (SURVEY §7 step 6).

        Where `search` ranks the ~70 materialized candidates host-side
        (reference semantics), this path scores EVERY chunk row: vector
        cosine for all rows in one MXU pass, graph evidence (BFS depth,
        relationship relevance, degree) scattered from graph nodes to chunk
        rows via the graph_node_id join, then one fused elementwise pass +
        top_k (`ops/ranking.fused_rank`). Exhaustive-recall variant of the
        hybrid ranker for corpus-scale result sets.
        """
        import jax.numpy as jnp
        import numpy as np

        from lattice_tpu.ops import topk as topk_ops
        from lattice_tpu.ops.graph_kernels import UNREACHED
        from lattice_tpu.ops.ranking import FuseWeights, fused_rank, pack_weights
        from lattice_tpu.query.ranking.scorer import (
            _DEFAULT_RELEVANCE,
            _RELATIONSHIP_RELEVANCE,
        )

        limit = limit or self.settings.search_limit
        plan = self.planner.plan_heuristic(query_text)
        store = self.indexer.code
        if len(store) == 0:
            return QueryResult(query=query_text, answer="", results=[],
                               query_plan=plan,
                               graph_context=self._graph_phase(plan))
        if store.capacity >= self.DEEP_DEVICE_THRESHOLD:
            # corpus-scale: the per-payload Python walk below is O(corpus)
            # per query; the device path joins graph evidence to rows
            # through resident columns instead
            return self._deep_search_device(query_text, plan, limit)
        graph_context = self._graph_phase(plan)
        cap = store.capacity

        t0 = time.perf_counter()
        # vector side: cosine of every row
        qvec = topk_ops.l2_normalize(
            self.vector_searcher.embedder.embed(query_text)[None, :])
        emb, valid = store.device_arrays
        vec_scores = np.asarray(
            topk_ops.batched_matmul_scores(jnp.asarray(qvec), emb))[0]
        vec_scores = np.where(np.asarray(valid), vec_scores, -1e30)

        # graph side scattered to rows
        depth = np.full(cap, UNREACHED, dtype=np.int32)
        relevance = np.zeros(cap, dtype=np.float32)
        degree = np.zeros(cap, dtype=np.int32)
        match = np.zeros(cap, dtype=np.float32)
        quality = np.zeros(cap, dtype=np.float32)
        relevance_map = _RELATIONSHIP_RELEVANCE.get(plan.intent,
                                                    _DEFAULT_RELEVANCE)
        demote = plan.intent in SUBJECT_DEMOTE_INTENTS
        inverted = store._inverted["graph_node_id"]
        for node in graph_context.all_nodes():
            rows = inverted.get(node.qualified_name)
            if not rows:
                continue
            rel = relevance_map.get(
                node.relationship,
                _DEFAULT_RELEVANCE.get(node.relationship, 0.5))
            if demote and node.relationship == "primary":
                # relation-directed intents: the subject is context,
                # not the answer. The fused kernel has no separate
                # entity-bonus slot, so the host scorer's cap CONSTANT
                # applies to relevance here — a deliberately stronger
                # demotion (the eval pins the resulting ordering).
                rel *= SUBJECT_EXACT_CAP
            out_deg, in_deg = graph_context.centrality.get(
                node.qualified_name, (node.out_degree, node.in_degree))
            for row in rows:
                depth[row] = min(depth[row], node.depth)
                relevance[row] = max(relevance[row], rel)
                degree[row] = out_deg + in_deg
        # relation-directed intents: the named entity is the SUBJECT,
        # not the answer — cap its match signal the way the host-path
        # scorer does so callers/subclasses/etc. outrank it here too
        # under demotion the subject gets NO match signal — the same
        # rule as the device branch, which excludes seeds from the
        # packed match slots; its capped relevance + vector cosine keep
        # it near the top as context (probed: a 0.45 cap still left
        # "who calls get_config?" ranking the subject above its callers
        # by 0.025 through the subject's query-echo cosine)
        subject_match = 0.0 if demote else 1.0
        # subject-row matching mirrors the scorer's _entity_match: bare
        # entities match by bare name; dotted entities match the row's
        # QUALIFIED name exactly or as a ".entity" suffix — last-segment
        # matching for dotted entities would also demote same-named
        # relation answers (Runner.drain as a caller of Base.drain)
        bare_names = {e.name.lower() for e in plan.entities
                      if "." not in e.name}
        dotted_names = [e.name.lower() for e in plan.entities
                        if "." in e.name]
        subject_rows: set[int] = set()
        for row, payload in store.scroll({}, limit=cap):
            name = (payload.get("name") or "").rsplit(".", 1)[-1].lower()
            qn = (payload.get("graph_node_id")
                  or payload.get("name") or "").lower()
            is_subject = (bool(name) and name in bare_names) or any(
                qn == d or qn.endswith("." + d) for d in dotted_names)
            if is_subject:
                match[row] = subject_match
                subject_rows.add(row)
            n = len(payload.get("content") or "")
            quality[row] = 1.0 if 80 <= n <= 4000 else (0.5 if n else 0.0)
        # lexical channel (round 5): plain-word identifier mentions feed
        # the same match signal the planner's extracted entities do.
        # Under subject demotion the lexical channel must not hand the
        # subject its full match back (the query literally names it, so
        # its lexical score is ~1.0 by construction).
        from lattice_tpu.index.chunk_store import query_token_set
        for row, lscore in store.lexical_candidates(
                query_token_set(query_text), limit=64):
            if demote and row in subject_rows:
                continue
            match[row] = max(match[row], float(lscore))

        scores, rows = fused_rank(
            jnp.asarray(depth), jnp.asarray(relevance),
            jnp.asarray(vec_scores), jnp.asarray(match),
            jnp.asarray(degree), jnp.asarray(quality),
            jnp.asarray(pack_weights(FuseWeights(
                *_weights_tuple(self.ranker.config, plan)))), limit)
        elapsed_ms = (time.perf_counter() - t0) * 1000

        from lattice_tpu.core.types import ResultSource
        from lattice_tpu.query.ranking.models import RankedResult
        results = []
        for score, row in zip(np.asarray(scores), np.asarray(rows)):
            payload = store.payload(int(row))
            if payload is None or score <= -1e29:
                continue
            in_graph = depth[int(row)] < UNREACHED
            results.append(RankedResult(
                name=(payload.get("name") or "").rsplit(".", 1)[-1],
                qualified_name=payload.get("graph_node_id") or "",
                entity_type=payload.get("entity_type") or "",
                file_path=payload.get("file_path") or "",
                start_line=payload.get("start_line") or 0,
                end_line=payload.get("end_line") or 0,
                source=ResultSource.HYBRID if in_graph else ResultSource.VECTOR,
                score=float(score),
                content=payload.get("content") or "",
            ))
        return QueryResult(
            query=query_text, answer="", results=results, query_plan=plan,
            graph_context=graph_context,
            phase_times_ms={"deep_fuse_ms": elapsed_ms},
        )

    # rows above which the host payload walk is replaced by the
    # device-resident join (ops/ranking.fused_rank_rows)
    DEEP_DEVICE_THRESHOLD = 100_000

    # max queries per batched-rank execution: bounds the kernel's [Q, N]
    # f32 score slab (128 * 1M rows * 4 B = 512 MB) so an unbounded
    # MCP/CLI batch cannot OOM the chip and wedge the relay grant queue
    DEEP_BATCH_CHUNK = 128
    # reference traversal cap (`graph_reasoning/models.py:5`); the batch
    # path precomputes walks at this depth for _deep_evidence to consume,
    # so both MUST read the same constant
    DEEP_HOPS = 5

    def _sharded_deep_enabled(self) -> bool:
        """Deep rank over a multi-chip mesh: same opt-in convention as
        the store's and graph's sharded tiers (LATTICE_SHARDED=1 with
        more than one attached device, `GraphStore._want_sharded`)."""
        return self.graph_store._want_sharded()

    def _pack_deep_evidence(self, evs: list[dict]):
        """Stack per-query evidence into padded [Q, R] / [Q, M] arrays.

        Geometric buckets on both capacities keep the jit cache key
        stable as reach/match sizes vary query to query; -1 pads are
        masked inside the kernel. Shared by the single-query device path
        (Q=1, row 0) and `deep_search_batch` so the packed-reach format
        has exactly one producer."""
        import numpy as np

        from lattice_tpu.ops import graph_kernels as gk
        from lattice_tpu.ops.ranking import pack_reach

        r_cap = gk.geometric_bucket(
            max(max(len(e["r_rows"]) for e in evs), 1), floor=512)
        packed_b = np.stack([
            pack_reach(e["r_rows"], e["r_depths"], e["r_cls"], r_cap)
            for e in evs])
        m_cap = gk.geometric_bucket(
            max(max(len(e["match_rows"]) for e in evs), 1), floor=64)
        match_b = np.full((len(evs), m_cap), -1, np.int32)
        for i, e in enumerate(evs):
            m_n = min(len(e["match_rows"]), m_cap)
            match_b[i, :m_n] = e["match_rows"][:m_n]
        return packed_b, match_b

    def _deep_search_device(self, query_text: str, plan, limit: int
                            ) -> QueryResult:
        """Corpus-scale hybrid rank: sparse host BFS + device fuse.

        plan -> vectorized host CSR BFS (both directions; O(edges
        touched), measured 4 ms p50 at 1M/10M — the dense device BFS
        re-scans all E edges per hop and lost by ~400x, R3 phase B) ->
        one MXU cosine pass over every row -> sparse reach scatter +
        node->row join + fuse + selection in ONE device execution
        (BASELINE config 5's hybrid path; reference semantics
        `query/engine.py:102-220` with the ranker formulas of
        `ranking/scorer.py:9-126`). Host work per query is O(seeds +
        reached + k), never O(corpus).
        """
        import jax.numpy as jnp
        import numpy as np

        from lattice_tpu.ops.ranking import (FuseWeights,
                                             hybrid_rank_device_packed,
                                             pack_weights)

        t0 = time.perf_counter()
        store = self.indexer.code
        ev = self._deep_evidence(plan)
        cols = ev["cols"]
        # padded reach/match arrays; the scatter happens inside the fused
        # execution instead of an extra eager device call per query
        packed_b, match_b = self._pack_deep_evidence([ev])
        qvec = np.asarray(
            self.vector_searcher.embedder.embed(query_text),
            dtype=np.float32)
        w_np = pack_weights(FuseWeights(
            *_weights_tuple(self.ranker.config, plan)))
        if self._sharded_deep_enabled():
            # rows + rank columns sharded over the mesh; evidence
            # replicates and each shard fuses its own row window
            view = store.sharded_hybrid(self.graph_store)
            scores, rows = view.rank(qvec[None], packed_b,
                                     ev["rel_table"], match_b, w_np,
                                     limit)
            scores, rows = scores[0], rows[0]
        else:
            emb, valid = store.device_arrays
            # one device execution: cosine + reach scatter + fuse + top-k
            scores, rows = hybrid_rank_device_packed(
                jnp.asarray(qvec), emb, valid,
                jnp.asarray(packed_b[0]), jnp.asarray(ev["rel_table"]),
                jnp.asarray(match_b[0]),
                cols.degree, cols.quality, jnp.asarray(w_np), limit)
            scores, rows = np.asarray(scores), np.asarray(rows)
        elapsed_ms = (time.perf_counter() - t0) * 1000
        results = self._deep_results(scores, rows, ev["reach_set"])
        return QueryResult(
            query=query_text, answer="", results=results, query_plan=plan,
            graph_context=self._deep_context(plan, ev),
            phase_times_ms={"deep_fuse_ms": elapsed_ms},
        )

    def deep_search_batch(self, query_texts: list[str],
                          limit: int | None = None) -> list[QueryResult]:
        """Corpus-wide hybrid ranking for MANY queries in ONE device
        execution — a TPU-native extension (the reference serves one
        query per round trip). Per-query evidence (budgeted BFS reach,
        entity matches, per-intent weights/relevance tables) stacks to
        [Q, ...] and uploads once; the batched kernel runs one [Q, N]
        MXU cosine pass then scans the per-query scatter+fuse+top-k.
        Measured on v5e at 1M rows / 10M edges: 11.7 ms/query end to end
        at Q=16 vs ~43 ms single-query (singles sit on the relay's
        ~34 ms sync floor — R4_TPU_RESULTS4/5)."""
        import jax.numpy as jnp
        import numpy as np

        from lattice_tpu.ops import graph_kernels as gk
        from lattice_tpu.ops.ranking import (FuseWeights,
                                             hybrid_rank_device_packed_batch,
                                             pack_weights)

        if not query_texts:
            return []
        limit = limit or self.settings.search_limit
        store = self.indexer.code
        if (len(store) == 0 or len(query_texts) == 1
                or store.capacity < self.DEEP_DEVICE_THRESHOLD):
            return [self.deep_search(t, limit) for t in query_texts]
        t0 = time.perf_counter()
        plans = [self.planner.plan_heuristic(t) for t in query_texts]
        evs = self._deep_evidence_batch(plans)
        # one encoder forward for ALL queries (per-query embed() would
        # reintroduce Q synchronous device cycles — the exact cost this
        # batched path exists to amortize)
        qvecs = np.asarray(
            self.vector_searcher.embedder.embed_batch(query_texts),
            dtype=np.float32)
        # mixed intents ride per-query weight/relevance tables
        w_b = np.stack([
            pack_weights(FuseWeights(
                *_weights_tuple(self.ranker.config, p))) for p in plans])
        rel_b = np.stack([e["rel_table"] for e in evs])
        sharded_view = (store.sharded_hybrid(self.graph_store)
                        if self._sharded_deep_enabled() else None)
        if sharded_view is None:
            emb, valid = store.device_arrays
        cols = evs[0]["cols"]
        # chunk Q: the batched kernel materializes a [Q, N] f32 score
        # matrix, so an unbounded MCP/CLI batch at 1M rows would OOM the
        # chip (128 * 1M * 4 B = 512 MB per slab). Each chunk pads Q to a
        # geometric bucket (repeating the last real query) so distinct
        # question counts reuse one jit entry instead of recompiling.
        scores_parts: list[np.ndarray] = []
        rows_parts: list[np.ndarray] = []
        for lo in range(0, len(evs), self.DEEP_BATCH_CHUNK):
            sl = slice(lo, lo + self.DEEP_BATCH_CHUNK)
            evs_c = evs[sl]
            q_n = len(evs_c)
            q_cap = gk.geometric_bucket(q_n, floor=8)
            packed_b, match_b = self._pack_deep_evidence(evs_c)
            qv_c, rel_c, w_c = qvecs[sl], rel_b[sl], w_b[sl]
            if q_cap > q_n:
                def _pad(a: np.ndarray) -> np.ndarray:
                    reps = [1] * a.ndim
                    reps[0] = q_cap - q_n
                    return np.concatenate([a, np.tile(a[-1:], reps)])
                packed_b, match_b = _pad(packed_b), _pad(match_b)
                qv_c, rel_c, w_c = _pad(qv_c), _pad(rel_c), _pad(w_c)
            if sharded_view is not None:
                sc, rw = sharded_view.rank(qv_c, packed_b, rel_c,
                                           match_b, w_c, limit)
            else:
                sc, rw = hybrid_rank_device_packed_batch(
                    jnp.asarray(qv_c), emb, valid, jnp.asarray(packed_b),
                    jnp.asarray(rel_c), jnp.asarray(match_b),
                    cols.degree, cols.quality, jnp.asarray(w_c), limit)
            scores_parts.append(np.asarray(sc)[:q_n])
            rows_parts.append(np.asarray(rw)[:q_n])
        scores_b = np.concatenate(scores_parts)
        rows_b = np.concatenate(rows_parts)
        per_q_ms = (time.perf_counter() - t0) * 1000 / len(plans)
        out = []
        for text, plan, e, sc, rw in zip(query_texts, plans, evs,
                                         scores_b, rows_b):
            out.append(QueryResult(
                query=text, answer="",
                results=self._deep_results(sc, rw, e["reach_set"]),
                query_plan=plan, graph_context=self._deep_context(plan, e),
                phase_times_ms={"deep_fuse_ms": per_q_ms}))
        return out

    def _deep_evidence_batch(self, plans: list) -> list[dict]:
        """Evidence for Q plans with the BFS walks batched: all forward
        walks in ONE native call, all backward walks in another
        (`GraphStore._host_bfs_batch`, OpenMP across queries on
        multi-core hosts). Results are identical to the sequential path
        — `_deep_evidence` receives each plan's own walk pair and
        applies the same budget trim."""
        from lattice_tpu.core.types import EdgeType

        graph = self.graph_store
        seedss = [self._deep_seeds(p) for p in plans]
        walks: list = [None] * len(plans)
        if graph.n_edges(EdgeType.CALLS):
            hops, budget = self.DEEP_HOPS, self._reach_budget()
            fw = graph._host_bfs_batch(seedss, EdgeType.CALLS, hops,
                                       limit=budget)
            bw = graph._host_bfs_batch(seedss, EdgeType.CALLS, hops,
                                       reverse=True, limit=budget)
            walks = list(zip(fw, bw))
        return [self._deep_evidence(p, walks=w, seeds=s)
                for p, w, s in zip(plans, walks, seedss)]

    def _deep_seeds(self, plan) -> list[int]:
        """Graph seed ids for a plan's entities (exact name, then fuzzy;
        <=5 ids/entity, <=16 total, deduplicated in plan order)."""
        graph = self.graph_store
        graph._ensure_final()
        n_pad = graph._n_padded()
        seeds: list[int] = []
        for e in plan.entities:
            ids = graph.find_by_name(e.name)
            # fuzzy fallback only for confident extractions — a lone
            # 0.5-confidence capitalized word must not seed the BFS
            # with arbitrary contains-matches (same gate as
            # GraphReasoningEngine.find_entity)
            if not ids and e.confidence >= 0.6:
                ids = [nid for nid, _ in graph.find_fuzzy(e.name, limit=3)]
            seeds.extend(ids[:5])
        return list(dict.fromkeys(s for s in seeds if s < n_pad))[:16]

    @staticmethod
    def _reach_budget() -> int:
        """Per-direction evidence budget: the shallowest `budget`
        reached nodes per direction ride to the device; beyond it the
        depth decay (0.8^5 ~= 0.33) has flattened graph credit and the
        upload bytes dominate single-query latency through the relay
        (unbounded 5-hop reach at 1M/10M measured ~600k nodes ->
        ~100 ms/query of BFS sort + upload, R4_TPU_RESULTS1). Floor of
        1: 0/1 would pass limit=0 = UNBOUNDED to the walk — the exact
        pathology the budget exists to prevent — then trim every
        reached node away."""
        import os

        return max(
            int(os.environ.get("LATTICE_REACH_BUDGET", 32768)) // 2, 1)

    def _deep_evidence(self, plan, walks=None, seeds=None) -> dict:
        """Host-side evidence for one deep query: seeds, budgeted BFS
        reach expanded node->row through the resident reverse CSR,
        entity-match rows, and the intent relevance table. O(seeds +
        reached + matches) host work, never O(corpus). `walks`/`seeds`
        optionally inject precomputed ((f_ids, f_d), (b_ids, b_d)) walk
        results and the seed list they were computed for — the batch
        path runs all Q queries' walks as two OpenMP native calls
        (`_host_bfs_batch`) instead of 2Q sequential ones, and entity
        resolution (fuzzy lookups included) happens once per plan."""
        import numpy as np

        from lattice_tpu.core.types import EdgeType
        from lattice_tpu.query.ranking.scorer import (
            _DEFAULT_RELEVANCE,
            _RELATIONSHIP_RELEVANCE,
        )

        graph = self.graph_store
        store = self.indexer.code
        graph._ensure_final()
        n_pad = graph._n_padded()
        relevance_map = _RELATIONSHIP_RELEVANCE.get(plan.intent,
                                                    _DEFAULT_RELEVANCE)
        rel_caller = relevance_map.get(
            "caller", _DEFAULT_RELEVANCE["caller"])
        rel_callee = relevance_map.get(
            "callee", _DEFAULT_RELEVANCE["callee"])
        rel_primary = relevance_map.get("primary", 1.0)

        if seeds is None:
            seeds = self._deep_seeds(plan)

        cols = store.device_rank_columns(graph)
        hops = self.DEEP_HOPS
        budget = self._reach_budget()
        if seeds:
            # seeds always carry their depth-0 primary credit, even in a
            # graph with no CALLS edges (hierarchy/import-only corpora)
            if graph.n_edges(EdgeType.CALLS):
                if walks is not None:
                    (f_ids, f_d), (b_ids, b_d) = walks
                else:
                    f_ids, f_d = graph._host_bfs(seeds, EdgeType.CALLS,
                                                 hops, limit=budget)
                    b_ids, b_d = graph._host_bfs(seeds, EdgeType.CALLS,
                                                 hops, reverse=True,
                                                 limit=budget)
                # the NumPy fallback walk ignores `limit`; trim to the
                # same shallowest-(depth, id) prefix the native walk
                # returns so rankings are backend-independent
                if len(f_ids) > budget:
                    o = np.lexsort((f_ids, f_d))[:budget]
                    f_ids, f_d = f_ids[o], f_d[o]
                if len(b_ids) > budget:
                    o = np.lexsort((b_ids, b_d))[:budget]
                    b_ids, b_d = b_ids[o], b_d[o]
            else:
                f_ids = b_ids = np.empty(0, np.int64)
                f_d = b_d = np.empty(0, np.int32)
            n_ids = np.concatenate([
                np.asarray(seeds, np.int64), f_ids, b_ids])
            n_depths = np.concatenate([
                np.zeros(len(seeds), np.int32), f_d, b_d])
            # rel CLASS per node (0=primary, 1=callee, 2=caller); actual
            # relevance values ride in a [4] table so the reach packs to
            # one int32 per entry (pack_reach)
            n_cls = np.concatenate([
                np.zeros(len(seeds), np.uint8),
                np.full(len(f_ids), 1, np.uint8),
                np.full(len(b_ids), 2, np.uint8)])
        else:
            f_ids = b_ids = np.empty(0, np.int64)
            f_d = b_d = np.empty(0, np.int32)
            n_ids = np.empty(0, np.int64)
            n_depths = np.empty(0, np.int32)
            n_cls = np.empty(0, np.uint8)
        # relation-directed intents (round-5 ordering pass, mirroring
        # the host scorer): the seeds ARE the subject, not the answer —
        # scale their class-0 relevance by the subject cap and keep
        # them out of the binary match slots so the relation members
        # (class 1/2 at rel 1.0) outrank them in the fused kernel.
        # CALLS-answer intents only: this walk's reach classes are
        # primary/callee/caller, so methods/hierarchy/imports answers
        # can't appear here to be promoted — demoting the subject for
        # those intents would be a pure regression (scorer.py rationale
        # at DEEP_CALLS_DEMOTE_INTENTS).
        demote = plan.intent in DEEP_CALLS_DEMOTE_INTENTS
        if demote:
            rel_primary *= SUBJECT_EXACT_CAP
        rel_table = np.asarray(
            [rel_primary, rel_callee, rel_caller, 0.0], np.float32)
        reach_set = {int(v): int(d) for v, d in zip(n_ids, n_depths)}
        # node->row expansion through the resident reverse CSR, host-side
        r_rows, r_depths, r_cls = cols.rows_for_nodes(n_ids, n_depths,
                                                      n_cls)
        match_rows: list[int] = []
        inverted = store._inverted["graph_node_id"]
        seed_rows: set[int] = set()
        for sd in seeds:
            seed_rows.update(
                inverted.get(graph.node(sd).qualified_name, ()))
        if not demote:
            match_rows.extend(seed_rows)
        # lexical channel (round 5): the packed match slots are binary,
        # so only strong name-coverage hits ride along (name coverage
        # >=0.6 — a name the query mostly spells out; thresholded on
        # UNDEFLATED coverage so verbose queries don't starve it),
        # capped to leave room for seeds
        from lattice_tpu.index.chunk_store import query_token_set
        match_rows.extend(
            r for r, _s in store.lexical_candidates(
                query_token_set(plan.raw_query), limit=32,
                min_name_cov=0.6)
            if not (demote and r in seed_rows))
        return {
            "seeds": seeds, "f_ids": f_ids, "f_d": f_d,
            "b_ids": b_ids, "b_d": b_d,
            "r_rows": r_rows, "r_depths": r_depths, "r_cls": r_cls,
            "rel_table": rel_table, "reach_set": reach_set,
            "match_rows": match_rows, "cols": cols,
        }

    def _deep_results(self, scores, rows, reach_set) -> list:
        from lattice_tpu.core.types import ResultSource
        from lattice_tpu.query.ranking.models import RankedResult

        graph = self.graph_store
        store = self.indexer.code
        results = []
        for score, row in zip(scores, rows):
            # sentinel check BEFORE the payload lookup: NEG_INF filler
            # slots don't reference a meaningful row
            if score <= -1e29:
                continue
            payload = store.payload(int(row))
            if payload is None:
                continue
            qn = payload.get("graph_node_id") or ""
            nid = graph.id_of(qn) if qn else None
            in_graph = nid is not None and nid in reach_set
            results.append(RankedResult(
                name=(payload.get("name") or "").rsplit(".", 1)[-1],
                qualified_name=qn,
                entity_type=payload.get("entity_type") or "",
                file_path=payload.get("file_path") or "",
                start_line=payload.get("start_line") or 0,
                end_line=payload.get("end_line") or 0,
                source=(ResultSource.HYBRID if in_graph
                        else ResultSource.VECTOR),
                score=float(score),
                content=payload.get("content") or "",
            ))
        return results

    def _deep_context(self, plan, ev) -> "GraphContext":
        # CALLS-centric intents get their context from the SAME reach the
        # fuse ranked on (no second traversal; BFS discovery order is
        # depth order, so the head of each direction is the Cypher-capped
        # result set). Intents whose context lives on OTHER edge types
        # (hierarchy/methods/imports/file structure) still run the
        # reasoning engine — this path never walked those edges.
        from lattice_tpu.query.query_planner import QueryIntent
        calls_intents = {
            QueryIntent.FIND_USAGE, QueryIntent.FIND_CALLEES,
            QueryIntent.FIND_CALL_CHAIN, QueryIntent.FIND_SIMILAR,
            QueryIntent.FIND_EXAMPLES, QueryIntent.GENERAL_SEARCH,
        }
        if not ev["seeds"]:
            return GraphContext()
        if plan.intent in calls_intents:
            cap = 50
            to_node = self.graph_engine._to_node
            return GraphContext(
                primary_entities=[to_node(s, 0, "primary")
                                  for s in ev["seeds"]],
                callees=[to_node(int(v), int(d), "callee")
                         for v, d in zip(ev["f_ids"][:cap],
                                         ev["f_d"][:cap])],
                callers=[to_node(int(v), int(d), "caller")
                         for v, d in zip(ev["b_ids"][:cap],
                                         ev["b_d"][:cap])],
            )
        return self._graph_phase(plan)

    def get_statistics(self) -> dict:
        """Reference: `engine.py:281-309` (+ span aggregates, SURVEY §5)."""
        return {
            "graph": self.graph_store.stats,
            "vector": {
                "code": self.indexer.code.stats,
                "summaries": self.indexer.summaries.stats,
            },
            "spans": get_tracer().report(),
        }
