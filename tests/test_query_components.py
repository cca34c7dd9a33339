"""Query-side component tests: planner intents, JSON extraction, ranking
math, context formatting, responder templates.

Parity model: reference planner/ranking unit tests plus the intent taxonomy
coverage its few-shot prompt encodes (`query_planner.py:94-172`).
"""

import asyncio

import pytest

from lattice_tpu.core.types import ResultSource
from lattice_tpu.embeddings.indexer import VectorSearchResult
from lattice_tpu.query.context.builder import format_context_for_llm
from lattice_tpu.query.context.models import EnrichedContext, EntityContext
from lattice_tpu.query.graph_reasoning.models import GraphContext, GraphNode
from lattice_tpu.query.query_planner import (
    QueryIntent,
    QueryPlanner,
    extract_json,
)
from lattice_tpu.query.ranking.models import RankedResult, RankingConfig
from lattice_tpu.query.ranking.ranker import HybridRanker
from lattice_tpu.query.ranking.scorer import ResultScorer


class TestPlannerIntents:
    @pytest.mark.parametrize("query,intent", [
        ("who calls parse_file?", QueryIntent.FIND_USAGE),
        ("what does UserService call?", QueryIntent.FIND_CALLEES),
        ("call chain from main to save", QueryIntent.FIND_CALL_CHAIN),
        ("what classes inherit from BaseModel?", QueryIntent.FIND_HIERARCHY),
        ("methods of QueryEngine", QueryIntent.FIND_METHODS),
        ("what does engine.py import?", QueryIntent.FIND_IMPORTS),
        ("what's in the file scanner.py?", QueryIntent.FIND_FILE_CONTEXT),
        ("how is caching implemented?", QueryIntent.FIND_IMPLEMENTATION),
        ("find code similar to this chunker", QueryIntent.FIND_SIMILAR),
        ("examples of using the ranker", QueryIntent.FIND_EXAMPLES),
        ("explain the architecture overview", QueryIntent.EXPLAIN_ARCHITECTURE),
        ("explain what resolve_call does", QueryIntent.EXPLAIN_CODE),
        ("why does indexing crash with an error?", QueryIntent.DEBUG_HELP),
        ("refactor the parser module", QueryIntent.REFACTOR_HELP),
        ("what api endpoints exist?", QueryIntent.API_USAGE),
        ("where is CodeParser defined?", QueryIntent.FIND_DEFINITION),
        ("retrieval stuff", QueryIntent.GENERAL_SEARCH),
    ])
    def test_intent_classification(self, query, intent):
        plan = QueryPlanner().plan_heuristic(query)
        assert plan.intent == intent, f"{query!r} -> {plan.intent}"

    def test_entity_extraction_priorities(self):
        plan = QueryPlanner().plan_heuristic(
            "who calls `resolve_call` in processor.py via CallProcessor "
            "or fuzzy_match()?")
        names = plan.entity_names
        assert "resolve_call" in names
        assert "processor.py" in names
        assert "CallProcessor" in names
        assert "fuzzy_match" in names

    def test_lower_camel_entities_extracted(self):
        """lowerCamelCase (the dominant JS/TS function style) must
        extract — the golden eval exposed that 'who calls fetchTasks?'
        got NO graph phase at all (r5: UpperCamel requires a leading
        capital, snake requires an underscore)."""
        plan = QueryPlanner().plan_heuristic("who calls fetchTasks?")
        assert "fetchTasks" in plan.entity_names
        plan = QueryPlanner().plan_heuristic("where is getStore used?")
        assert "getStore" in plan.entity_names
        # plain words must NOT start matching as entities
        plan = QueryPlanner().plan_heuristic("who calls the scheduler?")
        assert "scheduler" not in plan.entity_names

    def test_single_capitalized_word_extracted_mid_sentence(self):
        """One-word class names ("subclasses of Repository") got no
        graph phase: CamelCase needs two humps (r5 ordering pass)."""
        plan = QueryPlanner().plan_heuristic("subclasses of Repository")
        assert "Repository" in plan.entity_names
        # sentence-initial capitalized words are NOT entities
        plan = QueryPlanner().plan_heuristic("Show all the tasks")
        assert "Show" not in plan.entity_names

    def test_sentence_initial_skip_is_positional_not_offset_zero(self):
        """Sentence-initial means 'preceded only by whitespace or
        end-of-sentence punctuation', not offset 0: leading spaces,
        stripped backticks, and second sentences all shift the first
        word past offset 0 (r5 review finding)."""
        p = QueryPlanner()
        assert "Show" not in p.plan_heuristic(
            "  Show all the tasks").entity_names
        assert "Explain" not in p.plan_heuristic(
            "find usages of drain. Explain the flow").entity_names
        # mid-sentence capitalized words still extract
        assert "Repository" in p.plan_heuristic(
            "  subclasses of Repository").entity_names

    def test_abbreviation_period_is_not_sentence_end(self):
        """'e.g. Repository' must keep extracting Repository — an
        abbreviation period is not a sentence boundary (r5 review)."""
        p = QueryPlanner()
        assert "Repository" in p.plan_heuristic(
            "show classes like e.g. Repository").entity_names
        # a REAL sentence end still skips
        assert "Explain" not in p.plan_heuristic(
            "find usages of drain. Explain the flow").entity_names

    def test_low_confidence_entity_does_not_flip_graph_only(self):
        """A lone 0.5-confidence capitalized English word must not flip
        a graph intent from hybrid to graph-only routing — junk fuzzy
        seeds would replace the vector phase entirely (r5 review
        finding)."""
        p = QueryPlanner()
        plan = p.plan_heuristic("who calls the Python tokenizer")
        assert plan.search_type == "hybrid", plan.entities
        # a confident seed still routes graph-only
        plan = p.plan_heuristic("who calls DeliveryQueue.drain?")
        assert plan.search_type == "graph"

    def test_relation_phrase_object_extracted(self):
        """The word after a relation phrase is the subject even when
        lowercase and pattern-free ("callers of tokenize")."""
        plan = QueryPlanner().plan_heuristic("callers of tokenize")
        assert "tokenize" in plan.entity_names
        plan = QueryPlanner().plan_heuristic("who calls tokenize?")
        assert "tokenize" in plan.entity_names
        plan = QueryPlanner().plan_heuristic("methods of workflow")
        assert "workflow" in plan.entity_names
        # articles stay stopworded: "who calls the scheduler?" must not
        # extract "the" (and still not "scheduler")
        plan = QueryPlanner().plan_heuristic("who calls the scheduler?")
        assert "the" not in plan.entity_names

    def test_multi_hop_detection(self):
        planner = QueryPlanner()
        assert planner.plan_heuristic(
            "who transitively calls save?").multi_hop
        assert planner.plan_heuristic(
            "call chain from a to b").multi_hop
        assert not planner.plan_heuristic("who calls save?").multi_hop

    def test_chain_relationship_endpoints(self):
        plan = QueryPlanner().plan_heuristic(
            "call chain from handle_request to persist_user")
        assert plan.relationships
        assert plan.relationships[0].source == "handle_request"
        assert plan.relationships[0].target == "persist_user"


class TestExtractJson:
    def test_plain(self):
        assert extract_json('{"a": 1}') == {"a": 1}

    def test_fenced(self):
        assert extract_json('```json\n{"a": 1}\n```') == {"a": 1}

    def test_embedded_prose(self):
        assert extract_json('Sure! Here: {"a": {"b": 2}} hope it helps') == \
            {"a": {"b": 2}}

    def test_garbage(self):
        assert extract_json("no json here") is None
        assert extract_json("{broken") is None


def _node(nid, name, depth=0, rel="primary", file="f.py"):
    return GraphNode(node_id=nid, qualified_name=f"m.{name}", name=name,
                     entity_type="function", file_path=file,
                     start_line=nid * 10 + 1, end_line=nid * 10 + 5,
                     depth=depth, relationship=rel)


def _vres(name, score, file="f.py", line=1):
    return VectorSearchResult(
        row=0, score=score, name=f"m.{name}", content="x" * 100,
        entity_type="function", file_path=file, language="python",
        start_line=line, end_line=line + 3, graph_node_id=f"m.{name}")


class TestScorerAndRanker:
    def test_depth_decay(self):
        scorer = ResultScorer()
        plan = QueryPlanner().plan_heuristic("who calls target?")
        ctx = GraphContext()
        shallow = scorer.score_graph_node(
            _node(1, "a", depth=1, rel="caller"), plan, ctx)
        deep = scorer.score_graph_node(
            _node(2, "b", depth=4, rel="caller"), plan, ctx)
        assert shallow.score > deep.score

    def test_entity_match_bonus(self):
        scorer = ResultScorer()
        plan = QueryPlanner().plan_heuristic("who calls `special_fn`?")
        ctx = GraphContext()
        match = scorer.score_graph_node(
            _node(1, "special_fn", rel="caller", depth=1), plan, ctx)
        other = scorer.score_graph_node(
            _node(2, "unrelated", rel="caller", depth=1), plan, ctx)
        assert match.score > other.score

    def test_relation_answer_outranks_subject(self):
        # "who calls tokenize?" — the answer is the CALLERS; the subject
        # itself stays visible but below them (round-5 ordering pass:
        # relation_answer bonus + subject entity-match cap)
        scorer = ResultScorer()
        plan = QueryPlanner().plan_heuristic("who calls `tokenize`?")
        ctx = GraphContext()
        subject = scorer.score_graph_node(
            _node(1, "tokenize", rel="primary", depth=0), plan, ctx)
        caller = scorer.score_graph_node(
            _node(2, "index_document", rel="caller", depth=1), plan, ctx)
        assert caller.score > subject.score
        assert "relation_answer" in caller.signal_scores
        assert "relation_answer" not in subject.signal_scores

    def test_call_chain_endpoints_not_demoted(self):
        # FIND_CALL_CHAIN answers INCLUDE the endpoints the query names:
        # no subject demotion there (the exact entity match keeps 1.0)
        scorer = ResultScorer()
        plan = QueryPlanner().plan_heuristic(
            "call chain from `cmd_report` to `humanize_duration`")
        assert plan.intent == QueryIntent.FIND_CALL_CHAIN
        ctx = GraphContext()
        endpoint = scorer.score_graph_node(
            _node(1, "cmd_report", rel="primary", depth=0), plan, ctx)
        assert endpoint.signal_scores["entity_match"] == pytest.approx(
            scorer.config.entity_match_bonus)

    def test_dunder_penalized_below_peer(self):
        scorer = ResultScorer()
        plan = QueryPlanner().plan_heuristic("rate limiting middleware")
        a = scorer.score_vector_result(_vres("RateLimitMiddleware", 0.8),
                                       plan, {})
        b = scorer.score_vector_result(
            _vres("RateLimitMiddleware.__init__", 0.8), plan, {})
        assert a.score > b.score

    def test_hybrid_merge_boost(self):
        ranker = HybridRanker()
        plan = QueryPlanner().plan_heuristic("explain m.a")
        g = GraphContext()
        node = _node(1, "a", rel="primary")
        g.primary_entities = [node]
        # vector result keyed identically (same file:qn:line)
        v = _vres("a", 0.9, line=node.start_line)
        ranked = ranker.rank_results(g, [v], plan)
        merged = next(r for r in ranked if r.qualified_name == "m.a")
        assert merged.source == ResultSource.HYBRID

    def test_per_file_cap(self):
        cfg = RankingConfig()
        ranker = HybridRanker(cfg)
        plan = QueryPlanner().plan_heuristic("anything specific here")
        vecs = [_vres(f"fn{i}", 0.9 - i * 0.01, file="same.py", line=i * 7 + 1)
                for i in range(10)]
        ranked = ranker.rank_results(GraphContext(), vecs, plan)
        assert len([r for r in ranked if r.file_path == "same.py"]) \
            <= cfg.max_per_file

    def test_intent_weights_flip_order(self):
        ranker = HybridRanker()
        g = GraphContext()
        g.callers = [_node(1, "caller_fn", depth=1, rel="caller")]
        v = [_vres("vec_fn", 0.95, file="other.py")]
        graph_heavy = ranker.rank_results(
            g, v, QueryPlanner().plan_heuristic("who calls target_fn?"))
        vector_heavy = ranker.rank_results(
            g, v, QueryPlanner().plan_heuristic("find code similar to target"))
        def top_source(rs):
            return rs[0].source
        assert top_source(graph_heavy) == ResultSource.GRAPH
        assert top_source(vector_heavy) == ResultSource.VECTOR


class TestContextFormatting:
    def test_markdown_sections(self):
        ctx = EnrichedContext(
            entity_contexts=[EntityContext(
                qualified_name="m.f", name="f", entity_type="function",
                file_path="m.py", start_line=3, end_line=9,
                code_snippet="def f():\n    pass",
                docstring="Does f.", signature="def f()",
                callers=["m.g"], callees=["m.h"])],
            call_chains=["g -> f -> h"],
            hierarchy=["m.Base (ancestor, depth 1)"],
            file_summaries={"m.py": "module summary"},
            graph_summary="Graph context: 1 matched entities.",
            reasoning_notes=["intent=explain_code (source=heuristic)"],
        )
        text = format_context_for_llm(ctx)
        for fragment in ("## m.f (function)", "m.py:3-9", "`def f()`",
                         "Called by: m.g", "Calls: m.h", "## Call chains",
                         "g -> f -> h", "## Hierarchy", "## File summaries",
                         "## Notes"):
            assert fragment in text, fragment

    def test_empty_context(self):
        assert format_context_for_llm(EnrichedContext()) == ""


class TestIntentPrompts:
    """Per-intent synthesis prompts (reference `engine.py:407-507`)."""

    def test_every_intent_extends_base(self):
        from lattice_tpu.query.responder import SYSTEM_PROMPT, system_prompt_for
        for intent in QueryIntent:
            prompt = system_prompt_for(intent)
            assert prompt.startswith(SYSTEM_PROMPT), intent

    def test_intents_get_distinct_specialized_prompts(self):
        from lattice_tpu.query.responder import INTENT_PROMPTS, system_prompt_for
        # The reference specializes 7 intents; this taxonomy keys 16 of 17
        # (FIND_METHODS folds the hierarchy guidance's method focus).
        assert len(INTENT_PROMPTS) >= 14
        prompts = {system_prompt_for(i) for i in INTENT_PROMPTS}
        assert len(prompts) == len(INTENT_PROMPTS)  # all distinct
        assert "callers" in system_prompt_for(QueryIntent.FIND_USAGE)
        assert "inheritance" in system_prompt_for(QueryIntent.FIND_HIERARCHY)
        assert "debug" in system_prompt_for(QueryIntent.DEBUG_HELP).lower()

    def test_llm_path_receives_intent_keyed_prompt(self):
        from lattice_tpu.query.responder import ResponseGenerator

        captured = {}

        class FakeLLM:
            async def complete(self, messages):
                captured["system"] = messages[0]["content"]
                return "ok"

        gen = ResponseGenerator(FakeLLM())
        plan = QueryPlanner().plan_heuristic("who calls parse_file?")
        assert plan.intent == QueryIntent.FIND_USAGE
        answer = asyncio.run(gen.generate(plan, EnrichedContext(), []))
        assert answer == "ok"
        assert "Intent focus — callers" in captured["system"]


class TestResponderOffline:
    def test_extractive_answer_contains_sources(self):
        from lattice_tpu.query.responder import ResponseGenerator
        gen = ResponseGenerator(None)
        plan = QueryPlanner().plan_heuristic("explain m.f")
        ctx = EnrichedContext(graph_summary="Graph context: 1 matched entities.")
        ranked = [RankedResult(
            name="f", qualified_name="m.f", entity_type="function",
            file_path="m.py", start_line=3, end_line=9,
            source=ResultSource.HYBRID, score=1.23)]
        answer = asyncio.run(gen.generate(plan, ctx, ranked))
        assert "m.py:3" in answer
        assert "m.f" in answer
