"""Per-result signal scoring.

Parity target: reference `src/lattice/query/ranking/scorer.py:9-126`:
- graph signal = depth-decayed base + entity-match bonus + relationship
  relevance + centrality (min(1, degree/50)) + context richness (`:9-77`)
- vector signal = similarity + entity match + centrality + content-length
  quality heuristic (`:79-126`)
"""

from __future__ import annotations

from lattice_tpu.core.types import ResultSource
from lattice_tpu.embeddings.indexer import VectorSearchResult
from lattice_tpu.query.graph_reasoning.models import GraphContext, GraphNode
from lattice_tpu.query.query_planner import QueryIntent, QueryPlan
from lattice_tpu.query.ranking.models import (
    RankedResult,
    RankingConfig,
    RankingSignal,
)

# Relationship relevance per intent (reference `scorer.py:30-52`).
_RELATIONSHIP_RELEVANCE: dict[QueryIntent, dict[str, float]] = {
    QueryIntent.FIND_USAGE: {"caller": 1.0, "primary": 0.9},
    QueryIntent.FIND_CALLEES: {"callee": 1.0, "primary": 0.9},
    QueryIntent.FIND_CALL_CHAIN: {"chain": 1.0, "primary": 0.8},
    QueryIntent.FIND_HIERARCHY: {"ancestor": 1.0, "descendant": 1.0,
                                 "method": 0.6, "primary": 0.9},
    QueryIntent.FIND_METHODS: {"method": 1.0, "primary": 0.9},
    QueryIntent.FIND_IMPORTS: {"imports": 1.0, "primary": 0.8},
    QueryIntent.FIND_FILE_CONTEXT: {"in_file": 1.0, "primary": 0.8},
}
_DEFAULT_RELEVANCE = {"primary": 1.0, "caller": 0.7, "callee": 0.7,
                      "method": 0.6, "in_file": 0.5, "ancestor": 0.6,
                      "descendant": 0.6, "chain": 0.7, "imports": 0.5}


class ResultScorer:
    def __init__(self, config: RankingConfig | None = None):
        self.config = config or RankingConfig()

    def _entity_match(self, name: str, qualified_name: str,
                      plan: QueryPlan) -> float:
        nl = name.lower()
        ql = qualified_name.lower()
        for ent in plan.entities:
            el = ent.name.lower()
            if nl == el or ql == el or ql.endswith("." + el):
                return 1.0
            if el in ql:
                return 0.5
        return 0.0

    def _centrality(self, degree_pair: tuple[int, int] | None) -> float:
        if not degree_pair:
            return 0.0
        total = degree_pair[0] + degree_pair[1]
        return min(1.0, total / self.config.centrality_degree_cap)

    def score_graph_node(self, node: GraphNode, plan: QueryPlan,
                         ctx: GraphContext) -> RankedResult:
        """Reference: `scorer.py:9-77`."""
        cfg = self.config
        base = cfg.depth_decay ** max(node.depth, 0)
        relevance_map = _RELATIONSHIP_RELEVANCE.get(plan.intent, _DEFAULT_RELEVANCE)
        relevance = relevance_map.get(node.relationship,
                                      _DEFAULT_RELEVANCE.get(node.relationship, 0.5))
        entity_match = self._entity_match(node.name, node.qualified_name, plan)
        centrality = self._centrality(
            ctx.centrality.get(node.qualified_name)
            or (node.out_degree + node.in_degree > 0
                and (node.out_degree, node.in_degree) or None))
        # context richness: how many relation groups this node appears near
        richness = min(1.0, (len(ctx.paths) + len(ctx.methods) > 0) * 0.5
                       + (len(ctx.callers) + len(ctx.callees) > 0) * 0.5)
        signals = [
            RankingSignal("graph_base", base * relevance, 1.0),
            RankingSignal("entity_match", entity_match, cfg.entity_match_bonus),
            RankingSignal("centrality", centrality, cfg.centrality_weight),
            RankingSignal("context", richness, cfg.context_weight),
        ]
        score = sum(s.contribution for s in signals)
        return RankedResult(
            name=node.name, qualified_name=node.qualified_name,
            entity_type=node.entity_type, file_path=node.file_path,
            start_line=node.start_line, end_line=node.end_line,
            source=ResultSource.GRAPH, score=score, signals=signals,
            depth=node.depth, relationship=node.relationship,
            graph_node_id=node.qualified_name,
        )

    def score_vector_result(self, result: VectorSearchResult, plan: QueryPlan,
                            centrality: dict[str, tuple[int, int]]
                            ) -> RankedResult:
        """Reference: `scorer.py:79-126`."""
        cfg = self.config
        similarity = max(0.0, min(1.0, (result.score + 1.0) / 2.0
                                  if result.score < 0 else result.score))
        entity_match = self._entity_match(result.name.rsplit(".", 1)[-1],
                                          result.graph_node_id or result.name,
                                          plan)
        cent = self._centrality(centrality.get(result.graph_node_id))
        # content-length quality: neither trivial nor enormous (`:112-120`)
        n = len(result.content)
        quality = 1.0 if 80 <= n <= 4000 else (0.5 if n > 0 else 0.0)
        signals = [
            RankingSignal("similarity", similarity, 1.0),
            RankingSignal("entity_match", entity_match, cfg.entity_match_bonus),
            RankingSignal("centrality", cent, cfg.centrality_weight),
            RankingSignal("quality", quality, cfg.context_weight),
        ]
        score = sum(s.contribution for s in signals)
        return RankedResult(
            name=result.name.rsplit(".", 1)[-1] or result.name,
            qualified_name=result.graph_node_id or result.name,
            entity_type=result.entity_type, file_path=result.file_path,
            start_line=result.start_line, end_line=result.end_line,
            source=ResultSource.VECTOR, score=score, content=result.content,
            signals=signals, graph_node_id=result.graph_node_id,
        )
