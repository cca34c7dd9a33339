"""Answer synthesis.

Parity target: reference `src/lattice/query/responder.py:11-225`
(`ResponseGenerator`: traceability-focused system prompt, query/explanation
templates, context assembly with truncation). The reference's engine also
bypassed this class with a direct OpenAI call (`engine.py:391-405`, SURVEY
§2.2); here the engine always goes through the ResponseGenerator, which
degrades to a deterministic extractive answer when no LLM is configured —
so `query` works offline, not just `search`.
"""

from __future__ import annotations

import logging

from lattice_tpu.query.context.builder import format_context_for_llm
from lattice_tpu.query.context.models import EnrichedContext
from lattice_tpu.query.query_planner import QueryPlan
from lattice_tpu.query.ranking.models import RankedResult

logger = logging.getLogger(__name__)

SYSTEM_PROMPT = (
    "You are a precise code-navigation assistant. Answer using ONLY the "
    "provided repository context. Always cite evidence as `file:line` for "
    "every claim. If the context does not contain the answer, say what is "
    "missing instead of guessing. Prefer structure (call chains, class "
    "hierarchy) over prose when it answers the question."
)

ANSWER_TEMPLATE = (
    "Question: {query}\n"
    "Detected intent: {intent}\n\n"
    "Repository context:\n{context}\n\n"
    "Answer the question with file:line citations."
)

MAX_CONTEXT_CHARS = 20000


class ResponseGenerator:
    def __init__(self, llm_provider=None):
        self.llm = llm_provider

    async def generate(self, plan: QueryPlan, context: EnrichedContext,
                       ranked: list[RankedResult]) -> str:
        rendered = format_context_for_llm(context)[:MAX_CONTEXT_CHARS]
        if self.llm is not None:
            try:
                return await self.llm.complete([
                    {"role": "system", "content": SYSTEM_PROMPT},
                    {"role": "user", "content": ANSWER_TEMPLATE.format(
                        query=plan.raw_query, intent=plan.intent.value,
                        context=rendered)},
                ])
            except Exception as exc:
                logger.warning("LLM answer failed (%s); extractive fallback", exc)
        return self.extractive_answer(plan, context, ranked)

    def extractive_answer(self, plan: QueryPlan, context: EnrichedContext,
                          ranked: list[RankedResult]) -> str:
        """Deterministic answer assembled from retrieved evidence."""
        lines: list[str] = []
        if context.graph_summary:
            lines.append(context.graph_summary)
        if context.call_chains:
            lines.append("Call chains:")
            lines.extend(f"  {c}" for c in context.call_chains[:5])
        if context.hierarchy:
            lines.append("Hierarchy:")
            lines.extend(f"  {h}" for h in context.hierarchy[:8])
        if ranked:
            lines.append("Top results:")
            for r in ranked[:8]:
                loc = f"{r.file_path}:{r.start_line}" if r.file_path else "?"
                rel = f" [{r.relationship}]" if r.relationship else ""
                lines.append(
                    f"  {r.qualified_name or r.name} ({r.entity_type}) {loc}"
                    f"{rel} score={r.score:.3f}")
        for ec in context.entity_contexts[:2]:
            if ec.code_snippet:
                lines.append(f"Snippet {ec.file_path}:{ec.start_line}:")
                snippet = ec.code_snippet[:600]
                lines.append("```\n" + snippet + "\n```")
        if not lines:
            lines.append("No matching entities or chunks were found for this query.")
        return "\n".join(lines)
