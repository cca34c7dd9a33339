"""Failure-handling tests: retries, graceful degradation, fallbacks.

Parity model: reference error-path tests (`test_graph.py` mocks raising
exceptions) + SURVEY §5: tenacity retry on providers, query survives graph
or vector failure with empty context, planner falls back to heuristics,
per-file pipeline errors logged and skipped.
"""

import asyncio

import numpy as np
import pytest

from lattice_tpu.embeddings.embedder import Embedder
from lattice_tpu.pipeline.orchestrator import PipelineOrchestrator
from lattice_tpu.providers.base import BaseEmbeddingProvider, BaseLLMProvider, ProviderConfig
from lattice_tpu.providers.hash_provider import HashEmbedder
from lattice_tpu.query.engine import QueryEngine
from lattice_tpu.query.query_planner import QueryIntent, QueryPlanner


class FlakyEmbeddingProvider(BaseEmbeddingProvider):
    """Fails N times, then succeeds — exercises the tenacity wrapper."""

    def __init__(self, fail_times: int):
        super().__init__(ProviderConfig(name="flaky", dimensions=8))
        self.fail_times = fail_times
        self.attempts = 0

    async def _embed(self, text: str) -> list[float]:
        self.attempts += 1
        if self.attempts <= self.fail_times:
            raise ConnectionError("transient")
        return [1.0] * 8


class AlwaysFailLLM(BaseLLMProvider):
    def __init__(self):
        super().__init__(ProviderConfig(name="dead"))

    async def _complete(self, messages, **kwargs) -> str:
        raise RuntimeError("llm down")


class TestProviderRetry:
    def test_retries_then_succeeds(self):
        provider = FlakyEmbeddingProvider(fail_times=2)
        # collapse tenacity's exponential waits so the test is instant
        provider._embed_with_retry.retry.wait = lambda *a, **k: 0
        out = asyncio.run(provider.embed("x"))
        assert out == [1.0] * 8
        assert provider.attempts == 3

    def test_exhausted_retries_raise(self):
        provider = FlakyEmbeddingProvider(fail_times=99)
        provider._embed_with_retry.retry.wait = lambda *a, **k: 0
        with pytest.raises(ConnectionError):
            asyncio.run(provider.embed("x"))
        assert provider.attempts == 5  # stop_after_attempt(5)


@pytest.fixture(scope="module")
def engine(sample_project_path):
    from lattice_tpu.config.settings import Settings
    settings = Settings()
    settings.metadata.enabled = False
    embedder = Embedder(HashEmbedder(dimensions=64))
    orchestrator = PipelineOrchestrator(
        sample_project_path, embedder, project_name="res",
        settings=settings)
    ctx = asyncio.run(orchestrator.run())
    return QueryEngine(ctx.graph_builder.store, ctx.indexer)


class TestQueryDegradation:
    def test_survives_vector_failure(self, engine, monkeypatch):
        def boom(*a, **k):
            raise RuntimeError("vector store down")
        monkeypatch.setattr(engine.vector_searcher, "search_code", boom)
        result = engine.search_sync("who calls validate_email_format?")
        # graph side still answers
        names = [r.qualified_name for r in result.results]
        assert "app.services.user_service.UserService.create_user" in names

    def test_survives_graph_failure(self, engine, monkeypatch):
        def boom(*a, **k):
            raise RuntimeError("graph down")
        monkeypatch.setattr(engine.graph_engine, "execute_query_plan", boom)
        result = engine.search_sync("email format validation")
        assert result.results  # vector side still answers
        assert any("graph search failed" in n
                   for n in result.graph_context.notes)

    def test_planner_llm_failure_falls_back(self):
        planner = QueryPlanner(AlwaysFailLLM())
        plan = asyncio.run(planner.plan_query("who calls save()?"))
        assert plan.source == "heuristic"
        assert plan.intent == QueryIntent.FIND_USAGE

    def test_responder_llm_failure_extractive(self, engine, monkeypatch):
        engine.responder.llm = AlwaysFailLLM()
        result = engine.query_sync("explain UserService")
        assert result.answer  # extractive fallback produced text
        engine.responder.llm = None


class TestPipelineFaultTolerance:
    def test_per_file_embed_error_skipped(self, tmp_path, sample_project_path):
        import shutil
        from lattice_tpu.config.settings import Settings
        root = tmp_path / "proj"
        shutil.copytree(sample_project_path, root)
        settings = Settings()
        settings.metadata.enabled = False

        class PoisonEmbedder:
            dimensions = 32
            calls = 0

            def embed(self, text):
                return self.embed_batch([text])[0]

            def embed_batch(self, texts):
                PoisonEmbedder.calls += 1
                if PoisonEmbedder.calls == 2:  # poison the 2nd file
                    raise RuntimeError("embed blew up")
                return [np.ones(32, dtype=np.float32).tolist()
                        for _ in texts]

        orchestrator = PipelineOrchestrator(
            root, Embedder(PoisonEmbedder()), project_name="faulty",
            settings=settings)
        ctx = asyncio.run(orchestrator.run())
        # pipeline completed despite the poisoned file
        assert ctx.tracker.failed is False
        assert any("embed" in e for e in ctx.errors)
        assert ctx.indexer.stats["files_indexed"] >= 1

    def test_stage_failure_tagged(self, tmp_path):
        from lattice_tpu.core.errors import IndexingError

        class DeadEmbedder:
            dimensions = 8

            def embed(self, text):
                raise RuntimeError("nope")

            def embed_batch(self, texts):
                raise RuntimeError("nope")

        (tmp_path / "a.py").write_text("def f():\n    pass\n")
        orchestrator = PipelineOrchestrator(
            tmp_path, Embedder(DeadEmbedder()), project_name="dead")
        # per-file tolerance means embed failures do NOT kill the run
        ctx = asyncio.run(orchestrator.run())
        assert any("embed" in e for e in ctx.errors)


class TestParserFuzz:
    """Deterministic byte-salad fuzz: parse_content must never raise —
    the probe-corpus contract (bad.py / garbage bytes / unterminated
    strings degrade to empty or partial results, .claude/skills/verify)."""

    def test_random_bytes_never_raise(self):
        import numpy as np

        from lattice_tpu.core.types import Language
        from lattice_tpu.parsing.parser import CodeParser

        rng = np.random.default_rng(1234)
        parser = CodeParser()
        snippets = []
        for _ in range(30):
            raw = bytes(rng.integers(0, 256, rng.integers(1, 400)).tolist())
            snippets.append(raw.decode("utf-8", errors="replace"))
        # structured-but-broken shapes too
        snippets += [
            "def f(:\n  pass", "class { x = ", "const a = \"unterminated",
            "import \x00\x01", "(((((((((((", "/* never closed",
            "`template ${", "def g():\n\treturn (", "interface X {",
        ]
        for lang in (Language.PYTHON, Language.JAVASCRIPT,
                     Language.TYPESCRIPT):
            for i, text in enumerate(snippets):
                parsed = parser.parse_content(text, lang, f"fuzz_{i}.x")
                assert parsed is not None  # degraded, never raised


class TestRealWorldEncodings:
    """BOM and CRLF files are everywhere in real repos; they must parse
    to the same entities (and sane line numbers) as clean LF sources —
    not merely avoid raising."""

    def test_bom_and_crlf_python(self):
        from lattice_tpu.core.types import Language
        from lattice_tpu.parsing.parser import CodeParser

        src = ("class Foo:\n"
               "    def bar(self):\n"
               "        return 1\n"
               "def baz():\n"
               "    return Foo()\n")
        parser = CodeParser()
        clean = parser.parse_content(src, Language.PYTHON, "clean.py")
        bom = parser.parse_content("﻿" + src, Language.PYTHON,
                                   "bom.py")
        crlf = parser.parse_content(src.replace("\n", "\r\n"),
                                    Language.PYTHON, "crlf.py")
        want = sorted((e.name, e.entity_type) for e in clean.all_entities)
        for variant in (bom, crlf):
            got = sorted((e.name, e.entity_type)
                         for e in variant.all_entities)
            assert got == want, variant.file_info.relative_path
        by_name = {e.name: e for e in crlf.all_entities}
        assert by_name["Foo"].start_line == 1
        assert by_name["baz"].start_line == 4

    def test_bom_and_crlf_typescript(self):
        from lattice_tpu.core.types import Language
        from lattice_tpu.parsing.parser import CodeParser

        src = ("export interface Shape {\n"
               "  area(): number;\n"
               "}\n"
               "export class Circle {\n"
               "  area() { return 3.14; }\n"
               "}\n")
        parser = CodeParser()
        clean = parser.parse_content(src, Language.TYPESCRIPT, "c.ts")
        crlf = parser.parse_content("﻿" + src.replace("\n", "\r\n"),
                                    Language.TYPESCRIPT, "b.ts")
        want = sorted(e.name for e in clean.all_entities)
        got = sorted(e.name for e in crlf.all_entities)
        assert got == want and "Circle" in got
