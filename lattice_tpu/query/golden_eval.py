"""Labeled retrieval-quality eval over the golden corpus (VERDICT r4 #2).

The reference's entire value is answering code questions
(`src/lattice/query/engine.py:102-220`); the golden corpus pins exact
STRUCTURE (node/edge/chunk counts) but until round 5 nothing pinned
retrieval QUALITY — a regression that halved answer relevance without
moving a count would have passed the suite. This module scores the
engine against a labeled query -> expected-qualified-names set
(`tests/fixtures/golden_eval.jsonl`, authored for this repo; the
graph-relation expectations — callers/callees/ancestors/descendants/
methods — are derived from the indexed golden graph and frozen):

- ``hit@5`` / ``hit@10``: fraction of queries whose top-5/10 results
  contain ANY expected qualified name.
- ``MRR@10``: mean reciprocal rank of the first expected hit.

Used three ways: `tests/test_golden_eval.py` pins floors (a relevance
regression fails CI the way a count regression does), `bench.py` emits
``golden_eval_mrr`` under the round contract, and
``python -m lattice_tpu.query.golden_eval`` prints one JSON line for
ad-hoc runs.
"""

from __future__ import annotations

import asyncio
import json
import shutil
import tempfile
from pathlib import Path

# repo-root/tests/fixtures — the eval set lives next to the corpus it
# labels so editing one forces thinking about the other
_REPO_ROOT = Path(__file__).resolve().parents[2]
CASES_PATH = _REPO_ROOT / "tests" / "fixtures" / "golden_eval.jsonl"
FIXTURE_PATH = _REPO_ROOT / "tests" / "fixtures" / "golden_project"


def load_cases(path: str | Path | None = None) -> list[dict]:
    p = Path(path) if path is not None else CASES_PATH
    cases = []
    with open(p, encoding="utf-8") as f:
        for line in f:
            line = line.strip()
            if line:
                cases.append(json.loads(line))
    return cases


def _rank_of_first_hit(results, expect: set[str], k: int) -> int | None:
    """1-based rank of the first result whose qualified name is
    expected, or None if no hit in the top k."""
    for i, r in enumerate(results[:k]):
        if r.qualified_name in expect:
            return i + 1
    return None


def evaluate(engine, cases: list[dict], k: int = 10) -> dict:
    """Run every case through the engine path it names and score it.

    Each case: {"query": str, "expect": [qualified names...],
    "intent": str (documentation), "path": "search" | "deep"}.
    """
    n = 0
    rr_sum = 0.0
    hit5 = hit10 = 0
    per_path: dict[str, dict] = {}
    misses: list[dict] = []
    for case in cases:
        expect = set(case["expect"])
        path = case.get("path", "search")
        if path == "deep":
            result = engine.deep_search(case["query"], limit=k)
        else:
            result = engine.search_sync(case["query"], limit=k)
        rank = _rank_of_first_hit(result.results, expect, k)
        n += 1
        pp = per_path.setdefault(path, {"n": 0, "rr": 0.0, "hit5": 0})
        pp["n"] += 1
        if rank is not None:
            rr_sum += 1.0 / rank
            pp["rr"] += 1.0 / rank
            hit10 += 1
            if rank <= 5:
                hit5 += 1
                pp["hit5"] += 1
        else:
            misses.append({
                "query": case["query"],
                "intent": case.get("intent"),
                "path": path,
                "got": [r.qualified_name for r in result.results[:5]],
            })
    out = {
        "n": n,
        "mrr": round(rr_sum / max(n, 1), 4),
        "hit_at_5": round(hit5 / max(n, 1), 4),
        "hit_at_10": round(hit10 / max(n, 1), 4),
        "per_path": {
            p: {"n": v["n"], "mrr": round(v["rr"] / max(v["n"], 1), 4),
                "hit_at_5": round(v["hit5"] / max(v["n"], 1), 4)}
            for p, v in per_path.items()
        },
        "misses": misses,
    }
    return out


def build_golden_engine(fixture: str | Path | None = None,
                        dim: int = 256, work_dir: str | None = None):
    """Index a throwaway copy of the golden fixture (hash embedder —
    the offline default) and return (engine, pipeline_ctx)."""
    from lattice_tpu.config.settings import Settings
    from lattice_tpu.embeddings.embedder import Embedder
    from lattice_tpu.pipeline.orchestrator import PipelineOrchestrator
    from lattice_tpu.providers.hash_provider import HashEmbedder
    from lattice_tpu.query.engine import QueryEngine

    src = Path(fixture) if fixture is not None else FIXTURE_PATH
    base = Path(work_dir) if work_dir else Path(tempfile.mkdtemp(
        prefix="golden_eval_"))
    tmp = base / "golden"
    if tmp.exists():
        shutil.rmtree(tmp)
    shutil.copytree(src, tmp)
    settings = Settings()
    settings.metadata.enabled = False
    orch = PipelineOrchestrator(tmp, Embedder(HashEmbedder(dimensions=dim)),
                                project_name="golden_eval",
                                settings=settings)
    ctx = asyncio.run(orch.run())
    if ctx.errors:
        raise RuntimeError(f"golden index failed: {ctx.errors[:3]}")
    return QueryEngine(ctx.graph_builder.store, ctx.indexer), ctx


def main() -> None:
    import time

    import jax

    # quality is platform-independent; never queue a relay grant for it.
    # Must be jax.config.update, not env: the site hook preloads jax
    # with JAX_PLATFORMS pinned (r4 CLI fix, main.py).
    jax.config.update("jax_platforms", "cpu")
    try:  # persistent jit cache: the 87 cases hit ~dozens of pad shapes
        jax.config.update("jax_compilation_cache_dir",
                          "/tmp/lattice_jax_cache")
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
    except Exception:
        pass
    t0 = time.perf_counter()
    engine, _ctx = build_golden_engine()
    build_s = time.perf_counter() - t0
    cases = load_cases()
    t0 = time.perf_counter()
    scores = evaluate(engine, cases)
    scores["eval_s"] = round(time.perf_counter() - t0, 1)
    scores["build_s"] = round(build_s, 1)
    # the deep-batch HTTP surface, end to end (VERDICT r4 #8): one HTTP
    # round trip -> one engine batch. Time is CPU-path (this subprocess
    # never attaches the chip); the on-chip amortized number rides
    # bench.py's hybrid_batch16 key — this key proves the SURFACE and
    # tracks its host overhead.
    try:
        import urllib.request

        from lattice_tpu.serving.http import ServingHTTPServer
        deep_qs = [c["query"] for c in cases if c["path"] == "deep"][:16]
        with ServingHTTPServer(engine.indexer.code, engine=engine,
                               max_wait_ms=2) as srv:
            host, port = srv.address
            body = json.dumps({"queries": deep_qs, "limit": 10}).encode()
            req = urllib.request.Request(
                f"http://{host}:{port}/v1/deep_search_batch", data=body,
                headers={"Content-Type": "application/json"},
                method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:  # warm
                json.loads(r.read())
            t0 = time.perf_counter()
            req2 = urllib.request.Request(
                f"http://{host}:{port}/v1/deep_search_batch", data=body,
                headers={"Content-Type": "application/json"},
                method="POST")
            with urllib.request.urlopen(req2, timeout=120) as r:
                out = json.loads(r.read())
            scores["http_deep_batch_ms_per_q"] = round(
                (time.perf_counter() - t0) * 1000.0 / len(deep_qs), 2)
            scores["http_deep_batch_n"] = len(out["results"])
    except Exception as exc:  # noqa: BLE001 — the eval line must print
        scores["http_deep_batch_error"] = repr(exc)[:120]
    scores["n_misses"] = len(scores["misses"])
    if "--misses" not in __import__("sys").argv:
        scores.pop("misses")
    print(json.dumps(scores), flush=True)


if __name__ == "__main__":
    main()
