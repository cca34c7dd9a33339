"""Round-3 TPU batch #8: B=1024 after the tile-budget fix + the golden
corpus indexed and queried end-to-end on the chip.

Progress -> /tmp/r3_progress8.log, results -> /tmp/r3_results8.json.
"""

import asyncio
import json
import shutil
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r3_progress8.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/tmp/r3_results8.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    # ---- B=1024 single-call serving after the VMEM budget fix ----------
    try:
        from lattice_tpu.index.chunk_store import ChunkStore
        from lattice_tpu.ops import topk as topk_ops

        N, D, K = 1 << 20, 768, 10
        rng = np.random.default_rng(0)
        corpus = topk_ops.l2_normalize(
            rng.normal(size=(N, D)).astype(np.float32))
        emb = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
        store = ChunkStore.from_device_arrays(emb, jnp.ones((N,), bool))
        for B in (512, 1024):
            q = jnp.asarray(topk_ops.l2_normalize(
                rng.normal(size=(B, D)).astype(np.float32)))
            np.asarray(store.search_device(q, K)[1])
            t0 = time.perf_counter()
            for _ in range(6):
                out = store.search_device(q, K)
            np.asarray(out[1])
            qps = B * 6 / (time.perf_counter() - t0)
            RESULTS[f"b{B}_qps"] = round(qps, 1)
            log(f"B={B}: {qps:.1f} qps")
        del store, emb, corpus
    except Exception as exc:
        log(f"B-sweep FAILED: {exc!r}")
        RESULTS["bsweep_error"] = repr(exc)[:300]
    save()

    # ---- golden corpus end-to-end ON the chip --------------------------
    try:
        from lattice_tpu.config.settings import Settings
        from lattice_tpu.embeddings.embedder import Embedder
        from lattice_tpu.pipeline.orchestrator import PipelineOrchestrator
        from lattice_tpu.providers.hash_provider import HashEmbedder
        from lattice_tpu.query.engine import QueryEngine

        src = Path("/root/repo/tests/fixtures/golden_project")
        tmp = Path(tempfile.mkdtemp()) / "golden"
        shutil.copytree(src, tmp)
        settings = Settings()
        settings.metadata.enabled = False
        t0 = time.perf_counter()
        orch = PipelineOrchestrator(
            tmp, Embedder(HashEmbedder(dimensions=768)),
            project_name="golden", settings=settings)
        ctx = asyncio.run(orch.run())
        RESULTS["golden_index_s"] = round(time.perf_counter() - t0, 1)
        RESULTS["golden_nodes"] = ctx.graph_builder.store.stats["nodes"]
        RESULTS["golden_chunks"] = len(ctx.indexer.code)
        log(f"golden indexed on chip in {RESULTS['golden_index_s']}s "
            f"({RESULTS['golden_chunks']} chunks)")

        engine = QueryEngine(ctx.graph_builder.store, ctx.indexer)
        queries = [
            "who calls validate_email?",
            "how are overdue tasks reported?",
            "task state machine transitions",
            "notification digest schedule",
        ]
        engine.search_sync(queries[0])  # warm/compile
        times = []
        for q in queries * 3:
            t0 = time.perf_counter()
            r = engine.search_sync(q)
            times.append((time.perf_counter() - t0) * 1000)
        RESULTS["golden_search_p50_ms"] = round(
            float(np.percentile(times, 50)), 1)
        names = [x.qualified_name for x in
                 engine.search_sync(queries[0]).results[:3]]
        RESULTS["golden_top_result"] = names[0] if names else None
        t0 = time.perf_counter()
        engine.deep_search(queries[0])
        RESULTS["golden_deep_ms"] = round(
            (time.perf_counter() - t0) * 1000, 1)
        log(f"golden search p50 {RESULTS['golden_search_p50_ms']} ms, "
            f"top {RESULTS['golden_top_result']}")
    except Exception as exc:
        log(f"golden FAILED: {exc!r}")
        RESULTS["golden_error"] = repr(exc)[:300]
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
