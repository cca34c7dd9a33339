"""Round-3 TPU batch #7: large-batch serving qps + single-exec hybrid.

Progress -> /tmp/r3_progress7.log, results -> /tmp/r3_results7.json.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r3_progress7.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/tmp/r3_results7.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    from lattice_tpu.index.chunk_store import ChunkStore
    from lattice_tpu.ops import topk as topk_ops

    N, D, K = 1 << 20, 768, 10
    rng = np.random.default_rng(0)
    corpus = topk_ops.l2_normalize(
        rng.normal(size=(N, D)).astype(np.float32))
    emb = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16))
    store = ChunkStore.from_device_arrays(emb, jnp.ones((N,), bool))

    # large-batch single-call serving: does B>256 amortize the corpus
    # read the way the pipelined path does?
    for B in (256, 512, 1024):
        try:
            q = jnp.asarray(topk_ops.l2_normalize(
                rng.normal(size=(B, D)).astype(np.float32)))
            plan = store._plan_search(B, K, None, "auto")
            np.asarray(store.search_device(q, K)[1])
            t0 = time.perf_counter()
            iters = 6
            for _ in range(iters):
                out = store.search_device(q, K)
            np.asarray(out[1])
            qps = B * iters / (time.perf_counter() - t0)
            RESULTS[f"b{B}_plan"] = plan
            RESULTS[f"b{B}_qps"] = round(qps, 1)
            log(f"B={B} plan={plan}: {qps:.1f} qps")
        except Exception as exc:
            log(f"B={B} FAILED: {exc!r}")
            RESULTS[f"b{B}_error"] = repr(exc)[:200]
        save()

    # single-execution hybrid at 1M (engine math, bench harness)
    try:
        from bench import _bench_graph, _bench_hybrid
        alt = {}
        g = _bench_graph(alt)
        RESULTS["graph_khop_ms"] = alt.get("graph_khop_ms")
        alt2 = {}
        q8 = np.asarray(topk_ops.l2_normalize(
            rng.normal(size=(8, D)).astype(np.float32)))
        _bench_hybrid(alt2, g, store, q8)
        RESULTS.update(alt2)
        log(f"hybrid single-exec: {alt2}")
    except Exception as exc:
        log(f"hybrid FAILED: {exc!r}")
        RESULTS["hybrid_error"] = repr(exc)[:300]
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
