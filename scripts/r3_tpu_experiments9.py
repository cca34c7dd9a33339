"""Round-3 TPU batch #9: pipelined chunk-size sweep at 1M and 4M-int4
large-batch check.

Progress -> /tmp/r3_progress9.log, results -> /tmp/r3_results9.json.
"""

import functools
import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r3_progress9.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/tmp/r3_results9.json", "w") as f:
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
    TOTAL = 8192
    q_bulk = jnp.asarray(topk_ops.l2_normalize(
        rng.normal(size=(TOTAL, D)).astype(np.float32)))

    try:
        for chunk in (256, 512, 1024):
            np.asarray(store.search_device_pipelined(
                q_bulk, K, chunk=chunk)[1])
            t0 = time.perf_counter()
            for _ in range(3):
                out = store.search_device_pipelined(q_bulk, K, chunk=chunk)
            np.asarray(out[1])
            qps = TOTAL * 3 / (time.perf_counter() - t0)
            RESULTS[f"pipelined_chunk{chunk}_qps"] = round(qps, 1)
            log(f"pipelined chunk={chunk}: {qps:.1f} qps")
            save()
    except Exception as exc:
        log(f"pipelined sweep FAILED: {exc!r}")
        RESULTS["pipe_error"] = repr(exc)[:300]
    del store, emb, corpus, q_bulk
    gc.collect()
    save()

    # 4M int4 capacity tier at large batch (slab budget must hold)
    try:
        D4 = 768
        N4 = 1 << 22

        @functools.partial(jax.jit, static_argnames=("n",))
        def gen(key, n):
            x = jax.random.normal(key, (n, D4), dtype=jnp.float32)
            return (x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
            ).astype(jnp.bfloat16)

        key = jax.random.PRNGKey(3)
        parts = [np.asarray(gen(jax.random.fold_in(key, i), 1 << 17))
                 for i in range(0, N4 >> 17)]
        host = np.concatenate(parts)
        del parts
        emb4 = jax.device_put(jnp.asarray(host))
        del host
        store4 = ChunkStore.from_device_arrays(
            emb4, jnp.ones((N4,), bool))
        os.environ["LATTICE_INT4"] = "1"
        for B in (256, 1024):
            q = jnp.asarray(topk_ops.l2_normalize(
                rng.normal(size=(B, D4)).astype(np.float32)))
            np.asarray(store4.search_device(q, K)[1])
            t0 = time.perf_counter()
            for _ in range(4):
                out = store4.search_device(q, K)
            np.asarray(out[1])
            qps = B * 4 / (time.perf_counter() - t0)
            RESULTS[f"int4_4m_b{B}_qps"] = round(qps, 1)
            log(f"4M int4 B={B}: {qps:.1f} qps")
            save()
        os.environ.pop("LATTICE_INT4", None)
    except Exception as exc:
        log(f"4M phase FAILED: {exc!r}")
        RESULTS["p4m_error"] = repr(exc)[:300]
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
