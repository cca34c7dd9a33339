"""Round-3 TPU batch #5: 4M int4 capacity serving after the dispatcher fix.

Progress -> /tmp/r3_progress5.log, results -> /tmp/r3_results5.json.
"""

import functools
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r3_progress5.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/tmp/r3_results5.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    from lattice_tpu.index.chunk_store import ChunkStore

    D = 768

    @functools.partial(jax.jit, static_argnames=("n", "c"))
    def gen_centers(k, n, c):
        x = jax.random.normal(k, (c, D), dtype=jnp.float32)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen_block(centers, ka, kn, n):
        assign = jax.random.randint(ka, (n,), 0, 1024)
        onehot = jax.nn.one_hot(assign, 1024, dtype=jnp.bfloat16)
        base = jax.lax.dot_general(
            onehot, centers.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = base + 0.06 * jax.random.normal(kn, (n, D), jnp.float32)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    try:
        N4 = 1 << 22
        key = jax.random.PRNGKey(11)
        kc, ka, kn, kq = jax.random.split(key, 4)
        centers = gen_centers(kc, N4, 1024)
        host_parts = []
        for i in range(0, N4, 1 << 17):
            host_parts.append(np.asarray(gen_block(
                centers, jax.random.fold_in(ka, i),
                jax.random.fold_in(kn, i),
                1 << 17).astype(jnp.bfloat16)))
        host_corpus = np.concatenate(host_parts)
        del host_parts
        q = np.asarray(gen_block(centers, jax.random.fold_in(kq, 5),
                                 jax.random.fold_in(kq, 6), 256))
        log("4M corpus assembled on host; device_put")
        emb = jax.device_put(jnp.asarray(host_corpus, dtype=jnp.bfloat16))
        del host_corpus
        store = ChunkStore.from_device_arrays(
            emb, jnp.ones((N4,), dtype=bool))
        os.environ["LATTICE_INT4"] = "1"
        plan = store._plan_search(256, 10, None, "auto")
        RESULTS["plan_4m_forced_int4"] = plan
        log(f"4M plan: {plan}")
        qd = jnp.asarray(q)
        _, idx = store.search_device(qd, 10)
        np.asarray(idx)
        t0 = time.perf_counter()
        for _ in range(6):
            _, idx = store.search_device(qd, 10)
        idx = np.asarray(idx)
        RESULTS["serving_4m_int4_qps"] = round(
            256 * 6 / (time.perf_counter() - t0), 1)
        save()
        from lattice_tpu.ops import pallas_topk as pk
        tile = pk.pick_tile(N4, 256, k=16)
        _, i_ref = pk.refined_topk(qd, store._emb, store._valid, 10,
                                   tile=tile or pk.DEFAULT_TILE)
        i_ref = np.asarray(i_ref)
        rec = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(idx, i_ref)]))
        RESULTS["serving_4m_int4_recall_vs_bf16"] = round(rec, 4)
        os.environ.pop("LATTICE_INT4", None)
        # auto plan at 4M without forcing: must NOT OOM (ivf gated on fit)
        plan_auto = store._plan_search(256, 10, None, "auto")
        RESULTS["plan_4m_auto"] = plan_auto
        log(f"4M int4: {RESULTS['serving_4m_int4_qps']} qps recall {rec}; "
            f"auto plan {plan_auto}")
    except Exception as exc:
        log(f"FAILED: {exc!r}")
        RESULTS["error"] = repr(exc)[:400]
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
