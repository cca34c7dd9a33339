"""Round-3 TPU batch #4: sharded qps after in-jit quantization + 4M int4
spot check.

Progress -> /tmp/r3_progress4.log, results -> /tmp/r3_results4.json.
"""

import functools
import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r3_progress4.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/tmp/r3_results4.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    from lattice_tpu.ops import topk as topk_ops
    from lattice_tpu.parallel.mesh import make_mesh
    from lattice_tpu.parallel.sharded_index import ShardedQuantizedIndex

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

    # ---- 1M sharded qps (speed + capacity configs), post in-jit quant --
    try:
        N, BQ, K = 1 << 20, 256, 10
        key = jax.random.PRNGKey(7)
        kc, ka, kn, kq = jax.random.split(key, 4)
        centers = gen_centers(kc, N, 1024)
        parts = []
        for i in range(0, N, 1 << 17):
            parts.append(np.asarray(gen_block(
                centers, jax.random.fold_in(ka, i),
                jax.random.fold_in(kn, i), 1 << 17).astype(jnp.bfloat16)))
        corpus = np.concatenate(parts).astype(np.float32)
        del parts
        q = np.asarray(gen_block(centers, jax.random.fold_in(kq, 1),
                                 jax.random.fold_in(kq, 2), BQ))
        valid = np.ones(N, bool)
        emb_dev = jnp.asarray(corpus, dtype=jnp.bfloat16)
        _, i_ex = topk_ops.flat_topk(jnp.asarray(q), emb_dev,
                                     jnp.asarray(valid), K)
        i_ex = np.asarray(i_ex)
        del emb_dev
        gc.collect()

        def recall(idx):
            return float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(idx, i_ex)]))

        mesh = make_mesh(1)
        for name, kwargs in (
                ("int4_fp", dict(bits=4, keep_full_precision=True)),
                ("int8_cap", dict(bits=8)),
        ):
            idx = ShardedQuantizedIndex(corpus, valid, mesh=mesh, **kwargs)
            _, i_got = idx.search(q, k=K)
            t0 = time.perf_counter()
            for _ in range(6):
                _, i_got = idx.search(q, k=K)
            qps = BQ * 6 / (time.perf_counter() - t0)
            RESULTS[f"sharded_{name}_qps"] = round(qps, 1)
            RESULTS[f"sharded_{name}_recall"] = round(recall(i_got), 4)
            log(f"{name}: {qps:.1f} qps recall "
                f"{RESULTS[f'sharded_{name}_recall']}")
            del idx
            gc.collect()
            save()
        del corpus
        gc.collect()
    except Exception as exc:
        log(f"1M phase FAILED: {exc!r}")
        RESULTS["p1_error"] = repr(exc)[:300]
    save()

    # ---- 4M int4 capacity serving through the ChunkStore dispatcher ----
    try:
        from lattice_tpu.index.chunk_store import ChunkStore

        N4 = 1 << 22
        key = jax.random.PRNGKey(11)
        kc, ka, kn, kq = jax.random.split(key, 4)
        centers = gen_centers(kc, N4, 1024)
        # assemble on host (device concat OOMs at 4M - r2 lesson)
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
        import os
        os.environ["LATTICE_INT4"] = "1"
        plan = store._plan_search(256, 10, None, "auto")
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
        # recall vs refined oracle (flat [B,N] slab OOMs at 4M - r2)
        from lattice_tpu.ops import pallas_topk as pk
        tile = pk.pick_tile(N4, 256, k=16)
        _, i_ref = pk.refined_topk(qd, store._emb, store._valid, 10,
                                   tile=tile or pk.DEFAULT_TILE)
        i_ref = np.asarray(i_ref)
        rec = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / 10
            for a, b in zip(idx, i_ref)]))
        RESULTS["serving_4m_int4_recall"] = round(rec, 4)
        os.environ.pop("LATTICE_INT4", None)
        log(f"4M int4: {RESULTS['serving_4m_int4_qps']} qps recall {rec}")
    except Exception as exc:
        log(f"4M phase FAILED: {exc!r}")
        RESULTS["p2_error"] = repr(exc)[:300]
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
