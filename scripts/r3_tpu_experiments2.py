"""Round-3 TPU batch #2: encoder bf16-scores + flash block tuning, int4
speed-config recall, graph serving path, hybrid query — all at scale.

Progress -> /tmp/r3_progress2.log, results -> /tmp/r3_results2.json.
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r3_progress2.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/tmp/r3_results2.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def p50(xs):
    return float(np.percentile(np.asarray(xs), 50))


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")

    # ------------- Phase A: encoder scores_dtype + flash tuning ---------
    try:
        from lattice_tpu.models.unixcoder import (UniXcoderConfig,
                                                  UniXcoderModel)
        B, L = 128, 512
        rng = np.random.default_rng(0)
        ids = rng.integers(10, 50000, size=(B, L)).astype(np.int32)
        mask = np.ones((B, L), dtype=np.int32)
        mask[:, 480:] = 0

        def bench_model(model, iters=4):
            model.encode(ids, mask)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = model.encode(ids, mask)
            return B * iters / (time.perf_counter() - t0), out

        log("phase A: f32-scores baseline (first touch; relay grant wait)")
        m_f32 = UniXcoderModel(UniXcoderConfig(fused_attention=False),
                               seed=0)
        cps_f32, out_f32 = bench_model(m_f32)
        RESULTS["encode_f32scores_cps"] = round(cps_f32, 1)
        log(f"f32 scores: {cps_f32:.1f} cps")
        del m_f32
        gc.collect()

        m_bf16 = UniXcoderModel(UniXcoderConfig(
            fused_attention=False, scores_dtype="bfloat16"), seed=0)
        cps_bf, out_bf = bench_model(m_bf16)
        # embedding-quality delta: cosine between pooled outputs
        a = out_f32 / np.linalg.norm(out_f32, axis=1, keepdims=True)
        b = out_bf / np.linalg.norm(out_bf, axis=1, keepdims=True)
        cos = float(np.mean(np.sum(a * b, axis=1)))
        RESULTS["encode_bf16scores_cps"] = round(cps_bf, 1)
        RESULTS["encode_bf16scores_cosine_vs_f32"] = round(cos, 6)
        log(f"bf16 scores: {cps_bf:.1f} cps, cosine {cos:.6f}")
        del m_bf16
        gc.collect()
        save()
    except Exception as exc:
        log(f"phase A FAILED: {exc!r}")
        RESULTS["phaseA_error"] = repr(exc)[:300]
    save()

    # ------------- Phase B: graph serving + hybrid at 1M/10M ------------
    try:
        from bench import _bench_graph, _bench_hybrid
        from lattice_tpu.index.chunk_store import ChunkStore

        alt = {}
        g = _bench_graph(alt)
        log(f"graph: {alt}")
        RESULTS.update({f"g_{k}": v for k, v in alt.items()})
        save()

        # 1M-row store for the hybrid section
        key = jax.random.PRNGKey(0)
        N, D = 1 << 20, 768
        parts = []
        for i in range(0, N, 1 << 17):
            k2 = jax.random.fold_in(key, i)
            x = jax.random.normal(k2, (1 << 17, D), dtype=jnp.float32)
            x = x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                                1e-12)
            parts.append(x.astype(jnp.bfloat16))
        emb = jnp.concatenate(parts)
        del parts
        store = ChunkStore.from_device_arrays(
            emb, jnp.ones((N,), dtype=bool))
        q = np.asarray(jax.random.normal(jax.random.fold_in(key, 999),
                                         (8, D), dtype=jnp.float32))
        alt2 = {}
        _bench_hybrid(alt2, g, store, q)
        RESULTS.update(alt2)
        log(f"hybrid: {alt2}")
        del g, store, emb
        gc.collect()
    except Exception as exc:
        log(f"phase B FAILED: {exc!r}")
        RESULTS["phaseB_error"] = repr(exc)[:300]
    save()

    # ------------- Phase C: int4 speed-config recall at 1M --------------
    try:
        import functools

        from lattice_tpu.ops import topk as topk_ops
        from lattice_tpu.parallel.mesh import make_mesh
        from lattice_tpu.parallel.sharded_index import ShardedQuantizedIndex

        N, D, BQ, K = 1 << 20, 768, 256, 10
        key = jax.random.PRNGKey(7)
        kc, ka, kn, kq = jax.random.split(key, 4)

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
        log("phase C: oracle done; int4 speed config (fp rescore)")

        mesh = make_mesh(1)
        idx4 = ShardedQuantizedIndex(corpus, valid, mesh=mesh, bits=4,
                                     keep_full_precision=True)
        _, i_res = idx4.search(q, k=K)

        def recall(idx):
            return float(np.mean([
                len(set(a.tolist()) & set(b.tolist())) / K
                for a, b in zip(idx, i_ex)]))

        RESULTS["int4_fp_recall"] = round(recall(i_res), 4)
        t0 = time.perf_counter()
        for _ in range(4):
            _, i_res = idx4.search(q, k=K)
        RESULTS["int4_fp_qps"] = round(BQ * 4 / (time.perf_counter() - t0),
                                       1)
        log(f"int4 fp-rescore: recall {RESULTS['int4_fp_recall']} "
            f"qps {RESULTS['int4_fp_qps']}")
        # int8 capacity tier on the same data for the recall ladder
        idx8 = ShardedQuantizedIndex(corpus, valid, mesh=mesh, bits=8)
        _, i8 = idx8.search(q, k=K)
        RESULTS["int8_capacity_recall"] = round(recall(i8), 4)
        log(f"int8 capacity: recall {RESULTS['int8_capacity_recall']}")
        del idx4, idx8, corpus
        gc.collect()
    except Exception as exc:
        log(f"phase C FAILED: {exc!r}")
        RESULTS["phaseC_error"] = repr(exc)[:300]
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
