"""Round-2 TPU batch #9: the pipelined bulk-serving API on hardware.

Batch #8 post-fix: device module 2.4 ms, wall 5.5 ms — fixed dispatch
overhead. `search_device_pipelined` scans G chunks per execution; if the
overhead amortizes, bulk throughput approaches the module floor
(~100k qps int8 at 1M). Also re-measures the 4M int4 tier through the
layout-true path (batch #8's 4M ran but this adds the pipelined call).
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS: dict = {}
OUT = "/root/repo/R2_TPU_RESULTS9.json"


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def save() -> None:
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main() -> None:
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    dev = jax.devices()[0]
    log(f"attached: {dev}")
    RESULTS["device"] = str(dev)

    from lattice_tpu.ops import topk as topk_ops
    from lattice_tpu.index.chunk_store import ChunkStore

    N, D, K = 1_048_576, 768, 10
    N_CLUSTERS = 1024
    key = jax.random.PRNGKey(0)
    kc, ka, kn, kq = jax.random.split(key, 4)

    @functools.partial(jax.jit, static_argnames=("c",))
    def gen_centers(k, c):
        x = jax.random.normal(k, (c, D), dtype=jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-12)

    @functools.partial(jax.jit, static_argnames=("n", "spread"))
    def gen_block(centers, ka, kn, n, spread):
        assign = jax.random.randint(ka, (n,), 0, N_CLUSTERS)
        onehot = jax.nn.one_hot(assign, N_CLUSTERS, dtype=jnp.bfloat16)
        base = jax.lax.dot_general(
            onehot, centers.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = base + spread * jax.random.normal(kn, (n, D), dtype=jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-12)

    centers = gen_centers(kc, N_CLUSTERS)
    parts = []
    for i in range(0, N, 131_072):
        parts.append(gen_block(centers, jax.random.fold_in(ka, i),
                               jax.random.fold_in(kn, i), 131_072,
                               0.35).astype(jnp.bfloat16))
    emb = jnp.concatenate(parts)
    del parts
    emb_f32 = emb.astype(jnp.float32)
    valid = jnp.ones((N,), bool)
    q_all = gen_block(centers, jax.random.fold_in(kq, 1),
                      jax.random.fold_in(kq, 2), 2048, 0.35)
    np.asarray(q_all[:1])
    _, exact_i = topk_ops.flat_topk(q_all[:256], emb_f32, valid, K)
    exact_np = np.asarray(exact_i)
    log(f"1M corpus + oracle ready ({time.time()-t0:.0f}s)")

    store = ChunkStore.from_device_arrays(emb, valid)

    def recall_of(ids_np):
        return float(np.mean([
            len(set(ids_np[i].tolist()) & set(exact_np[i].tolist())) / K
            for i in range(min(256, ids_np.shape[0]))]))

    def timed(fn, iters=4, nq=2048):
        out = fn()
        np.asarray(out[1])
        t = time.perf_counter()
        for _ in range(iters):
            out = fn()
        last = np.asarray(out[1])
        dt = time.perf_counter() - t
        return nq * iters / dt, dt / iters * 1000.0, last

    for method in ("quantized", "int4", "pallas"):
        for nq in (2048,):
            name = f"pipelined_{method}_q{nq}"
            try:
                qn = q_all[:nq]
                qps, ms, ids = timed(lambda: store.search_device_pipelined(
                    qn, K, chunk=256, method=method), nq=nq)
                rec = recall_of(ids)
                RESULTS[name] = {"qps": round(qps, 1),
                                 "ms_total": round(ms, 2),
                                 "ms_per_256": round(ms / (nq // 256), 2),
                                 "recall": round(rec, 4)}
                log(f"{name}: {qps:,.0f} qps ({ms/(nq//256):.2f} ms/chunk) "
                    f"recall {rec:.4f}")
            except Exception as e:
                RESULTS[name] = {"error": repr(e)[:400]}
                log(f"{name} FAILED: {repr(e)[:160]}")
            save()

    # per-call reference on the same store (sanity vs batch 8)
    for method in ("quantized", "int4", "pallas"):
        try:
            q1 = q_all[:256]
            qps, ms, ids = timed(lambda: store.search_device(
                q1, K, method=method), nq=256, iters=8)
            RESULTS[f"percall_{method}"] = {
                "qps": round(qps, 1), "ms": round(ms, 2),
                "recall": round(recall_of(ids), 4)}
            log(f"percall {method}: {qps:,.0f} qps {ms:.2f} ms")
        except Exception as e:
            RESULTS[f"percall_{method}"] = {"error": repr(e)[:300]}
        save()

    RESULTS["total_s"] = round(time.time() - t0, 1)
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
