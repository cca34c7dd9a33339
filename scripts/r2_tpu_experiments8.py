"""Round-2 TPU batch #8: measure the layout-true + single-execution paths.

Batch #6's trace decomposition showed the ~7 ms 1M scan was mostly GLUE:
per-call [N]->[N,1] relayouts of scales (~3.4 ms) and valid (~0.65 ms)
around a 2.2-2.8 ms kernel. The views now pre-shape both. Expected:
int8/int4 two-stage ~3.5-4 ms (65-70k qps), bf16 ~6 ms, 4M int4 ~11 ms.
Re-trace int8 to confirm the copies are gone.
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
OUT = "/root/repo/R2_TPU_RESULTS8.json"


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
    from lattice_tpu.ops import pallas_topk as pk
    from lattice_tpu.ops import quant as quant_ops
    from lattice_tpu.index.chunk_store import ChunkStore
    from lattice_tpu.utils.tracing import summarize_device_trace

    N, D, B, K = 1_048_576, 768, 256, 10
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
    vcol = pk.valid_col(valid)
    q = gen_block(centers, jax.random.fold_in(kq, 1),
                  jax.random.fold_in(kq, 2), B, 0.35)
    np.asarray(q)
    _, exact_i = topk_ops.flat_topk(q, emb_f32, valid, K)
    exact_np = np.asarray(exact_i)
    log(f"1M corpus + oracle ready ({time.time()-t0:.0f}s)")

    def recall_of(ids_np):
        return float(np.mean([
            len(set(ids_np[i].tolist()) & set(exact_np[i].tolist())) / K
            for i in range(ids_np.shape[0])]))

    def timed(fn, iters=8, batch=B):
        out = fn()
        np.asarray(out[1] if isinstance(out, tuple) else out)
        t = time.perf_counter()
        for _ in range(iters):
            out = fn()
        last = np.asarray(out[1] if isinstance(out, tuple) else out)
        dt = time.perf_counter() - t
        return batch * iters / dt, dt / iters * 1000.0, last

    # ---- post-hoist kernel timings --------------------------------------
    viewq = quant_ops.QuantizedView(emb_f32)
    view4 = quant_ops.Int4View(emb_f32)
    np.asarray(view4.scales[:2])
    log("views built")

    try:
        qps, ms, ids = timed(lambda: pk.binned_topk(q, emb, vcol, K,
                                                    tile=2048))
        RESULTS["bf16_hoisted"] = {"qps": round(qps, 1), "ms": round(ms, 2),
                                   "recall": round(recall_of(ids), 4)}
        log(f"bf16 hoisted: {qps:,.0f} qps {ms:.2f} ms")
    except Exception as e:
        RESULTS["bf16_hoisted"] = {"error": repr(e)[:300]}
    save()

    try:
        qps, ms, ids = timed(lambda: viewq.search_device(
            q, vcol, K, full_precision=emb))
        RESULTS["int8_view_hoisted"] = {
            "qps": round(qps, 1), "ms": round(ms, 2),
            "recall": round(recall_of(ids), 4)}
        log(f"int8 view hoisted: {qps:,.0f} qps {ms:.2f} ms")
    except Exception as e:
        RESULTS["int8_view_hoisted"] = {"error": repr(e)[:300]}
    save()

    try:
        qps, ms, ids = timed(lambda: view4.search_device(
            q, vcol, K, full_precision=emb))
        RESULTS["int4_view_hoisted"] = {
            "qps": round(qps, 1), "ms": round(ms, 2),
            "recall": round(recall_of(ids), 4)}
        log(f"int4 view hoisted: {qps:,.0f} qps {ms:.2f} ms")
    except Exception as e:
        RESULTS["int4_view_hoisted"] = {"error": repr(e)[:300]}
    save()

    # serving path: the store dispatcher end to end
    try:
        store = ChunkStore.from_device_arrays(emb, valid)
        for method in ("pallas", "quantized", "int4"):
            qps, ms, ids = timed(
                lambda: store.search_device(q, K, method=method))
            RESULTS[f"store_{method}"] = {
                "qps": round(qps, 1), "ms": round(ms, 2),
                "recall": round(recall_of(ids), 4)}
            log(f"store {method}: {qps:,.0f} qps {ms:.2f} ms")
            save()
        del store
    except Exception as e:
        RESULTS["store_error"] = repr(e)[:300]
        save()

    # re-trace int8 to confirm the relayout copies are gone
    try:
        tdir = "/tmp/xprof_int8_hoisted"
        fn = lambda: viewq.search_device(q, vcol, K, full_precision=emb)
        np.asarray(fn()[1])
        jax.profiler.start_trace(tdir)
        for _ in range(4):
            out = fn()
        np.asarray(out[1])
        jax.profiler.stop_trace()
        summ = summarize_device_trace(tdir, top=10)
        if "ops" in summ:
            summ["ops"] = [(n[:90], round(ms_, 3), round(fr, 3))
                           for n, ms_, fr in summ["ops"]]
            summ.pop("planes", None)
        RESULTS["trace_int8_hoisted"] = summ
        log(f"trace int8 hoisted: total {summ.get('total_ms')}")
    except Exception as e:
        RESULTS["trace_int8_hoisted"] = {"error": repr(e)[:300]}
    save()

    del emb, emb_f32, viewq, view4, exact_i

    # ---- 4M int4 with hoisting ------------------------------------------
    try:
        N4 = 4 * 1024 * 1024
        host = np.empty((N4, D), dtype=np.float32)
        for i in range(0, N4, 131_072):
            blk = gen_block(centers, jax.random.fold_in(ka, 7_000_000 + i),
                            jax.random.fold_in(kn, 7_000_000 + i),
                            131_072, 0.06)
            host[i:i + 131_072] = np.asarray(blk)
        emb4 = jnp.asarray(host, dtype=jnp.bfloat16)
        del host
        q4 = gen_block(centers, jax.random.fold_in(kq, 7),
                       jax.random.fold_in(kq, 8), B, 0.06)
        valid4 = jnp.ones((N4,), bool)
        vcol4 = pk.valid_col(valid4)
        _, exact4 = pk.refined_topk(q4, emb4, valid4, K, tile=2048)
        exact4_np = np.asarray(exact4)
        log(f"4M corpus + oracle ready ({time.time()-t0:.0f}s)")

        packs, scls = [], []
        for i in range(0, N4, 524_288):
            p, s = quant_ops.quantize_rows_int4_device(
                emb4[i:i + 524_288].astype(jnp.float32))
            packs.append(p)
            scls.append(s)
        v4 = quant_ops.Int4View.from_packed(jnp.concatenate(packs),
                                            jnp.concatenate(scls))
        del packs, scls
        np.asarray(v4.scales[:2])

        def rec4(ids_np):
            return float(np.mean([
                len(set(ids_np[i].tolist()) & set(exact4_np[i].tolist())) / K
                for i in range(ids_np.shape[0])]))

        qps, ms, ids = timed(lambda: v4.search_device(
            q4, vcol4, K, full_precision=emb4), iters=4)
        RESULTS["int4_4m_hoisted"] = {
            "qps": round(qps, 1), "ms": round(ms, 2),
            "recall": round(rec4(ids), 4)}
        log(f"int4 4M hoisted: {qps:,.0f} qps {ms:.2f} ms recall "
            f"{rec4(ids):.4f}")
        # capacity mode: first stage only (no bf16 resident in production)
        qps, ms, ids = timed(lambda: v4.search_device(q4, vcol4, K),
                             iters=4)
        RESULTS["int4_4m_first_hoisted"] = {
            "qps": round(qps, 1), "ms": round(ms, 2),
            "recall_no_rescore": round(rec4(ids[:, :K]), 4)}
        log(f"int4 4M first: {qps:,.0f} qps {ms:.2f} ms")
    except Exception as e:
        RESULTS["int4_4m_hoisted"] = {"error": repr(e)[:400]}
        log(f"4M FAILED: {e!r}")

    RESULTS["total_s"] = round(time.time() - t0, 1)
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
