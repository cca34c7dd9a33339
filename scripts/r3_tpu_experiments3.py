"""Round-3 TPU batch #3: encoder param-dtype + batch sweep for MFU.

Progress -> /tmp/r3_progress3.log, results -> /tmp/r3_results3.json.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r3_progress3.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/tmp/r3_results3.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def main():
    import jax

    from lattice_tpu.models.unixcoder import UniXcoderConfig, UniXcoderModel

    log(f"devices: {jax.devices()}")
    L = 512
    rng = np.random.default_rng(0)

    def bench(model, B, iters=4):
        ids = rng.integers(10, 50000, size=(B, L)).astype(np.int32)
        mask = np.ones((B, L), dtype=np.int32)
        mask[:, 480:] = 0
        model.encode(ids, mask)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = model.encode(ids, mask)
        return B * iters / (time.perf_counter() - t0), out

    h, ff, nl = 768, 3072, 12
    flops_tok = 2 * nl * (4 * h * h + 2 * h * ff) + 2 * nl * 2 * L * h

    def mfu(cps):
        return round(cps * L * flops_tok / 197e12, 4)

    try:
        m = UniXcoderModel(UniXcoderConfig(fused_attention=False), seed=0)
        cps_f32, out_f32 = bench(m, 128)
        RESULTS["b128_f32params_cps"] = round(cps_f32, 1)
        RESULTS["b128_f32params_mfu"] = mfu(cps_f32)
        log(f"f32 params B=128: {cps_f32:.1f} cps (mfu {mfu(cps_f32)})")

        m.enable_bf16_inference()
        cps_bf, out_bf = bench(m, 128)
        a = out_f32 / np.linalg.norm(out_f32, axis=1, keepdims=True)
        b = out_bf / np.linalg.norm(out_bf, axis=1, keepdims=True)
        RESULTS["b128_bf16params_cps"] = round(cps_bf, 1)
        RESULTS["b128_bf16params_mfu"] = mfu(cps_bf)
        RESULTS["b128_bf16params_cosine"] = round(
            float(np.mean(np.sum(a * b, axis=1))), 6)
        log(f"bf16 params B=128: {cps_bf:.1f} cps (mfu {mfu(cps_bf)}) "
            f"cosine {RESULTS['b128_bf16params_cosine']}")
        save()

        for B in (256, 384):
            try:
                cps, _ = bench(m, B, iters=3)
                RESULTS[f"b{B}_bf16params_cps"] = round(cps, 1)
                RESULTS[f"b{B}_bf16params_mfu"] = mfu(cps)
                log(f"bf16 params B={B}: {cps:.1f} cps (mfu {mfu(cps)})")
                save()
            except Exception as exc:
                log(f"B={B} failed: {exc!r}")
                RESULTS[f"b{B}_error"] = repr(exc)[:200]
                break

        # trace the bf16-params forward to see what remains
        try:
            from lattice_tpu.utils.tracing import summarize_device_trace
            ids = rng.integers(10, 50000, size=(128, L)).astype(np.int32)
            mask = np.ones((128, L), dtype=np.int32)
            trace_dir = "/tmp/r3_enc_trace_bf16"
            jax.profiler.start_trace(trace_dir)
            m.encode(ids, mask)
            jax.profiler.stop_trace()
            summ = summarize_device_trace(trace_dir, top=10)
            RESULTS["bf16params_trace_ops"] = summ.get("ops")
            RESULTS["bf16params_trace_total_ms"] = summ.get("total_ms")
        except Exception as exc:
            log(f"trace failed: {exc!r}")
    except Exception as exc:
        log(f"FAILED: {exc!r}")
        RESULTS["error"] = repr(exc)[:300]
    save()

    # hybrid section at full scale with the row-space fuse (validates the
    # bench fix after the 2M-cap shape crash in bench_r3a)
    try:
        import jax.numpy as jnp

        from bench import _bench_graph, _bench_hybrid
        from lattice_tpu.index.chunk_store import ChunkStore

        alt = {}
        g = _bench_graph(alt)
        key = jax.random.PRNGKey(0)
        N, D = 1 << 20, 768
        parts = []
        for i in range(0, N, 1 << 17):
            k2 = jax.random.fold_in(key, i)
            x = jax.random.normal(k2, (1 << 17, D), dtype=jnp.float32)
            x = x / jnp.maximum(
                jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
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
        log(f"hybrid row-space: {alt2}")
    except Exception as exc:
        log(f"hybrid FAILED: {exc!r}")
        RESULTS["hybrid_error"] = repr(exc)[:300]
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
