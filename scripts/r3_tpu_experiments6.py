"""Round-3 TPU batch #6: int4 matmul-unpack kernel A/B at 1M.

Progress -> /tmp/r3_progress6.log, results -> /tmp/r3_results6.json.
"""

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r3_progress6.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/tmp/r3_results6.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def main():
    import jax
    import jax.numpy as jnp

    log(f"devices: {jax.devices()}")
    from lattice_tpu.ops import pallas_topk as pk
    from lattice_tpu.ops import topk as topk_ops
    from lattice_tpu.ops.quant import quantize_rows, quantize_rows_int4

    N, D, B, K = 1 << 20, 768, 256, 10
    rng = np.random.default_rng(0)
    corpus = topk_ops.l2_normalize(
        rng.normal(size=(N, D)).astype(np.float32))
    queries = topk_ops.l2_normalize(
        rng.normal(size=(B, D)).astype(np.float32))
    packed, scales = quantize_rows_int4(corpus)
    qv, qs = quantize_rows(queries)
    valid = np.ones(N, bool)

    e_dev = jax.device_put(jnp.asarray(packed))
    s_dev = jax.device_put(jnp.asarray(scales))
    v_dev = jax.device_put(jnp.asarray(valid))
    qv_d, qs_d = jnp.asarray(qv), jnp.asarray(qs)
    tile = pk.pick_tile_packed(N, B, k=16)
    log(f"tile {tile}")

    # exact oracle for first-stage recall comparison
    emb_dev = jnp.asarray(corpus, dtype=jnp.bfloat16)
    _, i_ex = topk_ops.flat_topk(jnp.asarray(queries), emb_dev, v_dev, K)
    i_ex = np.asarray(i_ex)
    del emb_dev

    for name in ("matmul", "vpu"):
        try:
            fn = functools.partial(pk.binned_topk_int4, tile=tile,
                                   unpack=name)
            s1, c1 = fn(qv_d, qs_d, e_dev, s_dev, v_dev, 16)
            c_np = np.asarray(c1)
            rec = float(np.mean([
                len(set(c_np[i, :16].tolist()) & set(i_ex[i].tolist())) / K
                for i in range(B)]))
            t0 = time.perf_counter()
            iters = 10
            for _ in range(iters):
                s1, c1 = fn(qv_d, qs_d, e_dev, s_dev, v_dev, 16)
            np.asarray(c1)
            ms = (time.perf_counter() - t0) * 1000 / iters
            RESULTS[f"int4_{name}_ms_per_call"] = round(ms, 2)
            RESULTS[f"int4_{name}_qps"] = round(B * 1000 / ms, 1)
            RESULTS[f"int4_{name}_stage1_recall16"] = round(rec, 4)
            log(f"{name}: {ms:.2f} ms/call ({B * 1000 / ms:.0f} qps) "
                f"stage1-recall {rec:.4f}")
        except Exception as exc:
            log(f"{name} FAILED: {exc!r}")
            RESULTS[f"int4_{name}_error"] = repr(exc)[:300]
        save()

    # winners must agree between variants (same math)
    try:
        s_a, c_a = pk.binned_topk_int4(qv_d, qs_d, e_dev, s_dev, v_dev, 16,
                                       tile=tile, unpack="matmul")
        s_b, c_b = pk.binned_topk_int4(qv_d, qs_d, e_dev, s_dev, v_dev, 16,
                                       tile=tile, unpack="vpu")
        agree = float(np.mean(np.asarray(c_a) == np.asarray(c_b)))
        RESULTS["variant_agreement"] = round(agree, 4)
        log(f"variant agreement {agree:.4f}")
    except Exception as exc:
        log(f"agreement check failed: {exc!r}")

    # pipelined serving through the store (the real serving shape)
    try:
        import os

        from lattice_tpu.index.chunk_store import ChunkStore
        emb_dev2 = jnp.asarray(corpus, dtype=jnp.bfloat16)
        store = ChunkStore.from_device_arrays(emb_dev2,
                                              jnp.ones((N,), bool))
        os.environ["LATTICE_INT4"] = "1"
        q_bulk = jnp.asarray(np.concatenate([queries] * 8))
        np.asarray(store.search_device_pipelined(q_bulk, K, chunk=B)[1])
        t0 = time.perf_counter()
        for _ in range(4):
            out = store.search_device_pipelined(q_bulk, K, chunk=B)
        np.asarray(out[1])
        RESULTS["int4_pipelined_qps"] = round(
            8 * B * 4 / (time.perf_counter() - t0), 1)
        # and int8 for the same-run comparison
        os.environ.pop("LATTICE_INT4", None)
        np.asarray(store.search_device_pipelined(q_bulk, K, chunk=B)[1])
        t0 = time.perf_counter()
        for _ in range(4):
            out = store.search_device_pipelined(q_bulk, K, chunk=B)
        np.asarray(out[1])
        RESULTS["int8_pipelined_qps"] = round(
            8 * B * 4 / (time.perf_counter() - t0), 1)
        log(f"pipelined int4 {RESULTS['int4_pipelined_qps']} vs int8 "
            f"{RESULTS['int8_pipelined_qps']}")
    except Exception as exc:
        log(f"pipelined FAILED: {exc!r}")
        RESULTS["pipelined_error"] = repr(exc)[:300]
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
