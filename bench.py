"""Benchmark: flat top-k search QPS on the resident device index.

Measures the retrieval core at BASELINE's contract scale (1M x 768-d chunk
embeddings, top-10) on whatever device JAX provides (the real TPU chip
under the driver; CPU elsewhere). Two device kernels are measured — the
Pallas fused bf16 scan and the int8 first-stage scan with full-precision
rescore — and the faster one is the headline. The comparison system is a
single-host NumPy exact scan (the stand-in for CPU Qdrant, which cannot run
in this offline image), measured on a subsample and scaled linearly (an
exact scan is O(N)). Prints ONE JSON line.

Corpus generation and recall reference both run on-device so the benchmark
itself is not host-bound.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np

N_ROWS = int(os.environ.get("BENCH_ROWS", 1_048_576))
DIM = 768
BATCH = int(os.environ.get("BENCH_BATCH", 256))
K = 10
DEVICE_ITERS = int(os.environ.get("BENCH_ITERS", 8))
HOST_SUBSAMPLE = int(os.environ.get("BENCH_HOST_ROWS", 65_536))


def main() -> None:
    import contextlib

    import jax
    import jax.numpy as jnp

    # Optional xprof capture: BENCH_TRACE_DIR=/tmp/xprof python bench.py
    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    trace_cm = (jax.profiler.trace(trace_dir) if trace_dir
                else contextlib.nullcontext())

    from lattice_tpu.ops import pallas_topk as pallas_ops
    from lattice_tpu.ops import quant as quant_ops
    from lattice_tpu.ops import topk as topk_ops

    device = jax.devices()[0]
    on_tpu = device.platform.lower() in ("tpu", "axon")

    # ---- corpus on device (host rng at 1M x 768 takes minutes on 1 core)
    key = jax.random.PRNGKey(0)
    kc, kq = jax.random.split(key)

    import functools

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen(k, n):
        x = jax.random.normal(k, (n, DIM), dtype=jnp.float32)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    corpus_f32 = gen(kc, N_ROWS)
    emb_dev = corpus_f32.astype(jnp.bfloat16)
    valid_dev = jnp.ones((N_ROWS,), dtype=bool)
    q_f32 = gen(kq, BATCH)
    queries = np.asarray(q_f32)  # forces attach + materialization

    tile = pallas_ops.pick_tile(N_ROWS, BATCH) if on_tpu else None

    def run_bf16():
        if tile is not None:
            # widened scan + exact f32 rescore of the winners: recall at
            # the bf16-storage ceiling with no measurable qps cost
            return pallas_ops.refined_topk(q_f32, emb_dev, valid_dev, K,
                                           tile=tile)
        return topk_ops.flat_topk(q_f32, emb_dev, valid_dev, K)

    def timed(fn):
        out = fn()
        np.asarray(out[1])  # warm-up/compile through readback
        t0 = time.perf_counter()
        for _ in range(DEVICE_ITERS):
            out = fn()
        idx = np.asarray(out[1])
        return BATCH * DEVICE_ITERS / (time.perf_counter() - t0), idx

    with trace_cm:
        bf16_qps, idx_bf16 = timed(run_bf16)

    # int8 first-stage + full-precision rescore (half the HBM bytes)
    q_view = quant_ops.QuantizedView(corpus_f32)

    def run_int8():
        # device-resident path: stays a jax.Array so iterations pipeline
        # (the host wrapper's per-call readback stalls the relay queue)
        return q_view.search_device(q_f32, valid_dev, K,
                                    full_precision=emb_dev, rescore_factor=4)

    int8_qps, idx_int8 = timed(run_int8)

    if int8_qps > bf16_qps:
        headline_qps, idx_np, kernel = int8_qps, idx_int8, "int8_rescore"
    else:
        headline_qps, idx_np = bf16_qps, idx_bf16
        kernel = "pallas_refined" if tile is not None else "xla_flat"

    # ---- recall reference: exact f32 top-k on device
    exact_s, exact_i = topk_ops.flat_topk(q_f32, corpus_f32, valid_dev, K)
    exact_i = np.asarray(exact_i)
    recall = np.mean([
        len(set(np.asarray(idx_np)[i].tolist()) & set(exact_i[i].tolist())) / K
        for i in range(BATCH)
    ])

    # ---- host exact-scan baseline on a subsample, scaled linearly
    sub = min(HOST_SUBSAMPLE, N_ROWS)
    host_corpus = np.asarray(corpus_f32[:sub])
    t0 = time.perf_counter()
    host_scores = queries @ host_corpus.T
    np.argpartition(-host_scores, min(K, sub - 1), axis=1)
    host_sub_s = time.perf_counter() - t0
    host_qps = BATCH / (host_sub_s * (N_ROWS / sub))

    print(json.dumps({
        "metric": f"topk_qps_{N_ROWS // 1000}k_{DIM}d",
        "value": round(headline_qps, 1),
        "unit": "queries/s",
        "vs_baseline": round(headline_qps / host_qps, 2),
        "extra": {
            "host_exact_qps_scaled": round(host_qps, 2),
            "recall_at_10_vs_exact": round(float(recall), 4),
            "device": str(device),
            "batch": BATCH,
            "k": K,
            "kernel": kernel,
            "tile": tile,
            "bf16_qps": round(bf16_qps, 1),
            "int8_qps": round(int8_qps, 1),
        },
    }))


if __name__ == "__main__":
    main()
