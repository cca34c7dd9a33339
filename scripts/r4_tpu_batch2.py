"""Round-4 TPU batch #2: reruns after batch-1 fixes.

  E2 encoder device-resident throughput — is the 175 ms wall vs 109 ms
     device-busy gap the per-call pooled readback + host dispatch?
     Also: paired+pinned with a device-resident loop (the number the
     indexing pipeline can reach if store ingestion stays on device).
  Q2 int4 fma vs mul with the [B,1024] sub-tile fix + agreement +
     served view qps + 4M capacity tier.
  H2 hybrid single-query latency with the 32k reach budget (target
     <= 20 ms) at budgets 32k and 16k.
  S2 sharded int4 fp-rescore qps + categorized trace + no-rescore A/B.

Progress -> /tmp/r4_progress2.log, results -> /root/repo/R4_TPU_RESULTS2.json.
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r4_progress2.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/root/repo/R4_TPU_RESULTS2.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def p50(xs):
    return float(np.percentile(np.asarray(xs), 50))


B_ENC, L_ENC = 128, 512
N1M = 1 << 20
DIM = 768
K = 10

sys.path.insert(0, "/root/repo/scripts")
from r4_tpu_batch1 import _gen_corpus  # noqa: E402


def phase_e2():
    import jax
    import jax.numpy as jnp
    from lattice_tpu.models.unixcoder import (UniXcoderConfig,
                                              UniXcoderModel)

    rng = np.random.default_rng(0)
    ids = rng.integers(10, 50000, size=(B_ENC, L_ENC)).astype(np.int32)
    mask = np.ones((B_ENC, L_ENC), dtype=np.int32)
    mask[:, 480:] = 0
    h, ff, nl = 768, 3072, 12
    flops_tok = 2 * nl * (4 * h * h + 2 * h * ff) + 2 * nl * 2 * L_ENC * h

    m = UniXcoderModel(UniXcoderConfig(paired_attention=True), seed=0)
    m.enable_bf16_inference()
    m.pin_serving_layouts(B_ENC, L_ENC)
    # host-loop throughput (per-call np readback — the provider's loop)
    m.encode(ids, mask)
    m.encode(ids, mask)
    t0 = time.perf_counter()
    for _ in range(6):
        m.encode(ids, mask)
    host_cps = B_ENC * 6 / (time.perf_counter() - t0)
    RESULTS["enc_host_loop_cps"] = round(host_cps, 1)
    log(f"E2 host loop: {host_cps:.1f} cps")

    # device-resident loop: same forward, inputs on device, one scalar
    # readback at the end — what the chip actually sustains
    ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)
    fwd = m._forward
    out = fwd(m.params, ids_d, mask_d)
    out.block_until_ready()
    t0 = time.perf_counter()
    acc = None
    for _ in range(8):
        acc = fwd(m.params, ids_d, mask_d)
    float(jnp.sum(acc))
    dev_cps = B_ENC * 8 / (time.perf_counter() - t0)
    RESULTS["enc_device_loop_cps"] = round(dev_cps, 1)
    RESULTS["enc_device_loop_mfu"] = round(
        dev_cps * L_ENC * flops_tok / 197e12, 4)
    log(f"E2 device loop: {dev_cps:.1f} cps "
        f"(mfu {RESULTS['enc_device_loop_mfu']})")
    del m
    gc.collect()
    save()


def phase_q2():
    import jax.numpy as jnp
    from lattice_tpu.ops.pallas_topk import (binned_topk_int4,
                                             pick_tile_packed, valid_col)
    from lattice_tpu.ops.quant import (Int4View, _l2n,
                                       quantize_rows_device)

    emb, q = _gen_corpus(N1M, seed=1)
    log("Q2: quantizing 1M to int4")
    view = Int4View(emb.astype(jnp.float32))
    vcol = valid_col(jnp.ones((N1M,), bool))
    del emb
    gc.collect()
    qf = _l2n(q)
    qv, qs = quantize_rows_device(qf)
    qv, qs = jnp.asarray(qv), jnp.asarray(qs)
    tile = pick_tile_packed(N1M, 256, k=16)

    outs = {}
    for sel in ("mul", "fma"):
        fn = lambda: binned_topk_int4(  # noqa: E731
            qv, qs, view.values, view._scales_col, vcol,
            16, tile=tile, selection=sel)
        np.asarray(fn()[1])
        t0 = time.perf_counter()
        for _ in range(12):
            out = fn()
        ids = np.asarray(out[1])
        dt = (time.perf_counter() - t0) / 12
        outs[sel] = ids
        RESULTS[f"int4_sel_{sel}_ms"] = round(dt * 1e3, 3)
        RESULTS[f"int4_sel_{sel}_qps"] = round(256 / dt, 1)
        log(f"Q2 int4 {sel}: {dt*1e3:.2f} ms/call")
        save()
    agree = np.mean([len(set(outs['mul'][i]) & set(outs['fma'][i])) / 16
                     for i in range(256)])
    RESULTS["int4_sel_agreement"] = round(float(agree), 4)
    save()

    s, i = view.search_device(q, vcol, K)
    t0 = time.perf_counter()
    for _ in range(8):
        out = view.search_device(q, vcol, K)
    np.asarray(out[1])
    RESULTS["int4_view_qps"] = round(256 * 8 / (time.perf_counter() - t0), 1)
    log(f"Q2 int4 view: {RESULTS['int4_view_qps']} qps")
    del view
    gc.collect()
    save()

    log("Q2: building 4M int4")
    vals_parts, scl_parts = [], []
    for s4 in range(4):
        e4, _ = _gen_corpus(N1M, seed=10 + s4)
        v4 = Int4View(e4.astype(jnp.float32))
        vals_parts.append(v4.values)
        scl_parts.append(v4.scales)
        del e4, v4
        gc.collect()
    view4 = Int4View.from_packed(jnp.concatenate(vals_parts),
                                 jnp.concatenate(scl_parts))
    del vals_parts, scl_parts
    gc.collect()
    n4 = N1M * 4
    vcol4 = valid_col(jnp.ones((n4,), bool))
    tile4 = pick_tile_packed(n4, 256, k=16)
    for sel in ("mul", "fma"):
        fn = lambda: binned_topk_int4(  # noqa: E731
            qv, qs, view4.values, view4._scales_col, vcol4, 16,
            tile=tile4, selection=sel)
        np.asarray(fn()[1])
        t0 = time.perf_counter()
        for _ in range(8):
            out = fn()
        np.asarray(out[1])
        dt = (time.perf_counter() - t0) / 8
        RESULTS[f"int4_4m_{sel}_ms"] = round(dt * 1e3, 2)
        RESULTS[f"int4_4m_{sel}_qps"] = round(256 / dt, 1)
        log(f"Q2 4M {sel}: {dt*1e3:.2f} ms/call")
        save()
    del view4, vcol4
    gc.collect()


def phase_h2():
    import jax.numpy as jnp
    from lattice_tpu.core.types import EdgeType, EntityType
    from lattice_tpu.index.chunk_store import ChunkStore
    from lattice_tpu.index.graph_store import GraphStore
    from lattice_tpu.ops.ranking import (FuseWeights, pack_reach,
                                         pack_weights,
                                         hybrid_rank_device_packed)
    from lattice_tpu.query.query_planner import QueryPlanner

    log("H2: building 1M/10M graph")
    rng = np.random.default_rng(4)
    g = GraphStore()
    g.add_nodes_bulk([f"n{i}" for i in range(N1M)], EntityType.FUNCTION)
    g.add_edges_bulk(rng.integers(0, N1M, 10_000_000).astype(np.int32),
                     rng.integers(0, N1M, 10_000_000).astype(np.int32),
                     EdgeType.CALLS)
    g.finalize()
    seeds = rng.integers(0, N1M, 64).tolist()

    emb, q = _gen_corpus(N1M, seed=5)
    store = ChunkStore.from_device_arrays(emb, jnp.ones((N1M,), bool))
    planner = QueryPlanner()
    deg_nodes = g.device_degree(EdgeType.CALLS)
    cap = store.capacity
    m = min(int(deg_nodes.shape[0]), cap)
    degree = jnp.zeros((cap,), dtype=jnp.int32).at[:m].set(deg_nodes[:m])
    quality = jnp.ones((cap,), dtype=jnp.float32)
    weights = jnp.asarray(pack_weights(FuseWeights()))
    rel_table = jnp.asarray(np.asarray([0.7, 0.7, 0.7, 0.0], np.float32))
    no_match = jnp.asarray(np.full(64, -1, np.int32))
    emb_d, valid_d = store.device_arrays
    qd = jnp.asarray(q)

    for r_cap in (1 << 15, 1 << 14):
        def one_query(qvec, seed):
            planner.plan_heuristic(f"who calls f{seed}?")
            f_ids, f_d = g._host_bfs([seed], EdgeType.CALLS, 5,
                                     limit=r_cap // 2)
            b_ids, b_d = g._host_bfs([seed], EdgeType.CALLS, 5,
                                     reverse=True, limit=r_cap // 2)
            ids = np.concatenate([[seed], f_ids, b_ids])
            depths = np.concatenate([[0], f_d, b_d]).astype(np.int32)
            packed = pack_reach(ids, depths,
                                np.zeros(len(ids), np.uint8), r_cap)
            _, rows = hybrid_rank_device_packed(
                qvec, emb_d, valid_d, jnp.asarray(packed), rel_table,
                no_match, degree, quality, weights, 50)
            np.asarray(rows)

        one_query(qd[0], int(seeds[0]))
        times = []
        for i in range(16):
            t0 = time.perf_counter()
            one_query(qd[i], int(seeds[i]))
            times.append((time.perf_counter() - t0) * 1e3)
        key = f"hybrid_query_ms_budget{r_cap//1024}k"
        RESULTS[key] = round(p50(times), 2)
        log(f"H2 {key}: {RESULTS[key]} ms "
            f"(all: {[round(t, 1) for t in times[:8]]})")
        save()
    del store, emb, g
    gc.collect()


def phase_s2():
    import jax
    import jax.numpy as jnp
    from lattice_tpu.parallel.sharded_index import ShardedQuantizedIndex
    from lattice_tpu.utils.tracing import categorize_device_trace

    emb, q = _gen_corpus(N1M, seed=6)
    emb_np = np.asarray(emb)
    del emb
    gc.collect()
    log("S2: building sharded int4 fp-rescore (1-device mesh)")
    idx = ShardedQuantizedIndex(emb_np, np.ones(N1M, bool), bits=4,
                                keep_full_precision=True)
    qn = np.asarray(q)

    s, i = idx.search(qn, K)
    t0 = time.perf_counter()
    for _ in range(8):
        s, i = idx.search(qn, K)
    dt = (time.perf_counter() - t0) / 8
    RESULTS["sharded_int4_fp_qps"] = round(256 / dt, 1)
    log(f"S2 fp-rescore: {256/dt:.0f} qps")
    save()

    with jax.profiler.trace("/tmp/r4_trace_sharded"):
        for _ in range(4):
            idx.search(qn, K)
    RESULTS["trace_sharded"] = categorize_device_trace(
        "/tmp/r4_trace_sharded", top=15)
    save()

    s, i = idx.search(qn, K, rescore=False)
    t0 = time.perf_counter()
    for _ in range(8):
        s, i = idx.search(qn, K, rescore=False)
    dt = (time.perf_counter() - t0) / 8
    RESULTS["sharded_int4_norescore_qps"] = round(256 / dt, 1)
    log(f"S2 no-rescore: {256/dt:.0f} qps")
    save()


def main():
    import jax
    log(f"devices: {jax.devices()}")
    for name, fn in (("E2", phase_e2), ("Q2", phase_q2),
                     ("H2", phase_h2), ("S2", phase_s2)):
        try:
            t0 = time.perf_counter()
            fn()
            log(f"phase {name} done in {time.perf_counter()-t0:.0f} s")
        except Exception as exc:
            import traceback
            log(f"phase {name} FAILED: {exc!r}\n"
                + traceback.format_exc(limit=6))
            RESULTS[f"phase_{name}_error"] = repr(exc)[:300]
            save()
            gc.collect()
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
