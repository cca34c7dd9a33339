"""Round-4 TPU batch #5: sharded device-resident retest + relay floor.

  R5 relay sync floor: trivial exec+readback p50, and fresh-upload
     cycles at 16/64/128 KB — the numbers behind the hybrid
     single-query latency writeup (is the barrier byte-bound or
     cycle-bound?).
  Q5 int4 served-view qps RE-measure: batch 4's 13.5 qps was a warmup
     artifact (no readback before the timed loop, so the first timed
     iteration absorbed the relay grant drain). Device-resident loop.
  S5 sharded int4 fp-rescore, POST layout-fix: search_device loop
     (device queries, one readback), the host wrapper for comparison,
     categorized trace (are %copy.9/%reshape.55 gone?), no-rescore A/B.
  H5 hybrid single-query decomposition at budgets 4k/16k: host stages
     (plan+BFS+pack) vs upload vs exec+readback, each timed alone.

Progress -> /tmp/r4_progress5.log, results -> /root/repo/R4_TPU_RESULTS5.json.
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r4_progress5.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/root/repo/R4_TPU_RESULTS5.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def p50(xs):
    return float(np.percentile(np.asarray(xs), 50))


N1M = 1 << 20
DIM = 768
K = 10

from r4_tpu_batch1 import _gen_corpus  # noqa: E402


def phase_r5():
    import jax
    import jax.numpy as jnp

    # drain the previous process's grant FIRST so no timed number eats it
    x = jnp.zeros((8,), jnp.float32)
    t0 = time.perf_counter()
    float(jnp.sum(x))
    RESULTS["relay_drain_s"] = round(time.perf_counter() - t0, 1)
    log(f"R5 drain: {RESULTS['relay_drain_s']} s")

    tiny = jax.jit(lambda v: jnp.sum(v))
    float(tiny(x))
    times = []
    for _ in range(16):
        t0 = time.perf_counter()
        float(tiny(x))
        times.append((time.perf_counter() - t0) * 1e3)
    RESULTS["relay_exec_readback_ms_p50"] = round(p50(times), 2)
    log(f"R5 exec+readback floor: {RESULTS['relay_exec_readback_ms_p50']} ms"
        f" (all: {[round(t,1) for t in times]})")
    save()

    # fresh-upload cycle: host bytes -> device -> consume -> scalar back
    consume = jax.jit(lambda v: jnp.sum(v[:16].astype(jnp.float32)))
    for kb in (16, 64, 128, 512):
        buf = np.arange(kb * 256, dtype=np.int32)  # kb KiB
        float(consume(jnp.asarray(buf)))
        times = []
        for i in range(8):
            buf[0] = i  # defeat any transfer caching
            t0 = time.perf_counter()
            float(consume(jnp.asarray(buf)))
            times.append((time.perf_counter() - t0) * 1e3)
        RESULTS[f"relay_upload_cycle_ms_{kb}kb"] = round(p50(times), 2)
        log(f"R5 upload cycle {kb}KB: {RESULTS[f'relay_upload_cycle_ms_{kb}kb']} ms")
    save()


def phase_q5():
    import jax.numpy as jnp
    from lattice_tpu.ops.pallas_topk import valid_col
    from lattice_tpu.ops.quant import Int4View

    emb, q = _gen_corpus(N1M, seed=1)
    view = Int4View(emb.astype(jnp.float32))
    fp = jnp.asarray(emb, jnp.bfloat16)
    vcol = valid_col(jnp.ones((N1M,), bool))
    del emb
    gc.collect()
    qd = jnp.asarray(q)

    # warm WITH readback (drains queue before timing)
    s, i = view.search_device(qd, vcol, K)
    np.asarray(i)
    t0 = time.perf_counter()
    for _ in range(12):
        out = view.search_device(qd, vcol, K)
    np.asarray(out[1])
    RESULTS["int4_view_qps"] = round(256 * 12 / (time.perf_counter() - t0), 1)
    log(f"Q5 int4 view (capacity mode): {RESULTS['int4_view_qps']} qps")

    # speed mode: int4 scan + resident bf16 rescore
    s, i = view.search_device(qd, vcol, K, full_precision=fp)
    np.asarray(i)
    t0 = time.perf_counter()
    for _ in range(12):
        out = view.search_device(qd, vcol, K, full_precision=fp)
    np.asarray(out[1])
    RESULTS["int4_view_fp_qps"] = round(
        256 * 12 / (time.perf_counter() - t0), 1)
    log(f"Q5 int4 view (fp rescore): {RESULTS['int4_view_fp_qps']} qps")
    del view, fp, qd
    gc.collect()
    save()


def phase_s5():
    import jax
    from lattice_tpu.parallel.sharded_index import ShardedQuantizedIndex
    from lattice_tpu.utils.tracing import categorize_device_trace
    import jax.numpy as jnp

    emb, q = _gen_corpus(N1M, seed=6)
    emb_np = np.asarray(emb)
    del emb
    gc.collect()
    log("S5: building sharded int4 fp-rescore (1-device mesh)")
    idx = ShardedQuantizedIndex(emb_np, np.ones(N1M, bool), bits=4,
                                keep_full_precision=True)
    del emb_np
    gc.collect()
    qn = np.asarray(q)
    qd = jnp.asarray(qn)

    # warm + drain
    s, i = idx.search(qn, K)

    # device-resident loop: the serving regime
    t0 = time.perf_counter()
    for _ in range(12):
        s_d, i_d = idx.search_device(qd, K)
    np.asarray(i_d)
    dt = (time.perf_counter() - t0) / 12
    RESULTS["sharded_int4_fp_qps_device"] = round(256 / dt, 1)
    log(f"S5 fp-rescore device loop: {256/dt:.0f} qps")
    save()

    # host wrapper (per-call upload+readback): the old-style number
    t0 = time.perf_counter()
    for _ in range(8):
        s, i = idx.search(qn, K)
    dt = (time.perf_counter() - t0) / 8
    RESULTS["sharded_int4_fp_qps_hostwrap"] = round(256 / dt, 1)
    log(f"S5 fp-rescore host wrapper: {256/dt:.0f} qps")
    save()

    with jax.profiler.trace("/tmp/r4_trace_sharded5"):
        for _ in range(4):
            s_d, i_d = idx.search_device(qd, K)
        np.asarray(i_d)
    RESULTS["trace_sharded_device"] = categorize_device_trace(
        "/tmp/r4_trace_sharded5", top=12)
    save()

    s_d, i_d = idx.search_device(qd, K, rescore=False)
    np.asarray(i_d)
    t0 = time.perf_counter()
    for _ in range(12):
        s_d, i_d = idx.search_device(qd, K, rescore=False)
    np.asarray(i_d)
    dt = (time.perf_counter() - t0) / 12
    RESULTS["sharded_int4_norescore_qps_device"] = round(256 / dt, 1)
    log(f"S5 no-rescore device loop: {256/dt:.0f} qps")
    del idx
    gc.collect()
    save()


def phase_h5():
    import jax.numpy as jnp
    from lattice_tpu.core.types import EdgeType, EntityType
    from lattice_tpu.index.chunk_store import ChunkStore
    from lattice_tpu.index.graph_store import GraphStore
    from lattice_tpu.ops.ranking import (FuseWeights,
                                         hybrid_rank_device_packed,
                                         pack_reach, pack_weights)
    from lattice_tpu.query.query_planner import QueryPlanner

    log("H5: building 1M/10M graph")
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

    for r_cap in (1 << 12, 1 << 14):
        kb = r_cap * 4 // 1024

        def host_stage(seed):
            planner.plan_heuristic(f"who calls f{seed}?")
            f_ids, f_d = g._host_bfs([seed], EdgeType.CALLS, 5,
                                     limit=r_cap // 2)
            b_ids, b_d = g._host_bfs([seed], EdgeType.CALLS, 5,
                                     reverse=True, limit=r_cap // 2)
            ids = np.concatenate([[seed], f_ids, b_ids])
            depths = np.concatenate([[0], f_d, b_d]).astype(np.int32)
            return pack_reach(ids, depths, np.zeros(len(ids), np.uint8),
                              r_cap)

        def device_stage(qvec, packed):
            _, rows = hybrid_rank_device_packed(
                qvec, emb_d, valid_d, jnp.asarray(packed), rel_table,
                no_match, degree, quality, weights, 50)
            np.asarray(rows)

        # e2e
        packed0 = host_stage(int(seeds[0]))
        device_stage(qd[0], packed0)  # warm the jit at this r_cap
        times, h_times, d_times = [], [], []
        for i in range(12):
            sd = int(seeds[i])
            t0 = time.perf_counter()
            pk = host_stage(sd)
            t1 = time.perf_counter()
            device_stage(qd[i], pk)
            t2 = time.perf_counter()
            times.append((t2 - t0) * 1e3)
            h_times.append((t1 - t0) * 1e3)
            d_times.append((t2 - t1) * 1e3)
        RESULTS[f"hybrid_query_ms_budget{kb}kb"] = round(p50(times), 2)
        RESULTS[f"hybrid_host_stage_ms_budget{kb}kb"] = round(p50(h_times), 2)
        RESULTS[f"hybrid_device_stage_ms_budget{kb}kb"] = round(
            p50(d_times), 2)
        log(f"H5 budget {kb}KB: e2e {RESULTS[f'hybrid_query_ms_budget{kb}kb']}"
            f" = host {RESULTS[f'hybrid_host_stage_ms_budget{kb}kb']}"
            f" + device {RESULTS[f'hybrid_device_stage_ms_budget{kb}kb']} ms")
        save()

        # device stage with PRE-uploaded evidence (splits upload cycle
        # from the exec+readback cycle)
        pk_dev = jnp.asarray(packed0)
        _, rows = hybrid_rank_device_packed(
            qd[0], emb_d, valid_d, pk_dev, rel_table, no_match,
            degree, quality, weights, 50)
        np.asarray(rows)
        times = []
        for i in range(12):
            t0 = time.perf_counter()
            _, rows = hybrid_rank_device_packed(
                qd[i], emb_d, valid_d, pk_dev, rel_table, no_match,
                degree, quality, weights, 50)
            np.asarray(rows)
            times.append((time.perf_counter() - t0) * 1e3)
        RESULTS[f"hybrid_exec_readback_ms_budget{kb}kb"] = round(
            p50(times), 2)
        log(f"H5 budget {kb}KB exec+readback only: "
            f"{RESULTS[f'hybrid_exec_readback_ms_budget{kb}kb']} ms")
        save()
    del store, emb, g
    gc.collect()


def main():
    import jax
    log(f"devices: {jax.devices()}")
    for name, fn in (("R5", phase_r5), ("Q5", phase_q5),
                     ("S5", phase_s5), ("H5", phase_h5)):
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
