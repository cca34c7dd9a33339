"""Benchmark: the serving path, end to end, at BASELINE contract scale.

The headline is produced by `ChunkStore`'s auto dispatcher (VERDICT r1 #1:
the benched kernel must BE the serving path, not a hand-picked side API):
a 1M x 768 corpus searched at top-10 through `search_device`, which is
exactly what `VectorSearcher` reaches via `ChunkStore.search`.

Two corpus regimes are measured, because the dispatcher's whole job is
telling them apart (R2_TPU_RESULTS2: the spread=0.35 generator is
effectively ISOTROPIC after normalization — noise norm ~9.7x the center
norm — so IVF recall collapses to ~0.13 there and the gate must refuse
it, serving the binned flat scan; at spread=0.06 real cluster structure
exists and IVF serves at ~29k qps / 0.998 recall):
- headline: isotropic (the adversarial regime — flat-scan tier)
- extra `clustered_*`: spread=0.06 (the regime real code embeddings
  occupy; measured on this repo's own pipeline embeddings in tests)

Also measured (BASELINE configs 2 & 5, VERDICT r1 #4):
- `encode_chunks_per_s` — jitted Flax UniXcoder forward at the real
  12-layer/768 config (random init; throughput is weight-independent)
- `ivf_build_ms` — device k-means + bucket layout + recall self-measure
- `delta_upsert_ms` — incremental add of 256 rows into the live store
  (device row writes + O(delta) IVF/int8 view upserts, no rebuild)

Round-3 additions (VERDICT r2 #1/#3/#5/#7):
- `graph_*` — traversal kernels on a 1M-node / 10M-edge power-law code
  graph through `GraphStore.k_hop` (single-traversal latency + batched
  qps + hierarchy closure), BASELINE config 4.
- `hybrid_query_ms` — plan -> device BFS -> full-corpus cosine ->
  `fused_rank_rows` p50 at 1M rows (BASELINE config 5's query path).
- `latency_b1_ms` / `latency_b8_ms` — small-batch serving latency in
  both regimes.
- `ivf_fresh_after_delta` measured in the clustered regime (where IVF
  actually serves).

Comparison baselines (both host-side; CPU Qdrant cannot run in this
offline image — VERDICT r2 #7 renamed the field to say what it is):
- `vs_host_exact_scan` (was `vs_baseline`, kept one round): single-core
  NumPy exact scan on a subsample, scaled linearly (exact scan is O(N)).
- `host_ivf_qps_est`: a NumPy IVF (sqrt(N) lists, nprobe=8) measured on
  the subsample and scaled by the IVF cost model
  (nlist + nprobe*N/nlist dots/query) — an honest HNSW-class CPU
  estimate, since graph-ANN serves in the same 10^2-10^3 qps decade.
Recall methodology per BASELINE: bf16 rows are half the bytes of the f32
HNSW vectors Qdrant stores (before its graph overhead), so recall@10 vs
the exact scan at >=0.95 matches "recall parity at equal memory".
Prints ONE JSON line.
"""

from __future__ import annotations

import gc
import json
import os
import signal
import sys
import threading
import time

# ---- survivability (VERDICT r4 #1) -----------------------------------------
# Round 4's driver-captured bench TIMED OUT mid-run and, because the one
# JSON line printed only at the very end, every number already measured
# was erased (BENCH_r04.json: rc=124, parsed=null). The contract now:
# results accumulate into RESULT as sections complete, and the line is
# emitted (a) at normal completion, (b) on SIGTERM (GNU timeout's first
# signal), (c) by a hard-deadline watchdog THREAD (a Python signal
# handler cannot run while the main thread is wedged inside a C call to
# a stuck relay; a daemon thread can still print and _exit), and (d) a
# soft per-section budget skips optional sections when the run is late.
RESULT: dict = {
    "metric": None,
    "value": None,
    "unit": "queries/s",
    "vs_baseline": None,
    "extra": {},
}
_BENCH_T0 = time.monotonic()
SOFT_BUDGET_S = float(os.environ.get("BENCH_TIME_BUDGET_S", "1200"))
HARD_BUDGET_S = float(os.environ.get("BENCH_HARD_BUDGET_S", "1500"))
_EMIT_LOCK = threading.Lock()
_EMITTED = False


def _elapsed() -> float:
    return time.monotonic() - _BENCH_T0


def _emit(truncated: bool = False, why: str | None = None) -> None:
    """Print the one JSON line exactly once (thread/signal safe).

    Re-entrancy hazard (review r5): the SIGTERM handler runs on the
    MAIN thread — if it fired while the main thread was already inside
    this critical section, a plain lock acquire would deadlock against
    the interrupted frame and the process would wedge with NO line (the
    exact BENCH_r04 outcome these guards exist to prevent). So the main
    thread masks the signals for the duration; a handler racing the
    WATCHDOG thread just blocks briefly (different threads — the lock
    holder can finish) and then sees _EMITTED."""
    global _EMITTED
    is_main = threading.current_thread() is threading.main_thread()
    old_mask = None
    if is_main:
        try:
            old_mask = signal.pthread_sigmask(
                signal.SIG_BLOCK, {signal.SIGTERM, signal.SIGINT})
        except (ValueError, OSError):
            pass
    try:
        with _EMIT_LOCK:
            if _EMITTED:
                return
            _EMITTED = True
            if truncated:
                RESULT["extra"]["truncated"] = True
                if why:
                    RESULT["extra"]["truncated_why"] = why
                RESULT["extra"]["elapsed_s"] = round(_elapsed(), 1)
            print(json.dumps(RESULT), flush=True)
    finally:
        if old_mask is not None:
            signal.pthread_sigmask(signal.SIG_SETMASK, old_mask)


def _install_guards() -> None:
    def on_term(signum, frame):  # noqa: ARG001
        _emit(truncated=True, why=f"signal {signum}")
        os._exit(0)  # flushing already done by _emit; exit NOW

    try:
        signal.signal(signal.SIGTERM, on_term)
        signal.signal(signal.SIGINT, on_term)
    except (ValueError, OSError):
        pass  # non-main thread / exotic host: watchdog still covers us

    def watchdog():
        # loop instead of one computed sleep: _BENCH_T0 is RESET after
        # the first successful device materialization (the relay's
        # grant-drain can block the first round-trip ~8 min, and that
        # queue wait must not burn the measurement budget)
        while True:
            remaining = HARD_BUDGET_S - _elapsed()
            if remaining <= 0:
                break
            time.sleep(min(remaining, 30.0))
        _emit(truncated=True, why=f"hard budget {HARD_BUDGET_S:.0f}s")
        os._exit(3)

    threading.Thread(target=watchdog, daemon=True,
                     name="bench-watchdog").start()


class _SectionSkipped(Exception):
    """Raised inside a section's try to bail without recording an error."""


def _skip_if_late(section: str) -> bool:
    """Soft budget: optional sections are skipped once the run is late —
    a partial-but-parsed record beats a complete-but-killed one."""
    if _elapsed() <= SOFT_BUDGET_S:
        return False
    RESULT["extra"].setdefault("skipped_sections", []).append(section)
    _mark(f"SKIP {section} (soft budget {SOFT_BUDGET_S:.0f}s, "
          f"elapsed {_elapsed():.0f}s)")
    return True


def _mark(section: str) -> None:
    extra = ""
    try:
        import jax
        st = jax.devices()[0].memory_stats() or {}
        # memory_stats() is empty through the axon relay (measured r4:
        # every mark read 0 during a real OOM) — also count the CLIENT's
        # live arrays, which the relay cannot hide. Device-side holds by
        # OTHER processes stay invisible either way.
        live = sum(getattr(a, "nbytes", 0) or 0 for a in jax.live_arrays())
        extra = (f" (device {st.get('bytes_in_use', 0) / 1e6:.0f} MB,"
                 f" client live {live / 1e6:.0f} MB)")
    except Exception:
        pass
    print(f"[bench] {section}{extra}", file=sys.stderr, flush=True)

import numpy as np

N_ROWS = int(os.environ.get("BENCH_ROWS", 1_048_576))
DIM = 768
BATCH = int(os.environ.get("BENCH_BATCH", 256))
K = 10
# 32 iters so the relay's ~34 ms sync floor (R4_TPU_RESULTS5) amortizes
# below 10% of the timed window — at 8 iters the floor was ~half the
# window and the headline under-read by ~30% (40.6k vs 53k view-level)
DEVICE_ITERS = int(os.environ.get("BENCH_ITERS", 32))
HOST_SUBSAMPLE = int(os.environ.get("BENCH_HOST_ROWS", 65_536))
N_CLUSTERS = int(os.environ.get("BENCH_CLUSTERS", 1024))
# B=128 measured best at full length on v5e (612 chunks/s vs 471 at
# B=32; R2_TPU_RESULTS10) — bigger batches fill the MXU
ENCODE_BATCH = int(os.environ.get("BENCH_ENCODE_BATCH", 128))
ENCODE_LEN = 512
DELTA_ROWS = 256


def _p50(samples_ms: list[float]) -> float:
    return float(np.percentile(np.asarray(samples_ms), 50))


def _bench_latency(store, queries_f32, k: int, iters: int = 12) -> dict:
    """Small-batch serving latency at B=1 and B=8 (VERDICT r2 #5).

    Two numbers per batch size: `latency_b*_ms` is the sequential
    round-trip p50 (each call reads back before the next — through the
    axon relay this measures mostly the ~20 ms tunnel RTT), and
    `latency_b*_amortized_ms` pipelines `iters` calls and reads back once
    — the device's actual per-query service time."""
    out = {}
    for b in (1, 8):
        q = queries_f32[:b]
        store.search_device(q, k)  # warm/compile this batch shape
        times = []
        for _ in range(iters):
            t0 = time.perf_counter()
            _, idx = store.search_device(q, k)
            np.asarray(idx)
            times.append((time.perf_counter() - t0) * 1000.0)
        out[f"latency_b{b}_ms"] = round(_p50(times), 3)
        t0 = time.perf_counter()
        for _ in range(iters):
            _, idx = store.search_device(q, k)
        np.asarray(idx)
        out[f"latency_b{b}_amortized_ms"] = round(
            (time.perf_counter() - t0) * 1000.0 / iters, 3)
    return out


def _build_bench_graph(n_nodes: int, n_edges: int, seed: int = 0):
    """Synthetic code graph: power-law in-degree CALLS edges (a few hub
    utilities called from everywhere, a long tail of leaf functions —
    the shape real call graphs take)."""
    from lattice_tpu.core.types import EdgeType, EntityType
    from lattice_tpu.index.graph_store import GraphStore

    rng = np.random.default_rng(seed)
    g = GraphStore()
    g.add_nodes_bulk([f"m.f{i}" for i in range(n_nodes)],
                     EntityType.FUNCTION, "synthetic.py")
    src = rng.integers(0, n_nodes, size=n_edges, dtype=np.int64)
    # power-law targets: u^4 concentrates mass near node 0 (hubs)
    dst = (n_nodes * rng.random(n_edges) ** 4).astype(np.int64)
    dst = np.minimum(dst, n_nodes - 1)
    g.add_edges_bulk(src, dst, EdgeType.CALLS)
    # EXTENDS: a sparse forest over 10% of nodes for the hierarchy closure
    n_ext = max(n_nodes // 10, 1)
    child = rng.choice(n_nodes, size=n_ext, replace=False)
    parent = (n_nodes * rng.random(n_ext) ** 4).astype(np.int64)
    g.add_edges_bulk(child, np.minimum(parent, n_nodes - 1),
                     EdgeType.EXTENDS)
    g.finalize()
    return g


def _bench_graph(alt: dict) -> "GraphStore | None":
    """BASELINE config 4: CALLS/EXTENDS traversals as frontier kernels at
    1M nodes / 10M edges, measured through `GraphStore.k_hop` exactly as
    the serving path runs them (reference semantics:
    `query/graph_reasoning/queries.py:2-50,88-128`)."""
    from lattice_tpu.core.types import EdgeType

    n = int(os.environ.get("BENCH_GRAPH_NODES", 1 << 20))
    e = int(os.environ.get("BENCH_GRAPH_EDGES", 10_000_000))
    rng = np.random.default_rng(1)
    # graph_build_s swung 16.7 -> 90.2 s between identical-code runs
    # (FINAL9 vs FINAL10) with no way to attribute it (VERDICT r4 #5).
    # Split the phases: host build (python-list appends on a 1-core box
    # — contention-bound), CSR finalize (np argsort of 10M edges;
    # best-of-2 since it is re-runnable), and the first device-cache
    # materialization (relay-upload-bound: ~80 MB of edges at ~20 MB/s).
    t0 = time.perf_counter()
    g = _build_bench_graph(n, e)
    host_and_final = time.perf_counter() - t0
    t0 = time.perf_counter()
    g._finalized = False
    g.finalize()  # second run: same inputs, re-sorts the same arrays
    fin2 = time.perf_counter() - t0
    alt["graph_finalize_s"] = round(fin2, 1)
    alt["graph_host_build_s"] = round(max(host_and_final - fin2, 0.0), 1)
    alt["graph_build_s"] = round(host_and_final, 1)  # legacy total
    try:
        t0 = time.perf_counter()
        np.asarray(g.device_degree(EdgeType.CALLS))
        alt["graph_device_upload_s"] = round(time.perf_counter() - t0, 1)
    except Exception as exc:
        alt["graph_upload_error"] = repr(exc)[:120]
    alt["graph_nodes"] = n
    alt["graph_edges"] = e

    hops, limit = 5, 50
    seeds = rng.integers(0, n, size=64).tolist()
    # serving path: vectorized host CSR walk (R3 measured 4 ms p50 here
    # vs 1.5 s for the dense device BFS — XLA scalar gather is serial)
    g.k_hop([seeds[0]], EdgeType.CALLS, hops=hops, limit=limit)  # warm
    times = []
    for s in seeds[:32]:
        t0 = time.perf_counter()
        g.k_hop([s], EdgeType.CALLS, hops=hops, limit=limit)
        times.append((time.perf_counter() - t0) * 1000.0)
    alt["graph_khop_ms"] = round(_p50(times), 2)

    # callers (reverse) share the cadence
    times = []
    for s in seeds[:16]:
        t0 = time.perf_counter()
        g.k_hop([s], EdgeType.CALLS, hops=hops, limit=limit, reverse=True)
        times.append((time.perf_counter() - t0) * 1000.0)
    alt["graph_khop_rev_ms"] = round(_p50(times), 2)

    # traversal throughput: 64 independent queries, serving path
    qsets = [[int(s)] for s in seeds]
    t0 = time.perf_counter()
    iters = 3
    for _ in range(iters):
        g.k_hop_batch(qsets, EdgeType.CALLS, hops=hops, limit=limit)
    alt["graph_khop_qps"] = round(
        len(qsets) * iters / (time.perf_counter() - t0), 1)

    # the dense device batch kernel, for the huge-reach regime
    try:
        g.k_hop_batch(qsets, EdgeType.CALLS, hops=hops, limit=limit,
                      device=True)  # warm/compile
        t0 = time.perf_counter()
        g.k_hop_batch(qsets, EdgeType.CALLS, hops=hops, limit=limit,
                      device=True)
        alt["graph_khop_qps_device_dense"] = round(
            len(qsets) / (time.perf_counter() - t0), 1)
    except Exception as exc:
        alt["graph_device_error"] = repr(exc)[:120]

    # hierarchy closure (EXTENDS both directions, `queries.py:88-128`) —
    # seeded from rows that actually HAVE hierarchy edges (random node
    # ids mostly miss the sparse EXTENDS forest and measure nothing)
    ext_src, _ = g.edges(EdgeType.EXTENDS)
    ext_seeds = [int(s) for s in
                 ext_src[rng.integers(0, len(ext_src), size=8)]]
    t0 = time.perf_counter()
    up = g.k_hop(ext_seeds, EdgeType.EXTENDS, hops=5, limit=limit)
    down = g.k_hop(ext_seeds, EdgeType.EXTENDS, hops=5, limit=limit,
                   reverse=True)
    alt["graph_closure_ms"] = round((time.perf_counter() - t0) * 1000.0, 2)
    alt["graph_closure_nodes"] = len(up) + len(down)
    return g


def _bench_hybrid(alt: dict, graph, store, queries_f32) -> None:
    """BASELINE config 5's query path: plan -> sparse host BFS (the
    measured-best traversal at this scale) -> full-corpus cosine ->
    `fused_rank_rows_sparse` (the deep_search device route,
    `query/engine.py`), p50 end-to-end at 1M rows. Rows join nodes 1:1
    (the bench store holds no payloads; the engine path uses the
    resident graph_node_id column instead)."""
    import jax.numpy as jnp

    from lattice_tpu.core.types import EdgeType
    from lattice_tpu.ops import graph_kernels as gk
    from lattice_tpu.ops import topk as topk_ops
    from lattice_tpu.ops.ranking import (FuseWeights,
                                         fused_rank_rows_sparse,
                                         hybrid_rank_device_packed,
                                         pack_reach, pack_weights)
    from lattice_tpu.query.query_planner import QueryPlanner

    planner = QueryPlanner()
    cap = store.capacity
    # rows join nodes 1:1 in the bench corpus, so the resident degree
    # column is the graph degree vector fit to row space (the store may
    # have grown past the node count via the delta-upsert section)
    deg_nodes = graph.device_degree(EdgeType.CALLS)
    m = min(int(deg_nodes.shape[0]), cap)
    degree = jnp.zeros((cap,), dtype=jnp.int32).at[:m].set(deg_nodes[:m])
    quality = jnp.ones((cap,), dtype=jnp.float32)
    match = jnp.zeros((cap,), dtype=jnp.float32)
    weights = jnp.asarray(pack_weights(FuseWeights()))
    emb, valid = store.device_arrays
    rng = np.random.default_rng(2)
    R_CAP = 1 << 15  # evidence budget = pad bucket (stable jit key);
    # the shallowest 16k nodes per direction — bounding the BFS kills
    # the big-frontier sort AND the relay upload (R4_TPU_RESULTS1:
    # unbounded reach cost ~100 ms/query)

    rel_table = jnp.asarray(np.asarray([0.7, 0.7, 0.7, 0.0], np.float32))
    no_match = jnp.asarray(np.full(64, -1, np.int32))

    def one_query(qvec, seed_id):
        plan = planner.plan_heuristic(f"who calls f{seed_id}?")  # host plan
        f_ids, f_d = graph._host_bfs([seed_id], EdgeType.CALLS, 5,
                                     limit=R_CAP // 2)
        b_ids, b_d = graph._host_bfs([seed_id], EdgeType.CALLS, 5,
                                     reverse=True, limit=R_CAP // 2)
        # the NumPy fallback walk ignores `limit`; trim each direction
        # to the shallowest-(depth, id) prefix like the native walk and
        # the engine do, so pack_reach never truncates one direction out
        if len(f_ids) > R_CAP // 2:
            o = np.lexsort((f_ids, f_d))[: R_CAP // 2]
            f_ids, f_d = f_ids[o], f_d[o]
        if len(b_ids) > R_CAP // 2:
            o = np.lexsort((b_ids, b_d))[: R_CAP // 2]
            b_ids, b_d = b_ids[o], b_d[o]
        ids = np.concatenate([[seed_id], f_ids, b_ids])
        depths = np.concatenate([[0], f_d, b_d]).astype(np.int32)
        # reach rides packed: 4 B/entry instead of 12 (the upload through
        # the relay dominated this path's p50 in r3)
        packed = pack_reach(ids, depths, np.zeros(len(ids), np.uint8),
                            R_CAP)
        # ONE device execution: cosine + scatter + fuse + selection
        scores, rows = hybrid_rank_device_packed(
            qvec, emb, valid, jnp.asarray(packed), rel_table, no_match,
            degree, quality, weights, 50)
        np.asarray(rows)
        del plan

    q_dev = jnp.asarray(queries_f32)
    one_query(q_dev[0], int(rng.integers(0, graph.n_nodes())))  # warm
    times = []
    for i in range(12):
        sid = int(rng.integers(0, graph.n_nodes()))
        t0 = time.perf_counter()
        one_query(q_dev[i % q_dev.shape[0]], sid)
        times.append((time.perf_counter() - t0) * 1000.0)
    alt["hybrid_query_ms"] = round(_p50(times), 2)

    # the relay's synchronous floor: ONE trivial execution + scalar
    # readback. Measured 33.8 ms p50 on the axon tunnel
    # (R4_TPU_RESULTS5: sum of 8 floats; upload cycles 16KB->35 ms,
    # 512KB->45 ms — cycle-bound, not byte-bound). Every single-query
    # latency key above sits on this floor; the amortized keys are the
    # device's actual service time.
    import jax
    tiny = jax.jit(lambda v: jnp.sum(v))
    x_tiny = jnp.zeros((8,), jnp.float32)
    float(tiny(x_tiny))
    times = []
    for _ in range(8):
        t0 = time.perf_counter()
        float(tiny(x_tiny))
        times.append((time.perf_counter() - t0) * 1000.0)
    alt["relay_sync_floor_ms"] = round(_p50(times), 2)

    # batched hybrid: Q queries' evidence in ONE upload + ONE execution.
    # The single-query number above is relay-cycle-bound: a trivial
    # exec+readback costs 33.8 ms p50 through the tunnel and the full
    # decomposition is e2e 43.4 = 2.8 host (plan+BFS+pack) + 2.7
    # evidence upload + 37.7 exec+readback (R4_TPU_RESULTS5) — ~7 ms of
    # actual work on a ~34 ms floor. Batching amortizes the cycle to
    # ~1/Q.
    from lattice_tpu.ops.ranking import hybrid_rank_device_packed_batch
    QB = 16
    seeds_b = [int(rng.integers(0, graph.n_nodes())) for _ in range(QB)]
    sets_f = graph.k_hop_batch([[s] for s in seeds_b], EdgeType.CALLS, 5,
                               limit=R_CAP // 2)
    sets_b = graph.k_hop_batch([[s] for s in seeds_b], EdgeType.CALLS, 5,
                               limit=R_CAP // 2, reverse=True)
    packed_b = np.stack([
        pack_reach(
            np.concatenate([[s], list(f), list(b)]),
            np.concatenate([[0], list(f.values()),
                            list(b.values())]).astype(np.int32),
            np.zeros(1 + len(f) + len(b), np.uint8), R_CAP)
        for s, f, b in zip(seeds_b, sets_f, sets_b)])
    match_b = np.full((QB, 64), -1, np.int32)

    def batch_query():
        _, rows = hybrid_rank_device_packed_batch(
            q_dev[:QB], emb, valid, jnp.asarray(packed_b), rel_table,
            jnp.asarray(match_b), degree, quality, weights, 50)
        np.asarray(rows)

    batch_query()
    best_hb = float("inf")
    for _ in range(2):  # best-of-2 windows (queue transients: this key
        # read 5.2-21.6 ms across identical-code runs)
        t0 = time.perf_counter()
        for _ in range(4):
            batch_query()
        best_hb = min(best_hb, time.perf_counter() - t0)
    alt["hybrid_batch16_amortized_ms"] = round(
        best_hb * 1000.0 / (4 * QB), 2)

    # the device fuse's own cost (graph evidence precomputed)
    f_ids, f_d = graph._host_bfs([7], EdgeType.CALLS, 5)
    ids = np.full(R_CAP, -1, np.int32)
    depths = np.zeros(R_CAP, np.int32)
    rel = np.zeros(R_CAP, np.float32)
    m = min(len(f_ids), R_CAP)
    ids[:m] = f_ids[:m]
    depths[:m] = f_d[:m]
    rel[:m] = 0.7
    ids_d, dep_d, rel_d = (jnp.asarray(ids), jnp.asarray(depths),
                           jnp.asarray(rel))
    vec = jnp.where(valid, topk_ops.batched_matmul_scores(
        q_dev[:1], emb)[0], -1e30)
    np.asarray(fused_rank_rows_sparse(ids_d, dep_d, rel_d, degree, vec,
                                      match, quality, weights, 50)[1])
    times = []
    for _ in range(12):
        t0 = time.perf_counter()
        _, rows = fused_rank_rows_sparse(ids_d, dep_d, rel_d, degree, vec,
                                         match, quality, weights, 50)
        np.asarray(rows)
        times.append((time.perf_counter() - t0) * 1000.0)
    alt["hybrid_fuse_ms"] = round(_p50(times), 2)
    # pipelined: the device's actual fuse service time (the sequential
    # number above is dominated by the relay round trip)
    best_hf = float("inf")
    for _ in range(2):  # best-of-2 windows (queue transients)
        t0 = time.perf_counter()
        for _ in range(12):
            _, rows = fused_rank_rows_sparse(ids_d, dep_d, rel_d, degree,
                                             vec, match, quality, weights,
                                             50)
        np.asarray(rows)
        best_hf = min(best_hf, time.perf_counter() - t0)
    alt["hybrid_fuse_amortized_ms"] = round(best_hf * 1000.0 / 12, 2)


def _host_ivf_estimate(host_corpus: np.ndarray, queries: np.ndarray,
                       n_total: int, k: int) -> float:
    """HNSW-class CPU comparison: NumPy IVF on the subsample, scaled by
    the IVF cost model to the full corpus (docstring at module top)."""
    sub, d = host_corpus.shape
    nlist_sub = max(int(np.sqrt(sub)), 16)
    nprobe = 8
    rng = np.random.default_rng(3)
    centroids = host_corpus[rng.choice(sub, nlist_sub, replace=False)]
    assign = np.argmax(host_corpus @ centroids.T, axis=1)
    order = np.argsort(assign, kind="stable")
    sorted_rows = host_corpus[order]
    bounds = np.searchsorted(assign[order], np.arange(nlist_sub + 1))
    t0 = time.perf_counter()
    for q in queries[:32]:
        cscores = centroids @ q
        probes = np.argpartition(-cscores, nprobe)[:nprobe]
        cand = np.concatenate([
            sorted_rows[bounds[p]:bounds[p + 1]] for p in probes])
        if len(cand):
            s = cand @ q
            np.argpartition(-s, min(k, len(s) - 1))
    qps_sub = 32 / (time.perf_counter() - t0)
    nlist_n = max(int(np.sqrt(n_total)), 16)
    cost_sub = nlist_sub + nprobe * sub / nlist_sub
    cost_n = nlist_n + nprobe * n_total / nlist_n
    return qps_sub * cost_sub / cost_n


def main() -> None:
    import contextlib
    import functools

    import jax

    RESULT["metric"] = f"serving_qps_{N_ROWS // 1000}k_{DIM}d"
    alt = RESULT["extra"]  # every section writes straight into the
    # emitted record, so a mid-run kill still reports what completed
    _install_guards()

    # BENCH_CPU=1: smoke-test the full bench flow on the host CPU (the
    # site hook pins JAX_PLATFORMS to the TPU plugin, so the env var
    # alone cannot) — used to validate bench changes without queueing a
    # relay grant behind real measurement runs.
    if os.environ.get("BENCH_CPU") == "1":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    # Optional xprof capture: BENCH_TRACE_DIR=/tmp/xprof python bench.py
    trace_dir = os.environ.get("BENCH_TRACE_DIR")
    trace_cm = (jax.profiler.trace(trace_dir) if trace_dir
                else contextlib.nullcontext())

    from lattice_tpu.index.chunk_store import ChunkStore
    from lattice_tpu.ops import topk as topk_ops

    # Guarded attach: a dead axon relay blocks jax.devices() FOREVER in
    # hrtimer_nanosleep (observed 6+ h on 2026-08-17) — a hung bench
    # leaves the driver with NO output at all. Attach in a daemon thread
    # under a timeout; on timeout print one honest JSON line pointing at
    # the last self-measured results (clearly labeled stale) and exit 2.
    attach_timeout = float(os.environ.get("BENCH_ATTACH_TIMEOUT_S",
                                          "1800"))
    import threading
    attached: list = []
    th = threading.Thread(target=lambda: attached.append(jax.devices()),
                          daemon=True)
    th.start()
    th.join(attach_timeout)
    if not attached:
        stale = {}
        try:
            with open(os.path.join(os.path.dirname(
                    os.path.abspath(__file__)),
                    "R5_SELF_BENCH.json")) as f:
                stale = json.load(f)
        except Exception:
            pass
        alt.update({
            "relay_outage": True,
            "attach_timeout_s": attach_timeout,
            "last_self_measured": stale,
            "source": ("R5_SELF_BENCH.json — the last self-measured "
                       "chip record; NOT fresh numbers"),
        })
        _emit()           # os._exit skips stdio flushing; _emit flushes
        os._exit(2)
    device = attached[0][0]
    alt["device"] = str(device)
    alt["batch"] = BATCH
    alt["k"] = K

    # ---- clustered corpus on device (code embeddings cluster; this is the
    # regime the IVF serving path is built for — BASELINE config 3)
    key = jax.random.PRNGKey(0)
    kc, ka, kn, kq, kd = jax.random.split(key, 5)

    @functools.partial(jax.jit, static_argnames=("n", "c"))
    def gen_centers(k, n, c):
        x = jax.random.normal(k, (c, DIM), dtype=jnp.float32)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    @functools.partial(jax.jit, static_argnames=("n", "spread"))
    def gen_block(centers, ka, kn, n, spread=0.35):
        assign = jax.random.randint(ka, (n,), 0, N_CLUSTERS)
        onehot = jax.nn.one_hot(assign, N_CLUSTERS, dtype=jnp.bfloat16)
        base = jax.lax.dot_general(
            onehot, centers.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = base + spread * jax.random.normal(kn, (n, DIM), dtype=jnp.float32)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    centers = gen_centers(kc, N_ROWS, N_CLUSTERS)
    block = min(N_ROWS, 131_072)
    parts = []
    for i in range(0, N_ROWS, block):
        ka_i, kn_i = jax.random.fold_in(ka, i), jax.random.fold_in(kn, i)
        parts.append(gen_block(centers, ka_i, kn_i, min(block, N_ROWS - i)))
    corpus_f32 = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    del parts
    emb_dev = corpus_f32.astype(jnp.bfloat16)
    valid_dev = jnp.ones((N_ROWS,), dtype=bool)
    q_f32 = gen_block(centers, jax.random.fold_in(kq, 1),
                      jax.random.fold_in(kq, 2), BATCH)
    queries = np.asarray(q_f32)  # forces attach + materialization
    # restart the budget clocks now that the device actually answered:
    # the relay queues up to ~8 min of the PREVIOUS process's grant
    # drain ahead of the first round-trip, and that wait must not eat
    # the soft/hard measurement budgets (the watchdog loop re-reads
    # _elapsed, so the reset takes effect there too)
    global _BENCH_T0
    _BENCH_T0 = time.monotonic()

    # exact-recall oracle + host-baseline subsample FIRST, then free the
    # f32 corpus: keeping 4 GB of f32 alive through the quantized views +
    # clustered section OOMed a 16 GB chip (bench_r2c)
    _, exact_i = topk_ops.flat_topk_blocked(q_f32, corpus_f32, valid_dev, K)
    exact_i = np.asarray(exact_i)
    sub = min(HOST_SUBSAMPLE, N_ROWS)
    host_corpus = np.asarray(corpus_f32[:sub])
    del corpus_f32

    _mark("headline")
    store = ChunkStore.from_device_arrays(emb_dev, valid_dev)

    # ---- dispatcher plan (on TPU at this scale: builds + self-measures IVF)
    t0 = time.perf_counter()
    plan = store._plan_search(BATCH, K, None, "auto")
    plan_ms = (time.perf_counter() - t0) * 1000.0  # ~= IVF build when taken
    ivf_recall = (store._ivf.measured_recall
                  if store._ivf is not None else None)
    alt["dispatcher_plan"] = plan
    alt["plan_ms_incl_ivf_build"] = round(plan_ms, 1)
    alt["ivf_self_recall"] = (round(ivf_recall, 4)
                              if ivf_recall is not None else None)

    def timed(fn):
        # best of two windows: relay queue transients depress a single
        # window well below the kernel's rate (FINAL6 headline read 56.9k
        # while the same plan's dedicated loop read 81.4k seconds later);
        # the faster window is the one that didn't absorb a transient.
        out = fn()
        np.asarray(out[1])  # warm-up/compile through readback
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(DEVICE_ITERS):
                out = fn()
            # drain: only a readback proves execution
            idx = np.asarray(out[1])
            best = min(best, time.perf_counter() - t0)
        return BATCH * DEVICE_ITERS / best, idx

    with trace_cm:
        headline_qps, idx_np = timed(
            lambda: store.search_device(q_f32, K))
    RESULT["value"] = round(headline_qps, 1)

    # ---- complete the CORE record immediately (headline + recall +
    # vs-host baselines): everything after this point is extras, so a
    # mid-run kill still leaves a meaningful contract line
    recall = np.mean([
        len(set(idx_np[i].tolist()) & set(exact_i[i].tolist())) / K
        for i in range(BATCH)
    ])
    alt["recall_at_10_vs_exact"] = round(float(recall), 4)
    # host baselines on a subsample (exact scan + IVF estimate).
    # best-of-3: a single rep on this 1-core box swings ~7x under
    # contention (host_exact_qps_scaled 2.03 vs 15.15, FINAL3 vs FINAL4)
    # and vs_baseline swings with it; min-time biases the baseline FAST,
    # the conservative direction for the reported ratio.
    host_sub_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        host_scores = queries @ host_corpus.T
        np.argpartition(-host_scores, min(K, sub - 1), axis=1)
        host_sub_s = min(host_sub_s, time.perf_counter() - t0)
    del host_scores
    host_qps = BATCH / (host_sub_s * (N_ROWS / sub))
    try:
        host_ivf_qps = _host_ivf_estimate(host_corpus, queries, N_ROWS, K)
    except Exception:
        host_ivf_qps = None
    RESULT["vs_baseline"] = round(headline_qps / host_qps, 2)
    # renamed from vs_baseline (VERDICT r2 #7): this is a scaled
    # single-core NumPy exact scan, not Qdrant
    alt["vs_host_exact_scan"] = round(headline_qps / host_qps, 2)
    alt["vs_host_ivf_est"] = (round(headline_qps / host_ivf_qps, 1)
                              if host_ivf_qps else None)
    alt["host_ivf_qps_est"] = (round(host_ivf_qps, 1)
                               if host_ivf_qps else None)
    alt["host_exact_qps_scaled"] = round(host_qps, 2)
    _mark(f"core record complete at {_elapsed():.0f}s")

    # ---- retrieval QUALITY under the contract (VERDICT r4 #2): the
    # labeled golden-corpus eval (87 NL queries -> expected qualified
    # names; hit@5/10 + MRR@10 through the real engine paths). Quality
    # is platform-independent, so it runs as a CPU subprocess — it must
    # not queue behind (or contend with) the relay sections. Runs
    # SEQUENTIALLY (1-core box: concurrent host work corrupts every
    # host-dispatch-bound key, r4 lesson).
    if not _skip_if_late("golden_eval"):
        try:
            import subprocess
            env = dict(os.environ)
            env.update({"LATTICE_PLATFORM": "cpu", "JAX_PLATFORMS": "cpu"})
            proc = subprocess.run(
                [sys.executable, "-m", "lattice_tpu.query.golden_eval"],
                capture_output=True, text=True, timeout=600, env=env,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            ev = json.loads(proc.stdout.strip().splitlines()[-1])
            alt["golden_eval_mrr"] = ev["mrr"]
            alt["golden_eval_hit_at_5"] = ev["hit_at_5"]
            alt["golden_eval_hit_at_10"] = ev["hit_at_10"]
            alt["golden_eval_n"] = ev["n"]
            # deep-batch HTTP surface (host-path; chip number is
            # hybrid_batch16_amortized_ms)
            if "http_deep_batch_ms_per_q" in ev:
                alt["http_deep_batch_ms_per_q"] = \
                    ev["http_deep_batch_ms_per_q"]
        except Exception as exc:
            alt["golden_eval_error"] = repr(exc)[:160]
    _mark("golden-eval done")
    # small-batch serving latency, flat/isotropic regime (VERDICT r2 #5)
    try:
        alt.update(_bench_latency(store, q_f32, K))
    except Exception as exc:
        alt["latency_error"] = repr(exc)[:120]
    # pipelined bulk serving: one execution scans 8 chunks of 256 —
    # amortizes the fixed per-dispatch overhead (~1-3 ms on this relay)
    try:
        q_bulk = jnp.concatenate([q_f32] * 8)
        def run_pipe():
            return store.search_device_pipelined(q_bulk, K, chunk=BATCH)
        np.asarray(run_pipe()[1])
        best_p = float("inf")
        for _ in range(2):  # best-of-2 windows (queue transients)
            t0p = time.perf_counter()
            for _ in range(4):
                out = run_pipe()
            np.asarray(out[1])
            best_p = min(best_p, time.perf_counter() - t0p)
        alt["pipelined_qps"] = round(8 * BATCH * 4 / best_p, 1)
    except Exception as exc:
        alt["pipelined_error"] = repr(exc)[:120]
    # larger single-call batches amortize the corpus read (R3: B=512 @
    # tile 2048 = 58.6k, B=1024 @ tile 1024 = 71.2k — R3_TPU_RESULTS7/8).
    # 12 iterations so the single drain readback RTT amortizes below the
    # per-call noise floor (4 iters under-measured b512 by ~15% in r3).
    for mult in (2, 4):
        try:
            qb = jnp.concatenate([q_f32] * mult)
            np.asarray(store.search_device(qb, K)[1])
            best_b = float("inf")
            for _ in range(2):  # best-of-2 windows (queue transients)
                t0b = time.perf_counter()
                for _ in range(12):
                    out = store.search_device(qb, K)
                np.asarray(out[1])
                best_b = min(best_b, time.perf_counter() - t0b)
            alt[f"b{mult * BATCH}_qps"] = round(
                mult * BATCH * 12 / best_b, 1)
        except Exception as exc:
            alt[f"b{mult * BATCH}_error"] = repr(exc)[:120]
    # ---- concurrent serving through the micro-batching frontend:
    # 64 submitter futures coalesce into a handful of executions
    # (the reference dispatches every MCP/engine query alone; one TPU
    # execution at B=64-256 costs barely more than B=1, so a serving
    # process should coalesce whatever concurrency it has)
    try:
        from lattice_tpu.serving import BatchingFrontend
        with BatchingFrontend(store, max_batch=256, max_wait_ms=3.0) as fe:
            for _ in range(2):  # warm round compiles the pad bucket
                warm = [fe.submit(queries[i % BATCH], K) for i in range(64)]
                for f in warm:
                    f.result(timeout=300)
            best_f = float("inf")
            for _ in range(2):  # best-of-2 windows (queue transients)
                t0f = time.perf_counter()
                futs = [fe.submit(queries[i % BATCH], K) for i in range(64)]
                for f in futs:
                    f.result(timeout=300)
                best_f = min(best_f, time.perf_counter() - t0f)
        alt["frontend_concurrent64_ms_per_q"] = round(best_f / 64 * 1e3, 2)
        alt["frontend_mean_batch"] = round(fe.stats.mean_batch, 1)
        del fe  # close() dropped its store ref; drop the object too so
        # nothing pins the 1M store past this section's `del store`
    except Exception as exc:
        alt["frontend_error"] = repr(exc)[:120]

    for name in ("pallas", "refined", "quantized", "int4", "flat"):
        if name in ("pallas", "refined") and plan == "flat":
            continue  # no valid tile / not on TPU
        try:
            alt_qps, _ = timed(
                lambda: store.search_device(q_f32, K, method=name))
            alt[f"{name}_qps"] = round(alt_qps, 1)
        except Exception:
            pass

    # ---- bulk build-to-serve (BASELINE target 3, VERDICT r3 missing #3):
    # wall-clock from HOST rows to a dispatcher-served query at full
    # corpus size. Reference semantic: Qdrant bulk upsert + index-ready
    # (`embeddings/client.py:115-131`). Same capacity as the main store
    # so every kernel shape is already compiled — this times data
    # placement + view build, not XLA.
    try:
        import ml_dtypes
        reps = (N_ROWS + host_corpus.shape[0] - 1) // host_corpus.shape[0]
        host_rows = np.tile(
            host_corpus.astype(ml_dtypes.bfloat16), (reps, 1))[:N_ROWS]
        t0bb = time.perf_counter()
        dev_rows = jax.device_put(host_rows)
        dev_rows.block_until_ready()
        upload_s = time.perf_counter() - t0bb
        t0v = time.perf_counter()
        store_b = ChunkStore.from_device_arrays(
            dev_rows, jnp.ones((N_ROWS,), dtype=bool))
        store_b._plan_search(BATCH, K, None, "auto")
        np.asarray(store_b.search_device(q_f32, K)[1])  # served = ready
        views_s = time.perf_counter() - t0v
        bulk_s = upload_s + views_s
        alt["bulk_build_to_serve_s"] = round(bulk_s, 2)
        alt["bulk_build_gbps"] = round(host_rows.nbytes / bulk_s / 1e9, 3)
        # split: host->device placement (relay-tunnel-bound in THIS
        # environment, ~0.02 GB/s — R4_TPU_RESULTS1; PCIe-class on a
        # directly attached host) vs the framework's own views+plan cost
        alt["bulk_upload_s"] = round(upload_s, 2)
        alt["bulk_views_to_serve_s"] = round(views_s, 2)
        del store_b, dev_rows, host_rows
        # ChunkStore's compiled-closure caches form reference cycles:
        # `del` alone does NOT release the HBM buffers — the r4 bench
        # OOMed at a 1.5 MB allocation because two dead 1M stores were
        # still cycle-held. Collect after every big-corpus section.
        gc.collect()
    except Exception as exc:
        alt["bulk_build_error"] = repr(exc)[:120]
        # gc can't free live locals: drop whatever the failure left bound
        # or the dead 1M store pins HBM through every later section
        store_b = dev_rows = host_rows = None  # noqa: F841
        gc.collect()
    _mark("sharded")

    # ---- sharded serving tier at n_devices=1 (VERDICT r3 #4): the
    # multi-chip int4 fp-rescore index through its device-resident entry
    # on a 1-device mesh — the per-chip number that multiplies when real
    # chips show up. r4 took this from 2,780 to ~50k qps (persistent
    # kernel-layout columns + no per-call query upload, R4_TPU_RESULTS5/7);
    # carrying it here keeps the fix under the bench contract.
    try:
        if _skip_if_late("sharded"):
            raise _SectionSkipped
        from lattice_tpu.parallel.sharded_index import ShardedQuantizedIndex
        rng_sh = np.random.default_rng(42)
        host_sh = rng_sh.standard_normal((N_ROWS, DIM), dtype=np.float32)
        host_sh /= np.linalg.norm(host_sh, axis=1, keepdims=True)
        sq = ShardedQuantizedIndex(host_sh, np.ones(N_ROWS, bool), bits=4,
                                   keep_full_precision=True)
        del host_sh
        gc.collect()
        np.asarray(sq.search_device(q_f32, K)[1])  # compile+warm+drain
        dt_sh = float("inf")
        for _ in range(2):  # best-of-2 windows (queue transients)
            t0sh = time.perf_counter()
            for _ in range(DEVICE_ITERS):
                out_sh = sq.search_device(q_f32, K)
            i_sh = np.asarray(out_sh[1])
            dt_sh = min(dt_sh, time.perf_counter() - t0sh)
        alt["sharded_int4_fp_qps"] = round(BATCH * DEVICE_ITERS / dt_sh, 1)
        # recall vs the exact oracle over the index's own resident bf16
        # rows (blocked: no [B, N] slab)
        _, i_or = topk_ops.flat_topk_blocked(
            q_f32, sq.full_precision, sq.valid, K)
        i_or = np.asarray(i_or)
        alt["sharded_int4_fp_recall"] = round(float(np.mean([
            len(set(i_sh[i].tolist()) & set(i_or[i].tolist())) / K
            for i in range(BATCH)])), 4)
        del sq
        gc.collect()
    except _SectionSkipped:
        pass
    except Exception as exc:
        alt["sharded_error"] = repr(exc)[:120]
        sq = host_sh = out_sh = i_sh = i_or = None  # noqa: F841
        gc.collect()
    _mark("delta-upsert")

    def _bench_clustered():
        # ---- clustered regime (the IVF tier's home turf): a second
        # corpus with real cluster structure, served through the same
        # dispatcher. Runs LAST (after the headline store is freed):
        # the fresh-delta add's capacity-growth transient on top of two
        # live 1M stores caused the r4 OOM cascade — and the FIRST
        # RESOURCE_EXHAUSTED poisons every later allocation in this
        # process (the fresh-process probe refilled 14 GiB, so the
        # chip itself was never held — R4_BENCH_FINAL/2).
        parts_c = []
        for i in range(0, N_ROWS, block):
            parts_c.append(gen_block(
                centers, jax.random.fold_in(ka, 9_000_000 + i),
                jax.random.fold_in(kn, 9_000_000 + i),
                min(block, N_ROWS - i), spread=0.06).astype(jnp.bfloat16))
        emb_c = jnp.concatenate(parts_c) if len(parts_c) > 1 else parts_c[0]
        del parts_c
        qc = gen_block(centers, jax.random.fold_in(kq, 11),
                       jax.random.fold_in(kq, 12), BATCH, spread=0.06)
        store_c = ChunkStore.from_device_arrays(emb_c, valid_dev)
        plan_c = store_c._plan_search(BATCH, K, None, "auto")
        qps_c, idx_c = timed(lambda: store_c.search_device(qc, K))
        # small-batch regime: the IVF tier's home turf (per the measured
        # crossover the dispatcher only probes when batches are small or
        # the corpus outgrows the flat scan)
        try:
            plan_s = store_c._plan_search(16, K, None, "auto")
            q16 = qc[:16]
            def t16():
                out = store_c.search_device(q16, K)
                np.asarray(out[1])
                t0s = time.perf_counter()
                for _ in range(DEVICE_ITERS):
                    out = store_c.search_device(q16, K)
                np.asarray(out[1])
                return 16 * DEVICE_ITERS / (time.perf_counter() - t0s)
            alt["clustered_smallbatch_plan"] = plan_s
            alt["clustered_smallbatch_qps"] = round(t16(), 1)
            if store_c._ivf is not None:
                alt["clustered_ivf_build_s"] = round(
                    getattr(store_c._ivf, "build_seconds", 0.0), 1)
        except Exception as exc:
            alt["clustered_smallbatch_error"] = repr(exc)[:120]
        # blocked oracle: casting the whole bf16 corpus to f32 (3 GB) +
        # the [B, N] slab (1 GB) is where the r4 OOM cascade began
        _, exact_c = topk_ops.flat_topk_blocked(qc, emb_c, valid_dev, K)
        exact_c = np.asarray(exact_c)
        recall_c = np.mean([
            len(set(idx_c[i].tolist()) & set(exact_c[i].tolist())) / K
            for i in range(BATCH)])
        alt["clustered_plan"] = plan_c
        alt["clustered_qps"] = round(qps_c, 1)
        alt["clustered_recall"] = round(float(recall_c), 4)
        alt["clustered_ivf_self_recall"] = (
            round(store_c._ivf.measured_recall, 4)
            if store_c._ivf is not None else None)
        # small-batch latency in the clustered regime
        try:
            for kk, vv in _bench_latency(store_c, qc, K).items():
                alt[f"clustered_{kk}"] = vv
        except Exception as exc:
            alt["clustered_latency_error"] = repr(exc)[:120]
        # BASELINE config 5's freshness story IN THE REGIME WHERE IVF
        # SERVES (VERDICT r2 weak #4): delta-upsert rows into the live
        # clustered store, assert the IVF view stays fresh (O(delta)
        # insert, no rebuild) and a query finds a fresh row at small
        # batch (where the dispatcher probes IVF)
        try:
            fresh = np.asarray(gen_block(
                centers, jax.random.fold_in(kd, 77),
                jax.random.fold_in(kd, 78), 32, spread=0.06))
            rows_f = store_c.add(fresh, [{"file_path": "fresh.py"}] * 32)
            alt["clustered_ivf_fresh_after_delta"] = (
                not store_c._ivf_dirty if store_c._ivf is not None
                else None)
            _, found = store_c.search_device(jnp.asarray(fresh[:8]), K)
            found = np.asarray(found)
            hits = sum(1 for i in range(8) if rows_f[i] in found[i])
            alt["clustered_delta_self_hits"] = f"{hits}/8"
        except Exception as exc:
            alt["clustered_fresh_error"] = repr(exc)[:120]
        del emb_c, store_c

    # ---- config 5: incremental delta upsert into the live store.
    # The first add pays the scatter-kernel compiles + any capacity
    # growth; the timed region amortizes DELTA_REPS adds behind ONE
    # readback — a single add-with-readback can never beat the ~24-34 ms
    # relay sync floor (R4_TPU_RESULTS5), which is tunnel, not work
    # (batch1's 10.0 ms figure was the opposite artifact: no readback
    # at all, so it timed only the async enqueue).
    try:
        DELTA_REPS = 4
        delta_dev = gen_block(
            centers, jax.random.fold_in(kd, 1), jax.random.fold_in(kd, 2),
            (2 + 2 * DELTA_REPS) * DELTA_ROWS)
        delta = np.asarray(delta_dev[:(1 + DELTA_REPS) * DELTA_ROWS])
        rows = store.add(delta[:DELTA_ROWS],
                         [{"file_path": "warm.py"}] * DELTA_ROWS)
        np.asarray(store._emb[rows[0]])
        best_d = float("inf")
        for _ in range(2):  # best-of-2 windows: the host loop is ~100%
            # relay upload, and a slow tunnel phase doubled it (99.3 vs
            # 34.8 ms across runs at identical code, FINAL7 vs FINAL6)
            t0 = time.perf_counter()
            for r in range(1, 1 + DELTA_REPS):
                rows = store.add(
                    delta[r * DELTA_ROWS:(r + 1) * DELTA_ROWS],
                    [{"file_path": "delta.py"}] * DELTA_ROWS)
            np.asarray(store._emb[rows[0]])  # readback proves execution
            best_d = min(best_d, time.perf_counter() - t0)
        alt["delta_upsert_ms_256rows"] = round(
            best_d * 1000.0 / DELTA_REPS, 1)
        # device-resident variant: rows arrive as a device array (the
        # real ingestion path — encode_device output feeds add directly).
        # The host loop above is ~100% relay upload by arithmetic:
        # 256×768×4 B = 786 KB/add at the measured ~0.017 GB/s ≈ 44 ms,
        # vs 46.2 measured (R4_BENCH_FINAL4). This loop times the actual
        # scatter + view-update work. It needs its OWN warmup add: the
        # device branch normalizes through different jit keys than the
        # host branch, and one in-loop compile read 388.6 ms/add in
        # FINAL6 (~1.5 s / 4 reps; the CPU smoke's 60-vs-11 matched).
        r0 = 1 + DELTA_REPS
        rows = store.add(delta_dev[r0 * DELTA_ROWS:(r0 + 1) * DELTA_ROWS],
                         [{"file_path": "warm_dev.py"}] * DELTA_ROWS)
        np.asarray(store._emb[rows[0]])
        t0 = time.perf_counter()
        for r in range(r0 + 1, r0 + 1 + DELTA_REPS):
            rows = store.add(delta_dev[r * DELTA_ROWS:(r + 1) * DELTA_ROWS],
                             [{"file_path": "delta.py"}] * DELTA_ROWS)
        np.asarray(store._emb[rows[0]])
        alt["delta_upsert_device_ms_256rows"] = round(
            (time.perf_counter() - t0) * 1000.0 / DELTA_REPS, 1)
        del delta_dev
        alt["ivf_fresh_after_delta"] = (
            not store._ivf_dirty if store._ivf else None)
    except Exception as exc:
        alt["delta_error"] = repr(exc)[:120]
    _mark("capacity-4m")

    # ---- capacity tier IN the contract (VERDICT r4 #3): 4M rows served
    # from a packed-int4 view whose resident bytes (~1.6 GB: 4M x 384 B
    # packed + scales) match the 1M-bf16 budget (1M x 768 x 2 B = 1.6 GB)
    # — the "4x corpus per chip at equal HBM" claim, measured at B=1024
    # (R3_TPU_RESULTS9: 19.0k qps there via scratch scripts; this puts it
    # under BENCH_r*.json). The bf16 rows are NEVER resident: blocks are
    # generated, oracle-scored, quantized, and freed; only packed int4
    # survives. Client-live bytes ride along as the budget proof
    # (device memory_stats() is empty through the relay).
    try:
        if _skip_if_late("capacity_4m"):
            raise _SectionSkipped
        from lattice_tpu.ops.quant import Int4View
        from lattice_tpu.ops.quant import quantize_rows_int4_device
        N4 = int(os.environ.get("BENCH_CAPACITY_ROWS", 1 << 22))
        BQ = 1024  # the measured-best single-call batch for int4 at 4M
        kc4, ka4, kn4, kq4 = jax.random.split(jax.random.PRNGKey(7), 4)
        centers4 = gen_centers(kc4, N4, N_CLUSTERS)
        q4 = gen_block(centers4, jax.random.fold_in(kq4, 1),
                       jax.random.fold_in(kq4, 2), BQ)
        # oracle on the fly: per-block exact top-K for the first 256
        # queries, merged at the end (no 6 GB bf16 corpus, no [B, N] slab)
        q_or = q4[:BATCH]
        blk4 = 1 << 17
        packed_parts, scale_parts = [], []
        or_vals, or_idx = [], []

        @jax.jit
        def _block_topk(q, block):
            s = jax.lax.dot_general(
                q.astype(jnp.bfloat16), block,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jax.lax.top_k(s, K)

        for i in range(0, N4, blk4):
            blk = gen_block(centers4, jax.random.fold_in(ka4, i),
                            jax.random.fold_in(kn4, i),
                            min(blk4, N4 - i)).astype(jnp.bfloat16)
            v, s = _block_topk(q_or, blk)
            or_vals.append(np.asarray(v))
            or_idx.append(np.asarray(s) + i)
            pv, ps = quantize_rows_int4_device(blk.astype(jnp.float32))
            packed_parts.append(pv)
            scale_parts.append(ps)
            del blk
        view4 = Int4View.from_packed(jnp.concatenate(packed_parts),
                                     jnp.concatenate(scale_parts))
        valid4 = jnp.ones((N4,), dtype=bool)
        del packed_parts, scale_parts
        gc.collect()
        # merge the per-block oracles on host: global exact top-K
        av = np.concatenate(or_vals, axis=1)
        ai = np.concatenate(or_idx, axis=1)
        sel = np.argsort(-av, axis=1)[:, :K]
        oracle4 = np.take_along_axis(ai, sel, axis=1)
        live = sum(getattr(a, "nbytes", 0) or 0 for a in jax.live_arrays())
        alt["capacity_4m_live_mb"] = round(live / 1e6)
        # capacity-tier recall on THIS corpus is INFORMATION-BOUND, not
        # selection-bound (measured r5 on chip): the first stage reads
        # 0.7199 at 4M/B=1024, the widened dequantized rescore 0.7207
        # (a tie), and an exact f32 scan over the fully dequantized int4
        # matrix — the information ceiling — reads 0.7668 on a 128k
        # block (/tmp/r5_ceiling.py). Top-10 near-ties at 4096 rows per
        # center are finer than the int4 step. The tier's serving story:
        # near-1.0 candidate COVERAGE at 4x capacity; the int4+bf16
        # speed config (sharded_int4_fp keys) carries 0.999 recall.
        np.asarray(view4.search_device(q4, valid4, K)[1])  # compile+warm
        best4 = float("inf")
        for _ in range(2):  # best-of-2 windows (queue transients)
            t04 = time.perf_counter()
            for _ in range(8):
                out4 = view4.search_device(q4, valid4, K)
            i4 = np.asarray(out4[1])
            best4 = min(best4, time.perf_counter() - t04)
        alt["capacity_4m_qps"] = round(BQ * 8 / best4, 1)
        alt["capacity_4m_recall"] = round(float(np.mean([
            len(set(i4[i].tolist()) & set(oracle4[i].tolist())) / K
            for i in range(BATCH)])), 4)
        i4r = np.asarray(view4.search_device(q4, valid4, K,
                                             dequant_rescore=True)[1])
        alt["capacity_4m_recall_rescored"] = round(float(np.mean([
            len(set(i4r[i].tolist()) & set(oracle4[i].tolist())) / K
            for i in range(BATCH)])), 4)
        alt["capacity_4m_rows"] = N4
        del view4, valid4, q4, centers4
        gc.collect()
    except _SectionSkipped:
        pass
    except Exception as exc:
        alt["capacity_4m_error"] = repr(exc)[:160]
        view4 = q4 = centers4 = packed_parts = scale_parts = None  # noqa: F841
        gc.collect()
    _mark("graph+hybrid")

    # ---- BASELINE config 4 + hybrid query path (VERDICT r2 #1/#3)
    if os.environ.get("BENCH_GRAPH", "1") == "1" \
            and not _skip_if_late("graph+hybrid"):
        try:
            bench_graph = _bench_graph(alt)
            _bench_hybrid(alt, bench_graph, store, np.asarray(queries))
            del bench_graph
            gc.collect()
        except Exception as exc:
            alt["graph_error"] = repr(exc)[:200]
            gc.collect()
    _mark("encoder")

    # ---- config 2: encoder throughput at the real model config
    # (free the serving corpus + its quantized views first: ~7 GB of HBM
    # pressure measurably throttled the encoder — 380 vs 611 chunks/s in
    # bench_r3a vs the standalone measurement). valid_dev (1 MB) stays:
    # the clustered section reuses it.
    del store, emb_dev
    gc.collect()
    _mark("encoder-post-gc")
    h, ff, nl, length = 768, 3072, 12, ENCODE_LEN
    flops_tok = 2 * nl * (4 * h * h + 2 * h * ff) + 2 * nl * 2 * length * h
    on_tpu = device.platform.lower() in ("tpu", "axon")
    try:
        if _skip_if_late("encoder"):
            raise _SectionSkipped
        from lattice_tpu.models.unixcoder import (UniXcoderConfig,
                                                  UniXcoderModel)
        enc_model = UniXcoderModel(UniXcoderConfig())
        # the serving configuration (provider defaults on TPU): bf16
        # matrix params + paired attention (auto on TPU) + pinned
        # layouts — 771 vs 565 chunks/s ladder in R4_TPU_RESULTS1
        enc_model.enable_bf16_inference()
        enc_model.pin_serving_layouts(ENCODE_BATCH, ENCODE_LEN)
        ids = np.ones((ENCODE_BATCH, ENCODE_LEN), dtype=np.int32)
        mask = np.ones_like(ids)
        # compile + drain the relay queue before timing (a warmup with
        # no readback leaves the grant drain on the first timed iter)
        np.asarray(enc_model.encode_device(ids, mask))
        # headline = the ingestion path: device-resident outputs, ONE
        # readback at the end (the provider hands pooled blocks straight
        # to ChunkStore.add — per-call readbacks cost ~30%, R4 RESULTS2)
        t0 = time.perf_counter()
        # 12 iters: at 4, the one end-of-loop sync floor (~24-34 ms) was
        # ~5% of the window and under-read throughput (661 vs 771 cps in
        # R4_BENCH_FINAL3 vs R4_TPU_RESULTS5's drained 12-iter loops)
        enc_iters = 12
        for _ in range(enc_iters):
            out_dev = enc_model.encode_device(ids, mask)
        float(out_dev[0, 0])
        alt["encode_chunks_per_s"] = round(
            ENCODE_BATCH * enc_iters / (time.perf_counter() - t0), 1)
        # host loop (per-call readback) kept as a secondary number
        t0 = time.perf_counter()
        for _ in range(enc_iters):
            enc_model.encode(ids, mask)
        alt["encode_host_loop_cps"] = round(
            ENCODE_BATCH * enc_iters / (time.perf_counter() - t0), 1)
        # device-resident loop: inputs uploaded ONCE. encode_device(np)
        # re-uploads 512 KB of ids+mask per call, ~25 ms through the
        # ~20 MB/s relay — a tunnel artifact, not chip time (real hosts
        # feed over PCIe at GB/s). MFU is a chip-efficiency claim, so it
        # is computed from this loop (1130 cps / 0.554 in
        # R4_TPU_RESULTS2; encode_chunks_per_s keeps the e2e number).
        # Own try: a late failure here (e.g. a poisoned allocation after
        # an earlier OOM) must not clobber the two loops already timed.
        try:
            ids_d, mask_d = jnp.asarray(ids), jnp.asarray(mask)
            out_dev = enc_model.encode_device(ids_d, mask_d)
            np.asarray(out_dev)
            t0 = time.perf_counter()
            for _ in range(enc_iters):
                out_dev = enc_model.encode_device(ids_d, mask_d)
            float(out_dev[0, 0])
            encode_dev_cps = (ENCODE_BATCH * enc_iters
                              / (time.perf_counter() - t0))
            alt["encode_device_resident_cps"] = round(encode_dev_cps, 1)
            # model FLOPs/token: QKVO + FFN matmuls + two [L,L] attention
            # matmuls; v5e bf16 peak ~197 TF/s (VERDICT r2 #4: report MFU)
            if on_tpu:
                alt["encode_mfu"] = round(
                    encode_dev_cps * length * flops_tok / 197e12, 3)
        except Exception as exc:
            alt["encode_resident_error"] = repr(exc)[:160]
    except _SectionSkipped:
        pass
    except Exception as exc:
        alt["encode_error"] = repr(exc)[:160]
    try:
        del enc_model, out_dev
    except NameError:
        pass
    gc.collect()
    _mark("clustered")

    # clustered runs LAST among device sections: its fresh-delta growth
    # transient is the one allocation that has ever OOMed this bench, and
    # a first OOM poisons every later allocation in the process
    try:
        if _skip_if_late("clustered"):
            raise _SectionSkipped
        _bench_clustered()
    except _SectionSkipped:
        pass
    except Exception as exc:
        alt["clustered_error"] = repr(exc)[:120]
    gc.collect()

    alt["total_bench_s"] = round(_elapsed(), 1)
    _emit()


if __name__ == "__main__":
    main()
