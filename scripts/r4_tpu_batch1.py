"""Round-4 TPU batch #1: every VERDICT-r3 directive that needs the chip.

Phases (each independent, partial results saved after every phase):
  E  encoder ladder — base / bf16 params / +pinned layouts / +paired
     attention / all three, plus a categorized xplane trace of base vs
     best and a pure-matmul roofline at the encoder's own shapes
     (directive #1, the round's headline).
  Q  int4 selection A/B: mul vs fma chain at 1M/B=256 (+ winner
     agreement), then the 4M capacity tier on the fma chain
     (directive #6).
  B  large-batch serving: B=512 / B=1024 through the dispatcher with
     the bench's 12-iteration loop, bulk build-to-serve at 1M, and the
     fused delta upsert (directives #2 and #8-r3).
  H  hybrid single-query latency through the packed-reach path at
     1M rows / 10M edges (directive #3) + native-BFS graph serving
     keys (directive #5).
  S  sharded n=1 overhead: ShardedQuantizedIndex(bits=4, fp-rescore)
     B=256 qps + categorized trace + rescore/stage variants
     (directive #4).

Progress -> /tmp/r4_progress1.log, results -> /root/repo/R4_TPU_RESULTS1.json.
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r4_progress1.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/root/repo/R4_TPU_RESULTS1.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def p50(xs):
    return float(np.percentile(np.asarray(xs), 50))


B_ENC, L_ENC = 128, 512
N1M = 1 << 20
DIM = 768
K = 10


def phase_e():
    import dataclasses

    import jax
    import jax.numpy as jnp
    from lattice_tpu.models.unixcoder import (UniXcoderConfig,
                                              UniXcoderModel)
    from lattice_tpu.utils.tracing import categorize_device_trace

    rng = np.random.default_rng(0)
    ids = rng.integers(10, 50000, size=(B_ENC, L_ENC)).astype(np.int32)
    mask = np.ones((B_ENC, L_ENC), dtype=np.int32)
    mask[:, 480:] = 0

    h, ff, nl = 768, 3072, 12
    flops_tok = 2 * nl * (4 * h * h + 2 * h * ff) + 2 * nl * 2 * L_ENC * h

    def bench_model(model, iters=6):
        model.encode(ids, mask)  # compile + warm
        model.encode(ids, mask)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = model.encode(ids, mask)
        cps = B_ENC * iters / (time.perf_counter() - t0)
        return cps, out

    def mfu(cps):
        return round(cps * L_ENC * flops_tok / 197e12, 4)

    variants = {}
    log("E: base (f32 params, vanilla einsum) — first touch, grant wait")
    m = UniXcoderModel(UniXcoderConfig(), seed=0)
    cps, out_base = bench_model(m)
    variants["base"] = cps
    log(f"E base: {cps:.1f} cps mfu {mfu(cps)}")

    m.enable_bf16_inference()
    cps, _ = bench_model(m)
    variants["bf16"] = cps
    log(f"E bf16: {cps:.1f} cps")

    ok = m.pin_serving_layouts(B_ENC, L_ENC)
    cps, _ = bench_model(m)
    variants["bf16_pinned"] = cps
    log(f"E bf16+pinned(ok={ok}): {cps:.1f} cps")
    del m
    gc.collect()

    mp = UniXcoderModel(UniXcoderConfig(paired_attention=True), seed=0)
    mp.enable_bf16_inference()
    cps, out_paired = bench_model(mp)
    variants["bf16_paired"] = cps
    a = out_base / np.linalg.norm(out_base, axis=1, keepdims=True)
    b = out_paired / np.linalg.norm(out_paired, axis=1, keepdims=True)
    RESULTS["paired_cosine_vs_base"] = round(
        float(np.mean(np.sum(a * b, axis=1))), 6)
    log(f"E bf16+paired: {cps:.1f} cps cosine "
        f"{RESULTS['paired_cosine_vs_base']}")

    ok = mp.pin_serving_layouts(B_ENC, L_ENC)
    cps, _ = bench_model(mp)
    variants["bf16_paired_pinned"] = cps
    log(f"E all (pinned ok={ok}): {cps:.1f} cps")

    RESULTS["enc_variants_cps"] = {k: round(v, 1)
                                   for k, v in variants.items()}
    RESULTS["enc_variants_mfu"] = {k: mfu(v) for k, v in variants.items()}
    save()

    # categorized traces: base vs best
    best_name = max(variants, key=variants.get)
    log(f"E best = {best_name}; tracing base + best")
    m0 = UniXcoderModel(UniXcoderConfig(), seed=0)
    m0.enable_bf16_inference()
    m0.encode(ids, mask)
    with jax.profiler.trace("/tmp/r4_trace_base"):
        for _ in range(3):
            m0.encode(ids, mask)
    RESULTS["trace_base"] = categorize_device_trace("/tmp/r4_trace_base")
    del m0
    gc.collect()
    mp.encode(ids, mask)
    with jax.profiler.trace("/tmp/r4_trace_best"):
        for _ in range(3):
            mp.encode(ids, mask)
    RESULTS["trace_paired"] = categorize_device_trace("/tmp/r4_trace_best")
    save()
    del mp
    gc.collect()

    # pure-matmul roofline at the encoder's own shapes
    x = jnp.asarray(rng.normal(size=(B_ENC * L_ENC, h)), jnp.bfloat16)
    w1 = jnp.asarray(rng.normal(size=(h, h)), jnp.bfloat16)
    w2 = jnp.asarray(rng.normal(size=(h, ff)), jnp.bfloat16)
    w3 = jnp.asarray(rng.normal(size=(ff, h)), jnp.bfloat16)

    @jax.jit
    def proj_chain(x, w1, w2, w3):
        def body(c, _):
            y = c @ w1
            z = (y @ w2) @ w3
            return z.astype(jnp.bfloat16), ()
        out, _ = jax.lax.scan(body, x, None, length=nl)
        return jnp.sum(out.astype(jnp.float32))

    float(proj_chain(x, w1, w2, w3))
    t0 = time.perf_counter()
    for _ in range(4):
        s = proj_chain(x, w1, w2, w3)
    float(s)
    dt = (time.perf_counter() - t0) / 4
    fl = nl * 2 * B_ENC * L_ENC * (h * h + 2 * h * ff)
    RESULTS["roofline_proj_tflops"] = round(fl / dt / 1e12, 1)
    RESULTS["roofline_proj_mxu_frac"] = round(fl / dt / 197e12, 4)
    log(f"E roofline proj: {RESULTS['roofline_proj_tflops']} TF/s "
        f"({RESULTS['roofline_proj_mxu_frac']} of peak)")

    # batched attention einsum shapes (the 64-deep contraction)
    q = jnp.asarray(rng.normal(size=(B_ENC, 12, L_ENC, 64)), jnp.bfloat16)

    @jax.jit
    def attn_chain(q):
        def body(c, _):
            s = jnp.einsum("bhqd,bhkd->bhqk", c, c,
                           preferred_element_type=jnp.float32)
            o = jnp.einsum("bhqk,bhkd->bhqd", s.astype(jnp.bfloat16), c,
                           preferred_element_type=jnp.float32)
            return o.astype(jnp.bfloat16), ()
        out, _ = jax.lax.scan(body, q, None, length=nl)
        return jnp.sum(out.astype(jnp.float32))

    float(attn_chain(q))
    t0 = time.perf_counter()
    for _ in range(4):
        s = attn_chain(q)
    float(s)
    dt = (time.perf_counter() - t0) / 4
    fl = nl * 2 * 2 * B_ENC * 12 * L_ENC * L_ENC * 64
    RESULTS["roofline_attn_tflops"] = round(fl / dt / 1e12, 1)
    RESULTS["roofline_attn_mxu_frac"] = round(fl / dt / 197e12, 4)
    log(f"E roofline attn: {RESULTS['roofline_attn_tflops']} TF/s "
        f"({RESULTS['roofline_attn_mxu_frac']} of peak)")
    save()


def _gen_corpus(n, seed=0, clusters=1024, spread=0.06):
    """Clustered normalized corpus on device, built in blocks."""
    import functools

    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    kc, ka, kn = jax.random.split(key, 3)

    @jax.jit
    def gen_centers(k):
        x = jax.random.normal(k, (clusters, DIM), dtype=jnp.float32)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen_block(centers, ka, kn, n):
        assign = jax.random.randint(ka, (n,), 0, clusters)
        onehot = jax.nn.one_hot(assign, clusters, dtype=jnp.bfloat16)
        base = jax.lax.dot_general(
            onehot, centers.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = base + spread * jax.random.normal(kn, (n, DIM),
                                              dtype=jnp.float32)
        return (x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)
        ).astype(jnp.bfloat16)

    centers = gen_centers(kc)
    block = 1 << 17
    parts = []
    for i in range(0, n, block):
        parts.append(gen_block(centers, jax.random.fold_in(ka, i),
                               jax.random.fold_in(kn, i),
                               min(block, n - i)))
    out = jnp.concatenate(parts) if len(parts) > 1 else parts[0]
    q = gen_block(centers, jax.random.fold_in(ka, 999),
                  jax.random.fold_in(kn, 999), 256).astype(jnp.float32)
    return out, q


def phase_q():
    import jax
    import jax.numpy as jnp
    from lattice_tpu.ops.pallas_topk import (binned_topk_int4,
                                             pick_tile_packed, valid_col)
    from lattice_tpu.ops.quant import (Int4View, _l2n,
                                       quantize_rows_device)

    emb, q = _gen_corpus(N1M, seed=1)
    log("Q: quantizing 1M to int4")
    view = Int4View(emb.astype(jnp.float32))
    vcol = valid_col(jnp.ones((N1M,), bool))
    del emb
    gc.collect()
    qf = _l2n(q)
    qv, qs = quantize_rows_device(qf)
    qv, qs = jnp.asarray(qv), jnp.asarray(qs)
    tile = pick_tile_packed(N1M, 256, k=16)
    log(f"Q: tile {tile}")

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
        log(f"Q int4 {sel}: {dt*1e3:.2f} ms/call")
        save()
    agree = np.mean([len(set(outs['mul'][i]) & set(outs['fma'][i])) / 16
                     for i in range(256)])
    RESULTS["int4_sel_agreement"] = round(float(agree), 4)
    save()

    # the served first-stage configuration (fused normalize+quant+scan)
    s, i = view.search_device(q, vcol, K)
    t0 = time.perf_counter()
    for _ in range(8):
        out = view.search_device(q, vcol, K)
    np.asarray(out[1])
    RESULTS["int4_view_qps"] = round(256 * 8 / (time.perf_counter() - t0), 1)
    log(f"Q int4 view: {RESULTS['int4_view_qps']} qps")
    del view
    gc.collect()
    save()

    # 4M capacity tier on the fma chain (block-wise build)
    log("Q: building 4M int4")
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
    fn = lambda: binned_topk_int4(  # noqa: E731
        qv, qs, view4.values, view4._scales_col, vcol4, 16, tile=tile4,
        selection="fma")
    np.asarray(fn()[1])
    t0 = time.perf_counter()
    for _ in range(8):
        out = fn()
    np.asarray(out[1])
    dt = (time.perf_counter() - t0) / 8
    RESULTS["int4_4m_fma_ms"] = round(dt * 1e3, 2)
    RESULTS["int4_4m_fma_qps"] = round(256 / dt, 1)
    log(f"Q 4M fma: {dt*1e3:.2f} ms/call ({256/dt:.0f} qps)")
    del view4, vcol4
    gc.collect()
    save()


def phase_b():
    import jax
    import jax.numpy as jnp
    from lattice_tpu.index.chunk_store import ChunkStore

    emb, q = _gen_corpus(N1M, seed=2)
    store = ChunkStore.from_device_arrays(emb, jnp.ones((N1M,), bool))
    store._plan_search(256, K, None, "auto")
    q = jnp.asarray(q)

    for mult in (1, 2, 4):
        qb = jnp.concatenate([q] * mult) if mult > 1 else q
        np.asarray(store.search_device(qb, K)[1])
        t0 = time.perf_counter()
        for _ in range(12):
            out = store.search_device(qb, K)
        np.asarray(out[1])
        qps = mult * 256 * 12 / (time.perf_counter() - t0)
        RESULTS[f"b{mult*256}_qps"] = round(qps, 1)
        log(f"B b{mult*256}: {qps:.0f} qps")
    save()

    # fused delta upsert (commit 930a716, unmeasured on chip)
    rng = np.random.default_rng(3)
    newrows = rng.normal(size=(256, DIM)).astype(np.float32)
    newrows /= np.linalg.norm(newrows, axis=1, keepdims=True)
    payloads = [{"content": f"r{i}", "file_path": "f.py"}
                for i in range(256)]
    store.add(newrows[:8], payloads[:8])  # warm the delta path
    times = []
    for it in range(6):
        t0 = time.perf_counter()
        store.add(newrows, payloads)
        times.append((time.perf_counter() - t0) * 1e3)
    RESULTS["delta_upsert_ms_256rows"] = round(p50(times), 2)
    log(f"B delta upsert p50: {RESULTS['delta_upsert_ms_256rows']} ms")
    del store, emb
    gc.collect()
    save()

    # bulk build-to-serve at 1M (bench key validation)
    import ml_dtypes
    chunk = min(1 << 16, N1M)
    host_rows = np.asarray(
        rng.normal(size=(chunk, DIM))).astype(ml_dtypes.bfloat16)
    reps = (N1M + chunk - 1) // chunk
    host_rows = np.tile(host_rows, (reps, 1))[:N1M]
    t0 = time.perf_counter()
    dev_rows = jax.device_put(host_rows)
    store_b = ChunkStore.from_device_arrays(dev_rows,
                                            jnp.ones((N1M,), bool))
    store_b._plan_search(256, K, None, "auto")
    np.asarray(store_b.search_device(q, K)[1])
    bulk_s = time.perf_counter() - t0
    RESULTS["bulk_build_to_serve_s"] = round(bulk_s, 2)
    RESULTS["bulk_build_gbps"] = round(host_rows.nbytes / bulk_s / 1e9, 3)
    log(f"B bulk build: {bulk_s:.2f} s "
        f"({RESULTS['bulk_build_gbps']} GB/s)")
    del store_b, dev_rows, host_rows
    gc.collect()
    save()


def phase_h():
    import jax
    import jax.numpy as jnp
    from lattice_tpu.core.types import EdgeType, EntityType
    from lattice_tpu.index.chunk_store import ChunkStore
    from lattice_tpu.index.graph_store import GraphStore
    from lattice_tpu.ops.ranking import (FuseWeights, pack_reach,
                                         pack_weights,
                                         hybrid_rank_device_packed)
    from lattice_tpu.query.query_planner import QueryPlanner

    log("H: building 1M/10M graph")
    rng = np.random.default_rng(4)
    g = GraphStore()
    g.add_nodes_bulk([f"n{i}" for i in range(N1M)], EntityType.FUNCTION)
    g.add_edges_bulk(rng.integers(0, N1M, 10_000_000).astype(np.int32),
                     rng.integers(0, N1M, 10_000_000).astype(np.int32),
                     EdgeType.CALLS)
    g.finalize()

    # native BFS serving keys (directive #5)
    seeds = rng.integers(0, N1M, 256).tolist()
    g.k_hop([seeds[0]], EdgeType.CALLS, 3, limit=50)
    lat = []
    for s in seeds:
        t0 = time.perf_counter()
        g.k_hop([s], EdgeType.CALLS, 3, limit=50)
        lat.append((time.perf_counter() - t0) * 1e3)
    RESULTS["graph_khop_ms_p50"] = round(p50(lat), 4)
    RESULTS["graph_khop_qps_single"] = round(1000.0 / p50(lat), 1)
    t0 = time.perf_counter()
    g.k_hop_batch([[s] for s in seeds], EdgeType.CALLS, 3, limit=50)
    RESULTS["graph_khop_qps_batch256"] = round(
        256 / (time.perf_counter() - t0), 1)
    log(f"H khop: p50 {RESULTS['graph_khop_ms_p50']} ms, batch "
        f"{RESULTS['graph_khop_qps_batch256']} qps")
    save()

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
    R_CAP = 1 << 16

    def one_query(qvec, seed):
        planner.plan_heuristic(f"who calls f{seed}?")
        f_ids, f_d = g._host_bfs([seed], EdgeType.CALLS, 5)
        b_ids, b_d = g._host_bfs([seed], EdgeType.CALLS, 5, reverse=True)
        ids = np.concatenate([[seed], f_ids, b_ids])
        depths = np.concatenate([[0], f_d, b_d]).astype(np.int32)
        packed = pack_reach(ids, depths,
                            np.zeros(len(ids), np.uint8), R_CAP)
        _, rows = hybrid_rank_device_packed(
            qvec, emb_d, valid_d, jnp.asarray(packed), rel_table,
            no_match, degree, quality, weights, 50)
        np.asarray(rows)

    qd = jnp.asarray(q)
    one_query(qd[0], int(seeds[0]))
    times = []
    for i in range(16):
        t0 = time.perf_counter()
        one_query(qd[i], int(seeds[i]))
        times.append((time.perf_counter() - t0) * 1e3)
    RESULTS["hybrid_query_ms_packed"] = round(p50(times), 2)
    log(f"H hybrid packed p50: {RESULTS['hybrid_query_ms_packed']} ms "
        f"(all: {[round(t,1) for t in times]})")
    del store, emb, g
    gc.collect()
    save()


def phase_s():
    import jax
    import jax.numpy as jnp
    from lattice_tpu.parallel.sharded_index import ShardedQuantizedIndex
    from lattice_tpu.utils.tracing import categorize_device_trace

    emb, q = _gen_corpus(N1M, seed=6)
    emb_np = np.asarray(emb)
    del emb
    gc.collect()
    log("S: building sharded int4 fp-rescore (1-device mesh)")
    idx = ShardedQuantizedIndex(emb_np, np.ones(N1M, bool), bits=4,
                                keep_full_precision=True)
    qn = np.asarray(q)

    s, i = idx.search(qn, K)
    t0 = time.perf_counter()
    for _ in range(8):
        s, i = idx.search(qn, K)
    dt = (time.perf_counter() - t0) / 8
    RESULTS["sharded_int4_fp_qps"] = round(256 / dt, 1)
    log(f"S fp-rescore: {256/dt:.0f} qps")

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
    log(f"S no-rescore: {256/dt:.0f} qps")
    save()


def main():
    import jax
    log(f"devices: {jax.devices()}")
    for name, fn in (("E", phase_e), ("Q", phase_q), ("B", phase_b),
                     ("H", phase_h), ("S", phase_s)):
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
