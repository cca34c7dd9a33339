"""Round-4 TPU batch #3: int4 fma compile matrix + stage-timed hybrid.

  Q3 int4 fma (tile, inner) compile/time matrix at 1M — find the
     configuration that fits scoped VMEM and beats the mul chain —
     then agreement + 4M capacity tier on the winner.
  H3 hybrid single query with PER-STAGE wall clock (bfs fwd/bwd, pack,
     upload, execute, readback) at budgets 16k/32k — find the ~40 ms
     the end-to-end number carries beyond the visible stages.

Progress -> /tmp/r4_progress3.log, results -> /root/repo/R4_TPU_RESULTS3.json.
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r4_progress3.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/root/repo/R4_TPU_RESULTS3.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def p50(xs):
    return float(np.percentile(np.asarray(xs), 50))


N1M = 1 << 20
DIM = 768
K = 10

from r4_tpu_batch1 import _gen_corpus  # noqa: E402


def phase_q3():
    import jax.numpy as jnp
    from lattice_tpu.ops.pallas_topk import binned_topk_int4, valid_col
    from lattice_tpu.ops.quant import (Int4View, _l2n,
                                       quantize_rows_device)

    emb, q = _gen_corpus(N1M, seed=1)
    view = Int4View(emb.astype(jnp.float32))
    vcol = valid_col(jnp.ones((N1M,), bool))
    del emb
    gc.collect()
    qf = _l2n(q)
    qv, qs = quantize_rows_device(qf)
    qv, qs = jnp.asarray(qv), jnp.asarray(qs)

    def timed(sel, tile, inner, iters=12):
        fn = lambda: binned_topk_int4(  # noqa: E731
            qv, qs, view.values, view._scales_col, vcol, 16,
            tile=tile, inner=inner, selection=sel)
        np.asarray(fn()[1])
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        ids = np.asarray(out[1])
        return (time.perf_counter() - t0) / iters, ids

    dt_mul, ids_mul = timed("mul", 4096, None)
    RESULTS["int4_mul_4096_ms"] = round(dt_mul * 1e3, 3)
    log(f"Q3 mul 4096: {dt_mul*1e3:.2f} ms")
    best = (None, 1e9, None)
    for tile, inner in ((4096, 512), (2048, 512), (2048, 1024)):
        key = f"int4_fma_{tile}_{inner}_ms"
        try:
            dt, ids = timed("fma", tile, inner)
            RESULTS[key] = round(dt * 1e3, 3)
            log(f"Q3 fma {tile}/{inner}: {dt*1e3:.2f} ms")
            if dt < best[1]:
                best = ((tile, inner), dt, ids)
        except Exception as exc:
            RESULTS[key] = "OOM: " + repr(exc)[:80]
            log(f"Q3 fma {tile}/{inner}: FAILED {repr(exc)[:80]}")
        save()
    if best[0] is not None:
        ids_fma = best[2]
        agree = np.mean([
            len(set(ids_mul[i]) & set(ids_fma[i])) / 16
            for i in range(256)])
        RESULTS["int4_sel_agreement"] = round(float(agree), 4)
        RESULTS["int4_fma_best"] = list(best[0])
        log(f"Q3 best fma {best[0]}: agreement {agree:.4f}")
    save()

    # served view (uses the library defaults end-to-end)
    s, i = view.search_device(q, vcol, K)
    t0 = time.perf_counter()
    for _ in range(8):
        out = view.search_device(q, vcol, K)
    np.asarray(out[1])
    RESULTS["int4_view_qps"] = round(256 * 8 / (time.perf_counter() - t0), 1)
    log(f"Q3 view: {RESULTS['int4_view_qps']} qps")
    del view
    gc.collect()
    save()

    log("Q3: building 4M int4")
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
    vcol4 = valid_col(jnp.ones((N1M * 4,), bool))
    for sel in ("mul", "fma"):
        try:
            fn = lambda: binned_topk_int4(  # noqa: E731
                qv, qs, view4.values, view4._scales_col, vcol4, 16,
                tile=4096, selection=sel)
            np.asarray(fn()[1])
            t0 = time.perf_counter()
            for _ in range(8):
                out = fn()
            np.asarray(out[1])
            dt = (time.perf_counter() - t0) / 8
            RESULTS[f"int4_4m_{sel}_ms"] = round(dt * 1e3, 2)
            RESULTS[f"int4_4m_{sel}_qps"] = round(256 / dt, 1)
            log(f"Q3 4M {sel}: {dt*1e3:.2f} ms")
        except Exception as exc:
            RESULTS[f"int4_4m_{sel}_ms"] = "ERR " + repr(exc)[:80]
            log(f"Q3 4M {sel} FAILED: {repr(exc)[:80]}")
        save()
    del view4, vcol4
    gc.collect()


def phase_h3():
    import jax
    import jax.numpy as jnp
    from lattice_tpu.core.types import EdgeType, EntityType
    from lattice_tpu.index.chunk_store import ChunkStore
    from lattice_tpu.index.graph_store import GraphStore
    from lattice_tpu.ops.ranking import (FuseWeights, pack_reach,
                                         pack_weights,
                                         hybrid_rank_device_packed)

    log("H3: building 1M/10M graph")
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

    for r_cap in (1 << 14, 1 << 15):
        stages = {k: [] for k in ("bfs_f", "bfs_b", "pack", "upload",
                                  "exec", "total")}

        def one_query(qvec, seed, rec=None):
            t0 = time.perf_counter()
            f_ids, f_d = g._host_bfs([seed], EdgeType.CALLS, 5,
                                     limit=r_cap // 2)
            t1 = time.perf_counter()
            b_ids, b_d = g._host_bfs([seed], EdgeType.CALLS, 5,
                                     reverse=True, limit=r_cap // 2)
            t2 = time.perf_counter()
            ids = np.concatenate([[seed], f_ids, b_ids])
            depths = np.concatenate([[0], f_d, b_d]).astype(np.int32)
            packed = pack_reach(ids, depths,
                                np.zeros(len(ids), np.uint8), r_cap)
            t3 = time.perf_counter()
            packed_d = jnp.asarray(packed)
            packed_d.block_until_ready()
            t4 = time.perf_counter()
            _, rows = hybrid_rank_device_packed(
                qvec, emb_d, valid_d, packed_d, rel_table,
                no_match, degree, quality, weights, 50)
            np.asarray(rows)
            t5 = time.perf_counter()
            if rec is not None:
                rec["bfs_f"].append((t1 - t0) * 1e3)
                rec["bfs_b"].append((t2 - t1) * 1e3)
                rec["pack"].append((t3 - t2) * 1e3)
                rec["upload"].append((t4 - t3) * 1e3)
                rec["exec"].append((t5 - t4) * 1e3)
                rec["total"].append((t5 - t0) * 1e3)

        one_query(qd[0], int(seeds[0]))
        for i in range(16):
            one_query(qd[i], int(seeds[i]), stages)
        key = f"hybrid_stages_budget{r_cap//1024}k"
        RESULTS[key] = {k: round(p50(v), 2) for k, v in stages.items()}
        RESULTS[key + "_max"] = {k: round(max(v), 1)
                                 for k, v in stages.items()}
        log(f"H3 {key}: {RESULTS[key]}")
        save()
    del store, emb, g
    gc.collect()


def phase_s3():
    import r4_tpu_batch2 as b2
    b2.RESULTS = RESULTS
    b2.log = log
    b2.save = save
    b2.phase_s2()


def main():
    import jax
    log(f"devices: {jax.devices()}")
    for name, fn in (("Q3", phase_q3), ("H3", phase_h3), ("S3", phase_s3)):
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
