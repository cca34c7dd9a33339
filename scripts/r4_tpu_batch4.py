"""Round-4 TPU batch #4: sharded retry (mul default), 4M tier, batched hybrid.

  Q4 int4 served view qps + 4M capacity tier (mul chain; batch 3's
     attempt crashed on the since-reverted fma default).
  H4 batched hybrid amortized ms on chip (the new one-execution path)
     + single-query variant passing evidence as a jit ARGUMENT (does
     arg-inline transfer dodge the separate upload barrier?).
  S4 sharded int4 fp-rescore qps + categorized trace + no-rescore A/B
     (directive #4's profile).

Progress -> /tmp/r4_progress4.log, results -> /root/repo/R4_TPU_RESULTS4.json.
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r4_progress4.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/root/repo/R4_TPU_RESULTS4.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def p50(xs):
    return float(np.percentile(np.asarray(xs), 50))


N1M = 1 << 20
DIM = 768
K = 10

from r4_tpu_batch1 import _gen_corpus  # noqa: E402


def phase_q4():
    import jax.numpy as jnp
    from lattice_tpu.ops.pallas_topk import (binned_topk_int4,
                                             pick_tile_packed, valid_col)
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

    # served view (library defaults end-to-end, mul chain)
    s, i = view.search_device(q, vcol, K)
    t0 = time.perf_counter()
    for _ in range(8):
        out = view.search_device(q, vcol, K)
    np.asarray(out[1])
    RESULTS["int4_view_qps"] = round(256 * 8 / (time.perf_counter() - t0), 1)
    log(f"Q4 view: {RESULTS['int4_view_qps']} qps")
    del view
    gc.collect()
    save()

    log("Q4: building 4M int4")
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
    tile4 = pick_tile_packed(N1M * 4, 256, k=16)
    fn = lambda: binned_topk_int4(  # noqa: E731
        qv, qs, view4.values, view4._scales_col, vcol4, 16, tile=tile4)
    np.asarray(fn()[1])
    t0 = time.perf_counter()
    for _ in range(8):
        out = fn()
    np.asarray(out[1])
    dt = (time.perf_counter() - t0) / 8
    RESULTS["int4_4m_ms"] = round(dt * 1e3, 2)
    RESULTS["int4_4m_qps"] = round(256 / dt, 1)
    log(f"Q4 4M: {dt*1e3:.2f} ms ({256/dt:.0f} qps)")
    # served 4M two-stage (dequantized rescore in-view)
    s, i = view4.search_device(q, vcol4, K)
    t0 = time.perf_counter()
    for _ in range(6):
        out = view4.search_device(q, vcol4, K)
    np.asarray(out[1])
    RESULTS["int4_4m_view_qps"] = round(
        256 * 6 / (time.perf_counter() - t0), 1)
    log(f"Q4 4M view: {RESULTS['int4_4m_view_qps']} qps")
    del view4, vcol4
    gc.collect()
    save()


def phase_h4():
    import jax.numpy as jnp
    from lattice_tpu.core.types import EdgeType, EntityType
    from lattice_tpu.index.chunk_store import ChunkStore
    from lattice_tpu.index.graph_store import GraphStore
    from lattice_tpu.ops.ranking import (FuseWeights, pack_reach,
                                         pack_weights,
                                         hybrid_rank_device_packed,
                                         hybrid_rank_device_packed_batch)

    log("H4: building 1M/10M graph")
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
    R_CAP = 1 << 14

    def evidence(seed):
        f_ids, f_d = g._host_bfs([seed], EdgeType.CALLS, 5,
                                 limit=R_CAP // 2)
        b_ids, b_d = g._host_bfs([seed], EdgeType.CALLS, 5,
                                 reverse=True, limit=R_CAP // 2)
        ids = np.concatenate([[seed], f_ids, b_ids])
        depths = np.concatenate([[0], f_d, b_d]).astype(np.int32)
        return pack_reach(ids, depths, np.zeros(len(ids), np.uint8),
                          R_CAP)

    # single query, evidence as a jit ARGUMENT (np array — transferred
    # as part of the execution dispatch instead of an explicit
    # device_put; does the relay treat it as one cycle?)
    def one_query_arg(qvec, seed):
        packed = evidence(seed)
        _, rows = hybrid_rank_device_packed(
            qvec, emb_d, valid_d, packed, rel_table,
            no_match, degree, quality, weights, 50)
        np.asarray(rows)

    one_query_arg(qd[0], int(seeds[0]))
    times = []
    for i in range(16):
        t0 = time.perf_counter()
        one_query_arg(qd[i], int(seeds[i]))
        times.append((time.perf_counter() - t0) * 1e3)
    RESULTS["hybrid_query_ms_nparg"] = round(p50(times), 2)
    log(f"H4 single (np-arg): {RESULTS['hybrid_query_ms_nparg']} ms")
    save()

    # batched: Q=16 evidence in one upload + one execution
    QB = 16
    packed_b = np.stack([evidence(int(s)) for s in seeds[:QB]])
    match_b = np.full((QB, 64), -1, np.int32)

    def batch_query():
        _, rows = hybrid_rank_device_packed_batch(
            qd[:QB], emb_d, valid_d, jnp.asarray(packed_b), rel_table,
            jnp.asarray(match_b), degree, quality, weights, 50)
        np.asarray(rows)

    batch_query()
    t0 = time.perf_counter()
    for _ in range(6):
        batch_query()
    RESULTS["hybrid_batch16_amortized_ms"] = round(
        (time.perf_counter() - t0) * 1e3 / (6 * QB), 2)
    log(f"H4 batch16 amortized: "
        f"{RESULTS['hybrid_batch16_amortized_ms']} ms/query")
    # end-to-end batched (BFS evidence built per round too)
    t0 = time.perf_counter()
    for r in range(3):
        pb = np.stack([evidence(int(s)) for s in seeds[r*16:(r+1)*16]])
        _, rows = hybrid_rank_device_packed_batch(
            qd[:QB], emb_d, valid_d, jnp.asarray(pb), rel_table,
            jnp.asarray(match_b), degree, quality, weights, 50)
        np.asarray(rows)
    RESULTS["hybrid_batch16_e2e_ms"] = round(
        (time.perf_counter() - t0) * 1e3 / (3 * QB), 2)
    log(f"H4 batch16 e2e: {RESULTS['hybrid_batch16_e2e_ms']} ms/query")
    del store, emb, g
    gc.collect()
    save()


def phase_s4():
    import r4_tpu_batch2 as b2
    b2.RESULTS = RESULTS
    b2.log = log
    b2.save = save
    b2.phase_s2()


def main():
    import jax
    log(f"devices: {jax.devices()}")
    for name, fn in (("Q4", phase_q4), ("H4", phase_h4),
                     ("S4", phase_s4)):
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
