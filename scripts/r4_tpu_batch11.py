"""Round-4 TPU batch #11: the sharded deep-rank tier on the real chip.

  S11a 1M x 768: single-chip batched hybrid-rank kernel at Q=128 (the
       engine's DEEP_BATCH_CHUNK) — per-query device time at the chunk
       size the MCP/CLI batch path actually dispatches.
  S11b ShardedHybridRank on a 1-device mesh (bits=16): shard_map + merge
       overhead at n=1 vs the flat kernel (the number that multiplies
       when real chips show up), winners asserted EQUAL.
  S11c bits=8 capacity tier: qps + top-k overlap vs bits=16.

Progress -> /tmp/r4_progress11.log, results -> /root/repo/R4_TPU_RESULTS11.json.
SMALL=1 smoke-tests the flow at toy sizes (CPU ok).
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r4_progress11.log", "a")
SMALL = os.environ.get("SMALL") == "1"

N = 1 << 12 if SMALL else 1 << 20
E = N * 10
DIM = 64 if SMALL else 768
Q = 8 if SMALL else 128
K = 10
R_CAP = 1 << 9 if SMALL else 1 << 15
ITERS = 2 if SMALL else 12


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/root/repo/R4_TPU_RESULTS11.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def main():
    import jax
    if os.environ.get("LATTICE_PLATFORM") == "cpu":
        # the site hook pins JAX_PLATFORMS to the TPU plugin; honor the
        # CPU request before the backend initializes (smoke runs must
        # not queue a relay grant)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from lattice_tpu.core.types import EdgeType, EntityType
    from lattice_tpu.index.graph_store import GraphStore
    from lattice_tpu.ops.ranking import (FuseWeights, pack_reach,
                                         pack_weights,
                                         hybrid_rank_device_packed_batch)
    from lattice_tpu.parallel.mesh import make_mesh
    from lattice_tpu.parallel.sharded_rank import ShardedHybridRank

    log(f"devices: {jax.devices()}  N={N} Q={Q}")
    # Provenance markers: a SMALL=1 CPU smoke run writes the same keys as
    # the chip run — record which this was so the file can't be misread
    # (review finding r4; the 13.5-qps warmup artifact was this class).
    RESULTS["small"] = SMALL
    RESULTS["devices"] = str(jax.devices())
    float(jnp.sum(jnp.zeros((8,), jnp.float32)))  # drain the grant queue

    rng = np.random.default_rng(11)
    g = GraphStore()
    g.add_nodes_bulk([f"n{i}" for i in range(N)], EntityType.FUNCTION)
    g.add_edges_bulk(rng.integers(0, N, E).astype(np.int32),
                     rng.integers(0, N, E).astype(np.int32),
                     EdgeType.CALLS)
    g.finalize()

    emb = rng.normal(size=(N, DIM)).astype(np.float32)
    emb /= np.maximum(np.linalg.norm(emb, axis=-1, keepdims=True), 1e-12)
    queries = rng.normal(size=(Q, DIM)).astype(np.float32)
    deg = np.asarray(g.degree_vector(EdgeType.CALLS))[:N].astype(np.int32)
    qual = np.ones(N, np.float32)

    def evidence(seed):
        f_ids, f_d = g._host_bfs([seed], EdgeType.CALLS, 5,
                                 limit=R_CAP // 2)
        b_ids, b_d = g._host_bfs([seed], EdgeType.CALLS, 5,
                                 reverse=True, limit=R_CAP // 2)
        ids = np.concatenate([[seed], f_ids, b_ids])
        depths = np.concatenate([[0], f_d, b_d]).astype(np.int32)
        return pack_reach(ids, depths, np.zeros(len(ids), np.uint8),
                          R_CAP)

    seeds = rng.integers(0, N, Q)
    t0 = time.perf_counter()
    packed = np.stack([evidence(int(s)) for s in seeds])
    RESULTS["evidence_host_ms_per_q"] = round(
        (time.perf_counter() - t0) * 1e3 / Q, 3)
    # the engine's batched walk entry: OpenMP across queries IN-PROCESS
    # with the TPU runtime — r4 measured the k_hop batch entry slower on
    # this 1-core box (7.4k vs 16.3k walks/s); quantify it for the
    # deep-evidence shape so the cpu_count gate has chip-adjacent data
    seed_sets = [[int(s)] for s in seeds]
    t0 = time.perf_counter()
    g._host_bfs_batch(seed_sets, EdgeType.CALLS, 5, limit=R_CAP // 2,
                      force_batch=True)
    g._host_bfs_batch(seed_sets, EdgeType.CALLS, 5, limit=R_CAP // 2,
                      reverse=True, force_batch=True)
    RESULTS["evidence_batched_walks_ms_per_q"] = round(
        (time.perf_counter() - t0) * 1e3 / Q, 3)
    match = np.full((Q, 64), -1, np.int32)
    match[:, 0] = seeds
    rel_t = np.asarray([1.0, 0.9, 0.7, 0.0], np.float32)
    w8 = pack_weights(FuseWeights())

    # ---- S11a: single-chip batched kernel at the engine chunk size
    emb_d = jnp.asarray(emb, jnp.bfloat16)
    valid_d = jnp.ones((N,), bool)
    args = (jnp.asarray(queries), emb_d, valid_d, jnp.asarray(packed),
            jnp.asarray(rel_t), jnp.asarray(match),
            jnp.asarray(deg), jnp.asarray(qual), jnp.asarray(w8), K)
    ws, wi = hybrid_rank_device_packed_batch(*args)
    wi = np.asarray(wi)                      # full warm readback
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = hybrid_rank_device_packed_batch(*args)
    np.asarray(out[1])
    dt = (time.perf_counter() - t0) / ITERS
    RESULTS["kernel_q128_ms_per_q"] = round(dt * 1e3 / Q, 3)
    RESULTS["kernel_q128_qps"] = round(Q / dt, 1)
    log(f"S11a kernel Q={Q}: {dt*1e3/Q:.3f} ms/q ({Q/dt:.0f} qps)")
    save()

    # ---- S11b: sharded view at n=1 (shard_map overhead)
    view = ShardedHybridRank(emb, np.ones(N, bool), deg, qual,
                             mesh=make_mesh(1), dtype="bfloat16")
    hs, hi = view.rank(queries, packed, rel_t, match, w8, K)
    assert np.array_equal(hi, wi), "sharded(n=1) != flat kernel"
    t0 = time.perf_counter()
    for _ in range(ITERS):
        hs, hi = view.rank(queries, packed, rel_t, match, w8, K)
    dt = (time.perf_counter() - t0) / ITERS
    RESULTS["sharded_n1_ms_per_q"] = round(dt * 1e3 / Q, 3)
    RESULTS["sharded_n1_qps"] = round(Q / dt, 1)
    RESULTS["sharded_n1_overhead_pct"] = round(
        100 * (RESULTS["sharded_n1_ms_per_q"]
               / RESULTS["kernel_q128_ms_per_q"] - 1), 1)
    log(f"S11b sharded n=1: {dt*1e3/Q:.3f} ms/q "
        f"(+{RESULTS['sharded_n1_overhead_pct']}%)")
    del view
    gc.collect()
    save()

    # ---- S11c: int8 capacity tier
    v8 = ShardedHybridRank(emb, np.ones(N, bool), deg, qual,
                           mesh=make_mesh(1), dtype="bfloat16", bits=8)
    _, i8 = v8.rank(queries, packed, rel_t, match, w8, K)
    overlap = float(np.mean([
        len(set(a.tolist()) & set(b.tolist())) / K
        for a, b in zip(i8, wi)]))
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out8 = v8.rank(queries, packed, rel_t, match, w8, K)
    dt = (time.perf_counter() - t0) / ITERS
    RESULTS["int8_tier_ms_per_q"] = round(dt * 1e3 / Q, 3)
    RESULTS["int8_tier_qps"] = round(Q / dt, 1)
    RESULTS["int8_tier_overlap_at_10"] = round(overlap, 4)
    log(f"S11c int8 tier: {dt*1e3/Q:.3f} ms/q, overlap {overlap:.4f}")
    del v8, out8
    gc.collect()
    save()
    log("ALL DONE")


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:
        import traceback
        log(f"FAILED: {exc!r}\n" + traceback.format_exc(limit=8))
        RESULTS["error"] = repr(exc)[:300]
        save()
        raise
