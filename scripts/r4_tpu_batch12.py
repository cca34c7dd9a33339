"""Round-4 TPU batch #12: sharded deep-rank n=1 through the DEVICE entry.

Batch11's S11b timed `ShardedHybridRank.rank` — the host wrapper — and
measured 9.93 ms/q at n=1 vs the flat kernel's 0.745: per call it
re-uploads the [Q, R] packed evidence (16 MB at Q=128 / R=32k) through
the ~20 MB/s relay and reads back, so the number was the tunnel, not
shard_map. This batch times `rank_device` (evidence placed once,
readback once after the loop) — the honest shard_map + merge overhead
at n=1, directly comparable to S11a — for bits=16 and the bits=8
capacity tier, with winner parity asserted against the flat kernel.

Progress -> /tmp/r4_progress12.log, results -> /root/repo/R4_TPU_RESULTS12.json.
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
PROGRESS = open("/tmp/r4_progress12.log", "a")
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
    with open("/root/repo/R4_TPU_RESULTS12.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def main():
    import jax
    if os.environ.get("LATTICE_PLATFORM") == "cpu":
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
    RESULTS["small"] = SMALL
    RESULTS["devices"] = str(jax.devices())
    float(np.asarray(jnp.sum(jnp.zeros((8,), jnp.float32))))  # drain

    rng = np.random.default_rng(12)
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
    del g  # evidence shape is what matters; reuse a fixed random reach
    gc.collect()
    ids = rng.integers(0, N, (Q, R_CAP // 2)).astype(np.int64)
    depths = rng.integers(0, 6, (Q, R_CAP // 2)).astype(np.int32)
    packed = np.stack([
        pack_reach(ids[i], depths[i], np.zeros(R_CAP // 2, np.uint8),
                   R_CAP) for i in range(Q)])
    seeds = rng.integers(0, N, Q)
    match = np.full((Q, 64), -1, np.int32)
    match[:, 0] = seeds
    rel_t = np.asarray([1.0, 0.9, 0.7, 0.0], np.float32)
    w8 = pack_weights(FuseWeights())
    log("corpus + evidence ready")

    # flat-kernel reference loop (device-resident, readback after)
    emb_d = jnp.asarray(emb, jnp.bfloat16)
    args = (jnp.asarray(queries), emb_d, jnp.ones((N,), bool),
            jnp.asarray(packed), jnp.asarray(rel_t), jnp.asarray(match),
            jnp.asarray(deg), jnp.asarray(qual), jnp.asarray(w8), K)
    ws, wi = hybrid_rank_device_packed_batch(*args)
    wi = np.asarray(wi)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        out = hybrid_rank_device_packed_batch(*args)
    np.asarray(out[1])
    dt = (time.perf_counter() - t0) / ITERS
    RESULTS["kernel_q128_ms_per_q"] = round(dt * 1e3 / Q, 3)
    log(f"S12 kernel: {dt*1e3/Q:.3f} ms/q")
    save()

    for bits in (16, 8):
        view = ShardedHybridRank(
            emb, np.ones(N, bool), deg, qual, mesh=make_mesh(1),
            dtype="bfloat16", bits=bits)
        q_d = jnp.asarray(queries)
        p_d = jnp.asarray(packed)
        r_d = jnp.asarray(rel_t)
        m_d = jnp.asarray(match)
        w_d = jnp.asarray(w8)
        hs, hi = view.rank_device(q_d, p_d, r_d, m_d, w_d, K)
        hi_np = np.asarray(hi)
        if bits == 16:
            RESULTS["n1_matches_kernel"] = bool(np.array_equal(hi_np, wi))
        else:
            RESULTS["n1_int8_topk_overlap"] = round(float(np.mean([
                len(set(hi_np[i].tolist()) & set(wi[i].tolist())) / K
                for i in range(Q)])), 4)
        t0 = time.perf_counter()
        for _ in range(ITERS):
            hs, hi = view.rank_device(q_d, p_d, r_d, m_d, w_d, K)
        np.asarray(hi)
        dt = (time.perf_counter() - t0) / ITERS
        key = "n1_device" if bits == 16 else "n1_int8_device"
        RESULTS[f"{key}_ms_per_q"] = round(dt * 1e3 / Q, 3)
        RESULTS[f"{key}_overhead_pct"] = round(
            100 * (RESULTS[f"{key}_ms_per_q"]
                   / RESULTS["kernel_q128_ms_per_q"] - 1), 1)
        log(f"S12 bits={bits}: {dt*1e3/Q:.3f} ms/q "
            f"(+{RESULTS[f'{key}_overhead_pct']}%)")
        del view
        gc.collect()
        save()
    log("DONE")


if __name__ == "__main__":
    main()
