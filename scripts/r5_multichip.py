"""Round-5 real-multichip measurement script (VERDICT r4 #7).

Everything sharded in this repo is dryrun-validated only (1 real chip in
this environment); this script pre-stages hardware day so that when an
n>1-chip attach exists, the day is measurement-only. On attach it runs,
in order (each phase appends ONE JSON line to R5_MULTICHIP.jsonl):

  1. layout_probe — the r4 review fix: `ShardedQuantizedIndex._col_format`
     must be non-None on >1-device TPU meshes (the forced row-major [N,1]
     column layout was silently disabled there until r4; a None on real
     multi-chip re-introduces the 1.5 ms/call relayout copies).
  2. sharded_qps — ShardedQuantizedIndex(bits=4, keep_full_precision=True)
     device-resident qps at N = rows_per_chip x n_devices (r4 measured
     66k qps/chip at n=1 with ZERO shard_map overhead — scaling here is
     purely an ICI question).
  3. hybrid_rank — sharded hybrid deep-rank (parallel/sharded_rank.py):
     parity vs the single-chip packed kernel, then rank_device qps.
  4. frontend — BatchingFrontend over the sharded store plan: 64
     concurrent clients, ms/query.

Modes:
  python scripts/r5_multichip.py            # real chips (n>1 expected)
  R5_DRYRUN=1 python scripts/r5_multichip.py  # 8 virtual CPU devices,
      tiny sizes — the end-to-end rehearsal this repo CAN run today.

Progress -> /tmp/r5_multichip.log, results -> /root/repo/R5_MULTICHIP.jsonl.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

DRYRUN = os.environ.get("R5_DRYRUN") == "1"
if DRYRUN:
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + " --xla_force_host_platform_device_count=8").strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np  # noqa: E402

OUT = os.environ.get("R5_OUT", "/root/repo/R5_MULTICHIP.jsonl")
LOG = open("/tmp/r5_multichip.log", "a")


def log(msg: str) -> None:
    LOG.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    LOG.flush()


def emit(phase: str, **fields) -> None:
    line = {"phase": phase, "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
            **fields}
    with open(OUT, "a") as f:
        f.write(json.dumps(line, default=str) + "\n")
    log(f"{phase}: {fields}")


def main() -> int:
    import jax

    if DRYRUN:
        # the site hook pins jax_platforms to the TPU plugin even when
        # JAX_PLATFORMS=cpu; force it before backend init (same move as
        # __graft_entry__.dryrun_multichip)
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
    import jax.numpy as jnp

    from lattice_tpu.parallel.mesh import make_mesh

    devices = jax.devices()
    n = len(devices)
    platform = devices[0].platform.lower()
    on_tpu = platform in ("tpu", "axon")
    emit("attach", n_devices=n, platform=platform, dryrun=DRYRUN)
    if n < 2:
        emit("abort", reason=f"{n} device(s) — this script exists for "
                             "n>1; run with R5_DRYRUN=1 to rehearse")
        return 2

    dim = 768 if on_tpu else 64
    rows_per_chip = int(os.environ.get(
        "R5_ROWS_PER_CHIP", 1 << 20 if on_tpu else 512))
    batch = int(os.environ.get("R5_BATCH", 256 if on_tpu else 16))
    iters = int(os.environ.get("R5_ITERS", 12 if on_tpu else 3))
    n_rows = rows_per_chip * n
    k = 10
    mesh = make_mesh(n)
    rng = np.random.default_rng(5)

    # ---- 1. layout probe (r4 review fix, verify on silicon) --------------
    from lattice_tpu.parallel.sharded_index import ShardedQuantizedIndex
    small = rng.standard_normal((128 * n, dim)).astype(np.float32)
    small /= np.linalg.norm(small, axis=1, keepdims=True)
    probe = ShardedQuantizedIndex(small, np.ones(len(small), bool),
                                  mesh=mesh, bits=4,
                                  keep_full_precision=True)
    forced = probe._col_format is not None
    emit("layout_probe", col_format_forced=forced, n_devices=n)
    if on_tpu and not forced:
        emit("layout_probe_FAIL",
             error="_col_format is None on a >1-device TPU mesh — the "
                   "r4 relayout fix is disabled exactly where it "
                   "matters; expect ~1.5 ms/call of copies")
    del probe, small

    # ---- 2. sharded int4-fp qps at scale ----------------------------------
    try:
        t0 = time.perf_counter()
        # assemble on host in slabs (device concat OOMs at full scale)
        emb = rng.standard_normal((n_rows, dim), dtype=np.float32)
        emb /= np.linalg.norm(emb, axis=1, keepdims=True)
        gen_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        sq = ShardedQuantizedIndex(emb, np.ones(n_rows, bool), mesh=mesh,
                                   bits=4, keep_full_precision=True)
        build_s = time.perf_counter() - t0
        q = jnp.asarray(emb[rng.choice(n_rows, batch, replace=False)],
                        jnp.float32)
        np.asarray(sq.search_device(q, k)[1])  # compile+warm+drain
        best = float("inf")
        for _ in range(2):  # best-of-2 windows (relay queue transients)
            t0 = time.perf_counter()
            for _ in range(iters):
                out = sq.search_device(q, k)
            i_got = np.asarray(out[1])
            best = min(best, time.perf_counter() - t0)
        qps = batch * iters / best
        # recall vs exact over the resident bf16 rows
        from lattice_tpu.ops import topk as topk_ops
        _, i_or = topk_ops.flat_topk_blocked(q, sq.full_precision,
                                             sq.valid, k)
        i_or = np.asarray(i_or)
        rec = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(i_got, i_or)]))
        emit("sharded_qps", n_rows=n_rows, rows_per_chip=rows_per_chip,
             batch=batch, qps=round(qps, 1),
             qps_per_chip=round(qps / n, 1), recall=round(rec, 4),
             build_s=round(build_s, 1), corpus_gen_s=round(gen_s, 1))
        del sq
    except Exception as exc:  # noqa: BLE001 — later phases still run
        emit("sharded_qps_ERROR", error=repr(exc)[:300])
    import gc
    gc.collect()

    # ---- 3. sharded hybrid deep-rank ---------------------------------------
    try:
        from lattice_tpu.ops.ranking import (
            FuseWeights,
            hybrid_rank_device_packed_batch,
            pack_reach,
            pack_weights,
        )
        from lattice_tpu.parallel.sharded_rank import ShardedHybridRank

        h_rows = min(n_rows, 1 << 20) if on_tpu else n_rows
        emb_h = rng.standard_normal((h_rows, dim), dtype=np.float32)
        emb_h /= np.linalg.norm(emb_h, axis=1, keepdims=True)
        valid_h = np.ones(h_rows, bool)
        degree = rng.integers(0, 60, h_rows).astype(np.int32)
        qual = rng.random(h_rows).astype(np.float32)
        qh = batch if on_tpu else 3
        r_cap = 1 << 15 if on_tpu else 64
        packed = np.stack([
            pack_reach(
                rng.choice(h_rows, min(40, h_rows),
                           replace=False).astype(np.int64),
                rng.integers(0, 5, min(40, h_rows)),
                rng.integers(0, 3, min(40, h_rows)), r_cap)
            for _ in range(qh)])
        match = np.full((qh, 64), -1, np.int32)
        rel_t = np.asarray([1.0, 0.9, 0.7, 0.0], np.float32)
        w8 = pack_weights(FuseWeights())
        hview = ShardedHybridRank(emb_h, valid_h, degree, qual, mesh=mesh,
                                  dtype="bfloat16" if on_tpu else "float32")
        queries_h = emb_h[rng.choice(h_rows, qh, replace=False)]
        hs, hi = hview.rank(queries_h, packed, rel_t, match, w8, k=k)
        # parity vs the single-chip packed-batch kernel (row-local fuse
        # => EQUAL results; asserted at dryrun scale, spot-checked on
        # silicon where the single-chip side also fits)
        if not on_tpu or h_rows <= (1 << 20):
            ws, wi = hybrid_rank_device_packed_batch(
                jnp.asarray(queries_h, jnp.float32),
                jnp.asarray(emb_h, jnp.bfloat16 if on_tpu else jnp.float32),
                jnp.asarray(valid_h), jnp.asarray(packed),
                jnp.asarray(rel_t), jnp.asarray(match),
                jnp.asarray(degree), jnp.asarray(qual),
                jnp.asarray(w8), k)
            parity = bool(np.array_equal(hi, np.asarray(wi)))
        else:
            parity = None
        qd = jnp.asarray(queries_h, jnp.float32)
        pd = jnp.asarray(packed)
        md = jnp.asarray(match)
        np.asarray(hview.rank_device(qd, pd, jnp.asarray(rel_t), md,
                                     jnp.asarray(w8), k)[1])
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = hview.rank_device(qd, pd, jnp.asarray(rel_t), md,
                                        jnp.asarray(w8), k)
            np.asarray(out[1])
            best = min(best, time.perf_counter() - t0)
        emit("hybrid_rank", n_rows=h_rows, q=qh,
             parity_vs_single_chip=parity,
             qps=round(qh * iters / best, 1),
             ms_per_query=round(best * 1000 / (iters * qh), 3))
        del hview, emb_h
    except Exception as exc:  # noqa: BLE001
        emit("hybrid_rank_ERROR", error=repr(exc)[:300])
    gc.collect()

    # ---- 4. frontend over the sharded store --------------------------------
    try:
        from lattice_tpu.index.chunk_store import ChunkStore
        from lattice_tpu.ops import topk as topk_ops
        from lattice_tpu.serving import BatchingFrontend

        s_rows = min(n_rows, 1 << 20) if on_tpu else 96
        emb_s = rng.standard_normal((s_rows, dim)).astype(np.float32)
        emb_s = topk_ops.l2_normalize(emb_s)
        store = ChunkStore(dim=dim, dtype="bfloat16" if on_tpu
                           else "float32", initial_capacity=s_rows)
        store.add(np.asarray(emb_s),
                  [{"file_path": f"f{i % 8}.py"} for i in range(s_rows)])
        queries_s = np.asarray(emb_s[:64])
        with BatchingFrontend(store, max_batch=64, max_wait_ms=3.0,
                              method="sharded") as fe:
            for _ in range(2):  # warm rounds compile the pad buckets
                futs = [fe.submit(queries_s[i % 64], k) for i in range(64)]
                for f in futs:
                    f.result(timeout=600)
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                futs = [fe.submit(queries_s[i % 64], k) for i in range(64)]
                for f in futs:
                    f.result(timeout=600)
                best = min(best, time.perf_counter() - t0)
            emit("frontend_sharded", n_rows=s_rows,
                 concurrent=64,
                 ms_per_query=round(best / 64 * 1e3, 2),
                 mean_batch=round(fe.stats.mean_batch, 1))
    except Exception as exc:  # noqa: BLE001
        emit("frontend_sharded_ERROR", error=repr(exc)[:300])

    emit("done", n_devices=n)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
