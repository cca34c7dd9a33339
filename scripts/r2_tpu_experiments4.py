"""Round-2 TPU batch #4: the int4 tier on hardware.

Questions this batch answers:
1. 1M x 768 B=256: int4 binned scan qps/recall (first stage alone, and
   two-stage with exact bf16 rescore) vs the bf16 37.4k / int8 35.8k
   numbers from batch #3. If the scan is per-tile-issue-rate bound
   (~8 us/tile, r1 roofline), int4 only wins via BIGGER tiles (packed
   rows are 4x smaller, so tile 4096/8192 may fit where bf16 OOMed).
2. int4 matmul-only probe floor at tiles 2048/4096/8192 — is the
   unpack+2-halfwidth-matmul shape MXU/DMA-friendly at all?
3. 4M x 768 capacity contract: packed int4 = 1.55 GB <= the 1M-bf16
   budget (1.61 GB). Recall vs the fused oracle, with and without
   rescore; qps at capacity. PQ's 4M answer was 187 qps (ADC-bound,
   batch #3) — int4 should serve this at tens of thousands.
4. Serving-path check: ChunkStore.search_device(method="int4") at 1M.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS: dict = {}
OUT = "/root/repo/R2_TPU_RESULTS4.json"


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def save() -> None:
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main() -> None:
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    t0 = time.time()
    dev = jax.devices()[0]
    log(f"attached: {dev}")
    RESULTS["device"] = str(dev)

    from lattice_tpu.ops import topk as topk_ops
    from lattice_tpu.ops import pallas_topk as pk
    from lattice_tpu.ops import quant as quant_ops

    N, D, B, K = 1_048_576, 768, 256, 10
    N_CLUSTERS = 1024
    key = jax.random.PRNGKey(0)
    kc, ka, kn, kq = jax.random.split(key, 4)

    @functools.partial(jax.jit, static_argnames=("c",))
    def gen_centers(k, c):
        x = jax.random.normal(k, (c, D), dtype=jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-12)

    @functools.partial(jax.jit, static_argnames=("n", "spread"))
    def gen_block(centers, ka, kn, n, spread):
        assign = jax.random.randint(ka, (n,), 0, N_CLUSTERS)
        onehot = jax.nn.one_hot(assign, N_CLUSTERS, dtype=jnp.bfloat16)
        base = jax.lax.dot_general(
            onehot, centers.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = base + spread * jax.random.normal(kn, (n, D), dtype=jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-12)

    centers = gen_centers(kc, N_CLUSTERS)
    parts = []
    for i in range(0, N, 131_072):
        parts.append(gen_block(centers, jax.random.fold_in(ka, i),
                               jax.random.fold_in(kn, i), 131_072,
                               0.35).astype(jnp.bfloat16))
    emb = jnp.concatenate(parts)
    del parts
    emb_f32 = emb.astype(jnp.float32)
    valid = jnp.ones((N,), bool)
    q = gen_block(centers, jax.random.fold_in(kq, 1),
                  jax.random.fold_in(kq, 2), B, 0.35)
    np.asarray(q)
    _, exact_i = topk_ops.flat_topk(q, emb_f32, valid, K)
    exact_np = np.asarray(exact_i)
    log(f"1M corpus + oracle ready ({time.time()-t0:.0f}s)")

    def recall_of(ids_np, oracle):
        return float(np.mean([
            len(set(ids_np[i].tolist()) & set(oracle[i].tolist())) / K
            for i in range(ids_np.shape[0])]))

    def timed(fn, iters=8, batch=B):
        out = fn()
        np.asarray(out[1] if isinstance(out, tuple) else out)
        t = time.perf_counter()
        for _ in range(iters):
            out = fn()
        last = np.asarray(out[1] if isinstance(out, tuple) else out)
        dt = time.perf_counter() - t
        return batch * iters / dt, dt / iters * 1000.0, last

    # ---- int4 view of the 1M corpus -------------------------------------
    view = quant_ops.Int4View(emb_f32)
    qv, qs = quant_ops.quantize_rows_device(q)
    np.asarray(qs)
    log("int4 view built")

    # ---- 2. matmul-only probe floor (unpack + two half-width dots) ------
    def make_int4_probe(tile: int):
        def kern(q_ref, e_ref, out_ref):
            x = e_ref[:].astype(jnp.int32)
            lo = (((x & 0xF) ^ 8) - 8).astype(jnp.int8)
            hi = (x >> 4).astype(jnp.int8)
            qq = q_ref[:]
            dh = x.shape[1]
            dims = (((1,), (1,)), ((), ()))
            acc = jax.lax.dot_general(qq[:, :dh], lo, dimension_numbers=dims,
                                      preferred_element_type=jnp.int32)
            acc = acc + jax.lax.dot_general(qq[:, dh:], hi,
                                            dimension_numbers=dims,
                                            preferred_element_type=jnp.int32)
            b = acc.shape[0]
            out_ref[:] = jnp.max(
                acc.reshape(b, tile // 128, 128), axis=1).astype(jnp.float32)

        @jax.jit
        def run(qq, ee):
            return pl.pallas_call(
                kern,
                grid=(N // tile,),
                in_specs=[
                    pl.BlockSpec((B, D), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, D // 2), lambda j: (j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, 128), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (B, (N // tile) * 128), jnp.float32),
            )(qq, ee)
        return run

    for tile in (2048, 4096, 8192):
        try:
            fn = make_int4_probe(tile)
            qps, ms, _ = timed(lambda: fn(qv, view.values))
            RESULTS[f"int4_probe_t{tile}"] = {
                "ms": round(ms, 2), "qps": round(qps, 1)}
            log(f"int4 probe t={tile}: {ms:.2f} ms ({qps:,.0f} qps)")
        except Exception as e:
            RESULTS[f"int4_probe_t{tile}"] = {"error": repr(e)[:200]}
            log(f"int4 probe t={tile} FAILED: {e!r}")
        save()

    # ---- 1. full int4 binned path at 1M ---------------------------------
    def int4_first(tile):
        return pk.binned_topk_int4(qv, qs, view.values, view.scales,
                                   valid, K, tile=tile)

    def int4_rescored(tile):
        s1, c1 = pk.binned_topk_int4(qv, qs, view.values, view.scales,
                                     valid, 16, tile=tile)
        return pk._exact_rescore(q, emb, s1, c1, K)

    for tile in (2048, 4096, 8192):
        try:
            qps, ms, ids = timed(lambda: int4_first(tile))
            rec = recall_of(ids[:, :K], exact_np)
            RESULTS[f"int4_first_t{tile}"] = {
                "qps": round(qps, 1), "ms": round(ms, 2),
                "recall_no_rescore": round(rec, 4)}
            log(f"int4 first t={tile}: {qps:,.0f} qps {ms:.2f} ms "
                f"recall {rec:.4f}")
        except Exception as e:
            RESULTS[f"int4_first_t{tile}"] = {"error": repr(e)[:200]}
            log(f"int4 first t={tile} FAILED: {e!r}")
        save()

    for tile in (2048, 4096):
        try:
            qps, ms, ids = timed(lambda: int4_rescored(tile))
            rec = recall_of(ids, exact_np)
            RESULTS[f"int4_rescored_t{tile}"] = {
                "qps": round(qps, 1), "ms": round(ms, 2),
                "recall": round(rec, 4)}
            log(f"int4 rescored t={tile}: {qps:,.0f} qps {ms:.2f} ms "
                f"recall {rec:.4f}")
        except Exception as e:
            RESULTS[f"int4_rescored_t{tile}"] = {"error": repr(e)[:200]}
            log(f"int4 rescored t={tile} FAILED: {e!r}")
        save()

    # small batch latency
    try:
        qv8, qs8 = qv[:8], qs[:8]
        qps, ms, _ = timed(lambda: pk.binned_topk_int4(
            qv8, qs8, view.values, view.scales, valid, K, tile=4096),
            batch=8)
        RESULTS["int4_first_b8"] = {"qps": round(qps, 1), "ms": round(ms, 2)}
        log(f"int4 b8: {qps:,.0f} qps {ms:.2f} ms")
    except Exception as e:
        RESULTS["int4_first_b8"] = {"error": repr(e)[:200]}
        log(f"int4 b8 FAILED: {e!r}")
    save()

    # ---- 4. serving-path check: ChunkStore method="int4" ----------------
    try:
        from lattice_tpu.index.chunk_store import ChunkStore
        store = ChunkStore.from_device_arrays(emb, valid)
        qps, ms, ids = timed(lambda: store.search_device(q, K, method="int4"))
        rec = recall_of(ids, exact_np)
        RESULTS["store_int4_1m"] = {
            "qps": round(qps, 1), "ms": round(ms, 2), "recall": round(rec, 4)}
        log(f"store int4: {qps:,.0f} qps {ms:.2f} ms recall {rec:.4f}")
        del store
    except Exception as e:
        RESULTS["store_int4_1m"] = {"error": repr(e)[:300]}
        log(f"store int4 FAILED: {e!r}")
    save()

    del emb, emb_f32, view, exact_i

    # ---- 3. 4M capacity contract ----------------------------------------
    try:
        N4 = 4 * 1024 * 1024
        host = np.empty((N4, D), dtype=np.float32)
        for i in range(0, N4, 131_072):
            blk = gen_block(centers, jax.random.fold_in(ka, 7_000_000 + i),
                            jax.random.fold_in(kn, 7_000_000 + i),
                            131_072, 0.06)
            host[i:i + 131_072] = np.asarray(blk)
        emb4 = jnp.asarray(host, dtype=jnp.bfloat16)   # one 6 GB transfer
        q4 = gen_block(centers, jax.random.fold_in(kq, 7),
                       jax.random.fold_in(kq, 8), B, 0.06)
        valid4 = jnp.ones((N4,), bool)
        _, exact4 = pk.refined_topk(q4, emb4, valid4, K, tile=2048)
        exact4_np = np.asarray(exact4)
        log(f"4M corpus + fused oracle ready ({time.time()-t0:.0f}s)")

        tb = time.time()
        # quantize in blocks (4M f32 intermediate would be 12 GB)
        packs, scls = [], []
        for i in range(0, N4, 524_288):
            p, s = quant_ops.quantize_rows_int4_device(
                emb4[i:i + 524_288].astype(jnp.float32))
            packs.append(p)
            scls.append(s)
        pack4 = jnp.concatenate(packs)
        scale4 = jnp.concatenate(scls)
        del packs, scls
        np.asarray(scale4[:4])
        build_s = time.time() - tb
        qv4, qs4 = quant_ops.quantize_rows_device(q4)
        code_bytes = int(pack4.size + scale4.size * 4)
        budget = 1_048_576 * D * 2

        for tile in (2048, 4096):
            try:
                qps, ms, ids = timed(lambda: pk.binned_topk_int4(
                    qv4, qs4, pack4, scale4, valid4, K, tile=tile), iters=4)
                rec = recall_of(ids[:, :K], exact4_np)
                RESULTS[f"int4_4m_first_t{tile}"] = {
                    "qps": round(qps, 1), "ms": round(ms, 2),
                    "recall_no_rescore": round(rec, 4)}
                log(f"int4 4M first t={tile}: {qps:,.0f} qps {ms:.2f} ms "
                    f"recall {rec:.4f}")
            except Exception as e:
                RESULTS[f"int4_4m_first_t{tile}"] = {"error": repr(e)[:200]}
                log(f"int4 4M t={tile} FAILED: {e!r}")
            save()

        # device rescore (rows still resident here) + host-rescore variant
        def i4_rescored4():
            s1, c1 = pk.binned_topk_int4(qv4, qs4, pack4, scale4,
                                         valid4, 16, tile=2048)
            return pk._exact_rescore(q4, emb4, s1, c1, K)
        qps_r, ms_r, ids_r = timed(i4_rescored4, iters=4)
        res_recall = recall_of(ids_r, exact4_np)

        # host rescore: gather winner rows on host, exact f32 dot
        s1, c1 = pk.binned_topk_int4(qv4, qs4, pack4, scale4,
                                     valid4, 16, tile=2048)
        c1_np = np.asarray(c1)
        q4_np = np.asarray(q4)
        ids_h = np.empty((B, K), np.int32)
        for r in range(B):
            cand = c1_np[r]
            sc = host[cand] @ q4_np[r]
            ids_h[r] = cand[np.argsort(-sc)[:K]]
        host_recall = recall_of(ids_h, exact4_np)

        RESULTS["int4_4m_contract"] = {
            "build_s": round(build_s, 1),
            "rescored_qps": round(qps_r, 1), "rescored_ms": round(ms_r, 2),
            "rescored_recall": round(res_recall, 4),
            "host_rescore_recall": round(host_recall, 4),
            "code_bytes": code_bytes, "bf16_1m_budget": budget,
            "under_budget": bool(code_bytes <= budget)}
        log(f"int4 4M: build {build_s:.0f}s dev-rescore {qps_r:,.0f} qps "
            f"recall {res_recall:.4f} | host-rescore {host_recall:.4f} | "
            f"codes {code_bytes/1e9:.2f} GB <= {budget/1e9:.2f} GB: "
            f"{code_bytes <= budget}")
    except Exception as e:
        RESULTS["int4_4m_contract"] = {"error": repr(e)[:300]}
        log(f"int4 4M FAILED: {e!r}")

    RESULTS["total_s"] = round(time.time() - t0, 1)
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
