"""Round-2 TPU batch #5: sub-tiled binned kernels — the issue-rate lever.

Batch #4 showed the scan floor is per-grid-step overhead (~14 us/step:
int4 at 1/4 the bytes of bf16 ran the same ~7.4 ms at tile 2048), and
that tile 4096 'crashes' were scoped-VMEM OOMs from full-width [B, tile]
slabs. The kernels now stream big tiles but compute in [B, inner]
sub-slabs. Sweep (tile, inner) per dtype at 1M x 768 B=256; then re-run
the int4 4M contract with the widened (4k) rescore stage.
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
OUT = "/root/repo/R2_TPU_RESULTS5.json"


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def save() -> None:
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


def main() -> None:
    import jax
    import jax.numpy as jnp

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

    ev, es = quant_ops.quantize_rows_device(emb_f32)
    qv, qs = quant_ops.quantize_rows_device(q)
    view4 = quant_ops.Int4View(emb_f32)
    np.asarray(qs)
    log("int8 + int4 views built")

    # ---- sweep: bf16 ----------------------------------------------------
    for tile, inner in ((4096, 2048), (4096, 1024), (8192, 2048),
                        (8192, 1024)):
        name = f"bf16_t{tile}_i{inner}"
        try:
            qps, ms, ids = timed(lambda: pk.binned_topk(
                q, emb, valid, K, tile=tile, inner=inner))
            rec = recall_of(ids, exact_np)
            RESULTS[name] = {"qps": round(qps, 1), "ms": round(ms, 2),
                             "recall": round(rec, 4)}
            log(f"{name}: {qps:,.0f} qps {ms:.2f} ms recall {rec:.4f}")
        except Exception as e:
            RESULTS[name] = {"error": repr(e)[:160]}
            log(f"{name} FAILED: {repr(e)[:160]}")
        save()

    # ---- sweep: int8 (with exact rescore, as served) ---------------------
    def int8_full(tile, inner):
        s1, c1 = pk.binned_topk_int8(qv, qs, ev, es, valid, K,
                                     tile=tile, inner=inner)
        return pk._exact_rescore(q, emb, s1, c1, K)

    for tile, inner in ((4096, 2048), (4096, 1024), (8192, 2048),
                        (8192, 1024)):
        name = f"int8_t{tile}_i{inner}"
        try:
            qps, ms, ids = timed(lambda: int8_full(tile, inner))
            rec = recall_of(ids, exact_np)
            RESULTS[name] = {"qps": round(qps, 1), "ms": round(ms, 2),
                             "recall": round(rec, 4)}
            log(f"{name}: {qps:,.0f} qps {ms:.2f} ms recall {rec:.4f}")
        except Exception as e:
            RESULTS[name] = {"error": repr(e)[:160]}
            log(f"{name} FAILED: {repr(e)[:160]}")
        save()

    # ---- sweep: int4 (widened 4k rescore, as served) ---------------------
    def int4_full(tile, inner):
        s1, c1 = pk.binned_topk_int4(qv, qs, view4.values, view4.scales,
                                     valid, 40, tile=tile, inner=inner)
        return pk._exact_rescore(q, emb, s1, c1, K)

    for tile, inner in ((2048, 2048), (4096, 2048), (4096, 1024),
                        (8192, 2048), (8192, 1024), (16384, 2048)):
        name = f"int4_t{tile}_i{inner}"
        try:
            qps, ms, ids = timed(lambda: int4_full(tile, inner))
            rec = recall_of(ids, exact_np)
            RESULTS[name] = {"qps": round(qps, 1), "ms": round(ms, 2),
                             "recall": round(rec, 4)}
            log(f"{name}: {qps:,.0f} qps {ms:.2f} ms recall {rec:.4f}")
        except Exception as e:
            RESULTS[name] = {"error": repr(e)[:160]}
            log(f"{name} FAILED: {repr(e)[:160]}")
        save()

    # int4 first-stage only at the best big tile (capacity-mode number)
    for tile, inner in ((8192, 2048), (4096, 2048)):
        name = f"int4_first_t{tile}_i{inner}"
        try:
            qps, ms, ids = timed(lambda: pk.binned_topk_int4(
                qv, qs, view4.values, view4.scales, valid, K,
                tile=tile, inner=inner))
            rec = recall_of(ids[:, :K], exact_np)
            RESULTS[name] = {"qps": round(qps, 1), "ms": round(ms, 2),
                             "recall_no_rescore": round(rec, 4)}
            log(f"{name}: {qps:,.0f} qps {ms:.2f} ms recall {rec:.4f}")
        except Exception as e:
            RESULTS[name] = {"error": repr(e)[:160]}
            log(f"{name} FAILED: {repr(e)[:160]}")
        save()

    # small batch at the best tile
    try:
        qps, ms, _ = timed(lambda: pk.binned_topk(
            q[:8], emb, valid, K, tile=8192, inner=2048), batch=8)
        RESULTS["bf16_b8_t8192"] = {"qps": round(qps, 1), "ms": round(ms, 2)}
        log(f"bf16 b8 t8192: {qps:,.0f} qps {ms:.2f} ms")
    except Exception as e:
        RESULTS["bf16_b8_t8192"] = {"error": repr(e)[:160]}
    save()

    del emb, emb_f32, ev, es, view4, exact_i

    # ---- int4 4M contract with widened rescore ---------------------------
    try:
        N4 = 4 * 1024 * 1024
        host = np.empty((N4, D), dtype=np.float32)
        for i in range(0, N4, 131_072):
            blk = gen_block(centers, jax.random.fold_in(ka, 7_000_000 + i),
                            jax.random.fold_in(kn, 7_000_000 + i),
                            131_072, 0.06)
            host[i:i + 131_072] = np.asarray(blk)
        emb4 = jnp.asarray(host, dtype=jnp.bfloat16)
        q4 = gen_block(centers, jax.random.fold_in(kq, 7),
                       jax.random.fold_in(kq, 8), B, 0.06)
        valid4 = jnp.ones((N4,), bool)
        _, exact4 = pk.refined_topk(q4, emb4, valid4, K, tile=2048)
        exact4_np = np.asarray(exact4)
        log(f"4M corpus + fused oracle ready ({time.time()-t0:.0f}s)")

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
        qv4, qs4 = quant_ops.quantize_rows_device(q4)

        for tile, inner in ((8192, 2048), (4096, 2048), (2048, 2048)):
            name = f"int4_4m_t{tile}"
            try:
                def rescored():
                    s1, c1 = pk.binned_topk_int4(
                        qv4, qs4, pack4, scale4, valid4, 40,
                        tile=tile, inner=inner)
                    return pk._exact_rescore(q4, emb4, s1, c1, K)
                qps, ms, ids = timed(rescored, iters=4)
                rec = recall_of(ids, exact4_np)
                RESULTS[name] = {"qps": round(qps, 1), "ms": round(ms, 2),
                                 "recall": round(rec, 4)}
                log(f"{name}: {qps:,.0f} qps {ms:.2f} ms recall {rec:.4f}")
            except Exception as e:
                RESULTS[name] = {"error": repr(e)[:160]}
                log(f"{name} FAILED: {repr(e)[:160]}")
            save()

        # host-rescore recall at 40 candidates (true capacity mode)
        s1, c1 = pk.binned_topk_int4(qv4, qs4, pack4, scale4, valid4, 40,
                                     tile=4096, inner=2048)
        c1_np = np.asarray(c1)
        q4_np = np.asarray(q4)
        ids_h = np.empty((B, K), np.int32)
        for r in range(B):
            cand = c1_np[r]
            sc = host[cand] @ q4_np[r]
            ids_h[r] = cand[np.argsort(-sc)[:K]]
        RESULTS["int4_4m_host_rescore_recall"] = round(
            recall_of(ids_h, exact4_np), 4)
        log(f"4M host-rescore recall: "
            f"{RESULTS['int4_4m_host_rescore_recall']}")
    except Exception as e:
        RESULTS["int4_4m"] = {"error": repr(e)[:300]}
        log(f"int4 4M FAILED: {e!r}")

    RESULTS["total_s"] = round(time.time() - t0, 1)
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
