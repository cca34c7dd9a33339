"""Round-2 TPU batch #3: binned-kernel dissection + finish fix + PQ 4M.

Batch #2 findings this batch acts on:
- lax.top_k over [B, 65536] keys = 80 ms full sort -> replaced with
  approx_max_k (PartialReduce) on bitcast keys; remeasure end to end.
- the binned kernel itself was 11.2 ms vs the 5.2 ms matmul+rowmax
  floor: dissect with kernel variants (matmul+stride-max on raw f32 /
  + pack / full), and sweep tile 2048/4096/8192 (no VMEM selection
  scratch anymore, and per-tile fixed overhead measured ~8 us/tile in
  r1 — bigger tiles cut the tile count).
- 4M corpus assembly OOMed on device concat (2x 6 GB): assemble on host.
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


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


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
    from lattice_tpu.ops import pq as pq_ops

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

    def recall_of(ids_np):
        return float(np.mean([
            len(set(ids_np[i].tolist()) & set(exact_np[i].tolist())) / K
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

    # ---- dissection kernels (script-local, not product code) -----------
    def make_probe(mode: str, tile: int):
        def kern(q_ref, e_ref, out_ref):
            e_tile = e_ref[:]
            scores = jax.lax.dot_general(
                q_ref[:].astype(e_tile.dtype), e_tile,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            b = scores.shape[0]
            if mode == "rawmax":
                out_ref[:] = jnp.max(
                    scores.reshape(b, tile // 128, 128), axis=1)
            else:  # pack
                cols = jax.lax.broadcasted_iota(jnp.int32, (b, tile), 1)
                keys = pk._pack_keys_fast(scores, cols)
                out_ref[:] = jnp.max(
                    keys.reshape(b, tile // 128, 128), axis=1
                ).astype(jnp.float32)

        dt = jnp.float32

        @jax.jit
        def run(qq, ee):
            return pl.pallas_call(
                kern,
                grid=(N // tile,),
                in_specs=[
                    pl.BlockSpec((B, D), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, D), lambda j: (j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, 128), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((B, (N // tile) * 128), dt),
            )(qq, ee)
        return run

    for tile in (2048, 4096, 8192):
        for mode in ("rawmax", "pack"):
            try:
                fn = make_probe(mode, tile)
                qps, ms, _ = timed(lambda: fn(q, emb))
                RESULTS[f"probe_{mode}_t{tile}"] = {
                    "ms": round(ms, 2), "qps": round(qps, 1)}
                log(f"probe {mode} tile={tile}: {ms:.2f} ms ({qps:,.0f} qps)")
            except Exception as e:
                RESULTS[f"probe_{mode}_t{tile}"] = {"error": repr(e)[:200]}
                log(f"probe {mode} tile={tile} FAILED: {e!r}")

    # ---- full binned path with the approx_max_k finish ------------------
    ev, es = quant_ops.quantize_rows_device(emb_f32)
    qv, qs = quant_ops.quantize_rows_device(q)
    np.asarray(qs)

    for tile in (2048, 4096, 8192):
        try:
            qps, ms, ids = timed(
                lambda: pk.binned_topk(q, emb, valid, K, tile=tile))
            rec = recall_of(ids)
            RESULTS[f"binned_bf16_t{tile}"] = {
                "qps": round(qps, 1), "ms": round(ms, 2),
                "recall": round(rec, 4)}
            log(f"binned bf16 t={tile}: {qps:,.0f} qps {ms:.2f} ms "
                f"recall {rec:.4f}")
        except Exception as e:
            RESULTS[f"binned_bf16_t{tile}"] = {"error": repr(e)[:200]}
            log(f"binned bf16 t={tile} FAILED: {e!r}")

    def int8_binned(tile):
        s1, c1 = pk.binned_topk_int8(qv, qs, ev, es, valid, K, tile=tile)
        return pk._exact_rescore(q, emb, s1, c1, K)

    for tile in (2048, 4096):
        try:
            qps, ms, ids = timed(lambda: int8_binned(tile))
            rec = recall_of(ids)
            RESULTS[f"binned_int8_t{tile}"] = {
                "qps": round(qps, 1), "ms": round(ms, 2),
                "recall": round(rec, 4)}
            log(f"binned int8 t={tile}: {qps:,.0f} qps {ms:.2f} ms "
                f"recall {rec:.4f}")
        except Exception as e:
            RESULTS[f"binned_int8_t{tile}"] = {"error": repr(e)[:200]}
            log(f"binned int8 t={tile} FAILED: {e!r}")

    # small batch
    try:
        qps, ms, _ = timed(
            lambda: pk.binned_topk(q[:8], emb, valid, K, tile=4096),
            batch=8)
        RESULTS["binned_bf16_b8"] = {"qps": round(qps, 1),
                                     "ms": round(ms, 2)}
        log(f"binned bf16 b8 t4096: {qps:,.0f} qps {ms:.2f} ms")
    except Exception as e:
        log(f"b8 FAILED: {e!r}")

    del emb, emb_f32, ev, es, exact_i

    # ---- PQ 4M contract: host-assembled corpus --------------------------
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

        def rec4(ids_np):
            return float(np.mean([
                len(set(ids_np[i].tolist()) & set(exact4_np[i].tolist())) / K
                for i in range(ids_np.shape[0])]))

        tb = time.time()
        pq4 = pq_ops.PQIndex.build(emb4, np.ones(N4, bool))
        build_s = time.time() - tb
        qps, ms, ids = timed(lambda: pq4.search_device(q4, K), iters=2)
        adc_recall = rec4(ids)

        def pq4_rescored():
            s1, c1 = pq4.search_device(q4, 40)
            return pk._exact_rescore(q4, emb4, s1, c1, K)
        qps_r, _, ids_r = timed(pq4_rescored, iters=2)
        res_recall = rec4(ids_r)
        # host-rescore variant (the true capacity tier: rows NOT on chip)
        _, ids_h = pq4.search(np.asarray(q4), K, rescore_rows=host)
        host_recall = rec4(ids_h)
        code_bytes = pq4.memory_bytes()
        budget = 1_048_576 * D * 2
        RESULTS["pq_4m_contract"] = {
            "build_s": round(build_s, 1),
            "adc_qps": round(qps, 1), "adc_ms": round(ms, 1),
            "adc_recall": round(adc_recall, 4),
            "rescored_recall": round(res_recall, 4),
            "host_rescore_recall": round(host_recall, 4),
            "code_bytes": code_bytes, "bf16_1m_budget": budget,
            "under_budget": bool(code_bytes <= budget)}
        log(f"pq 4M: build {build_s:.0f}s adc {qps:,.0f} qps ({ms:.0f} ms) "
            f"recall {adc_recall:.4f} | dev-rescore {res_recall:.4f} | "
            f"host-rescore {host_recall:.4f} | codes {code_bytes/1e9:.2f} GB"
            f" <= {budget/1e9:.2f} GB: {code_bytes <= budget}")
    except Exception as e:
        RESULTS["pq_4m_contract"] = {"error": repr(e)[:300]}
        log(f"pq 4M FAILED: {e!r}")

    RESULTS["total_s"] = round(time.time() - t0, 1)
    with open("/root/repo/R2_TPU_RESULTS3.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    log("ALL DONE")


if __name__ == "__main__":
    main()
