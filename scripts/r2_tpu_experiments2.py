"""Round-2 TPU batch #2: fixed binned kernels, IVF regime calibration,
PQ 4M contract with a memory-bounded oracle, xprof read.

Learnings encoded from batch #1 (R2_TPU_RESULTS.json):
- binned kernels needed 128-lane output blocks (fixed in pallas_topk);
- the 1M bench generator at spread=0.35/d=768 is effectively ISOTROPIC
  (noise norm 9.7x the center norm) — IVF self-measures ~0.13 there and
  the dispatcher correctly refuses it; r1's 0.9953 headline recall was
  the pallas_refined kernel. This batch calibrates spreads where real
  cluster structure exists so the IVF tier is benched in ITS regime;
- flat_topk's [B, N] oracle OOMs at 4M alongside the corpus: use the
  fused scan (exact at bf16 storage) as the oracle instead.
"""

from __future__ import annotations

import functools
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))

RESULTS: dict = {}


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    dev = jax.devices()[0]
    log(f"attached: {dev} ({dev.platform})")
    RESULTS["device"] = str(dev)

    from lattice_tpu.ops import topk as topk_ops
    from lattice_tpu.ops import pallas_topk as pk
    from lattice_tpu.ops import quant as quant_ops
    from lattice_tpu.ops import pq as pq_ops
    from lattice_tpu.ops.ivf import IVFIndex

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

    def make_corpus(n, spread):
        centers = gen_centers(kc, N_CLUSTERS)
        parts = []
        for i in range(0, n, 131_072):
            parts.append(gen_block(centers, jax.random.fold_in(ka, i),
                                   jax.random.fold_in(kn, i),
                                   min(131_072, n - i),
                                   spread).astype(jnp.bfloat16))
        return centers, (jnp.concatenate(parts) if len(parts) > 1
                         else parts[0])

    def timed(fn, iters=8, batch=B):
        out = fn()
        np.asarray(out[1])
        t = time.perf_counter()
        for _ in range(iters):
            out = fn()
        ids = np.asarray(out[1])
        dt = time.perf_counter() - t
        return batch * iters / dt, dt / iters * 1000.0, ids

    # ================= part 1: isotropic 1M (the flat-scan regime) =====
    centers, emb = make_corpus(N, 0.35)
    emb_f32 = emb.astype(jnp.float32)
    valid = jnp.ones((N,), bool)
    q = gen_block(centers, jax.random.fold_in(kq, 1),
                  jax.random.fold_in(kq, 2), B, 0.35)
    np.asarray(q)
    _, exact_i = topk_ops.flat_topk(q, emb_f32, valid, K)
    exact_np = np.asarray(exact_i)
    log(f"1M isotropic corpus + oracle ready ({time.time()-t0:.0f}s)")

    def recall_of(ids_np, oracle):
        return float(np.mean([
            len(set(ids_np[i].tolist()) & set(oracle[i].tolist())) / K
            for i in range(ids_np.shape[0])]))

    tile = 2048
    ev, es = quant_ops.quantize_rows_device(emb_f32)
    qv, qs = quant_ops.quantize_rows_device(q)
    np.asarray(qs)

    def int8_binned():
        s1, c1 = pk.binned_topk_int8(qv, qs, ev, es, valid, K, tile=tile)
        return pk._exact_rescore(q, emb, s1, c1, K)

    for name, fn, iters, batch in [
        ("binned_bf16", lambda: pk.binned_topk(q, emb, valid, K, tile=tile),
         8, B),
        ("int8_binned", int8_binned, 8, B),
        ("binned_bf16_b8",
         lambda: pk.binned_topk(q[:8], emb, valid, K, tile=tile), 8, 8),
    ]:
        try:
            qps, ms, ids = timed(fn, iters=iters, batch=batch)
            rec = recall_of(ids, exact_np) if batch == B else None
            RESULTS[name] = {"qps": round(qps, 1),
                             "ms_per_batch": round(ms, 2),
                             "recall": rec if rec is None else round(rec, 4)}
            log(f"1 {name}: {qps:,.0f} qps {ms:.2f} ms recall {rec}")
        except Exception as e:
            RESULTS[name] = {"error": repr(e)[:300]}
            log(f"1 {name} FAILED: {e!r}")

    # xprof capture + read of the binned scan
    try:
        import os
        trace_dir = "/tmp/xprof_r2b"
        os.system(f"rm -rf {trace_dir}")
        with jax.profiler.trace(trace_dir):
            for _ in range(4):
                out = pk.binned_topk(q, emb, valid, K, tile=tile)
            np.asarray(out[1])
        from r2_tpu_experiments import summarize_xplane
        summary = summarize_xplane(trace_dir)
        RESULTS["xprof_binned"] = summary
        log("xprof top ops:")
        for row in summary.get("top_ops", [])[:10]:
            log(f"    {row}")
    except Exception as e:
        RESULTS["xprof_binned"] = {"error": repr(e)[:300]}
        log(f"xprof FAILED: {e!r}")

    # IVF on the isotropic corpus: verify the recall gate refuses it and
    # the fixed layout no longer widens S past natural
    try:
        ivf = IVFIndex.build_from_device(emb, np.ones(N, bool), max_load=2.0)
        rec8 = ivf.measure_recall(emb_f32, valid, nprobe=8)
        RESULTS["ivf_isotropic"] = {"S": ivf.bucket_size,
                                    "self_recall8": round(rec8, 4)}
        log(f"1 ivf isotropic: S={ivf.bucket_size} recall {rec8:.4f} "
            f"(gate must refuse)")
        del ivf
    except Exception as e:
        RESULTS["ivf_isotropic"] = {"error": repr(e)[:300]}
        log(f"1 ivf FAILED: {e!r}")

    del emb, emb_f32, ev, es, exact_i

    # ================= part 2: clustered 1M (the IVF regime) ===========
    for spread in (0.06, 0.03):
        try:
            centers, emb = make_corpus(N, spread)
            emb_f32 = emb.astype(jnp.float32)
            qc = gen_block(centers, jax.random.fold_in(kq, 3),
                           jax.random.fold_in(kq, 4), B, spread)
            _, exact_i = topk_ops.flat_topk(qc, emb_f32, valid, K)
            exact_np = np.asarray(exact_i)
            tb = time.time()
            ivf = IVFIndex.build_from_device(emb, np.ones(N, bool),
                                             max_load=2.0)
            build_s = time.time() - tb
            rec8 = ivf.measure_recall(emb_f32, valid, nprobe=8)
            qps, ms, ids = timed(lambda: ivf.search_device(qc, K, nprobe=8))
            key_name = f"ivf_clustered_{spread}"
            RESULTS[key_name] = {
                "build_s": round(build_s, 1), "S": ivf.bucket_size,
                "self_recall8": round(rec8, 4),
                "query_recall8": round(recall_of(ids, exact_np), 4),
                "qps": round(qps, 1), "ms": round(ms, 2)}
            log(f"2 spread={spread}: S={ivf.bucket_size} build {build_s:.0f}s"
                f" recall {recall_of(ids, exact_np):.4f} {qps:,.0f} qps")
            # flat comparison on the same corpus
            qps_f, ms_f, ids_f = timed(
                lambda: pk.binned_topk(qc, emb, valid, K, tile=tile))
            RESULTS[key_name]["binned_flat_qps"] = round(qps_f, 1)
            RESULTS[key_name]["binned_flat_recall"] = round(
                recall_of(ids_f, exact_np), 4)
            log(f"2 spread={spread}: binned flat {qps_f:,.0f} qps "
                f"recall {recall_of(ids_f, exact_np):.4f}")
            del emb, emb_f32, ivf, exact_i
        except Exception as e:
            RESULTS[f"ivf_clustered_{spread}"] = {"error": repr(e)[:300]}
            log(f"2 spread={spread} FAILED: {e!r}")

    # ================= part 3: PQ at the 4M contract point =============
    try:
        N4 = 4 * 1024 * 1024
        centers4, emb4 = make_corpus(N4, 0.06)
        q4 = gen_block(centers4, jax.random.fold_in(kq, 7),
                       jax.random.fold_in(kq, 8), B, 0.06)
        valid4 = jnp.ones((N4,), bool)
        # oracle: the fused refined scan — exact at bf16 storage, [B,k]
        # memory (flat_topk's [B, N] slab OOMed here in batch #1)
        _, exact4 = pk.refined_topk(q4, emb4, valid4, K, tile=tile)
        exact4_np = np.asarray(exact4)
        log(f"3 4M corpus + fused oracle ready ({time.time()-t0:.0f}s)")
        tb = time.time()
        pq4 = pq_ops.PQIndex.build(emb4, np.ones(N4, bool))
        build_s = time.time() - tb
        qps, ms, ids = timed(lambda: pq4.search_device(q4, K), iters=2)
        adc_recall = recall_of(ids, exact4_np)

        def pq4_rescored():
            s1, c1 = pq4.search_device(q4, 40)
            return pk._exact_rescore(q4, emb4, s1, c1, K)
        qps_r, _, ids_r = timed(pq4_rescored, iters=2)
        res_recall = recall_of(ids_r, exact4_np)
        code_bytes = pq4.memory_bytes()
        budget = 1_048_576 * D * 2
        RESULTS["pq_4m_contract"] = {
            "build_s": round(build_s, 1),
            "adc_qps": round(qps, 1), "adc_ms": round(ms, 1),
            "adc_recall": round(adc_recall, 4),
            "rescored_qps": round(qps_r, 1),
            "rescored_recall": round(res_recall, 4),
            "code_bytes": code_bytes, "bf16_1m_budget": budget,
            "under_budget": bool(code_bytes <= budget)}
        log(f"3 pq 4M: build {build_s:.0f}s adc {qps:,.0f} qps ({ms:.0f} ms)"
            f" recall {adc_recall:.4f} | rescored {res_recall:.4f} | "
            f"codes {code_bytes/1e9:.2f} GB <= {budget/1e9:.2f} GB: "
            f"{code_bytes <= budget}")
    except Exception as e:
        RESULTS["pq_4m_contract"] = {"error": repr(e)[:300]}
        log(f"3 pq 4M FAILED: {e!r}")

    RESULTS["total_s"] = round(time.time() - t0, 1)
    with open("/root/repo/R2_TPU_RESULTS2.json", "w") as f:
        json.dump(RESULTS, f, indent=1)
    log("ALL DONE — results in R2_TPU_RESULTS2.json")


if __name__ == "__main__":
    main()
