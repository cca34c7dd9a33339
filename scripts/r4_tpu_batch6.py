"""Round-4 TPU batch #6: the hoistq int4 selection chain A/B.

  Q6 1M x 768 B=256: mul vs hoistq at tile 4096 AND 2048 (hoistq =
     fma's hoisted scale + in-fma bias at mul's VMEM footprint — the
     additive-mask bias slab is what stranded fma at tile 2048).
     Winner agreement vs mul, then the 4M capacity tier and the served
     1M view with the winning chain. VERDICT #6 target: <= 5.0 ms.

Progress -> /tmp/r4_progress6.log, results -> /root/repo/R4_TPU_RESULTS6.json.
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r4_progress6.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/root/repo/R4_TPU_RESULTS6.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


N1M = 1 << 20
DIM = 768
K = 10

from r4_tpu_batch1 import _gen_corpus  # noqa: E402


def phase_q6():
    import jax.numpy as jnp
    from lattice_tpu.ops.pallas_topk import (binned_topk_int4,
                                             pick_tile_packed, valid_col)
    from lattice_tpu.ops.quant import Int4View, _l2n, quantize_rows_device

    emb, q = _gen_corpus(N1M, seed=1)
    log("Q6: quantizing 1M to int4")
    view = Int4View(emb.astype(jnp.float32))
    vcol = valid_col(jnp.ones((N1M,), bool))
    fp = jnp.asarray(emb, jnp.bfloat16)
    del emb
    gc.collect()
    qf = _l2n(q)
    qv, qs = quantize_rows_device(qf)
    qv, qs = jnp.asarray(qv), jnp.asarray(qs)

    # drain the queue before any timed loop
    np.asarray(binned_topk_int4(qv, qs, view.values, view._scales_col,
                                vcol, 16, tile=2048, selection="mul")[1])

    outs = {}
    for tile in (4096, 2048):
        for sel in ("mul", "hoistq"):
            key = f"int4_sel_{sel}_t{tile}"
            try:
                fn = lambda: binned_topk_int4(  # noqa: E731
                    qv, qs, view.values, view._scales_col, vcol,
                    16, tile=tile, selection=sel)
                np.asarray(fn()[1])
                t0 = time.perf_counter()
                for _ in range(12):
                    out = fn()
                ids = np.asarray(out[1])
                dt = (time.perf_counter() - t0) / 12
                outs[(sel, tile)] = ids
                RESULTS[f"{key}_ms"] = round(dt * 1e3, 3)
                RESULTS[f"{key}_qps"] = round(256 / dt, 1)
                log(f"Q6 {key}: {dt*1e3:.2f} ms/call")
            except Exception as exc:
                RESULTS[f"{key}_error"] = repr(exc)[:200]
                log(f"Q6 {key} FAILED: {exc!r}")
            save()
            gc.collect()
    for tile in (4096, 2048):
        if ("mul", tile) in outs and ("hoistq", tile) in outs:
            a, b = outs[("mul", tile)], outs[("hoistq", tile)]
            agree = np.mean([len(set(a[i]) & set(b[i])) / 16
                             for i in range(256)])
            RESULTS[f"int4_sel_agreement_t{tile}"] = round(float(agree), 4)
            log(f"Q6 agreement t{tile}: {agree:.4f}")
    save()

    # served view (fp-rescore speed config) with each chain, full path
    from lattice_tpu.ops import quant as quant_mod
    import lattice_tpu.ops.pallas_topk as pt
    orig = binned_topk_int4
    for sel in ("mul", "hoistq"):
        import functools
        wrapped = functools.partial(orig, selection=sel)
        pt.binned_topk_int4 = wrapped
        if hasattr(quant_mod._fused_two_stage, "clear_cache"):
            quant_mod._fused_two_stage.clear_cache()
        try:
            s, i = view.search_device(q, vcol, K, full_precision=fp)
            np.asarray(i)
            t0 = time.perf_counter()
            for _ in range(12):
                out = view.search_device(q, vcol, K, full_precision=fp)
            np.asarray(out[1])
            qps = 256 * 12 / (time.perf_counter() - t0)
            RESULTS[f"int4_view_fp_qps_{sel}"] = round(qps, 1)
            log(f"Q6 view fp ({sel}): {qps:.0f} qps")
        except Exception as exc:
            RESULTS[f"int4_view_fp_{sel}_error"] = repr(exc)[:200]
            log(f"Q6 view fp ({sel}) FAILED: {exc!r}")
        finally:
            pt.binned_topk_int4 = orig
            if hasattr(quant_mod._fused_two_stage, "clear_cache"):
                quant_mod._fused_two_stage.clear_cache()
        save()
    del view, fp
    gc.collect()

    # 4M capacity tier with the winning chain
    log("Q6: building 4M int4")
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
    vcol4 = valid_col(jnp.ones((4 * N1M,), bool))
    tile4 = pick_tile_packed(4 * N1M, 256, k=16)
    for sel in ("mul", "hoistq"):
        try:
            fn = lambda: binned_topk_int4(  # noqa: E731
                qv, qs, view4.values, view4._scales_col, vcol4,
                16, tile=tile4, selection=sel)
            np.asarray(fn()[1])
            t0 = time.perf_counter()
            for _ in range(8):
                out = fn()
            np.asarray(out[1])
            dt = (time.perf_counter() - t0) / 8
            RESULTS[f"int4_4m_{sel}_ms"] = round(dt * 1e3, 3)
            RESULTS[f"int4_4m_{sel}_qps"] = round(256 / dt, 1)
            log(f"Q6 4M {sel}: {dt*1e3:.2f} ms/call")
        except Exception as exc:
            RESULTS[f"int4_4m_{sel}_error"] = repr(exc)[:200]
            log(f"Q6 4M {sel} FAILED: {exc!r}")
        save()


def main():
    import jax
    log(f"devices: {jax.devices()}")
    try:
        phase_q6()
    except Exception as exc:
        import traceback
        log(f"phase Q6 FAILED: {exc!r}\n" + traceback.format_exc(limit=6))
        RESULTS["phase_Q6_error"] = repr(exc)[:300]
        save()
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
