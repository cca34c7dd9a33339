"""Round-4 TPU batch #10: int8 hoistq A/B (the serving default's chain).

  Q10 1M x 768 B=256 k=16: int8 mul vs hoistq at the serving tile,
     kernel-level (device-resident, 12-iter drained loops) + the full
     QuantizedView two-stage (the dispatcher default) with each chain.
     The int8 scan is closer to DMA-bound than int4 (2x bytes), so the
     expected win is smaller than int4's 2-5% — measure, then flip the
     default only on a clear win.

Progress -> /tmp/r4_progress10.log, results -> /root/repo/R4_TPU_RESULTS10.json.
"""

import functools
import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r4_progress10.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/root/repo/R4_TPU_RESULTS10.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


N1M = 1 << 20
DIM = 768
K = 10

from r4_tpu_batch1 import _gen_corpus  # noqa: E402


def phase_q10():
    import jax.numpy as jnp
    from lattice_tpu.ops.pallas_topk import (binned_topk_int8, pick_tile,
                                             valid_col)
    from lattice_tpu.ops.quant import (QuantizedView, _l2n,
                                       quantize_rows_device)

    import jax
    float(jnp.sum(jnp.zeros((8,), jnp.float32)))  # drain

    emb, q = _gen_corpus(N1M, seed=1)
    view = QuantizedView(emb.astype(jnp.float32))
    fp = jnp.asarray(emb, jnp.bfloat16)
    vcol = valid_col(jnp.ones((N1M,), bool))
    del emb
    gc.collect()
    qf = _l2n(q)
    qv, qs = quantize_rows_device(qf)
    qv, qs = jnp.asarray(qv), jnp.asarray(qs)
    tile = pick_tile(N1M, 256, k=16)
    log(f"Q10 tile: {tile}")

    outs = {}
    for sel in ("mul", "hoistq"):
        try:
            fn = lambda: binned_topk_int8(  # noqa: E731
                qv, qs, view.values, view._scales_col, vcol,
                16, tile=tile, selection=sel)
            np.asarray(fn()[1])
            t0 = time.perf_counter()
            for _ in range(12):
                out = fn()
            ids = np.asarray(out[1])
            dt = (time.perf_counter() - t0) / 12
            outs[sel] = ids
            RESULTS[f"int8_sel_{sel}_ms"] = round(dt * 1e3, 3)
            RESULTS[f"int8_sel_{sel}_qps"] = round(256 / dt, 1)
            log(f"Q10 int8 {sel}: {dt*1e3:.2f} ms/call")
        except Exception as exc:
            RESULTS[f"int8_sel_{sel}_error"] = repr(exc)[:200]
            log(f"Q10 int8 {sel} FAILED: {exc!r}")
        save()
    if len(outs) == 2:
        agree = np.mean([
            len(set(outs["mul"][i]) & set(outs["hoistq"][i])) / 16
            for i in range(256)])
        RESULTS["int8_sel_agreement"] = round(float(agree), 4)
        log(f"Q10 agreement: {agree:.4f}")
        save()

    # full two-stage through the view (the dispatcher default path)
    from lattice_tpu.ops import quant as quant_mod
    import lattice_tpu.ops.pallas_topk as pt
    orig = binned_topk_int8
    for sel in ("mul", "hoistq"):
        wrapped = functools.partial(orig, selection=sel)
        pt.binned_topk_int8 = wrapped
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
            RESULTS[f"int8_view_fp_qps_{sel}"] = round(qps, 1)
            log(f"Q10 view fp ({sel}): {qps:.0f} qps")
        except Exception as exc:
            RESULTS[f"int8_view_fp_{sel}_error"] = repr(exc)[:200]
            log(f"Q10 view fp ({sel}) FAILED: {exc!r}")
        finally:
            pt.binned_topk_int8 = orig
            if hasattr(quant_mod._fused_two_stage, "clear_cache"):
                quant_mod._fused_two_stage.clear_cache()
        save()


def phase_b10():
    """B>=512 auto-chunk routing: recall + qps through the dispatcher
    (search_device now serves >=512-query calls as ONE scanned
    execution over 256-chunks — verify the route keeps exactness and
    lands near the 93k pipelined ceiling)."""
    import jax.numpy as jnp
    from lattice_tpu.index.chunk_store import ChunkStore
    from lattice_tpu.ops import topk as topk_ops

    emb, q = _gen_corpus(N1M, seed=3)
    store = ChunkStore.from_device_arrays(
        emb.astype(jnp.bfloat16), jnp.ones((N1M,), bool))
    qb = jnp.concatenate([jnp.asarray(q)] * 4)          # [1024, d]
    _, exact_i = topk_ops.flat_topk(jnp.asarray(q), emb,
                                    jnp.ones((N1M,), bool), K)
    exact_i = np.asarray(exact_i)
    del emb
    gc.collect()
    for b in (512, 1024):
        qx = qb[:b]
        s, i = store.search_device(qx, K)
        ids = np.asarray(i)  # warm + drain
        t0 = time.perf_counter()
        for _ in range(12):
            s, i = store.search_device(qx, K)
        ids = np.asarray(i)
        dt = (time.perf_counter() - t0) / 12
        rec = float(np.mean([
            len(set(ids[r].tolist()) & set(exact_i[r % 256].tolist())) / K
            for r in range(b)]))
        RESULTS[f"b{b}_routed_qps"] = round(b / dt, 1)
        RESULTS[f"b{b}_routed_recall"] = round(rec, 4)
        log(f"B10 b{b}: {b/dt:.0f} qps, recall {rec:.4f}")
        save()


def main():
    import jax
    log(f"devices: {jax.devices()}")
    RESULTS["devices"] = str(jax.devices())  # provenance (chip vs CPU)
    for name, fn in (("Q10", phase_q10), ("B10", phase_b10)):
        try:
            fn()
        except Exception as exc:
            import traceback
            log(f"phase {name} FAILED: {exc!r}\n"
                + traceback.format_exc(limit=6))
            RESULTS[f"phase_{name}_error"] = repr(exc)[:300]
            save()
        finally:
            # store/view closure caches form reference cycles; without a
            # collect the dead 1M-scale buffers stay resident and the
            # next phase OOMs the relay process (CLAUDE.md r4 log)
            gc.collect()
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
