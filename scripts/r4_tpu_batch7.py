"""Round-4 TPU batch #7: sharded column-layout fix verification.

  S7 sharded int4 fp-rescore device loop + trace AFTER forcing
     major_to_minor=(0,1) on the sharded [N,1] columns (batch 5 trace:
     %copy.11 3.4 ms + %copy.12 1.1 ms of a ~7 ms call were relayout
     copies of scol/vcol). Expect them gone and qps 36k -> 40k+.
  V7 library-default Int4View fp-rescore (hoistq now the default
     selection) — the un-monkeypatched end-to-end number.

Progress -> /tmp/r4_progress7.log, results -> /root/repo/R4_TPU_RESULTS7.json.
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r4_progress7.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/root/repo/R4_TPU_RESULTS7.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


N1M = 1 << 20
DIM = 768
K = 10

from r4_tpu_batch1 import _gen_corpus  # noqa: E402


def phase_s7():
    import jax
    import jax.numpy as jnp
    from lattice_tpu.parallel.sharded_index import ShardedQuantizedIndex
    from lattice_tpu.utils.tracing import categorize_device_trace

    # drain first
    float(jnp.sum(jnp.zeros((8,), jnp.float32)))
    log("S7: building sharded int4 fp-rescore (1-device mesh)")
    emb, q = _gen_corpus(N1M, seed=6)
    emb_np = np.asarray(emb)
    del emb
    gc.collect()
    idx = ShardedQuantizedIndex(emb_np, np.ones(N1M, bool), bits=4,
                                keep_full_precision=True)
    del emb_np
    gc.collect()
    qd = jnp.asarray(np.asarray(q))
    RESULTS["col_format_active"] = idx._col_format is not None

    s_d, i_d = idx.search_device(qd, K)
    np.asarray(i_d)  # warm + drain
    t0 = time.perf_counter()
    for _ in range(12):
        s_d, i_d = idx.search_device(qd, K)
    np.asarray(i_d)
    dt = (time.perf_counter() - t0) / 12
    RESULTS["sharded_int4_fp_qps_device"] = round(256 / dt, 1)
    log(f"S7 fp-rescore device loop: {256/dt:.0f} qps")
    save()

    with jax.profiler.trace("/tmp/r4_trace_sharded7"):
        for _ in range(4):
            s_d, i_d = idx.search_device(qd, K)
        np.asarray(i_d)
    RESULTS["trace_sharded_device"] = categorize_device_trace(
        "/tmp/r4_trace_sharded7", top=10)
    save()

    # parity: device results must match the host-wrapper route (which
    # batch 5 measured separately) — same compiled fn, one call each
    s_h, i_h = idx.search(np.asarray(q)[:8], K)
    s_d2, i_d2 = idx.search_device(qd[:8], K)
    RESULTS["sharded_device_matches_host"] = bool(
        (np.asarray(i_d2) == i_h).all())
    log(f"S7 device==host: {RESULTS['sharded_device_matches_host']}")
    del idx
    gc.collect()
    save()


def phase_v7():
    import jax.numpy as jnp
    from lattice_tpu.ops.pallas_topk import valid_col
    from lattice_tpu.ops.quant import Int4View

    emb, q = _gen_corpus(N1M, seed=1)
    view = Int4View(emb.astype(jnp.float32))
    fp = jnp.asarray(emb, jnp.bfloat16)
    vcol = valid_col(jnp.ones((N1M,), bool))
    del emb
    gc.collect()
    qd = jnp.asarray(q)
    s, i = view.search_device(qd, vcol, K, full_precision=fp)
    np.asarray(i)
    t0 = time.perf_counter()
    for _ in range(12):
        out = view.search_device(qd, vcol, K, full_precision=fp)
    np.asarray(out[1])
    RESULTS["int4_view_fp_qps_default"] = round(
        256 * 12 / (time.perf_counter() - t0), 1)
    log(f"V7 view fp (library default): "
        f"{RESULTS['int4_view_fp_qps_default']} qps")
    s, i = view.search_device(qd, vcol, K)
    np.asarray(i)
    t0 = time.perf_counter()
    for _ in range(12):
        out = view.search_device(qd, vcol, K)
    np.asarray(out[1])
    RESULTS["int4_view_qps_default"] = round(
        256 * 12 / (time.perf_counter() - t0), 1)
    log(f"V7 view capacity (library default): "
        f"{RESULTS['int4_view_qps_default']} qps")
    del view, fp
    gc.collect()
    save()


def main():
    import jax
    log(f"devices: {jax.devices()}")
    for name, fn in (("S7", phase_s7), ("V7", phase_v7)):
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
