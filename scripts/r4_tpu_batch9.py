"""Round-4 TPU batch #9: stability re-run of the int8/int4 dispatcher A/B.

Batch 8 measured clustered int8 at 16.5k qps vs int4's 24.9k on
IDENTICAL shapes — data-dependent timing on a fixed compute graph is
suspicious. Re-run both regimes with method order SWAPPED and two
passes per method; also log the flat bf16 'pallas' plan as a control.

Progress -> /tmp/r4_progress9.log, results -> /root/repo/R4_TPU_RESULTS9.json.
"""

import gc
import json
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r4_progress9.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/root/repo/R4_TPU_RESULTS9.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


N1M = 1 << 20
BATCH = 256
K = 10

from r4_tpu_batch8 import _gen  # noqa: E402


def phase_d9():
    import jax.numpy as jnp
    from lattice_tpu.index.chunk_store import ChunkStore
    from lattice_tpu.ops import topk as topk_ops

    float(jnp.sum(jnp.zeros((8,), jnp.float32)))  # drain

    for regime, spread in (("clu", 0.06), ("iso", 0.35)):
        log(f"D9 {regime}: generating 1M (spread {spread})")
        corpus_f32, q = _gen(spread, seed=0)
        emb = corpus_f32.astype(jnp.bfloat16)
        valid = jnp.ones((N1M,), bool)
        _, exact_i = topk_ops.flat_topk(q, corpus_f32, valid, K)
        exact_i = np.asarray(exact_i)
        del corpus_f32
        gc.collect()
        store = ChunkStore.from_device_arrays(emb, valid)
        for rep in (1, 2):
            for method in ("int4", "quantized", "pallas"):
                s, i = store.search_device(q, K, method=method)
                np.asarray(i)  # warm + drain
                t0 = time.perf_counter()
                for _ in range(12):
                    s, i = store.search_device(q, K, method=method)
                ids = np.asarray(i)
                dt = (time.perf_counter() - t0) / 12
                rec = float(np.mean([
                    len(set(ids[r].tolist())
                        & set(exact_i[r].tolist())) / K
                    for r in range(BATCH)]))
                RESULTS[f"{regime}_{method}_qps_r{rep}"] = round(
                    BATCH / dt, 1)
                RESULTS[f"{regime}_{method}_recall_r{rep}"] = round(rec, 4)
                log(f"D9 {regime} {method} r{rep}: {BATCH/dt:.0f} qps, "
                    f"recall {rec:.4f}")
                save()
        del store, emb, q
        gc.collect()


def main():
    import jax
    log(f"devices: {jax.devices()}")
    try:
        phase_d9()
    except Exception as exc:
        import traceback
        log(f"phase D9 FAILED: {exc!r}\n" + traceback.format_exc(limit=6))
        RESULTS["phase_D9_error"] = repr(exc)[:300]
        save()
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
