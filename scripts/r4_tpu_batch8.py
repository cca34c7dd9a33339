"""Round-4 TPU batch #8: flat-tier default A/B — int8 vs int4 two-stage.

  D8 ChunkStore.search_device at 1M x 768 B=256 k=10, method forced to
     "quantized" (int8 first stage + exact bf16 rescore, the current
     auto default) vs "int4" (packed-nibble hoistq scan + exact bf16
     rescore), in BOTH bench regimes (isotropic spread=0.35 = the
     headline; clustered spread=0.06 = the near-tie regime where raw
     int4 ordering caps at ~0.80). Recall vs the exact bf16-storage
     oracle decides whether the auto plan should flip to int4
     (R4_TPU_RESULTS7: view-level int4 fp = 50.4k vs int8's 46.6k).

Progress -> /tmp/r4_progress8.log, results -> /root/repo/R4_TPU_RESULTS8.json.
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
PROGRESS = open("/tmp/r4_progress8.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/root/repo/R4_TPU_RESULTS8.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


N1M = 1 << 20
DIM = 768
K = 10
BATCH = 256
N_CLUSTERS = 1024


def _gen(spread, seed):
    import jax
    import jax.numpy as jnp

    key = jax.random.PRNGKey(seed)
    kc, ka, kn, kq = jax.random.split(key, 4)

    @jax.jit
    def gen_centers(k):
        x = jax.random.normal(k, (N_CLUSTERS, DIM), dtype=jnp.float32)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen_block(centers, ka, kn, n):
        assign = jax.random.randint(ka, (n,), 0, N_CLUSTERS)
        onehot = jax.nn.one_hot(assign, N_CLUSTERS, dtype=jnp.bfloat16)
        base = jax.lax.dot_general(
            onehot, centers.astype(jnp.bfloat16),
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        x = base + spread * jax.random.normal(kn, (n, DIM),
                                              dtype=jnp.float32)
        return x / jnp.maximum(
            jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    centers = gen_centers(kc)
    parts = []
    block = 1 << 17
    for i in range(0, N1M, block):
        parts.append(gen_block(centers, jax.random.fold_in(ka, i),
                               jax.random.fold_in(kn, i), block))
    corpus = jnp.concatenate(parts)
    del parts
    q = gen_block(centers, jax.random.fold_in(kq, 1),
                  jax.random.fold_in(kq, 2), BATCH)
    return corpus, q


def phase_d8():
    import jax.numpy as jnp
    from lattice_tpu.index.chunk_store import ChunkStore
    from lattice_tpu.ops import topk as topk_ops

    # drain first
    float(jnp.sum(jnp.zeros((8,), jnp.float32)))

    for regime, spread in (("iso", 0.35), ("clu", 0.06)):
        log(f"D8 {regime}: generating 1M (spread {spread})")
        corpus_f32, q = _gen(spread, seed=0)
        emb = corpus_f32.astype(jnp.bfloat16)
        valid = jnp.ones((N1M,), bool)
        _, exact_i = topk_ops.flat_topk(q, corpus_f32, valid, K)
        exact_i = np.asarray(exact_i)
        del corpus_f32
        gc.collect()
        store = ChunkStore.from_device_arrays(emb, valid)
        for method in ("quantized", "int4"):
            s, i = store.search_device(q, K, method=method)
            np.asarray(i)  # warm + drain
            t0 = time.perf_counter()
            for _ in range(12):
                s, i = store.search_device(q, K, method=method)
            ids = np.asarray(i)
            dt = (time.perf_counter() - t0) / 12
            rec = float(np.mean([
                len(set(ids[r].tolist()) & set(exact_i[r].tolist())) / K
                for r in range(BATCH)]))
            RESULTS[f"{regime}_{method}_qps"] = round(BATCH / dt, 1)
            RESULTS[f"{regime}_{method}_recall"] = round(rec, 4)
            log(f"D8 {regime} {method}: {BATCH/dt:.0f} qps, "
                f"recall {rec:.4f}")
            save()
        del store, emb, q
        gc.collect()


def main():
    import jax
    log(f"devices: {jax.devices()}")
    try:
        phase_d8()
    except Exception as exc:
        import traceback
        log(f"phase D8 FAILED: {exc!r}\n" + traceback.format_exc(limit=6))
        RESULTS["phase_D8_error"] = repr(exc)[:300]
        save()
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
