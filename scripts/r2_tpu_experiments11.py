"""Round-2 TPU batch #11: compiled shard_map+Pallas on real hardware.

The per-shard Pallas serving path is interpret-tested on the CPU mesh;
this validates the COMPILED lowering on the actual chip via a 1-device
mesh (same shard_map + pallas_call composition, rows_per_shard = N).
Covers bf16, int8, int4 shards + O(delta) updates + masks.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS: dict = {}
OUT = "/root/repo/R2_TPU_RESULTS11.json"


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main() -> None:
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    dev = jax.devices()[0]
    log(f"attached: {dev}")
    RESULTS["device"] = str(dev)

    from lattice_tpu.ops import topk as topk_ops
    from lattice_tpu.parallel.mesh import make_mesh
    from lattice_tpu.parallel.sharded_index import (ShardedIndex,
                                                    ShardedQuantizedIndex)

    N, D, K = 131_072, 768, 10
    rng = np.random.default_rng(0)
    emb = topk_ops.l2_normalize(
        rng.normal(size=(N, D)).astype(np.float32))
    valid = np.ones(N, bool)
    q = topk_ops.l2_normalize(rng.normal(size=(64, D)).astype(np.float32))
    _, o_idx = topk_ops.topk_oracle(q[:8], emb, valid, K)
    mesh = make_mesh(1)

    def recall(ids):
        return float(np.mean([
            len(set(ids[i].tolist()) & set(o_idx[i].tolist())) / K
            for i in range(8)]))

    # bf16 shards through the compiled binned kernel
    try:
        idx = ShardedIndex(emb, valid.copy(), mesh=mesh)
        t1 = time.perf_counter()
        s, ids = idx.search(q, K)
        ms = (time.perf_counter() - t1) * 1000
        rec = recall(ids)
        RESULTS["sharded_bf16"] = {"recall": round(rec, 4),
                                   "first_call_ms": round(ms, 1)}
        log(f"sharded bf16 (compiled pallas-in-shard_map): recall {rec:.4f}")
        fresh = topk_ops.l2_normalize(rng.normal(size=(1, D)))
        assert idx.update_rows(fresh.astype(np.float32), np.array([77]))
        _, ids2 = idx.search(fresh, k=1)
        assert ids2[0, 0] == 77, ids2
        mask = np.zeros(N, bool)
        mask[:1000] = True
        _, idm = idx.search(q[:4], k=5, mask=mask)
        assert idm.max() < 1000
        RESULTS["sharded_bf16"]["updates_and_masks"] = "ok"
        log("bf16 updates + masks ok")
        del idx
    except Exception as e:
        RESULTS["sharded_bf16"] = {"error": repr(e)[:500]}
        log(f"sharded bf16 FAILED: {repr(e)[:200]}")

    for bits in (8, 4):
        try:
            qx = ShardedQuantizedIndex(emb, valid.copy(), mesh=mesh,
                                       bits=bits)
            s, ids = qx.search(q, K)
            rec = recall(ids)
            RESULTS[f"sharded_int{bits}"] = {"recall": round(rec, 4)}
            log(f"sharded int{bits} (compiled): recall {rec:.4f}")
            fresh = topk_ops.l2_normalize(rng.normal(size=(1, D)))
            assert qx.update_rows(fresh.astype(np.float32), np.array([55]))
            _, ids2 = qx.search(fresh, k=1)
            assert ids2[0, 0] == 55, ids2
            RESULTS[f"sharded_int{bits}"]["updates"] = "ok"
            del qx
        except Exception as e:
            RESULTS[f"sharded_int{bits}"] = {"error": repr(e)[:500]}
            log(f"sharded int{bits} FAILED: {repr(e)[:200]}")

    RESULTS["total_s"] = round(time.time() - t0, 1)
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)
    log("ALL DONE")


if __name__ == "__main__":
    main()
