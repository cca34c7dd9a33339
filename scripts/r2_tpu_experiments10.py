"""Round-2 TPU batch #10: encoder-throughput config sweep (BASELINE cfg 2).

bench.py measures the jitted 12-layer/768 UniXcoder forward at
B=32/len=512 (472 chunks/s). Larger batches should fill the MXU better;
this sweep picks the honest-best default. Also: 4M int4 through the
pipelined API (capacity tier + dispatch amortization together).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

RESULTS: dict = {}
OUT = "/root/repo/R2_TPU_RESULTS10.json"


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

    from lattice_tpu.models.unixcoder import UniXcoderConfig, UniXcoderModel

    model = UniXcoderModel(UniXcoderConfig())
    for batch, length in ((32, 512), (64, 512), (128, 512), (64, 256),
                          (128, 256), (256, 128)):
        try:
            ids = np.ones((batch, length), dtype=np.int32)
            mask = np.ones_like(ids)
            model.encode(ids, mask)  # compile
            iters = 4
            t1 = time.perf_counter()
            for _ in range(iters):
                out = model.encode(ids, mask)
            float(out[0, 0])
            cps = batch * iters / (time.perf_counter() - t1)
            RESULTS[f"encode_b{batch}_l{length}"] = {
                "chunks_per_s": round(cps, 1),
                "ms_per_batch": round(
                    (time.perf_counter() - t1) / iters * 1000, 1)}
            log(f"encode B={batch} L={length}: {cps:,.0f} chunks/s")
        except Exception as e:
            RESULTS[f"encode_b{batch}_l{length}"] = {"error": repr(e)[:200]}
            log(f"encode B={batch} L={length} FAILED: {repr(e)[:120]}")
        save()

    RESULTS["total_s"] = round(time.time() - t0, 1)
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
