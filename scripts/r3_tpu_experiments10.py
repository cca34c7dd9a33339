"""Round-3 TPU batch #10: fused-QKV encoder throughput A/B.

Progress -> /tmp/r3_progress10.log, results -> /tmp/r3_results10.json.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

RESULTS = {}
PROGRESS = open("/tmp/r3_progress10.log", "a")


def log(msg):
    PROGRESS.write(f"[{time.strftime('%H:%M:%S')}] {msg}\n")
    PROGRESS.flush()


def save():
    with open("/tmp/r3_results10.json", "w") as f:
        json.dump(RESULTS, f, indent=1, default=str)


def main():
    import jax

    from lattice_tpu.models.unixcoder import UniXcoderConfig, UniXcoderModel

    log(f"devices: {jax.devices()}")
    B, L = 128, 512
    rng = np.random.default_rng(0)
    ids = rng.integers(10, 50000, size=(B, L)).astype(np.int32)
    mask = np.ones((B, L), dtype=np.int32)
    mask[:, 480:] = 0

    def bench(model, iters=5):
        model.encode(ids, mask)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = model.encode(ids, mask)
        return B * iters / (time.perf_counter() - t0), out

    try:
        m = UniXcoderModel(UniXcoderConfig(fused_attention=False), seed=0)
        cps_std, out_std = bench(m)
        RESULTS["std_cps"] = round(cps_std, 1)
        log(f"standard: {cps_std:.1f} cps")

        m.enable_fused_qkv()
        cps_fq, out_fq = bench(m)
        diff = float(np.max(np.abs(out_std - out_fq)))
        RESULTS["fused_qkv_cps"] = round(cps_fq, 1)
        RESULTS["fused_qkv_maxdiff"] = diff
        log(f"fused qkv: {cps_fq:.1f} cps (maxdiff {diff:.4g})")
        save()

        # stacked with bf16 serving params
        m.enable_bf16_inference()
        cps_both, _ = bench(m)
        RESULTS["fused_qkv_bf16_cps"] = round(cps_both, 1)
        log(f"fused qkv + bf16 params: {cps_both:.1f} cps")
    except Exception as exc:
        log(f"FAILED: {exc!r}")
        RESULTS["error"] = repr(exc)[:300]
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
