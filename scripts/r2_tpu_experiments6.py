"""Round-2 TPU batch #6: decompose the ~7 ms 1M-scan floor with xprof.

Batch #5 falsified the per-step-issue-rate theory: tile 4096 (half the
steps) ran the same ~7.5 ms as tile 2048, and the floor is also
batch-size- and byte-independent (bf16 6.85 / int8 7.16 / int4 7.99 at
B=256; 6.25 at B=8). That leaves per-element VPU selection work or a
pipeline serialization. This batch grounds it in traces:

1. xprof per-op self time for binned bf16/int8/int4 at t2048 and int4
   at t4096 (utils/tracing.summarize_device_trace — the tool that caught
   the 80 ms top_k sort).
2. Clean probe floors: matmul+rowmax-only kernels timed through a SCALAR
   readback (batch #3/#4 probe numbers were polluted by 67 MB readbacks).
3. Batch sweep of the full binned bf16 scan (B=8..256).
4. Full (untruncated) compile error for bf16 t4096 inner 2048.
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
OUT = "/root/repo/R2_TPU_RESULTS6.json"


def log(msg: str) -> None:
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def save() -> None:
    with open(OUT, "w") as f:
        json.dump(RESULTS, f, indent=1)


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
    from lattice_tpu.utils.tracing import summarize_device_trace

    N, D, B, K = 1_048_576, 768, 256, 10
    key = jax.random.PRNGKey(0)
    k1_, k2_ = jax.random.split(key)

    @functools.partial(jax.jit, static_argnames=("n",))
    def gen(k, n):
        x = jax.random.normal(k, (n, D), dtype=jnp.float32)
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True),
                               1e-12)

    parts = [gen(jax.random.fold_in(k1_, i), 131_072).astype(jnp.bfloat16)
             for i in range(N // 131_072)]
    emb = jnp.concatenate(parts)
    del parts
    emb_f32 = emb.astype(jnp.float32)
    valid = jnp.ones((N,), bool)
    q = gen(k2_, B)
    np.asarray(q)
    log(f"1M corpus ready ({time.time()-t0:.0f}s)")

    ev, es = quant_ops.quantize_rows_device(emb_f32)
    qv, qs = quant_ops.quantize_rows_device(q)
    view4 = quant_ops.Int4View(emb_f32)
    np.asarray(qs)
    log("views built")

    def timed_scalar(fn, qq, ee, iters=8):
        """Times fn(q, e) whose output reduces to a scalar before readback
        (q/e passed as ARGUMENTS — a zero-arg jit would embed the 768 MB
        corpus as an HLO constant and hang the remote-compile helper)."""
        red = jax.jit(lambda a, b: fn(a, b).max())
        float(red(qq, ee))  # compile + warm
        t = time.perf_counter()
        for _ in range(iters):
            out = red(qq, ee)
        float(out)
        return (time.perf_counter() - t) / iters * 1000.0

    def timed(fn, iters=8, batch=B):
        out = fn()
        np.asarray(out[1] if isinstance(out, tuple) else out)
        t = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out[1] if isinstance(out, tuple) else out)
        dt = time.perf_counter() - t
        return batch * iters / dt, dt / iters * 1000.0

    # ---- 2. clean probe floors (scalar readback) -------------------------
    def make_probe(mode: str, tile: int, dtype: str):
        def kern_bf16(q_ref, e_ref, out_ref):
            s = jax.lax.dot_general(
                q_ref[:].astype(e_ref.dtype), e_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            b = s.shape[0]
            if mode == "pack":
                cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = pk._pack_keys_fast(s, cols).astype(jnp.float32)
            out_ref[:] = jnp.max(s.reshape(b, tile // 128, 128), axis=1)

        def kern_int8(q_ref, e_ref, out_ref):
            acc = jax.lax.dot_general(
                q_ref[:], e_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.int32)
            b = acc.shape[0]
            s = acc.astype(jnp.float32)
            if mode == "pack":
                cols = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = pk._pack_keys_fast(s, cols).astype(jnp.float32)
            out_ref[:] = jnp.max(s.reshape(b, tile // 128, 128), axis=1)

        def kern_int4(q_ref, e_ref, out_ref):
            x = e_ref[:].astype(jnp.int32)
            lo = (((x & 0xF) ^ 8) - 8).astype(jnp.int8)
            hi = (x >> 4).astype(jnp.int8)
            qq = q_ref[:]
            dh = x.shape[1]
            dims = (((1,), (1,)), ((), ()))
            acc = jax.lax.dot_general(qq[:, :dh], lo, dimension_numbers=dims,
                                      preferred_element_type=jnp.int32)
            acc = acc + jax.lax.dot_general(
                qq[:, dh:], hi, dimension_numbers=dims,
                preferred_element_type=jnp.int32)
            b = acc.shape[0]
            out_ref[:] = jnp.max(
                acc.reshape(b, tile // 128, 128), axis=1).astype(jnp.float32)

        kern = {"bf16": kern_bf16, "int8": kern_int8, "int4": kern_int4}[dtype]
        ee = {"bf16": emb, "int8": ev, "int4": view4.values}[dtype]
        qq = q if dtype == "bf16" else qv
        d_in = int(ee.shape[1])
        d_q = int(qq.shape[1])

        def run(qq_, ee_):
            return pl.pallas_call(
                kern,
                grid=(N // tile,),
                in_specs=[
                    pl.BlockSpec((B, d_q), lambda j: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((tile, d_in), lambda j: (j, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((B, 128), lambda j: (0, j),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct(
                    (B, (N // tile) * 128), jnp.float32),
            )(qq_, ee_)
        return run, qq, ee

    for dtype in ("bf16", "int8", "int4"):
        for mode in ("rawmax", "pack"):
            for tile in (2048,):
                name = f"probe_{dtype}_{mode}_t{tile}"
                try:
                    fn, qq, ee = make_probe(mode, tile, dtype)
                    ms = timed_scalar(fn, qq, ee)
                    RESULTS[name] = {"ms": round(ms, 2)}
                    log(f"{name}: {ms:.2f} ms")
                except Exception as e:
                    RESULTS[name] = {"error": repr(e)[:2000]}
                    log(f"{name} FAILED")
                save()

    # ---- 3. batch sweep of the full binned bf16 scan ---------------------
    for b in (8, 32, 64, 128, 256):
        try:
            qb = q[:b]
            qps, ms = timed(lambda: pk.binned_topk(qb, emb, valid, K,
                                                   tile=2048), batch=b)
            RESULTS[f"binned_bf16_b{b}"] = {"qps": round(qps, 1),
                                            "ms": round(ms, 2)}
            log(f"binned bf16 B={b}: {ms:.2f} ms ({qps:,.0f} qps)")
        except Exception as e:
            RESULTS[f"binned_bf16_b{b}"] = {"error": repr(e)[:400]}
        save()

    # ---- 1. xprof decomposition ------------------------------------------
    def traced(name, fn, iters=4):
        tdir = f"/tmp/xprof_{name}"
        fn()  # warm/compile outside the trace
        np_out = fn()
        np.asarray(np_out[1] if isinstance(np_out, tuple) else np_out)
        jax.profiler.start_trace(tdir)
        try:
            for _ in range(iters):
                out = fn()
            np.asarray(out[1] if isinstance(out, tuple) else out)
        finally:
            jax.profiler.stop_trace()
        summ = summarize_device_trace(tdir, top=12)
        if "ops" in summ:
            summ["ops"] = [(n, round(ms_, 3), round(fr, 3))
                           for n, ms_, fr in summ["ops"]]
            summ.pop("planes", None)
        RESULTS[f"trace_{name}"] = summ
        log(f"trace {name}: total {summ.get('total_ms', '?')} ms over "
            f"{iters} iters")
        save()

    try:
        traced("bf16_t2048",
               lambda: pk.binned_topk(q, emb, valid, K, tile=2048))
        traced("int8_t2048",
               lambda: pk.binned_topk_int8(qv, qs, ev, es, valid, K,
                                           tile=2048))
        traced("int4_t2048",
               lambda: pk.binned_topk_int4(qv, qs, view4.values, view4.scales,
                                           valid, K, tile=2048))
        traced("int4_t4096",
               lambda: pk.binned_topk_int4(qv, qs, view4.values, view4.scales,
                                           valid, K, tile=4096, inner=2048))
    except Exception as e:
        RESULTS["trace_error"] = repr(e)[:2000]
        log(f"tracing FAILED: {e!r}")
    save()

    # ---- 3b. int4 rescore-width sweep: where does recall plateau? -------
    # (t2048 i2048; exact_i oracle is only needed for recall, compute it
    # here against the f32 corpus once)
    try:
        _, exact_i = topk_ops.flat_topk(q, emb_f32, valid, K)
        exact_np = np.asarray(exact_i)

        def rec_of(ids_np):
            return float(np.mean([
                len(set(ids_np[i].tolist()) & set(exact_np[i].tolist())) / K
                for i in range(ids_np.shape[0])]))

        for width in (16, 40, 80, 160):
            def run_w():
                s1, c1 = pk.binned_topk_int4(
                    qv, qs, view4.values, view4.scales, valid, width,
                    tile=2048)
                return pk._exact_rescore(q, emb, s1, c1, K)
            qps, ms = timed(run_w)
            out = run_w()
            rec = rec_of(np.asarray(out[1]))
            RESULTS[f"int4_width{width}"] = {
                "qps": round(qps, 1), "ms": round(ms, 2),
                "recall": round(rec, 4)}
            log(f"int4 width={width}: {ms:.2f} ms recall {rec:.4f}")
            save()
        # int8 reference point at its served width
        def run_i8():
            s1, c1 = pk.binned_topk_int8(qv, qs, ev, es, valid, 16,
                                         tile=2048)
            return pk._exact_rescore(q, emb, s1, c1, K)
        qps, ms = timed(run_i8)
        rec = rec_of(np.asarray(run_i8()[1]))
        RESULTS["int8_width16"] = {"qps": round(qps, 1), "ms": round(ms, 2),
                                   "recall": round(rec, 4)}
        log(f"int8 width=16: {ms:.2f} ms recall {rec:.4f}")
    except Exception as e:
        RESULTS["width_sweep_error"] = repr(e)[:400]
    save()

    # ---- 4. full compile error for bf16 t4096 ---------------------------
    try:
        pk.binned_topk(q, emb, valid, K, tile=4096, inner=2048)
        RESULTS["bf16_t4096_full"] = "compiled+ran OK this time"
    except Exception as e:
        RESULTS["bf16_t4096_full"] = repr(e)
    save()
    try:
        s1, c1 = pk.binned_topk_int8(qv, qs, ev, es, valid, K,
                                     tile=4096, inner=2048)
        RESULTS["int8_t4096_full"] = "compiled+ran OK this time"
    except Exception as e:
        RESULTS["int8_t4096_full"] = repr(e)
    save()

    RESULTS["total_s"] = round(time.time() - t0, 1)
    save()
    log("ALL DONE")


if __name__ == "__main__":
    main()
