import functools, json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
from lattice_tpu.ops.quant import quantize_rows_int4_device, unpack_int4

DIM, NC, K, NB = 768, 1024, 10, 1 << 17
kc, ka, kn, kq = jax.random.split(jax.random.PRNGKey(7), 4)

@functools.partial(jax.jit, static_argnames=("n", "c"))
def gen_centers(k, n, c):
    x = jax.random.normal(k, (c, DIM), dtype=jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

@functools.partial(jax.jit, static_argnames=("n", "spread"))
def gen_block(centers, ka, kn, n, spread=0.35):
    a = jax.random.randint(ka, (n,), 0, NC)
    oh = jax.nn.one_hot(a, NC, dtype=jnp.bfloat16)
    base = jax.lax.dot_general(oh, centers.astype(jnp.bfloat16),
        dimension_numbers=(((1,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    x = base + spread * jax.random.normal(kn, (n, DIM), dtype=jnp.float32)
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

centers = gen_centers(kc, 1 << 22, NC)
blk = gen_block(centers, jax.random.fold_in(ka, 0), jax.random.fold_in(kn, 0), NB)
q = gen_block(centers, jax.random.fold_in(kq, 1), jax.random.fold_in(kq, 2), 256)

@jax.jit
def exact_topk(q, e):
    s = jnp.einsum("bd,nd->bn", q, e, precision=jax.lax.Precision.HIGHEST)
    return jax.lax.top_k(s, K)

_, oi = exact_topk(q, blk)
oi = np.asarray(oi)
pv, ps = quantize_rows_int4_device(blk)
deq = unpack_int4(pv).astype(jnp.float32) * ps[:, None]
_, ci = exact_topk(q, deq)
ci = np.asarray(ci)
rec = float(np.mean([len(set(ci[i].tolist()) & set(oi[i].tolist())) / K for i in range(256)]))
print(json.dumps({"inblock_rows": NB, "int4_exact_dequant_ceiling_recall": round(rec, 4)}))
