"""Fused self-attention for head_dim-64 encoders (UniXcoder serving).

Reference semantic: the torch RobertaModel self-attention inside
`src/lattice/providers/unixcoder_provider.py:176-215` (HF eager path:
materialized scores + softmax + context matmul).

Why a custom kernel: the stock jax flash-attention LOST on v5e (369 vs
611 chunks/s, R3 falsification log) because its blocks pad head_dim 64
to the 128-lane tile and its online-softmax machinery is sized for
L >> VMEM. At serving shape (L <= 512) an ENTIRE per-head score row fits
in VMEM, so this kernel does the simplest possible thing:

  * grid (B, H/2): each cell owns one batch row and TWO adjacent heads,
    whose q/k/v columns are contiguous 128 lanes of the [B, L, 768]
    projection output — blocks arrive full-lane with NO transpose and
    NO padding;
  * per head: one [L, 64] x [64, L] MXU score matmul, a full-row
    softmax entirely in VMEM (plain max/exp/sum — no online rescaling),
    and one [L, L] x [L, 64] context matmul;
  * the [L, L] probability tensor never exists in HBM (the einsum path
    materializes [B, H, L, L] f32 = 1.6 GB per layer at B=128/L=512).

The two in-cell heads keep the DMA/layout full-width; the 64-wide MXU
contractions are intrinsic to head_dim 64 (bench: a block-diagonal
2-head packing doubles FLOPs for the same utilization — not taken).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HEAD_DIM = 64
PAIR = 2 * HEAD_DIM  # 128 lanes per head pair


def _paired_attn_kernel(neg_ref, q_ref, k_ref, v_ref, out_ref, *,
                        sm_scale: float):
    b = pl.program_id(0)
    neg = neg_ref[pl.ds(b, 1), :]                 # [1, L] additive mask
    q = q_ref[0]                                  # [L, 128]
    k = k_ref[0]
    v = v_ref[0]
    outs = []
    for h in (0, 1):
        lo, hi = h * HEAD_DIM, (h + 1) * HEAD_DIM
        qh = q[:, lo:hi]
        kh = k[:, lo:hi]
        vh = v[:, lo:hi]
        s = jax.lax.dot_general(
            qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # [L, L]
        s = s * sm_scale + neg                    # mask keys, scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        denom = jnp.sum(p, axis=-1, keepdims=True)
        c = jax.lax.dot_general(
            p.astype(vh.dtype), vh,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)   # [L, 64]
        outs.append(c / denom)
    out_ref[0] = jnp.concatenate(outs, axis=-1).astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("sm_scale", "interpret"))
def paired_attention(q: jax.Array, k: jax.Array, v: jax.Array,
                     mask: jax.Array, sm_scale: float,
                     interpret: bool = False) -> jax.Array:
    """Self-attention over head-contiguous projections.

    q/k/v: [B, L, H*64] with head h in columns [64h, 64h+64) — exactly
    the layout the QKV Dense outputs produce, so no transpose feeds the
    kernel. mask: [B, L] (>0 = real token). Returns [B, L, H*64] f32
    context in the same layout.
    """
    bsz, ln, width = q.shape
    assert width % PAIR == 0, f"width {width} must pack head pairs"
    n_pairs = width // PAIR
    neg = jnp.where(mask > 0, 0.0, -1e9).astype(jnp.float32)  # [B, L]
    kernel = functools.partial(_paired_attn_kernel, sm_scale=sm_scale)
    grid = (bsz, n_pairs)
    blk = lambda b, p: (b, 0, p)  # noqa: E731
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((bsz, ln), lambda b, p: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ln, PAIR), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ln, PAIR), blk, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ln, PAIR), blk, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, ln, PAIR), blk,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bsz, ln, width), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=4 * bsz * width * ln * ln,
            bytes_accessed=4 * bsz * ln * width * 2,
            transcendentals=bsz * ln * ln * (width // HEAD_DIM),
        ),
        interpret=interpret,
    )(neg, q, k, v)


def attention_oracle(q: np.ndarray, k: np.ndarray, v: np.ndarray,
                     mask: np.ndarray, sm_scale: float) -> np.ndarray:
    """NumPy reference: per-head masked softmax attention over the same
    head-contiguous [B, L, H*64] layout."""
    bsz, ln, width = q.shape
    heads = width // HEAD_DIM
    out = np.zeros((bsz, ln, width), np.float32)
    for b in range(bsz):
        neg = np.where(mask[b] > 0, 0.0, -1e9)
        for h in range(heads):
            sl = slice(h * HEAD_DIM, (h + 1) * HEAD_DIM)
            s = (q[b, :, sl].astype(np.float32)
                 @ k[b, :, sl].astype(np.float32).T) * sm_scale + neg
            s = s - s.max(axis=-1, keepdims=True)
            p = np.exp(s)
            p /= p.sum(axis=-1, keepdims=True)
            out[b, :, sl] = p @ v[b, :, sl].astype(np.float32)
    return out
