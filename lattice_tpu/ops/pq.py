"""Product quantization: the >=8x-compression capacity tier.

POSITION IN THE LADDER (settled by r2/r3 chip measurements): bf16 flat
(1x) -> int8 (2x capacity at parity qps) -> int4 (4x: 11-19k qps /
recall 0.994+ at 4M x 768, ops/quant.py) -> PQ dsub=4 (8x). int4
SUPERSEDED PQ's original dsub=2 tier — identical 384 B/row at ~20x the
throughput and better recall (PQ ADC measured ~700 qps / 0.81 at 1M) —
so PQ's serving regime is ONLY the >4M-per-chip corpus that int4 cannot
fit, dispatched via LATTICE_PQ=1 / method="pq" and gated on build-time
self-measured recall like IVF.

BASELINE "recall@10 at equal memory" (reference serves every corpus size
through one Qdrant collection, `src/lattice/embeddings/client.py:93-113`):
bf16 rows cap out around 1M x 768 per 16 GB chip and the int8 shadow
(ops/quant.py) doubles that; past ~4M chunks the corpus must compress
below 1 byte per 2 dims. PQ stores each row as m uint8 codes — one per
dsub-dim subvector, each against its own ksub-entry codebook — so 768
dims at the default dsub=4 cost 192 B/row, 8x under bf16: an 8M-row
corpus fits the HBM footprint of 1M bf16 rows (VERDICT r1 #6 contract).

Scoring is asymmetric (ADC): score(q, n) = sum_j <q_j, cb[j, code[n,j]]>,
which is EXACTLY the dot product of q with the reconstructed row. It is
computed here by decode-then-score: each code block reconstructs through
per-subspace one-hot matmuls (the MXU-native gather — XLA's gather is a
~3 GB/s serial loop on TPU, ops/ivf.py) and the reconstructed block
scores against the whole query batch, so reconstruction amortizes over B
queries and a running top-k under `lax.scan` never materializes the
[B, N] score matrix.

Honest physics: PQ's table lookups are gather-shaped and the MXU has no
gather. The one-hot decode pays ksub-wide contractions into dsub-wide
(lane-padded) outputs, so this path trades throughput for capacity; it
is the 8x tier where HBM capacity, not qps, binds. The speed ladder is
bf16 flat (1x) -> int8 (2x capacity, parity qps) -> PQ (8x). Recall
stays high because ADC error is reconstruction error only: with dsub=4
and 256 centroids per subspace the per-dim quantization noise is ~1/4 of
the signal's per-dim scale, and the top-k ordering survives (tests pin
recall on clustered corpora; `measure_recall` self-measures at build
like IVFIndex so dispatchers never trust PQ blindly).
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lattice_tpu.ops import topk as topk_ops

NEG_INF = -1e30

# rows per decode-and-score step: bounds the transient one-hot
# ([block, m, ksub] bf16 — 50 MB at block=1024, m=96) and the per-step
# top_k width. 4096 keeps scan steps few at corpora >=1M.
DEFAULT_BLOCK = 4096
# training sample cap: Lloyd cost is iters * Ns * ksub * d MACs; 64K rows
# bound the build to seconds while leaving >=256 points per centroid.
DEFAULT_TRAIN_ROWS = 65_536


def choose_m(d: int, target_dsub: int = 4) -> int:
    """Largest m with d % m == 0 and d/m >= target_dsub.

    Default dsub=4 is the 8x-vs-bf16 tier — PQ's only serving regime
    since the int4 view (ops/quant.py) took the 4x slot at ~20x PQ's
    throughput and higher recall (r2/r3 chip measurements: int4 11-19k
    qps / 0.994+ at 4M vs PQ ADC ~700 qps / 0.81 at 1M). dsub=2 (4x)
    remains available by passing target_dsub=2 but is strictly dominated;
    a rescore stage should back any PQ scan.
    """
    for dsub in range(target_dsub, d + 1):
        if d % dsub == 0:
            return d // dsub
    return 1


# ---- codebook training ---------------------------------------------------


# Rows per Lloyd/encode block: the per-block score slab is
# [block, m, ksub] f32 (~800 MB at block=2048, m=384) — the full-sample
# version would be 25 GB at the 4M-contract config.
TRAIN_BLOCK = 2048


@functools.partial(jax.jit, static_argnames=("m", "ksub", "iters", "block"))
def train_pq(
    sample: jax.Array,     # [Ns, m*dsub] f32 (rows normalized upstream)
    init_idx: jax.Array,   # [ksub] i32 rows seeding every subspace
    m: int,
    ksub: int = 256,
    iters: int = 8,
    block: int = TRAIN_BLOCK,
) -> jax.Array:
    """Per-subspace L2 Lloyd iterations, vectorized over all m subspaces.

    Unlike the spherical k-means in ops/ivf.py, PQ subvectors are not
    normalized, so this is plain L2 k-means: assignment by
    argmin ||x - c||^2 = argmin (||c||^2 - 2 x.c), update by masked mean.
    Empty clusters keep their previous centroid (the sample is dense
    enough that re-seeding churn isn't worth the extra scan). Assignment
    runs blockwise under lax.scan so the [*, m, ksub] score slab stays
    HBM-bounded. Returns codebooks [m, ksub, dsub] f32.
    """
    ns, d = sample.shape
    dsub = d // m
    block = min(block, ns)
    pad = (-ns) % block
    x = sample
    w_valid = jnp.ones((ns,), jnp.float32)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, d), x.dtype)])
        w_valid = jnp.concatenate([w_valid, jnp.zeros((pad,), jnp.float32)])
    nb = (ns + pad) // block
    x_blocks = x.reshape(nb, block, d)
    w_blocks = w_valid.reshape(nb, block)
    cb0 = sample[init_idx].reshape(ksub, m, dsub).transpose(1, 0, 2)

    def stats(cb):
        c2 = jnp.sum(cb * cb, axis=-1)                   # [m, ksub]

        def blk(carry, inp):
            sums, counts = carry
            xb, wb = inp
            xs = xb.reshape(block, m, dsub).transpose(1, 0, 2)
            xc = jnp.einsum("mnd,mkd->mnk", xs, cb,
                            preferred_element_type=jnp.float32)
            a = jnp.argmin(c2[:, None, :] - 2.0 * xc, axis=-1)  # [m, block]

            def per_sub(a_j, xs_j):
                s = jnp.zeros((ksub, dsub), jnp.float32).at[a_j].add(
                    xs_j * wb[:, None])
                c = jnp.zeros((ksub,), jnp.float32).at[a_j].add(wb)
                return s, c

            ds, dc = jax.vmap(per_sub)(a, xs)
            return (sums + ds, counts + dc), None

        (sums, counts), _ = jax.lax.scan(
            blk,
            (jnp.zeros((m, ksub, dsub), jnp.float32),
             jnp.zeros((m, ksub), jnp.float32)),
            (x_blocks, w_blocks))
        return sums, counts

    def step(cb, _):
        sums, counts = stats(cb)
        new = sums / jnp.maximum(counts[..., None], 1.0)
        new = jnp.where(counts[..., None] > 0, new, cb)
        return new, None

    cb, _ = jax.lax.scan(step, cb0, None, length=iters)
    return cb


@jax.jit
def pq_encode_block(block: jax.Array,      # [bn, d] f32
                    codebooks: jax.Array,  # [m, ksub, dsub] f32
                    ) -> jax.Array:
    """Nearest-codeword assignment per subspace. Returns [bn, m] uint8."""
    bn, d = block.shape
    m, ksub, dsub = codebooks.shape
    x = block.reshape(bn, m, dsub)
    xc = jnp.einsum("nmd,mkd->nmk", x, codebooks,
                    preferred_element_type=jnp.float32)
    c2 = jnp.sum(codebooks * codebooks, axis=-1)          # [m, ksub]
    assign = jnp.argmin(c2[None, :, :] - 2.0 * xc, axis=-1)
    return assign.astype(jnp.uint8)


@jax.jit
def pq_decode(codes: jax.Array,       # [n, m] uint8
              codebooks: jax.Array,   # [m, ksub, dsub] f32
              ) -> jax.Array:
    """Reconstruct rows (f32). One-hot matmul gather; test/rescore sizes."""
    n, m = codes.shape
    _, ksub, dsub = codebooks.shape
    onehot = jax.nn.one_hot(codes.astype(jnp.int32), ksub, dtype=jnp.float32)
    xhat = jnp.einsum("nmk,mkd->nmd", onehot, codebooks,
                      preferred_element_type=jnp.float32)
    return xhat.reshape(n, m * dsub)


# ---- search ---------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "block"))
def pq_topk(
    queries: jax.Array,     # [B, d] f32 normalized
    codes: jax.Array,       # [N, m] uint8
    codebooks: jax.Array,   # [m, ksub, dsub] f32
    valid: jax.Array,       # [N] bool
    k: int,
    block: int = DEFAULT_BLOCK,
) -> tuple[jax.Array, jax.Array]:
    """ADC top-k by blockwise decode-then-score with a running merge.

    Each scan step reconstructs `block` rows in bf16 (per-subspace one-hot
    matmuls), scores them against the full query batch on the MXU, and
    merges into the carried top-k — HBM reads are the uint8 codes only.
    Returns (scores [B,k] f32, ids [B,k] i32; -1/-inf for padding).
    """
    b, d = queries.shape
    n, m = codes.shape
    _, ksub, dsub = codebooks.shape
    block = min(block, max(n, 1))
    pad = (-n) % block
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.zeros((pad, m), codes.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros((pad,), bool)])
    nb = (n + pad) // block
    codes_b = codes.reshape(nb, block, m)
    valid_b = valid.reshape(nb, block)
    cb_bf16 = codebooks.astype(jnp.bfloat16)
    q_bf16 = queries.astype(jnp.bfloat16)
    k_eff = min(k, block)

    def step(carry, inp):
        c_scores, c_ids = carry
        cblk, vblk, base = inp
        onehot = jax.nn.one_hot(cblk.astype(jnp.int32), ksub,
                                dtype=jnp.bfloat16)       # [block, m, ksub]
        xhat = jnp.einsum("nmk,mkd->nmd", onehot, cb_bf16,
                          preferred_element_type=jnp.bfloat16)
        xhat = xhat.reshape(block, m * dsub)              # [block, d]
        s = jax.lax.dot_general(
            q_bf16, xhat,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)           # [B, block]
        s = jnp.where(vblk[None, :], s, NEG_INF)
        ids = (base + jax.lax.iota(jnp.int32, block))[None, :]
        ids = jnp.broadcast_to(ids, (b, block))
        all_s = jnp.concatenate([c_scores, s], axis=-1)
        all_i = jnp.concatenate([c_ids, ids], axis=-1)
        top_s, pos = jax.lax.top_k(all_s, k_eff)
        top_i = jnp.take_along_axis(all_i, pos, axis=-1)
        return (top_s, top_i), None

    init = (jnp.full((b, k_eff), NEG_INF, jnp.float32),
            jnp.full((b, k_eff), -1, jnp.int32))
    bases = (jnp.arange(nb, dtype=jnp.int32) * block)
    (scores, ids), _ = jax.lax.scan(step, init, (codes_b, valid_b, bases))
    if k_eff < k:
        padw = k - k_eff
        scores = jnp.concatenate(
            [scores, jnp.full((b, padw), NEG_INF, jnp.float32)], axis=-1)
        ids = jnp.concatenate(
            [ids, jnp.full((b, padw), -1, jnp.int32)], axis=-1)
    return scores, ids


# ---- NumPy oracle ----------------------------------------------------------


def pq_decode_oracle(codes: np.ndarray, codebooks: np.ndarray) -> np.ndarray:
    codes = np.asarray(codes)
    cb = np.asarray(codebooks, np.float64)
    m = codes.shape[1]
    parts = [cb[j][codes[:, j].astype(np.int64)] for j in range(m)]
    return np.concatenate(parts, axis=1)


def pq_topk_oracle(queries, codes, codebooks, valid, k,
                   filter_mask=None) -> tuple[np.ndarray, np.ndarray]:
    """Exact ADC ranking (float64 decode) — the kernel must match this."""
    xhat = pq_decode_oracle(codes, codebooks)
    return topk_ops.topk_oracle(queries, xhat, valid, k, filter_mask)


# ---- index -----------------------------------------------------------------


class PQIndex:
    """Device-resident PQ view: uint8 codes + f32 codebooks + validity.

    Mirrors IVFIndex's lifecycle (build / insert / remove /
    measure_recall) so ChunkStore can maintain it O(delta) under
    watch-mode mutations. Row ids are the owning store's row ids.
    """

    def __init__(self, codebooks: jax.Array, codes: jax.Array,
                 valid: jax.Array, n_rows: int):
        self.codebooks = codebooks
        self.codes = codes
        self.valid = valid
        self.n_rows = n_rows
        self.measured_recall: float | None = None

    @property
    def m(self) -> int:
        return int(self.codebooks.shape[0])

    @property
    def ksub(self) -> int:
        return int(self.codebooks.shape[1])

    @property
    def dim(self) -> int:
        return int(self.codebooks.shape[0] * self.codebooks.shape[2])

    def memory_bytes(self) -> int:
        return (self.codes.size + self.codebooks.size * 4
                + self.valid.size)

    @classmethod
    def build(cls, embeddings: np.ndarray | jax.Array,
              valid: np.ndarray | jax.Array,
              m: int | None = None, ksub: int = 256,
              train_rows: int = DEFAULT_TRAIN_ROWS, iters: int = 8,
              seed: int = 0, encode_block: int = 4096) -> "PQIndex":
        """Train codebooks on a live-row sample, then encode blockwise.

        Host `embeddings` stream to device one block at a time, so the
        full-precision matrix never needs to fit in HBM — that is the
        whole point of this tier (the corpus may be 8x over budget).
        """
        n, d = embeddings.shape
        if m is None:
            m = choose_m(d)
        if d % m:
            raise ValueError(f"dim {d} not divisible by m={m}")
        if ksub > 256:
            raise ValueError("ksub > 256 does not fit uint8 codes")
        valid_np = np.asarray(valid, dtype=bool)
        live = np.flatnonzero(valid_np)
        rng = np.random.default_rng(seed)
        n_train = min(train_rows, len(live)) or 1
        rows = (rng.choice(live, size=n_train, replace=False)
                if len(live) else np.zeros(1, np.int64))
        if isinstance(embeddings, jax.Array):
            sample = jnp.take(embeddings,
                              jnp.asarray(rows.astype(np.int32)),
                              axis=0).astype(jnp.float32)
        else:
            sample = jnp.asarray(
                np.asarray(embeddings)[rows], dtype=jnp.float32)
        ksub_eff = min(ksub, n_train)
        init = rng.permutation(n_train)[:ksub_eff].astype(np.int32)
        if ksub_eff < ksub:  # tiny corpora: repeat seeds, Lloyd separates
            init = np.resize(init, ksub)
        codebooks = train_pq(sample, jnp.asarray(init), m, ksub, iters)
        code_parts = []
        for start in range(0, n, encode_block):
            blk = embeddings[start:start + encode_block]
            blk = (blk.astype(jnp.float32) if isinstance(blk, jax.Array)
                   else jnp.asarray(np.asarray(blk), dtype=jnp.float32))
            code_parts.append(pq_encode_block(blk, codebooks))
        codes = (jnp.concatenate(code_parts) if len(code_parts) > 1
                 else code_parts[0])
        return cls(codebooks=codebooks, codes=codes,
                   valid=jnp.asarray(valid_np), n_rows=n)

    # ---- O(delta) mutation (codebooks are frozen; ChunkStore tracks
    # churn and rebuilds past its drift threshold, as with IVF) ----------

    def insert(self, emb_rows: jax.Array, row_ids: Sequence[int]) -> None:
        max_row = max(row_ids)
        if max_row >= self.codes.shape[0]:
            pad = max_row + 1 - self.codes.shape[0]
            self.codes = jnp.concatenate(
                [self.codes, jnp.zeros((pad, self.m), self.codes.dtype)])
            self.valid = jnp.concatenate(
                [self.valid, jnp.zeros((pad,), bool)])
            self.n_rows = max_row + 1
        new_codes = pq_encode_block(
            emb_rows.astype(jnp.float32), self.codebooks)
        idx = jnp.asarray(np.asarray(row_ids, np.int32))
        self.codes = self.codes.at[idx].set(new_codes)
        self.valid = self.valid.at[idx].set(True)

    def remove(self, row_ids: Sequence[int]) -> None:
        keep = [r for r in row_ids if r < self.codes.shape[0]]
        if not keep:
            return
        idx = jnp.asarray(np.asarray(keep, np.int32))
        self.valid = self.valid.at[idx].set(False)

    # ---- search ---------------------------------------------------------

    def search_device(self, queries: jax.Array, k: int,
                      mask: jax.Array | None = None
                      ) -> tuple[jax.Array, jax.Array]:
        """Device-resident ADC search (jax in/out — relay-pipelineable)."""
        valid = self.valid if mask is None else (self.valid & mask)
        return pq_topk(queries.astype(jnp.float32), self.codes,
                       self.codebooks, valid, k)

    def search(self, queries: np.ndarray, k: int,
               mask: np.ndarray | jax.Array | None = None,
               rescore_rows: np.ndarray | None = None,
               widen: int = 4) -> tuple[np.ndarray, np.ndarray]:
        """Host entry; optional exact rescore against host-resident rows.

        `rescore_rows` is the DiskANN-style quality lever for the
        capacity tier: HBM holds only the uint8 codes (the footprint
        contract), the full-precision rows stay in host RAM (where the
        reference's Qdrant held them too), and the ADC scan's top
        `widen*k` candidates re-rank exactly on host — a [B, k1] gather
        + dot, microseconds next to the device scan. ADC-only ordering
        plateaus around 0.85-0.93 recall@10 on crowded corpora; the
        rescore returns it to ~1.0.
        """
        q = topk_ops.l2_normalize(np.atleast_2d(queries))
        mask_dev = None if mask is None else jnp.asarray(mask)
        if rescore_rows is None:
            s, i = self.search_device(jnp.asarray(q), k, mask_dev)
            return np.asarray(s), np.asarray(i)
        k1 = min(max(widen * k, 32), self.codes.shape[0])
        s1, c1 = self.search_device(jnp.asarray(q), k1, mask_dev)
        s1, c1 = np.asarray(s1), np.asarray(c1)
        safe = np.maximum(c1, 0)
        rows = np.asarray(rescore_rows)[safe].astype(np.float32)
        scores = np.einsum("bd,bkd->bk", q, rows)
        scores = np.where(s1 > NEG_INF / 2, scores, NEG_INF)
        order = np.argsort(-scores, axis=1, kind="stable")[:, :k]
        top_s = np.take_along_axis(scores, order, axis=1)
        top_i = np.take_along_axis(c1, order, axis=1)
        top_i = np.where(top_s > NEG_INF / 2, top_i, -1)
        return top_s, top_i

    def measure_recall(self, emb_ref: jax.Array | np.ndarray,
                       valid: jax.Array | np.ndarray,
                       n_sample: int = 128, k: int = 10,
                       seed: int = 0, rescore: bool = False) -> float:
        """Self-sample recall@k vs the exact scan over `emb_ref`.

        Callable at build time while the uncompressed rows still exist
        (device or host); the measured number gates dispatch exactly as
        IVFIndex.measured_recall does.
        """
        valid_np = np.asarray(valid, dtype=bool)
        live = np.flatnonzero(valid_np)
        if len(live) == 0:
            self.measured_recall = 0.0
            return 0.0
        rng = np.random.default_rng(seed)
        rows = rng.choice(live, size=min(n_sample, len(live)),
                          replace=False)
        k_eff = min(k, len(live))
        if isinstance(emb_ref, jax.Array):
            q = jnp.take(emb_ref, jnp.asarray(rows.astype(np.int32)),
                         axis=0).astype(jnp.float32)
            _, exact_i = topk_ops.flat_topk(
                q, emb_ref, jnp.asarray(valid_np), k_eff)
            exact_np = np.asarray(exact_i)
            q_np = np.asarray(q)
        else:
            q_np = np.asarray(emb_ref)[rows].astype(np.float32)
            _, exact_np = topk_ops.topk_oracle(
                q_np, emb_ref, valid_np, k_eff)
        if rescore and isinstance(emb_ref, jax.Array):
            # rescore ON DEVICE: gather only the [B, k1, d] candidates.
            # Materializing the whole matrix on host for the gate is a
            # ~6 GB readback at PQ's own serving regime (>4M x 768)
            # through a ~20 MB/s relay (r4 review finding).
            from lattice_tpu.ops.pallas_topk import _exact_rescore
            qn = topk_ops.l2_normalize(q_np)
            k1 = min(max(4 * k_eff, 32), self.codes.shape[0])
            s1, c1 = self.search_device(jnp.asarray(qn, jnp.float32), k1)
            _, got_dev = _exact_rescore(jnp.asarray(qn, jnp.float32),
                                        emb_ref, s1, c1, k_eff)
            got = np.asarray(got_dev)
        else:
            rr = np.asarray(emb_ref, np.float32) if rescore else None
            _, got = self.search(q_np, k_eff, rescore_rows=rr)
        hits = sum(
            len(set(got[i].tolist()) & set(exact_np[i].tolist()))
            for i in range(len(rows)))
        self.measured_recall = hits / (len(rows) * k_eff)
        return self.measured_recall
