"""Multi-chip hybrid deep-rank: the corpus-wide fuse where the rows live.

Reference semantic: the hybrid ranking pass of
`src/lattice/query/engine.py:102-220` with the scoring formulas of
`src/lattice/query/ranking/scorer.py:9-126` — single-chip this runs as
`ops/ranking.hybrid_rank_device_packed(_batch)` over a replicated
corpus. Past one chip's HBM the corpus rows (and the resident rank
columns that ride with them) shard over the mesh's data axis, and the
fuse is row-local by construction: every row's fused score depends only
on its own vector score, reach depth/relevance, degree, quality and
match bit. So the multi-chip plan is exactly the ShardedIndex plan:

  - embeddings [N, d], valid/degree/quality [N] shard P(data);
  - the per-query packed evidence ([Q, R] reach, [Q, M] match rows,
    [Q, 4]/[Q, 8] intent tables) is tiny (4 B/entry, budgeted) and
    REPLICATES — each shard rebases global row ids into its local row
    window and drops the rest, which is cheaper than any host-side
    routing and keeps the upload one broadcast;
  - each shard fuses + selects its local top-k with global row ids,
    and the [B, k] candidates merge over ICI (`all_gather` + re-select,
    the ShardedIndex merge), hierarchically across DCN on a multislice
    mesh.

Parity: per-row fuse + exact local/global selection means the merged
result EQUALS the single-chip kernel's (CPU `approx_max_k` is exact;
on TPU both paths widen through the same PartialReduce).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

from lattice_tpu.ops.graph_kernels import UNREACHED
from lattice_tpu.ops.ranking import (
    NEG_INF,
    REACH_DEPTH_MAX,
    REACH_ROW_BITS,
    REACH_ROW_MASK,
    _fuse_scores,
    _select_topk,
)
from lattice_tpu.parallel.mesh import DATA_AXIS, DCN_AXIS, make_mesh
from lattice_tpu.parallel.sharded_index import merge_topk_axis


def _pad_rows(a, pad: int):
    """Append `pad` zero rows along axis 0, staying on whichever side of
    the host/device boundary the array already lives (the ChunkStore
    hands its resident HBM matrix straight in — no host round-trip)."""
    xp = jnp if isinstance(a, jax.Array) else np
    return xp.concatenate(
        [a, xp.zeros((pad,) + a.shape[1:], a.dtype)])


class ShardedHybridRank:
    """Row-sharded corpus + rank columns serving batched hybrid rank.

    Construction uploads each array once with its sharding; `rank`
    executes ONE shard_map jit per (Q, R, M, k) bucket (callers pad to
    geometric buckets exactly as the single-chip path does). Mutations
    follow ShardedIndex semantics: rebuild on store/graph generation
    change — rank columns are static between generations by design
    (`ChunkStore.device_rank_columns`).

    `bits` mirrors the sharded index's capacity ladder: 16 stores
    bf16/f32 rows, 8 halves them to symmetric per-row int8, 4 quarters
    them to packed nibbles — the quantized cosine (i32-accumulated int8
    matmul, two symmetric rescales) feeds the same fuse, trading ~1e-2
    score error for 2-4x corpus per chip.
    """

    def __init__(self, embeddings: np.ndarray, valid: np.ndarray,
                 degree: np.ndarray, quality: np.ndarray,
                 mesh=None, dtype: str = "bfloat16", bits: int = 16):
        if bits not in (16, 8, 4):
            raise ValueError(f"bits must be 16, 8 or 4, got {bits}")
        self.bits = bits
        self.mesh = mesh or make_mesh()
        self.multislice = DCN_AXIS in self.mesh.axis_names
        self._row_axes = ((DCN_AXIS, DATA_AXIS) if self.multislice
                          else DATA_AXIS)
        n_data = self.mesh.shape[DATA_AXIS]
        if self.multislice:
            n_data *= self.mesh.shape[DCN_AXIS]
        n, d = embeddings.shape
        pad = (-n) % n_data
        if pad:
            embeddings = _pad_rows(embeddings, pad)
            xv = jnp if isinstance(valid, jax.Array) else np
            valid = _pad_rows(xv.asarray(valid, dtype=bool), pad)
            degree = _pad_rows(degree, pad)
            quality = _pad_rows(quality, pad)
        self.n_rows = n
        self.rows_per_shard = (n + pad) // n_data
        row_sh = NamedSharding(self.mesh, P(self._row_axes))
        emb_sh = NamedSharding(self.mesh, P(self._row_axes, None))
        if bits == 16:
            self.embeddings = jax.device_put(
                jnp.asarray(embeddings, dtype=jnp.dtype(dtype)), emb_sh)
            self.scales = None
        else:
            # capacity tiers: symmetric per-row int8 (2x rows/chip) or
            # packed-nibble int4 (4x) shards; the quantized cosine feeds
            # the same fuse (ops/quant.py math, i32-accumulated matmul)
            from lattice_tpu.ops.quant import (quantize_rows,
                                               quantize_rows_device,
                                               quantize_rows_int4,
                                               quantize_rows_int4_device)
            if isinstance(embeddings, jax.Array):
                qfn = (quantize_rows_device if bits == 8
                       else quantize_rows_int4_device)
            else:
                qfn = quantize_rows if bits == 8 else quantize_rows_int4
            values, scales = qfn(embeddings)
            self.embeddings = jax.device_put(jnp.asarray(values), emb_sh)
            self.scales = jax.device_put(
                jnp.asarray(scales, jnp.float32), row_sh)
        self.valid = jax.device_put(jnp.asarray(valid, bool), row_sh)
        self.degree = jax.device_put(
            jnp.asarray(degree, jnp.int32), row_sh)
        self.quality = jax.device_put(
            jnp.asarray(quality, jnp.float32), row_sh)
        self._fn_cache: dict[int, callable] = {}

    @property
    def capacity(self) -> int:
        return int(self.embeddings.shape[0])

    def _build(self, k: int):
        mesh = self.mesh
        rows_per_shard = self.rows_per_shard
        multislice = self.multislice
        row_axes = self._row_axes
        k_local = min(k, rows_per_shard)
        merge_axis = merge_topk_axis
        bits = self.bits

        def local_rank(queries, emb, valid_s, degree_s, quality_s,
                       packed, rel_q, match, w_q, *scales_s):
            n_local = emb.shape[0]
            q = queries.astype(jnp.float32)
            q = q / jnp.maximum(
                jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
            if bits == 16:
                scores = jax.lax.dot_general(
                    q, emb, dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32)  # [Q, n_local]
            else:
                # quantized cosine: the normalized query quantizes
                # in-execution, int8 x int8 accumulates in i32 on the
                # MXU, and the two symmetric scales rescale the result
                # (XLA upcasts mixed f32 x int8 dots ~100x on TPU)
                from lattice_tpu.ops.quant import _quant8_block, unpack_int4
                qv, qs = _quant8_block(q)
                rows_i8 = unpack_int4(emb) if bits == 4 else emb
                acc = jax.lax.dot_general(
                    qv, rows_i8,
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32)
                scores = (acc.astype(jnp.float32) * qs[:, None]
                          * scales_s[0][None, :])
            vec_all = jnp.where(valid_s[None, :], scores, NEG_INF)
            shard_id = jax.lax.axis_index(DATA_AXIS)
            if multislice:
                shard_id = (jax.lax.axis_index(DCN_AXIS)
                            * jax.lax.axis_size(DATA_AXIS) + shard_id)
            base = shard_id * rows_per_shard
            nq = queries.shape[0]
            w_b = (w_q if w_q.ndim == 2
                   else jnp.broadcast_to(w_q, (nq,) + w_q.shape))
            rel_b = (rel_q if rel_q.ndim == 2
                     else jnp.broadcast_to(rel_q, (nq,) + rel_q.shape))

            def body(_, per_q):
                vec, packed_i, m_rows, w, rel_t = per_q
                on = packed_i >= 0
                rows = (packed_i & REACH_ROW_MASK) - base
                in_shard = on & (rows >= 0) & (rows < n_local)
                depth_p = (packed_i >> REACH_ROW_BITS) & REACH_DEPTH_MAX
                rel_p = rel_t[(packed_i >> 29) & 3]
                safe = jnp.clip(rows, 0, n_local - 1)
                depth = jnp.full(
                    (n_local,), UNREACHED, dtype=jnp.int32).at[safe].min(
                    jnp.where(in_shard, depth_p,
                              UNREACHED).astype(jnp.int32))
                rel = jnp.zeros((n_local,), jnp.float32).at[safe].max(
                    jnp.where(in_shard, rel_p, 0.0))
                m_local = m_rows - base
                m_in = (m_rows >= 0) & (m_local >= 0) & (m_local < n_local)
                m_safe = jnp.clip(m_local, 0, n_local - 1)
                match_c = jnp.zeros(
                    (n_local,), jnp.float32).at[m_safe].max(
                    jnp.where(m_in, 1.0, 0.0))
                fused = _fuse_scores(depth, rel, vec, match_c, degree_s,
                                     quality_s, w)
                s, i = _select_topk(fused, k_local)
                return None, (s, i + base)

            _, (top_s, top_i) = jax.lax.scan(
                body, None, (vec_all, packed, match, w_b, rel_b))
            top_s, top_i = merge_axis(top_s, top_i, DATA_AXIS, k)
            if multislice:
                top_s, top_i = merge_axis(top_s, top_i, DCN_AXIS, k)
            # NEG_INF filler slots may carry divisibility-pad row ids
            # (>= the caller's capacity); pin them to row 0 so the id
            # contract matches the single-chip kernel, whose ids are
            # always < N (callers drop the slot by its sentinel score)
            top_i = jnp.where(top_s > NEG_INF / 2, top_i, 0)
            return top_s, top_i

        rep = P()
        in_specs = (rep, P(row_axes, None), P(row_axes), P(row_axes),
                    P(row_axes), rep, rep, rep, rep)
        if self.bits != 16:
            in_specs = in_specs + (P(row_axes),)    # per-row scales
        fn = shard_map(
            local_rank, mesh=mesh,
            in_specs=in_specs,
            out_specs=(rep, rep),
            check_vma=False,
        )
        return jax.jit(fn)

    def rank(self, queries: np.ndarray, packed_reach: np.ndarray,
             rel_table: np.ndarray, match_rows: np.ndarray,
             weights: np.ndarray, k: int
             ) -> tuple[np.ndarray, np.ndarray]:
        """([Q, k] scores, [Q, k] global row ids) across all shards.

        `packed_reach` [Q, R] in the `pack_reach` format (global row
        ids); `rel_table`/`weights` [4]/[8] or per-query [Q, 4]/[Q, 8];
        `match_rows` [Q, M] global row ids (-1 pad). Same contract as
        `ops/ranking.hybrid_rank_device_packed_batch`.
        """
        scores, rows = self.rank_device(
            jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32))),
            jnp.asarray(packed_reach), jnp.asarray(rel_table),
            jnp.asarray(match_rows), jnp.asarray(weights), k)
        return np.asarray(scores), np.asarray(rows)

    def rank_device(self, queries: jax.Array, packed_reach: jax.Array,
                    rel_table: jax.Array, match_rows: jax.Array,
                    weights: jax.Array, k: int
                    ) -> tuple[jax.Array, jax.Array]:
        """Device-resident variant: per-query tensors already placed,
        results left on device. Serving loops MUST use this — `rank`'s
        per-call host round-trip re-uploads the [Q, R] packed evidence
        (16 MB at Q=128/R=32k) and reads back through the relay, which
        measured 13x the kernel's own time at n=1 (r4 batch11: 9.93 vs
        0.745 ms/q) — the same trap `ShardedQuantizedIndex.search_device`
        exists to avoid (2.8k -> 50k qps, R4_TPU_RESULTS5)."""
        fn = self._fn_cache.get(k)
        if fn is None:
            fn = self._build(k)
            self._fn_cache[k] = fn
        args = (queries, self.embeddings, self.valid, self.degree,
                self.quality, packed_reach, rel_table, match_rows,
                weights)
        if self.bits != 16:
            args = args + (self.scales,)
        return fn(*args)
