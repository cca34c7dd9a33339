"""Corpus-sharded search: per-shard top-k + merge over ICI.

SURVEY §2.4 "data-parallel index sharding" + "distributed top-k merge":
the chunk-embedding matrix `[N, d]` is row-sharded over the `data` mesh
axis, queries are replicated, every chip scores its shard on the MXU and
selects a local top-k, and the (score, global-id) pairs merge across chips.
For k << N the merge payload is k pairs per chip; an `all_gather` of
`[B, k]` over ICI followed by a local re-select is bandwidth-optimal at
this size (a ppermute tree ladder only wins once D*k outgrows VMEM, far
beyond code-search regimes).

Built on `shard_map` so the per-shard body is exactly the single-chip
kernel from `ops/topk.py` — one code path, one oracle.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from lattice_tpu.ops import topk as topk_ops
from lattice_tpu.parallel.mesh import DATA_AXIS, DCN_AXIS, make_mesh


def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform.lower() in ("tpu", "axon")
    except Exception:
        return False


def merge_topk_axis(scores: jax.Array, idx: jax.Array, axis: str,
                    k_out: int) -> tuple[jax.Array, jax.Array]:
    """The candidate merge shared by every sharded view (index, quantized
    index, hybrid deep-rank): all_gather the per-shard [B, k] winners
    along a mesh axis, then re-select the global top-k_out. Runs INSIDE
    shard_map; the gather payload is k pairs per shard, never rows."""
    all_scores = jax.lax.all_gather(scores, axis, axis=0,
                                    tiled=False)     # [D, B, k]
    all_idx = jax.lax.all_gather(idx, axis, axis=0)
    d_, b, kk = all_scores.shape
    flat_s = jnp.transpose(all_scores, (1, 0, 2)).reshape(b, d_ * kk)
    flat_i = jnp.transpose(all_idx, (1, 0, 2)).reshape(b, d_ * kk)
    top_s, pos = jax.lax.top_k(flat_s, min(k_out, d_ * kk))
    return top_s, jnp.take_along_axis(flat_i, pos, axis=-1)


class ShardedIndex:
    """Row-sharded view of an embedding matrix for search.

    Mutations are O(delta): `update_rows` / `invalidate_rows` scatter into
    the sharded arrays under jit (GSPMD routes each update to the owning
    chip; indices/values are replicated — bytes moved per mutation are the
    delta rows, never the corpus). Donated inputs keep it in-place in HBM.
    A row id past the padded capacity forces a rebuild upstream — callers
    size capacity to the owning store's (geometrically-grown) capacity so
    that stays rare (VERDICT r1 #8: watch-mode mutations must not
    re-device_put the corpus).
    """

    def __init__(self, embeddings: np.ndarray | jax.Array, valid: np.ndarray,
                 mesh: Mesh | None = None, dtype: str = "bfloat16"):
        self.mesh = mesh or make_mesh()
        # multi-slice tier: rows shard over (dcn, data) combined; the
        # merge goes hierarchical (ICI gather within slice, k-sized
        # payloads across DCN)
        self.multislice = DCN_AXIS in self.mesh.axis_names
        self._row_axes = ((DCN_AXIS, DATA_AXIS) if self.multislice
                          else DATA_AXIS)
        n_data = self.mesh.shape[DATA_AXIS]
        if self.multislice:
            n_data *= self.mesh.shape[DCN_AXIS]
        n, d = embeddings.shape
        # Pad rows to a multiple of the data-axis size; padding rows invalid.
        pad = (-n) % n_data
        if pad:
            if isinstance(embeddings, jax.Array):
                embeddings = jnp.concatenate(
                    [embeddings, jnp.zeros((pad, d), embeddings.dtype)])
            else:
                embeddings = np.concatenate(
                    [embeddings, np.zeros((pad, d), embeddings.dtype)], axis=0)
            valid = np.concatenate([valid, np.zeros(pad, dtype=bool)])
        self.n_rows = n
        self.rows_per_shard = (n + pad) // n_data
        self._row_sharding = NamedSharding(self.mesh, P(self._row_axes))
        self._emb_sharding = NamedSharding(self.mesh,
                                           P(self._row_axes, None))
        self.embeddings = jax.device_put(
            jnp.asarray(embeddings, dtype=jnp.dtype(dtype)),
            self._emb_sharding)
        self.valid = jax.device_put(jnp.asarray(valid), self._row_sharding)
        self._search_cache: dict[tuple[int, bool], callable] = {}
        self._force_pallas = False       # tests: exercise the Pallas path
        self._pallas_interpret = False   # ... in interpret mode off-TPU
        # No donation: on a 1-device mesh device_put can alias the caller's
        # array, and donating a shared buffer would delete it under the
        # owning store. The scatter's transient double-buffer is HBM-
        # internal; the point here is that host->device traffic is only
        # the delta rows.
        self._update_fn = jax.jit(
            lambda emb, val, idx, rows: (emb.at[idx].set(rows),
                                         val.at[idx].set(True)),
            out_shardings=(self._emb_sharding, self._row_sharding))
        self._invalidate_fn = jax.jit(
            lambda val, idx: val.at[idx].set(False),
            out_shardings=self._row_sharding)

    @property
    def capacity(self) -> int:
        return int(self.embeddings.shape[0])

    def update_rows(self, vectors: np.ndarray | jax.Array,
                    rows: np.ndarray) -> bool:
        """Scatter `vectors` into `rows` on-shard. Returns False (caller
        must rebuild) iff a row id exceeds the padded capacity."""
        rows = np.asarray(rows, dtype=np.int32)
        if rows.size == 0:
            return True
        if int(rows.max()) >= self.capacity:
            return False
        vals = jnp.asarray(vectors, dtype=self.embeddings.dtype)
        self.embeddings, self.valid = self._update_fn(
            self.embeddings, self.valid, jnp.asarray(rows), vals)
        self.n_rows = max(self.n_rows, int(rows.max()) + 1)
        return True

    def invalidate_rows(self, rows: np.ndarray) -> None:
        rows = np.asarray(
            [r for r in np.asarray(rows) if r < self.capacity],
            dtype=np.int32)
        if rows.size == 0:
            return
        self.valid = self._invalidate_fn(self.valid, jnp.asarray(rows))

    def _build_search(self, k: int, with_mask: bool = False):
        mesh = self.mesh
        rows_per_shard = self.rows_per_shard
        multislice = self.multislice
        row_axes = self._row_axes
        # A shard can hold fewer rows than k; select what exists locally and
        # let the merge re-select the global k.
        k_local = min(k, rows_per_shard)
        # Per-shard kernel: the Pallas binned scan on real TPU (XLA's
        # [B, rows_per_shard] score slab costs HBM round-trips the fused
        # kernel never pays); XLA flat scan elsewhere / when the shard
        # doesn't tile. Tests force the interpret path on the CPU mesh.
        from lattice_tpu.ops import pallas_topk as pk
        tile = pk.pick_tile(rows_per_shard, 8, k=max(k_local, 16))
        use_pallas = ((self._force_pallas or _on_tpu())
                      and tile is not None and k_local <= 64)
        interp = self._pallas_interpret

        def local_topk(queries, emb_shard, valid_shard):
            if use_pallas:
                return pk.binned_topk(queries, emb_shard, valid_shard,
                                      k_local, tile=tile, interpret=interp)
            return topk_ops.flat_topk(queries, emb_shard, valid_shard,
                                      k_local)

        merge_axis = merge_topk_axis

        def local_search(queries, emb_shard, valid_shard, *mask_shard):
            # queries replicated; emb/valid(/mask) are this chip's rows.
            # normalization rides inside the execution (host numpy + an
            # extra upload otherwise).
            from lattice_tpu.ops.quant import _l2n
            queries = _l2n(queries)
            if mask_shard:
                valid_shard = valid_shard & mask_shard[0]
            scores, idx = local_topk(queries, emb_shard, valid_shard)
            scores, idx = scores[:, :k_local], idx[:, :k_local]
            shard_id = jax.lax.axis_index(DATA_AXIS)
            if multislice:
                shard_id = (jax.lax.axis_index(DCN_AXIS)
                            * jax.lax.axis_size(DATA_AXIS) + shard_id)
            global_idx = idx + shard_id * rows_per_shard
            # hierarchical merge: the bulk candidate gather rides ICI
            # (within slice); only the slice's final [B, k] crosses DCN
            scores, global_idx = merge_axis(scores, global_idx,
                                            DATA_AXIS, k)
            if multislice:
                scores, global_idx = merge_axis(scores, global_idx,
                                                DCN_AXIS, k)
            return scores, global_idx

        in_specs = (P(), P(row_axes, None), P(row_axes))
        if with_mask:
            in_specs = in_specs + (P(row_axes),)
        fn = shard_map(
            local_search, mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def search(self, queries: np.ndarray, k: int,
               mask: np.ndarray | None = None
               ) -> tuple[np.ndarray, np.ndarray]:
        """Global (scores [B,k], row ids [B,k]) across all shards.

        `mask` ([n_rows] bool, e.g. a payload-filter mask) ANDs into each
        shard's validity; it is row-sharded alongside the embeddings so
        the filtered search stays one collective round.
        """
        with_mask = mask is not None
        # the compiled closure bakes in the Pallas force/interpret flags,
        # so they must be part of the cache key (toggling them after a
        # first search would otherwise serve the stale kernel)
        key = (k, with_mask, self._force_pallas, self._pallas_interpret)
        fn = self._search_cache.get(key)
        if fn is None:
            fn = self._build_search(k, with_mask)
            self._search_cache[key] = fn
        q = jnp.asarray(np.atleast_2d(np.asarray(queries, np.float32)))
        if with_mask:
            m = np.asarray(mask, dtype=bool)
            pad = self.valid.shape[0] - m.shape[0]
            if pad:
                m = np.concatenate([m, np.zeros(pad, dtype=bool)])
            m_dev = jax.device_put(
                jnp.asarray(m), self._row_sharding)
            scores, idx = fn(q, self.embeddings, self.valid, m_dev)
        else:
            scores, idx = fn(q, self.embeddings, self.valid)
        return np.asarray(scores), np.asarray(idx)


class ShardedQuantizedIndex:
    """Quantized row-sharded view: 2x (int8) or 4x (int4) corpus per chip.

    Same per-shard-top-k + merge shape as `ShardedIndex` (including the
    multislice hierarchical merge and payload-filter masks), but each
    shard holds symmetric per-row quantized values + f32 scales
    (ops/quant.py) — `bits=8` halves the bytes of bf16, `bits=4` packs
    two nibbles per byte for a quarter. Scores carry the quantization
    error (int8 ~1e-2 cosine, like bf16; int4 coarser — pair with a
    host rescore of the k winners when ordering matters); the
    exact-rescore stage stays single-host because full-precision rows are
    deliberately NOT resident (that would forfeit the capacity win).
    Mutations are O(delta) scatters exactly as in ShardedIndex.
    """

    def __init__(self, embeddings: np.ndarray, valid: np.ndarray,
                 mesh: Mesh | None = None, bits: int = 8,
                 keep_full_precision: bool = False):
        """`keep_full_precision=True` shards a bf16 copy of the rows
        alongside the quantized planes and rescores candidates against it
        in-shard. That forfeits the capacity win (it is the SPEED
        configuration: the scan reads 1/4-1/2 the bytes, the rescore
        gathers k1 bf16 rows) but restores exact ordering — measured
        necessity: on tightly-clustered corpora the true top-10 are
        near-ties finer than the int4 step, so a dequantized-int4 rescore
        cannot beat the raw int4 ordering (~0.80 recall@10 on chip,
        R3 phase C; candidate COVERAGE at width 64 is 1.0, so an exact
        rescore recovers ~1.0)."""
        from lattice_tpu.ops.quant import quantize_rows, quantize_rows_int4
        if bits not in (8, 4):
            raise ValueError(f"bits must be 8 or 4, got {bits}")
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
            embeddings = np.concatenate(
                [embeddings, np.zeros((pad, d), embeddings.dtype)], axis=0)
            valid = np.concatenate([valid, np.zeros(pad, dtype=bool)])
        self.n_rows = n
        self.rows_per_shard = (n + pad) // n_data
        quant = quantize_rows if bits == 8 else quantize_rows_int4
        values, scales = quant(np.asarray(embeddings, np.float32))
        self._row_sharding = NamedSharding(self.mesh, P(self._row_axes))
        self._val_sharding = NamedSharding(self.mesh,
                                           P(self._row_axes, None))
        self._n_data = n_data
        self.values = jax.device_put(jnp.asarray(values), self._val_sharding)
        # scales/valid live ONLY as the [N, 1] kernel-layout columns
        # below (the flat [N] twins were scattered on every mutation and
        # drifted out of the memory accounting — r4 review); the
        # `scales`/`valid` properties derive the flat views on demand.
        # kernel-layout [N, 1] columns, PRE-SHAPED per shard: the r4
        # sharded trace showed the in-jit [N] -> [N,1] relayouts cost
        # 1.5 ms of a 4.6 ms per-call device budget (R4_TPU_RESULTS4
        # trace_sharded: %copy.9 + %reshape.55) — the same lesson the
        # flat tier learned in r2 (`pallas_topk.scales_col`). The
        # layout must ALSO be forced row-major: a plain device_put under
        # a NamedSharding materializes {0,1:T(1,128)} for [N,1], and
        # XLA then re-copies 5 MB to the custom-call's row-major demand
        # EVERY search (%copy.11 3.4 ms + %copy.12 1.1 ms of a ~7 ms
        # call, R4_TPU_RESULTS5 trace_sharded_device)
        self._col_format = self._row_major_col_format()
        scol_fmt = self._col_format or self._val_sharding
        self.scales_col = jax.device_put(
            jnp.asarray(scales).reshape(-1, 1).astype(jnp.float32),
            scol_fmt)
        self.valid_col = jax.device_put(
            jnp.asarray(valid).astype(jnp.int8).reshape(-1, 1),
            scol_fmt)
        self.full_precision = (
            jax.device_put(jnp.asarray(embeddings, dtype=jnp.bfloat16),
                           self._val_sharding)
            if keep_full_precision else None)
        self._search_cache: dict[tuple[int, bool], callable] = {}
        self._force_pallas = False
        self._pallas_interpret = False
        col_out = self._col_format or self._val_sharding
        self._update_fn = jax.jit(
            lambda v, scol, vcol, idx, nv, ns: (
                v.at[idx].set(nv),
                scol.at[idx, 0].set(ns), vcol.at[idx, 0].set(1)),
            out_shardings=(self._val_sharding, col_out, col_out))
        self._invalidate_fn = jax.jit(
            lambda vcol, idx: vcol.at[idx, 0].set(0),
            out_shardings=col_out)
        self._update_fp_fn = jax.jit(
            lambda fp, idx, v: fp.at[idx].set(v.astype(jnp.bfloat16)),
            out_shardings=self._val_sharding)

    def _row_major_col_format(self):
        """Format forcing major_to_minor=(0,1) on the sharded [N,1]
        columns (HLO {1,0}, the Pallas custom-call's operand demand).
        Returns None where the backend rejects explicit layouts (CPU
        test meshes) — there the relayout copy doesn't exist anyway."""
        try:
            from jax.experimental.layout import Format, Layout
            fmt = Format(Layout((0, 1)), self._val_sharding)
            # probe: some backends accept the type but reject at use.
            # The probe shape must be divisible by the data-axis size or
            # the NamedSharding itself raises before layout support is
            # exercised, silently disabling the forcing on exactly the
            # multi-device meshes it exists for (r4 review finding)
            jax.device_put(jnp.zeros((self._n_data * 8, 1), jnp.float32),
                           fmt)
            return fmt
        except Exception:
            return None

    def memory_bytes(self) -> int:
        fp = (self.full_precision.size * 2
              if self.full_precision is not None else 0)
        return (self.values.size + self.scales_col.size * 4
                + self.valid_col.size + fp)

    @property
    def capacity(self) -> int:
        return int(self.values.shape[0])

    @property
    def scales(self) -> jax.Array:
        """Flat [N] view of the per-row scales (derived; the stored
        form is the kernel-layout column)."""
        return self.scales_col.reshape(-1)

    @property
    def valid(self) -> jax.Array:
        """Flat [N] bool validity view (derived from the column)."""
        return self.valid_col.reshape(-1) != 0

    def update_rows(self, vectors: np.ndarray | jax.Array,
                    rows: np.ndarray) -> bool:
        from lattice_tpu.ops.quant import (quantize_rows_device,
                                           quantize_rows_int4_device)
        rows = np.asarray(rows, dtype=np.int32)
        if rows.size == 0:
            return True
        if int(rows.max()) >= self.capacity:
            return False
        quant = (quantize_rows_device if self.bits == 8
                 else quantize_rows_int4_device)
        nv, ns = quant(jnp.asarray(vectors, jnp.float32))
        self.values, self.scales_col, self.valid_col = self._update_fn(
            self.values, self.scales_col, self.valid_col,
            jnp.asarray(rows), nv, ns)
        if self.full_precision is not None:
            self.full_precision = self._update_fp_fn(
                self.full_precision, jnp.asarray(rows),
                jnp.asarray(vectors, jnp.float32))
        self.n_rows = max(self.n_rows, int(rows.max()) + 1)
        return True

    def invalidate_rows(self, rows: np.ndarray) -> None:
        rows = np.asarray(
            [r for r in np.asarray(rows) if r < self.capacity],
            dtype=np.int32)
        if rows.size == 0:
            return
        self.valid_col = self._invalidate_fn(self.valid_col,
                                             jnp.asarray(rows))

    def _build_search(self, k: int, with_mask: bool = False,
                      rescore: bool = True):
        from lattice_tpu.ops import pallas_topk as pk
        from lattice_tpu.ops.quant import (NEG_INF, int4_topk, int8_topk,
                                           unpack_int4)
        xla_topk = int8_topk if self.bits == 8 else int4_topk
        binned = (pk.binned_topk_int8 if self.bits == 8
                  else pk.binned_topk_int4)
        mesh = self.mesh
        bits = self.bits
        rows_per_shard = self.rows_per_shard
        multislice = self.multislice
        row_axes = self._row_axes
        k_local = min(k, rows_per_shard)
        # Widen-then-rescore defaults, inherited from the measured flat
        # paths (VERDICT r2 #6; R2_TPU_RESULTS11 int4 first-stage recall
        # 0.775 on chip): int4 widens 8x (floor 32) like Int4View, int8 4x
        # (floor 16) like QuantizedView; each shard then exact-rescores its
        # own candidates against DEQUANTIZED rows (the binned first stage
        # scores through packed bf16 bin maxima — an f32 dot on the same
        # quantized rows already fixes the ordering; full-precision rows
        # stay non-resident by design).
        widen, floor = (8, 32) if bits == 4 else (4, 16)
        k1 = min(max(widen * k, floor), rows_per_shard)
        # the binned kernels select through a 64-slot register file; cap
        # the Pallas first stage there (per-shard width; the global
        # candidate pool is still D shards x k1). The Pallas stage must
        # still cover k_local — when k > 64 the XLA first stage serves.
        k1p = min(k1, 64)
        # Per-shard kernel: the fused Pallas scan on real TPU (XLA int8
        # dots upcast there — measured ~100x slower); XLA elsewhere.
        # int4 shards use the packed tile preference (4096-first) exactly
        # as the single-chip Int4View does.
        pick = pk.pick_tile if self.bits == 8 else pk.pick_tile_packed
        stage_k = (k1p if rescore else k_local)
        tile = pick(rows_per_shard, 8, k=max(stage_k, 16))
        use_pallas = ((self._force_pallas or _on_tpu())
                      and tile is not None and stage_k <= 64
                      and k1p >= k_local)
        interp = self._pallas_interpret
        kk = (k1p if use_pallas else k1) if rescore else k_local
        has_fp = self.full_precision is not None

        def local_topk(qf, qv, qs, v_shard, scol_shard, vcol_shard,
                       fp_shard):
            # scol/vcol arrive PRE-SHAPED [rows, 1] in the kernel layout
            # (in-jit relayout cost 1.5 ms/call of a 4.6 ms device
            # budget, R4_TPU_RESULTS4 trace)
            if use_pallas:
                s1, c1 = binned(qv, qs, v_shard, scol_shard, vcol_shard,
                                kk, tile=tile, interpret=interp)
                s1, c1 = s1[:, :kk], c1[:, :kk]
            else:
                s1, c1 = xla_topk(qv, qs, v_shard,
                                  scol_shard.reshape(-1),
                                  vcol_shard.reshape(-1).astype(bool), kk)
            if not rescore:
                return s1[:, :k_local], c1[:, :k_local]
            # rescore even when kk == k_local: the Pallas first stage
            # scores through bin maxima, and with full-precision rows the
            # exact dot changes ordering the quantized rows cannot express
            if fp_shard is not None:
                # exact bf16 rescore (speed configuration): recovers the
                # true ordering the quantized rows cannot express
                emb = fp_shard[c1].astype(jnp.float32)
            else:
                rows = v_shard[c1]                   # [B, k1, d(/2)] gather
                if bits == 4:
                    rows = unpack_int4(rows)
                emb = rows.astype(jnp.float32) * scol_shard[c1]
            sc = jnp.einsum("bd,bkd->bk", qf, emb,
                            precision=jax.lax.Precision.HIGHEST)
            sc = jnp.where(s1 > NEG_INF / 2, sc, NEG_INF)
            top_s, pos = jax.lax.top_k(sc, k_local)
            return top_s, jnp.take_along_axis(c1, pos, axis=-1)

        merge_axis = merge_topk_axis

        def local_search(q_raw, v_shard, scol_shard, vcol_shard, *extra):
            # normalize + quantize INSIDE the execution: replicated
            # per-shard compute is trivial, and the host-side version
            # cost one numpy pass + two extra uploads per call
            from lattice_tpu.ops.quant import _l2n, quantize_rows_device
            q_f32 = _l2n(q_raw)
            q_values, q_scales = quantize_rows_device(q_f32)
            extra = list(extra)
            fp_shard = extra.pop(0) if has_fp else None
            if extra:
                # payload-filter mask ANDs into the validity column
                vcol_shard = vcol_shard * extra[0][:, None].astype(jnp.int8)
            scores, idx = local_topk(q_f32, q_values, q_scales, v_shard,
                                     scol_shard, vcol_shard, fp_shard)
            shard_id = jax.lax.axis_index(DATA_AXIS)
            if multislice:
                shard_id = (jax.lax.axis_index(DCN_AXIS)
                            * jax.lax.axis_size(DATA_AXIS) + shard_id)
            global_idx = idx + shard_id * rows_per_shard
            scores, global_idx = merge_axis(scores, global_idx,
                                            DATA_AXIS, k)
            if multislice:
                scores, global_idx = merge_axis(scores, global_idx,
                                                DCN_AXIS, k)
            return scores, global_idx

        in_specs = (P(), P(row_axes, None), P(row_axes), P(row_axes))
        if has_fp:
            in_specs = in_specs + (P(row_axes, None),)
        if with_mask:
            in_specs = in_specs + (P(row_axes),)
        fn = shard_map(
            local_search, mesh=mesh,
            in_specs=in_specs,
            out_specs=(P(), P()),
            check_vma=False,
        )
        return jax.jit(fn)

    def search(self, queries: np.ndarray, k: int,
               mask: np.ndarray | None = None, rescore: bool = True
               ) -> tuple[np.ndarray, np.ndarray]:
        """Global (scores [B,k], row ids [B,k]).

        By default each shard widens its first stage and exact-rescores
        the candidates against its own dequantized rows before the merge,
        so scores come back f32-ordered (rescore=False keeps the raw
        single-stage quantized scan)."""
        with_mask = mask is not None
        q = np.atleast_2d(np.asarray(queries, dtype=np.float32))
        m_dev = None
        if with_mask:
            m = np.asarray(mask, dtype=bool)
            pad = self.capacity - m.shape[0]
            if pad:
                m = np.concatenate([m, np.zeros(pad, dtype=bool)])
            m_dev = jax.device_put(jnp.asarray(m), self._row_sharding)
        scores, idx = self.search_device(jnp.asarray(q), k, mask=m_dev,
                                         rescore=rescore)
        return np.asarray(scores), np.asarray(idx)

    def search_device(self, queries: "jax.Array", k: int,
                      mask: "jax.Array | None" = None, rescore: bool = True
                      ) -> tuple["jax.Array", "jax.Array"]:
        """Device-resident variant: [B, d] queries already on device,
        results left on device. Serving loops batch uploads/readbacks
        around MANY of these calls — a per-call 256x768 f32 query upload
        through the ~20 MB/s relay costs ~39 ms against ~12 ms of device
        compute (R4_TPU_RESULTS4 trace vs wall)."""
        with_mask = mask is not None
        # the compiled closure bakes in the Pallas force/interpret flags,
        # so they must be part of the cache key (toggling them after a
        # first search would otherwise serve the stale kernel)
        key = (k, with_mask, rescore, self._force_pallas,
               self._pallas_interpret)
        fn = self._search_cache.get(key)
        if fn is None:
            fn = self._build_search(k, with_mask, rescore)
            self._search_cache[key] = fn
        args = [queries, self.values, self.scales_col, self.valid_col]
        if self.full_precision is not None:
            args.append(self.full_precision)
        if with_mask:
            args.append(mask)
        return fn(*args)


@functools.partial(jax.jit, static_argnames=("k", "axis_name"))
def tree_merge_topk(scores: jax.Array, idx: jax.Array, k: int,
                    axis_name: str = DATA_AXIS):
    """Alternative ppermute reduce ladder for very large D*k merges.

    log2(D) rounds; each round halves the live participants by pairwise
    `merge_topk`. Exposed for benchmarking against the all_gather path.
    """
    n = jax.lax.axis_size(axis_name)
    rounds = max(int(np.ceil(np.log2(max(n, 1)))), 0)
    my = jax.lax.axis_index(axis_name)

    def body(i, carry):
        s, x = carry
        stride = 2 ** i
        perm = [(j, (j - stride) % n) for j in range(n)]
        rs = jax.lax.ppermute(s, axis_name, perm)
        rx = jax.lax.ppermute(x, axis_name, perm)
        ns, nx = topk_ops.merge_topk(s, x, rs, rx, k)
        take = (my % (2 * stride)) == 0
        s = jnp.where(take, ns, s)
        x = jnp.where(take, nx, x)
        return (s, x)

    s, x = scores, idx
    for i in range(rounds):
        s, x = body(i, (s, x))
    return s, x
