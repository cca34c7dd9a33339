"""HBM-resident vector index with payload filtering.

This replaces the Qdrant server + client (reference `embeddings/client.py:18-228`):
- two named collections (`code_chunks`, `summaries`, `client.py:13-15`) ->
  two `ChunkStore` instances owned by `VectorIndexer`
- cosine-distance vectors sized to the embedding dim (`client.py:93-102`) ->
  L2-normalized rows in a `[capacity, d]` device matrix (bf16 by default),
  scored by MXU matmul in `ops/topk.py`
- keyword payload indexes on file_path/entity_type/language/content_hash/
  project_name (`client.py:77-113`) -> host inverted indexes producing
  boolean row masks ANDed into the score kernel
- upsert/delete/scroll (`client.py:115-202`) -> freelist rows + device
  row writes; `file_needs_update` via the stored content-hash column

Capacity grows geometrically; deleted rows go to a freelist and are masked
out of search by the `valid` bitmap, so deletion is O(1) and never reshapes
the device array (append segments + reuse, SURVEY §7 hard part (d)).
"""

from __future__ import annotations

import dataclasses
import logging
import math
import os
import re
import threading
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from lattice_tpu.core.errors import VectorStoreError
from lattice_tpu.ops import topk as topk_ops
from lattice_tpu.ops import pallas_topk as pallas_ops

# Payload fields with inverted indexes (reference `embeddings/client.py:103-113`
# plus graph_node_id, the vector->graph join key used by the context builder).
# every method string _plan_search_impl accepts; surfaces (HTTP, MCP)
# validate requests against this before minting per-config serving state
SEARCH_METHODS = ("auto", "flat", "pallas", "refined", "ivf", "pq",
                  "quantized", "int4", "sharded")

INDEXED_FIELDS = ("file_path", "entity_type", "language", "content_hash",
                  "project_name", "graph_node_id")


@dataclasses.dataclass(frozen=True)
class RankColumns:
    """Resident ranking columns (see `ChunkStore.device_rank_columns`)."""

    node_ids: jax.Array          # [cap] i32 graph node id per row (-1)
    quality: jax.Array           # [cap] f32 content-quality heuristic
    degree: jax.Array            # [cap] i32 CALLS degree centrality
    node_row_indptr: np.ndarray  # [n_nodes+1] host CSR: node -> rows
    node_row_indices: np.ndarray
    generation: int              # graph finalize generation it was built at

    def rows_for_nodes(self, node_ids: np.ndarray, *value_arrays
                       ) -> tuple[np.ndarray, ...]:
        """Vectorized node->rows expansion; each aligned per-node value
        array comes back repeated per row."""
        from lattice_tpu.ops.graph_kernels import csr_expand
        return csr_expand(self.node_row_indptr, self.node_row_indices,
                          node_ids, *value_arrays)

def _index_payload(inverted: dict, row: int, payload: dict) -> None:
    """Add one payload's indexed fields to an inverted-index dict (the
    single definition shared by add / from_device_arrays / compact)."""
    for f in INDEXED_FIELDS:
        v = payload.get(f)
        if v is not None:
            inverted[f].setdefault(v, set()).add(row)


# ---- lexical name tokens (round-5 retrieval-quality channel) ---------------
# The golden eval exposed the gap: "drain the webhook delivery queue"
# missed DeliveryQueue.drain even though the query names the method —
# plain cosine over hash n-grams under-weights identifier matches, and
# the planner's entity extraction only fires on code-shaped tokens
# (CamelCase/snake_case), never plain words. These helpers split entity
# names into searchable word tokens for an IDF-weighted exact-token
# channel that complements the dense path (classic hybrid code search;
# the reference got a weak version implicitly via Qdrant payload match).

_CAMEL_SPLIT_RE = re.compile(
    r"(?<=[a-z0-9])(?=[A-Z])|(?<=[A-Z])(?=[A-Z][a-z])")

_QUERY_STOPWORDS = frozenset(
    "the a an of to in for from by with and or is are was were does do did "
    "how what where who which when why show me find all any that this it "
    "its on at as be been has have had not no can could should would my "
    "our your their like using use used via into onto".split())


def _stem(w: str) -> str:
    """Light stemmer applied identically to name and query tokens —
    consistency is what matters, not linguistic correctness ("queue" and
    "queues" both landing on "queu" is a match). Folds plurals and the
    common verb suffixes so "byte count" finds humanize_bytes and
    "deliveries" finds DeliveryQueue."""
    for suf, rep in (("ization", "ize"), ("ational", "ate"),
                     ("ies", "y"), ("sses", "ss")):
        if w.endswith(suf) and len(w) > len(suf) + 2:
            w = w[: -len(suf)] + rep
            break
    if w.endswith("ing") and len(w) > 5:
        w = w[:-3]
    elif w.endswith("ed") and len(w) > 4:
        w = w[:-2]
    elif (w.endswith("s") and len(w) > 3
          and not w.endswith(("ss", "us", "is"))):
        w = w[:-1]
    if w.endswith(("ize", "ise")) and len(w) > 5:
        w = w[:-3]
    if w.endswith("e") and len(w) > 4:
        w = w[:-1]
    return w


def name_token_set(name: str) -> frozenset[str]:
    """Word tokens of an entity name: last two dotted segments (method +
    class, or function + module), split on underscores and camelCase,
    lowercased, stemmed. `DeliveryQueue.drain` -> {delivery, queu,
    drain} (stemmed forms; queries stem the same way)."""
    if not isinstance(name, str):
        # payloads are arbitrary dicts; one non-string 'name' must not
        # crash the index rebuild (which would black out every vector
        # search through _vector_phase's catch — review r5)
        name = str(name)
    toks: set[str] = set()
    for seg in name.split(".")[-2:]:
        for part in seg.replace("-", "_").split("_"):
            for w in _CAMEL_SPLIT_RE.split(part):
                w = _stem(w.lower())
                if len(w) >= 2:
                    toks.add(w)
    return frozenset(toks)


def query_token_set(text: str) -> frozenset[str]:
    """Lexical query tokens: words + identifier pieces, minus stopwords."""
    toks: set[str] = set()
    for raw in re.findall(r"[A-Za-z_][A-Za-z0-9_]*", text):
        for part in raw.replace("-", "_").split("_"):
            for w in _CAMEL_SPLIT_RE.split(part):
                w = w.lower()
                if len(w) >= 2 and w not in _QUERY_STOPWORDS:
                    w = _stem(w)
                    if len(w) >= 2:
                        toks.add(w)
    return frozenset(toks)


logger = logging.getLogger(__name__)

# ---- auto-dispatch thresholds (VERDICT r1 #1: the best kernels must BE the
# serving path, picked by an explicit, unit-tested decision table) ----------
# IVF pays a one-time device build (~12-15 s at 1M rows) and then reads only
# nprobe buckets per query; below this corpus size the flat fused scan is
# already < 1 ms/batch and the build never amortizes.
IVF_AUTO_MIN_ROWS = int(os.environ.get("LATTICE_IVF_MIN_ROWS", 131_072))
# Probe selection is not filter-aware: a filter matching under this fraction
# of live rows (or fewer than FILTER_MIN_MATCH_PER_K * k rows) starves the
# probed buckets and recall collapses -> route to flat, which filters exactly.
IVF_MIN_FILTER_FRACTION = 0.05
IVF_FILTER_MIN_MATCH_PER_K = 50
# Serve through IVF only when its build-time self-measured recall clears
# this bar (isotropic corpora measure ~0.2 and stay on the flat path).
IVF_MIN_RECALL = float(os.environ.get("LATTICE_IVF_MIN_RECALL", 0.9))
IVF_AUTO_NPROBE = int(os.environ.get("LATTICE_IVF_NPROBE", 8))
# Measured crossover vs the int8 flat tier (bench_r2, v5e, 1M x 768):
# at B=256 the int8 two-stage serves 46k qps vs fused-IVF's 28.5k — the
# probe kernel's per-query bucket DMAs don't batch-amortize the way one
# big streamed matmul does — while at B=1 IVF wins 2.9 ms vs 5.9. IVF
# also wins once the corpus outgrows what a flat scan streams in ~10 ms
# (probe traffic is ~nprobe/C of the corpus). Between those, flat-int8.
IVF_SMALL_BATCH = int(os.environ.get("LATTICE_IVF_SMALL_BATCH", 32))
IVF_FLAT_CROSSOVER_ROWS = int(
    os.environ.get("LATTICE_IVF_CROSSOVER_ROWS", 2_000_000))
# Sharded serving quantizes automatically under memory pressure: int8
# once bf16 rows would occupy more than half a chip's HBM (transients +
# views need the rest), int4 once they would exceed a full chip.
# LATTICE_SHARDED_BITS=16/8/4 (or legacy LATTICE_SHARDED_INT8=1/0) forces.
CHIP_HBM_GB = float(os.environ.get("LATTICE_CHIP_HBM_GB", 16.0))


@jax.jit
def _normalize_queries(q: jax.Array) -> jax.Array:
    """One-dispatch l2 normalization (eager jnp here was 3+ dispatches,
    each ~1-2 ms over the axon relay — R2_TPU_RESULTS7)."""
    q = q.astype(jnp.float32)
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)


def _fused_delta_apply(kept: dict, donated: dict, idx: jax.Array,
                       normed: jax.Array) -> tuple[dict, dict]:
    """ONE-execution delta upsert: scatter new rows into the embedding
    matrix + validity mask and re-quantize/scatter the live int8/int4
    shadows, all in a single XLA execution.

    Eagerly this was ~9 dispatches (emb, valid, then per shadow:
    quantize + values + scales + scales-col scatters), each paying the
    relay's ~1-3 ms fixed dispatch cost AND a full-buffer copy (eager
    scatters can't donate) — 73.7 ms for 256 rows at 1M x 768
    (BENCH_r03). The `donated` dict (the view shadows, store-internal so
    nothing else can hold their buffers) updates in place; `kept` holds
    the publicly exposed emb/valid (`device_arrays`), which must not be
    donated out from under callers.
    """
    from lattice_tpu.ops import quant as quant_ops
    out_k = {
        "emb": kept["emb"].at[idx].set(normed.astype(kept["emb"].dtype)),
        "valid": kept["valid"].at[idx].set(True),
    }
    out_d = {}
    if "q_values" in donated:
        v, s = quant_ops.quantize_rows_device(normed)
        out_d["q_values"] = donated["q_values"].at[idx].set(v)
        out_d["q_scales"] = donated["q_scales"].at[idx].set(s)
        out_d["q_col"] = donated["q_col"].at[idx, 0].set(s)
    if "i4_values" in donated:
        v4, s4 = quant_ops.quantize_rows_int4_device(normed)
        out_d["i4_values"] = donated["i4_values"].at[idx].set(v4)
        out_d["i4_scales"] = donated["i4_scales"].at[idx].set(s4)
        out_d["i4_col"] = donated["i4_col"].at[idx, 0].set(s4)
    return out_k, out_d


_fused_delta = jax.jit(_fused_delta_apply, donate_argnums=(1,))


class ChunkStore:
    def __init__(self, dim: int, dtype: str = "bfloat16",
                 initial_capacity: int = 1024, device_put: bool = True):
        if dim <= 0:
            raise VectorStoreError(f"bad dim {dim}")
        self.dim = dim
        self.dtype = jnp.dtype(dtype)
        self._cap = max(int(initial_capacity), 8)
        self._emb = jnp.zeros((self._cap, dim), dtype=self.dtype)
        self._valid = jnp.zeros((self._cap,), dtype=bool)
        self._valid_host = np.zeros((self._cap,), dtype=bool)
        self._payloads: list[dict[str, Any] | None] = [None] * self._cap
        self._free: list[int] = []
        self._size = 0
        self._next = 0
        self._inverted: dict[str, dict[Any, set[int]]] = {f: {} for f in INDEXED_FIELDS}
        self._device_put = device_put
        # serializes the lazy check-then-build of serving views (IVF /
        # int8 / int4) and the plan cache: the HTTP serving surface
        # drives searches from many threads (serving/http.py), and two
        # threads racing a multi-second device build would both run it
        # and interleave the dirty-flag mutations
        self._serve_lock = threading.RLock()
        self._ivf = None           # lazily built IVF partition (ops/ivf.py)
        self._ivf_dirty = True
        self._ivf_mutations = 0    # rows churned since last build
        self._quant = None         # int8 shadow (ops/quant.py)
        self._quant_dirty = True
        self._int4 = None          # packed-int4 shadow (4x capacity tier)
        self._int4_dirty = True
        self._pq = None            # uint8-code capacity tier (ops/pq.py)
        self._pq_dirty = True
        self._pq_mutations = 0
        self._sharded = None       # multi-chip view (parallel/sharded_index.py)
        self._sharded_dirty = True
        self._shardedq = None      # multi-chip int8 view (2x corpus/chip)
        self._shardedq_dirty = True
        self._rank_cols = None     # (node_ids, quality) device columns for
        self._rank_cols_dirty = True  # the fused hybrid rank (ops/ranking.py)
        self._sharded_rank = None  # multi-chip hybrid deep-rank view
        self._lex_tokens = None    # name-token inverted index, lazy
        # (None = build on next lexical_candidates). Once built, add/
        # remove maintain it INCREMENTALLY like _inverted — a wholesale
        # rebuild is O(corpus) under _serve_lock and stalled every
        # serving thread per watcher mutation (review r5); only row-id
        # moves (compact) and clear() fall back to a rebuild.

    @classmethod
    def from_device_arrays(cls, embeddings: jax.Array, valid: jax.Array,
                           payloads: Sequence[dict[str, Any]] | None = None
                           ) -> "ChunkStore":
        """Wrap an already-device-resident normalized matrix (read-mostly).

        Used when the corpus is generated or loaded straight on device
        (bench.py, bulk restore): no host round-trip, no per-row insert
        loop. Without `payloads`, rows share one empty payload sentinel
        and payload filtering is unavailable; mutation APIs require real
        payloads (`add` after attach works normally).
        """
        n, d = embeddings.shape
        # tiny initial alloc; the real arrays replace it immediately
        store = cls(dim=int(d), dtype=str(embeddings.dtype),
                    initial_capacity=8)
        store._cap = int(n)
        store._emb = embeddings
        store._valid = valid.astype(bool)
        store._valid_host = np.asarray(store._valid)
        live = np.flatnonzero(store._valid_host)
        if payloads is None:
            sentinel: dict[str, Any] = {}
            store._payloads = [None] * n
            for r in live:
                store._payloads[r] = sentinel
        else:
            if len(payloads) != n:
                raise VectorStoreError("payloads must cover every row")
            store._payloads = [dict(p) if store._valid_host[i] else None
                               for i, p in enumerate(payloads)]
            for r in live:
                _index_payload(store._inverted, int(r), store._payloads[r])
        store._size = int(len(live))
        store._next = int(n)
        return store

    # ---- capacity ------------------------------------------------------

    def __len__(self) -> int:
        return self._size

    @property
    def capacity(self) -> int:
        return self._cap

    def _grow(self, needed: int) -> None:
        new_cap = self._cap
        while new_cap < needed:
            new_cap *= 2
        pad = new_cap - self._cap
        self._emb = jnp.concatenate(
            [self._emb, jnp.zeros((pad, self.dim), dtype=self.dtype)], axis=0)
        self._valid = jnp.concatenate(
            [self._valid, jnp.zeros((pad,), dtype=bool)], axis=0)
        self._valid_host = np.concatenate(
            [self._valid_host, np.zeros((pad,), dtype=bool)])
        self._payloads.extend([None] * pad)
        self._cap = new_cap

    # ---- mutation ------------------------------------------------------

    def add(self, vectors: np.ndarray | jax.Array,
            payloads: Sequence[dict[str, Any]]) -> list[int]:
        """Insert normalized rows; returns assigned row ids.

        `vectors` may be a DEVICE array (e.g. straight from
        `UniXcoderModel.encode_device`) — normalization then runs on
        device and the embeddings never round-trip the host, which
        matters through a relay-attached chip (the per-batch pooled
        readback costs ~30% of encoder throughput, R4_TPU_RESULTS2).
        """
        on_device = isinstance(vectors, jax.Array)
        if on_device:
            if vectors.ndim == 1:
                vectors = vectors[None, :]
        else:
            vectors = np.atleast_2d(np.asarray(vectors, dtype=np.float32))
        if vectors.shape[1] != self.dim:
            raise VectorStoreError(
                f"dim mismatch: got {vectors.shape[1]}, store is {self.dim}")
        if len(payloads) != len(vectors):
            raise VectorStoreError("payloads/vectors length mismatch")
        n = len(vectors)
        if n == 0:
            return []
        rows: list[int] = []
        for _ in range(n):
            if self._free:
                rows.append(self._free.pop())
            else:
                rows.append(self._next)
                self._next += 1
        if self._next > self._cap:
            self._grow(self._next)
        idx = jnp.asarray(np.asarray(rows, dtype=np.int32))
        if on_device:
            from lattice_tpu.ops.quant import _l2n
            normed_dev = _l2n(vectors.astype(jnp.float32))
        else:
            normed = topk_ops.l2_normalize(vectors)
            normed_dev = jnp.asarray(normed.astype(np.float32))
        # under the serve lock: a builder thread snapshotting _emb must
        # not interleave with this read-modify-write of the view shadows
        # (a build finishing after a concurrent add would stamp
        # dirty=False over the add's dirty=True and the rows would be
        # silently absent from the served view until 20% churn)
        with self._serve_lock:
            top = max(rows)
            kept = {"emb": self._emb, "valid": self._valid}
            donated: dict[str, jax.Array] = {}
            fuse_q = (self._quant is not None and not self._quant_dirty
                      and top < self._quant.n)
            if fuse_q:
                donated.update(q_values=self._quant.values,
                               q_scales=self._quant.scales,
                               q_col=self._quant._scales_col)
            fuse_i4 = (self._int4 is not None and not self._int4_dirty
                       and top < self._int4.n)
            if fuse_i4:
                donated.update(i4_values=self._int4.values,
                               i4_scales=self._int4.scales,
                               i4_col=self._int4._scales_col)
            out_k, out_d = _fused_delta(kept, donated, idx, normed_dev)
            self._emb, self._valid = out_k["emb"], out_k["valid"]
            if fuse_q:
                self._quant.values = out_d["q_values"]
                self._quant.scales = out_d["q_scales"]
                self._quant._scales_col = pallas_ops.relayout_col(
                    out_d["q_col"])
            if fuse_i4:
                self._int4.values = out_d["i4_values"]
                self._int4.scales = out_d["i4_scales"]
                self._int4._scales_col = pallas_ops.relayout_col(
                    out_d["i4_col"])
            for row, payload in zip(rows, payloads):
                self._valid_host[row] = True
                self._payloads[row] = dict(payload)
                _index_payload(self._inverted, row, payload)
                if self._lex_tokens is not None:  # incremental, like
                    # _inverted: never a rebuild on the serving path
                    for t in name_token_set(payload.get("name")
                                            or payload.get("graph_node_id")
                                            or ""):
                        self._lex_tokens.setdefault(t, set()).add(row)
            self._size += n
            self._mutate_views(rows, normed_dev, quant_done=fuse_q,
                               int4_done=fuse_i4)
        return rows

    def _mutate_views(self, rows: list[int],
                      normed_dev: jax.Array | None,
                      quant_done: bool = False,
                      int4_done: bool = False) -> None:
        with self._serve_lock:  # RLock: add() already holds it; remove/
            # delete paths enter here directly
            return self._mutate_views_impl(rows, normed_dev, quant_done,
                                           int4_done)

    def _mutate_views_impl(self, rows: list[int],
                           normed_dev: jax.Array | None,
                           quant_done: bool = False,
                           int4_done: bool = False) -> None:
        """O(delta) maintenance of the IVF/int8 serving views.

        `normed_dev` is the new normalized rows for inserts, None for
        removals. Centroids don't move on incremental IVF upserts, so
        after >20% of the corpus has churned the partition is marked dirty
        and the next search rebuilds (re-measuring recall). `quant_done` /
        `int4_done` mean `add` already folded that shadow's update into
        the fused one-execution scatter."""
        n = len(rows)
        if (self._ivf is not None and not self._ivf_dirty
                and getattr(self._ivf, "hollow", False)):
            # recall-refused index: buckets are gone by design; mutations
            # have nothing to maintain and must NOT flag a rebuild (the
            # refusal verdict stands until 20% churn re-measures it)
            self._ivf_mutations += n
            if self._ivf_mutations > 0.2 * max(self._size, 1):
                self._ivf_dirty = True
        elif self._ivf is not None and not self._ivf_dirty:
            try:
                if normed_dev is None:
                    self._ivf.remove(rows)
                else:
                    self._ivf.insert(normed_dev, rows)
                self._ivf_mutations += n
                if self._ivf_mutations > 0.2 * max(self._size, 1):
                    self._ivf_dirty = True
            except Exception:
                logger.exception("incremental IVF update failed; rebuilding")
                self._ivf_dirty = True
        else:
            self._ivf_dirty = True
        if not quant_done:
            if (normed_dev is not None and self._quant is not None
                    and not self._quant_dirty and max(rows) < self._quant.n):
                self._quant.update_rows(normed_dev,
                                        jnp.asarray(np.asarray(rows, np.int32)))
            elif normed_dev is not None:
                self._quant_dirty = True
        if not int4_done:
            if (normed_dev is not None and self._int4 is not None
                    and not self._int4_dirty and max(rows) < self._int4.n):
                self._int4.update_rows(normed_dev,
                                       jnp.asarray(np.asarray(rows, np.int32)))
            elif normed_dev is not None:
                self._int4_dirty = True
        # removals leave int8/int4 values stale but masked by `valid`
        for attr, dirty_attr in (("_sharded", "_sharded_dirty"),
                                 ("_shardedq", "_shardedq_dirty")):
            view = getattr(self, attr)
            if view is not None and not getattr(self, dirty_attr):
                # O(delta) scatter into the sharded arrays; only a row id
                # past the padded capacity (store just _grow()-ed) rebuilds
                try:
                    if normed_dev is None:
                        view.invalidate_rows(np.asarray(rows))
                    elif not view.update_rows(normed_dev, np.asarray(rows)):
                        setattr(self, dirty_attr, True)
                except Exception:
                    logger.exception(
                        "incremental sharded update failed; rebuilding")
                    setattr(self, dirty_attr, True)
            else:
                setattr(self, dirty_attr, True)
        if self._pq is not None and not self._pq_dirty:
            try:
                if normed_dev is None:
                    self._pq.remove(rows)
                else:
                    self._pq.insert(normed_dev, rows)
                self._pq_mutations += n
                # frozen codebooks drift like frozen centroids: rebuild
                # (re-training + re-measuring recall) past 20% churn
                if self._pq_mutations > 0.2 * max(self._size, 1):
                    self._pq_dirty = True
            except Exception:
                logger.exception("incremental PQ update failed; rebuilding")
                self._pq_dirty = True
        self._rank_cols_dirty = True
        self._sharded_rank = None

    def _drop_row(self, row: int) -> None:
        payload = self._payloads[row]
        if payload is None:
            return
        if self._lex_tokens is not None:
            for t in name_token_set(payload.get("name")
                                    or payload.get("graph_node_id") or ""):
                bucket = self._lex_tokens.get(t)
                if bucket is not None:
                    bucket.discard(row)
                    if not bucket:
                        del self._lex_tokens[t]
        for f in INDEXED_FIELDS:
            v = payload.get(f)
            if v is not None:
                bucket = self._inverted[f].get(v)
                if bucket is not None:
                    bucket.discard(row)
                    if not bucket:
                        del self._inverted[f][v]
        self._payloads[row] = None
        self._valid_host[row] = False
        self._free.append(row)
        self._size -= 1

    def remove(self, rows: Sequence[int]) -> int:
        live = [r for r in rows if self._payloads[r] is not None]
        if not live:
            return 0
        idx = jnp.asarray(np.asarray(live, dtype=np.int32))
        self._valid = self._valid.at[idx].set(False)
        for r in live:
            self._drop_row(r)
        self._mutate_views(live, None)
        return len(live)

    def delete_by_filter(self, filters: dict[str, Any]) -> int:
        """Reference: delete points by filter (`embeddings/client.py:159`)."""
        rows = self._filter_rows(filters)
        return self.remove(sorted(rows))

    # Auto-compaction threshold: once tombstoned holes exceed this
    # fraction of a non-trivial capacity, every scan is paying double for
    # dead rows — rewrite the matrix densely (SURVEY §7 hard part (d):
    # append segments + periodic compaction).
    COMPACT_HOLE_FRACTION = 0.5
    COMPACT_MIN_CAPACITY = 4096

    def maybe_compact(self) -> dict[int, int] | None:
        """Compact when TOMBSTONED holes (freelist rows — not the
        never-used tail of a geometric growth step, which would thrash
        compact/regrow at power-of-two boundaries) cross the threshold."""
        if (self._cap >= self.COMPACT_MIN_CAPACITY
                and len(self._free) > self.COMPACT_HOLE_FRACTION * self._cap):
            return self.compact()
        return None

    def compact(self) -> dict[int, int]:
        """Rewrite live rows contiguously; returns {old_row: new_row}.

        Long-lived watch-mode stores accumulate freelist holes (every
        scan still streams and masks them); compaction gathers the live
        rows into a fresh dense matrix on device (one gather, no host
        round-trip), rebuilds the payload/inverted state, and invalidates
        every derived view. Row ids CHANGE — callers holding them (e.g.
        a persisted manifest) must remap via the returned mapping; the
        graph join is unaffected (it keys on qualified names).
        """
        live = np.flatnonzero(self._valid_host)
        n_live = len(live)
        mapping = {int(old): new for new, old in enumerate(live)}
        new_cap = 8
        while new_cap < max(n_live, 1):
            new_cap *= 2
        emb_new = jnp.zeros((new_cap, self.dim), dtype=self.dtype)
        if n_live:
            emb_new = emb_new.at[:n_live].set(
                jnp.take(self._emb, jnp.asarray(live, dtype=jnp.int32),
                         axis=0))
        valid_new = np.zeros(new_cap, dtype=bool)
        valid_new[:n_live] = True
        payloads_new: list[dict[str, Any] | None] = [None] * new_cap
        inverted_new: dict[str, dict[Any, set[int]]] = {
            f: {} for f in INDEXED_FIELDS}
        for new, old in enumerate(live):
            p = self._payloads[old]
            payloads_new[new] = p
            if p:
                _index_payload(inverted_new, new, p)
        self._emb = emb_new
        self._valid = jnp.asarray(valid_new)
        self._valid_host = valid_new
        self._payloads = payloads_new
        self._inverted = inverted_new
        self._lex_tokens = None  # row ids moved; rebuild lazily
        self._cap = new_cap
        self._free = []
        self._next = n_live
        self._size = n_live
        # every derived view indexed by row id is now stale
        self._reset_views()
        return mapping

    def delete_file(self, file_path: str) -> int:
        return self.delete_by_filter({"file_path": file_path})

    def _reset_views(self) -> None:
        """Drop every derived serving view (IVF/quant/sharded/rank
        columns); the next search rebuilds lazily."""
        self._serve_lock.acquire()  # paired release below; a builder
        # mid-flight must finish before the views it builds are dropped
        self._ivf = None
        self._ivf_dirty = True
        self._ivf_mutations = 0
        self._quant = None
        self._quant_dirty = True
        self._int4 = None
        self._int4_dirty = True
        self._pq = None
        self._pq_dirty = True
        self._pq_mutations = 0
        self._sharded = None
        self._sharded_dirty = True
        self._shardedq = None
        self._shardedq_dirty = True
        self._rank_cols = None
        self._rank_cols_dirty = True
        self._sharded_rank = None
        self._serve_lock.release()

    def clear(self) -> None:
        self._valid = jnp.zeros((self._cap,), dtype=bool)
        self._valid_host[:] = False
        self._payloads = [None] * self._cap
        self._free = []
        self._size = 0
        self._next = 0
        self._inverted = {f: {} for f in INDEXED_FIELDS}
        self._lex_tokens = None
        self._reset_views()

    def device_rank_columns(self, graph) -> "RankColumns":
        """Resident per-row ranking columns + the node->rows join map.

        The row->node join (`graph_node_id` payload key, reference
        `embeddings/chunker.py:13-37`), the content-length quality
        heuristic (`query/ranking/scorer.py:79-126`), and the CALLS
        degree centrality are per-row constants between mutations;
        materializing them once lets the hybrid fuse run per query with
        only the SPARSE reach set crossing to the device — a per-query
        node->row gather over [cap] rows costs ~50 ms at 1M through
        XLA's serial scalar gather (R3 phase B2). The host-side reverse
        CSR (node id -> row ids) expands BFS reach sets to rows with
        vectorized NumPy. Rebuilt after store mutations or a graph
        re-finalize (tracked by `graph.generation`).
        """
        from lattice_tpu.core.types import EdgeType

        graph._ensure_final()
        gen = getattr(graph, "generation", 0)
        with self._serve_lock:
            return self._rank_cols_locked(graph, gen)

    def _rank_cols_locked(self, graph, gen: int) -> "RankColumns":
        from lattice_tpu.core.types import EdgeType
        cached = self._rank_cols
        if (cached is None or self._rank_cols_dirty
                or cached.generation != gen):
            node_ids = np.full(self._cap, -1, dtype=np.int32)
            quality = np.zeros(self._cap, dtype=np.float32)
            for row, payload in enumerate(self._payloads):
                if payload is None:
                    continue
                qn = payload.get("graph_node_id")
                if qn:
                    nid = graph.id_of(qn)
                    if nid is not None:
                        node_ids[row] = nid
                n = len(payload.get("content") or "")
                quality[row] = 1.0 if 80 <= n <= 4000 else (0.5 if n else 0.0)
            # degree centrality as a ROW column (static per generation)
            deg_nodes = graph.degree_vector(EdgeType.CALLS)
            has = node_ids >= 0
            degree = np.zeros(self._cap, dtype=np.int32)
            degree[has] = deg_nodes[node_ids[has]]
            # reverse CSR: node id -> rows (multi-row nodes = _part{n})
            n_nodes = graph.n_nodes()
            counts = np.zeros(n_nodes + 1, dtype=np.int64)
            np.add.at(counts, node_ids[has] + 1, 1)
            indptr = np.cumsum(counts)
            order = np.argsort(node_ids[has], kind="stable")
            indices = np.flatnonzero(has)[order].astype(np.int32)
            self._rank_cols = RankColumns(
                node_ids=jnp.asarray(node_ids),
                quality=jnp.asarray(quality),
                degree=jnp.asarray(degree),
                node_row_indptr=indptr,
                node_row_indices=indices,
                generation=gen,
            )
            self._rank_cols_dirty = False
        return self._rank_cols

    # ---- filters -------------------------------------------------------

    def lexical_candidates(self, tokens, limit: int = 32,
                           filters: dict[str, Any] | None = None,
                           min_name_cov: float = 0.0
                           ) -> list[tuple[int, float]]:
        """Rows whose entity-name tokens overlap `tokens`, scored by
        IDF-weighted name coverage in [0, 1] (1.0 = every token of the
        name appears in the query). The exact-identifier complement to
        the dense cosine channel — a query naming `DeliveryQueue.drain`
        in plain words surfaces it even when the embedding misses.

        Host-side sparse lookup by design (same measured split as the
        graph walks: token -> rows is a dict probe over a handful of
        tokens; no dense [corpus] work). The index builds lazily on
        first use and rebuilds after mutations (`_lex_tokens = None`)."""
        toks = {t.lower() for t in tokens}
        if not toks:
            return []
        with self._serve_lock:
            idx = self._lex_tokens
            if idx is None:
                idx = {}
                for row, p in enumerate(self._payloads):
                    if not p:
                        continue  # dead row or the empty shared sentinel
                    nm = p.get("name") or p.get("graph_node_id") or ""
                    for t in name_token_set(nm):
                        idx.setdefault(t, set()).add(row)
                self._lex_tokens = idx
        n = max(self._size, 1)
        # a token matching >5% of the corpus carries ~no signal and
        # would make this probe O(corpus); idf would discount it anyway
        df_cap = max(int(0.05 * n), 1000)
        # Compound-split fallback: a query token absent from the name
        # vocabulary may EMBED a vocabulary token ("autocomplete" names
        # TextIndex.complete; "unsubscribe" names subscribe). Probe the
        # longest suffix then longest prefix (>=4 chars) against the
        # index — O(len) dict lookups, no vocabulary scan — and ride it
        # at a 0.7 discount (the golden eval's one remaining total miss
        # was exactly this shape).
        weights: dict[str, float] = {t: 1.0 for t in toks}
        for t in toks:
            if t in idx or len(t) < 6:
                continue
            piece = None
            for i in range(1, len(t) - 3):          # longest suffix first
                if t[i:] in idx:
                    piece = t[i:]
                    break
            if piece is None:
                for i in range(len(t) - 1, 3, -1):  # longest prefix
                    if t[:i] in idx:
                        piece = t[:i]
                        break
            if piece is not None:
                weights[piece] = max(weights.get(piece, 0.0), 0.7)
        acc: dict[int, float] = {}
        q_den = 0.0   # total idf the query puts in play (known tokens)
        for t, w in weights.items():
            rows = idx.get(t)
            if not rows or len(rows) > df_cap:
                continue
            idf = w * math.log1p(n / len(rows))
            q_den += idf
            for r in rows:
                acc[r] = acc.get(r, 0.0) + idf
        if not acc:   # implies q_den == 0 too: acc entries add idf > 0
            return []
        allowed = self._filter_rows(filters) if filters else None
        out: list[tuple[int, float]] = []
        for r, num in acc.items():
            if allowed is not None and r not in allowed:
                continue
            p = self._payloads[r]
            if not p:
                continue
            ntoks = name_token_set(p.get("name")
                                   or p.get("graph_node_id") or "")
            den = sum(
                math.log1p(n / len(idx.get(t) or (0,))) for t in ntoks)
            if den <= 0:
                continue
            name_cov = min(num / den, 1.0)
            # Strong-name-hit consumers (the deep paths' binary match
            # slots) threshold on UNDEFLATED name coverage: a one-token
            # name fully spelled out inside a verbose query must not be
            # dropped because query coverage deflated its score.
            if name_cov < min_name_cov:
                continue
            # Query coverage breaks the tie name coverage can't: for
            # "how is the delivery queue implemented", Delivery and
            # DeliveryQueue BOTH have fully-covered names, but
            # DeliveryQueue explains more of the query. Half the score
            # rides on how much of the query's (idf-weighted) token
            # mass this name accounts for.
            query_cov = min(num / q_den, 1.0)
            out.append((r, name_cov * (0.5 + 0.5 * query_cov)))
        out.sort(key=lambda x: (-x[1], x[0]))
        return out[:limit]

    def _filter_rows(self, filters: dict[str, Any]) -> set[int]:
        """AND of per-field matches; values may be scalars or lists (OR)."""
        result: set[int] | None = None
        for f, value in filters.items():
            if f not in self._inverted:
                raise VectorStoreError(f"no payload index for field {f!r}")
            values = value if isinstance(value, (list, tuple, set)) else [value]
            hit: set[int] = set()
            for v in values:
                hit |= self._inverted[f].get(v, set())
            result = hit if result is None else (result & hit)
            if not result:
                return set()
        return result if result is not None else {
            i for i, p in enumerate(self._payloads) if p is not None}

    def filter_mask(self, filters: dict[str, Any] | None) -> jax.Array | None:
        if not filters:
            return None
        mask = np.zeros((self._cap,), dtype=bool)
        rows = self._filter_rows(filters)
        if rows:
            mask[np.fromiter(rows, dtype=np.int64)] = True
        return jnp.asarray(mask)

    # ---- queries -------------------------------------------------------

    def build_ivf(self, n_clusters: int | None = None, iters: int = 10,
                  seed: int = 0, measure: bool = True,
                  max_load: float | None = 2.0):
        """Build (or rebuild) the IVF partition over current live rows.

        BASELINE config 3: the IVF scan is the large-corpus ANN path; row
        ids in the IVF buckets are this store's row ids, so payload
        materialization is shared with the flat path. With `measure`, the
        build self-samples recall@10 vs the exact scan — the number the
        auto dispatcher gates on.
        """
        from lattice_tpu.ops.ivf import IVFIndex
        # device-resident build: rows never round-trip to the host.
        # max_load=2.0 caps bucket padding waste at ~2x (every probe pays
        # the padded bucket size S in DMA; skewed code corpora otherwise
        # inflate S ~4.6x — measured on this repo's own embeddings).
        self._ivf = IVFIndex.build_from_device(
            self._emb, self._valid_host.copy(), n_clusters=n_clusters,
            iters=iters, dtype=str(self.dtype), seed=seed,
            max_load=max_load)
        if measure:
            self._ivf.measure_recall(self._emb, self._valid,
                                     nprobe=IVF_AUTO_NPROBE)
        self._ivf_dirty = False
        self._ivf_mutations = 0
        return self._ivf

    def _ivf_ready(self) -> bool:
        """Fresh IVF whose measured recall clears the serving bar."""
        return (self._ivf is not None and not self._ivf_dirty
                and self._ivf.measured_recall is not None
                and self._ivf.measured_recall >= IVF_MIN_RECALL)

    def search_ivf(self, query_vectors: np.ndarray, k: int,
                   nprobe: int = 8,
                   filters: dict[str, Any] | None = None
                   ) -> list[list[tuple[int, float, dict[str, Any]]]]:
        """ANN search through the IVF partition; payload filters fold into
        the bucket id table as a row mask (filtered rows score -inf)."""
        if self._size == 0:
            return [[] for _ in range(len(np.atleast_2d(query_vectors)))]
        with self._serve_lock:
            if self._ivf is None or self._ivf_dirty or self._ivf.hollow:
                self.build_ivf()
            ivf = self._ivf
        mask = self.filter_mask(filters)
        scores, ids = ivf.search(np.atleast_2d(query_vectors), k,
                                 nprobe, mask=mask)
        out: list[list[tuple[int, float, dict[str, Any]]]] = []
        for qi in range(len(scores)):
            hits = []
            for score, row in zip(scores[qi], ids[qi]):
                if row < 0 or score <= topk_ops.NEG_INF / 2:
                    continue
                payload = self._payloads[int(row)]
                if payload is not None:
                    hits.append((int(row), float(score), payload))
            out.append(hits)
        return out

    def build_pq(self, m: int | None = None, ksub: int = 256,
                 measure: bool = True):
        """Build (or rebuild) the PQ capacity view over current live rows.

        uint8 codes at dsub=4 are 8x smaller than the bf16 rows, so a
        corpus 8x over the bf16 HBM budget still serves (VERDICT r1 #6 /
        BASELINE "recall@10 at equal memory"). Build-time self-measured
        recall gates auto dispatch exactly like IVF's.
        """
        from lattice_tpu.ops.pq import PQIndex
        self._pq = PQIndex.build(self._emb, self._valid_host.copy(),
                                 m=m, ksub=ksub)
        if measure:
            # The store's serving path (`_search_pq_device`) widens + exact-
            # rescores against the resident bf16 rows, so the dispatch gate
            # must measure the RESCORED recall — the number serving delivers.
            self._pq.measure_recall(self._emb, self._valid_host, rescore=True)
        self._pq_dirty = False
        self._pq_mutations = 0
        return self._pq

    def _pq_ready(self) -> bool:
        return (self._pq is not None and not self._pq_dirty
                and self._pq.measured_recall is not None
                and self._pq.measured_recall >= IVF_MIN_RECALL)

    def search_pq(self, query_vectors: np.ndarray, k: int,
                  filters: dict[str, Any] | None = None
                  ) -> list[list[tuple[int, float, dict[str, Any]]]]:
        """ADC search through the PQ codes; payload filters AND into the
        validity mask exactly as on the flat path."""
        if self._size == 0:
            return [[] for _ in range(len(np.atleast_2d(query_vectors)))]
        q = jnp.asarray(topk_ops.l2_normalize(
            np.atleast_2d(query_vectors)))
        scores, ids = self._search_pq_device(q, min(k, self._cap),
                                             self.filter_mask(filters))
        out: list[list[tuple[int, float, dict[str, Any]]]] = []
        scores, ids = np.asarray(scores), np.asarray(ids)
        for qi in range(len(scores)):
            hits = []
            for score, row in zip(scores[qi], ids[qi]):
                if row < 0 or score <= topk_ops.NEG_INF / 2:
                    continue
                payload = self._payloads[int(row)]
                if payload is not None:
                    hits.append((int(row), float(score), payload))
            out.append(hits)
        return out

    def _search_pq_device(self, queries: jax.Array, k_eff: int,
                          mask: jax.Array | None
                          ) -> tuple[jax.Array, jax.Array]:
        """PQ first stage widened to max(k, 32) + exact rescore.

        Unlike the standalone PQIndex (whose whole point is that the
        full-precision rows no longer fit), the store still holds `_emb`
        resident, so the winners rescore exactly — PQ here buys scan
        bandwidth, not capacity, and recall returns to the storage
        ceiling (same design as QuantizedView's two-stage path)."""
        with self._serve_lock:
            if self._pq is None or self._pq_dirty:
                self.build_pq()
            pq = self._pq
        k1 = min(max(k_eff, 32), self._cap)
        s1, c1 = pq.search_device(queries, k1, mask=mask)
        return pallas_ops._exact_rescore(queries, self._emb, s1, c1, k_eff)

    def _quant_view(self):
        from lattice_tpu.ops.quant import QuantizedView
        with self._serve_lock:
            if self._quant is None or self._quant_dirty:
                self._quant = QuantizedView(self._emb)  # device quantization
                self._quant_dirty = False
            return self._quant

    def _search_view_two_stage(self, view, query_vectors: np.ndarray, k: int,
                               rescore: bool,
                               filters: dict[str, Any] | None
                               ) -> list[list[tuple[int, float,
                                                    dict[str, Any]]]]:
        """Shared host entry for the quantized views' two-stage search."""
        if self._size == 0:
            return [[] for _ in range(len(np.atleast_2d(query_vectors)))]
        q = topk_ops.l2_normalize(np.atleast_2d(query_vectors))
        mask = self.filter_mask(filters)
        valid = self._valid_col() if mask is None else (self._valid & mask)
        scores, idx = view.search(
            q, valid, min(k, self._cap),
            full_precision=self._emb if rescore else None)
        out: list[list[tuple[int, float, dict[str, Any]]]] = []
        for qi in range(len(q)):
            hits = []
            for score, row in zip(scores[qi], idx[qi]):
                if score <= topk_ops.NEG_INF / 2:
                    continue
                payload = self._payloads[int(row)]
                if payload is not None:
                    hits.append((int(row), float(score), payload))
            out.append(hits)
        return out

    def search_quantized(self, query_vectors: np.ndarray, k: int,
                         rescore: bool = True,
                         filters: dict[str, Any] | None = None
                         ) -> list[list[tuple[int, float, dict[str, Any]]]]:
        """Int8 first-stage scan (+ optional full-precision rescore).

        Half the HBM traffic of bf16 at 2x MXU rate (ops/quant.py) — the
        equal-memory/2x-capacity lever from BASELINE's recall contract.
        Payload filters AND into the validity mask exactly as on the flat
        path.
        """
        if self._size == 0:
            return [[] for _ in range(len(np.atleast_2d(query_vectors)))]
        return self._search_view_two_stage(self._quant_view(), query_vectors,
                                           k, rescore, filters)

    def adopt_ivf(self, ivf) -> None:
        """Attach a restored IVF partition (storage/persistence.py): the
        verdict and layout carry over; mutation accounting restarts."""
        self._ivf = ivf
        self._ivf_dirty = False
        self._ivf_mutations = 0

    def _int4_view(self):
        from lattice_tpu.ops.quant import Int4View
        with self._serve_lock:
            if self._int4 is None or self._int4_dirty:
                self._int4 = Int4View(self._emb)   # device quantization
                self._int4_dirty = False
            return self._int4

    def search_int4(self, query_vectors: np.ndarray, k: int,
                    rescore: bool = True,
                    filters: dict[str, Any] | None = None
                    ) -> list[list[tuple[int, float, dict[str, Any]]]]:
        """Packed-int4 first-stage scan (+ optional full-precision rescore).

        A quarter of the HBM traffic of bf16 (ops/quant.Int4View): the 4x
        lever on BASELINE's equal-memory recall contract, one tier past
        int8. With `_emb` still resident (as here) the winners rescore
        exactly, so recall returns to the storage ceiling and int4 buys
        pure scan bandwidth."""
        if self._size == 0:
            return [[] for _ in range(len(np.atleast_2d(query_vectors)))]
        return self._search_view_two_stage(self._int4_view(), query_vectors,
                                           k, rescore, filters)

    def to_sharded(self, mesh=None):
        """Multi-chip view: rows sharded over the data axis with ICI top-k
        merge (parallel/sharded_index.py). The device matrix reshards
        directly (no host f32 round-trip); the view is sized to store
        capacity so watch-mode mutations stay O(delta) scatters until the
        store itself grows."""
        from lattice_tpu.parallel.sharded_index import ShardedIndex
        return ShardedIndex(self._emb, self._valid_host.copy(), mesh=mesh,
                            dtype=str(self.dtype))

    def to_sharded_quantized(self, mesh=None, bits: int = 8):
        """Multi-chip quantized view: `bits=8` halves the HBM of
        `to_sharded` (2x chunks per mesh), `bits=4` quarters it (4x)."""
        from lattice_tpu.parallel.sharded_index import ShardedQuantizedIndex
        emb = np.asarray(self._emb, dtype=np.float32)
        return ShardedQuantizedIndex(emb, self._valid_host.copy(), mesh=mesh,
                                     bits=bits)

    def sharded_hybrid(self, graph, mesh=None):
        """Multi-chip hybrid deep-rank view: corpus rows AND the resident
        rank columns (CALLS degree, content quality) shard together over
        the data axis; per-query packed evidence replicates and each
        shard fuses its own rows (parallel/sharded_rank.py). Cached on
        the RankColumns object — `device_rank_columns` hands back a new
        one after any store mutation or graph re-finalize, so the view
        rebuilds exactly when the columns do. Mutations therefore cost a
        reshard here (deep-rank serves read-heavy agent traffic; the
        O(delta) path of ShardedIndex can be added if watch-mode churn
        ever meets multi-chip deep search)."""
        from lattice_tpu.parallel.sharded_rank import ShardedHybridRank

        cols = self.device_rank_columns(graph)
        bits = self._sharded_quant_bits()
        cached = self._sharded_rank
        # mesh compares by identity: a different (even equal-topology)
        # mesh object rebuilds rather than risk serving a view laid out
        # on the wrong mesh
        if (cached is not None and cached[0] is cols
                and cached[1] == bits and cached[2] is mesh):
            return cached[3]
        view = ShardedHybridRank(self._emb, self._valid_host.copy(),
                                 cols.degree, cols.quality, mesh=mesh,
                                 dtype=str(self.dtype), bits=bits)
        self._sharded_rank = (cols, bits, mesh, view)
        return view

    def _sharded_quant_bits(self) -> int:
        """Memory-pressure tiering for the sharded serving view (CLAUDE r2
        item 5): 16 (bf16) while rows fit in half a chip's HBM, 8 once
        they exceed it, 4 once even int8 rows would (i.e. bf16 > a full
        chip). Env overrides: LATTICE_SHARDED_BITS=16/8/4, or the legacy
        LATTICE_SHARDED_INT8=1/0."""
        forced = os.environ.get("LATTICE_SHARDED_BITS")
        if forced in ("16", "8", "4"):
            return int(forced)
        legacy = os.environ.get("LATTICE_SHARDED_INT8")
        if legacy in ("0", "1"):
            return 8 if legacy == "1" else 16
        n_dev = max(len(jax.devices()), 1)
        bf16_bytes_per_chip = self._cap * self.dim * 2 / n_dev
        hbm = CHIP_HBM_GB * (1024 ** 3)
        if bf16_bytes_per_chip > hbm:
            return 4
        if bf16_bytes_per_chip > hbm / 2:
            return 8
        return 16

    def _sharded_view(self):
        """The live multi-chip view under the memory rule, (re)built only
        when dirty."""
        bits = self._sharded_quant_bits()
        with self._serve_lock:
            if bits < 16:
                if (self._shardedq is None or self._shardedq_dirty
                        or self._shardedq.bits != bits):
                    self._shardedq = self.to_sharded_quantized(bits=bits)
                    self._shardedq_dirty = False
                return self._shardedq
            if self._sharded is None or self._sharded_dirty:
                self._sharded = self.to_sharded()
                self._sharded_dirty = False
            return self._sharded

    def _valid_col(self):
        """Kernel-layout validity ([cap, 1] int8), converted once per
        mutation epoch: `self._valid` is replaced functionally on every
        mutation, so identity-keying the cache is exact. The in-jit
        [N] bool -> [N,1] i8 relayout measured ~0.65 ms/call at 1M rows
        (R2_TPU_RESULTS6) — pure loop-invariant waste."""
        if getattr(self, "_valid_col_src", None) is not self._valid:
            self._valid_col_cache = pallas_ops.valid_col(self._valid)
            self._valid_col_src = self._valid
        return self._valid_col_cache

    def _device_is_tpu(self) -> bool:
        try:
            return jax.devices()[0].platform.lower() in ("tpu", "axon")
        except Exception:
            return False

    def _plan_search(self, batch: int, k_eff: int,
                     filters: dict[str, Any] | None,
                     method: str) -> str:
        if method != "auto" and method in SEARCH_METHODS:
            return method  # forced plans never build views here; don't
            # stall them behind another thread's in-lock IVF build
        with self._serve_lock:
            return self._plan_search_impl(batch, k_eff, filters, method)

    def _plan_search_impl(self, batch: int, k_eff: int,
                          filters: dict[str, Any] | None,
                          method: str) -> str:
        """The dispatch decision table (VERDICT r1 #1). Returns one of
        "sharded" | "ivf" | "pq" | "quantized" | "pallas" | "flat".

        auto order:
        1. sharded  — LATTICE_SHARDED=1 and >1 device attached
        2. pq       — LATTICE_PQ=1 (8x-capacity serving mode): uint8-code
                      ADC scan, gated on its build-time measured recall
        3. int4     — LATTICE_INT4=1 (4x-capacity serving mode) on TPU:
                      packed-nibble scan at ~int8 speed + exact rescore
                      (forced capacity modes preempt IVF: its build OOMs
                      exactly in the regime they exist for)
        4. ivf      — TPU, corpus >= IVF_AUTO_MIN_ROWS, k <= 64, the
                      build's f32 view + temps fit HBM, IVF built (or
                      buildable) with measured recall >= IVF_MIN_RECALL,
                      and any filter matches enough rows that probing
                      can't starve (fraction + absolute floors)
        5. quantized — the flat-tier serving DEFAULT on TPU (also forced
                      by LATTICE_INT8=1): int8 first stage + exact bf16
                      rescore beats the bf16 binned scan on BOTH axes
                      (46.5k vs 40.1k qps, recall 0.9965 vs 0.9934 at 1M,
                      bench_r2) at +0.5x corpus HBM for the shadow;
                      LATTICE_INT8=0 opts out. Re-A/B'd against int4 in
                      r4 (order-swapped, 2 reps, both corpus regimes,
                      R4_TPU_RESULTS9): int8 57.9k/0.9934 vs int4
                      50k/0.9957 clustered, 58.3k/0.9926 vs 51k/0.9934
                      isotropic — int8 keeps the default on qps, int4
                      stays the capacity tier (+0.2pp recall, half the
                      shadow bytes)
        6. pallas   — bf16 binned-max scan: no int8 shadow memory, or
                      int8 opted out; forced method="refined" gives the
                      exact-at-storage insertion scan (29k / 0.9996)
        7. flat     — the XLA fallback, always correct
        """
        if method != "auto" and method in SEARCH_METHODS:
            return method
        if method != "auto":
            raise VectorStoreError(f"unknown search method {method!r}")
        if (os.environ.get("LATTICE_SHARDED") == "1"
                and len(jax.devices()) > 1):
            return "sharded"
        on_tpu = self._device_is_tpu()
        # Forced capacity modes preempt the IVF auto-consideration: the
        # operator asked for them precisely because the corpus is at the
        # memory limit, where an IVF build (f32 k-means view + temps,
        # ~4.5x corpus bytes) OOMs — measured at 4M x 768 on 16 GB
        # (R3 batch 4: 18.26 GB requested).
        if os.environ.get("LATTICE_PQ") == "1":
            if self._pq is None or self._pq_dirty:
                self.build_pq()           # one-time; self-measures recall
            if self._pq_ready():
                return "pq"
        if on_tpu and os.environ.get("LATTICE_INT4") == "1":
            return "int4"
        ivf_pays = (batch <= IVF_SMALL_BATCH
                    or self._size >= IVF_FLAT_CROSSOVER_ROWS)
        # the built index needs the padded bucket copies (max_load 2.0 =
        # up to 2x corpus bf16 bytes) on top of the resident matrix, plus
        # ~1x slack for build temps; refuse when that can't fit (k-means
        # itself now runs on the resident bf16 — no f32 view)
        ivf_bytes = self._cap * self.dim * 2 * (1 + 2 + 1)
        ivf_fits = ivf_bytes < 0.85 * CHIP_HBM_GB * (1024 ** 3)
        if (on_tpu and k_eff <= 64 and self._size >= IVF_AUTO_MIN_ROWS
                and ivf_pays and ivf_fits
                and self._filter_selectivity_ok(filters, k_eff)):
            if self._ivf is None or self._ivf_dirty:
                self.build_ivf()          # one-time; self-measures recall
                if not self._ivf_ready():
                    # remember the refusal, free ~corpus-size of buckets
                    self._ivf.release_buckets()
            if self._ivf_ready():
                return "ivf"
        if on_tpu and os.environ.get("LATTICE_INT8") == "1":
            return "quantized"       # forced even where no tile fits
        tile = pallas_ops.pick_tile(self._cap, batch, k=max(k_eff, 16))
        # int8-default guard: bf16 rows + the int8 shadow must leave HBM
        # headroom for transients (at 4M x 768 the pair is ~9 GB)
        resident = self._cap * self.dim * 3        # bf16 (2B) + int8 (1B)
        shadow_fits = resident < 0.75 * CHIP_HBM_GB * (1024 ** 3)
        if (on_tpu and tile is not None and k_eff <= 64 and shadow_fits
                and os.environ.get("LATTICE_INT8") != "0"):
            return "quantized"
        if on_tpu and tile is not None and k_eff <= 64:
            return "pallas"
        return "flat"

    def _filter_selectivity_ok(self, filters: dict[str, Any] | None,
                               k: int) -> bool:
        """Probe selection is filter-blind; highly selective filters starve
        the probed buckets. Flat handles those exactly."""
        if not filters:
            return True
        matched = len(self._filter_rows(filters))
        return (matched >= IVF_FILTER_MIN_MATCH_PER_K * k
                and matched >= IVF_MIN_FILTER_FRACTION * max(self._size, 1))

    def search(self, query_vectors: np.ndarray, k: int,
               filters: dict[str, Any] | None = None,
               method: str = "auto",
               ) -> list[list[tuple[int, float, dict[str, Any]]]]:
        """Top-k cosine search. Returns per-query [(row, score, payload)].

        Reference: one entry point, `query_points` with must-match filter
        build (`embeddings/client.py:132-176`). The kernel is picked by the
        `_plan_search` decision table; `method` forces a path
        ("flat"/"pallas"/"ivf"/"quantized"/"sharded"). Payload filters work
        on every path: ANDed into the validity mask (flat/pallas/
        quantized), folded into the bucket id table (ivf), or row-sharded
        per chip (sharded).
        """
        if self._size == 0:
            q = np.atleast_2d(query_vectors)
            return [[] for _ in range(len(q))]
        q = topk_ops.l2_normalize(np.atleast_2d(query_vectors))
        k_eff = min(k, self._cap)
        plan = self._plan_search(len(q), k_eff, filters, method)
        if plan == "sharded" and len(jax.devices()) > 1:
            mask = self.filter_mask(filters)
            s_dev, i_dev = self._sharded_search_rescored(q, k_eff, mask)
            return self._assemble_hits(len(q), np.asarray(s_dev),
                                       np.asarray(i_dev))
        if plan == "ivf":
            return self.search_ivf(q, k_eff, nprobe=IVF_AUTO_NPROBE,
                                   filters=filters)
        if plan == "pq":
            return self.search_pq(q, k_eff, filters=filters)
        if plan == "quantized":
            return self.search_quantized(q, k_eff, filters=filters)
        if plan == "int4":
            return self.search_int4(q, k_eff, filters=filters)
        mask = self.filter_mask(filters)
        valid = self._valid if mask is None else (self._valid & mask)
        if plan == "refined":
            tile = pallas_ops.pick_tile(self._cap, len(q), k=max(k_eff, 16))
            if tile is None:  # VMEM budget refused every tile (huge B/k)
                plan = "flat"
            else:
                scores, idx = pallas_ops.refined_topk(
                    jnp.asarray(q), self._emb, valid, k_eff, tile=tile)
        if plan == "pallas":
            # binned-max scan (loop-free selection + approx_max_k finish +
            # exact rescore): measured 37.4k qps vs refined's 29.1k at
            # 1M x 768 B=256, recall 0.9973 vs 0.9996 (strided-bin
            # collisions cost ~0.2pp; `method="refined"` forces the
            # slower exact-at-storage scan when that matters)
            tile = pallas_ops.pick_tile(self._cap, len(q), k=k_eff)
            if tile is None:
                plan = "flat"
            else:
                vcol = self._valid_col() if mask is None else valid
                scores, idx = pallas_ops.binned_topk(
                    jnp.asarray(q), self._emb, vcol, k_eff, tile=tile)
        if plan == "flat":
            scores, idx = topk_ops.flat_topk(
                jnp.asarray(q), self._emb, valid, k_eff)
        return self._assemble_hits(len(q), np.asarray(scores),
                                   np.asarray(idx))

    def search_device(self, queries: jax.Array, k: int,
                      filters: dict[str, Any] | None = None,
                      method: str = "auto") -> tuple[jax.Array, jax.Array]:
        """Dispatcher-planned search, device-resident: jax (scores, ids).

        The serving-loop / bench entry: results stay on device so
        back-to-back batches pipeline over the relay (any host readback in
        the loop serializes it — measured 26k -> 3.4k qps). Same decision
        table as `search`; payload assembly is the caller's problem.
        """
        if self._size == 0:
            raise VectorStoreError("empty store has no device path")
        # Plans whose kernels fold normalization into their own (single)
        # XLA execution get RAW queries — each separate dispatch costs
        # ~1-2 ms fixed through the axon relay (R2_TPU_RESULTS7), and
        # eager normalize here was several.
        raw = queries
        k_eff = min(k, self._cap)
        plan = self._plan_search(int(queries.shape[0]), k_eff, filters,
                                 method)
        if (plan in ("quantized", "int4") and self._device_is_tpu()
                and int(queries.shape[0]) >= 512):
            # very large single calls serve better as ONE scanned
            # execution over 256-query chunks: B=1024 measured 77.9k qps
            # monolithic (tile drops to 1024 under the VMEM budget) vs
            # 93k scanned at chunk=256 (R4_TPU_RESULTS1 / R3 sweep) —
            # same two-stage kernels, same widths, better tile
            return self.search_device_pipelined(raw, k, chunk=256,
                                                filters=filters,
                                                method=plan)
        mask = self.filter_mask(filters)
        if plan == "sharded" and len(jax.devices()) > 1:
            # device-resident end to end (quantized views normalize +
            # quantize inside the shard_map execution)
            return self._sharded_search_rescored(raw, k_eff, mask)
        valid = self._valid if mask is None else (self._valid & mask)
        vcol = self._valid_col() if mask is None else valid
        if plan == "quantized":
            return self._quant_view().search_device(raw, vcol, k_eff,
                                                    full_precision=self._emb)
        if plan == "int4":
            return self._int4_view().search_device(raw, vcol, k_eff,
                                                   full_precision=self._emb)
        if plan == "pallas":
            tile = pallas_ops.pick_tile(self._cap, int(raw.shape[0]),
                                        k=k_eff)
            if tile is not None:
                return pallas_ops.binned_topk(
                    raw, self._emb, vcol, k_eff, tile=tile,
                    normalize=True)
            # VMEM budget refused every tile: serve the XLA flat scan
            # rather than launder the refusal into an oversized kernel
        queries = _normalize_queries(raw)
        if plan == "ivf":
            with self._serve_lock:
                if self._ivf is None or self._ivf_dirty or self._ivf.hollow:
                    self.build_ivf()
                ivf = self._ivf  # capture under the lock: a concurrent
                # compact()/clear() nulls self._ivf via _reset_views
            return ivf.search_device(queries, k_eff,
                                     nprobe=IVF_AUTO_NPROBE, mask=mask)
        if plan == "pq":
            return self._search_pq_device(queries, k_eff, mask)
        if plan == "refined":
            tile = pallas_ops.pick_tile(self._cap, int(queries.shape[0]),
                                        k=max(k_eff, 16))
            if tile is not None:
                return pallas_ops.refined_topk(
                    queries, self._emb, valid, k_eff, tile=tile)
        return topk_ops.flat_topk(queries, self._emb, valid, k_eff)

    def _sharded_search_rescored(self, q, k_eff: int, mask
                                 ) -> tuple[jax.Array, jax.Array]:
        """Sharded search; quantized views get a widened first stage +
        exact rescore against the store's resident bf16 rows. Returns
        DEVICE arrays — host callers read back once.

        The standalone Sharded(Quantized)Index deliberately keeps no
        full-precision rows (capacity), so its scores carry quantization
        error — measured first-stage recall on hardware: int8 0.975,
        int4 0.775 at 131k (R2_TPU_RESULTS11). Inside the store the rows
        ARE resident, so the merged candidates rescore exactly, the same
        two-stage design as the single-chip tiers. The whole chain stays
        device-resident: per-call query re-upload through the relay cost
        13x on the standalone index (R4_TPU_RESULTS5)."""
        view = self._sharded_view()
        bits = getattr(view, "bits", 16)
        q_dev = jnp.asarray(q, jnp.float32)
        if q_dev.ndim == 1:
            q_dev = q_dev[None, :]
        if bits == 16:
            s, i = view.search(
                np.asarray(q_dev), k_eff,
                mask=None if mask is None else np.asarray(mask))
            return jnp.asarray(s), jnp.asarray(i)
        wide = min(max((4 if bits == 8 else 8) * k_eff, 32), self._cap)
        m_dev = None
        if mask is not None:
            m = np.asarray(mask, dtype=bool)
            pad = view.capacity - m.shape[0]
            if pad:
                m = np.concatenate([m, np.zeros(pad, dtype=bool)])
            m_dev = jax.device_put(jnp.asarray(m), view._row_sharding)
        s1, c1 = view.search_device(q_dev, wide, mask=m_dev)
        qn = _normalize_queries(q_dev)
        return pallas_ops._exact_rescore(qn, self._emb, s1, c1, k_eff)

    def search_device_pipelined(self, queries: jax.Array, k: int,
                                chunk: int = 256,
                                filters: dict[str, Any] | None = None,
                                method: str = "auto"
                                ) -> tuple[jax.Array, jax.Array]:
        """Bulk device search: ONE XLA execution scans ceil(B/chunk)
        query chunks through the planned kernel.

        Per-execution dispatch costs ~1-3 ms fixed (axon relay,
        R2_TPU_RESULTS8: a 2.4 ms device module measured 5.5 ms wall
        one-batch-at-a-time); bulk callers (offline eval, reindex dedup,
        backfills) pay it once here. Falls back to per-chunk
        `search_device` for plans without a scanned variant."""
        if self._size == 0:
            raise VectorStoreError("empty store has no device path")
        queries = jnp.asarray(queries)
        b_in = int(queries.shape[0])
        k_eff = min(k, self._cap)
        g = max(1, -(-b_in // chunk))
        pad = g * chunk - b_in
        if pad:
            queries = jnp.concatenate(
                [queries, jnp.zeros((pad, queries.shape[1]), queries.dtype)])
        plan = self._plan_search(chunk, k_eff, filters, method)
        mask = self.filter_mask(filters)
        q3 = queries.reshape(g, chunk, -1)
        vcol = self._valid_col() if mask is None else (self._valid & mask)
        if plan in ("quantized", "int4") and self._device_is_tpu():
            from lattice_tpu.ops.quant import _fused_two_stage_scanned
            if plan == "quantized":
                view, bits = self._quant_view(), 8
                k1 = min(max(k_eff, 16), max(4 * k_eff, k_eff), view.n)
                tile = pallas_ops.pick_tile(view.n, chunk, k=max(k1, 16))
            else:
                view, bits = self._int4_view(), 4
                k1 = min(max(8 * k_eff, 32), view.n)
                tile = pallas_ops.pick_tile_packed(view.n, chunk,
                                                   k=max(k1, 16))
            if tile is not None:
                s, i = _fused_two_stage_scanned(
                    q3, view.values, view._scales_col, vcol, self._emb,
                    k=k_eff, k1=k1, tile=tile, bits=bits)
                return (s.reshape(g * chunk, -1)[:b_in],
                        i.reshape(g * chunk, -1)[:b_in])
        if plan == "pallas":
            tile = pallas_ops.pick_tile(self._cap, chunk, k=k_eff)
            if tile is not None:
                s, i = pallas_ops.binned_topk_scanned(
                    q3, self._emb, vcol, k_eff, tile=tile)
                return (s.reshape(g * chunk, -1)[:b_in],
                        i.reshape(g * chunk, -1)[:b_in])
        # fallback: per-chunk dispatch through the normal path
        outs = [self.search_device(q3[i], k_eff, filters=filters,
                                   method=method) for i in range(g)]
        s = jnp.concatenate([o[0] for o in outs])[:b_in]
        i = jnp.concatenate([o[1] for o in outs])[:b_in]
        return s, i

    def _assemble_hits(self, n_queries: int, scores_np: np.ndarray,
                       idx_np: np.ndarray
                       ) -> list[list[tuple[int, float, dict[str, Any]]]]:
        out: list[list[tuple[int, float, dict[str, Any]]]] = []
        for qi in range(n_queries):
            hits = []
            for score, row in zip(scores_np[qi], idx_np[qi]):
                if score <= topk_ops.NEG_INF / 2:
                    break
                payload = self._payloads[int(row)]
                if payload is None:
                    continue
                hits.append((int(row), float(score), payload))
            out.append(hits)
        return out

    def scroll(self, filters: dict[str, Any] | None = None,
               limit: int = 100) -> list[tuple[int, dict[str, Any]]]:
        """Payload scan without scoring (reference scroll, `client.py:178-202`)."""
        rows = sorted(self._filter_rows(filters or {}))[:limit]
        return [(r, self._payloads[r]) for r in rows]

    def file_needs_update(self, file_path: str, content_hash: str) -> bool:
        """Hash-compare against stored payloads (reference `client.py:178-202`)."""
        rows = self._inverted["file_path"].get(file_path)
        if not rows:
            return True
        row = next(iter(rows))
        payload = self._payloads[row]
        return payload is None or payload.get("content_hash") != content_hash

    def payload(self, row: int) -> dict[str, Any] | None:
        return self._payloads[row]

    def get_vector(self, row: int) -> np.ndarray:
        return np.asarray(self._emb[row], dtype=np.float32)

    @property
    def device_arrays(self) -> tuple[jax.Array, jax.Array]:
        """(embeddings, valid) device views for external kernels/sharding."""
        return self._emb, self._valid

    @property
    def stats(self) -> dict:
        return {
            "points": self._size,
            "capacity": self._cap,
            "free_rows": len(self._free),
            "dim": self.dim,
            "dtype": str(self.dtype),
        }
