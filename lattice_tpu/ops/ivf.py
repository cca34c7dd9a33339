"""IVF-partitioned ANN scan: on-device k-means + nprobe bucket search.

SURVEY §7 step 4b / BASELINE config 3: past ~1M chunks a full flat scan
reads the whole embedding matrix from HBM per query batch; IVF reads only
`nprobe` clusters. Design:

- **k-means on device**: Lloyd iterations as two jitted steps — assignment
  is an argmax over a [N, C] cosine matmul (MXU), update is a scatter-add
  segment mean (VPU) — both O(N·C·d) with no host round-trips.
- **padded bucket layout**: rows are grouped by cluster into a dense
  [C, S, d] array (S = padded max cluster size) with a parallel id table
  and validity mask. Padding trades HBM capacity for static shapes — the
  TPU-native answer to Qdrant's pointer-chasing HNSW graph.
- **nprobe search**: query x centroids [B, C] -> top-nprobe clusters ->
  gather those buckets -> einsum scores -> top-k. HBM traffic per query is
  `nprobe·S·d` instead of `N·d`.

Honest physics notes:
- the gather path wins at small query batches (the online serving case);
  at large batches a flat fused scan amortizes the full matrix read and
  wins. `IVFIndex.search` therefore chunks batches, and the
  `ChunkStore`-level dispatcher picks flat vs IVF by batch size and corpus
  size. Recall is tunable by nprobe; the recall harness in tests measures
  recall@10 against the exact oracle (BASELINE's measured-recall contract).
- IVF recall depends on the corpus actually having cluster structure.
  Measured on-device at 1M x 768: near-isotropic data (per-dim noise >>
  center separation) gives recall@10 of only ~0.2 even at nprobe=64 —
  exactly as ANN theory predicts — while genuinely clustered data reaches
  0.9+ at nprobe ~= C/2 (tests). Real code embeddings are strongly
  clustered; the flat fused scan remains the guaranteed-recall fallback
  and the auto dispatcher never picks IVF silently.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from lattice_tpu.ops import topk as topk_ops

NEG_INF = -1e30


# ---- k-means ------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("n_clusters",))
def farthest_first_init(
    data: jax.Array,       # [N, d] f32 normalized
    valid: jax.Array,      # [N] bool
    first_idx: jax.Array,  # () i32 seed row
    n_clusters: int,
) -> jax.Array:
    """Greedy farthest-first centroid seeding (k-means++-style, on device)."""
    n, d = data.shape
    centroids0 = jnp.zeros((n_clusters, d), jnp.float32).at[0].set(
        data[first_idx])
    best_sim0 = jax.lax.dot_general(
        data, data[first_idx][None, :],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)[:, 0]

    def pick(carry, i):
        centroids, best_sim = carry
        masked = jnp.where(valid, best_sim, jnp.inf)
        far = jnp.argmin(masked).astype(jnp.int32)
        point = data[far]
        centroids = centroids.at[i].set(point.astype(jnp.float32))
        sim = jax.lax.dot_general(
            data, point[None, :],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)[:, 0]
        best_sim = jnp.maximum(best_sim, sim)
        return (centroids, best_sim), None

    (centroids, _), _ = jax.lax.scan(
        pick, (centroids0, best_sim0),
        jnp.arange(1, n_clusters, dtype=jnp.int32))
    return centroids


# Rows per assignment block: keeps the [block, C] score slab small (a full
# [N, C] matrix at 1M x 1024 would be 4 GB of HBM).
KMEANS_BLOCK = 65536


def _assign_stats(data_blocks, valid_blocks, centroids, n_clusters):
    """Chunked assignment pass: per-block argmax + partial sums under scan.

    Returns (assignments [nb, block], sums [C, d], counts [C], own_sim
    [nb, block]).
    """
    d = data_blocks.shape[-1]

    def block_step(carry, inputs):
        sums, counts = carry
        block, v = inputs
        scores = jax.lax.dot_general(
            block, centroids.astype(block.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)          # [block, C]
        assign = jnp.argmax(scores, axis=-1).astype(jnp.int32)
        own_sim = jnp.max(scores, axis=-1)
        w = v.astype(jnp.float32)
        sums = sums.at[assign].add(block * w[:, None])
        counts = counts.at[assign].add(w)
        return (sums, counts), (assign, own_sim)

    (sums, counts), (assigns, sims) = jax.lax.scan(
        block_step,
        (jnp.zeros((n_clusters, d), jnp.float32),
         jnp.zeros((n_clusters,), jnp.float32)),
        (data_blocks, valid_blocks))
    return assigns, sums, counts, sims


@functools.partial(jax.jit, static_argnames=("n_clusters", "iters"))
def kmeans_fit(
    data: jax.Array,       # [N, d] f32/bf16, L2-normalized rows
    valid: jax.Array,      # [N] bool
    init_idx: jax.Array,   # [C] i32 initial centroid rows
    n_clusters: int,
    iters: int = 10,
) -> tuple[jax.Array, jax.Array]:
    """Spherical k-means with empty-cluster reseeding, HBM-bounded via
    blockwise assignment. Returns (centroids [C,d], assignments [N] i32).

    Balance note: a size-PENALIZED Lloyd variant was tried for skewed
    corpora and measured unstable (penalty from the previous iteration's
    counts oscillates: on a 60%-dominant-mode corpus it ballooned padding
    waste 2.5x -> 13.7x). Balancing therefore happens downstream in the
    bucket LAYOUT (capped assignment + next-best spill, `_capped_layout`),
    which is stable by construction.
    """
    n, d = data.shape
    block = min(KMEANS_BLOCK, n)
    pad = (-n) % block
    if pad:
        data = jnp.concatenate([data, jnp.zeros((pad, d), data.dtype)])
        valid = jnp.concatenate([valid, jnp.zeros(pad, dtype=bool)])
    nb = (n + pad) // block
    data_blocks = data.reshape(nb, block, d)
    valid_blocks = valid.reshape(nb, block)
    centroids = farthest_first_init(data, valid, init_idx[0], n_clusters)

    def step(centroids, _):
        _, sums, counts, sims = _assign_stats(
            data_blocks, valid_blocks, centroids, n_clusters)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # Empty clusters reseed to the worst-served point (farthest from its
        # current centroid) instead of freezing in place.
        flat_sims = sims.reshape(-1)
        worst = jnp.argmin(jnp.where(valid, flat_sims, jnp.inf)).astype(jnp.int32)
        empty = counts[:, None] <= 0
        first_empty = jnp.argmax(empty[:, 0]).astype(jnp.int32)
        reseeded = jnp.where(
            (jnp.arange(n_clusters)[:, None] == first_empty) & empty,
            data[worst][None, :], centroids)
        new = jnp.where(empty, reseeded, new)
        norms = jnp.linalg.norm(new, axis=-1, keepdims=True)
        new = new / jnp.maximum(norms, 1e-12)
        return new, None

    centroids, _ = jax.lax.scan(step, centroids, None, length=iters)
    assigns, _, _, _ = _assign_stats(
        data_blocks, valid_blocks, centroids, n_clusters)
    assignments = assigns.reshape(-1)[:n]
    return centroids, assignments


@functools.partial(jax.jit, static_argnames=("n_clusters", "c_top"))
def assign_topc(
    data: jax.Array,       # [N, d] f32
    centroids: jax.Array,  # [C, d] f32
    n_clusters: int,
    c_top: int = 4,
) -> tuple[jax.Array, jax.Array]:
    """Blockwise top-c_top centroid (sims, ids) per row — the capped
    layout's spill candidates. Returns ([N, c_top] f32, [N, c_top] i32)."""
    n, d = data.shape
    block = min(KMEANS_BLOCK, n)
    pad = (-n) % block
    if pad:
        data = jnp.concatenate([data, jnp.zeros((pad, d), data.dtype)])
    nb = (n + pad) // block
    data_blocks = data.reshape(nb, block, d)
    c_top = min(c_top, n_clusters)

    def block_step(_, blk):
        scores = jax.lax.dot_general(
            blk, centroids.astype(blk.dtype),
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        s, i = jax.lax.top_k(scores, c_top)
        return None, (s, i.astype(jnp.int32))

    _, (sims, ids) = jax.lax.scan(block_step, None, data_blocks)
    return (sims.reshape(-1, c_top)[:n], ids.reshape(-1, c_top)[:n])


def _capped_layout(top_sims: np.ndarray, top_ids: np.ndarray,
                   valid: np.ndarray, n_clusters: int,
                   max_load: float | None) -> np.ndarray:
    """Bucket-id layout with a per-bucket load cap (balanced IVF).

    Every bucket holds at most cap = ceil(max_load * N_live / C) rows
    (rounded to a sublane group), so the padded bucket size S — which
    every probe pays in DMA regardless of fill — is bounded by max_load
    instead of the largest natural cluster. Overfull clusters keep their
    LARGEST-MARGIN rows (sim(best) - sim(second) — the rows that would
    lose the most by moving) and spill the rest to the row's next-best
    centroid with room; a spilled row is still found whenever its 2nd/3rd
    choice is probed. Stable by construction (no feedback loop).
    max_load=None reproduces the uncapped layout.
    """
    live = np.flatnonzero(valid)
    n_live = len(live)
    first = top_ids[live, 0]
    natural = int(np.bincount(first, minlength=n_clusters).max()) if n_live \
        else 1
    if max_load is None:
        cap = natural
    else:
        # the cap bounds skew; it must never WIDEN buckets past their
        # natural max (near-uniform corpora would otherwise pay padded
        # DMA for slack that nothing fills)
        cap = min(int(np.ceil(max_load * max(n_live, 1) / n_clusters)),
                  natural)
    cap = max(int(np.ceil(max(cap, 1) / 8) * 8), 8)
    bucket_ids = np.full((n_clusters, cap), -1, dtype=np.int32)
    fill = np.zeros(n_clusters, dtype=np.int64)
    margin = top_sims[live, 0] - top_sims[live, 1] \
        if top_sims.shape[1] > 1 else np.zeros(n_live)
    order = np.argsort(first, kind="stable")
    sorted_first = first[order]
    starts = np.searchsorted(sorted_first, np.arange(n_clusters + 1))
    spilled: list[int] = []           # indices into `live`
    for c in range(n_clusters):
        seg = order[starts[c]:starts[c + 1]]
        if len(seg) <= cap:
            bucket_ids[c, :len(seg)] = live[seg]
            fill[c] = len(seg)
        else:
            keep = seg[np.argsort(-margin[seg], kind="stable")[:cap]]
            bucket_ids[c, :cap] = live[keep]
            fill[c] = cap
            spilled.extend(seg[np.argsort(-margin[seg],
                                          kind="stable")[cap:]].tolist())
    c_top = top_ids.shape[1]
    room = np.flatnonzero(fill < cap)
    ri = 0
    for li in spilled:
        row = live[li]
        placed = False
        for j in range(1, c_top):
            c2 = int(top_ids[row, j])
            if fill[c2] < cap:
                bucket_ids[c2, fill[c2]] = row
                fill[c2] += 1
                placed = True
                break
        if not placed:
            # guaranteed space: C*cap >= max_load * n_live > n_live
            while ri < len(room) and fill[room[ri]] >= cap:
                ri += 1
            c2 = int(room[ri])
            bucket_ids[c2, fill[c2]] = row
            fill[c2] += 1
    return bucket_ids


# ---- search kernel ------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("k", "nprobe"))
def ivf_search_batch(
    queries: jax.Array,       # [B, d] f32 normalized
    centroids: jax.Array,     # [C, d] f32
    bucket_data: jax.Array,   # [C, S, d] bf16/f32
    bucket_ids: jax.Array,    # [C, S] i32 (global row ids; -1 pad)
    bucket_valid: jax.Array,  # [C, S] bool
    k: int,
    nprobe: int,
) -> tuple[jax.Array, jax.Array]:
    c_scores = jax.lax.dot_general(
        queries, centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)              # [B, C]
    _, probe = jax.lax.top_k(c_scores, nprobe)           # [B, P]
    b = queries.shape[0]
    c, s, d = bucket_data.shape
    probe_flat = probe.reshape(-1)                       # [B*P]
    # One-hot matmul IS the TPU-native gather for big rows: XLA's gather
    # lowers to a slow serial loop (~3 GB/s measured), while an
    # [B*P, C] one-hot against the [C, S*d] bucket matrix rides the MXU at
    # full bandwidth.
    onehot = jax.nn.one_hot(probe_flat, c, dtype=bucket_data.dtype)
    gathered = jax.lax.dot_general(
        onehot, bucket_data.reshape(c, s * d),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=bucket_data.dtype,
    ).reshape(b, nprobe, s, d)
    # HIGHEST precision: default TPU f32 matmul runs bf16 passes, which
    # rounds integer ids above 4096 (8-bit mantissa). Exact for ids < 2^24.
    ids = jax.lax.dot_general(
        jax.nn.one_hot(probe_flat, c, dtype=jnp.float32),
        bucket_ids.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32).reshape(b, nprobe, s)
    alive = ids >= 0
    scores = jnp.einsum(
        "bd,bpsd->bps", queries.astype(bucket_data.dtype), gathered,
        preferred_element_type=jnp.float32)
    scores = jnp.where(alive, scores, NEG_INF)
    b, p, s = scores.shape
    flat_scores = scores.reshape(b, p * s)
    flat_ids = ids.reshape(b, p * s)
    k_eff = min(k, p * s)
    top_scores, pos = jax.lax.top_k(flat_scores, k_eff)
    top_ids = jnp.take_along_axis(flat_ids, pos, axis=-1)
    return top_scores, top_ids


# ---- index --------------------------------------------------------------


@jax.jit
def _mask_bucket_ids(bucket_ids: jax.Array, mask: jax.Array) -> jax.Array:
    """Fold a [N] row mask into the [C, S] id table: filtered rows -> -1.

    Payload filters ride the existing `ids >= 0` padding check in both
    search kernels, so filtering costs one scalar gather — no kernel
    changes (VERDICT r1 #1: filters must work on the IVF serving path).
    """
    safe = jnp.maximum(bucket_ids, 0)
    alive = jnp.take(mask, safe) & (bucket_ids >= 0)
    return jnp.where(alive, bucket_ids, -1)


class IVFIndex:
    def __init__(self, centroids: np.ndarray, bucket_data, bucket_ids,
                 bucket_valid, n_rows: int, dtype: str):
        self.centroids = centroids
        self.bucket_data = bucket_data
        self.bucket_ids = bucket_ids
        self.bucket_valid = bucket_valid
        self.n_rows = n_rows
        self.dtype = dtype
        # recall@10 vs the exact scan measured on a self-sample at build
        # time (None until measure_recall runs). The auto dispatcher only
        # serves through IVF when this clears its threshold — IVF recall
        # collapses on isotropic corpora (module docstring) and the
        # dispatcher must never pick it silently.
        self.measured_recall: float | None = None
        self.measured_nprobe: int | None = None
        self.hollow = False   # buckets released (verdict kept) — see below
        # incremental-mutation bookkeeping (host ints only): row -> (bucket,
        # slot) locator + per-bucket occupancy, so watch-mode upserts are
        # O(delta) device scatters instead of a full rebuild (the reference
        # incrementally upserts Qdrant points, `embeddings/client.py:115`)
        self._init_locator()

    def _init_locator(self) -> None:
        ids_np = np.asarray(self.bucket_ids)
        c, s = ids_np.shape
        max_row = max(int(ids_np.max()), self.n_rows - 1, 0)
        self._row_bucket = np.full(max_row + 1, -1, dtype=np.int32)
        self._row_pos = np.full(max_row + 1, -1, dtype=np.int32)
        occ = ids_np >= 0
        cs, ps = np.nonzero(occ)
        rows = ids_np[cs, ps]
        self._row_bucket[rows] = cs
        self._row_pos[rows] = ps
        self._fill = occ.sum(axis=1).astype(np.int64)
        self._holes: dict[int, list[int]] = {}

    def _grow_locator(self, max_row: int) -> None:
        cur = len(self._row_bucket)
        if max_row < cur:
            return
        pad = max_row + 1 - cur
        self._row_bucket = np.concatenate(
            [self._row_bucket, np.full(pad, -1, np.int32)])
        self._row_pos = np.concatenate(
            [self._row_pos, np.full(pad, -1, np.int32)])

    def insert(self, emb_rows: jax.Array, row_ids: Sequence[int]) -> None:
        """O(delta) upsert: assign each new row to its nearest centroid and
        scatter it into a free bucket slot on device.

        Slot policy mirrors the builder: the home bucket's first hole or
        tail slot; if full, spill to any bucket with room (findable, just
        probed less accurately); if every bucket is full, widen all buckets
        by 8 slots once. Centroids do not move — measured_recall drifts
        with heavy churn, so callers rebuild after large deltas
        (ChunkStore tracks the drift ratio).
        """
        m = int(emb_rows.shape[0])
        if m == 0:
            return
        if self.hollow:
            raise RuntimeError(
                "hollow IVF (buckets released after a recall refusal) "
                "cannot take incremental updates; rebuild first")
        data_f32 = emb_rows.astype(jnp.float32)
        sims = jax.lax.dot_general(
            data_f32, self.centroids,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        assign = np.asarray(jnp.argmax(sims, axis=-1))
        self._grow_locator(max(row_ids))
        cs: list[int] = []
        ps: list[int] = []
        for j, row in enumerate(row_ids):
            c = int(assign[j])
            pos = self._take_slot(c)
            cs.append(pos[0])
            ps.append(pos[1])
            self._row_bucket[row] = pos[0]
            self._row_pos[row] = pos[1]
        cs_a = jnp.asarray(np.asarray(cs, np.int32))
        ps_a = jnp.asarray(np.asarray(ps, np.int32))
        self.bucket_ids = self.bucket_ids.at[cs_a, ps_a].set(
            jnp.asarray(np.asarray(row_ids, np.int32)))
        self.bucket_valid = self.bucket_valid.at[cs_a, ps_a].set(True)
        self.bucket_data = self.bucket_data.at[cs_a, ps_a, :].set(
            data_f32.astype(self.bucket_data.dtype))

    def _take_slot(self, c: int) -> tuple[int, int]:
        holes = self._holes.get(c)
        if holes:
            return c, holes.pop()
        if self._fill[c] < self.bucket_size:
            pos = int(self._fill[c])
            self._fill[c] += 1
            return c, pos
        # home bucket full: spill to any bucket with room
        for other in np.argsort(self._fill):
            other = int(other)
            if self._holes.get(other):
                return other, self._holes[other].pop()
            if self._fill[other] < self.bucket_size:
                pos = int(self._fill[other])
                self._fill[other] += 1
                return other, pos
        # everything full: widen every bucket by one sublane group
        c_n, s, d = self.bucket_data.shape
        self.bucket_data = jnp.concatenate(
            [self.bucket_data,
             jnp.zeros((c_n, 8, d), self.bucket_data.dtype)], axis=1)
        self.bucket_ids = jnp.concatenate(
            [self.bucket_ids, jnp.full((c_n, 8), -1, jnp.int32)], axis=1)
        self.bucket_valid = jnp.concatenate(
            [self.bucket_valid, jnp.zeros((c_n, 8), bool)], axis=1)
        pos = int(self._fill[c])
        self._fill[c] += 1
        return c, pos

    def remove(self, row_ids: Sequence[int]) -> None:
        if self.hollow:
            raise RuntimeError(
                "hollow IVF (buckets released after a recall refusal) "
                "cannot take incremental updates; rebuild first")
        """Mark bucket slots dead (-1 id scores -inf in both kernels)."""
        cs, ps = [], []
        for row in row_ids:
            if row >= len(self._row_bucket):
                continue
            c, p = int(self._row_bucket[row]), int(self._row_pos[row])
            if c < 0:
                continue
            cs.append(c)
            ps.append(p)
            self._holes.setdefault(c, []).append(p)
            self._row_bucket[row] = -1
            self._row_pos[row] = -1
        if not cs:
            return
        cs_a = jnp.asarray(np.asarray(cs, np.int32))
        ps_a = jnp.asarray(np.asarray(ps, np.int32))
        self.bucket_ids = self.bucket_ids.at[cs_a, ps_a].set(-1)
        self.bucket_valid = self.bucket_valid.at[cs_a, ps_a].set(False)

    @classmethod
    def build_from_device(cls, emb_dev: jax.Array, valid: np.ndarray,
                          n_clusters: int | None = None, iters: int = 10,
                          dtype: str = "bfloat16", seed: int = 0,
                          max_load: float | None = 2.0) -> "IVFIndex":
        """Build directly from a device-resident normalized matrix.

        Only the [N, 4] assignment-candidate table (~32 MB at 1M rows)
        round-trips to the host; the bucket permutation itself is a device
        gather, so the build runs at HBM bandwidth instead of host-memcpy
        speed (the BASELINE 'index build at HBM bandwidth' target).
        `max_load` bounds every bucket to max_load * N/C rows via
        `_capped_layout` (skew control); None keeps natural cluster sizes.
        """
        import time as _time
        _t0 = _time.perf_counter()
        valid = np.asarray(valid, dtype=bool)
        n, d = emb_dev.shape
        if n_clusters is None:
            n_clusters = max(int(np.sqrt(max(n, 1))), 1)
        n_clusters = min(n_clusters, max(int(valid.sum()), 1))
        rng = np.random.default_rng(seed)
        live_rows = np.flatnonzero(valid)
        init = rng.choice(live_rows, size=n_clusters, replace=False) \
            if len(live_rows) >= n_clusters else \
            rng.integers(0, n, size=n_clusters)
        # k-means runs on the RESIDENT matrix dtype (bf16): the f32 view
        # cost an extra 2x-corpus transient (12 GB at 4M x 768 - R3) and
        # the assignment matmuls accumulate f32 either way
        centroids, _ = kmeans_fit(
            emb_dev, jnp.asarray(valid),
            jnp.asarray(init.astype(np.int32)), n_clusters, iters)
        sims, ids = assign_topc(emb_dev, centroids, n_clusters)
        bucket_ids = _capped_layout(np.asarray(sims), np.asarray(ids),
                                    valid, n_clusters, max_load)
        cap = bucket_ids.shape[1]
        bucket_valid = bucket_ids >= 0
        # device gather: [C*S] rows -> [C, S, d]
        flat_ids = jnp.asarray(np.maximum(bucket_ids, 0).reshape(-1))
        bucket_data = jnp.take(emb_dev, flat_ids, axis=0).reshape(
            n_clusters, cap, d).astype(jnp.dtype(dtype))
        bucket_data = bucket_data * jnp.asarray(
            bucket_valid[..., None], dtype=bucket_data.dtype)
        out = cls(
            centroids=centroids,
            bucket_data=bucket_data,
            bucket_ids=jnp.asarray(bucket_ids),
            bucket_valid=jnp.asarray(bucket_valid),
            n_rows=n, dtype=dtype,
        )
        out.build_seconds = _time.perf_counter() - _t0
        return out

    @classmethod
    def restore(cls, centroids: np.ndarray, bucket_ids: np.ndarray,
                emb_dev: jax.Array, measured_recall: float | None,
                measured_nprobe: int | None, dtype: str = "bfloat16",
                hollow: bool = False) -> "IVFIndex":
        """Rebuild a persisted partition without re-running k-means.

        The expensive parts of a build are clustering + the recall
        self-measure (12-19 s at 1M); the bucket DATA is just a device
        gather of the (already loaded) corpus rows, so restoring costs
        milliseconds. A hollow restore carries only the centroids + the
        refusal verdict, so a reloaded isotropic index skips the
        build-then-refuse cycle entirely."""
        centroids_dev = jnp.asarray(centroids, jnp.float32)
        n = int(emb_dev.shape[0])
        if hollow or bucket_ids.size == 0:
            # construct with a minimal table (the locator needs one),
            # then drop it exactly as release_buckets does
            tiny = np.full((1, 1), -1, np.int32)
            out = cls(centroids=centroids_dev,
                      bucket_data=jnp.zeros((1, 1, centroids.shape[1]),
                                            jnp.dtype(dtype)),
                      bucket_ids=tiny, bucket_valid=tiny >= 0,
                      n_rows=n, dtype=dtype)
            out.release_buckets()
        else:
            c, cap = bucket_ids.shape
            d = int(emb_dev.shape[1])
            bucket_valid = bucket_ids >= 0
            flat_ids = jnp.asarray(np.maximum(bucket_ids, 0).reshape(-1))
            bucket_data = jnp.take(emb_dev, flat_ids, axis=0).reshape(
                c, cap, d).astype(jnp.dtype(dtype))
            bucket_data = bucket_data * jnp.asarray(
                bucket_valid[..., None], dtype=bucket_data.dtype)
            out = cls(centroids=centroids_dev,
                      bucket_data=bucket_data,
                      bucket_ids=jnp.asarray(bucket_ids),
                      bucket_valid=jnp.asarray(bucket_valid),
                      n_rows=n, dtype=dtype)
        out.measured_recall = (None if measured_recall is None
                               else float(measured_recall))
        out.measured_nprobe = (None if measured_nprobe is None
                               else int(measured_nprobe))
        return out

    @classmethod
    def build(cls, embeddings: np.ndarray, valid: np.ndarray,
              n_clusters: int | None = None, iters: int = 10,
              dtype: str = "bfloat16", seed: int = 0,
              max_load: float | None = 2.0) -> "IVFIndex":
        """Cluster + lay out capped padded buckets (host-array entry).

        n_clusters defaults to ~sqrt(N) (standard IVF heuristic); the
        bucket layout is `_capped_layout` with `max_load` (2.0 default:
        measured on this repo's pipeline embeddings, padding waste drops
        4.6x -> 2.3x at ~1pp recall@8 cost, 0.94 -> 0.93 — see tests).
        """
        emb = topk_ops.l2_normalize(np.asarray(embeddings, np.float32))
        valid = np.asarray(valid, dtype=bool)
        n, d = emb.shape
        if n_clusters is None:
            n_clusters = max(int(np.sqrt(max(n, 1))), 1)
        n_clusters = min(n_clusters, max(int(valid.sum()), 1))
        rng = np.random.default_rng(seed)
        live_rows = np.flatnonzero(valid)
        init = rng.choice(live_rows, size=n_clusters, replace=False) \
            if len(live_rows) >= n_clusters else \
            rng.integers(0, n, size=n_clusters)
        centroids, _ = kmeans_fit(
            jnp.asarray(emb), jnp.asarray(valid),
            jnp.asarray(init.astype(np.int32)), n_clusters, iters)
        sims, ids = assign_topc(jnp.asarray(emb), centroids, n_clusters)
        bucket_ids = _capped_layout(np.asarray(sims), np.asarray(ids),
                                    valid, n_clusters, max_load)
        cap = bucket_ids.shape[1]
        bucket_valid = bucket_ids >= 0
        safe = np.maximum(bucket_ids, 0)
        bucket_data = emb[safe.reshape(-1)].reshape(n_clusters, cap, d)
        bucket_data[~bucket_valid] = 0.0
        return cls(
            centroids=jnp.asarray(np.asarray(centroids)),
            bucket_data=jnp.asarray(bucket_data, dtype=jnp.dtype(dtype)),
            bucket_ids=jnp.asarray(bucket_ids),
            bucket_valid=jnp.asarray(bucket_valid),
            n_rows=n, dtype=dtype,
        )

    @property
    def n_clusters(self) -> int:
        return int(self.centroids.shape[0])

    @property
    def bucket_size(self) -> int:
        return int(self.bucket_data.shape[1])

    @staticmethod
    def _on_tpu() -> bool:
        try:
            return jax.devices()[0].platform.lower() in ("tpu", "axon")
        except Exception:
            return False

    def search(self, queries: np.ndarray, k: int, nprobe: int = 8,
               max_batch: int | None = None,
               mask: np.ndarray | jax.Array | None = None
               ) -> tuple[np.ndarray, np.ndarray]:
        """Chunked nprobe search. Returns (scores [B,k], row ids [B,k]).

        On TPU the fused probe kernel scores buckets straight from HBM
        (measured at 1M x 768, clustered: 31k qps at nprobe=4 vs the flat
        scan's 24k, recall 0.992 vs 0.961; single-query 2.9 ms vs 5.9);
        elsewhere the one-hot-gather XLA path serves.

        `mask`: optional [N] bool row filter (payload filters); folded into
        the id table so filtered rows score -inf. Probe selection is not
        filter-aware — the dispatcher falls back to flat under extreme
        selectivity.
        """
        q = topk_ops.l2_normalize(np.atleast_2d(queries))
        nprobe = min(nprobe, self.n_clusters)
        use_fused = self._on_tpu()
        bucket_ids = self.bucket_ids
        if mask is not None:
            bucket_ids = _mask_bucket_ids(bucket_ids, jnp.asarray(mask))
        if max_batch is None:
            # keep B*P bounded so the fused kernel's full-VMEM id/score
            # slabs stay small
            max_batch = max(2048 // max(nprobe, 1), 8) if use_fused else 32
        out_s, out_i = [], []
        for start in range(0, len(q), max_batch):
            s, i = self._search_chunk(jnp.asarray(q[start:start + max_batch]),
                                      bucket_ids, k, nprobe, use_fused)
            out_s.append(np.asarray(s))
            out_i.append(np.asarray(i))
        return np.concatenate(out_s), np.concatenate(out_i)

    def _search_chunk(self, chunk: jax.Array, bucket_ids: jax.Array,
                      k: int, nprobe: int, use_fused: bool
                      ) -> tuple[jax.Array, jax.Array]:
        if use_fused:
            return ivf_search_fused(chunk, self.centroids, self.bucket_data,
                                    bucket_ids, nprobe, k)
        return ivf_search_batch(chunk, self.centroids, self.bucket_data,
                                bucket_ids, self.bucket_valid, k, nprobe)

    def search_device(self, queries: jax.Array, k: int, nprobe: int = 8,
                      mask: jax.Array | None = None
                      ) -> tuple[jax.Array, jax.Array]:
        """Device-resident single-chunk search: jax arrays in and out, no
        host sync — back-to-back calls pipeline over the relay (the same
        lesson as QuantizedView.search_device). Caller bounds the batch."""
        nprobe = min(nprobe, self.n_clusters)
        bucket_ids = self.bucket_ids
        if mask is not None:
            bucket_ids = _mask_bucket_ids(bucket_ids, mask)
        return self._search_chunk(queries.astype(jnp.float32), bucket_ids,
                                  k, nprobe, self._on_tpu())

    def measure_recall(self, emb_dev: jax.Array, valid: jax.Array,
                       nprobe: int = 8, n_sample: int = 128,
                       k: int = 10, seed: int = 0) -> float:
        """Self-sample recall@k vs the exact scan; stored on the index.

        Costs one flat batch + one IVF batch — noise next to the build.
        Sampled queries are live corpus rows themselves (the distribution
        search queries land in after encoding), so an isotropic corpus
        measures its own ~0.2 recall here and the dispatcher routes flat.
        """
        live = np.flatnonzero(np.asarray(valid))
        if len(live) == 0:
            self.measured_recall = 0.0
            self.measured_nprobe = nprobe
            return 0.0
        rng = np.random.default_rng(seed)
        rows = rng.choice(live, size=min(n_sample, len(live)), replace=False)
        q = jnp.take(emb_dev, jnp.asarray(rows.astype(np.int32)),
                     axis=0).astype(jnp.float32)
        k_eff = min(k, len(live))
        _, exact_i = topk_ops.flat_topk(q, emb_dev, valid, k_eff)
        exact_np = np.asarray(exact_i)
        _, got_i = self.search(np.asarray(q), k_eff, nprobe=nprobe)
        hits = sum(
            len(set(got_i[i].tolist()) & set(exact_np[i].tolist()))
            for i in range(len(rows)))
        self.measured_recall = hits / (len(rows) * k_eff)
        self.measured_nprobe = nprobe
        return self.measured_recall

    def memory_bytes(self) -> int:
        if self.hollow:
            return self.centroids.size * 4
        return (self.bucket_data.size * self.bucket_data.dtype.itemsize
                + self.bucket_ids.size * 4 + self.bucket_valid.size
                + self.centroids.size * 4)

    def release_buckets(self) -> None:
        """Free the bucket arrays but KEEP the measured-recall verdict.

        When the recall gate refuses an IVF build (isotropic corpus), the
        padded buckets are ~the corpus size in HBM for a partition that
        will never serve; dropping them while keeping `measured_recall`
        lets the dispatcher remember the refusal without paying for it.
        Serving entry points rebuild if a hollow index is ever forced.
        """
        self.bucket_data = None
        self.bucket_ids = None
        self.bucket_valid = None
        self.hollow = True


# ---- fused probe kernel (PrefetchScalarGridSpec) -------------------------


def _probe_kernel(probe_ref, q_ref, bucket_ref, ids_ref,
                  out_scores_ref, out_ids_ref, *, nprobe: int):
    """One grid step scores one (query, probed-bucket) pair.

    The bucket block to fetch is chosen by the scalar-prefetched probe
    table inside the BlockSpec index_map, so Pallas pipelines the bucket
    DMAs itself and the gathered embeddings never materialize in HBM —
    only the [B*P, S] score slab does (4 bytes per candidate instead of
    d*2: a ~384x traffic cut over the one-hot gather path). Everything
    except the bucket block rides full VMEM (Mosaic rejects 1-row blocks).
    """
    i = pl.program_id(0)
    qi = i // nprobe
    q = q_ref[pl.ds(qi, 1), :]                    # [1, d]
    data = bucket_ref[0]                          # [S, d]
    scores = jax.lax.dot_general(
        q.astype(data.dtype), data,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)       # [1, S]
    ids = ids_ref[pl.ds(i, 1), :]                 # [1, S] (pre-gathered)
    out_scores_ref[pl.ds(i, 1), :] = jnp.where(ids >= 0, scores, NEG_INF)
    out_ids_ref[pl.ds(i, 1), :] = ids


@functools.partial(jax.jit, static_argnames=("nprobe", "k", "interpret"))
def ivf_search_fused(
    queries: jax.Array,       # [B, d] f32 normalized
    centroids: jax.Array,     # [C, d] f32
    bucket_data: jax.Array,   # [C, S, d]
    bucket_ids: jax.Array,    # [C, S] i32 (-1 pad)
    nprobe: int,
    k: int,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array]:
    """Fused nprobe scan. Returns (scores [B,k], row ids [B,k])."""
    from jax.experimental import pallas as pl  # noqa: F401 (module-level alias)

    b, d = queries.shape
    c, s, _ = bucket_data.shape
    nprobe = min(nprobe, c)
    c_scores = jax.lax.dot_general(
        queries, centroids,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    _, probe = jax.lax.top_k(c_scores, nprobe)            # [B, P]
    probe_flat = probe.reshape(-1).astype(jnp.int32)      # [B*P]
    # ids are small ([B*P, S] i32); gather them at HIGHEST precision via
    # one-hot outside the kernel so the kernel reads its own row directly
    ids_rows = jax.lax.dot_general(
        jax.nn.one_hot(probe_flat, c, dtype=jnp.float32),
        bucket_ids.astype(jnp.float32),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(jnp.int32)                                   # [B*P, S]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b * nprobe,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),        # q, full
            pl.BlockSpec((1, s, d), lambda i, probe: (probe[i], 0, 0),
                         memory_space=pltpu.VMEM),        # bucket block
            pl.BlockSpec(memory_space=pltpu.VMEM),        # ids rows, full
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
    )
    kernel = functools.partial(_probe_kernel, nprobe=nprobe)
    scores_flat, ids_flat = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((b * nprobe, s), jnp.float32),
            jax.ShapeDtypeStruct((b * nprobe, s), jnp.int32),
        ],
        interpret=interpret,
    )(probe_flat, queries, bucket_data, ids_rows)
    scores = scores_flat.reshape(b, nprobe * s)
    ids = ids_flat.reshape(b, nprobe * s)
    k_eff = min(k, nprobe * s)
    top_scores, pos = jax.lax.top_k(scores, k_eff)
    top_ids = jnp.take_along_axis(ids, pos, axis=-1)
    return top_scores, top_ids
