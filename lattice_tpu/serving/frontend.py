"""Dynamic micro-batching frontend: coalesce concurrent queries into one
device call.

Reference parity note: the reference serves strictly one query per
request — the MCP server dispatches each `tools/call` alone
(`src/lattice/mcp/server.py:259-295`) and the engine's vector search is a
single Qdrant query (`src/lattice/query/engine.py:139-146`); there is no
concurrent-serving story because a CPU HNSW probe is cheap per query. On
TPU the economics invert: one B=256 execution costs barely more than B=1
(the corpus read dominates — R4_BENCH_FINAL5-7: ~24 ms single call on the
relay sync floor vs 2.6-4.4 ms/query amortized), so a serving process
should COALESCE whatever concurrency it has into one `search_device`
call. This module is that coalescing point: callers `submit()` query
vectors from any thread and get futures; one worker drains the queue into
padded batches and dispatches them as single executions.

Batch shapes are padded up to a geometric bucket (powers of two, capped
at `max_batch`) so XLA compiles a handful of shapes once instead of
retracing every distinct concurrency level — the same discipline as the
encoder's length buckets (`models/unixcoder.py`) and the deep-search
batch chunking (`query/engine.py` DEEP_BATCH_CHUNK).
"""

from __future__ import annotations

import logging
import queue
import threading
import time
from collections import deque
from concurrent.futures import Future
from dataclasses import dataclass, field

import numpy as np

logger = logging.getLogger(__name__)


@dataclass
class FrontendStats:
    """Counters a serving harness can scrape (reference keeps analogous
    DB-derived counters, `src/lattice/query/engine.py:281-309`)."""

    queries: int = 0
    batches: int = 0
    padded_rows: int = 0
    errors: int = 0
    # bounded: a long-lived server dispatches millions of batches
    batch_sizes: deque = field(default_factory=lambda: deque(maxlen=1024))
    # submit->result wall clock of recent queries, milliseconds
    latencies_ms: deque = field(default_factory=lambda: deque(maxlen=4096))

    @property
    def mean_batch(self) -> float:
        return (self.queries / self.batches) if self.batches else 0.0

    def latency_percentile(self, pct: float) -> float | None:
        """p50/p95/... over the recent-latency window, or None before
        any traffic."""
        if not self.latencies_ms:
            return None
        return float(np.percentile(np.asarray(self.latencies_ms), pct))


class _Item:
    __slots__ = ("vec", "k", "future", "t_submit")

    def __init__(self, vec: np.ndarray, k: int, future: Future):
        self.vec = vec
        self.k = k
        self.future = future
        self.t_submit = time.monotonic()


class BatchingFrontend:
    """Coalesces concurrent `submit()` calls into single device searches.

    Parameters
    ----------
    store:
        A `ChunkStore` (or anything with `search_device(queries, k)` and
        a `dim` attribute).
    max_batch:
        Hard cap on coalesced batch size (also the largest pad bucket).
    max_wait_ms:
        How long the worker holds an open batch waiting for more queries
        after the first one arrives. 0 disables waiting (each drain takes
        whatever is already queued). On a relay-attached chip the sync
        floor (~24 ms) dwarfs any sane wait; co-located serving wants
        1-2 ms.
    filters / method:
        Forwarded to `search_device`. One frontend serves one (filters,
        method) configuration; run several frontends for several.
    """

    def __init__(self, store, *, max_batch: int = 256,
                 max_wait_ms: float = 2.0,
                 filters: dict | None = None,
                 method: str = "auto"):
        if max_batch < 1:
            raise ValueError("max_batch must be >= 1")
        self.store = store
        self.max_batch = int(max_batch)
        self.max_wait_s = max(0.0, float(max_wait_ms)) / 1000.0
        self.filters = filters
        self.method = method
        self.stats = FrontendStats()
        self._queue: queue.Queue[_Item | None] = queue.Queue()
        self._closed = False
        # makes the closed-check + enqueue atomic against close(): without
        # it a submit racing close() could enqueue after the worker exits
        # and hang its future forever
        self._submit_lock = threading.Lock()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="lattice-serving-frontend")
        self._worker.start()

    # ---- client side ----------------------------------------------------

    def submit(self, vec: np.ndarray, k: int = 10) -> Future:
        """Enqueue one query vector; resolves to (scores, ids) numpy
        arrays of length k (ids -1-padded when the corpus is smaller)."""
        fut: Future = Future()
        v = np.asarray(vec, dtype=np.float32).reshape(-1)
        dim = getattr(self.store, "dim", None) or v.shape[0]
        if v.shape[0] != dim:
            fut.set_exception(ValueError(
                f"dim mismatch: got {v.shape[0]}, store is {dim}"))
            return fut
        if k < 1:
            fut.set_exception(ValueError("k must be >= 1"))
            return fut
        with self._submit_lock:
            if self._closed:
                fut.set_exception(RuntimeError("frontend is closed"))
                return fut
            self._queue.put(_Item(v, int(k), fut))
        return fut

    def search(self, vec: np.ndarray, k: int = 10):
        """Blocking convenience wrapper around `submit`."""
        return self.submit(vec, k).result()

    def close(self, timeout: float | None = 5.0) -> None:
        """Stop the worker after draining already-submitted queries.
        Idempotent; later `submit()` calls resolve to an error."""
        with self._submit_lock:
            if self._closed:
                return
            self._closed = True
            self._queue.put(None)  # wake + stop sentinel
        self._worker.join(timeout=timeout)
        if self._worker.is_alive():
            # a large backlog can outlive the timeout; the drain is
            # finite (the closed flag stops new submits), so wait it out
            # rather than nulling the store under the worker's feet
            logger.warning("frontend still draining after %.1fs; waiting",
                           timeout or 0.0)
            self._worker.join()
        # a submit() racing close() can pass the closed-check yet enqueue
        # after the worker exits; fail those futures instead of hanging
        while True:
            try:
                it = self._queue.get_nowait()
            except queue.Empty:
                break
            if it is not None and not it.future.done():
                it.future.set_exception(RuntimeError("frontend is closed"))
        # drop the store reference: a closed frontend must not pin the
        # corpus (a lingering frontend object kept a 1M-row store's HBM
        # alive through the owner's `del store` + gc.collect() and OOMed
        # the next big allocation — R4_BENCH_FINAL8)
        self.store = None

    def __enter__(self) -> "BatchingFrontend":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    # ---- worker side -----------------------------------------------------

    @staticmethod
    def _bucket(n: int, cap: int) -> int:
        b = 1
        while b < n:
            b <<= 1
        return min(b, max(cap, n))

    def _drain(self, first: _Item) -> list[_Item]:
        """Collect up to max_batch items: everything already queued, then
        keep the batch open max_wait_s for stragglers."""
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            timeout = deadline - time.monotonic()
            try:
                item = (self._queue.get_nowait() if timeout <= 0
                        else self._queue.get(timeout=timeout))
            except queue.Empty:
                break
            if item is None:           # stop sentinel: put it back for _run
                self._queue.put(None)
                break
            batch.append(item)
        return batch

    def _dispatch(self, batch: list[_Item]) -> None:
        # claim each future first: after set_running_or_notify_cancel()
        # returns True, fut.cancel() can no longer succeed, so the
        # set_result/set_exception below cannot raise InvalidStateError
        # (a cancel() landing between a cancelled() check and set_result
        # would otherwise kill the worker thread and hang every later
        # submit)
        batch = [it for it in batch
                 if it.future.set_running_or_notify_cancel()]
        if not batch:
            return
        try:
            # EVERYTHING from here on is guarded: the futures are claimed,
            # so an exception anywhere (batch assembly included — e.g. a
            # mixed-dim batch when the store exposes no `dim`) must fan
            # out to them or their callers hang forever
            n = len(batch)
            k_max = max(it.k for it in batch)
            bucket = self._bucket(n, self.max_batch)
            q = np.zeros((bucket, batch[0].vec.shape[0]), dtype=np.float32)
            for i, it in enumerate(batch):
                q[i] = it.vec
            if bucket > n:              # pad rows repeat a real query so
                q[n:] = q[0]            # normalization never sees zeros
            scores, ids = self.store.search_device(
                q, k_max, filters=self.filters, method=self.method)
            scores = np.asarray(scores, dtype=np.float32)
            ids = np.asarray(ids)
            if ids.shape[1] < k_max:
                # the kernel clamps k to the store capacity; keep the
                # documented contract (length-k, -1-padded)
                pad = k_max - ids.shape[1]
                ids = np.pad(ids, ((0, 0), (0, pad)), constant_values=-1)
                scores = np.pad(scores, ((0, 0), (0, pad)),
                                constant_values=-np.inf)
        except Exception as exc:        # noqa: BLE001 — fan the failure out
            self.stats.errors += 1
            for it in batch:
                if not it.future.done():
                    it.future.set_exception(exc)
            return
        self.stats.batches += 1
        self.stats.queries += n
        self.stats.padded_rows += bucket - n
        self.stats.batch_sizes.append(n)
        t_done = time.monotonic()
        for i, it in enumerate(batch):
            self.stats.latencies_ms.append((t_done - it.t_submit) * 1e3)
            it.future.set_result((scores[i, :it.k], ids[i, :it.k]))

    def _run(self) -> None:
        while True:
            item = self._queue.get()
            if item is None:
                # drain anything that raced in behind the sentinel
                leftovers: list[_Item] = []
                while True:
                    try:
                        it = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    if it is not None:
                        leftovers.append(it)
                for i in range(0, len(leftovers), self.max_batch):
                    try:
                        self._dispatch(leftovers[i:i + self.max_batch])
                    except Exception:  # noqa: BLE001 — drain the rest
                        logger.exception("close-drain dispatch failed")
                return
            try:
                self._dispatch(self._drain(item))
            except Exception:  # noqa: BLE001 — the worker must survive
                logger.exception("frontend dispatch failed")
