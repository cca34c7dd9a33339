"""Serving over the SHARDED store path: BatchingFrontend + HTTP on an
8-device CPU mesh.

Round-5 lever 1 names "the serving frontend pointed at a sharded store"
as the third multi-chip scale-out step and claims the frontend is
store-agnostic — coalesced batches shard for free because the frontend
only calls ``store.search_device(..., method=...)`` and ``search_device``
routes ``method="sharded"`` through ``_sharded_search_rescored`` whenever
the mesh has more than one device. These tests pin that claim end to end
BEFORE hardware shows up: concurrent submits coalesce into one sharded
execution whose winners equal the flat path (the in-store sharded route
always rescores against the resident rows), filters ride the row-sharded
mask, live mutation invalidates the view mid-serve, and the HTTP layer
mints a ``method="sharded"`` router config from a request body.

Reference semantic: the reference has no sharded serving at all (one
Qdrant HNSW probe per request, `src/lattice/query/engine.py:139-146`);
this is TPU-native surface the scale-out story requires.
"""

from __future__ import annotations

import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from lattice_tpu.index.chunk_store import ChunkStore
from lattice_tpu.ops import topk as topk_ops
from lattice_tpu.serving import BatchingFrontend

N, D = 96, 32

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2,
    reason="sharded serving needs a multi-device mesh")


def _vecs(n, seed):
    rng = np.random.default_rng(seed)
    return topk_ops.l2_normalize(
        rng.standard_normal((n, D)).astype(np.float32))


@pytest.fixture()
def store():
    st = ChunkStore(dim=D, dtype="float32", initial_capacity=128)
    st.add(_vecs(N, seed=7),
           [{"file_path": f"f{i % 4}.py", "content_hash": "h",
             "name": f"fn{i}"} for i in range(N)])
    return st


class TestFrontendSharded:
    def test_coalesced_batch_serves_sharded_and_matches_flat(self, store):
        qs = _vecs(8, seed=8)
        with BatchingFrontend(store, max_batch=16, max_wait_ms=250,
                              method="sharded") as fe:
            futs = [fe.submit(q, k=6) for q in qs]
            results = [f.result(timeout=60) for f in futs]
        # one coalesced dispatch, served by the sharded view
        assert fe.stats.batches == 1 and fe.stats.queries == 8
        assert (store._sharded is not None
                or store._shardedq is not None)
        flat = store.search(qs, k=6, method="flat")
        for qi, (scores, ids) in enumerate(results):
            assert set(ids.tolist()) == {r for r, _, _ in flat[qi]}
            for (_, fs, _), ss in zip(
                    sorted(flat[qi], key=lambda h: -h[1]),
                    np.sort(scores)[::-1]):
                assert abs(fs - float(ss)) < 1e-3

    def test_filters_ride_sharded_frontend(self, store):
        q = _vecs(1, seed=9)[0]
        with BatchingFrontend(store, max_wait_ms=50,
                              filters={"file_path": "f1.py"},
                              method="sharded") as fe:
            scores, ids = fe.submit(q, k=8).result(timeout=60)
        live = [int(i) for i in ids.tolist() if i >= 0]
        assert live
        for row in live:
            assert store.payload(row)["file_path"] == "f1.py"
        flat = store.search(q[None, :], k=8,
                            filters={"file_path": "f1.py"}, method="flat")
        assert [r for r, _, _ in flat[0]] == live

    def test_mutation_mid_serve_reaches_next_batch(self, store):
        """add() between batches invalidates/updates the sharded view;
        the next coalesced dispatch must see the new row."""
        with BatchingFrontend(store, max_wait_ms=20,
                              method="sharded") as fe:
            fe.submit(_vecs(1, seed=10)[0], k=4).result(timeout=60)
            new = _vecs(1, seed=11)
            rows = store.add(new, [{"file_path": "new.py",
                                    "content_hash": "h2",
                                    "name": "brand_new"}])
            _, ids = fe.submit(new[0], k=1).result(timeout=60)
            assert int(ids[0]) == rows[0]

    def test_threaded_submitters_sharded(self, store):
        """16 client threads against the sharded route: every future
        resolves, winners all match flat — the concurrency seam
        (serve-lock around the lazy view build) under real threads."""
        qs = _vecs(16, seed=12)
        flat = store.search(qs, k=5, method="flat")
        errors: list[Exception] = []
        results: dict[int, np.ndarray] = {}
        with BatchingFrontend(store, max_batch=16, max_wait_ms=150,
                              method="sharded") as fe:
            def client(i):
                try:
                    _, ids = fe.submit(qs[i], k=5).result(timeout=60)
                    results[i] = ids
                except Exception as exc:  # noqa: BLE001
                    errors.append(exc)
            threads = [threading.Thread(target=client, args=(i,))
                       for i in range(16)]
            for t in threads:
                t.start()
            for t in threads:
                t.join(timeout=120)
        assert not errors
        assert len(results) == 16
        for i, ids in results.items():
            assert set(ids.tolist()) == {r for r, _, _ in flat[i]}


class TestHTTPSharded:
    def test_request_body_method_sharded(self, store):
        """POST /v1/search {"method": "sharded"} mints a router config
        for the sharded route and returns flat-identical winners."""
        from lattice_tpu.serving.http import ServingHTTPServer

        def fake_embed(text: str) -> np.ndarray:
            return _vecs(1, seed=abs(hash(text)) % 2**31)[0]

        with ServingHTTPServer(store, fake_embed, max_wait_ms=20) as srv:
            host, port = srv.address
            q = _vecs(1, seed=13)[0]
            body = {"vector": [float(x) for x in q], "k": 6,
                    "method": "sharded"}
            req = urllib.request.Request(
                f"http://{host}:{port}/v1/search_vector",
                data=json.dumps(body).encode(),
                headers={"Content-Type": "application/json"},
                method="POST")
            with urllib.request.urlopen(req, timeout=120) as r:
                assert r.status == 200
                hits = json.loads(r.read())["hits"]
            with urllib.request.urlopen(
                    f"http://{host}:{port}/v1/stats", timeout=60) as r:
                stats = json.loads(r.read())
        flat = store.search(q[None, :], k=6, method="flat")
        assert [h["row"] for h in hits] == [r for r, _, _ in flat[0]]
        cfg_keys = [k for k in stats["configs"] if "sharded" in k]
        assert cfg_keys, f"no sharded router config in {stats['configs']}"
        assert stats["configs"][cfg_keys[0]]["queries"] >= 1
