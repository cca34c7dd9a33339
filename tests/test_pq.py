"""PQ capacity tier: codebook training, ADC kernel vs oracle, recall,
O(delta) mutation, and ChunkStore dispatch (VERDICT r1 #6).

Reference bar: Qdrant serves any corpus size through one collection
(`src/lattice/embeddings/client.py:93-113`); the PQ view is the tier that
keeps that true past the bf16 HBM budget.
"""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from lattice_tpu.index.chunk_store import ChunkStore
from lattice_tpu.ops import pq as pq_ops
from lattice_tpu.ops import topk as topk_ops


def _clustered(n, d, n_clusters, spread=0.3, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, d)).astype(np.float32)
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    assign = rng.integers(0, n_clusters, size=n)
    x = centers[assign] + spread * rng.normal(size=(n, d)).astype(np.float32)
    return topk_ops.l2_normalize(x)


def test_choose_m():
    assert pq_ops.choose_m(768) == 192          # default dsub=4 (8x tier)
    assert pq_ops.choose_m(768, target_dsub=2) == 384   # dominated by int4
    assert pq_ops.choose_m(64) == 16
    assert pq_ops.choose_m(768, target_dsub=8) == 96
    assert pq_ops.choose_m(7) == 1              # prime dim degrades sanely


def test_train_reduces_distortion():
    """Lloyd iterations must beat the random-init codebooks they start from."""
    rng = np.random.default_rng(1)
    x = topk_ops.l2_normalize(rng.normal(size=(2048, 32)).astype(np.float32))
    m, ksub = 8, 32
    init = jnp.asarray(rng.permutation(2048)[:ksub].astype(np.int32))
    cb0 = pq_ops.train_pq(jnp.asarray(x), init, m, ksub, iters=0)
    cb8 = pq_ops.train_pq(jnp.asarray(x), init, m, ksub, iters=8)

    def distortion(cb):
        codes = np.asarray(pq_ops.pq_encode_block(jnp.asarray(x), cb))
        xhat = pq_ops.pq_decode_oracle(codes, np.asarray(cb))
        return float(np.mean((x - xhat) ** 2))

    assert distortion(cb8) < 0.75 * distortion(cb0)


def test_encode_decode_roundtrip_exact_on_codebook_points():
    """Rows that ARE codewords must encode to themselves losslessly."""
    m, ksub, dsub = 4, 8, 4
    rng = np.random.default_rng(2)
    cb = jnp.asarray(rng.normal(size=(m, ksub, dsub)).astype(np.float32))
    codes_true = rng.integers(0, ksub, size=(64, m))
    x = pq_ops.pq_decode_oracle(codes_true, np.asarray(cb)).astype(np.float32)
    codes = np.asarray(pq_ops.pq_encode_block(jnp.asarray(x), cb))
    xhat = pq_ops.pq_decode_oracle(codes, np.asarray(cb))
    np.testing.assert_allclose(xhat, x, atol=1e-5)
    dev = np.asarray(pq_ops.pq_decode(jnp.asarray(codes), cb))
    np.testing.assert_allclose(dev, xhat, atol=1e-5)


def test_pq_topk_matches_oracle():
    """The scan kernel's ranking must equal exact ADC (float64 decode)."""
    n, d, m, ksub, k = 500, 32, 8, 16, 7   # n not a block multiple
    x = _clustered(n, d, 8, seed=3)
    idx = pq_ops.PQIndex.build(x, np.ones(n, bool), m=m, ksub=ksub)
    q = _clustered(9, d, 8, seed=4)
    valid = np.ones(n, bool)
    valid[::5] = False
    s, i = pq_ops.pq_topk(jnp.asarray(q), idx.codes, idx.codebooks,
                          jnp.asarray(valid), k, block=128)
    _, oi = pq_ops.pq_topk_oracle(q, np.asarray(idx.codes),
                                  np.asarray(idx.codebooks), valid, k)
    # sets must match; ties can reorder (bf16 scoring vs f64 oracle may
    # flip near-equal neighbors, so compare as sets with 1 slack)
    for row in range(len(q)):
        got, want = set(np.asarray(i)[row].tolist()), set(oi[row].tolist())
        assert len(got & want) >= k - 1, (got, want)


def test_pq_topk_k_wider_than_corpus():
    x = _clustered(12, 16, 2, seed=5)
    idx = pq_ops.PQIndex.build(x, np.ones(12, bool), m=4, ksub=8)
    s, i = idx.search(x[:2], k=20)
    assert s.shape == (2, 20)
    assert (i[:, 12:] == -1).all()
    assert (s[:, 12:] < topk_ops.NEG_INF / 2).all()


def test_recall_on_clustered_corpus():
    """The contract shape: recall@10 >= 0.9 vs exact on clustered data
    (the 4M x 768 x m=192 version of this runs on the real chip in the
    round's TPU experiment; this pins the CPU-sized regression)."""
    n, d = 8192, 64
    x = _clustered(n, d, 32, spread=0.25, seed=6)
    idx = pq_ops.PQIndex.build(x, np.ones(n, bool))   # default dsub=4 (8x)
    r_adc = idx.measure_recall(x, np.ones(n, bool), n_sample=64)
    assert r_adc >= 0.6, r_adc           # ADC-only floor at 8x compression
    r = idx.measure_recall(x, np.ones(n, bool), n_sample=64, rescore=True)
    assert r >= 0.95, r                  # the contract number, via rescore
    assert idx.memory_bytes() < x.nbytes / 8  # >= 8x under f32 (4x vs bf16)


def test_filters_fold_into_mask():
    n, d = 1024, 32
    x = _clustered(n, d, 8, seed=7)
    idx = pq_ops.PQIndex.build(x, np.ones(n, bool), m=8)
    mask = np.zeros(n, bool)
    mask[100:200] = True
    _, ids = idx.search(x[:4], k=5, mask=mask)
    assert ((ids >= 100) & (ids < 200)).all()


def test_incremental_insert_remove():
    n, d = 512, 32
    x = _clustered(n, d, 8, seed=8)
    idx = pq_ops.PQIndex.build(x[:256], np.ones(256, bool), m=8)
    # insert rows beyond current capacity
    idx.insert(jnp.asarray(x[256:]), list(range(256, 512)))
    assert idx.codes.shape[0] == 512
    _, ids = idx.search(x[300:301], k=1)
    assert ids[0, 0] == 300  # a fresh row finds itself
    idx.remove([300])
    _, ids = idx.search(x[300:301], k=1)
    assert ids[0, 0] != 300


def test_chunk_store_pq_method():
    n, d = 600, 32
    x = _clustered(n, d, 8, seed=9)
    store = ChunkStore(dim=d, dtype="float32")
    store.add(x, [{"file_path": f"f{i % 3}.py"} for i in range(n)])
    hits = store.search(x[:3], k=5, method="pq")
    assert len(hits) == 3 and hits[0][0][0] == 0
    # payload filter on the pq path
    hits = store.search(x[:1], k=5, method="pq",
                        filters={"file_path": "f1.py"})
    assert hits[0] and all(p["file_path"] == "f1.py" for _, _, p in hits[0])
    # O(delta): mutation keeps the view fresh, no dirty flag
    assert not store._pq_dirty
    store.add(x[:4], [{"file_path": "new.py"}] * 4)
    assert not store._pq_dirty
    rows = store._inverted["file_path"]["new.py"]
    _, sids = store._pq.search(x[:1], k=5)
    assert len(rows) == 4


def test_auto_dispatch_env_gate(monkeypatch):
    n, d = 400, 32
    x = _clustered(n, d, 8, seed=10)
    store = ChunkStore(dim=d, dtype="float32")
    store.add(x, [{"file_path": "a.py"}] * n)
    monkeypatch.setenv("LATTICE_PQ", "1")
    plan = store._plan_search(4, 10, None, "auto")
    # gated on measured recall: clustered corpus clears the bar -> pq
    assert plan == "pq"
    assert store._pq.measured_recall >= 0.9
    monkeypatch.delenv("LATTICE_PQ")
    assert store._plan_search(4, 10, None, "auto") in ("flat", "pallas")


def test_auto_dispatch_rejects_low_recall_pq(monkeypatch):
    """Isotropic high-dim data quantizes badly at tiny m — the dispatcher
    must measure that and refuse to serve through PQ."""
    rng = np.random.default_rng(11)
    x = topk_ops.l2_normalize(rng.normal(size=(512, 64)).astype(np.float32))
    store = ChunkStore(dim=64, dtype="float32")
    store.add(x, [{"file_path": "a.py"}] * 512)
    monkeypatch.setenv("LATTICE_PQ", "1")
    store.build_pq(m=2)   # 2 codes/row: hopeless reconstruction
    assert store._pq.measured_recall < 0.9
    assert store._plan_search(4, 10, None, "auto") != "pq"
