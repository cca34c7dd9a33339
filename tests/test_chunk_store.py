"""ChunkStore: insert/search/filter/delete/grow/incremental semantics."""

import numpy as np
import pytest

from lattice_tpu.core.errors import VectorStoreError
from lattice_tpu.index.chunk_store import ChunkStore
from lattice_tpu.ops import topk as topk_ops


def _vecs(n, d, seed=0):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)).astype(np.float32)


@pytest.fixture
def store():
    s = ChunkStore(dim=32, dtype="float32", initial_capacity=16)
    vecs = _vecs(10, 32)
    payloads = [
        {"file_path": f"src/f{i % 3}.py", "entity_type": "function",
         "language": "python", "content_hash": f"h{i % 3}",
         "project_name": "proj", "name": f"fn{i}"}
        for i in range(10)
    ]
    s.add(vecs, payloads)
    return s, vecs


class TestChunkStore:
    def test_search_matches_oracle(self, store):
        s, vecs = store
        q = _vecs(2, 32, seed=9)
        results = s.search(q, k=5)
        emb = topk_ops.l2_normalize(vecs)
        qn = topk_ops.l2_normalize(q)
        o_scores, o_idx = topk_ops.topk_oracle(
            qn, emb, np.ones(10, dtype=bool), 5)
        for qi in range(2):
            got_rows = [r for r, _, _ in results[qi]]
            assert set(got_rows) == set(o_idx[qi].tolist())
            got_scores = [sc for _, sc, _ in results[qi]]
            np.testing.assert_allclose(got_scores, o_scores[qi], atol=1e-5)

    def test_payload_filter(self, store):
        s, _ = store
        q = _vecs(1, 32, seed=9)
        results = s.search(q, k=10, filters={"file_path": "src/f1.py"})
        assert results[0], "filter should match rows"
        for _, _, payload in results[0]:
            assert payload["file_path"] == "src/f1.py"

    def test_filter_list_is_or(self, store):
        s, _ = store
        q = _vecs(1, 32, seed=9)
        results = s.search(q, k=10,
                           filters={"file_path": ["src/f1.py", "src/f2.py"]})
        paths = {p["file_path"] for _, _, p in results[0]}
        assert paths <= {"src/f1.py", "src/f2.py"}
        assert len(paths) == 2

    def test_delete_file(self, store):
        s, _ = store
        n_before = len(s)
        deleted = s.delete_file("src/f0.py")
        assert deleted == 4  # rows 0,3,6,9
        assert len(s) == n_before - 4
        q = _vecs(1, 32, seed=9)
        results = s.search(q, k=10)
        assert all(p["file_path"] != "src/f0.py" for _, _, p in results[0])

    def test_freelist_reuse(self, store):
        s, _ = store
        s.delete_file("src/f0.py")
        cap_before = s.capacity
        rows = s.add(_vecs(4, 32, seed=5),
                     [{"file_path": "src/new.py", "content_hash": "x"}] * 4)
        assert s.capacity == cap_before  # reused freelist rows
        assert set(rows) == {0, 3, 6, 9}

    def test_growth(self):
        s = ChunkStore(dim=8, dtype="float32", initial_capacity=8)
        s.add(_vecs(20, 8), [{"file_path": "a", "content_hash": "h"}] * 20)
        assert s.capacity >= 20
        assert len(s) == 20
        results = s.search(_vecs(1, 8, seed=3), k=5)
        assert len(results[0]) == 5

    def test_file_needs_update(self, store):
        s, _ = store
        assert not s.file_needs_update("src/f1.py", "h1")
        assert s.file_needs_update("src/f1.py", "different")
        assert s.file_needs_update("src/never_seen.py", "h")

    def test_scroll(self, store):
        s, _ = store
        rows = s.scroll({"file_path": "src/f2.py"})
        assert len(rows) == 3
        assert all(p["file_path"] == "src/f2.py" for _, p in rows)

    def test_dim_mismatch_raises(self, store):
        s, _ = store
        with pytest.raises(VectorStoreError):
            s.add(_vecs(1, 16), [{}])

    def test_empty_store_search(self):
        s = ChunkStore(dim=8)
        assert s.search(_vecs(1, 8), k=5) == [[]]

    def test_unknown_filter_field_raises(self, store):
        s, _ = store
        with pytest.raises(VectorStoreError):
            s.search(_vecs(1, 32), k=3, filters={"nope": "x"})

    def test_bf16_store(self):
        s = ChunkStore(dim=16, dtype="bfloat16", initial_capacity=8)
        vecs = _vecs(6, 16)
        s.add(vecs, [{"file_path": "a", "content_hash": "h"}] * 6)
        results = s.search(vecs[:1], k=1)
        row, score, _ = results[0][0]
        assert row == 0
        assert score == pytest.approx(1.0, abs=2e-2)


class TestChunkStoreIVF:
    def test_ivf_path_matches_flat_at_full_probe(self):
        s = ChunkStore(dim=32, dtype="float32", initial_capacity=64)
        vecs = _vecs(40, 32, seed=11)
        s.add(vecs, [{"file_path": f"f{i}.py", "content_hash": "h"}
                     for i in range(40)])
        ivf = s.build_ivf(n_clusters=6)
        q = _vecs(2, 32, seed=12)
        flat = s.search(q, k=5)
        ann = s.search_ivf(q, k=5, nprobe=6)
        for fr, ar in zip(flat, ann):
            assert {r for r, _, _ in fr} == {r for r, _, _ in ar}

    def test_ivf_rebuilds_after_mutation(self):
        s = ChunkStore(dim=16, dtype="float32", initial_capacity=32)
        vecs = _vecs(20, 16, seed=13)
        s.add(vecs, [{"file_path": "a.py", "content_hash": "h"}] * 20)
        s.search_ivf(_vecs(1, 16), k=3)
        assert not s._ivf_dirty
        s.add(_vecs(1, 16, seed=14), [{"file_path": "b.py", "content_hash": "h"}])
        assert s._ivf_dirty
        hits = s.search_ivf(_vecs(1, 16), k=3)  # triggers rebuild
        assert hits[0]


class TestQuantizedStorePath:
    def test_quantized_matches_flat(self):
        s = ChunkStore(dim=48, dtype="float32", initial_capacity=128)
        vecs = _vecs(60, 48, seed=21)
        s.add(vecs, [{"file_path": f"f{i}.py", "content_hash": "h"}
                     for i in range(60)])
        q = _vecs(3, 48, seed=22)
        flat = s.search(q, k=8)
        quant = s.search_quantized(q, k=8)
        for fr, qr in zip(flat, quant):
            assert {r for r, _, _ in fr} == {r for r, _, _ in qr}

    def test_quant_rebuilds_after_mutation(self):
        s = ChunkStore(dim=16, dtype="float32", initial_capacity=32)
        s.add(_vecs(10, 16), [{"file_path": "a.py", "content_hash": "h"}] * 10)
        s.search_quantized(_vecs(1, 16), k=3)
        assert not s._quant_dirty
        s.remove([0])
        assert s._quant_dirty
        hits = s.search_quantized(_vecs(1, 16), k=3)
        assert all(r != 0 for r, _, _ in hits[0])


class TestShardedView:
    def test_to_sharded_matches_flat(self):
        from lattice_tpu.parallel.mesh import make_mesh
        s = ChunkStore(dim=32, dtype="float32", initial_capacity=64)
        vecs = _vecs(50, 32, seed=31)
        s.add(vecs, [{"file_path": f"f{i}.py", "content_hash": "h"}
                     for i in range(50)])
        sharded = s.to_sharded(mesh=make_mesh(8))
        q = _vecs(2, 32, seed=32)
        flat = s.search(q, k=6)
        scores, idx = sharded.search(q, k=6)
        for qi in range(2):
            assert {r for r, _, _ in flat[qi]} == set(idx[qi].tolist())


class TestShardedDispatch:
    """method='sharded' routing inside ChunkStore.search (8-dev CPU mesh)."""

    def _store(self, n=50):
        s = ChunkStore(dim=32, dtype="float32", initial_capacity=64)
        vecs = _vecs(n, 32, seed=41)
        s.add(vecs, [{"file_path": f"f{i % 4}.py", "content_hash": "h",
                      "name": f"fn{i}"} for i in range(n)])
        return s, vecs

    def test_sharded_matches_flat(self):
        s, _ = self._store()
        q = _vecs(3, 32, seed=42)
        flat = s.search(q, k=6, method="flat")
        shd = s.search(q, k=6, method="sharded")
        for f_row, s_row in zip(flat, shd):
            assert {r for r, _, _ in f_row} == {r for r, _, _ in s_row}
            for (_, fs, _), (_, ss, _) in zip(
                    sorted(f_row, key=lambda h: -h[1]),
                    sorted(s_row, key=lambda h: -h[1])):
                assert abs(fs - ss) < 1e-4

    def test_mutation_invalidates_sharded_view(self):
        s, _ = self._store()
        q = _vecs(1, 32, seed=43)
        s.search(q, k=4, method="sharded")          # builds the view
        new = topk_ops.l2_normalize(_vecs(1, 32, seed=44))
        rows = s.add(new, [{"file_path": "new.py", "content_hash": "h2",
                            "name": "brand_new"}])
        hits = s.search(new, k=1, method="sharded")  # must see the new row
        assert hits[0][0][0] == rows[0]

    def test_filters_ride_sharded_path(self):
        # payload filters travel as a row-sharded mask ANDed per shard
        s, _ = self._store()
        q = _vecs(1, 32, seed=45)
        hits = s.search(q, k=10, filters={"file_path": "f1.py"},
                        method="sharded")
        assert s._sharded is not None  # the sharded view served it
        assert hits[0]
        assert all(p["file_path"] == "f1.py" for _, _, p in hits[0])
        flat = s.search(q, k=10, filters={"file_path": "f1.py"},
                        method="flat")
        assert [r for r, _, _ in hits[0]] == [r for r, _, _ in flat[0]]

    def test_to_sharded_quantized(self):
        s, vecs = self._store()
        view = s.to_sharded_quantized()
        q = topk_ops.l2_normalize(_vecs(2, 32, seed=47))
        scores, idx = view.search(q, k=5)
        flat = s.search(q, k=5, method="flat")
        overlaps = [
            len({r for r, _, _ in flat[qi]} & set(idx[qi].tolist())) / 5
            for qi in range(2)]
        assert np.mean(overlaps) >= 0.8  # int8 scores, near-ties may flip
        assert view.memory_bytes() < 0.6 * (view.values.shape[0] * 32 * 2)

    def test_env_knob(self, monkeypatch):
        s, _ = self._store()
        q = _vecs(1, 32, seed=46)
        monkeypatch.setenv("LATTICE_SHARDED", "1")
        shd = s.search(q, k=5)                      # auto -> sharded
        assert s._sharded is not None
        flat = s.search(q, k=5, method="flat")
        assert [r for r, _, _ in shd[0]] == [r for r, _, _ in flat[0]]


class TestChunkerInvariants:
    """Entity-aligned chunking split semantics (reference chunker
    `:135-217`): full coverage, bounded token budget, overlap tails."""

    def _chunker(self, max_tokens=60, overlap=15):
        from lattice_tpu.config.settings import IndexingSettings
        from lattice_tpu.embeddings.chunker import CodeChunker
        return CodeChunker(IndexingSettings(
            chunk_max_tokens=max_tokens, chunk_overlap_tokens=overlap))

    def _parsed(self, n_lines=80):
        from lattice_tpu.core.types import Language
        from lattice_tpu.parsing.parser import CodeParser
        body = "\n".join(f"    value_{i} = compute_{i}(arg_{i})"
                         for i in range(n_lines))
        src = f"def big_function(arg):\n{body}\n"
        return CodeParser().parse_content(src, Language.PYTHON, "m.py")

    def test_split_covers_every_line(self):
        chunker = self._chunker()
        parsed = self._parsed()
        chunks = chunker.chunk_file(parsed)
        assert len(chunks) > 1
        covered = set()
        for c in chunks:
            covered.update(range(c.start_line, c.end_line + 1))
        entity = parsed.functions[0]
        assert covered >= set(range(entity.start_line, entity.end_line + 1))

    def test_parts_named_and_budgeted(self):
        chunker = self._chunker()
        chunks = chunker.chunk_file(self._parsed())
        for i, c in enumerate(chunks):
            assert c.part == i
            assert "_part" in c.name
            # each split chunk respects the token budget (+1 line slack)
            assert chunker.counter.count(c.content) <= 60 + 20

    def test_consecutive_parts_overlap(self):
        # overlap budget must exceed one line's token cost (~16 here) for
        # a tail to be carried — the budget is token-based, not line-based
        chunker = self._chunker(max_tokens=80, overlap=40)
        chunks = chunker.chunk_file(self._parsed())
        assert len(chunks) > 1
        for a, b in zip(chunks, chunks[1:]):
            assert b.start_line <= a.end_line, "no overlap tail"

    def test_small_entity_single_chunk(self):
        chunker = self._chunker(max_tokens=500)
        from lattice_tpu.core.types import Language
        from lattice_tpu.parsing.parser import CodeParser
        parsed = CodeParser().parse_content(
            "def tiny():\n    return 1\n", Language.PYTHON, "m.py")
        chunks = chunker.chunk_file(parsed)
        assert len(chunks) == 1
        assert chunks[0].part == 0
        assert chunks[0].graph_node_id == "m.tiny"
