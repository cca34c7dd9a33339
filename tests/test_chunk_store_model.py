"""Model-based differential test: a random op sequence on ChunkStore
must match a pure-NumPy model at every step.

Example tests pin specific behaviors; this drives the freelist /
compaction / payload-index / validity interplay through hundreds of
random add/remove/update/delete_file/compact/search transitions and
asserts the store's exact search equals brute-force cosine over the
model's live rows — the state-machine strategy of the reference's
Qdrant integration tests (SURVEY §4), executable offline.
"""

import numpy as np
import pytest

from lattice_tpu.index.chunk_store import ChunkStore

DIM = 24


def _norm(v):
    return v / np.maximum(np.linalg.norm(v, axis=-1, keepdims=True), 1e-12)


class Model:
    """Pure-Python mirror: row -> (vector, payload)."""

    def __init__(self):
        self.rows: dict[int, tuple[np.ndarray, dict]] = {}

    def search(self, q, k, filters=None):
        if not self.rows:
            return []
        ids = sorted(self.rows)
        mat = np.stack([self.rows[i][0] for i in ids])
        scores = _norm(np.atleast_2d(q))[0] @ mat.T
        if filters:
            keep = np.array([
                all(self.rows[i][1].get(f) == v for f, v in filters.items())
                for i in ids])
            scores = np.where(keep, scores, -np.inf)
        order = np.argsort(-scores, kind="stable")
        out = [(ids[j], scores[j]) for j in order[:k]
               if scores[j] > -np.inf]
        return out


class TestChunkStoreModelBased:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_random_op_sequence_matches_model(self, seed):
        rng = np.random.default_rng(seed)
        store = ChunkStore(dim=DIM, dtype="float32", initial_capacity=16)
        model = Model()
        files = [f"f{j}.py" for j in range(4)]
        langs = ["python", "javascript"]

        def check():
            q = rng.normal(size=DIM).astype(np.float32)
            filters = None
            if rng.random() < 0.4 and model.rows:
                filters = {"file_path": str(rng.choice(files))}
            # both exact serving paths must match the model (refined =
            # widened binned scan + exact rescore; exact at f32 storage)
            method = "flat" if rng.random() < 0.5 else "refined"
            got = store.search(q, k=5, filters=filters,
                               method=method)[0]
            want = model.search(q, k=5, filters=filters)
            assert [r for r, _, _ in got] == [r for r, _ in want], (
                f"step mismatch: got {[r for r, _, _ in got]} "
                f"want {[r for r, _ in want]}")
            for (_, gs, _), (_, ws) in zip(got, want):
                assert abs(gs - ws) < 1e-4

        for step in range(60):
            op = rng.random()
            if op < 0.45 or not model.rows:
                n = int(rng.integers(1, 4))
                vecs = rng.normal(size=(n, DIM)).astype(np.float32)
                pls = [{"file_path": str(rng.choice(files)),
                        "language": str(rng.choice(langs)),
                        "content_hash": f"h{step}-{i}",
                        "content": "x" * int(rng.integers(10, 200))}
                       for i in range(n)]
                ids = store.add(vecs, pls)
                for i, r in enumerate(ids):
                    model.rows[r] = (_norm(vecs[i:i + 1])[0], pls[i])
            elif op < 0.65:
                victims = list(rng.choice(sorted(model.rows),
                                          size=min(2, len(model.rows)),
                                          replace=False))
                store.remove(victims)
                for v in victims:
                    del model.rows[v]
            elif op < 0.8:
                f = str(rng.choice(files))
                store.delete_file(f)
                model.rows = {r: (v, p) for r, (v, p) in model.rows.items()
                              if p["file_path"] != f}
            elif op < 0.9 and model.rows:
                # update: re-embed an existing row via remove+add
                victim = int(rng.choice(sorted(model.rows)))
                old_payload = model.rows[victim][1]
                store.remove([victim])
                del model.rows[victim]
                vec = rng.normal(size=(1, DIM)).astype(np.float32)
                (rid,) = store.add(vec, [dict(old_payload,
                                              content_hash=f"u{step}")])
                model.rows[rid] = (
                    _norm(vec)[0],
                    dict(old_payload, content_hash=f"u{step}"))
            else:
                remap = store.compact()
                model.rows = {remap.get(r, r): (v, p)
                              for r, (v, p) in model.rows.items()}
            check()
        assert len(store) == len(model.rows)
