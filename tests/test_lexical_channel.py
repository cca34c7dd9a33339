"""Lexical identifier channel (round 5): name-token index + candidates.

The golden eval exposed that pure dense retrieval misses queries that
name an entity in plain words ("drain the webhook delivery queue" ->
DeliveryQueue.drain). These tests pin the tokenizers, the IDF-weighted
coverage scoring, index invalidation across mutations, and the searcher
integration."""

from __future__ import annotations

import numpy as np
import pytest

from lattice_tpu.index.chunk_store import (
    ChunkStore,
    name_token_set,
    query_token_set,
)
from lattice_tpu.ops import topk as topk_ops

D = 32


def _vec(seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(D).astype(np.float32)
    return v / np.linalg.norm(v)


@pytest.fixture()
def store():
    st = ChunkStore(dim=D)
    names = [
        "app.integrations.webhooks.DeliveryQueue.drain",
        "app.integrations.webhooks.DeliveryQueue.enqueue",
        "app.integrations.webhooks.WebhookService.fire",
        "app.utils.formatting.humanize_bytes",
        "app.models.task.Task.is_overdue",
        "web.src.store.store.getStore",
    ]
    vecs = np.stack([_vec(i) for i in range(len(names))])
    st.add(vecs, [{"name": n, "file_path": n.split(".")[0] + ".py"}
                  for n in names])
    return st


class TestTokenizers:
    def test_name_tokens_split_camel_snake_and_dots(self):
        # tokens are STEMMED (plural/verb-suffix folding applied
        # identically to names and queries — consistency, not
        # linguistics: "queue"/"queues" both land on "queu")
        assert name_token_set("app.x.DeliveryQueue.drain") == {
            "delivery", "queu", "drain"}
        assert name_token_set("humanize_bytes") == {"human", "byte"}
        assert name_token_set("HTTPServer.serve") == {"http", "server",
                                                      "serv"}
        assert name_token_set("") == frozenset()

    def test_only_last_two_segments_index(self):
        # module noise (app/utils/...) must not pollute the name tokens
        assert "app" not in name_token_set("app.utils.dates.now_ts")
        assert name_token_set("app.utils.dates.now_ts") == {
            "date", "now", "ts"}

    def test_query_tokens_drop_stopwords(self):
        toks = query_token_set("who calls the DeliveryQueue.drain method?")
        assert {"delivery", "queu", "drain", "call"} <= toks
        assert "the" not in toks and "who" not in toks

    def test_stemming_matches_morphological_variants(self):
        # the exact misses the golden eval exposed before stemming
        assert query_token_set("a byte count") & name_token_set(
            "humanize_bytes")
        assert name_token_set("humanize_bytes") <= query_token_set(
            "convert a byte count into a human readable size") | {"byte"}

    def test_short_tokens_dropped(self):
        assert "a" not in name_token_set("a_b.c")


class TestLexicalCandidates:
    def test_plain_word_query_finds_method(self, store):
        hits = store.lexical_candidates(
            query_token_set("drain the webhook delivery queue"))
        assert hits
        top_row, top_score = hits[0]
        assert store.payload(top_row)["name"].endswith(
            "DeliveryQueue.drain")
        # every token of the name is in the query -> full name coverage;
        # the score is name_cov * (0.5 + 0.5 * query_cov), so with the
        # query's extra tokens ("webhook") unmatched it lands below 1.0
        # but must stay above the half-score floor full name coverage
        # guarantees
        assert 0.5 < top_score <= 1.0
        # the sibling method shares delivery+queue but not drain
        rows = {store.payload(r)["name"].rsplit(".", 1)[-1]: s
                for r, s in hits}
        assert rows.get("enqueue", 0) < top_score

    def test_query_coverage_breaks_name_coverage_ties(self):
        """Delivery and DeliveryQueue BOTH have fully-covered names for
        'the delivery queue'; the name explaining more of the query's
        idf mass must win (score = name_cov * (0.5 + 0.5*query_cov))."""
        st = ChunkStore(dim=D)
        names = ["app.integrations.webhooks.Delivery",
                 "app.integrations.webhooks.DeliveryQueue",
                 "app.models.task.Task"]
        st.add(np.stack([_vec(i) for i in range(len(names))]),
               [{"name": n} for n in names])
        hits = dict(st.lexical_candidates(
            query_token_set("how is the delivery queue implemented")))
        by_name = {st.payload(r)["name"].rsplit(".", 1)[-1]: s
                   for r, s in hits.items()}
        assert by_name["DeliveryQueue"] > by_name["Delivery"]

    def test_compound_query_token_splits_to_vocabulary(self):
        """'autocomplete' embeds the vocabulary token 'complete' — the
        suffix probe must surface TextIndex.complete (the golden eval's
        one remaining total miss before this)."""
        st = ChunkStore(dim=D)
        names = ["app.search.text_index.TextIndex.complete",
                 "app.search.text_index.TextIndex.vocabulary_size",
                 "app.models.task.Task"]
        st.add(np.stack([_vec(i) for i in range(len(names))]),
               [{"name": n} for n in names])
        hits = st.lexical_candidates(
            query_token_set("autocomplete a prefix from the vocabulary"))
        assert hits
        top = st.payload(hits[0][0])["name"]
        assert top.endswith(("TextIndex.complete",
                             "TextIndex.vocabulary_size"))
        found = {st.payload(r)["name"].rsplit(".", 1)[-1] for r, _ in hits}
        assert "complete" in found

    def test_min_name_cov_thresholds_undeflated_coverage(self):
        """The deep paths' binary match slots want 'a name the query
        mostly spells out' — that is NAME coverage, which query-coverage
        deflation must not undercut: a one-token name fully spelled out
        in a verbose query scores ~0.55 deflated yet must pass
        min_name_cov=0.6 (r5 review finding)."""
        st = ChunkStore(dim=D)
        # one-token names, all present in the query, so the query's
        # index-known idf mass spreads across six names and each one's
        # query coverage lands ~1/6 -> deflated score ~0.58 < 0.6
        names = ["drain", "backlog", "outbound", "waiting",
                 "maintenance", "cycle", "app.models.task.Task"]
        st.add(np.stack([_vec(i) for i in range(len(names))]),
               [{"name": n} for n in names])
        q = query_token_set(
            "drain the outbound backlog waiting during the"
            " maintenance cycle")
        gated = st.lexical_candidates(q, min_name_cov=0.6)
        assert gated, "full-name-coverage row must survive the gate"
        rows = {st.payload(r)["name"].rsplit(".", 1)[-1] for r, _ in gated}
        assert "drain" in rows
        # deflated score itself sits under 0.6 for this shape — the old
        # `score >= 0.6` consumer check would have dropped the row
        assert any(s < 0.6 for r, s in gated
                   if st.payload(r)["name"] == "drain")

    def test_empty_and_unknown_tokens(self, store):
        assert store.lexical_candidates(set()) == []
        assert store.lexical_candidates({"zzzzz"}) == []

    def test_filters_respected(self, store):
        hits = store.lexical_candidates(
            query_token_set("get the store"),
            filters={"file_path": "app.py"})
        assert all(store.payload(r)["file_path"] == "app.py"
                   for r, _ in hits)

    def test_index_invalidates_on_add(self, store):
        # lexical_candidates expects query_token_set output (stemmed) —
        # callers never hand-build token sets
        toks = query_token_set("frobnicate")
        assert not store.lexical_candidates(toks)
        store.add(_vec(99)[None, :],
                  [{"name": "m.Frobnicator.frobnicate_all",
                    "file_path": "m.py"}])
        hits = store.lexical_candidates(toks)
        assert hits and store.payload(hits[0][0])["name"].endswith(
            "frobnicate_all")

    def test_index_invalidates_on_remove(self, store):
        hits = store.lexical_candidates({"drain"})
        assert hits
        store.remove([hits[0][0]])
        assert not store.lexical_candidates({"drain"})

    def test_mutations_maintain_index_incrementally(self, store):
        """Once built, add/remove update the token index in place — a
        wholesale rebuild is O(corpus) under _serve_lock and stalled
        serving threads per watcher mutation (review r5)."""
        toks = query_token_set("drain the delivery queue")
        store.lexical_candidates(toks)        # build
        built = store._lex_tokens
        assert built is not None
        store.add(_vec(50)[None, :],
                  [{"name": "m.Pump.drain_fast", "file_path": "m.py"}])
        assert store._lex_tokens is built     # same object, updated
        rows = {store.payload(r)["name"] for r, _ in
                store.lexical_candidates(query_token_set("drain"))}
        assert "m.Pump.drain_fast" in rows
        victim = next(r for r, _ in store.lexical_candidates(
            query_token_set("drain"))
            if store.payload(r)["name"].endswith("drain_fast"))
        store.remove([victim])
        assert store._lex_tokens is built
        rows = {store.payload(r)["name"] for r, _ in
                store.lexical_candidates(query_token_set("drain"))}
        assert "m.Pump.drain_fast" not in rows

    def test_non_string_name_payload_does_not_crash(self, store):
        """One non-string 'name' must not crash the rebuild (which would
        black out every vector search through _vector_phase's catch)."""
        store.add(_vec(51)[None, :], [{"name": 42, "file_path": "n.py"}])
        store._lex_tokens = None              # force a full rebuild
        assert isinstance(
            store.lexical_candidates(query_token_set("drain queue")),
            list)

    def test_scores_sorted_and_bounded(self, store):
        hits = store.lexical_candidates(
            query_token_set("webhook delivery queue service fire drain"))
        scores = [s for _, s in hits]
        assert scores == sorted(scores, reverse=True)
        assert all(0.0 < s <= 1.0 for s in scores)


class TestSearcherIntegration:
    def test_search_lexical_materializes_payloads(self, store):
        from lattice_tpu.embeddings.embedder import Embedder
        from lattice_tpu.embeddings.indexer import (VectorIndexer,
                                                    VectorSearcher)
        from lattice_tpu.providers.hash_provider import HashEmbedder

        idx = VectorIndexer(Embedder(HashEmbedder(dimensions=D)))
        idx.code = store  # route the searcher at the prebuilt store
        vs = VectorSearcher(idx)
        out = vs.search_lexical("drain the delivery queue")
        assert out and out[0].name.endswith("DeliveryQueue.drain")
        assert 0.0 < out[0].score <= 1.0

    def test_engine_search_surfaces_lexical_hit(self, store):
        """End-to-end: a plain-word query whose embedding misses still
        surfaces the named entity through the ranker."""
        from lattice_tpu.embeddings.embedder import Embedder
        from lattice_tpu.embeddings.indexer import VectorIndexer
        from lattice_tpu.index.graph_store import GraphStore
        from lattice_tpu.providers.hash_provider import HashEmbedder
        from lattice_tpu.query.engine import QueryEngine

        idx = VectorIndexer(Embedder(HashEmbedder(dimensions=D)))
        idx.code = store
        eng = QueryEngine(GraphStore(), idx)
        res = eng.search_sync("drain the webhook delivery queue")
        names = [r.qualified_name for r in res.results[:5]]
        assert any(n.endswith("DeliveryQueue.drain") for n in names), names
