"""Native C++ kernel tests: SHA-256 vs hashlib, BPE counter vs reference
merges semantics. Skipped cleanly when the toolchain is unavailable."""

import hashlib

import pytest

from lattice_tpu.utils import native


@pytest.fixture(scope="module")
def lib():
    lib = native.get_lib()
    if lib is None:
        pytest.skip("native library unavailable (no g++?)")
    return lib


class TestSha256:
    def test_matches_hashlib_bytes(self, lib):
        for payload in (b"", b"abc", b"x" * 63, b"y" * 64, b"z" * 65,
                        b"lattice" * 10007):
            assert native.sha256_bytes(payload) == \
                hashlib.sha256(payload).hexdigest()

    def test_matches_hashlib_file(self, lib, tmp_path):
        path = tmp_path / "blob.bin"
        data = bytes(range(256)) * 5000  # 1.28 MB, crosses buffer boundary
        path.write_bytes(data)
        assert native.sha256_file(str(path)) == \
            hashlib.sha256(data).hexdigest()

    def test_missing_file(self, lib):
        assert native.sha256_file("/nonexistent/nope") is None


class TestBPECounter:
    @pytest.fixture()
    def counter(self, lib, tmp_path):
        # Tiny synthetic merges vocabulary: builds "the", "he", "lo", "low".
        merges = tmp_path / "merges.txt"
        merges.write_text(
            "#version: test\n"
            "h e\n"
            "t he\n"
            "l o\n"
            "lo w\n"
            "Ġ t\n"
        )
        return native.BPECounter(str(merges))

    def test_merged_words_count_fewer(self, counter):
        # "the" merges h+e then t+he -> 1 token; "xyz" has no merges -> 3.
        assert counter.count("the") == 1
        assert counter.count("xyz") == 3
        assert counter.count("low") == 1     # l+o then lo+w
        assert counter.count("lox") == 2     # "lo" + "x"

    def test_counts_additive_over_words(self, counter):
        assert counter.count("the low") >= counter.count("the")
        assert counter.count("") == 0

    def test_bad_merges_path(self, lib):
        with pytest.raises(RuntimeError):
            native.BPECounter("/nonexistent/merges.txt")

    def test_python_approx_same_ballpark(self, counter):
        """Approx counter and BPE counter agree within 2x on code."""
        from lattice_tpu.text.tokenizer import ApproxTokenCounter
        code = "def validate_email_format(email):\n    return EMAIL_RE.match(email)\n"
        approx = ApproxTokenCounter().count(code)
        exact = counter.count(code)
        assert exact > 0 and approx > 0
        assert 0.3 < approx / exact < 3.0


class TestNoNativeFallback:
    """The entire pipeline must work with lattice_native.so ABSENT
    (hosts without a toolchain): SHA-256 falls back to hashlib, BPE to
    the approximate counter, and every BFS to the vectorized NumPy
    walk. Force get_lib() -> None and run index -> search -> deep."""

    def test_full_pipeline_without_native_lib(self, tmp_path, monkeypatch):
        import asyncio
        import shutil
        from pathlib import Path

        from lattice_tpu.config.settings import Settings
        from lattice_tpu.embeddings.embedder import Embedder
        from lattice_tpu.pipeline.orchestrator import PipelineOrchestrator
        from lattice_tpu.providers.hash_provider import HashEmbedder
        from lattice_tpu.query.engine import QueryEngine
        from lattice_tpu.utils import native as native_mod

        monkeypatch.setattr(native_mod, "get_lib", lambda: None)
        assert native_mod.bfs_khop(
            None, None, None, None, 1, 0, None, out_cap=1) is None

        fixture = (Path(__file__).parent / "fixtures" / "sample_project")
        proj = tmp_path / "proj"
        shutil.copytree(fixture, proj)
        settings = Settings()
        settings.metadata.enabled = False
        embedder = Embedder(HashEmbedder(dimensions=128))
        orch = PipelineOrchestrator(proj, embedder,
                                    project_name="nonative",
                                    settings=settings)
        ctx = asyncio.run(orch.run())
        assert len(ctx.indexer.code) > 10
        engine = QueryEngine(ctx.graph_builder.store, ctx.indexer)
        res = engine.search_sync("who calls validate_email_format?")
        names = [r.qualified_name for r in res.results]
        assert "app.services.user_service.UserService.create_user" in names
        deep = engine.deep_search("who calls validate_email_format?")
        assert deep.results
        batch = engine.deep_search_batch(
            ["who calls validate_email_format?", "what is AdminUser"])
        assert all(b.results for b in batch)
