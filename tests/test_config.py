"""Settings tests.

Parity model: reference `tests/test_config.py` (346 LoC: pydantic
validation incl. bounds, env composition, flat properties).
"""

import pytest
from pydantic import ValidationError

from lattice_tpu.config.settings import (
    AISettings,
    FileSettings,
    IndexingSettings,
    Settings,
    get_settings,
    reset_settings,
)


class TestValidators:
    def test_dims_bounds(self):
        assert AISettings(embedding_dimensions=4096).embedding_dimensions == 4096
        with pytest.raises(ValidationError):
            AISettings(embedding_dimensions=0)
        with pytest.raises(ValidationError):
            AISettings(embedding_dimensions=5000)

    def test_overlap_must_be_less_than_max(self):
        IndexingSettings(chunk_max_tokens=500, chunk_overlap_tokens=100)
        with pytest.raises(ValidationError):
            IndexingSettings(chunk_max_tokens=100, chunk_overlap_tokens=100)
        with pytest.raises(ValidationError):
            IndexingSettings(chunk_max_tokens=100, chunk_overlap_tokens=200)

    def test_extensions_dot_prefixed(self):
        fs = FileSettings(extensions=["py", ".ts"])
        assert fs.extensions == [".py", ".ts"]


class TestEnvComposition:
    def test_env_file_parsing(self, tmp_path):
        env = tmp_path / ".env"
        env.write_text(
            "# comment\n"
            "EMBEDDING_PROVIDER=hash\n"
            "EMBEDDING_DIMENSIONS=256\n"
            "CHUNK_MAX_TOKENS=800\n"
            "CHUNK_OVERLAP_TOKENS=100\n"
            'LATTICE_INDEX_DTYPE="float32"\n'
            "LATTICE_USE_PALLAS=0\n"
        )
        s = Settings.from_env(env)
        assert s.ai.embedding_provider == "hash"
        assert s.ai.embedding_dimensions == 256
        assert s.indexing.chunk_max_tokens == 800
        assert s.device.index_dtype == "float32"
        assert s.device.use_pallas is False

    def test_process_env_overrides_file(self, tmp_path, monkeypatch):
        env = tmp_path / ".env"
        env.write_text("EMBEDDING_DIMENSIONS=256\n")
        monkeypatch.setenv("EMBEDDING_DIMENSIONS", "512")
        s = Settings.from_env(env)
        assert s.ai.embedding_dimensions == 512

    def test_missing_env_file_uses_defaults(self, tmp_path):
        s = Settings.from_env(tmp_path / "nope.env")
        assert s.ai.embedding_provider == "hash"
        assert s.query.search_limit == 15

    def test_flat_backcompat_properties(self):
        s = Settings()
        assert s.embedding_dimensions == s.ai.embedding_dimensions
        assert s.chunk_max_tokens == s.indexing.chunk_max_tokens
        assert s.chunk_overlap_tokens == s.indexing.chunk_overlap_tokens
        assert s.search_limit == s.query.search_limit
        assert s.max_concurrent == s.indexing.max_concurrent

    def test_singleton_cached(self):
        reset_settings()
        a = get_settings()
        b = get_settings()
        assert a is b
        reset_settings()


class TestDefaultsMatchReference:
    """The reference's quantitative defaults (BASELINE.md table)."""

    def test_reference_defaults(self):
        s = Settings()
        assert s.indexing.chunk_max_tokens == 1000
        assert s.indexing.chunk_overlap_tokens == 200
        assert s.indexing.max_concurrent == 5
        assert s.indexing.batch_size == 100
        assert s.query.search_limit == 15
        assert s.query.max_vector_results == 20
        assert s.query.max_centrality_lookups == 10
        assert s.query.max_hops == 5
        assert s.query.max_results_per_query == 50
        assert s.query.max_path_length == 10
        assert s.query.max_results_per_file == 5
        assert s.ai.embedding_dimensions == 768
