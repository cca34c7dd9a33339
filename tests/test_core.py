"""Tests for core types, errors, caches, and the function registry.

Parity model: reference `tests/test_config.py` + registry behavior exercised
in `tests/test_call_processor.py:26`.
"""

from pathlib import Path

import pytest

from lattice_tpu.core.cache import ASTCache, BoundedCache, FunctionRegistry
from lattice_tpu.core.errors import IndexingError, LatticeError, ParsingError
from lattice_tpu.core.types import EdgeType, EntityType, Language


class TestLanguage:
    def test_extension_mapping(self):
        assert Language.from_extension(".py") is Language.PYTHON
        assert Language.from_extension(".tsx") is Language.TSX
        assert Language.from_extension(".mjs") is Language.JAVASCRIPT
        assert Language.from_extension(".weird") is Language.UNKNOWN

    def test_codes_roundtrip(self):
        for lang in Language:
            assert Language.from_code(lang.code) is lang
        for et in EntityType:
            assert EntityType.from_code(et.code) is et

    def test_edge_codes_distinct(self):
        codes = {e.code for e in EdgeType}
        assert len(codes) == len(EdgeType)


class TestErrors:
    def test_cause_chaining(self):
        inner = ValueError("boom")
        err = ParsingError("parse failed", file_path="a.py", line=3, cause=inner)
        assert err.file_path == "a.py"
        assert "boom" in str(err)
        assert isinstance(err, LatticeError)

    def test_indexing_error_stage(self):
        err = IndexingError("died", stage="embedding")
        assert err.stage == "embedding"


class TestBoundedCache:
    def test_lru_eviction(self):
        cache = BoundedCache(max_entries=3)
        for i in range(4):
            cache.put(i, str(i))
        assert 0 not in cache
        assert len(cache) == 3
        # touch 1, insert 4 -> 2 evicted
        assert cache.get(1) == "1"
        cache.put(4, "4")
        assert 2 not in cache
        assert 1 in cache

    def test_stats(self):
        cache = BoundedCache(max_entries=4)
        cache.put("a", 1)
        cache.get("a")
        cache.get("missing")
        stats = cache.stats
        assert stats["hits"] == 1
        assert stats["misses"] == 1
        assert 0 < stats["hit_rate"] < 1

    def test_memory_cap(self):
        cache = BoundedCache(max_entries=1000, max_memory_mb=0.0001)
        for i in range(50):
            cache.put(i, "x" * 100)
        assert len(cache) < 50

    def test_ast_cache_is_bounded(self):
        cache = ASTCache(max_entries=2)
        cache.put(Path("a.py"), ("tree_a", Language.PYTHON))
        cache.put(Path("b.py"), ("tree_b", Language.PYTHON))
        cache.put(Path("c.py"), ("tree_c", Language.PYTHON))
        assert Path("a.py") not in cache


class TestFunctionRegistry:
    @pytest.fixture
    def registry(self) -> FunctionRegistry:
        reg = FunctionRegistry()
        reg.register("app.services.user.UserService", "class")
        reg.register("app.services.user.UserService.get_user", "method")
        reg.register("app.services.auth.login", "function")
        reg.register("app.utils.get_user", "function")
        return reg

    def test_exact_lookup(self, registry):
        assert registry.get_type("app.services.auth.login") == "function"
        assert registry.get_type("nope") is None
        assert "app.utils.get_user" in registry

    def test_simple_name_index(self, registry):
        hits = registry.find_by_simple_name("get_user")
        assert hits == ["app.services.user.UserService.get_user", "app.utils.get_user"]

    def test_prefix_trie(self, registry):
        hits = registry.find_with_prefix("app.services")
        assert len(hits) == 3
        assert registry.find_with_prefix("app.nope") == []

    def test_remove_by_prefix(self, registry):
        removed = registry.remove_by_prefix("app.services.user")
        assert removed == 2
        assert registry.find_by_simple_name("get_user") == ["app.utils.get_user"]
        assert registry.find_with_prefix("app.services") == ["app.services.auth.login"]

    def test_dense_ids_stable(self, registry):
        i1 = registry.id_of("app.services.auth.login")
        registry.register("app.services.auth.login", "function")
        assert registry.id_of("app.services.auth.login") == i1
        assert registry.name_of(i1) == "app.services.auth.login"

    def test_remove_single(self, registry):
        assert registry.remove("app.utils.get_user")
        assert not registry.remove("app.utils.get_user")
        assert registry.find_by_simple_name("get_user") == [
            "app.services.user.UserService.get_user"
        ]
