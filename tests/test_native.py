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
