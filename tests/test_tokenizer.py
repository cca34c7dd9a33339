"""Tokenizer tests: approx counter properties, real-vocab BPE path,
storage edge cases."""

import json

import pytest

from lattice_tpu.text.tokenizer import (
    ApproxTokenCounter,
    CodeTokenizer,
    get_token_counter,
)


class TestApproxCounter:
    def test_monotone_in_length(self):
        c = ApproxTokenCounter()
        assert c.count("") == 0
        assert c.count("x") >= 1
        short = c.count("def f(): pass")
        long = c.count("def f(): pass\n" * 50)
        assert long > short * 30

    def test_code_density_reasonable(self):
        c = ApproxTokenCounter()
        code = "def validate_email_format(email):\n    return EMAIL_RE.match(email)\n"
        n = c.count(code)
        # cl100k tokenizes this to ~17 tokens; approx within 2x
        assert 8 <= n <= 40

    def test_long_identifiers_cost_more(self):
        c = ApproxTokenCounter()
        assert c.count("supercalifragilisticexpialidocious") > c.count("a")


class TestCodeTokenizerHashPath:
    def test_ids_in_range_and_stable(self):
        tok = CodeTokenizer(vocab_size=1000)
        a = tok.tokenize_ids("def fooBar(x): return x")
        b = tok.tokenize_ids("def fooBar(x): return x")
        assert a == b
        assert all(tok.N_SPECIAL <= i < 1000 for i in a)

    def test_camel_snake_split(self):
        tok = CodeTokenizer(vocab_size=5000)
        camel = tok.tokenize_ids("fooBarBaz")
        snake = tok.tokenize_ids("foo_bar_baz")
        assert len(camel) == 3
        # snake: pieces foo, _, bar, _, baz
        assert len(snake) >= 3

    def test_truncation(self):
        tok = CodeTokenizer(vocab_size=1000)
        ids, mask = tok.encode("word " * 1000, max_length=64)
        assert len(ids) <= 64
        assert ids[-1] == tok.SEP


class TestCodeTokenizerBPEPath:
    @pytest.fixture()
    def vocab_dir(self, tmp_path):
        vocab = {"<s>": 0, "<pad>": 1, "</s>": 2, "<unk>": 3,
                 "h": 10, "e": 11, "t": 12, "l": 13, "o": 14, "w": 15,
                 "x": 16, "he": 20, "the": 21, "lo": 22, "low": 23,
                 "Ġ": 24, "Ġt": 25}
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        (tmp_path / "merges.txt").write_text(
            "#version: test\nh e\nt he\nl o\nlo w\nĠ t\n")
        return tmp_path

    def test_real_bpe_merges(self, vocab_dir):
        tok = CodeTokenizer(vocab_size=100, vocab_dir=vocab_dir)
        ids = tok.tokenize_ids("the")
        assert ids == [21]  # merged to single "the" token
        ids = tok.tokenize_ids("low")
        assert ids == [23]
        ids = tok.tokenize_ids("x")
        assert ids == [16]

    def test_unknown_piece_maps_to_unk(self, vocab_dir):
        tok = CodeTokenizer(vocab_size=100, vocab_dir=vocab_dir)
        ids = tok.tokenize_ids("z")
        assert ids == [tok.UNK]

    def test_missing_vocab_dir_falls_back(self, tmp_path):
        tok = CodeTokenizer(vocab_size=1000, vocab_dir=tmp_path / "nope")
        ids = tok.tokenize_ids("hello")
        assert ids and all(i >= tok.N_SPECIAL for i in ids)


class TestRobertaParity:
    """Byte-level BPE ids must match HF RobertaTokenizer exactly (ADVICE r1:
    the old path emitted whitespace as separate tokens, so every
    mid-sentence word missed its Ġ prefix and real-weight parity silently
    broke)."""

    @pytest.fixture(scope="class")
    def vocab_dir(self, tmp_path_factory):
        from lattice_tpu.text.tokenizer import _bytes_to_unicode
        tmp_path = tmp_path_factory.mktemp("roberta_vocab")
        vocab: dict[str, int] = {}
        for tok in ("<s>", "<pad>", "</s>", "<unk>", "<mask>"):
            vocab[tok] = len(vocab)
        for ch in sorted(set(_bytes_to_unicode().values())):
            vocab[ch] = len(vocab)
        merges = [("h", "e"), ("t", "he"), ("l", "o"), ("lo", "w"),
                  ("e", "r"), ("low", "er"), ("Ġ", "t"), ("Ġt", "he"),
                  ("Ġ", "l"), ("Ġl", "ow"), ("o", "w"), ("i", "n"),
                  ("Ġlow", "er"), ("d", "e"), ("de", "f"), ("_", "_"),
                  ("'", "t")]
        for a, b in merges:
            vocab.setdefault(a + b, len(vocab))
        (tmp_path / "vocab.json").write_text(json.dumps(vocab))
        (tmp_path / "merges.txt").write_text(
            "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n")
        return tmp_path

    @pytest.fixture(scope="class")
    def hf_tok(self, vocab_dir):
        transformers = pytest.importorskip("transformers")
        return transformers.RobertaTokenizer(
            vocab_file=str(vocab_dir / "vocab.json"),
            merges_file=str(vocab_dir / "merges.txt"))

    @pytest.mark.parametrize("text", [
        "the thermometer",
        " leading space",
        "low lower lowest",
        "hello world\nand a new line",
        "a.b(c) += x[1]",
        "don't",
        "__init__",
        "tabs\tand  doubled spaces",
        "café λ=3",
        "def f(x):\n    return x + 1\n",
    ])
    def test_ids_match_hf(self, vocab_dir, hf_tok, text):
        tok = CodeTokenizer(vocab_dir=vocab_dir)
        ours = tok.tokenize_ids(text)
        theirs = hf_tok(text, add_special_tokens=False)["input_ids"]
        assert ours == theirs

    def test_special_ids_follow_vocab(self, vocab_dir):
        tok = CodeTokenizer(vocab_dir=vocab_dir)
        # RoBERTa convention: <s>=0, <pad>=1, </s>=2, <unk>=3
        assert (tok.CLS, tok.PAD, tok.SEP, tok.UNK) == (0, 1, 2, 3)
        ids, _ = tok.encode("the")
        assert ids[0] == 0 and ids[-1] == 2


class TestGetTokenCounter:
    def test_fallback_without_vocab(self):
        counter = get_token_counter(None)
        assert counter.name == "approx"

    def test_native_with_synthetic_merges(self, tmp_path):
        from lattice_tpu.utils import native
        if native.get_lib() is None:
            pytest.skip("native lib unavailable")
        merges = tmp_path / "merges.txt"
        merges.write_text("h e\nt he\n")
        counter = get_token_counter(merges)
        assert counter.name == "native-bpe"
        assert counter.count("the") == 1


class TestPersistenceEdges:
    def test_corrupt_manifest_raises(self, tmp_path):
        from lattice_tpu.core.errors import StorageError
        from lattice_tpu.storage import persistence
        (tmp_path / "manifest.json").write_text("{broken")
        with pytest.raises(StorageError):
            persistence.read_manifest(tmp_path)

    def test_empty_store_roundtrip(self, tmp_path):
        from lattice_tpu.index.chunk_store import ChunkStore
        from lattice_tpu.storage import persistence
        store = ChunkStore(dim=8)
        persistence.save_chunks(store, tmp_path, "empty")
        loaded = persistence.load_chunks(tmp_path, "empty", 8)
        assert len(loaded) == 0


class TestChunkerCounterWiring:
    def test_chunker_uses_native_when_configured(self, tmp_path):
        from lattice_tpu.config.settings import IndexingSettings
        from lattice_tpu.embeddings.chunker import CodeChunker
        from lattice_tpu.utils import native
        if native.get_lib() is None:
            pytest.skip("native lib unavailable")
        merges = tmp_path / "merges.txt"
        merges.write_text("h e\nt he\n")
        chunker = CodeChunker(IndexingSettings(
            tokenizer_vocab=str(merges)))
        assert chunker.counter.name == "native-bpe"
        assert chunker.counter.count("the") == 1

    def test_chunker_defaults_to_approx(self):
        from lattice_tpu.embeddings.chunker import CodeChunker
        assert CodeChunker().counter.name == "approx"
