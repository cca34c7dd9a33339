"""Coverage-gap chunking: source no entity claims must stay searchable.

VERDICT r1 #7: an extractor edge case must degrade to coarser chunking,
never to silent entity loss. The gap pass also covers module-level code
in entity-bearing files, which the reference's whole-file fallback
(`embeddings/chunker.py:71-82`) never chunks at all.
"""

from pathlib import Path

import pytest

from lattice_tpu.core.types import Language
from lattice_tpu.embeddings.chunker import CodeChunker, GAP_MIN_LINES
from lattice_tpu.parsing.models import FileInfo
from lattice_tpu.parsing.parser import CodeParser


@pytest.fixture()
def chunk(tmp_path):
    parser = CodeParser()
    chunker = CodeChunker()

    def run(source: str, name: str = "mod.py",
            language: Language = Language.PYTHON):
        p = tmp_path / name
        p.write_text(source)
        info = FileInfo(path=p, relative_path=name, language=language,
                        size_bytes=len(source))
        parsed = parser.parse_content(source, language, name)
        parsed.file_info = info
        return chunker.chunk_file(parsed)

    return run


def test_module_level_block_becomes_gap_chunk(chunk):
    body = "\n".join(f"CONST_{i} = compute({i})" for i in range(GAP_MIN_LINES + 2))
    src = f"def covered():\n    return 1\n\n{body}\n"
    chunks = chunk(src)
    names = [c.name for c in chunks]
    assert any(n == "mod.covered" for n in names)
    gaps = [c for c in chunks if "segment_L" in c.name]
    assert len(gaps) == 1
    assert gaps[0].chunk_type == "file"
    assert "CONST_0" in gaps[0].content and "CONST_9" in gaps[0].content


def test_fully_covered_file_emits_no_gap_chunks(chunk):
    src = (
        "import os\n"
        "import sys\n"
        "\n"
        "def a():\n    return os.sep\n"
        "\n"
        "def b():\n    return sys.path\n"
    )
    chunks = chunk(src)
    assert not [c for c in chunks if "segment_L" in c.name]


def test_comment_only_gaps_ignored(chunk):
    header = "\n".join(f"# license line {i}" for i in range(GAP_MIN_LINES + 5))
    src = f"{header}\n\ndef f():\n    return 1\n"
    chunks = chunk(src)
    assert not [c for c in chunks if "segment_L" in c.name]


def test_lexer_miss_degrades_to_gap_chunk(chunk):
    # a JS construct list the extractor records nothing for: the body must
    # surface as a gap chunk instead of vanishing from the index
    body = "\n".join(f"registry.set('k{i}', () => handler({i}));"
                     for i in range(GAP_MIN_LINES + 2))
    src = f"function known() {{ return 1; }}\n{body}\n"
    chunks = chunk(src, name="mod.js", language=Language.JAVASCRIPT)
    assert any(c.name == "mod.known" for c in chunks)
    gaps = [c for c in chunks if "segment_L" in c.name]
    assert gaps and "registry.set('k0'" in gaps[0].content


def test_gap_line_numbers_are_real_file_lines(chunk):
    body = "\n".join(f"x{i} = {i}" for i in range(GAP_MIN_LINES + 2))
    src = f"def covered():\n    return 1\n\n{body}\n"
    chunks = chunk(src)
    gap = next(c for c in chunks if "segment_L" in c.name)
    lines = src.splitlines()
    assert lines[gap.start_line - 1] == gap.content.splitlines()[0]
