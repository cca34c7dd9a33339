"""In-process full-text search over tasks and projects.

A small inverted index with tf scoring and prefix completion —
the fixture's analog of a search subsystem, exercising dict-of-set
indexes and tokenization helpers.
"""

import re

from app.db.memory import Database
from app.models.task import Task

TOKEN_RE = re.compile(r"[a-z0-9]+")
STOPWORDS = frozenset(
    "a an and are as at be by for from has in is it of on or the to with"
    .split())


def tokenize(text: str) -> list:
    return [
        tok for tok in TOKEN_RE.findall((text or "").lower())
        if tok not in STOPWORDS and len(tok) > 1
    ]


class Posting:
    __slots__ = ("doc_id", "count")

    def __init__(self, doc_id: str, count: int = 1):
        self.doc_id = doc_id
        self.count = count


class TextIndex:
    def __init__(self):
        self._postings: dict = {}
        self._doc_lengths: dict = {}
        self._titles: dict = {}

    def index_document(self, doc_id: str, title: str, body: str = "") -> int:
        self.remove_document(doc_id)
        tokens = tokenize(title) * 2 + tokenize(body)  # title boost
        self._doc_lengths[doc_id] = max(len(tokens), 1)
        self._titles[doc_id] = title
        counts: dict = {}
        for token in tokens:
            counts[token] = counts.get(token, 0) + 1
        for token, count in counts.items():
            self._postings.setdefault(token, {})[doc_id] = Posting(
                doc_id, count)
        return len(counts)

    def remove_document(self, doc_id: str) -> None:
        if doc_id not in self._doc_lengths:
            return
        for postings in self._postings.values():
            postings.pop(doc_id, None)
        del self._doc_lengths[doc_id]
        self._titles.pop(doc_id, None)

    def search(self, query: str, limit: int = 10) -> list:
        """tf-scored AND-ish search: docs matching any term, ranked by
        total term frequency normalized by doc length."""
        terms = tokenize(query)
        if not terms:
            return []
        scores: dict = {}
        for term in terms:
            for doc_id, posting in self._postings.get(term, {}).items():
                scores[doc_id] = scores.get(doc_id, 0.0) + (
                    posting.count / self._doc_lengths[doc_id])
        ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        return [
            (doc_id, round(score, 4), self._titles.get(doc_id, ""))
            for doc_id, score in ranked[:limit]
        ]

    def complete(self, prefix: str, limit: int = 8) -> list:
        prefix = prefix.lower()
        hits = [t for t in self._postings if t.startswith(prefix)]
        hits.sort(key=lambda t: (-len(self._postings[t]), t))
        return hits[:limit]

    def vocabulary_size(self) -> int:
        return len(self._postings)


def build_task_index(db: Database) -> TextIndex:
    """Index every task title + comment bodies."""
    index = TextIndex()
    for task in db.tasks.all():
        body_parts = [task.description]
        body_parts.extend(c.body for c in task.comments)
        index.index_document(task.id, task.name, " ".join(body_parts))
    return index


def search_tasks(db: Database, query: str, limit: int = 10) -> list:
    """One-shot search returning Task objects."""
    index = build_task_index(db)
    out = []
    for doc_id, score, _title in index.search(query, limit):
        task = db.tasks.find(doc_id)
        if isinstance(task, Task):
            out.append((task, score))
    return out
