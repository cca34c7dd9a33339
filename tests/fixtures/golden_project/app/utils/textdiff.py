"""Minimal line-diff utilities used by the activity feed.

A dependency-free LCS diff with hunk grouping — loop-heavy algorithmic
code exercising the extractor on a different shape than the service
layer.
"""


def lcs_table(a: list, b: list) -> list:
    """Classic dynamic-programming longest-common-subsequence table."""
    rows = len(a) + 1
    cols = len(b) + 1
    table = [[0] * cols for _ in range(rows)]
    for i in range(1, rows):
        ai = a[i - 1]
        row = table[i]
        prev = table[i - 1]
        for j in range(1, cols):
            if ai == b[j - 1]:
                row[j] = prev[j - 1] + 1
            else:
                row[j] = row[j - 1] if row[j - 1] >= prev[j] else prev[j]
    return table


def diff_lines(old: list, new: list) -> list:
    """[(op, line)] with op in {'=', '-', '+'} in order."""
    table = lcs_table(old, new)
    out = []
    i, j = len(old), len(new)
    while i > 0 and j > 0:
        if old[i - 1] == new[j - 1]:
            out.append(("=", old[i - 1]))
            i -= 1
            j -= 1
        elif table[i - 1][j] >= table[i][j - 1]:
            out.append(("-", old[i - 1]))
            i -= 1
        else:
            out.append(("+", new[j - 1]))
            j -= 1
    while i > 0:
        out.append(("-", old[i - 1]))
        i -= 1
    while j > 0:
        out.append(("+", new[j - 1]))
        j -= 1
    out.reverse()
    return out


def changed_ratio(old_text: str, new_text: str) -> float:
    """Fraction of diff entries that are insertions/deletions."""
    ops = diff_lines(old_text.splitlines(), new_text.splitlines())
    if not ops:
        return 0.0
    changed = sum(1 for op, _ in ops if op != "=")
    return changed / len(ops)


class Hunk:
    def __init__(self, start_old: int, start_new: int):
        self.start_old = start_old
        self.start_new = start_new
        self.lines: list = []

    def add(self, op: str, line: str) -> None:
        self.lines.append((op, line))

    @property
    def additions(self) -> int:
        return sum(1 for op, _ in self.lines if op == "+")

    @property
    def deletions(self) -> int:
        return sum(1 for op, _ in self.lines if op == "-")

    def header(self) -> str:
        return (f"@@ -{self.start_old},{self.deletions} "
                f"+{self.start_new},{self.additions} @@")


def group_hunks(ops: list, context: int = 2) -> list:
    """Split a flat diff into hunks, keeping `context` equal lines."""
    hunks: list = []
    current: Hunk | None = None
    equal_run = 0
    old_no = new_no = 1
    for op, line in ops:
        if op == "=":
            equal_run += 1
            if current is not None:
                if equal_run <= context:
                    current.add(op, line)
                else:
                    hunks.append(current)
                    current = None
            old_no += 1
            new_no += 1
            continue
        if current is None:
            current = Hunk(old_no, new_no)
        equal_run = 0
        current.add(op, line)
        if op == "-":
            old_no += 1
        else:
            new_no += 1
    if current is not None:
        hunks.append(current)
    return hunks


def unified(old_text: str, new_text: str, context: int = 2) -> str:
    """Readable unified-ish diff for the activity feed."""
    ops = diff_lines(old_text.splitlines(), new_text.splitlines())
    parts = []
    for hunk in group_hunks(ops, context):
        parts.append(hunk.header())
        for op, line in hunk.lines:
            prefix = {"=": " ", "-": "-", "+": "+"}[op]
            parts.append(prefix + line)
    return "\n".join(parts)
