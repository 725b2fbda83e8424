"""SQLite FTS5 oracle for BM25 rank-identity fixtures.

Rebuilds the reference's storage semantics in-process: an FTS5 table
queried with ``bm25()`` and ``ORDER BY rank`` exactly as the reference
does (reference: src/Storage/SqliteStorage.php:259-267 for the schema,
:993-1021,1104-1105,1184 for the bm25 query shape; the engine reports
``abs(rank)`` as the positive score).

Both the oracle and the Spark engine consume the SAME analyzed token
stream (SURVEY.md §7.0.1): documents are inserted as space-joined
analyzer output, and the FTS5 tokenizer is pinned to
``unicode61 remove_diacritics 0 tokenchars "'-"`` so the stream
round-trips byte-identically (analyzer tokens are lowercase, contain at
least one alnum char, and never contain whitespace).
"""

from __future__ import annotations

import sqlite3
from typing import Iterable, Sequence

TOKENIZE = "unicode61 remove_diacritics 0 tokenchars '''-'"


class Fts5Oracle:
    def __init__(self, columns: Sequence[str] = ("content",)) -> None:
        """``columns``: FTS column names — multi-column tables mirror the
        reference's multi-field indexes (bm25 weights per column,
        src/Storage/SqliteStorage.php:993-1021)."""
        self.columns = list(columns)
        self.con = sqlite3.connect(":memory:")
        cols = ", ".join(self.columns)
        self.con.execute(
            f'CREATE VIRTUAL TABLE fts USING fts5({cols}, tokenize="{TOKENIZE}")'
        )

    def add_documents(self, rows: Iterable[tuple[int, Sequence]]) -> None:
        """rows: (doc_id, analyzed tokens) for single-column tables, or
        (doc_id, [tokens_col1, tokens_col2, …]) for multi-column ones.
        doc_id becomes the FTS rowid."""
        ncols = len(self.columns)
        cols = ", ".join(self.columns)
        ph = ", ".join("?" * (ncols + 1))

        def to_row(doc_id, tokens):
            if ncols == 1 and (not tokens or isinstance(tokens[0], str)):
                return (doc_id, " ".join(tokens))
            assert len(tokens) == ncols
            return (doc_id, *(" ".join(t) for t in tokens))

        self.con.executemany(
            f"INSERT INTO fts(rowid, {cols}) VALUES ({ph})",
            (to_row(doc_id, tokens) for doc_id, tokens in rows),
        )
        self.con.commit()

    @staticmethod
    def _quote(token: str) -> str:
        return '"' + token.replace('"', '""') + '"'

    @classmethod
    def match_string(cls, kind: str, tokens: Sequence[str], near: int = 10) -> str:
        """Build the FTS5 MATCH string for a fixture query kind.

        Mirrors the reference's query assembly
        (reference: src/Search/SearchEngine.php:549-643).
        """
        q = [cls._quote(t) for t in tokens]
        if kind == "and":
            return " AND ".join(q)
        if kind == "or":
            return " OR ".join(q)
        if kind == "phrase":
            return cls._quote(" ".join(tokens))
        if kind == "near":
            return f"NEAR({' '.join(q)}, {near})"
        if kind == "prefix":
            return q[-1] + "*" if len(q) == 1 else " AND ".join(q[:-1] + [q[-1] + "*"])
        if kind == "single":
            return q[0]
        raise ValueError(f"unknown query kind: {kind}")

    def top_k(self, match: str, k: int = 10,
              weights: Sequence[float] | None = None) -> list[tuple[int, float]]:
        """→ [(doc_id, positive bm25 score)] best-first, ties by doc_id asc.
        ``weights``: per-column bm25 weights (bm25(fts, w1, w2, …))."""
        if weights is not None:
            ws = ", ".join(repr(float(w)) for w in weights)
            bm = f"bm25(fts, {ws})"
        else:
            bm = "bm25(fts)"
        cur = self.con.execute(
            f"SELECT rowid, {bm} FROM fts WHERE fts MATCH ? "
            f"ORDER BY {bm}, rowid LIMIT ?",
            (match, k),
        )
        return [(row[0], abs(row[1])) for row in cur]

    def count(self, match: str) -> int:
        cur = self.con.execute(
            "SELECT count(*) FROM fts WHERE fts MATCH ?", (match,))
        return int(cur.fetchone()[0])

    def vocab(self) -> list[tuple[str, int, int]]:
        """(term, doc_freq, total_occurrences) — mirror of fts5vocab 'row'
        (reference: src/Storage/SqliteStorage.php:2420-2458)."""
        self.con.execute(
            "CREATE VIRTUAL TABLE IF NOT EXISTS fts_v USING fts5vocab(fts, 'row')")
        return [tuple(r) for r in self.con.execute("SELECT term, doc, cnt FROM fts_v")]

    def close(self) -> None:
        self.con.close()
