"""Query compiler + BM25 scoring engine over the partitioned posting index.

Semantics are pinned to SQLite FTS5 (the reference's storage engine,
reference: src/Storage/SqliteStorage.php:991-1134) and were calibrated
float-exact against sqlite3:

  * score(doc) = Σ over query phrases: idf·tf·(k1+1)/(tf+k1·(1−b+b·dl/avgdl))
    with k1=1.2, b=0.75, idf = ln((N−df+0.5)/(df+0.5)) clamped to 1e-6
    when ≤ 0, accumulated in query-phrase order (we add in fixed phrase
    order via a full-outer join chain, matching FTS5's accumulation).
  * a multi-token phrase is ONE scoring phrase: df = docs containing the
    phrase, tf = phrase occurrences.
  * NEAR(p1 … pk, n) constrains matching, but its member phrases score
    with their standalone df and full tf.
  * prefix ``tok*`` is one scoring phrase: tf = Σ tf over matching
    terms, df = docs containing any matching term.
  * ties broken by ascending doc_id (FTS5 returns rowid order).

Execution is Spark-first: postings are read with bucket partition
pruning + term predicate pushdown (terms are sorted within bucket files
so parquet row-group stats prune prefix range scans), decoded in one
Arrow kernel, then composed with joins/aggregations that Catalyst
plans. The final top-k is TakeOrderedAndProject (orderBy+limit).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

from .analyzer import analyze
from .postings import BM25_B, BM25_K1, decode_posting_block
from .build import load_docs, load_manifest

import math
import os
import re


# ---------------------------------------------------------------------------
# Query AST
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class Phrase:
    """1..m analyzed terms; m==1 is a plain term match."""
    terms: tuple[str, ...]


@dataclass(frozen=True)
class PrefixNode:
    prefix: str


@dataclass(frozen=True)
class Near:
    phrases: tuple[Phrase, ...]
    distance: int = 10


@dataclass(frozen=True)
class And:
    children: tuple


@dataclass(frozen=True)
class Or:
    children: tuple


@dataclass(frozen=True)
class Not:
    include: object
    exclude: object


_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<lparen>\()|(?P<rparen>\))|(?P<comma>,)|
        (?P<quoted>"(?:[^"]|"")*")|
        (?P<near>NEAR\b)|(?P<and>AND\b)|(?P<or>OR\b)|(?P<not>NOT\b)|
        (?P<word>[^\s()",]+)
    )""",
    re.VERBOSE,
)


class QueryParser:
    """FTS5-style query grammar: NOT > AND(implicit too) > OR, parens,
    quoted phrases, NEAR(a b, n), trailing-* prefix.

    Mirrors the query shapes the reference emits
    (reference: src/Search/SearchEngine.php:549-643)."""

    def __init__(self, text: str):
        self.tokens: list[tuple[str, str]] = []
        pos = 0
        while pos < len(text):
            m = _TOKEN_RE.match(text, pos)
            if not m or m.end() == pos:
                break
            pos = m.end()
            for name, val in m.groupdict().items():
                if val is not None:
                    self.tokens.append((name, val))
                    break
        self.i = 0

    def _peek(self):
        return self.tokens[self.i] if self.i < len(self.tokens) else (None, None)

    def _next(self):
        tok = self._peek()
        self.i += 1
        return tok

    def parse(self):
        node = self._parse_or()
        return node

    def _parse_or(self):
        left = self._parse_and()
        parts = [left] if left is not None else []
        while self._peek()[0] == "or":
            self._next()
            right = self._parse_and()
            if right is not None:
                parts.append(right)
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else Or(tuple(parts))

    def _parse_and(self):
        parts = []
        while True:
            kind, _ = self._peek()
            if kind in (None, "or", "rparen"):
                break
            if kind == "and":
                self._next()
                continue
            if kind == "not":
                self._next()
                right = self._parse_atom()
                if parts and right is not None:
                    left = parts[0] if len(parts) == 1 else And(tuple(parts))
                    parts = [Not(left, right)]
                continue
            atom = self._parse_atom()
            if atom is not None:
                parts.append(atom)
        if not parts:
            return None
        return parts[0] if len(parts) == 1 else And(tuple(parts))

    def _parse_atom(self):
        kind, val = self._next()
        if kind == "lparen":
            node = self._parse_or()
            if self._peek()[0] == "rparen":
                self._next()
            return node
        if kind == "quoted":
            words = val[1:-1].replace('""', '"').split()
            terms = _analyze_words(words)
            return Phrase(tuple(terms)) if terms else None
        if kind == "near":
            return self._parse_near()
        if kind == "word":
            if val.endswith("*") and len(val) > 1:
                stem_prefix = _analyze_prefix(val[:-1])
                return PrefixNode(stem_prefix) if stem_prefix else None
            terms = _analyze_words([val])
            if not terms:
                return None
            return Phrase((terms[0],)) if len(terms) == 1 else Phrase(tuple(terms))
        return None

    def _parse_near(self):
        phrases: list[Phrase] = []
        distance = 10
        if self._peek()[0] == "lparen":
            self._next()
            pending_words: list[str] = []

            def flush_words():
                for w in pending_words:
                    terms = _analyze_words([w])
                    if terms:
                        phrases.append(Phrase(tuple(terms)))
                pending_words.clear()

            while True:
                kind, val = self._peek()
                if kind is None:
                    break
                if kind == "rparen":
                    self._next()
                    break
                if kind == "comma":
                    self._next()
                    kind2, val2 = self._peek()
                    if kind2 == "word" and val2.isdigit():
                        self._next()
                        distance = int(val2)
                    continue
                if kind == "quoted":
                    self._next()
                    flush_words()
                    terms = _analyze_words(val[1:-1].replace('""', '"').split())
                    if terms:
                        phrases.append(Phrase(tuple(terms)))
                    continue
                if kind == "word":
                    self._next()
                    pending_words.append(val)
                    continue
                self._next()
            flush_words()
        if not phrases:
            return None
        if len(phrases) == 1:
            return phrases[0]
        return Near(tuple(phrases), distance)


def _analyze_words(words: Sequence[str]) -> list[str]:
    """Query-side analysis — same pipeline as documents (SURVEY §7.0.1)."""
    return analyze(" ".join(words))


def _analyze_prefix(raw: str) -> Optional[str]:
    """Prefix tokens are normalized/lowercased but NOT stemmed (a stem of a
    prefix is meaningless); stop-word prefixes are kept."""
    from .analyzer import normalize, tokenize
    toks = tokenize(normalize(raw))
    return toks[-1] if toks else None


def parse_query(text: str):
    return QueryParser(text).parse()


# ---------------------------------------------------------------------------
# Plan helpers
# ---------------------------------------------------------------------------

def _collect_phrases(node, out: list) -> None:
    """All scoring phrases in query order (FTS5 accumulates in this order)."""
    if node is None:
        return
    if isinstance(node, (Phrase, PrefixNode)):
        out.append(node)
    elif isinstance(node, Near):
        out.extend(node.phrases)
    elif isinstance(node, (And, Or)):
        for c in node.children:
            _collect_phrases(c, out)
    elif isinstance(node, Not):
        _collect_phrases(node.include, out)
        _collect_phrases(node.exclude, out)


def _collect_terms(node, terms: set, prefixes: set) -> None:
    if node is None:
        return
    if isinstance(node, Phrase):
        terms.update(node.terms)
    elif isinstance(node, PrefixNode):
        prefixes.add(node.prefix)
    elif isinstance(node, Near):
        for p in node.phrases:
            terms.update(p.terms)
    elif isinstance(node, (And, Or)):
        for c in node.children:
            _collect_terms(c, terms, prefixes)
    elif isinstance(node, Not):
        _collect_terms(node.include, terms, prefixes)
        _collect_terms(node.exclude, terms, prefixes)


_DECODED_SCHEMA = StructType([
    StructField("term", StringType(), False),
    StructField("doc_id", LongType(), False),
    StructField("tf", IntegerType(), False),
    StructField("doc_len", IntegerType(), False),
    StructField("positions", ArrayType(IntegerType()), True),
])


def _decode_factory(with_positions: bool):
    def decode(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            terms, dids, tfs, dls, poss = [], [], [], [], []
            for term, data in zip(pdf["term"], pdf["data"]):
                if with_positions:
                    ids, tf, dl, pos = decode_posting_block(data, with_positions=True)
                    poss.extend([p.astype(np.int32) for p in pos])
                else:
                    ids, tf, dl = decode_posting_block(data)
                n = ids.size
                terms.append(np.repeat(term, n))
                dids.append(ids)
                tfs.append(tf)
                dls.append(dl)
            out = pd.DataFrame({
                "term": np.concatenate(terms),
                "doc_id": np.concatenate(dids),
                "tf": np.concatenate(tfs).astype(np.int32),
                "doc_len": np.concatenate(dls).astype(np.int32),
            })
            out["positions"] = poss if with_positions else None
            yield out
    return decode


def _phrase_tf(positions_per_term: list[np.ndarray]) -> int:
    """Number of start positions p with term_i at p+i for all i."""
    starts = positions_per_term[0]
    for i, pos in enumerate(positions_per_term[1:], start=1):
        if starts.size == 0:
            return 0
        starts = starts[np.isin(starts + i, pos)]
    return int(starts.size)


def _phrase_starts(positions_per_term: list[np.ndarray]) -> np.ndarray:
    starts = positions_per_term[0]
    for i, pos in enumerate(positions_per_term[1:], start=1):
        if starts.size == 0:
            break
        starts = starts[np.isin(starts + i, pos)]
    return starts


def _near_trim(instances: list[np.ndarray], plens: list[int], distance: int):
    """FTS5 NEAR: an assignment (one instance per phrase) is valid iff
    max(start) − min(end) − 1 ≤ distance. Returns (matched, trimmed tf per
    phrase) where an instance counts iff it belongs to ≥1 valid assignment
    (FTS5 trims near-group position lists before bm25 sees them —
    calibrated float-exact against sqlite3 FTS5)."""
    k = len(instances)
    if any(inst.size == 0 for inst in instances):
        return False, None
    if k == 1:
        return True, [int(instances[0].size)]
    ends = [inst + (plens[j] - 1) for j, inst in enumerate(instances)]
    ms = np.unique(np.concatenate(ends))
    ok = np.empty((k, ms.size), dtype=bool)
    for j in range(k):
        lo = np.searchsorted(instances[j], ms - (plens[j] - 1), side="left")
        hi = np.searchsorted(instances[j], ms + distance + 1, side="right")
        ok[j] = hi > lo
    if not ok.all(axis=0).any():
        return False, None
    counts = []
    for i in range(k):
        others = np.ones(ms.size, dtype=bool)
        for j in range(k):
            if j != i:
                others &= ok[j]
        valid_ms = ms[others]
        xs = instances[i]
        lo = np.searchsorted(valid_ms, xs - distance - 1, side="left")
        hi = np.searchsorted(valid_ms, xs + (plens[i] - 1), side="right")
        counts.append(int((hi > lo).sum()))
    return True, counts


# ---------------------------------------------------------------------------
# Search index
# ---------------------------------------------------------------------------

class SearchIndex:
    """Query-side facade over an index directory built by build_index."""

    def __init__(self, spark: SparkSession, index_dir: str):
        self.spark = spark
        self.index_dir = index_dir
        self.manifest = load_manifest(index_dir)
        cfg = self.manifest.get("config", {})
        self.num_buckets = int(cfg.get("num_buckets", 32))
        gs = spark.read.parquet(os.path.join(index_dir, "global_stats")).collect()[0]
        self.n_docs = int(gs["n_docs"])
        self.avgdl = float(gs["avgdl"] or 1.0)
        self._postings = spark.read.parquet(os.path.join(index_dir, "postings"))
        self._term_stats = spark.read.parquet(os.path.join(index_dir, "term_stats"))
        self._docs = load_docs(spark, index_dir, self.manifest)
        self._vocab_cache: dict | None | bool = None

    # -- postings access ----------------------------------------------------

    def _read_postings(self, terms: Sequence[str], prefixes: Sequence[str],
                       with_positions: bool) -> Optional[DataFrame]:
        parts = []
        if terms:
            # bucket partition pruning: resolve the exact bucket list
            # driver-side (same xxhash64 as the build) so only those
            # partition directories are scanned at all.
            buckets = self._buckets_for_terms(terms)
            p = (self._postings
                 .where(F.col("bucket").isin(buckets))
                 .where(F.col("term").isin(list(set(terms)))))
            parts.append(p)
        for pre in prefixes:
            hi = pre[:-1] + chr(ord(pre[-1]) + 1) if pre else pre
            parts.append(self._postings.where(
                (F.col("term") >= pre) & (F.col("term") < hi)))
        if not parts:
            return None
        df = parts[0]
        for other in parts[1:]:
            df = df.unionByName(other)
        decoded = df.select("term", "data").mapInPandas(
            _decode_factory(with_positions), schema=_DECODED_SCHEMA)
        return decoded

    def _buckets_for_terms(self, terms: Sequence[str]) -> list[int]:
        """pmod(xxhash64(term), num_buckets) — computed driver-side with a
        bit-exact pure-Python XXH64 (xxhash64.py, verified against
        Catalyst), so query planning needs NO Spark job."""
        from .xxhash64 import bucket_of
        return sorted({bucket_of(t, self.num_buckets) for t in set(terms)})

    _VOCAB_CACHE_MAX = 2_000_000

    def term_stats_for(self, terms: Sequence[str]) -> dict[str, tuple[int, int]]:
        if not terms:
            return {}
        if self._vocab_cache is None:
            vocab_n = (self.manifest.get("stages", {})
                       .get("term_stats", {}).get("counters", {})
                       .get("vocab"))
            if vocab_n is not None and vocab_n <= self._VOCAB_CACHE_MAX:
                # small vocabulary → one-time full load, then zero jobs/query
                rows = self._term_stats.select("term", "df", "cf").collect()
                self._vocab_cache = {r["term"]: (int(r["df"]), int(r["cf"]))
                                     for r in rows}
            else:
                self._vocab_cache = False  # too big — per-query lookups
        if self._vocab_cache:
            return {t: self._vocab_cache[t] for t in set(terms)
                    if t in self._vocab_cache}
        rows = (self._term_stats
                .where(F.col("term").isin(list(set(terms))))
                .select("term", "df", "cf").collect())
        return {r["term"]: (int(r["df"]), int(r["cf"])) for r in rows}

    def idf(self, df: int) -> float:
        v = math.log((self.n_docs - df + 0.5) / (df + 0.5))
        return v if v > 0.0 else 1e-6

    # -- phrase match tables -------------------------------------------------

    def _phrase_match(self, phrase: Phrase, decoded: DataFrame) -> DataFrame:
        """→ (doc_id, tf, doc_len, positions=phrase instance starts)."""
        terms = phrase.terms
        if len(terms) == 1:
            return (decoded.where(F.col("term") == terms[0])
                    .select("doc_id", "tf", "doc_len", "positions"))
        sub = decoded.where(F.col("term").isin(list(set(terms))))
        grouped = (sub.groupBy("doc_id")
                   .agg(F.first("doc_len").alias("doc_len"),
                        F.map_from_entries(
                            F.collect_list(F.struct("term", "positions"))
                        ).alias("posmap"),
                        F.count_distinct("term").alias("nterms"))
                   .where(F.col("nterms") >= len(set(terms))))

        terms_list = list(terms)
        out_schema = StructType([
            StructField("doc_id", LongType(), False),
            StructField("tf", IntegerType(), False),
            StructField("doc_len", IntegerType(), False),
            StructField("positions", ArrayType(IntegerType()), True),
        ])

        def compute(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                rows = []
                for doc_id, dl, posmap in zip(pdf["doc_id"], pdf["doc_len"], pdf["posmap"]):
                    plists = [np.asarray(posmap[t], dtype=np.int64) for t in terms_list]
                    starts = _phrase_starts(plists)
                    if starts.size:
                        rows.append((doc_id, int(starts.size), dl,
                                     starts.astype(np.int32)))
                if rows:
                    yield pd.DataFrame(rows, columns=["doc_id", "tf", "doc_len", "positions"])
        return grouped.mapInPandas(compute, schema=out_schema)

    def _prefix_match(self, node: PrefixNode, decoded: DataFrame) -> DataFrame:
        hi = node.prefix[:-1] + chr(ord(node.prefix[-1]) + 1)
        return (decoded
                .where((F.col("term") >= node.prefix) & (F.col("term") < hi))
                .groupBy("doc_id")
                .agg(F.sum("tf").cast("int").alias("tf"),
                     F.first("doc_len").alias("doc_len"))
                .withColumn("positions", F.lit(None).cast(ArrayType(IntegerType()))))

    def _near_table(self, node: Near, phrase_tables: dict) -> DataFrame:
        """→ (doc_id, doc_len, tf_0 … tf_{k-1}) for docs satisfying the NEAR
        constraint, with NEAR-trimmed per-member term frequencies."""
        k = len(node.phrases)
        joined = None
        for i, p in enumerate(node.phrases):
            d = phrase_tables[p].select(
                "doc_id",
                *([F.col("doc_len")] if i == 0 else []),
                F.col("positions").alias(f"starts_{i}"))
            joined = d if joined is None else joined.join(d, "doc_id")
        plens = [len(p.terms) for p in node.phrases]
        distance = node.distance

        fields = [StructField("doc_id", LongType(), False),
                  StructField("doc_len", IntegerType(), False)]
        fields += [StructField(f"tf_{i}", IntegerType(), False) for i in range(k)]
        out_schema = StructType(fields)

        def check(batches):
            for pdf in batches:
                if pdf.empty:
                    continue
                rows = []
                for row in pdf.itertuples(index=False):
                    inst = [np.asarray(getattr(row, f"starts_{i}"), dtype=np.int64)
                            for i in range(k)]
                    matched, counts = _near_trim(inst, plens, distance)
                    if matched:
                        rows.append((row.doc_id, row.doc_len, *counts))
                if rows:
                    yield pd.DataFrame(rows, columns=[f.name for f in out_schema.fields])
        return joined.mapInPandas(check, schema=out_schema)

    # -- full query execution --------------------------------------------------

    def _plan(self, node):
        """Build match tables for a query tree.

        Returns (slots, phrase_tables, phrase_df, near_tables, decoded) where
        slots is the in-order list of scoring slots: ("phrase", node) or
        ("near", near_node, member_idx). FTS5 scores every expression slot
        independently (a phrase appearing standalone AND inside a NEAR
        contributes twice, the NEAR copy with trimmed tf)."""
        slots: list = []
        _collect_slots(node, slots)

        terms: set[str] = set()
        prefixes: set[str] = set()
        _collect_terms(node, terms, prefixes)

        need_positions = any(
            (isinstance(p, Phrase) and len(p.terms) > 1)
            for p in _unique_phraselike(node)) or _has_near(node)
        decoded = self._read_postings(sorted(terms), sorted(prefixes),
                                      with_positions=need_positions)
        if decoded is None:
            return slots, {}, {}, {}, None
        decoded = decoded.persist()

        term_stats = self.term_stats_for(sorted(terms))

        phrase_tables: dict = {}
        phrase_df: dict = {}
        for p in _unique_phraselike(node):
            if isinstance(p, PrefixNode):
                mt = self._prefix_match(p, decoded).persist()
                phrase_tables[p] = mt
                phrase_df[p] = mt.count()
            elif len(p.terms) == 1:
                phrase_tables[p] = self._phrase_match(p, decoded)
                phrase_df[p] = term_stats.get(p.terms[0], (0, 0))[0]
            elif any(t not in term_stats for t in p.terms):
                # a constituent term is out-of-vocabulary → the phrase can
                # never match; skip the df-count job entirely
                phrase_tables[p] = self._phrase_match(p, decoded)
                phrase_df[p] = 0
            else:
                mt = self._phrase_match(p, decoded).persist()
                phrase_tables[p] = mt
                phrase_df[p] = mt.count()  # standalone df (FTS5 xQueryPhrase)

        near_tables: dict = {}
        for nr in _unique_nears(node):
            near_tables[nr] = self._near_table(nr, phrase_tables).persist()

        return slots, phrase_tables, phrase_df, near_tables, decoded

    def match_scores(self, node) -> DataFrame:
        """→ DataFrame (doc_id long, score double) for the query tree."""
        empty = self.spark.createDataFrame([], "doc_id long, score double")
        if node is None:
            return empty
        slots, phrase_tables, phrase_df, near_tables, decoded = self._plan(node)
        if decoded is None or not slots:
            return empty

        k1, b = BM25_K1, BM25_B
        avgdl = self.avgdl

        def contrib_expr(tf_col, idf):
            tf = F.col(tf_col).cast("double")
            return (F.lit(idf) * tf * (k1 + 1.0)
                    / (tf + k1 * (1.0 - b + b * F.col("doc_len").cast("double") / avgdl)))

        # one contribution table per slot, summed in slot order (FTS5
        # accumulates per-phrase scores in expression order)
        scored = None
        for i, slot in enumerate(slots):
            if slot[0] == "phrase":
                p = slot[1]
                idf = self.idf(phrase_df[p])
                contrib = phrase_tables[p].select(
                    "doc_id", contrib_expr("tf", idf).alias(f"c{i}"))
            else:
                _, nr, member = slot
                idf = self.idf(phrase_df[nr.phrases[member]])
                contrib = near_tables[nr].select(
                    "doc_id", contrib_expr(f"tf_{member}", idf).alias(f"c{i}"))
            scored = contrib if scored is None else scored.join(contrib, "doc_id", "full_outer")

        score_expr = None
        for i in range(len(slots)):
            c = F.coalesce(F.col(f"c{i}"), F.lit(0.0))
            score_expr = c if score_expr is None else score_expr + c
        scored = scored.select("doc_id", score_expr.alias("score"))

        qualifying = self._qualify(node, phrase_tables, near_tables)
        return qualifying.join(scored, "doc_id")

    def _qualify(self, node, phrase_tables: dict, near_tables: dict) -> DataFrame:
        if isinstance(node, (Phrase, PrefixNode)):
            return phrase_tables[node].select("doc_id")
        if isinstance(node, Near):
            return near_tables[node].select("doc_id")
        if isinstance(node, And):
            out = self._qualify(node.children[0], phrase_tables, near_tables)
            for c in node.children[1:]:
                out = out.join(self._qualify(c, phrase_tables, near_tables), "doc_id")
            return out
        if isinstance(node, Or):
            out = self._qualify(node.children[0], phrase_tables, near_tables)
            for c in node.children[1:]:
                out = out.unionByName(self._qualify(c, phrase_tables, near_tables))
            return out.distinct()
        if isinstance(node, Not):
            inc = self._qualify(node.include, phrase_tables, near_tables)
            exc = self._qualify(node.exclude, phrase_tables, near_tables)
            return inc.join(exc, "doc_id", "left_anti")
        raise ValueError(f"unknown node {node!r}")

    def search(self, query, k: int = 10, filters: dict | None = None,
               with_docs: bool = False) -> DataFrame:
        """Top-k BM25 search. query: string or AST node.

        → (doc_id, score) [+ doc columns], best-first, ties by doc_id.
        """
        node = parse_query(query) if isinstance(query, str) else query
        scores = self.match_scores(node)
        if filters:
            docs = self._docs
            for col, val in filters.items():
                docs = docs.where(F.col(col) == F.lit(val))
            scores = scores.join(docs.select("doc_id"), "doc_id")
        topk = scores.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)
        if with_docs:
            # hash join docs ⋈ broadcast(top-k): k rows broadcast, the big
            # docs scan prunes on doc_id (reference J1 shape,
            # src/Storage/SqliteStorage.php:1017-1021)
            topk = (self._docs.join(F.broadcast(topk), "doc_id")
                    .orderBy(F.desc("score"), F.asc("doc_id")))
        return topk

    def count(self, query) -> int:
        """Match count (reference M8, src/Storage/SqliteStorage.php:1275-1358)."""
        node = parse_query(query) if isinstance(query, str) else query
        if node is None:
            return 0
        slots, phrase_tables, _, near_tables, decoded = self._plan(node)
        if decoded is None or not slots:
            return 0
        return self._qualify(node, phrase_tables, near_tables).count()


def _collect_slots(node, slots: list) -> None:
    if node is None:
        return
    if isinstance(node, (Phrase, PrefixNode)):
        slots.append(("phrase", node))
    elif isinstance(node, Near):
        for i in range(len(node.phrases)):
            slots.append(("near", node, i))
    elif isinstance(node, (And, Or)):
        for c in node.children:
            _collect_slots(c, slots)
    elif isinstance(node, Not):
        _collect_slots(node.include, slots)
        _collect_slots(node.exclude, slots)


def _unique_phraselike(node) -> list:
    """All distinct Phrase/PrefixNode nodes (incl. NEAR members), in order."""
    out: list = []
    seen: set = set()

    def walk(n):
        if n is None:
            return
        if isinstance(n, (Phrase, PrefixNode)):
            if n not in seen:
                seen.add(n)
                out.append(n)
        elif isinstance(n, Near):
            for p in n.phrases:
                walk(p)
        elif isinstance(n, (And, Or)):
            for c in n.children:
                walk(c)
        elif isinstance(n, Not):
            walk(n.include)
            walk(n.exclude)
    walk(node)
    return out


def _unique_nears(node) -> list:
    out: list = []
    seen: set = set()

    def walk(n):
        if isinstance(n, Near):
            if n not in seen:
                seen.add(n)
                out.append(n)
        elif isinstance(n, (And, Or)):
            for c in n.children:
                walk(c)
        elif isinstance(n, Not):
            walk(n.include)
            walk(n.exclude)
    walk(node)
    return out


def _has_near(node) -> bool:
    if isinstance(node, Near):
        return True
    if isinstance(node, (And, Or)):
        return any(_has_near(c) for c in node.children)
    if isinstance(node, Not):
        return _has_near(node.include) or _has_near(node.exclude)
    return False
