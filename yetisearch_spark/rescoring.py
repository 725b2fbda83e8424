"""Post-retrieval rescoring (R2-R4, R7) — the reference's candidate
re-rank stage.

The reference overfetches candidates (limit×20, clamped [200, 2000] —
reference: src/Storage/SqliteStorage.php:903-913) and re-ranks them
row-by-row in PHP. Here the candidate page is ≤2000 rows, so the
re-rank runs as one Arrow-batched pandas pass (exactly the shape the
reference uses: SQL returns candidates → in-process rescoring), then
Spark takes the final top-k.

  * field-weighted score (R2): exact-field=100 / exact-phrase=50
    (+20/+10 by phrase/field length ratio) / all-terms=20 (+proximity
    ≤+10, +30 if field == the terms) / partial=5·ratio; ×weight ×2 for
    primary fields; final = base·(1 + (best/10)^1.5 ·{10,5,2})
    (reference: src/Storage/SqliteStorage.php:2472-2658)
  * fuzzy penalty (R4): exact-phrase 5% … fuzzy-only base·{0.7,0.85,1}
    (reference: src/Search/SearchEngine.php:850-971)
  * candidate overfetch helper (R3) and two-pass merge (R7,
    reference: src/Search/SearchEngine.php:139-203)
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame, functions as F

PRIMARY_FIELDS = ("title", "h1", "name", "label")


def effective_limit(limit: int) -> int:
    """R3: candidate overfetch clamp (reference :903-913)."""
    return max(200, min(limit * 20, 2000))


def _parse_query_terms(search_query: str) -> tuple[list[str], list[str]]:
    """(terms, exact_phrases) from an FTS-style query string — mirrors the
    reference's regex extraction."""
    exact_phrases = [m.lower() for m in re.findall(r'"([^"]+)"', search_query)]
    clean = re.sub(r"NEAR\([^)]+\)", "", search_query)
    clean = re.sub(r'["()]', " ", clean).lower()
    terms = []
    for t in clean.split(" "):
        t = t.strip()
        if t and t not in ("or", "and") and "*" not in t and t not in terms:
            terms.append(t)
    if not exact_phrases and len(terms) > 1:
        exact_phrases.append(" ".join(terms))
    return terms, exact_phrases


_NONWORD = re.compile(r"[^\w\s]")


def field_weighted_score(search_query: str, content: dict[str, str],
                         field_weights: dict[str, float],
                         base_score: float) -> float:
    """R2 — row-level twin of the reference's calculateFieldWeightedScore."""
    terms, phrases = _parse_query_terms(search_query)
    best = 0.0
    for field, weight in field_weights.items():
        value = content.get(field)
        if not isinstance(value, str):
            continue
        field_text = value.strip().lower()
        if not field_text:
            continue
        score = 0.0
        match_type = "none"
        clean_field = _NONWORD.sub("", field_text).strip()
        for phrase in phrases:
            if clean_field == _NONWORD.sub("", phrase).strip():
                score, match_type = 100.0, "exact_field"
                break
        if match_type == "none":
            for phrase in phrases:
                if phrase in field_text:
                    score, match_type = 50.0, "exact_phrase"
                    ratio = len(phrase) / max(1, len(field_text))
                    if ratio > 0.8:
                        score += 20.0
                    elif ratio > 0.5:
                        score += 10.0
                    break
        if match_type == "none" and terms:
            positions = [field_text.find(t) for t in terms]
            hits = [p for p in positions if p >= 0]
            if len(hits) == len(terms):
                score, match_type = 20.0, "all_terms"
                if len(hits) > 1:
                    hits.sort()
                    max_gap = max(b - a for a, b in zip(hits, hits[1:]))
                    if max_gap < 50:
                        score += 10.0 * (1.0 - max_gap / 50.0)
                if clean_field == " ".join(terms):
                    score += 30.0
            elif hits:
                score, match_type = 5.0 * len(hits) / len(terms), "partial_terms"
        if score > 0:
            primary = field in PRIMARY_FIELDS or weight >= 5.0
            weighted = score * weight * (2.0 if primary else 1.0)
            best = max(best, weighted)
    if best <= 0:
        return base_score
    scaled = (best / 10.0) ** 1.5
    if best >= 100.0:
        return base_score * (1.0 + scaled * 10.0)
    if best >= 50.0:
        return base_score * (1.0 + scaled * 5.0)
    return base_score * (1.0 + scaled * 2.0)


def fuzzy_penalty(document_text: str, query_tokens: list[str],
                  fuzzy_term_map: dict[str, dict],
                  base_penalty: float = 0.25) -> float:
    """R4 — fraction of the score to subtract (reference default
    fuzzy_score_penalty 0.25; engine applies score·(1−penalty))."""
    text = " " + document_text.lower()
    tokens = [t.lower() for t in query_tokens]

    has_phrase = len(tokens) > 1 and " ".join(tokens) in text
    exact = sum(1 for t in tokens if t in text)
    ratio = exact / len(tokens) if tokens else 0.0

    has_fuzzy = False
    min_distance: Optional[int] = None
    max_similarity = 0.0
    for term, info in fuzzy_term_map.items():
        if info.get("type") == "fuzzy" and term.lower() in text:
            has_fuzzy = True
            if "distance" in info:
                d = info["distance"]
                min_distance = d if min_distance is None else min(min_distance, d)
            if "similarity" in info:
                max_similarity = max(max_similarity, info["similarity"])

    if has_phrase:
        return 0.05
    if ratio >= 1.0 and not has_fuzzy:
        return 0.1
    if ratio >= 0.75 and not has_fuzzy:
        return 0.2
    if ratio > 0 and has_fuzzy:
        return base_penalty * (1.0 - ratio * 0.5)
    if has_fuzzy:
        if max_similarity > 0:
            if max_similarity >= 0.95:
                return base_penalty * 0.7
            if max_similarity >= 0.85:
                return base_penalty * 0.85
            return base_penalty
        if min_distance is not None and min_distance > 0:
            if min_distance == 1:
                return base_penalty * 0.7
            if min_distance == 2:
                return base_penalty * 0.85
            return base_penalty
    return base_penalty


def rescore_candidates(candidates: DataFrame, search_query: str,
                       field_weights: dict[str, float],
                       content_cols: list[str],
                       score_col: str = "score") -> DataFrame:
    """Apply R2 over a candidate DataFrame (≤ effective_limit rows) via an
    Arrow-batched pandas pass; returns the frame with score replaced."""
    import pandas as pd

    cols = list(candidates.columns)
    out_schema = candidates.schema

    def kernel(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            col_arrays = [pdf[c].to_numpy() for c in content_cols]
            scores = pdf[score_col].to_numpy()
            new_scores = [
                field_weighted_score(search_query,
                                     dict(zip(content_cols, vals)),
                                     field_weights, float(s))
                for s, *vals in zip(scores, *col_arrays)]
            pdf = pdf.copy()
            pdf[score_col] = new_scores
            yield pdf

    return candidates.mapInPandas(kernel, schema=out_schema)


def two_pass_search(first_pass: DataFrame, second_pass: DataFrame,
                    k: int, id_col: str = "doc_id",
                    boost: float = 1.5) -> DataFrame:
    """R7: boost pass-1 scores ×1.5, union, dedupe by id keeping the pass-1
    row, sort by score (reference: src/Search/SearchEngine.php:139-203)."""
    p1 = first_pass.withColumn("score", F.col("score") * boost) \
                   .withColumn("_pass", F.lit(1))
    p2 = second_pass.withColumn("_pass", F.lit(2))
    merged = p1.unionByName(p2)
    w_best = (merged.groupBy(id_col)
              .agg(F.min("_pass").alias("_keep_pass")))
    kept = (merged.join(w_best, id_col)
            .where(F.col("_pass") == F.col("_keep_pass"))
            .drop("_pass", "_keep_pass"))
    return kept.orderBy(F.desc("score"), F.asc(id_col)).limit(k)
