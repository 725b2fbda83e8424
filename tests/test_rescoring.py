"""R2/R4/R7 rescoring semantics (reference behaviors at
src/Storage/SqliteStorage.php:2472-2658, src/Search/SearchEngine.php:850-971,139-203)."""

import pytest

from yetisearch_spark.rescoring import (effective_limit, field_weighted_score,
                                        fuzzy_penalty, two_pass_search)


def test_effective_limit_clamp():
    assert effective_limit(5) == 200     # floor
    assert effective_limit(20) == 400
    assert effective_limit(500) == 2000  # ceiling


WEIGHTS = {"title": 3.0, "content": 1.0}


def test_exact_field_match_dominates():
    base = 2.0
    exact = field_weighted_score('"hello world"',
                                 {"title": "Hello World", "content": "other"},
                                 WEIGHTS, base)
    phrase = field_weighted_score('"hello world"',
                                  {"title": "say Hello World again and again",
                                   "content": "other"}, WEIGHTS, base)
    partial = field_weighted_score('"hello world"',
                                   {"title": "hello there", "content": "x"},
                                   WEIGHTS, base)
    none = field_weighted_score('"hello world"',
                                {"title": "nothing here", "content": "x"},
                                WEIGHTS, base)
    assert exact > phrase > partial > none == base


def test_exact_field_formula():
    # title exact match: field=100 × weight 3 × primary 2 = 600
    # final = base · (1 + (600/10)^1.5 · 10)
    got = field_weighted_score('"abc"', {"title": "abc"}, {"title": 3.0}, 1.0)
    assert abs(got - (1.0 + (60.0 ** 1.5) * 10.0)) < 1e-9


def test_all_terms_and_proximity():
    q = "alpha beta"
    near = field_weighted_score(q, {"content": "alpha beta live here"},
                                {"content": 1.0}, 1.0)
    far = field_weighted_score(
        q, {"content": "alpha " + "x " * 60 + "beta"}, {"content": 1.0}, 1.0)
    assert near > far > 1.0


def test_fuzzy_penalty_tiers():
    toks = ["hello", "world"]
    assert fuzzy_penalty("say hello world now", toks, {}) == 0.05
    assert fuzzy_penalty("world comes before hello", toks, {}) == 0.1
    assert fuzzy_penalty("only hello here", ["hello", "world", "foo", "bar"],
                         {}) == 0.25  # ratio 0.25 → full base penalty
    # mixed exact + fuzzy
    p = fuzzy_penalty("hello helo", toks, {"helo": {"type": "fuzzy",
                                                    "distance": 1}})
    assert p == 0.25 * (1.0 - 0.5 * 0.5)
    # fuzzy only, similarity tiers
    fm = {"helo": {"type": "fuzzy", "similarity": 0.96}}
    assert fuzzy_penalty("helo there", ["goodbye"], fm) == 0.25 * 0.7
    fm2 = {"helo": {"type": "fuzzy", "similarity": 0.86}}
    assert fuzzy_penalty("helo there", ["goodbye"], fm2) == 0.25 * 0.85
    fm3 = {"helo": {"type": "fuzzy", "distance": 1}}
    assert fuzzy_penalty("helo there", ["goodbye"], fm3) == 0.25 * 0.7


def test_two_pass_merge(spark):
    p1 = spark.createDataFrame([(1, 10.0), (2, 8.0)], "doc_id long, score double")
    p2 = spark.createDataFrame([(2, 9.0), (3, 20.0)], "doc_id long, score double")
    rows = two_pass_search(p1, p2, k=10).collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    assert got[1] == 15.0       # boosted 1.5×
    assert got[2] == 12.0       # pass-1 row kept (boosted), pass-2 dropped
    assert got[3] == 20.0
    order = [r["doc_id"] for r in rows]
    assert order == [3, 1, 2]
