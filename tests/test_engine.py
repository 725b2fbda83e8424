"""Engine facade: filters, facets, aggregations, normalization, dedup
roll-up, highlights, multi-index (reference integration-test analog,
tests/Integration/Search/*)."""

import pytest

from yetisearch_spark.corpus import generate_transcripts
from yetisearch_spark.build import build_index
from yetisearch_spark.engine import (Engine, SearchQuery, apply_filters,
                                     extract_snippet, filter_condition,
                                     highlight_terms)


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("engine_idx"))
    pdf = generate_transcripts(1200, seed=11)
    build_index(spark, spark.createDataFrame(pdf), out, num_buckets=8)
    return Engine(spark, {"main": out})


def test_search_shape_and_normalization(engine):
    res = engine.search("main", SearchQuery(query="search", limit=5))
    assert res["count"] <= 5
    assert res["total"] >= res["count"]
    scores = [r["score"] for r in res["results"]]
    assert scores == sorted(scores, reverse=True)
    assert scores[0] == 100.0  # R5: normalized to 0-100 by max
    assert "document" in res["results"][0]


def test_search_offset_pagination(engine):
    full = engine.search("main", SearchQuery(query="search", limit=10))
    page2 = engine.search("main", SearchQuery(query="search", limit=5, offset=5))
    assert [r["id"] for r in page2["results"]] == \
        [r["id"] for r in full["results"][5:10]]


def test_filters(engine):
    q = SearchQuery(query="search",
                    filters=[{"field": "role", "operator": "=",
                              "value": "assistant"}])
    res = engine.search("main", q)
    assert all(r["document"]["role"] == "assistant" for r in res["results"])

    q2 = SearchQuery(query="search",
                     filters=[{"field": "tool", "operator": "is null"}])
    res2 = engine.search("main", q2)
    assert all(r["document"]["tool"] is None for r in res2["results"])

    q3 = SearchQuery(query="search",
                     filters=[{"field": "role", "operator": "in",
                               "value": ["user", "system"]}])
    res3 = engine.search("main", q3)
    assert all(r["document"]["role"] in ("user", "system")
               for r in res3["results"])


def test_filter_eq_or_empty(spark, engine):
    idx = engine.index("main")
    n_null = idx._docs.where("tool is null").count()
    n_bash = idx._docs.where("tool = 'bash'").count()
    got = apply_filters(idx._docs,
                        [{"field": "tool", "operator": "=?", "value": "bash"}]).count()
    assert got == n_null + n_bash


def test_count_matches_search_total(engine):
    q = SearchQuery(query="data")
    assert engine.count("main", q) == engine.search("main", q)["total"]


def test_facets(engine):
    q = SearchQuery(query="search", facets={"role": {"limit": 5}})
    res = engine.search("main", q)
    facet = res["facets"]["role"]
    assert facet and all(f["count"] >= 1 for f in facet)
    counts = [f["count"] for f in facet]
    assert counts == sorted(counts, reverse=True)


def test_range_facet(engine):
    q = SearchQuery(query="search",
                    facets={"turn_idx": {"ranges": [
                        {"to": 5}, {"from": 5, "to": 20}, {"from": 20}]}})
    res = engine.facets("main", q)
    assert "turn_idx" in res


def test_aggregations(engine):
    q = SearchQuery(query="search",
                    aggregations={"max_turn": {"field": "turn_idx", "type": "max"},
                                  "n": {"field": "doc_id", "type": "count"}})
    res = engine.aggregations("main", q)
    assert res["n"]["value"] >= 1
    assert res["max_turn"]["value"] >= 0


def test_min_score(engine):
    all_res = engine.search("main", SearchQuery(query="search", limit=100))
    res = engine.search("main", SearchQuery(query="search", limit=100,
                                            min_score=50.0))
    assert res["total"] <= all_res["total"]
    assert all(r["score"] >= 50.0 for r in res["results"])


def test_sort_by_column(engine):
    q = SearchQuery(query="search", sort={"turn_idx": "desc"}, limit=10)
    res = engine.search("main", q)
    turns = [r["document"]["turn_idx"] for r in res["results"]]
    assert turns == sorted(turns, reverse=True)


def test_highlights(engine):
    q = SearchQuery(query="search", highlight=True, limit=3)
    res = engine.search("main", q)
    assert any("<mark>" in (r.get("highlights", {}).get("text", ""))
               for r in res["results"])


def test_stats(engine):
    s = engine.get_stats("main")
    assert s["document_count"] == 1200
    assert s["vocabulary_size"] > 50
    assert set(s["by_role"]) <= {"user", "assistant", "system", "tool"}


def test_multi_index(spark, engine, tmp_path_factory):
    out2 = str(tmp_path_factory.mktemp("engine_idx2"))
    pdf = generate_transcripts(400, seed=22)
    build_index(spark, spark.createDataFrame(pdf), out2, num_buckets=8)
    eng = Engine(spark, {"a": engine.index("main").index_dir, "b": out2})
    rows = eng.search_multiple(["a", "b"], SearchQuery(query="search"), k=20).collect()
    assert rows
    idx_tags = {r["_index"] for r in rows}
    assert idx_tags <= {"a", "b"}
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_multi_index_pruned_parity(spark, engine, tmp_path_factory):
    """search_multiple's per-shard pruned top-k merge must equal the
    exact-path merge: ids, scores, and shard tags, both for a shape the
    pruned tier serves and one it falls through on."""
    out2 = str(tmp_path_factory.mktemp("engine_idx3"))
    pdf = generate_transcripts(400, seed=23)
    build_index(spark, spark.createDataFrame(pdf), out2, num_buckets=8)
    dirs = {"a": engine.index("main").index_dir, "b": out2}
    exact = Engine(spark, dirs, config={"pruned_gate_blocks": -1})
    routed = Engine(spark, dirs, config={"pruned_gate_blocks": 0})
    for query in ["search", "search OR index", '"the search"']:
        ea = exact.search_multiple(["a", "b"], SearchQuery(query=query),
                                   k=15).collect()
        ra = routed.search_multiple(["a", "b"], SearchQuery(query=query),
                                    k=15).collect()
        assert [(r["_index"], r["doc_id"], r["score"]) for r in ra] == \
               [(r["_index"], r["doc_id"], r["score"]) for r in ea], query
        assert ea, query


def test_snippet_and_highlight_helpers():
    text = "alpha beta gamma " * 30 + "needle here" + " tail words" * 10
    snip = extract_snippet(text, ["needle"], 80)
    assert "needle" in snip and snip.startswith("...")
    assert "<mark>needle</mark>" in highlight_terms(snip, ["needle"])
    # plural probe
    assert "<mark>needles</mark>" in highlight_terms("many needles", ["needle"])


def test_result_fields_projection(engine):
    q = SearchQuery(query="search", limit=2, result_fields=["role", "text"])
    res = engine.search("main", q)
    doc = res["results"][0]["document"]
    assert "role" in doc and "text" in doc
    assert "tool" not in doc and "ts" not in doc


def test_result_cache(engine):
    q = SearchQuery(query="data", limit=3)
    r1 = engine.search("main", q)
    r2 = engine.search("main", q)
    assert r2 is r1  # LRU hit returns the same object
    engine.clear_cache()
    r3 = engine.search("main", q)
    assert r3 is not r1 and r3["total"] == r1["total"]
    r4 = engine.search("main", SearchQuery(query="data", limit=3,
                                           bypass_cache=True))
    assert r4 is not r3
