"""Fuzzy search integrated through the engine (Z6-Z11 live path)."""

import pytest

from yetisearch_spark.corpus import generate_transcripts
from yetisearch_spark.build import build_index
from yetisearch_spark.engine import Engine, SearchQuery


@pytest.fixture(scope="module")
def engine(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fuzzy_idx"))
    pdf = generate_transcripts(1500, seed=55)
    build_index(spark, spark.createDataFrame(pdf), out, num_buckets=8)
    return Engine(spark, {"main": out})


def test_correction_mode_typo_recovers_results(engine):
    clean = engine.search("main", SearchQuery(query="search", limit=5))
    typo_plain = engine.search("main", SearchQuery(query="serch", limit=5))
    typo_fuzzy = engine.search("main", SearchQuery(query="serch", limit=5,
                                                   fuzzy=True))
    assert clean["total"] > 0
    assert typo_plain["total"] == 0
    assert typo_fuzzy["total"] > 0
    # corrected query returns (at least) the clean query's top doc
    clean_ids = {r["id"] for r in clean["results"]}
    fuzzy_ids = {r["id"] for r in typo_fuzzy["results"]}
    assert clean_ids & fuzzy_ids


def test_correction_mode_multi_term(engine):
    res = engine.search("main", SearchQuery(query="serch enginee",
                                            limit=5, fuzzy=True))
    assert res["total"] > 0


def test_expansion_mode(engine):
    engine.config["fuzzy_correction_mode"] = False
    try:
        res = engine.search("main", SearchQuery(query="serch", limit=5,
                                                fuzzy=True))
        assert res["total"] > 0
    finally:
        engine.config["fuzzy_correction_mode"] = True


def test_valid_term_not_corrected(engine):
    plain = engine.search("main", SearchQuery(query="search", limit=5))
    fz = engine.search("main", SearchQuery(query="search", limit=5,
                                           fuzzy=True))
    assert {r["id"] for r in fz["results"]} == {r["id"] for r in plain["results"]}


def test_suggestion_on_empty(engine):
    res = engine.search("main", SearchQuery(query="serch", limit=5))
    assert res["total"] == 0
    assert "suggestion" in res
    assert res["suggestion"]["suggestion"] == "search"


def test_engine_suggest_api(engine):
    s = engine.suggest("main", "serch")
    assert s and s["suggestion"] == "search"
    assert engine.suggest("main", "search") is None


def test_synonym_expansion_in_query(engine):
    engine.config["enable_synonyms"] = True
    # analyzed forms: 'quick' is in-vocab via corpus ('quickly' → 'quickli'?)
    engine.config["synonyms"] = {"search": ["query"]}
    try:
        base = engine.search("main", SearchQuery(query="search", limit=100))
        syn = engine.search("main", SearchQuery(query="search", limit=100))
        assert syn["total"] >= base["total"]
    finally:
        engine.config["enable_synonyms"] = False


def test_get_document(engine):
    hit = engine.search("main", SearchQuery(query="search", limit=1))
    doc = hit["results"][0]["document"]
    got = engine.get_document("main", doc["conv_id"], doc["turn_idx"])
    assert got and got["text"] == doc["text"]
    assert engine.get_document("main", "nope", 0) is None
