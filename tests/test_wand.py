"""Block-max pruned top-k must be result-identical to the exact path and
actually skip blocks."""

import pytest

from yetisearch_spark.corpus import generate_transcripts
from yetisearch_spark.build import build_index
from yetisearch_spark.query import SearchIndex
from yetisearch_spark.wand import pruned_topk


@pytest.fixture(scope="module")
def index(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wand_idx"))
    pdf = generate_transcripts(3000, seed=77)
    # small blocks so pruning has something to skip
    build_index(spark, spark.createDataFrame(pdf), out,
                num_buckets=8, block_size=16)
    return SearchIndex(spark, out)


def _exact(index, q, k=10):
    return [(r["doc_id"], round(r["score"], 9))
            for r in index.search(q, k=k).collect()]


def _pruned(index, q, k=10):
    df = pruned_topk(index, q, k=k)
    rows = [(r["doc_id"], round(r["score"], 9)) for r in df.collect()]
    return rows, getattr(df, "_pruning_stats", None)


def _common_terms(index, n=4):
    rows = (index._term_stats.orderBy("df", ascending=False)
            .limit(50).collect())
    from yetisearch_spark.analyzer import analyze
    terms = [r["term"] for r in rows if analyze(r["term"]) == [r["term"]]]
    return terms[:n], {r["term"]: r["df"] for r in rows}


def test_single_term_identical_and_pruned(index):
    terms, dfs = _common_terms(index)
    for t in terms[:3]:
        got, stats = _pruned(index, f'"{t}"')
        want = _exact(index, f'"{t}"')
        assert got == want, t
        if dfs[t] > 200:  # enough blocks for pruning to bite
            assert stats["blocks_decoded"] < stats["blocks_total"], \
                (t, stats)


def test_and_identical(index):
    terms, _ = _common_terms(index)
    q = f'"{terms[0]}" AND "{terms[1]}"'
    got, stats = _pruned(index, q)
    want = _exact(index, q)
    assert got == want
    assert stats["blocks_decoded"] <= stats["blocks_total"]


def test_or_identical(index):
    terms, _ = _common_terms(index)
    q = f'"{terms[0]}" OR "{terms[2]}" OR "{terms[3]}"'
    got, _ = _pruned(index, q)
    want = _exact(index, q)
    assert got == want


def test_fallback_for_phrase(index):
    terms, _ = _common_terms(index)
    q = f'"{terms[0]} {terms[1]}"'
    got, stats = _pruned(index, q)
    want = _exact(index, q)
    assert got == want
    assert stats is None  # fell back to exact path


def test_missing_term(index):
    got, _ = _pruned(index, '"zzznotaterm"')
    assert got == []
    got2, _ = _pruned(index, '"zzznotaterm" AND "data"')
    assert got2 == []
