"""Round 7 (verdict order 3): keyset-cursor pages served through the
pruned tier (suffix deepening) must equal the exact path's pages — walk
the whole result set page by page with the gate FORCED and compare
against offset slices from an exact twin, including the final short
page and ties."""

import pytest

from yetisearch_spark.build import build_index
from yetisearch_spark.corpus import generate_transcripts
from yetisearch_spark.query import SearchIndex


@pytest.fixture(scope="module")
def cidx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("c7_idx"))
    pdf = generate_transcripts(2000, seed=66)
    build_index(spark, spark.createDataFrame(pdf), out,
                num_buckets=8, block_size=16)
    return out


def _terms(index, n=2):
    rows = (index._term_stats.orderBy("df", ascending=False)
            .limit(30).collect())
    from yetisearch_spark.analyzer import analyze
    ts = [r["term"] for r in rows if analyze(r["term"]) == [r["term"]]]
    return ts[:n]


def test_cursor_pruned_pages_equal_exact(spark, cidx):
    pruned_idx = SearchIndex(spark, cidx)
    pruned_idx.pruned_gate_blocks = 0        # force the pruned route
    exact_idx = SearchIndex(spark, cidx)
    exact_idx.pruned_gate_blocks = -1
    t = _terms(pruned_idx)
    for q in [t[0], f'"{t[0]}" OR "{t[1]}"']:
        full = [(r["doc_id"], r["score"]) for r in
                exact_idx.search(q, k=10_000).collect()]
        k = 7
        got = []
        after = None
        for _ in range(len(full) // k + 2):
            rows = pruned_idx.search(q, k=k, after=after).collect()
            if not rows:
                break
            got.extend((r["doc_id"], r["score"]) for r in rows)
            after = (rows[-1]["score"], rows[-1]["doc_id"])
        assert got == full, q


def test_cursor_pruned_with_docs(spark, cidx):
    pruned_idx = SearchIndex(spark, cidx)
    pruned_idx.pruned_gate_blocks = 0
    exact_idx = SearchIndex(spark, cidx)
    exact_idx.pruned_gate_blocks = -1
    t = _terms(pruned_idx)[0]
    p1 = exact_idx.search(t, k=5).collect()
    after = (p1[-1]["score"], p1[-1]["doc_id"])
    a = [(r["doc_id"], r["score"], r["conv_id"]) for r in
         exact_idx.search(t, k=5, after=after, with_docs=True).collect()]
    b = [(r["doc_id"], r["score"], r["conv_id"]) for r in
         pruned_idx.search(t, k=5, after=after, with_docs=True).collect()]
    assert a == b
