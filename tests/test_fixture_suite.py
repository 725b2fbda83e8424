"""Replay the materialized fixture suite (fixtures/queries.json) against
the Spark engine: every case's top-10 (doc_id, score) must be
rank-identical to the recorded SQLite FTS5 oracle output."""

import json
import math
import os

import pytest

from yetisearch_spark.corpus import generate_transcripts
from yetisearch_spark.build import build_index
from yetisearch_spark.query import SearchIndex

FIXTURES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "fixtures", "queries.json")


@pytest.fixture(scope="module")
def suite():
    with open(FIXTURES) as f:
        return json.load(f)


@pytest.fixture(scope="module")
def index(spark, suite, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fixture_idx"))
    meta = suite["corpus"]
    pdf = generate_transcripts(meta["n_turns"], seed=meta["seed"])
    build_index(spark, spark.createDataFrame(pdf), out, num_buckets=8)
    return SearchIndex(spark, out)


def test_fixture_suite_rank_identity(index, suite):
    failures = []
    for case in suite["cases"]:
        got = [(r["doc_id"], r["score"])
               for r in index.search(case["query"],
                                     k=case["options"].get("limit", 10)).collect()]
        want = [(e["doc_id"], e["score"]) for e in case["expected_top10"]]
        if len(got) != len(want):
            failures.append((case["query_id"], case["query"], "count",
                             len(got), len(want)))
            continue
        for (gd, gs), (wd, ws) in zip(got, want):
            if gd != wd or not math.isclose(gs, ws, rel_tol=1e-9, abs_tol=1e-12):
                failures.append((case["query_id"], case["query"],
                                 "mismatch", (gd, gs), (wd, ws)))
                break
    assert not failures, failures[:5]
