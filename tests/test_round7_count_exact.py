"""Round 7 (advice r6): the exact-count thunk must count matches whose
every block fell below θ in the pruned wor frames.

Corpus engineered so that docs matching ONLY via a NEAR (or phrase) slot
sit in posting blocks the weighted-OR θ prunes: 4 long "victim" docs
carry `aaa bbb` (low BM25 norm — their blocks' w·ub falls below θ/T
derived from the high-norm `ccc` bare slot) and no `ccc`, so the old
thunk built their slot doc set from the pruned frames and undercounted
the engine's default ``total_mode: exact`` total by 4."""

import pandas as pd
import pytest

from yetisearch_spark.build import build_index
from yetisearch_spark.engine import Engine, SearchQuery
from yetisearch_spark.query import SearchIndex, parse_query


@pytest.fixture(scope="module")
def adv_idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("adv_count_idx"))
    rows = []
    filler = [f"filler{j:03d}" for j in range(240)]
    for i in range(400):
        if i < 60:                       # high-norm ccc docs (the θ source)
            text = " ".join(["ccc"] * 8 + filler[:4])
        elif 300 <= i <= 303:            # victims: NEAR/phrase-only match,
            # long doc → low norm → their aaa/bbb blocks fall below θ
            text = " ".join(filler) + " aaa bbb"
        elif 360 <= i <= 369:            # short high-norm NEAR matches
            # (no ccc here: a ccc posting in this id range would put a
            # wide ccc block over the victims' range and the overlap
            # pull-in would rescue them, hiding the counting bug)
            text = "aaa bbb " + filler[i - 360]
        else:
            text = " ".join(filler[5:11])
        rows.append({"conv_id": f"c{i:04d}", "turn_idx": 0, "role": "user",
                     "ts": 0, "text": text})
    pdf = pd.DataFrame(rows)
    build_index(spark, spark.createDataFrame(pdf), out,
                num_buckets=4, block_size=4)
    return out


def _totals(spark, adv_idx, query, seed_phrase_df=False):
    exact_eng = Engine(spark, {"t": adv_idx},
                       config={"pruned_gate_blocks": -1,
                               "enable_fuzzy": False})
    routed_eng = Engine(spark, {"t": adv_idx},
                        config={"pruned_gate_blocks": 0,
                                "enable_fuzzy": False})
    if seed_phrase_df:
        # replica scenario (the bench's wor seeding): the standalone
        # phrase df is synced but the match table is NOT cached — the
        # count thunk must rebuild it count-complete, not from the
        # θ-pruned wor frames
        node = parse_query(query)
        ph = next(c for c in node.children
                  if hasattr(c, "terms") and len(c.terms) > 1)
        idx = routed_eng.index("t")
        df_ph = idx._phrase_match(ph).count()
        idx._df_count_cache[("ph", ph.terms)] = df_ph
        assert ("ph", ph.terms) not in idx._match_cache
    sq = SearchQuery(query=query, limit=2, bypass_cache=True)
    exact = exact_eng.search("t", sq)
    routed = routed_eng.search("t", sq)
    return exact, routed


def test_near_only_match_in_pruned_block_counts(spark, adv_idx):
    exact, routed = _totals(spark, adv_idx,
                            'NEAR("aaa" "bbb", 2) OR "ccc"')
    assert exact["total"] == routed["total"], \
        f'exact {exact["total"]} vs routed {routed["total"]}'
    # the page itself stays top-k-exact either way
    assert ([r["id"] for r in exact["results"]]
            == [r["id"] for r in routed["results"]])


def test_phrase_only_match_with_seeded_df_counts(spark, adv_idx):
    exact, routed = _totals(spark, adv_idx, '"aaa bbb" OR "ccc"',
                            seed_phrase_df=True)
    assert exact["total"] == routed["total"], \
        f'exact {exact["total"]} vs routed {routed["total"]}'
    assert ([r["id"] for r in exact["results"]]
            == [r["id"] for r in routed["results"]])
