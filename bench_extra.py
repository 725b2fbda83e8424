#!/usr/bin/env python
"""Per-leg isolation harness (round 7, guide §1.4) — NOT the driver
bench. Reuses the bench work dir's built indexes to time individual
engine legs with the same methodology as bench.py, so optimizations can
be measured leg-by-leg without a full bench run. Prints one JSON line.

Usage: python bench_extra.py [leg,leg,...]
Legs: warm, fuzzy, wor_engine, phrase_filtered_engine, skew_exact, or_hot
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.environ["PYTHONPATH"] = (os.path.dirname(os.path.abspath(__file__))
                            + os.pathsep + os.environ.get("PYTHONPATH", ""))

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_TURNS = int(os.environ.get("BENCH_TURNS", "1000000"))
WORK_DIR = os.environ.get("BENCH_WORK_DIR", "/tmp/yetisearch_bench")


def main() -> None:
    from pyspark.sql import SparkSession

    legs = (sys.argv[1].split(",") if len(sys.argv) > 1
            else ["warm", "fuzzy", "wor_engine", "phrase_filtered_engine"])
    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.optimizer."
                     "canChangeCachedPlanOutputPartitioning", "true")
             .config("spark.driver.memory",
                     os.environ.get("BENCH_DRIVER_MEM", "16g"))
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from yetisearch_spark.query import SearchIndex, configure_serving
    from yetisearch_spark.engine import Engine, SearchQuery
    configure_serving(spark)

    index_dir = os.path.join(WORK_DIR, f"index_{BENCH_TURNS}_{CPUS}")
    skew_idx_dir = os.path.join(WORK_DIR, f"skew_index_{BENCH_TURNS}_{CPUS}")
    t: dict[str, float] = {}

    if "warm" in legs or "fuzzy" in legs:
        spark.sparkContext.setJobDescription("extra: warm bootstrap")
        idx = SearchIndex(spark, index_dir)
        t0 = time.time()
        idx.warm()
        t["warm_bootstrap"] = round(time.time() - t0, 4)

    if "fuzzy" in legs:
        spark.sparkContext.setJobDescription("extra: fuzzy cold+hot")
        eng = Engine(spark, {"main": index_dir})
        eng.indexes["main"] = idx
        eng.warm("main")
        sq = SearchQuery(query="serch dta", fuzzy=True, limit=10,
                         bypass_cache=True)
        t0 = time.time()
        eng.search("main", sq)
        t["engine_fuzzy_cold"] = round(time.time() - t0, 4)
        runs = []
        for _ in range(5):
            t0 = time.time()
            eng.search("main", sq)
            runs.append(time.time() - t0)
        t["engine_fuzzy"] = round(sorted(runs)[2], 4)

    if "or_hot" in legs:
        spark.sparkContext.setJobDescription("extra: or hot")
        idx2 = SearchIndex(spark, index_dir)
        for _ in range(2):
            idx2.search("error OR fail OR bug", k=10).collect()
        runs = []
        for _ in range(5):
            t0 = time.time()
            idx2.search("error OR fail OR bug", k=10).collect()
            runs.append(time.time() - t0)
        t["engine_or_hot"] = round(sorted(runs)[2], 4)

    if "deep_page" in legs:
        # page ~100 of the head-term result set: cursor+pruned (suffix
        # deepening) vs cursor+exact (full scoring sort per page)
        spark.sparkContext.setJobDescription("extra: deep cursor page")
        pruned_ix = SearchIndex(spark, skew_idx_dir,
                                cache_postings=False, cache_docs=False)
        pruned_ix.pruned_gate_blocks = 0
        exact_ix = SearchIndex(spark, skew_idx_dir,
                               cache_postings=False, cache_docs=False)
        exact_ix.pruned_gate_blocks = -1
        pruned_ix.term_stats_for(["zzhead"])
        exact_ix.term_stats_for(["zzhead"])
        # two cursor depths: rank 100 sits inside the spike region where
        # θ bites hard; rank 1000 is in the flat tie plateau where no
        # block selection can help (the route must detect that and fall
        # back with bounded overhead)
        rows = exact_ix.search("zzhead", k=1000).collect()
        for depth in (10, 100, 1000):
            row = rows[depth - 1]
            after = (row["score"], row["doc_id"])
            for name, ix in [(f"page{depth}_exact", exact_ix),
                             (f"page{depth}_pruned", pruned_ix)]:
                runs = []
                for _ in range(3):
                    t0 = time.time()
                    out = ix.search("zzhead", k=10, after=after)
                    out.collect()
                    runs.append(time.time() - t0)
                    for g in list(ix._handle_groups):
                        ix.release(g)
                t[name] = round(sorted(runs)[1], 4)

    if {"wor_engine", "phrase_filtered_engine", "skew_exact"} & set(legs):
        from yetisearch_spark.query import parse_query as _pq
        wor_q = ('"zzhead zzrare" OR NEAR("zzrare" "zzhead", 3) '
                 'OR "zzrare" OR "zzhead"')
        ph_node = _pq('"zzhead zzrare"')

        if "skew_exact" in legs:
            skew_idx = SearchIndex(spark, skew_idx_dir,
                                   cache_postings=False, cache_docs=False)
            skew_idx.pruned_gate_blocks = -1
            skew_idx.term_stats_for(["zzhead", "zzrare"])
            skew_idx._df_count_cache[("ph", ph_node.terms)] = \
                skew_idx._phrase_match(ph_node).count()
            for leg, q, n in [("wand_skew_phrase_exact", '"zzhead zzrare"', 1),
                              ("wand_skew_wor_exact", wor_q, 1)]:
                spark.sparkContext.setJobDescription(f"extra: {leg}")
                runs = []
                for _ in range(n):
                    t0 = time.time()
                    skew_idx.search(q, k=10).collect()
                    runs.append(time.time() - t0)
                    for g in list(skew_idx._handle_groups):
                        skew_idx.release(g)
                t[leg] = round(sorted(runs)[len(runs) // 2], 4)

        if "wor_engine" in legs:
            spark.sparkContext.setJobDescription("extra: wor engine")
            eng_skew_idx = SearchIndex(spark, skew_idx_dir,
                                       cache_postings=False, cache_docs=False)
            eng_skew_idx.term_stats_for(["zzhead", "zzrare"])
            eng_skew_idx._df_count_cache[("ph", ph_node.terms)] = \
                eng_skew_idx._phrase_match(ph_node).count()
            eng_skew = Engine(spark, {"skew": skew_idx_dir},
                              config={"enable_fuzzy": False})
            eng_skew.indexes["skew"] = eng_skew_idx
            sqw = SearchQuery(query=wor_q, limit=10, bypass_cache=True)
            runs = []
            for _ in range(3):
                t0 = time.time()
                out_w = eng_skew.search("skew", sqw)
                runs.append(time.time() - t0)
                assert out_w["total"] > 0
                for g in list(eng_skew_idx._handle_groups):
                    eng_skew_idx.release(g)
            t["wand_skew_wor_engine"] = round(sorted(runs)[1], 4)
            t["wand_skew_wor_engine_runs"] = [round(r, 3) for r in runs]

        if "phrase_filtered_engine" in legs:
            spark.sparkContext.setJobDescription("extra: phrase filtered eng")
            eidx = SearchIndex(spark, skew_idx_dir,
                               cache_postings=False, cache_docs=False)
            eidx.term_stats_for(["zzhead", "zzrare"])
            eng2 = Engine(spark, {"skew": skew_idx_dir},
                          config={"enable_fuzzy": False})
            eng2.indexes["skew"] = eidx
            fq = SearchQuery(query='"zzhead zzrare"', limit=10,
                             bypass_cache=True,
                             filters=[{"field": "role", "operator": "=",
                                       "value": "user"}])
            runs = []
            for _ in range(3):
                t0 = time.time()
                out_f = eng2.search("skew", fq)
                runs.append(time.time() - t0)
                assert out_f["total"] > 0
                for g in list(eidx._handle_groups):
                    eidx.release(g)
            t["wand_skew_phrase_filtered_engine"] = round(sorted(runs)[1], 4)
            t["wand_skew_phrase_filtered_engine_runs"] = \
                [round(r, 3) for r in runs]

    print(json.dumps(t))
    spark.stop()


if __name__ == "__main__":
    main()
