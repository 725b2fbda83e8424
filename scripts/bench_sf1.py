#!/usr/bin/env python
"""sf1 stretch leg (round-4 verdict order #8): the 8 hot engine-query
legs at a 10M-turn corpus vs the standard 1M-turn bench — the closest
local proxy for the 100× latency curve. Same query set, same serving
configuration (AQE off, warm replica, hot = median of 3 after the
two-touch promotion warm-up).

Usage: python scripts/bench_sf1.py [--turns 10000000]
"""

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=10_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--workdir", default="/tmp/yetisearch_sf1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("ys-sf1")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                     "true")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from yetisearch_spark.corpus import write_corpus_parquet
    from yetisearch_spark.build import build_index
    from yetisearch_spark.query import SearchIndex, configure_serving
    from yetisearch_spark.engine import Engine, SearchQuery

    corpus = os.path.join(args.workdir, f"corpus_{args.turns}")
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        shutil.rmtree(corpus, ignore_errors=True)
        write_corpus_parquet(corpus, args.turns, seed=42)
        open(os.path.join(corpus, "_DONE"), "w").write("ok")

    index_dir = os.path.join(args.workdir, f"index_{args.turns}_{args.cpus}")
    t0 = time.time()
    build_index(spark, spark.read.parquet(corpus), index_dir,
                input_path=corpus, shuffle_partitions=args.cpus)
    build_s = time.time() - t0

    configure_serving(spark)
    idx = SearchIndex(spark, index_dir)
    idx.warm()
    queries = {
        "engine_single": "search",
        "engine_and": "data AND process",
        "engine_or": "error OR fail OR bug",
        "engine_phrase": '"data process"',
        "engine_near": 'NEAR("search" "index", 10)',
        "engine_prefix": "comput*",
    }
    out = {"turns": args.turns, "cpus": args.cpus,
           "index_build_s": round(build_s, 2),
           "index_build_turns_per_sec": round(args.turns / build_s, 1)}
    cold_total = 0.0
    for name, q in queries.items():
        t0 = time.time()
        idx.search(q, k=10).collect()
        cold_total += time.time() - t0
        runs = []
        for _ in range(3):
            t0 = time.time()
            idx.search(q, k=10).collect()
            runs.append(time.time() - t0)
        out[name] = round(sorted(runs)[1], 4)
    out["engine_queries_cold_total"] = round(cold_total, 4)

    eng = Engine(spark, {"main": index_dir})
    eng.indexes["main"] = idx
    eng.warm("main")
    sq = SearchQuery(query="serch dta", fuzzy=True, limit=10,
                     bypass_cache=True)
    t0 = time.time()
    eng.search("main", sq)
    out["engine_fuzzy_cold"] = round(time.time() - t0, 4)
    runs = []
    for _ in range(3):
        t0 = time.time()
        eng.search("main", sq)
        runs.append(time.time() - t0)
    out["engine_fuzzy"] = round(sorted(runs)[1], 4)

    print("RESULT_JSON:" + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
