#!/usr/bin/env python
"""Segment-lifecycle bench leg (round-4 verdict order #3): hot query
latency and serving-view construction time vs committed segment count.

Builds one 200k-turn corpus, splits it into 1/4/16/64 equal parts, and
for each segment count builds base+(parts-1) appended segments (auto-
compaction disabled so the degradation is visible), then measures:

  * view_construct_s — GlobalSegmentedIndex construction (one stats job)
  * hot single/AND/OR latency (median of 3 after one warm-up)

The point of the numbers: query latency must stay ~flat while view
construction grows only mildly — the evidence that the auto-compaction
default (AUTO_COMPACT_SEGMENTS=16) is placed where degradation would
begin, not after it.

Usage: python scripts/bench_segments.py [--turns 200000] [--counts 1,4,16,64]
"""

import argparse
import json
import os
import shutil
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.environ["PYTHONPATH"] = REPO + os.pathsep + os.environ.get("PYTHONPATH", "")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=200_000)
    ap.add_argument("--counts", default="1,4,16,64")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--workdir", default="/tmp/yetisearch_segbench")
    args = ap.parse_args()
    counts = [int(c) for c in args.counts.split(",")]

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("ys-segbench")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                     "true")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from yetisearch_spark.corpus import generate_transcripts
    from yetisearch_spark.build import build_index
    from yetisearch_spark.query import configure_serving
    from yetisearch_spark.streaming import (GlobalSegmentedIndex,
                                            append_segment)

    pdf = generate_transcripts(args.turns, seed=42)
    queries = [("single", "data"), ("and", "data AND process"),
               ("or", "error OR fail")]

    results = []
    for n_seg in counts:
        out = os.path.join(args.workdir, f"idx_{n_seg}")
        shutil.rmtree(out, ignore_errors=True)
        part = len(pdf) // n_seg
        t_build0 = time.time()
        build_index(spark, spark.createDataFrame(pdf.iloc[:part]), out,
                    resume=False)
        for i in range(1, n_seg):
            chunk = pdf.iloc[i * part: (i + 1) * part]
            append_segment(spark, out, spark.createDataFrame(chunk),
                           epoch=i, auto_compact_segments=None)
        build_s = time.time() - t_build0

        configure_serving(spark)
        t0 = time.time()
        live = GlobalSegmentedIndex(spark, out)
        view_s = time.time() - t0
        row = {"segments": n_seg, "build_s": round(build_s, 3),
               "view_construct_s": round(view_s, 4)}
        for name, q in queries:
            live.search(q, k=10).collect()          # warm-up / cache fill
            laps = []
            for _ in range(3):
                t0 = time.time()
                live.search(q, k=10).collect()
                laps.append(time.time() - t0)
            row[f"hot_{name}_s"] = round(statistics.median(laps), 4)
        live.close()
        spark.conf.set("spark.sql.adaptive.enabled", "true")
        results.append(row)
        print(json.dumps(row), flush=True)

    print("RESULT_JSON:" + json.dumps(
        {"turns": args.turns, "cpus": args.cpus, "legs": results}))
    spark.stop()


if __name__ == "__main__":
    main()
