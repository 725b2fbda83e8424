#!/usr/bin/env python
"""Tiered-vs-monolithic auto-compaction cost (round-5 verdict order #3).

Builds one base index, then appends N small segments under a
segment-count threshold, twice:

  * tiered    — the round-5 default: when the count reaches the
                threshold, merge_segments folds the ⌈n/2⌉ smallest
                segments into one (O(merged bytes); base untouched,
                doc_ids preserved)
  * monolith  — the round-4 behavior, reproduced explicitly: when the
                count reaches the threshold, compact_in_place rewrites
                the WHOLE index (O(corpus); doc_ids reassigned)

Reports per-append wall seconds for both runs; the numbers to read are
the compaction-bearing appends — tiered cost stays proportional to the
small segments folded, monolithic cost grows with the whole corpus.

Usage: python scripts/bench_merge.py [--base 100000] [--appends 24]
       [--seg-turns 2000] [--threshold 8]
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
    ap.add_argument("--base", type=int, default=100_000)
    ap.add_argument("--appends", type=int, default=24)
    ap.add_argument("--seg-turns", type=int, default=2_000)
    ap.add_argument("--threshold", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--workdir", default="/tmp/yetisearch_mergebench")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("ys-mergebench")
             .config("spark.sql.shuffle.partitions", str(args.cpus))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "24g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    from yetisearch_spark.build import build_index
    from yetisearch_spark.corpus import generate_transcripts
    from yetisearch_spark.streaming import (append_segment, compact_in_place,
                                            list_segments)

    base_pdf = generate_transcripts(args.base, seed=42)
    seg_pdfs = []
    for i in range(args.appends):
        p = generate_transcripts(args.seg_turns, seed=1000 + i)
        p["conv_id"] = p["conv_id"] + f"_s{i}"
        seg_pdfs.append(p)

    out = {}
    for mode in ("tiered", "monolith"):
        d = os.path.join(args.workdir, f"idx_{mode}")
        shutil.rmtree(d, ignore_errors=True)
        build_index(spark, spark.createDataFrame(base_pdf), d, resume=False)
        per_append = []
        for i, p in enumerate(seg_pdfs):
            t0 = time.time()
            if mode == "tiered":
                append_segment(spark, d, spark.createDataFrame(p), epoch=i,
                               auto_compact_segments=args.threshold)
            else:
                append_segment(spark, d, spark.createDataFrame(p), epoch=i,
                               auto_compact_segments=None)
                if len(list_segments(d)) >= args.threshold:
                    compact_in_place(spark, d)
            per_append.append(round(time.time() - t0, 3))
        out[mode] = {
            "per_append_s": per_append,
            "max_append_s": max(per_append),
            "total_s": round(sum(per_append), 3),
            "segments_left": len(list_segments(d)),
        }
        print(mode, json.dumps(out[mode]), flush=True)

    out["config"] = vars(args)
    print("RESULT_JSON:" + json.dumps(out))
    with open(os.path.join(REPO, "segment_merge_latest.json"), "w") as f:
        json.dump(out, f, indent=2)
    spark.stop()


if __name__ == "__main__":
    main()
