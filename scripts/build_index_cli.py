#!/usr/bin/env python
"""spark-submit entry point: build the inverted index from a transcript
table (reference D5 `index:rebuild` analog).

    spark-submit --py-files yetisearch_spark.zip scripts/build_index_cli.py \
        --input /path/transcripts_parquet --output /path/index \
        [--format parquet|table|json|orc] [--fields title,text] \
        [--num-buckets 64] [--num-salts 16] [--block-size 128] [--fresh]

`--format table` resolves `--input` as a catalog identifier
(`spark.table(...)`) — on a cluster with the Iceberg runtime configured,
that is the Iceberg transcript table directly; the build is
source-agnostic past the read.

Package zip: `cd repo && zip -r yetisearch_spark.zip yetisearch_spark`.
In local mode, plain `python scripts/build_index_cli.py ...` works too.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--format", default="parquet",
                    choices=["parquet", "table", "json", "orc"],
                    help="'table' reads a catalog identifier (e.g. an "
                         "Iceberg table) via spark.table()")
    ap.add_argument("--fields", default="text",
                    help="comma-separated indexed text columns")
    ap.add_argument("--language", default="english")
    ap.add_argument("--num-buckets", type=int, default=32)
    ap.add_argument("--num-salts", type=int, default=16)
    ap.add_argument("--block-size", type=int, default=128)
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--fresh", action="store_true",
                    help="ignore existing checkpoints (no resume)")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    spark = (SparkSession.builder.appName("yetisearch-build")
             .config("spark.sql.adaptive.enabled", "true").getOrCreate())
    from yetisearch_spark.build import build_index

    if args.format == "table":
        transcripts = spark.table(args.input)
    else:
        transcripts = spark.read.format(args.format).load(args.input)
    t0 = time.time()
    manifest = build_index(
        spark, transcripts, args.output,
        num_buckets=args.num_buckets, num_salts=args.num_salts,
        block_size=args.block_size,
        shuffle_partitions=args.shuffle_partitions,
        fields=[f.strip() for f in args.fields.split(",") if f.strip()],
        language=args.language,
        input_path=args.input, resume=not args.fresh)
    wall = time.time() - t0
    n = manifest["stages"]["docs"]["counters"]["docs"]
    print(json.dumps({"docs": n, "wall_s": round(wall, 2),
                      "turns_per_sec": round(n / wall, 1),
                      "stages": {k: v["wall_s"]
                                 for k, v in manifest["stages"].items()}}))
    spark.stop()


if __name__ == "__main__":
    main()
