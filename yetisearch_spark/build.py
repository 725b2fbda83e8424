"""Distributed inverted-index build (the reference's Indexer/insertBatch path,
reference: src/Index/Indexer.php:55-116,233-383 and
src/Storage/SqliteStorage.php:487-666 — re-expressed as staged Spark jobs).

Index layout under ``out_dir`` (all Parquet):

  docs/          doc_id, conv_id, turn_idx, role, tool, ts, text, tokens, doc_len
  raw_postings/  bucket=*/ (doc_id, term, tf, positions)      [checkpoint]
  term_stats/    term, df, cf, bucket
  global_stats/  n_docs, avgdl, total_tokens
  postings/      bucket=*/ (term, salt, block_id, min_doc, max_doc,
                            n_docs, block_max_norm, data binary)
  manifest.json  lineage + per-stage status/counters (resume contract)

Scale design:
  * bucket = xxhash64(term) % num_buckets → query-time partition pruning.
  * head terms (df ≥ salt_threshold) are salted into num_salts sub-lists
    keyed by xxhash64(doc_id) so no single reducer owns a whole stop-ish
    term's posting list (north_rule skew requirement).
  * encode is mapInPandas over repartition(term, salt) — group-boundary
    carry between Arrow batches, no per-group Python round trips.
  * every stage commits to the manifest; a resumed build skips completed
    stages (and reloads the persisted doc_id mapping, making doc_ids
    stable across restarts regardless of shuffle sampling).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (ArrayType, BinaryType, IntegerType, LongType,
                               DoubleType, StringType, StructField, StructType)

from .udfs import make_analyze_udf, make_postings_udf
from .docids import doc_id_expr, partition_offsets, with_partition_ordinals
from .postings import BLOCK_SIZE

DEFAULT_NUM_BUCKETS = 32
DEFAULT_SALT_THRESHOLD = 100_000
DEFAULT_NUM_SALTS = 16


# ---------------------------------------------------------------------------
# Manifest (checkpoint/lineage)
# ---------------------------------------------------------------------------

def _manifest_path(out_dir: str) -> str:
    return os.path.join(out_dir, "manifest.json")


def load_manifest(out_dir: str) -> dict:
    p = _manifest_path(out_dir)
    if os.path.exists(p):
        with open(p) as f:
            return json.load(f)
    return {"stages": {}, "lineage": {}, "config": {}}


def _commit_stage(out_dir: str, manifest: dict, stage: str,
                  counters: dict, wall_s: float) -> None:
    manifest["stages"][stage] = {
        "status": "done", "counters": counters,
        "wall_s": round(wall_s, 3),
    }
    tmp = _manifest_path(out_dir) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, _manifest_path(out_dir))


def _stage_done(manifest: dict, stage: str) -> bool:
    return manifest["stages"].get(stage, {}).get("status") == "done"


def load_docs(spark: SparkSession, out_dir: str,
              manifest: dict | None = None) -> DataFrame:
    """Docs table with the doc_id column materialized as a Catalyst
    expression over the staged (_pid, _ord) ordinals (see docids.py)."""
    manifest = manifest or load_manifest(out_dir)
    offsets = {int(k): int(v) for k, v in
               manifest["stages"]["docs"]["counters"]["doc_offsets"].items()}
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    return docs.withColumn("doc_id", doc_id_expr(offsets)).drop("_pid", "_ord")


# ---------------------------------------------------------------------------
# Stage kernels
# ---------------------------------------------------------------------------

_ENCODED_SCHEMA = StructType([
    StructField("bucket", IntegerType(), False),
    StructField("term", StringType(), False),
    StructField("salt", IntegerType(), False),
    StructField("block_id", IntegerType(), False),
    StructField("min_doc", LongType(), False),
    StructField("max_doc", LongType(), False),
    StructField("n_docs", IntegerType(), False),
    StructField("block_max_norm", DoubleType(), False),
    StructField("data", BinaryType(), False),
])


def _encode_partition_factory(avgdl: float, block_size: int):
    """mapInArrow fn: rows sorted by (term, salt, doc_id) within the
    partition → encoded block rows. Fully vectorized: positions arrive as
    an Arrow ListArray whose offsets/values feed encode_posting_group
    directly (no per-doc Python — measured ~50µs/posting with the naive
    pandas kernel, dominated by per-row list conversions). Carries the
    open (term, salt) group across Arrow batch boundaries."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .postings import encode_posting_group

    out_schema = pa.schema([
        ("bucket", pa.int32()), ("term", pa.string()), ("salt", pa.int32()),
        ("block_id", pa.int32()), ("min_doc", pa.int64()),
        ("max_doc", pa.int64()), ("n_docs", pa.int32()),
        ("block_max_norm", pa.float64()), ("data", pa.binary()),
    ])

    def to_numpy_cols(batch):
        term = batch.column("term").to_numpy(zero_copy_only=False)
        bucket = batch.column("bucket").to_numpy(zero_copy_only=False)
        salt = batch.column("salt").to_numpy(zero_copy_only=False)
        doc_id = batch.column("doc_id").to_numpy(zero_copy_only=False)
        tf = batch.column("tf").to_numpy(zero_copy_only=False)
        doc_len = batch.column("doc_len").to_numpy(zero_copy_only=False)
        plist = batch.column("positions")
        lengths = pc.list_value_length(plist).to_numpy(zero_copy_only=False)
        values = pc.list_flatten(plist).to_numpy(zero_copy_only=False)
        offsets = np.concatenate(([0], np.cumsum(lengths))).astype(np.int64)
        return dict(term=term, bucket=bucket, salt=salt, doc_id=doc_id,
                    tf=tf, doc_len=doc_len, offsets=offsets, values=values)

    def concat_cols(a, b):
        out = {k: np.concatenate((a[k], b[k]))
               for k in ("term", "bucket", "salt", "doc_id", "tf", "doc_len",
                         "values")}
        out["offsets"] = np.concatenate(
            (a["offsets"], b["offsets"][1:] + a["offsets"][-1]))
        return out

    def slice_cols(c, lo, hi):
        out = {k: c[k][lo:hi]
               for k in ("term", "bucket", "salt", "doc_id", "tf", "doc_len")}
        vlo, vhi = int(c["offsets"][lo]), int(c["offsets"][hi])
        out["values"] = c["values"][vlo:vhi]
        out["offsets"] = c["offsets"][lo:hi + 1] - vlo
        return out

    def encode_groups(c, boundaries):
        """boundaries: group start indices incl. 0 and end."""
        res = {k: [] for k in ("bucket", "term", "salt", "block_id",
                               "min_doc", "max_doc", "n_docs",
                               "block_max_norm", "data")}
        for gi in range(len(boundaries) - 1):
            lo, hi = boundaries[gi], boundaries[gi + 1]
            g = slice_cols(c, lo, hi)
            rows = encode_posting_group(
                g["doc_id"].astype(np.int64), g["tf"].astype(np.int64),
                g["doc_len"].astype(np.int64), g["offsets"], g["values"],
                block_size, avgdl)
            for (bid, mind, maxd, nd, bmax, data) in rows:
                res["bucket"].append(int(c["bucket"][lo]))
                res["term"].append(c["term"][lo])
                res["salt"].append(int(c["salt"][lo]))
                res["block_id"].append(bid)
                res["min_doc"].append(mind)
                res["max_doc"].append(maxd)
                res["n_docs"].append(nd)
                res["block_max_norm"].append(bmax)
                res["data"].append(data)
        if not res["term"]:
            return None
        return pa.RecordBatch.from_pydict(
            {k: pa.array(v, type=out_schema.field(k).type)
             for k, v in res.items()}, schema=out_schema)

    def encode_partition(batches):
        carry = None
        for batch in batches:
            if batch.num_rows == 0:
                continue
            c = to_numpy_cols(batch)
            if carry is not None:
                c = concat_cols(carry, c)
                carry = None
            term, salt = c["term"], c["salt"]
            change = np.flatnonzero(
                (term[1:] != term[:-1]) | (salt[1:] != salt[:-1])) + 1
            # last group may continue in the next batch → carry it
            last_start = int(change[-1]) if change.size else 0
            carry = slice_cols(c, last_start, len(term))
            boundaries = [0] + change[:-1].tolist() + [last_start] \
                if change.size else [0, 0]
            rb = encode_groups(c, boundaries)
            if rb is not None:
                yield rb
        if carry is not None and carry["term"].size:
            rb = encode_groups(carry, [0, carry["term"].size])
            if rb is not None:
                yield rb

    return encode_partition


# ---------------------------------------------------------------------------
# Build driver
# ---------------------------------------------------------------------------

def build_index(
    spark: SparkSession,
    transcripts: DataFrame,
    out_dir: str,
    *,
    num_buckets: int = DEFAULT_NUM_BUCKETS,
    block_size: int = BLOCK_SIZE,
    salt_threshold: int = DEFAULT_SALT_THRESHOLD,
    num_salts: int = DEFAULT_NUM_SALTS,
    shuffle_partitions: int | None = None,
    input_path: str | None = None,
    resume: bool = True,
) -> dict:
    """Build the full index; returns the manifest. Resumable per stage."""
    os.makedirs(out_dir, exist_ok=True)
    manifest = load_manifest(out_dir) if resume else {"stages": {}, "lineage": {}, "config": {}}
    manifest["config"] = {
        "num_buckets": num_buckets, "block_size": block_size,
        "salt_threshold": salt_threshold, "num_salts": num_salts,
    }
    manifest["lineage"] = {"input_path": input_path or "<dataframe>"}
    if shuffle_partitions is None:
        shuffle_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    docs_path = os.path.join(out_dir, "docs")
    raw_path = os.path.join(out_dir, "raw_postings")
    ts_path = os.path.join(out_dir, "term_stats")
    gs_path = os.path.join(out_dir, "global_stats")
    post_path = os.path.join(out_dir, "postings")

    # -- stage 1: docs (sort + analysis in ONE data pass; doc_id becomes a
    # Catalyst expression over the staged (_pid, _ord) columns) -------------
    if not _stage_done(manifest, "docs"):
        t0 = time.time()
        analyze_udf = make_analyze_udf()
        staged = with_partition_ordinals(transcripts, ["conv_id", "turn_idx"],
                                         shuffle_partitions)
        docs = (
            staged
            .withColumn("tokens", analyze_udf(F.col("text")))
            .withColumn("doc_len", F.size("tokens"))
        )
        docs.write.mode("overwrite").parquet(docs_path)
        offsets, n_docs = partition_offsets(spark.read.parquet(docs_path))
        _commit_stage(out_dir, manifest, "docs",
                      {"docs": n_docs,
                       "doc_offsets": {str(k): v for k, v in offsets.items()}},
                      time.time() - t0)

    docs_df = load_docs(spark, out_dir, manifest)

    # -- stage 2: raw postings (per-row term aggregation, zero shuffle) -----
    if not _stage_done(manifest, "raw_postings"):
        t0 = time.time()
        postings_udf = make_postings_udf()
        raw = (
            docs_df.select("doc_id", "doc_len",
                           F.explode(postings_udf("tokens")).alias("p"))
            .select(
                F.pmod(F.xxhash64(F.col("p.term")), F.lit(num_buckets))
                 .cast("int").alias("bucket"),
                F.col("p.term").alias("term"),
                "doc_id",
                F.col("p.tf").alias("tf"),
                F.col("p.positions").alias("positions"),
                "doc_len",
            )
        )
        # plain files (bucket stays a column): partitionBy here would fan out
        # tasks×buckets small files and every downstream stage pays to open
        # them (measured 11× slowdown at 32 cores). The final postings table
        # is the one that needs physical bucket partitioning for query-time
        # pruning.
        raw.write.mode("overwrite").parquet(raw_path)
        n_post = spark.read.parquet(raw_path).count()
        _commit_stage(out_dir, manifest, "raw_postings",
                      {"postings": n_post}, time.time() - t0)

    raw_df = spark.read.parquet(raw_path)

    # -- stage 3: statistics -------------------------------------------------
    if not _stage_done(manifest, "stats"):
        t0 = time.time()
        term_stats = (
            raw_df.groupBy("bucket", "term")
                  .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf"))
        )
        term_stats.write.mode("overwrite").parquet(ts_path)
        gs = docs_df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("doc_len").alias("avgdl"),
            F.sum("doc_len").alias("total_tokens"),
        )
        gs.write.mode("overwrite").parquet(gs_path)
        row = spark.read.parquet(gs_path).collect()[0]
        _commit_stage(out_dir, manifest, "stats",
                      {"n_docs": row["n_docs"], "avgdl": float(row["avgdl"] or 0.0),
                       "vocab": spark.read.parquet(ts_path).count()},
                      time.time() - t0)

    gs_row = spark.read.parquet(gs_path).collect()[0]
    avgdl = float(gs_row["avgdl"] or 1.0)

    # -- stage 4: encoded postings (salted, blocked, varint) ----------------
    if not _stage_done(manifest, "postings"):
        t0 = time.time()
        heavy = (
            spark.read.parquet(ts_path)
                 .where(F.col("df") >= salt_threshold)
                 .select("term", F.lit(num_salts).alias("n_salts"))
        )
        salted = (
            raw_df.join(F.broadcast(heavy), "term", "left")
                  .withColumn("salt",
                              F.when(F.col("n_salts").isNull(), F.lit(0))
                               .otherwise(F.pmod(F.xxhash64("doc_id"),
                                                 F.col("n_salts")).cast("int")))
                  .select("bucket", "term", "salt", "doc_id", "tf",
                          "positions", "doc_len")
        )
        encoded = (
            salted.repartition(shuffle_partitions, "term", "salt")
                  .sortWithinPartitions("term", "salt", "doc_id")
                  .mapInArrow(_encode_partition_factory(avgdl, block_size),
                              schema=_ENCODED_SCHEMA)
        )
        # second (cheap — compressed blocks) shuffle: one file per bucket,
        # terms sorted within, so query-time term predicates prune on
        # parquet row-group min/max stats instead of opening shards
        (encoded.repartition(num_buckets, "bucket")
                .sortWithinPartitions("term", "salt", "block_id")
                .write.mode("overwrite").partitionBy("bucket").parquet(post_path))
        per_bucket = (
            spark.read.parquet(post_path)
                 .groupBy("bucket")
                 .agg(F.count(F.lit(1)).alias("blocks"),
                      F.sum("n_docs").alias("postings"),
                      F.sum(F.length("data")).alias("bytes"))
                 .collect()
        )
        _commit_stage(out_dir, manifest, "postings",
                      {"per_bucket": {str(r["bucket"]): {
                          "blocks": r["blocks"], "postings": int(r["postings"]),
                          "bytes": int(r["bytes"])} for r in per_bucket}},
                      time.time() - t0)

    return load_manifest(out_dir)
