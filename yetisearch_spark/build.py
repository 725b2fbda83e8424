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
from .docids import assign_doc_ids
from .postings import BLOCK_SIZE, bm25_norm, encode_posting_block

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
    """mapInPandas fn: rows sorted by (term, salt, doc_id) within the
    partition → encoded block rows. Carries the open (term, salt) group
    across Arrow batch boundaries."""

    def encode_partition(batches):
        carry: pd.DataFrame | None = None

        def flush(group: pd.DataFrame) -> pd.DataFrame:
            term = group["term"].iat[0]
            bucket = int(group["bucket"].iat[0])
            salt = int(group["salt"].iat[0])
            doc_ids = group["doc_id"].to_numpy(dtype=np.int64)
            order = np.argsort(doc_ids, kind="stable")
            doc_ids = doc_ids[order]
            tfs = group["tf"].to_numpy(dtype=np.int64)[order]
            dls = group["doc_len"].to_numpy(dtype=np.int64)[order]
            poss = group["positions"].to_numpy()[order]
            rows = []
            for b0 in range(0, len(doc_ids), block_size):
                b1 = min(b0 + block_size, len(doc_ids))
                ids, t, d = doc_ids[b0:b1], tfs[b0:b1], dls[b0:b1]
                data = encode_posting_block(
                    ids, t, d, [np.asarray(p, dtype=np.int64) for p in poss[b0:b1]])
                rows.append((bucket, term, salt, b0 // block_size,
                             int(ids[0]), int(ids[-1]), len(ids),
                             float(bm25_norm(t, d, avgdl).max()), data))
            return pd.DataFrame(rows, columns=[f.name for f in _ENCODED_SCHEMA.fields])

        for pdf in batches:
            if pdf.empty:
                continue
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            # group key ordinal (rows arrive sorted by term, salt)
            key = pdf["term"].astype(str) + "\x00" + pdf["salt"].astype(str)
            change = key.ne(key.shift())
            gid = change.cumsum()
            last_gid = gid.iat[-1]
            outs = []
            for g, group in pdf.groupby(gid, sort=False):
                if g == last_gid:
                    carry = group  # may continue in next batch
                else:
                    outs.append(flush(group))
            if outs:
                yield pd.concat(outs, ignore_index=True)
        if carry is not None and not carry.empty:
            yield flush(carry)

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

    # -- stage 1: docs (doc_id assignment + analysis) -----------------------
    if not _stage_done(manifest, "docs"):
        t0 = time.time()
        analyze_udf = make_analyze_udf()
        with_ids = assign_doc_ids(transcripts, ["conv_id", "turn_idx"],
                                  shuffle_partitions)
        docs = (
            with_ids
            .withColumn("tokens", analyze_udf(F.col("text")))
            .withColumn("doc_len", F.size("tokens"))
        )
        docs.write.mode("overwrite").parquet(docs_path)
        parent = getattr(with_ids, "_ys_persisted_parent", None)
        if parent is not None:
            parent.unpersist()
        n_docs = spark.read.parquet(docs_path).count()
        _commit_stage(out_dir, manifest, "docs", {"docs": n_docs}, time.time() - t0)

    docs_df = spark.read.parquet(docs_path)

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
        raw.write.mode("overwrite").partitionBy("bucket").parquet(raw_path)
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
                  .mapInPandas(_encode_partition_factory(avgdl, block_size),
                               schema=_ENCODED_SCHEMA)
        )
        (encoded.write.mode("overwrite").partitionBy("bucket").parquet(post_path))
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
