"""Distributed inverted-index build (the reference's Indexer/insertBatch path,
reference: src/Index/Indexer.php:55-116,233-383 and
src/Storage/SqliteStorage.php:487-666 — re-expressed as staged Spark jobs).

Index layout under ``out_dir`` (all Parquet):

  docs/          staged sorted transcripts + tokens + doc_len (+_pid,_ord)
  global_stats/  n_docs, avgdl, total_tokens
  postings/      bucket=*/ (term, salt, block_id, min_doc, max_doc,
                            n_docs, block_max_norm, data binary, tf_sum)
  term_stats/    bucket, term, df, cf
  manifest.json  lineage + per-stage status/counters (resume contract)

Scale design (profiled on 10M-turn builds — see git history):
  * MAP-SIDE RUN CONSTRUCTION (Lucene-flush shape): every docs split
    builds its own ≤block_size posting blocks locally in the final binary
    format; only block-level rows (≈ vocab × splits) are shuffled. The
    previous design shuffled every posting row (54M rows at 10M turns)
    and spent 30s/task in JVM sort+Arrow against a 2s/task Python kernel.
  * bucket = xxhash64(term) % num_buckets → query-time partition pruning;
    final layout is one sorted file per bucket (row-group min/max prune
    term lookups and prefix ranges).
  * skew: head-term bytes spread naturally across per-split runs
    (salt = split_id % num_salts tags them); reducers only re-sort and
    write block rows, so no reducer ever holds a whole head-term list
    in decoded form.
  * every stage commits counters+lineage to the manifest; a resumed build
    skips completed stages, and doc_ids are stable across restarts because
    they derive from the persisted docs stage (docids.py).
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

from .udfs import make_analyze_udf
from .docids import doc_id_expr, partition_offsets, with_partition_ordinals
from .postings import BLOCK_SIZE

DEFAULT_NUM_BUCKETS = 32
DEFAULT_SALT_THRESHOLD = 100_000
DEFAULT_NUM_SALTS = 16

# Multi-field indexing: token i of field f gets position f*FIELD_OFFSET + i
# (the SQLite-FTS5-equivalent of per-column position lists: phrases and
# NEAR groups can never span fields because the gap dwarfs any distance,
# per-field term frequencies fall out of position >> FIELD_SHIFT, and the
# posting format / row-level df stay exactly as in the single-field case).
# Fields longer than FIELD_OFFSET tokens are truncated (1M tokens/field).
FIELD_SHIFT = 20
FIELD_OFFSET = 1 << FIELD_SHIFT


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
    # crash recovery for an interrupted in-place compaction: the swap is
    # two directory renames (see streaming.compact_in_place) and a kill
    # between them leaves the index parked at <dir>.pre_compact with
    # nothing at <dir>. Restore the pre-compaction index — compaction is
    # idempotent (a pure rewrite of base+segments−tombstones), so the
    # old state is fully valid and the next trigger redoes the work.
    parked = out_dir.rstrip("/") + ".pre_compact"
    if not os.path.isdir(out_dir) and os.path.exists(_manifest_path(parked)):
        try:
            os.replace(parked, out_dir)
        except FileNotFoundError:
            # a concurrent reader won the recovery rename (or a live
            # compaction finished its swap between our existence check
            # and the rename) — the index dir is valid either way
            pass
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


def parquet_row_count(path: str) -> int:
    """Row count from parquet footers only (no Spark job, no data scan)."""
    import pyarrow.dataset as ds
    return ds.dataset(path, format="parquet").count_rows()


def load_docs(spark: SparkSession, out_dir: str,
              manifest: dict | None = None) -> DataFrame:
    """Docs table with the doc_id column materialized as a Catalyst
    expression over the staged (_pid, _ord) ordinals (see docids.py).
    Preserved-id builds (segment merges) store doc_id directly."""
    docs = spark.read.parquet(os.path.join(out_dir, "docs"))
    if "doc_id" in docs.columns:
        return docs
    manifest = manifest or load_manifest(out_dir)
    offsets = {int(k): int(v) for k, v in
               manifest["stages"]["docs"]["counters"]["doc_offsets"].items()}
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


def _runs_kernel_factory(avgdl: float, block_size: int, num_salts: int,
                         multi_field: bool = False):
    """mapInArrow over docs splits → per-split posting runs in FINAL block
    format (Lucene-flush shape).

    Each split (a contiguous doc_id range, because docs files are written
    in sorted order) aggregates term → (doc_ids, tfs, doc_lens, per-doc
    position varint records) in one Python pass per batch, then emits
    ≤block_size-doc block rows via the vectorized group encoder. Only
    these block rows (≈ vocab × splits) are ever shuffled.

    salt = split_id % num_salts tags runs so a head term's blocks carry a
    distributed key without needing any df statistics; blocks stay
    doc_id-sorted within (term, salt) because splits are doc-ordered.
    """
    import pyarrow as pa
    from pyspark import TaskContext

    from .postings import encode_posting_batch

    out_schema = pa.schema([
        ("term", pa.string()), ("salt", pa.int32()),
        ("block_id", pa.int32()), ("min_doc", pa.int64()),
        ("max_doc", pa.int64()), ("n_docs", pa.int32()),
        ("block_max_norm", pa.float64()), ("data", pa.binary()),
        ("tf_sum", pa.int64()),
    ])

    def runs_kernel(batches):
        # round 7: fully vectorized — tokens are dictionary-encoded to
        # int codes, (term, doc) groups come from ONE lexsort (stable,
        # so positions stay ascending within a group), and the whole
        # batch's blocks are varint-encoded in a single pass
        # (postings.encode_posting_batch). No per-token or per-doc
        # Python loops anywhere. Output rows are identical to the old
        # per-token kernel (pinned by test_build_kernel_equivalence).
        ctx = TaskContext.get()
        salt = (ctx.partitionId() if ctx is not None else 0) % num_salts
        batch_ord = 0
        for batch in batches:
            n = batch.num_rows
            if n == 0:
                batch_ord += 1
                continue
            doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            dls = batch.column("doc_len").to_numpy(zero_copy_only=False)
            tok_arr = batch.column("tokens")
            counts = tok_arr.value_lengths().fill_null(0) \
                .to_numpy(zero_copy_only=False).astype(np.int64)
            flat = tok_arr.flatten()
            if flat.null_count or len(flat) == 0:
                # analyzer output is never null; fall back defensively
                flat = flat.fill_null("") if len(flat) else flat
            if int(counts.sum()) == 0:
                batch_ord += 1
                continue
            denc = flat.dictionary_encode()
            codes = denc.indices.to_numpy(zero_copy_only=False) \
                .astype(np.int64)
            vocab = denc.dictionary
            tok_doc = np.repeat(np.arange(n, dtype=np.int64), counts)
            doc_starts = np.concatenate(([0], np.cumsum(counts)))[:-1]
            in_doc = np.arange(codes.size, dtype=np.int64) \
                - np.repeat(doc_starts, counts)
            if multi_field:
                # positions restart per field at f*FIELD_OFFSET; tokens
                # beyond FIELD_OFFSET within one field are dropped (the
                # documented truncation)
                fl_arr = batch.column("field_lens")
                fl = fl_arr.flatten().to_numpy(zero_copy_only=False) \
                    .astype(np.int64)
                nfields = fl.size // n
                seg_field = np.tile(np.arange(nfields, dtype=np.int64), n)
                seg_starts = np.concatenate(([0], np.cumsum(fl)))[:-1]
                tok_field = np.repeat(seg_field, fl)
                jj = np.arange(codes.size, dtype=np.int64) \
                    - np.repeat(seg_starts, fl)
                pos = tok_field * FIELD_OFFSET + jj
                keep = jj < FIELD_OFFSET
                if not keep.all():
                    codes, tok_doc, pos = codes[keep], tok_doc[keep], \
                        pos[keep]
            else:
                pos = in_doc

            order = np.lexsort((pos, doc_ids[tok_doc], codes))
            c_s = codes[order]
            did_s = doc_ids[tok_doc][order]
            pos_s = pos[order]
            dl_s = dls[tok_doc][order]
            g_new = np.empty(c_s.size, dtype=bool)
            g_new[0] = True
            g_new[1:] = (c_s[1:] != c_s[:-1]) | (did_s[1:] != did_s[:-1])
            g_start = np.flatnonzero(g_new)
            g_tf = np.diff(np.append(g_start, c_s.size))
            # per-group position deltas (first absolute)
            pdeltas = pos_s.copy()
            pdeltas[1:] -= pos_s[:-1]
            pdeltas[g_start] = pos_s[g_start]

            (b_code, b_ord, min_doc, max_doc, b_ndocs, b_max, tf_sum,
             d_offs, d_buf) = encode_posting_batch(
                c_s[g_start], did_s[g_start], g_tf, dl_s[g_start],
                pdeltas, block_size, avgdl)
            B = b_code.size
            if B == 0:
                batch_ord += 1
                continue
            data_col = pa.Array.from_buffers(
                pa.binary(), B,
                [None, pa.py_buffer(d_offs.astype(np.int32)),
                 pa.py_buffer(d_buf)])
            yield pa.record_batch(
                [vocab.take(pa.array(b_code)),
                 pa.array(np.full(B, salt, dtype=np.int32)),
                 pa.array((batch_ord * 4096 + b_ord).astype(np.int32)),
                 pa.array(min_doc.astype(np.int64)),
                 pa.array(max_doc.astype(np.int64)),
                 pa.array(b_ndocs.astype(np.int32)),
                 pa.array(b_max.astype(np.float64)),
                 data_col,
                 pa.array(tf_sum.astype(np.int64))],
                schema=out_schema)
            batch_ord += 1

    return runs_kernel


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
    language: str = "english",
    fields: list[str] | None = None,
    doc_id_base: int = 0,
    preserve_doc_ids: bool = False,
    resume: bool = True,
) -> dict:
    """Build the full index; returns the manifest. Resumable per stage.

    ``fields`` selects the indexed text columns (default ["text"]). With
    several fields the index keeps ONE posting list per (term, doc) with
    per-field position offsets (FIELD_OFFSET) — the Spark equivalent of
    FTS5 multi-column tables (reference: src/Storage/SqliteStorage.php:
    259-285,993-1021; per-field boosts src/Index/Indexer.php:35-44).
    doc_len is the total token count across fields (FTS5's D), so
    per-field BM25 weights at query time are float-exact vs
    ``bm25(fts, w1, w2, …)``.

    ``doc_id_base`` shifts the whole doc_id space (docs AND posting
    blobs AND block min/max metadata) — used by streaming segments so a
    segment's ids never collide with the base index
    (reference upsert model: src/Storage/SqliteStorage.php:359-763).

    ``preserve_doc_ids``: the transcripts carry their own ``doc_id``
    column which is stored verbatim (no reassignment) — used by tiered
    segment merges so callers' doc_ids and tombstones survive the merge.
    Docs are range-partitioned and sorted by doc_id so each split stays
    an ascending id run for the posting kernel."""
    fields = list(fields or ["text"])
    os.makedirs(out_dir, exist_ok=True)
    manifest = load_manifest(out_dir) if resume else {"stages": {}, "lineage": {}, "config": {}}
    manifest["config"] = {
        "num_buckets": num_buckets, "block_size": block_size,
        "salt_threshold": salt_threshold, "num_salts": num_salts,
        "language": language, "fields": fields,
    }
    manifest["doc_id_base"] = doc_id_base
    manifest["lineage"] = {"input_path": input_path or "<dataframe>"}
    if shuffle_partitions is None:
        shuffle_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    docs_path = os.path.join(out_dir, "docs")
    ts_path = os.path.join(out_dir, "term_stats")
    gs_path = os.path.join(out_dir, "global_stats")
    post_path = os.path.join(out_dir, "postings")

    # -- stage 1: docs (sort + analysis in ONE data pass; doc_id becomes a
    # Catalyst expression over the staged (_pid, _ord) columns) -------------
    if not _stage_done(manifest, "docs"):
        t0 = time.time()
        if preserve_doc_ids:
            assert "doc_id" in transcripts.columns, \
                "preserve_doc_ids needs a doc_id column"
            # ascending-id runs per split for the posting kernel; ids are
            # stored verbatim, never reassigned
            staged = (transcripts
                      .repartitionByRange(shuffle_partitions, "doc_id")
                      .sortWithinPartitions("doc_id"))
        else:
            staged = with_partition_ordinals(transcripts,
                                             ["conv_id", "turn_idx"],
                                             shuffle_partitions)
        if preserve_doc_ids and "tokens" in staged.columns:
            # segment-merge input: rows come from existing part docs whose
            # tokens were produced by the SAME analyzer config (merge
            # inherits the base config) — skip re-analysis
            docs = staged
        elif len(fields) == 1:
            analyze_udf = make_analyze_udf(language)
            docs = (
                staged
                .withColumn("tokens", analyze_udf(F.col(fields[0])))
                .withColumn("doc_len", F.size("tokens"))
            )
        else:
            analyze_udf = make_analyze_udf(language)
            tok_cols = [f"_tok{i}" for i in range(len(fields))]
            docs = staged
            for c, f in zip(tok_cols, fields):
                docs = docs.withColumn(
                    c, analyze_udf(F.coalesce(F.col(f), F.lit(""))))
            docs = (docs
                    .withColumn("tokens", F.concat(*tok_cols))
                    .withColumn("field_lens",
                                F.array(*[F.size(c) for c in tok_cols]))
                    .withColumn("doc_len", F.size("tokens"))
                    .drop(*tok_cols))
        # round 7 (guide §1.4/§2.3): global stats ride the docs WRITE as
        # observed metrics — the old stats stage re-read the docs table
        # for a full aggregation pass
        obs = None
        if "doc_len" in docs.columns:
            from pyspark.sql import Observation
            obs = Observation()
            docs = docs.observe(obs,
                                F.count(F.lit(1)).alias("n_docs"),
                                F.avg("doc_len").alias("avgdl"),
                                F.sum("doc_len").alias("total_tokens"))
        docs.write.mode("overwrite").parquet(docs_path)
        if obs is not None and not _stage_done(manifest, "stats"):
            g = obs.get
            gs_df = spark.createDataFrame(
                [(int(g["n_docs"]),
                  float(g["avgdl"]) if g["avgdl"] is not None else None,
                  int(g["total_tokens"]) if g["total_tokens"] is not None
                  else 0)],
                "n_docs bigint, avgdl double, total_tokens bigint")
            gs_df.write.mode("overwrite").parquet(gs_path)
            _commit_stage(out_dir, manifest, "stats",
                          {"n_docs": int(g["n_docs"]),
                           "avgdl": float(g["avgdl"] or 0.0)}, 0.0)
        if preserve_doc_ids:
            _commit_stage(out_dir, manifest, "docs",
                          {"docs": parquet_row_count(docs_path),
                           "doc_ids": "stored"},
                          time.time() - t0)
        else:
            offsets, n_docs = partition_offsets(spark.read.parquet(docs_path))
            # the shifted offsets are the single source of truth: every
            # doc_id downstream (docs view, posting blobs, block min/max)
            # derives from them, so segment and base id spaces can never
            # disagree
            offsets = {k: v + doc_id_base for k, v in offsets.items()}
            _commit_stage(out_dir, manifest, "docs",
                          {"docs": n_docs,
                           "doc_offsets": {str(k): v
                                           for k, v in offsets.items()}},
                          time.time() - t0)

    docs_df = load_docs(spark, out_dir, manifest)

    # -- stage 2: global stats (needs only docs; avgdl feeds the
    # map-side block_max computation) ---------------------------------------
    if not _stage_done(manifest, "stats"):
        t0 = time.time()
        gs = docs_df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("doc_len").alias("avgdl"),
            F.sum("doc_len").alias("total_tokens"),
        )
        gs.write.mode("overwrite").parquet(gs_path)
        row = spark.read.parquet(gs_path).collect()[0]
        _commit_stage(out_dir, manifest, "stats",
                      {"n_docs": int(row["n_docs"]),
                       "avgdl": float(row["avgdl"] or 0.0)},
                      time.time() - t0)

    gs_row = spark.read.parquet(gs_path).collect()[0]
    avgdl = float(gs_row["avgdl"] or 1.0)

    # -- stage 3: posting runs (map-side block construction) -----------------
    # Lucene-flush shape: each docs split builds its own ≤block_size posting
    # blocks locally in final binary format; only block-level rows (≈ vocab ×
    # splits, thousands) ever cross the shuffle. This replaced a 54M-row
    # repartition+sort+Arrow pipeline whose JVM side measured 30s/task
    # against a 2s/task Python kernel. Skew: salt = split_id % num_salts
    # spreads every head term's runs across reducers with no df statistics
    # needed (runs stay doc_id-sorted within each salt).
    if not _stage_done(manifest, "postings"):
        t0 = time.time()
        prev_batch = spark.conf.get(
            "spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "131072")
        # size file splits to the parallelism target: the default 128MB
        # maxPartitionBytes capped this stage at ~6 tasks for a 750MB docs
        # table regardless of cores (splits stay contiguous doc_id ranges,
        # which the run encoder requires)
        docs_bytes = sum(
            os.path.getsize(os.path.join(docs_path, f))
            for f in os.listdir(docs_path) if f.endswith(".parquet"))
        split_bytes = max(8 * 1024 * 1024,
                          docs_bytes // (shuffle_partitions * 2) + 1)
        prev_split = spark.conf.get("spark.sql.files.maxPartitionBytes",
                                    "134217728")
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split_bytes))
        docs_for_runs = load_docs(spark, out_dir, manifest)
        runs_schema = StructType(
            [f for f in _ENCODED_SCHEMA.fields if f.name != "bucket"]
        ).add(StructField("tf_sum", LongType(), False))
        multi = len(fields) > 1
        run_cols = ["doc_id", "doc_len", "tokens"] + (
            ["field_lens"] if multi else [])
        runs = (docs_for_runs.select(*run_cols)
                .mapInArrow(_runs_kernel_factory(avgdl, block_size, num_salts,
                                                 multi_field=multi),
                            schema=runs_schema)
                # bucket via the SAME Catalyst xxhash64 the query side uses
                .withColumn("bucket",
                            F.pmod(F.xxhash64("term"),
                                   F.lit(num_buckets)).cast("int")))
        # round 7: per-bucket lineage counters ride the postings WRITE
        # as observed conditional sums — the old read-back job re-read
        # the whole postings table (including the data bytes) just to
        # aggregate 32 rows
        from pyspark.sql import Observation
        obs_pb = Observation()
        pb_aggs = []
        for b in range(num_buckets):
            cond = F.col("bucket") == b
            pb_aggs += [
                F.count(F.when(cond, 1)).alias(f"blk_{b}"),
                F.sum(F.when(cond, F.col("n_docs"))).alias(f"post_{b}"),
                F.sum(F.when(cond, F.length("data"))).alias(f"byte_{b}")]
        runs = runs.observe(obs_pb, *pb_aggs)
        (runs.repartition(num_buckets, "bucket")
             .sortWithinPartitions("term", "salt", "min_doc")
             .write.mode("overwrite").partitionBy("bucket").parquet(post_path))
        pb = obs_pb.get
        _commit_stage(out_dir, manifest, "postings",
                      {"per_bucket": {str(b): {
                          "blocks": int(pb[f"blk_{b}"]),
                          "postings": int(pb[f"post_{b}"] or 0),
                          "bytes": int(pb[f"byte_{b}"] or 0)}
                          for b in range(num_buckets)
                          if int(pb[f"blk_{b}"]) > 0}},
                      time.time() - t0)
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev_batch)
        spark.conf.set("spark.sql.files.maxPartitionBytes", prev_split)

    # -- stage 4: term stats (free aggregate of the posting runs) ------------
    if not _stage_done(manifest, "term_stats"):
        t0 = time.time()
        post_df = spark.read.parquet(post_path)
        term_stats = (post_df.groupBy("bucket", "term")
                      .agg(F.sum("n_docs").cast("long").alias("df"),
                           F.sum("tf_sum").cast("long").alias("cf")))
        term_stats.write.mode("overwrite").parquet(ts_path)
        _commit_stage(out_dir, manifest, "term_stats",
                      {"vocab": parquet_row_count(ts_path)}, time.time() - t0)

    return load_manifest(out_dir)
