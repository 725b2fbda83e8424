"""Stable dense doc_id assignment without a single-partition global sort.

The reference keys documents by SQLite rowid (``doc_id INTEGER PK``,
reference: src/Storage/SqliteStorage.php:201-212) assigned in insert
order. Our document identity is (conv_id, turn_idx) under stable
ordering; doc_id = dense 0-based rank over ``ORDER BY conv_id,
turn_idx``.

Scale notes (the reason this isn't ``row_number() OVER (ORDER BY …)``):
a partitionless window collapses to ONE partition. Instead we use the
TeraSort shape — range-repartition + sortWithinPartitions — then a
two-job count/offset pass over the *same* shuffled DataFrame (Spark
reuses the shuffle files, so both jobs observe identical partitioning):

  1. per-partition row counts → driver (P integers) → exclusive prefix sum
  2. mapInPandas adds doc_id = offset[partition] + local ordinal

Determinism across *re-runs* is provided one level up: the build
persists ``doc_stats`` (doc_id ↔ conv_id/turn_idx) as its first
committed artifact, and a resumed build reloads that mapping instead of
recomputing (see build.py), so sampled range boundaries never have to
be reproducible.
"""

from __future__ import annotations

from pyspark import TaskContext
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def assign_doc_ids(df: DataFrame, order_cols: list[str] | None = None,
                   num_partitions: int | None = None) -> DataFrame:
    """Returns df + ``doc_id`` (long), densely numbered in order_cols order."""
    order_cols = order_cols or ["conv_id", "turn_idx"]
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))

    sorted_df = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
          .sortWithinPartitions(*order_cols)
    )
    # Materialize before the two passes: range boundaries are sampled and
    # AQE may re-plan per action, so an un-persisted plan can present
    # DIFFERENT partitionings to the count job and the assignment job
    # (observed: duplicate doc_ids at 50k rows). The cache pins one
    # physical partitioning for both. The caller should unpersist after
    # materializing the result (build_index does, right after the docs
    # stage write).
    sorted_df = sorted_df.persist()

    counts = (
        sorted_df.select(F.spark_partition_id().alias("pid"))
                 .groupBy("pid").count().collect()
    )
    by_pid = {r["pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    running = 0
    for pid in sorted(by_pid):
        offsets[pid] = running
        running += by_pid[pid]
    bc_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = StructType(sorted_df.schema.fields + [StructField("doc_id", LongType(), False)])

    def add_ids(batches):
        pid = TaskContext.get().partitionId()
        base = bc_offsets.value.get(pid, 0)
        seen = 0
        for pdf in batches:
            pdf = pdf.copy()
            pdf["doc_id"] = range(base + seen, base + seen + len(pdf))
            seen += len(pdf)
            yield pdf

    out = sorted_df.mapInPandas(add_ids, schema=out_schema)
    # expose the persisted parent so callers can release it post-write
    out._ys_persisted_parent = sorted_df  # type: ignore[attr-defined]
    return out
