"""Stable dense doc_id assignment without a single-partition global sort.

The reference keys documents by SQLite rowid (``doc_id INTEGER PK``,
reference: src/Storage/SqliteStorage.php:201-212) assigned in insert
order. Our document identity is (conv_id, turn_idx) under stable
ordering; doc_id = dense 0-based rank over ``ORDER BY conv_id,
turn_idx``.

Scale design (and why this isn't ``row_number() OVER (ORDER BY …)`` —
a partitionless window collapses to ONE partition):

  1. ONE data pass: TeraSort shape (range-repartition +
     sortWithinPartitions), then two JVM-side columns:
     ``_pid = spark_partition_id()`` and ``_ord`` extracted from
     ``monotonically_increasing_id()`` (which is pid<<33 | ordinal, so
     ``_ord = mid - (pid << 33)`` — the per-partition row ordinal with
     zero Python). The caller persists this stage to Parquet.
  2. A metadata-only pass over the persisted file computes per-partition
     counts → exclusive prefix offsets (P integers, committed to the
     manifest).
  3. ``doc_id`` is thereafter a pure Catalyst expression
     (offset[_pid] + _ord) — no extra shuffle, no cached RDD, and
     resume-stable because the staged Parquet is the source of truth
     (range-boundary sampling never has to be reproducible across runs).

This replaces an earlier two-job design whose count and assignment jobs
could observe different physical partitionings under AQE (duplicate
doc_ids at 50k rows).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def with_partition_ordinals(df: DataFrame, order_cols: list[str] | None = None,
                            num_partitions: int | None = None) -> DataFrame:
    """df + (_pid int, _ord long), globally ordered by (order_cols):
    partition ranges ascend with _pid, rows sorted within."""
    order_cols = order_cols or ["conv_id", "turn_idx"]
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
    sorted_df = (
        df.repartitionByRange(num_partitions, *[F.col(c) for c in order_cols])
          .sortWithinPartitions(*order_cols)
    )
    pid = F.spark_partition_id()
    mid = F.monotonically_increasing_id()
    return (sorted_df
            .withColumn("_pid", pid)
            .withColumn("_ord", mid - F.shiftleft(pid.cast("long"), 33)))


def partition_offsets(staged: DataFrame) -> tuple[dict[int, int], int]:
    """(exclusive prefix-sum of per-partition counts keyed by _pid, total).

    _pid order == global (order_cols) order because range partitioning
    assigns ascending key ranges to ascending partition ids."""
    counts = staged.groupBy("_pid").count().collect()
    by_pid = {int(r["_pid"]): int(r["count"]) for r in counts}
    offsets: dict[int, int] = {}
    running = 0
    for p in sorted(by_pid):
        offsets[p] = running
        running += by_pid[p]
    return offsets, running


def doc_id_expr(offsets: dict[int, int]) -> Column:
    """doc_id = offsets[_pid] + _ord as a Catalyst expression (a chained
    CASE over P partition ids — P is small, whole-stage codegen inlines it)."""
    expr = None
    for p, off in sorted(offsets.items()):
        cond = F.col("_pid") == p
        expr = F.when(cond, F.lit(off)) if expr is None else expr.when(cond, F.lit(off))
    if expr is None:
        expr = F.lit(0)
    return (expr + F.col("_ord")).cast("long")


def assign_doc_ids(df: DataFrame, order_cols: list[str] | None = None,
                   num_partitions: int | None = None) -> DataFrame:
    """Convenience one-shot (test/ad-hoc) path: returns df + doc_id.

    Runs the staged scheme in-memory: one pass to stage (persisted),
    metadata pass for offsets, then the doc_id expression. Production
    builds go through build_index which persists the stage to Parquet
    instead (resume checkpoint)."""
    staged = with_partition_ordinals(df, order_cols, num_partitions).persist()
    offsets, _ = partition_offsets(staged)
    out = staged.withColumn("doc_id", doc_id_expr(offsets)).drop("_pid", "_ord")
    out._ys_persisted_parent = staged  # type: ignore[attr-defined]
    return out
