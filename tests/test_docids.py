"""doc_id assignment invariants at a scale where AQE re-planning bit us
(duplicate doc_ids at 50k rows before sorted-parent persist)."""

from pyspark.sql import functions as F

from yetisearch_spark.corpus import generate_transcripts
from yetisearch_spark.docids import assign_doc_ids


def test_doc_ids_dense_unique_ordered(spark):
    pdf = generate_transcripts(50_000, seed=99)
    df = spark.createDataFrame(pdf)
    with_ids = assign_doc_ids(df, ["conv_id", "turn_idx"], num_partitions=32)
    n = df.count()
    stats = with_ids.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("doc_id").alias("nd"),
        F.min("doc_id").alias("mn"),
        F.max("doc_id").alias("mx"),
    ).collect()[0]
    assert stats["n"] == n
    assert stats["nd"] == n, "doc_ids must be unique"
    assert stats["mn"] == 0 and stats["mx"] == n - 1, "doc_ids must be dense"

    # order parity: doc_id ordering == (conv_id, turn_idx) ordering
    sample = (with_ids.orderBy("doc_id").limit(2000)
              .select("doc_id", "conv_id", "turn_idx").collect())
    keys = [(r["conv_id"], r["turn_idx"]) for r in sample]
    assert keys == sorted(keys)
    parent = getattr(with_ids, "_ys_persisted_parent", None)
    if parent is not None:
        parent.unpersist()
