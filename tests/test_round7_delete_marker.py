"""Round 7 (advice r6 #3): a delete batch that crashes between its
tombstone append and its delta append must be healed by the next
mutation — the per-batch victim marker replays the delta write, so
per-term df/cf deltas stay exact instead of permanently over-counting
until compaction."""

import os

from pyspark.sql import functions as F

from yetisearch_spark.build import build_index, load_docs
from yetisearch_spark.corpus import generate_transcripts
from yetisearch_spark.streaming import delete_docs, load_deleted_df


def _expected_deltas(spark, idx_dir, doc_ids):
    rows = (load_docs(spark, idx_dir)
            .where(F.col("doc_id").isin(doc_ids))
            .select("doc_id", F.explode("tokens").alias("term"))
            .groupBy("term")
            .agg(F.countDistinct("doc_id").alias("df"),
                 F.count(F.lit(1)).alias("cf")).collect())
    return {r["term"]: (int(r["df"]), int(r["cf"])) for r in rows}


def test_crashed_delete_batch_heals_on_next_mutation(spark, tmp_path):
    idx = str(tmp_path / "dm_idx")
    pdf = generate_transcripts(300, seed=21)
    build_index(spark, pdf if not hasattr(pdf, "to_dict") else
                spark.createDataFrame(pdf), idx, num_buckets=4)

    # simulate the crash window of an OLD delete of docs {3, 7}: marker
    # written, tombstones appended, deltas NEVER written
    victims = spark.createDataFrame([(3,), (7,)], "doc_id long")
    victims.write.parquet(os.path.join(idx, "deleted_df_pending", "oldbatch"))
    victims.write.mode("append").parquet(os.path.join(idx, "tombstones"))
    assert load_deleted_df(spark, idx) is None   # the gap is real

    # next mutation (a fresh delete) must replay the crashed batch
    delete_docs(spark, idx, [11])

    got_rows = (spark.read.option("mergeSchema", "true")
                .parquet(os.path.join(idx, "deleted_df"))
                .groupBy("term").agg(F.sum("df").alias("df"),
                                     F.sum("cf").alias("cf")).collect())
    got = {r["term"]: (int(r["df"]), int(r["cf"])) for r in got_rows}
    want = _expected_deltas(spark, idx, [3, 7, 11])
    assert got == want
    # marker consumed
    assert not os.path.isdir(os.path.join(idx, "deleted_df_pending",
                                          "oldbatch"))


def test_replay_skips_committed_batches(spark, tmp_path):
    """A marker whose deltas DID land (crash after the delta append,
    before marker cleanup) must not double-subtract."""
    idx = str(tmp_path / "dm2_idx")
    pdf = generate_transcripts(300, seed=22)
    build_index(spark, spark.createDataFrame(pdf), idx, num_buckets=4)
    delete_docs(spark, idx, [5])
    want = _expected_deltas(spark, idx, [5, 9])
    # resurrect doc 5's marker as if cleanup never ran; its deltas exist
    dd = spark.read.option("mergeSchema", "true").parquet(
        os.path.join(idx, "deleted_df"))
    bid = dd.select("batch").first()["batch"]
    spark.createDataFrame([(5,)], "doc_id long").write.parquet(
        os.path.join(idx, "deleted_df_pending", bid))

    delete_docs(spark, idx, [9])
    got_rows = (spark.read.option("mergeSchema", "true")
                .parquet(os.path.join(idx, "deleted_df"))
                .groupBy("term").agg(F.sum("df").alias("df"),
                                     F.sum("cf").alias("cf")).collect())
    got = {r["term"]: (int(r["df"]), int(r["cf"])) for r in got_rows}
    assert got == want
