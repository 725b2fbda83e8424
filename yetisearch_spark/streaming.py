"""Incremental / streaming index maintenance.

The reference is a batch library with no streaming subsystem (SURVEY
§2.15) — its incremental story is per-document upsert/delete inside
SQLite transactions (reference: src/Storage/SqliteStorage.php:359-763)
plus FTS5 'optimize' compaction (:1383-1395). The Spark-native
equivalents:

  * StructuredStreaming ingestion: ``readStream`` over a transcript
    source → ``foreachBatch`` appending per-epoch index *segments*
    (same layout as the main index, under segments/epoch=N/), exactly
    the Lucene/FTS5 segment model.
  * segment-aware querying: a SearchIndex view that unions base +
    segment postings (term stats re-aggregated on the fly).
  * compaction (S9 'optimize'): merge segments back into the base
    index — one build-shaped job.
  * deletes (S5): a tombstone table anti-joined at query time, applied
    physically at compaction.

Epoch doc_ids are allocated above a high-water mark recorded in the
manifest, so segment builds never collide with base ids.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import build_index, load_manifest
from .query import SearchIndex


def segment_dir(index_dir: str, epoch: int) -> str:
    return os.path.join(index_dir, "segments", f"epoch={epoch}")


def list_segments(index_dir: str) -> list[int]:
    root = os.path.join(index_dir, "segments")
    if not os.path.isdir(root):
        return []
    out = []
    for name in os.listdir(root):
        if name.startswith("epoch="):
            if os.path.exists(os.path.join(root, name, "manifest.json")):
                out.append(int(name.split("=", 1)[1]))
    return sorted(out)


def _doc_count(manifest: dict) -> int:
    return int(manifest["stages"]["docs"]["counters"]["docs"])


def index_epoch(index_dir: str) -> int:
    """Monotonic mutation counter in the base manifest — the serving-side
    invalidation signal (reference invalidates its query cache on
    insert/delete: src/Storage/SqliteStorage.php:364-367,708-711)."""
    return int(load_manifest(index_dir).get("epoch", 0))


def bump_epoch(index_dir: str) -> int:
    """Increment the index epoch after any mutation (segment append,
    tombstone write). Engines compare epochs per search and drop their
    result caches / re-resolve segments when it moves."""
    import json

    manifest = load_manifest(index_dir)
    manifest["epoch"] = int(manifest.get("epoch", 0)) + 1
    p = os.path.join(index_dir, "manifest.json")
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, indent=2)
    os.replace(tmp, p)
    return manifest["epoch"]


def high_water_doc_id(index_dir: str) -> int:
    """Base docs + all committed segment docs (dense id allocation)."""
    total = _doc_count(load_manifest(index_dir))
    for ep in list_segments(index_dir):
        total += _doc_count(load_manifest(segment_dir(index_dir, ep)))
    return total


#: default auto-compaction trigger: compact when a mutated index
#: accumulates this many segments (query scan width and serving-view
#: construction cost grow linearly in segment count; the reference's
#: `optimize` is manual — src/Storage/SqliteStorage.php:1383-1395 — so
#: any automatic policy is parity-plus). Override per append via
#: ``auto_compact_segments`` (None disables, matching reference parity).
AUTO_COMPACT_SEGMENTS = 16


def append_segment(spark: SparkSession, index_dir: str,
                   transcripts: DataFrame, epoch: int,
                   auto_compact_segments: int | None = AUTO_COMPACT_SEGMENTS,
                   **build_kwargs) -> dict:
    """Build one incremental segment (a full mini-index) whose doc_ids
    start at the current high-water mark. When the committed segment
    count reaches ``auto_compact_segments`` the index is compacted in
    place (S9 'optimize' with a lifecycle trigger): serving stays
    score-identical (the 1e-9 segment-serving guarantee) and per-term df
    residue from tombstoned docs is flushed."""
    base = high_water_doc_id(index_dir)
    seg = segment_dir(index_dir, epoch)
    cfg = load_manifest(index_dir).get("config", {})
    kwargs = {"num_buckets": cfg.get("num_buckets", 32),
              "block_size": cfg.get("block_size", 128),
              "salt_threshold": cfg.get("salt_threshold", 100_000),
              "num_salts": cfg.get("num_salts", 16),
              "language": cfg.get("language", "english"),
              "fields": cfg.get("fields", ["text"])}
    kwargs.update(build_kwargs)
    # doc_id_base threads the shift through the build itself, so posting
    # blobs, block min/max metadata and the docs view all live in the same
    # (shifted) id space — tombstones and search hits are interchangeable
    manifest = build_index(spark, transcripts, seg, doc_id_base=base,
                           input_path=f"<stream epoch {epoch}>", **kwargs)
    bump_epoch(index_dir)
    if (auto_compact_segments is not None
            and len(list_segments(index_dir)) >= auto_compact_segments):
        compact_in_place(spark, index_dir)
    return manifest


def streaming_index_writer(spark: SparkSession, index_dir: str,
                           **build_kwargs):
    """foreachBatch sink: each micro-batch becomes one segment.

    Usage:
        q = (stream_df.writeStream
             .foreachBatch(streaming_index_writer(spark, idx_dir))
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
    """

    def write_batch(batch_df: DataFrame, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        append_segment(spark, index_dir, batch_df, int(epoch_id),
                       **build_kwargs)

    return write_batch


# ---------------------------------------------------------------------------
# tombstones (S5 delete semantics)
# ---------------------------------------------------------------------------

def tombstone_path(index_dir: str) -> str:
    return os.path.join(index_dir, "tombstones")


def deleted_df_path(index_dir: str) -> str:
    return os.path.join(index_dir, "deleted_df")


def load_deleted_df(spark: SparkSession, index_dir: str) -> DataFrame | None:
    p = deleted_df_path(index_dir)
    if not os.path.isdir(p):
        return None
    return spark.read.parquet(p)


def _record_tombstones(spark: SparkSession, index_dir: str,
                       victims: DataFrame) -> int:
    """Central S5 delete bookkeeping (round-5): dedupe the victim set
    against existing tombstones, record per-term deleted-df/cf DELTAS
    (one job bounded by the victims' own token counts — their tokens are
    in the docs store, so no posting decode), append the tombstone rows,
    bump the epoch. Serving subtracts the deltas from merged term stats,
    making segmented df/idf EXACT under deletes (scores identical to the
    compacted index at 1e-9 — the round-4 <25% drift bound is retired).
    Returns the number of NEWLY tombstoned docs."""
    victims = victims.select("doc_id").dropDuplicates()
    existing = load_tombstones(spark, index_dir)
    if existing is not None:
        # double-deletes must not double-subtract the deltas
        victims = victims.join(existing, "doc_id", "left_anti")
    victims = victims.persist()
    try:
        n_new = victims.count()
        if n_new == 0:
            return 0
        seg = SegmentedIndex(spark, index_dir)
        try:
            deltas = (seg.docs().join(victims, "doc_id", "left_semi")
                      .select("doc_id", F.explode("tokens").alias("term"))
                      .groupBy("term")
                      .agg(F.countDistinct("doc_id").cast("long").alias("df"),
                           F.count(F.lit(1)).cast("long").alias("cf")))
            deltas.write.mode("append").parquet(deleted_df_path(index_dir))
        finally:
            seg.close()
        victims.write.mode("append").parquet(tombstone_path(index_dir))
        bump_epoch(index_dir)
        return n_new
    finally:
        victims.unpersist()


def delete_docs(spark: SparkSession, index_dir: str, doc_ids: list[int]) -> None:
    """Record deletes; applied as an anti-join at query time and made
    physical at compaction (delete-vector model). Per-term df deltas are
    recorded at delete time so segmented serving stays df-exact."""
    df = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
    _record_tombstones(spark, index_dir, df)


def upsert_documents(spark: SparkSession, index_dir: str,
                     transcripts: DataFrame, epoch: int,
                     **build_kwargs) -> dict:
    """S2/S4 per-document MERGE: tombstone every live doc whose
    (conv_id, turn_idx) identity matches an incoming row, then append the
    batch as a new segment — the delete-vector equivalent of the
    reference's per-id REPLACE upsert (src/Storage/SqliteStorage.php:
    359-763). Returns {"replaced": n, "inserted": m, "manifest": ...}."""
    seg = SegmentedIndex(spark, index_dir)
    keys = transcripts.select("conv_id", "turn_idx").dropDuplicates()
    victims = (seg.docs().join(keys, ["conv_id", "turn_idx"], "left_semi")
               .select("doc_id"))
    n_replaced = _record_tombstones(spark, index_dir, victims)
    manifest = append_segment(spark, index_dir, transcripts, epoch,
                              **build_kwargs)
    return {"replaced": n_replaced,
            "inserted": int(manifest["stages"]["docs"]["counters"]["docs"]),
            "manifest": manifest}


def delete_by_conv_prefix(spark: SparkSession, index_dir: str,
                          prefix: str) -> int:
    """S6 deleteByIdPrefix analog: tombstone every doc whose conv_id starts
    with prefix (reference: src/Storage/SqliteStorage.php:775-856).
    Returns the number of tombstoned docs."""
    from .build import load_docs

    seg = SegmentedIndex(spark, index_dir)
    victims = (seg.docs()
               .where(F.col("conv_id").startswith(prefix))
               .select("doc_id"))
    n = _record_tombstones(spark, index_dir, victims)
    seg.close()
    return n


def load_tombstones(spark: SparkSession, index_dir: str) -> DataFrame | None:
    p = tombstone_path(index_dir)
    if not os.path.isdir(p):
        return None
    return spark.read.parquet(p)


# ---------------------------------------------------------------------------
# segment-aware view + compaction
# ---------------------------------------------------------------------------

class SegmentedIndex:
    """Query view over base + segments (union of docs/postings, term
    stats merged on the fly). For serving-grade latency, compact."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 cache_postings: bool = False, cache_docs: bool = False):
        from .query import SearchIndex

        # caches default OFF: this view backs one-shot maintenance scans
        # (upsert victim lookup, compaction input) — persisting every
        # part's doc store here would leak a full corpus copy into
        # executor storage per compaction cycle (Spark's CacheManager
        # holds cached data even after the Python objects are collected).
        # GlobalSegmentedIndex is the serving view and manages its own
        # pinning.
        self.spark = spark
        self.index_dir = index_dir
        parts = [index_dir] + [segment_dir(index_dir, e)
                               for e in list_segments(index_dir)]
        self._indexes = [SearchIndex(spark, p, cache_postings=cache_postings,
                                     cache_docs=cache_docs) for p in parts]
        self._tomb = load_tombstones(spark, index_dir)

    def close(self) -> None:
        for ix in self._indexes:
            ix.close()

    @property
    def n_docs(self) -> int:
        return sum(ix.n_docs for ix in self._indexes)

    def docs(self) -> DataFrame:
        out = None
        for ix in self._indexes:
            out = ix._docs if out is None else out.unionByName(ix._docs)
        if self._tomb is not None:
            out = out.join(self._tomb, "doc_id", "left_anti")
        return out

    def search(self, query, k: int = 10) -> DataFrame:
        """Per-segment scoring with GLOBAL statistics would require a merged
        stats pass; this view scores per segment and merges by score — the
        documented trade-off of querying before compaction (identical to
        multi-index search, reference J3). Compaction restores exact
        single-index semantics."""
        parts = [ix.search(query, k=k) for ix in self._indexes]
        merged = parts[0]
        for p in parts[1:]:
            merged = merged.unionByName(p)
        if self._tomb is not None:
            merged = merged.join(self._tomb, "doc_id", "left_anti")
        return merged.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


class GlobalSegmentedIndex(SearchIndex):
    """Serving view over base + committed segments minus tombstones with
    EXACT GLOBAL BM25 statistics: one logical SearchIndex whose postings
    and docs relations are the UNION of the parts' parquet relations, so
    df / n_docs / avgdl / phrase-df all compute over the whole corpus —
    an append-only workload scores IDENTICALLY to the compacted index
    (tests assert it to 1e-9). This is strictly stronger than the
    reference's multi-index merge (per-index stats,
    src/Storage/SqliteStorage.php:1574-1628).

    Deletes: tombstoned docs are hidden immediately (docs anti-join +
    match anti-join) and the corpus stats (n_docs, avgdl) are corrected
    by one tiny aggregate at view construction; only their residual
    term-df contributions persist until compaction (their postings are
    inside encoded blocks) — the Lucene delete-vector semantics.

    Construction is file-path based and cheap (no data jobs except the
    optional tombstone-stat correction); Engine rebuilds the view when
    the index epoch moves."""

    def __init__(self, spark: SparkSession, index_dir: str,
                 cache_postings: bool = True, cache_docs: bool = True):
        # deliberately NOT calling SearchIndex.__init__ — the relations
        # come from the union of parts instead of one directory
        from collections import OrderedDict

        from pyspark.sql import functions as F

        from .build import load_docs

        self.spark = spark
        self.index_dir = index_dir
        self.manifest = load_manifest(index_dir)
        cfg = self.manifest.get("config", {})
        self.num_buckets = int(cfg.get("num_buckets", 32))
        self.fields = list(cfg.get("fields", ["text"]))

        part_dirs = [index_dir] + [segment_dir(index_dir, e)
                                   for e in list_segments(index_dir)]
        postings = docs = term_stats = None
        for p in part_dirs:
            m = load_manifest(p)
            pp = spark.read.parquet(os.path.join(p, "postings"))
            postings = pp if postings is None else postings.unionByName(pp)
            dd = load_docs(spark, p, m)
            docs = dd if docs is None else docs.unionByName(dd)
            ts = spark.read.parquet(os.path.join(p, "term_stats"))
            term_stats = ts if term_stats is None \
                else term_stats.unionByName(ts)
        # ONE job for every part's corpus stats (a per-part collect loop
        # ran #segments sequential driver jobs per epoch bump — linear
        # view-construction latency in segment count)
        gs = (spark.read.parquet(*[os.path.join(p, "global_stats")
                                   for p in part_dirs])
              .agg(F.sum("n_docs").alias("n"),
                   F.sum(F.col("avgdl") * F.col("n_docs")).alias("toks"))
              .collect()[0])
        n_docs = int(gs["n"] or 0)
        tok_total = float(gs["toks"] or 0.0)

        self._tomb = load_tombstones(spark, index_dir)
        if self._tomb is not None:
            # correct the corpus stats for hidden docs (ONE tiny agg at
            # construction; FTS5 updates its stats on delete too)
            row = (docs.join(self._tomb, "doc_id", "left_semi")
                   .agg(F.count(F.lit(1)).alias("n"),
                        F.sum("doc_len").alias("toks")).collect()[0])
            n_docs -= int(row["n"])
            tok_total -= float(row["toks"] or 0.0)
            docs = docs.join(self._tomb, "doc_id", "left_anti")

        self.n_docs = n_docs
        self.avgdl = (tok_total / n_docs) if n_docs else 1.0
        self._postings = postings
        self._term_stats = (term_stats.groupBy("bucket", "term")
                            .agg(F.sum("df").cast("long").alias("df"),
                                 F.sum("cf").cast("long").alias("cf")))
        # per-term deleted-df deltas (recorded at tombstone time,
        # _record_tombstones): subtracting them makes df/cf EXACT under
        # deletes — idf, vocabulary and the corrector all see compacted-
        # identical stats. Fully-deleted terms leave the vocabulary.
        deltas = load_deleted_df(spark, index_dir)
        if deltas is not None:
            agg = deltas.groupBy("term").agg(F.sum("df").alias("_ddf"),
                                             F.sum("cf").alias("_dcf"))
            self._term_stats = (
                self._term_stats.join(agg, "term", "left")
                .select("bucket", "term",
                        F.greatest(F.col("df") - F.coalesce("_ddf", F.lit(0)),
                                   F.lit(0)).cast("long").alias("df"),
                        F.greatest(F.col("cf") - F.coalesce("_dcf", F.lit(0)),
                                   F.lit(0)).cast("long").alias("cf"))
                .where(F.col("df") > 0))
        self._docs = docs.persist() if cache_docs else docs
        self._docs_cached = cache_docs
        self._vocab_cache = None
        self._cache_postings = cache_postings
        self._cache_partitions = int(
            spark.conf.get("spark.sql.shuffle.partitions", "32"))
        self._decoded_cache = OrderedDict()
        self._decoded_raw = OrderedDict()
        self._retired = []
        self._plan_volatile = False
        self._match_cache = OrderedDict()
        self._df_count_cache = {}
        self._plan_cache = OrderedDict()
        self._handle_groups = []
        # everything else (scoring, caches, prepared plans, release/close)
        # is inherited SearchIndex behavior over the union relations

    # No match_scores override: tombstones are filtered at DECODE level
    # (SearchIndex._decoded_for_term/_decoded_for_prefix anti-join
    # self._tomb before the frames are cached), so every downstream
    # table — phrase dfs, NEAR trims, scoring, counts — is delete-exact
    # with zero per-query plan nodes. Together with the deleted-df
    # deltas above, a tombstoned view scores identically to the
    # compacted index at 1e-9 (test_lifecycle pins it).


def compact(spark: SparkSession, index_dir: str, out_dir: str,
            **build_kwargs) -> dict:
    """S9 'optimize': rebuild ONE index from base+segments minus
    tombstones. Returns the new manifest. Inherits the base index's FULL
    build config (fields, language, block_size, salting — a custom
    block_size must survive its own compaction or the WAND block
    geometry silently changes).

    doc_ids are REASSIGNED (dense, in (conv_id, turn_idx) order) — ids
    held across a compaction are invalid; resolve deletes/lookups
    against the live view at call time (the engine and
    upsert/delete_by_conv_prefix do)."""
    seg = SegmentedIndex(spark, index_dir)
    try:
        docs = seg.docs()
        cfg = load_manifest(index_dir).get("config", {})
        fields = cfg.get("fields", ["text"])
        # keep every original column except build artifacts
        drop = {"doc_id", "tokens", "doc_len", "field_lens", "_pid", "_ord"}
        present = [c for c in docs.columns if c not in drop]
        # fields and identity must survive; anything else rides along
        assert all(f in present for f in fields), (fields, present)
        transcripts = docs.select(*present)
        kwargs = {"num_buckets": cfg.get("num_buckets", 32),
                  "block_size": cfg.get("block_size", 128),
                  "salt_threshold": cfg.get("salt_threshold", 100_000),
                  "num_salts": cfg.get("num_salts", 16),
                  "language": cfg.get("language", "english"),
                  "fields": fields}
        kwargs.update(build_kwargs)
        return build_index(spark, transcripts, out_dir,
                           input_path=f"<compaction of {index_dir}>",
                           **kwargs)
    finally:
        seg.close()


def compact_in_place(spark: SparkSession, index_dir: str,
                     **build_kwargs) -> dict:
    """Compact base+segments−tombstones and atomically swap the result
    into ``index_dir``. The manifest epoch keeps rising across the swap
    (epoch-keyed serving caches must never see an epoch value repeat —
    a reset-to-zero epoch would let stale K1 pages collide with the
    compacted index). On a shared cluster the swap would go through a
    catalog pointer with old files retained until readers drain; in this
    single-process layout the old directory is replaced directly and
    in-flight readers are the caller's responsibility (Engine re-resolves
    on the epoch bump)."""
    import json
    import shutil

    old_epoch = index_epoch(index_dir)
    tmp = index_dir.rstrip("/") + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    manifest = compact(spark, index_dir, tmp, **build_kwargs)

    manifest["epoch"] = old_epoch + 1
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=2)

    old = index_dir.rstrip("/") + ".pre_compact"
    shutil.rmtree(old, ignore_errors=True)
    os.replace(index_dir, old)
    os.replace(tmp, index_dir)
    shutil.rmtree(old)
    # the swap bypassed Spark's write path, so the session still holds
    # file listings AND cached (persisted) relations for the old files
    # under this same path — a new reader's scan could canonically match
    # a stale cached plan and be served pre-compaction data without ever
    # touching disk. refreshByPath drops both for the subtree.
    spark.catalog.refreshByPath(index_dir)
    return manifest
