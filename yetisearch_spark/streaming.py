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


def append_segment(spark: SparkSession, index_dir: str,
                   transcripts: DataFrame, epoch: int, **build_kwargs) -> dict:
    """Build one incremental segment (a full mini-index) whose doc_ids
    start at the current high-water mark."""
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


def delete_docs(spark: SparkSession, index_dir: str, doc_ids: list[int]) -> None:
    """Record deletes; applied as an anti-join at query time and made
    physical at compaction (delete-vector model)."""
    df = spark.createDataFrame([(int(d),) for d in doc_ids], "doc_id long")
    df.write.mode("append").parquet(tombstone_path(index_dir))
    bump_epoch(index_dir)


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
    n_replaced = victims.count()
    if n_replaced:
        victims.write.mode("append").parquet(tombstone_path(index_dir))
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
    n = victims.count()
    if n:
        victims.write.mode("append").parquet(tombstone_path(index_dir))
        bump_epoch(index_dir)
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

    def __init__(self, spark: SparkSession, index_dir: str):
        from .query import SearchIndex

        self.spark = spark
        self.index_dir = index_dir
        parts = [index_dir] + [segment_dir(index_dir, e)
                               for e in list_segments(index_dir)]
        self._indexes = [SearchIndex(spark, p) for p in parts]
        self._tomb = load_tombstones(spark, index_dir)

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


class UnionIndex:
    """Engine-facing serving view over base + committed segments minus
    tombstones — the surface Engine.search/count/facets need
    (match_scores / _docs / fields / release), so index mutations become
    visible to a live Engine without compaction or a manual cache clear.

    Per-part BM25 statistics apply (each part scores with its own
    df/avgdl — the documented pre-compaction trade-off, identical to the
    reference's multi-index merge, src/Storage/SqliteStorage.php:
    1574-1628). Compaction restores exact single-index semantics."""

    def __init__(self, spark: SparkSession, index_dir: str, base=None):
        from .build import parquet_row_count
        from .query import SearchIndex

        self.spark = spark
        self.index_dir = index_dir
        # ``base``: pass the engine's long-lived SearchIndex so its pinned
        # decoded/doc caches are reused (and never closed by this view);
        # segments are small and short-lived (compaction folds them in)
        if base is None:
            base = SearchIndex(spark, index_dir)
        self.parts = [base] + [SearchIndex(spark, segment_dir(index_dir, e))
                               for e in list_segments(index_dir)]
        self._tomb = load_tombstones(spark, index_dir)
        base = self.parts[0]
        self.fields = base.fields
        self.manifest = base.manifest
        n_tomb = parquet_row_count(tombstone_path(index_dir)) \
            if self._tomb is not None else 0
        self.n_docs = max(0, sum(p.n_docs for p in self.parts) - n_tomb)
        total = sum(p.n_docs for p in self.parts) or 1
        self.avgdl = sum(p.avgdl * p.n_docs for p in self.parts) / total
        self._term_stats = base._term_stats

    @property
    def _docs(self) -> DataFrame:
        out = None
        for p in self.parts:
            out = p._docs if out is None else out.unionByName(p._docs)
        if self._tomb is not None:
            out = out.join(self._tomb, "doc_id", "left_anti")
        return out

    def match_scores(self, node, weights=None) -> DataFrame:
        handles: list = []
        merged = None
        for p in self.parts:
            s = p.match_scores(node, weights=weights)
            handles.extend(getattr(s, "_ys_handles", []))
            merged = s if merged is None else merged.unionByName(s)
        if self._tomb is not None:
            merged = merged.join(self._tomb, "doc_id", "left_anti")
        merged._ys_handles = handles  # type: ignore[attr-defined]
        return merged

    def release(self, handles) -> None:
        # handles may span parts; per-part registries are bounded anyway
        for h in handles or []:
            h.unpersist()

    def close(self) -> None:
        # the base part's caches belong to the long-lived engine; only
        # segment parts are private to this view
        for p in self.parts[1:]:
            p.close()


def compact(spark: SparkSession, index_dir: str, out_dir: str,
            **build_kwargs) -> dict:
    """S9 'optimize': rebuild ONE index from base+segments minus
    tombstones. Returns the new manifest. Inherits the base index's
    analyzer language and field list (a multi-field index compacts
    multi-field)."""
    seg = SegmentedIndex(spark, index_dir)
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
              "language": cfg.get("language", "english"),
              "fields": fields}
    kwargs.update(build_kwargs)
    return build_index(spark, transcripts, out_dir,
                       input_path=f"<compaction of {index_dir}>", **kwargs)
