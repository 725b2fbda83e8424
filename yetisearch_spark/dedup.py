"""Large-scale deduplication operators for training-data pipelines.

Beyond the reference's result-level dedup (A7 roll-up), these are the
corpus-level dedup families a 100 TB text pipeline needs. All hot paths
are JVM built-ins or Arrow-vectorized numpy; pair generation always goes
through a bucketing join (never an O(n²) cross join):

  * exact_dedup      — hash-groupBy on normalized text (keep min doc_id)
  * minhash_lsh_dedup — shingle → k minhashes → b bands → band-bucket
    self-join → candidate pairs → exact Jaccard verify → connected
    groups (keep min doc_id per group)
  * simhash_dedup    — 64-bit simhash over token hashes, Hamming ≤ t via
    band rotation buckets
  * ngram_jaccard_pairs — character n-gram Jaccard over a candidate set
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (ArrayType, IntegerType, LongType, StringType,
                               StructField, StructType)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", normalize: bool = True) -> DataFrame:
    """Keep one representative (min id) per distinct text. Returns the
    deduplicated rows; a pure hash-groupBy (one shuffle on the hash)."""
    key = F.lower(F.regexp_replace(F.col(text_col), r"\s+", " ")) \
        if normalize else F.col(text_col)
    keyed = df.withColumn("_k", F.xxhash64(key))
    keep = keyed.groupBy("_k").agg(F.min(id_col).alias(id_col))
    return (keyed.join(keep, ["_k", id_col]).drop("_k"))


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

_MERSENNE = (1 << 61) - 1


def _stable_hash64(s: str, seed: int = 0) -> int:
    """Process-stable 64-bit string hash (blake2b; memo-friendly)."""
    import hashlib
    h = hashlib.blake2b(s.encode("utf-8", "ignore"), digest_size=8,
                        salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little") & 0x7FFFFFFFFFFFFFFF


def _minhash_params(num_hashes: int, seed: int = 7):
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE, num_hashes, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE, num_hashes, dtype=np.uint64)
    return a, b


def make_minhash_udf(num_hashes: int = 128, shingle: int = 5, seed: int = 7):
    """text → array<long> of minhash signature over character shingles.
    Arrow-batched; inner loops vectorized over (shingles × hashes) tiles."""
    from pyspark.sql.functions import pandas_udf  # noqa: local import for Spark

    a, b = _minhash_params(num_hashes, seed)

    def signature(text: str) -> list[int]:
        t = " ".join((text or "").lower().split())
        if len(t) < shingle:
            t = t + " " * (shingle - len(t))
        views = [t[i:i + shingle] for i in range(len(t) - shingle + 1)]
        # stable across processes (python hash() is PYTHONHASHSEED-salted)
        hashes = np.array([_stable_hash64(s) for s in set(views)],
                          dtype=np.uint64)
        if hashes.size == 0:
            return [0] * num_hashes
        # (H,) x (K,) → min over shingles per hash function
        vals = (hashes[:, None] * a[None, :] + b[None, :]) % _MERSENNE
        return vals.min(axis=0).astype(np.int64).tolist()

    import pandas as pd  # noqa

    def _batch(texts):
        return pd.Series([signature(t) for t in texts])

    _batch.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf(ArrayType(LongType()))(_batch)


def _shingle_set_col(text_col: str, shingle: int):
    """Whitespace-collapsed lowercase character shingles as a distinct
    array — the JVM twin of make_minhash_udf's shingling."""
    t = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"\s+", " "))
    t = F.rpad(t, shingle, " ")  # pad very short docs like the UDF does
    return F.array_distinct(F.expr(
        f"transform(sequence(1, greatest(length({'_norm'}) - {shingle - 1}, 1)), "
        f"i -> substring({'_norm'}, i, {shingle}))")), t


def connected_groups(edges: DataFrame, max_iters: int = 25) -> DataFrame:
    """(a, b) undirected edges → (doc_id, group_id = min id of the
    connected component). Run to FIXPOINT (one changed-row count job per
    round).

    Each round does BOTH label steps — they need each other:
      1. edge propagation: every node adopts min(own label, neighbors'
         labels). Without it, a node whose own id is below all its
         neighbors' ids is a self-pointing root that pointer jumping can
         never merge (star components with a high-id hub split — cliques
         and chains masked this until the embedding-dedup oracle hit it).
      2. pointer jumping: g(v) ← g(g(v)) path compression, which turns
         O(diameter) convergence into ~O(log diameter) rounds.
    At fixpoint labels are equal across every edge, hence constant per
    component and equal to the component's min id."""
    # persist the symmetric edge list: every fixpoint round joins it, and
    # an un-persisted sym would re-run the whole upstream pair-generation
    # pipeline (LSH + verify / O(n²) cosine) once per round
    sym = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))).persist()
    groups = (sym.groupBy("a").agg(F.min("b").alias("g"))
              .select(F.col("a").alias("doc_id"),
                      F.least("a", "g").alias("group_id"))).persist()
    for _ in range(max_iters):
        nbr = (sym.alias("e")
               .join(groups.alias("g"),
                     F.col("e.b") == F.col("g.doc_id"))
               .select(F.col("e.a").alias("doc_id"), F.col("g.group_id")))
        merged = (groups.unionByName(nbr)
                  .groupBy("doc_id").agg(F.min("group_id").alias("group_id")))
        g2 = (merged.alias("x")
              .join(merged.select(F.col("doc_id").alias("group_id"),
                                  F.col("group_id").alias("g2")).alias("y"),
                    "group_id", "left")
              .select("doc_id",
                      F.least("group_id", F.coalesce("g2", "group_id"))
                      .alias("group_id"))
              .groupBy("doc_id").agg(F.min("group_id").alias("group_id"))
              ).persist()
        changed = (g2.alias("n").join(groups.alias("o"), "doc_id")
                   .where(F.col("n.group_id") != F.col("o.group_id"))
                   .limit(1).count())
        groups.unpersist()
        groups = g2
        if changed == 0:
            break
    sym.unpersist()
    return groups


def minhash_lsh_dedup(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", *, num_hashes: int = 128,
                      bands: int = 32, shingle: int = 5,
                      jaccard_threshold: float = 0.8,
                      verify: str = "estimate",
                      seed: int = 7) -> DataFrame:
    """→ (doc_id, group_id) for near-duplicate docs (group = min doc_id of
    the duplicate set; singletons omitted).

    Plan shape: signature (pandas UDF) → explode to (band, band_hash)
    keys → self-join on band buckets (equi-join, shuffles only bucket
    keys) → Jaccard verify → connected components to fixpoint.

    ``verify``: "estimate" filters candidate pairs by the fraction of
    agreeing signature slots (unbiased estimator, zero extra IO);
    "exact" joins the texts back and computes the true shingle-set
    Jaccard with JVM array ops (array_intersect/union — no Python)."""
    verified = minhash_verified_pairs(
        df, text_col, id_col, num_hashes=num_hashes, bands=bands,
        shingle=shingle, jaccard_threshold=jaccard_threshold,
        verify=verify, seed=seed)
    return connected_groups(verified)


def minhash_verified_pairs(df: DataFrame, text_col: str = "text",
                           id_col: str = "doc_id", *, num_hashes: int = 128,
                           bands: int = 32, shingle: int = 5,
                           jaccard_threshold: float = 0.8,
                           verify: str = "estimate",
                           seed: int = 7) -> DataFrame:
    """Candidate generation + verify half of minhash_lsh_dedup → (a, b)."""
    rows_per_band = num_hashes // bands
    sig_udf = make_minhash_udf(num_hashes, shingle, seed)
    sigs = (df.select(F.col(id_col).alias("doc_id"),
                      sig_udf(F.col(text_col)).alias("sig")))

    band_cols = [
        F.struct(F.lit(b).alias("band"),
                 F.xxhash64(F.concat_ws(
                     ",", *[F.element_at("sig", b * rows_per_band + r + 1)
                            for r in range(rows_per_band)])).alias("bh"))
        for b in range(bands)
    ]
    buckets = (sigs.select("doc_id", "sig",
                           F.explode(F.array(*band_cols)).alias("bb"))
               .select("doc_id", "sig", "bb.band", "bb.bh"))

    # exact verify never reads the signatures downstream — keep the
    # 128-slot arrays OUT of the candidate self-join's shuffle and carry
    # bare (a, b) ids instead (they re-join texts anyway)
    sig_cols = [] if verify == "exact" else \
        [F.col("l.sig").alias("sig_a"), F.col("r.sig").alias("sig_b")]
    right_cols = ["doc_id", "band", "bh"] + \
        ([] if verify == "exact" else ["sig"])
    left = (buckets.select(*right_cols).alias("l") if verify == "exact"
            else buckets.alias("l"))
    right = buckets.select(*right_cols).alias("r")
    pairs = (left.join(right, on=[F.col("l.band") == F.col("r.band"),
                                  F.col("l.bh") == F.col("r.bh"),
                                  F.col("l.doc_id") < F.col("r.doc_id")])
             .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"),
                     *sig_cols)
             .dropDuplicates(["a", "b"]))

    if verify == "exact":
        arr_expr, norm = _shingle_set_col(text_col, shingle)
        shingles = (df.select(F.col(id_col).alias("doc_id"),
                              norm.alias("_norm"))
                    .select("doc_id", arr_expr.alias("gs")))
        ga = shingles.select(F.col("doc_id").alias("a"),
                             F.col("gs").alias("gs_a"))
        gb = shingles.select(F.col("doc_id").alias("b"),
                             F.col("gs").alias("gs_b"))
        jac = (F.size(F.array_intersect("gs_a", "gs_b")).cast("double")
               / F.size(F.array_union("gs_a", "gs_b")))
        return (pairs.join(ga, "a").join(gb, "b")
                .where(jac >= jaccard_threshold).select("a", "b"))
    # estimated Jaccard = fraction of agreeing signature slots
    est = (F.size(F.filter(F.zip_with("sig_a", "sig_b",
                                      lambda x, y: x == y), lambda v: v))
           / F.lit(float(num_hashes)))
    return pairs.where(est >= jaccard_threshold).select("a", "b")


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def make_simhash_udf(seed: int = 11):
    """tokens array → 64-bit simhash (sign of per-bit weighted sums)."""
    from pyspark.sql.functions import pandas_udf

    def simhash(tokens) -> int:
        if tokens is None or len(tokens) == 0:
            return 0
        hs = np.array([_stable_hash64(t, seed) for t in tokens],
                      dtype=np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :])
                & np.uint64(1)).astype(np.int64)
        sums = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for i in range(64):
            if sums[i] > 0:
                out |= np.uint64(1) << np.uint64(i)
        return int(out.astype(np.int64))

    def _batch(token_lists):
        return pd.Series([simhash(t) for t in token_lists])

    _batch.__annotations__ = {"token_lists": pd.Series, "return": pd.Series}
    return pandas_udf(LongType())(_batch)


def simhash_pairs(df: DataFrame, tokens_col: str = "tokens",
                  id_col: str = "doc_id", max_hamming: int = 3,
                  hash_col: str | None = None) -> DataFrame:
    """Candidate near-dup pairs by simhash banding: split the 64-bit hash
    into (max_hamming+1) bands — any pair within the Hamming radius shares
    at least one exact band (pigeonhole). → (a, b, hamming).

    ``hash_col``: use a precomputed 64-bit simhash column instead of
    hashing ``tokens_col`` (lets callers materialize hashes once)."""
    nbands = max_hamming + 1
    width = 64 // nbands
    if hash_col is not None:
        hashed = df.select(F.col(id_col).alias("doc_id"),
                           F.col(hash_col).alias("sh"))
    else:
        sim_udf = make_simhash_udf()
        hashed = df.select(F.col(id_col).alias("doc_id"),
                           sim_udf(F.col(tokens_col)).alias("sh"))
    bands = []
    for i in range(nbands):
        shift = i * width
        w = width if i < nbands - 1 else 64 - shift
        mask = (1 << w) - 1
        bands.append(F.struct(
            F.lit(i).alias("band"),
            F.shiftrightunsigned("sh", shift).bitwiseAND(F.lit(mask)).alias("bv")))
    exploded = (hashed.select("doc_id", "sh", F.explode(F.array(*bands)).alias("b"))
                .select("doc_id", "sh", "b.band", "b.bv"))
    l, r = exploded.alias("l"), exploded.alias("r")
    cand = (l.join(r, on=[F.col("l.band") == F.col("r.band"),
                          F.col("l.bv") == F.col("r.bv"),
                          F.col("l.doc_id") < F.col("r.doc_id")])
            .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"),
                    F.col("l.sh").alias("ha"), F.col("r.sh").alias("hb"))
            .dropDuplicates(["a", "b"]))
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return (cand.select("a", "b", hamming.alias("hamming"))
            .where(F.col("hamming") <= max_hamming))


# ---------------------------------------------------------------------------
# n-gram Jaccard (character level, over candidate pairs)
# ---------------------------------------------------------------------------

def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id", n: int = 3,
                        threshold: float = 0.5) -> DataFrame:
    """All pairs with char-n-gram (set) Jaccard ≥ threshold — EXACT output,
    scale-safe candidate generation.

    The naive explode-join blows up near-quadratically on hot grams
    (' th' joins across the whole corpus). This uses the standard prefix
    filter (PPJoin family): order every doc's grams by ascending corpus
    df (rarest first, ties by gram), keep only the first
    |X| − ⌈θ·|X|⌉ + 1 grams per doc as join keys — any pair with
    J ≥ θ must share a prefix gram under a global order — then verify
    candidates exactly with JVM array_intersect over the full gram sets.
    Hot grams land in suffixes and never join."""
    from pyspark.sql.window import Window

    grams = (df.select(F.col(id_col).alias("doc_id"),
                       F.explode(F.array_distinct(
                           F.expr(f"transform(sequence(1, greatest(length({text_col}) - {n - 1}, 1)), "
                                  f"i -> substring({text_col}, i, {n}))")))
                        .alias("gram")))
    gram_df = grams.groupBy("gram").agg(F.count(F.lit(1)).alias("gdf"))
    ranked = grams.join(gram_df, "gram")
    w = Window.partitionBy("doc_id").orderBy("gdf", "gram")
    sz = Window.partitionBy("doc_id")
    prefix = (ranked
              .withColumn("rn", F.row_number().over(w))
              .withColumn("sz", F.count(F.lit(1)).over(sz))
              .where(F.col("rn") <= F.col("sz")
                     - F.ceil(F.lit(float(threshold)) * F.col("sz")) + 1)
              .select("doc_id", "gram"))

    cand = (prefix.alias("l")
            .join(prefix.alias("r"),
                  on=[F.col("l.gram") == F.col("r.gram"),
                      F.col("l.doc_id") < F.col("r.doc_id")])
            .select(F.col("l.doc_id").alias("a"),
                    F.col("r.doc_id").alias("b"))
            .dropDuplicates(["a", "b"]))

    sets = grams.groupBy("doc_id").agg(
        F.collect_set("gram").alias("gs"),
        F.count(F.lit(1)).alias("sz"))
    out = (cand
           .join(sets.select(F.col("doc_id").alias("a"),
                             F.col("gs").alias("gs_a"),
                             F.col("sz").alias("sa")), "a")
           .join(sets.select(F.col("doc_id").alias("b"),
                             F.col("gs").alias("gs_b"),
                             F.col("sz").alias("sb")), "b")
           .withColumn("inter", F.size(F.array_intersect("gs_a", "gs_b")))
           .withColumn("jaccard", F.col("inter").cast("double")
                       / (F.col("sa") + F.col("sb") - F.col("inter")))
           .where(F.col("jaccard") >= threshold)
           .select("a", "b", F.round("jaccard", 6).alias("jaccard")))
    return out
