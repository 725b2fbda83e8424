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


def _hash_shingle_rows(mat: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit hash of fixed-width uint32 rows (FNV-1a over the
    row elements in uint64 wraparound + a murmur-style finalizer) —
    deterministic and process-stable, like the blake2b it replaced, but
    computed for the whole batch in ~k vector ops instead of one digest
    call per shingle (the 100-TB dedup cost center, round-4 verdict)."""
    h = np.full(mat.shape[0], 14695981039346656037, dtype=np.uint64)
    prime = np.uint64(1099511628211)
    for j in range(mat.shape[1]):
        h = (h ^ mat[:, j].astype(np.uint64)) * prime
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xFF51AFD7ED558CCD)
    h ^= h >> np.uint64(33)
    h *= np.uint64(0xC4CEB9FE1A85EC53)
    h ^= h >> np.uint64(33)
    return h


def _flat_window_rows(lens: np.ndarray, width: int):
    """Boundary-safe sliding-window bookkeeping over a concatenation of
    per-doc sequences: given per-doc lengths (each ≥ width), return
    (row_indices into sliding_window_view(cat, width), per-doc window
    counts S, per-doc offsets into the row list). Windows never cross a
    doc boundary. Shared by the minhash and fingerprint batch kernels."""
    starts = np.concatenate(([0], np.cumsum(lens)))[:-1]
    S = lens - (width - 1)
    offs = np.concatenate(([0], np.cumsum(S)))[:-1]
    within = np.arange(int(S.sum()), dtype=np.int64) - np.repeat(offs, S)
    rows = np.repeat(starts, S) + within
    return rows, S, offs


def make_minhash_udf(num_hashes: int = 128, shingle: int = 5, seed: int = 7):
    """text → array<long> of minhash signature over character shingles.

    Fully batch-vectorized: every doc's shingles in the Arrow batch are
    flattened into ONE uint32 code-point array, hashed in one numpy pass
    (no per-shingle digest calls), and the per-doc minima come from
    minimum.reduceat over doc boundaries — tiled so the
    (shingles × num_hashes) temporary stays bounded. Duplicate shingles
    need no dedup (the min over duplicated values equals the min over the
    distinct set)."""
    from pyspark.sql.functions import pandas_udf  # noqa: local import for Spark

    a, b = _minhash_params(num_hashes, seed)
    a = a | np.uint64(1)  # odd multiplier → h·a is a uint64 bijection

    import pandas as pd  # noqa

    def _batch(texts):
        norm = []
        for t in texts:
            s = " ".join((t or "").lower().split())
            if len(s) < shingle:
                s = s + " " * (shingle - len(s))
            norm.append(s)
        n = len(norm)
        if n == 0:
            return pd.Series([], dtype=object)
        lens = np.fromiter((len(s) for s in norm), dtype=np.int64, count=n)
        # utf-32-le → exactly one uint32 element per character (no BOM)
        cat = np.frombuffer("".join(norm).encode("utf-32-le"), dtype=np.uint32)
        rows, S, offs = _flat_window_rows(lens, shingle)
        sw = np.lib.stride_tricks.sliding_window_view(cat, shingle)
        hs = _hash_shingle_rows(sw[rows])
        # per-hash-function CONTIGUOUS passes: (h·a_j + b_j) mod 2^64 is a
        # bijection of uint64 for odd a_j — an independent pseudo-random
        # permutation of the (well-mixed) shingle hash per function, which
        # is exactly the min-wise estimator. One multiply+add per cell and
        # a contiguous reduceat beat both the old per-shingle digest loop
        # and a (shingles × num_hashes) 2-D layout (strided reduceat +
        # 5 ops/cell measured ~4× slower than this shape).
        out = np.empty((n, num_hashes), dtype=np.uint64)
        for j in range(num_hashes):
            out[:, j] = np.minimum.reduceat(hs * a[j] + b[j], offs)
        signed = (out >> np.uint64(1)).astype(np.int64)  # int64-positive
        return pd.Series([r.tolist() for r in signed])

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
    """tokens array → 64-bit simhash (sign of per-bit weighted sums).

    Batch-vectorized: the Arrow batch's token lists flatten into one
    array; digest calls run once per UNIQUE token (np.unique + a
    cross-batch memo — natural-language batches repeat most tokens), the
    per-bit ±1 sums come from one add.reduceat over doc boundaries, and
    the sign bits pack in 64 vector ops. Bit-identical to the previous
    per-row kernel."""
    from pyspark.sql.functions import pandas_udf

    memo: dict[str, int] = {}
    bit_idx = np.arange(64, dtype=np.uint64)[None, :]

    def _hash_unique(uniq) -> np.ndarray:
        out = np.empty(len(uniq), dtype=np.uint64)
        for i, t in enumerate(uniq):
            h = memo.get(t)
            if h is None:
                if len(memo) > 1_000_000:  # bound executor memory
                    memo.clear()
                h = memo[t] = _stable_hash64(t, seed)
            out[i] = h
        return out

    def _batch(token_lists):
        n = len(token_lists)
        result = np.zeros(n, dtype=np.int64)
        lens = np.fromiter((0 if t is None else len(t)
                            for t in token_lists), dtype=np.int64, count=n)
        flat = [tok for t in token_lists if t is not None and len(t)
                for tok in t]
        if flat:
            uniq, inv = np.unique(np.asarray(flat, dtype=object),
                                  return_inverse=True)
            hs = _hash_unique(uniq)
            contrib = (2 * ((hs[:, None] >> bit_idx) & np.uint64(1))
                       .astype(np.int64) - 1)        # (U, 64) of ±1
            rowc = contrib[inv]                      # (T, 64)
            offs = np.concatenate(([0], np.cumsum(lens)))[:-1]
            nz = lens > 0
            # reduceat over non-empty docs' start offsets: each segment
            # runs to the next non-empty doc's start — exactly this doc's
            # tokens (empty docs contribute no rows in between)
            sums = np.add.reduceat(rowc, offs[nz], axis=0)
            packed = np.zeros(int(nz.sum()), dtype=np.uint64)
            pos = sums > 0
            for i in range(64):
                packed |= pos[:, i].astype(np.uint64) << np.uint64(i)
            result[nz] = packed.view(np.int64)
        return pd.Series(result)

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
