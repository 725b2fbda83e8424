"""Similarity search over embedding columns (array<float>).

Two tiers, as a 100 TB pipeline needs:

  * brute-force cosine top-k — correctness baseline; the dot product is a
    JVM higher-order expression (zip_with + aggregate), so Catalyst keeps
    it inside whole-stage codegen and the final top-k is
    TakeOrderedAndProject. Doc norms are precomputed once per table.
  * random-hyperplane LSH (signed projections → band buckets) — the scale
    path: candidates come from an equi-join on bucket keys; exact cosine
    re-rank only on candidates.
  * IVF-style coarse quantizer (seeded random centroids; assign via the
    same JVM dot product) — probe nearest nprobe cells only.

No Python in any per-row hot path; query vectors are literals folded by
Catalyst; centroids are broadcast.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, functions as F


def _vec_lit(vec) -> Column:
    return F.array(*[F.lit(float(x)) for x in vec])


def dot_expr(col: Column | str, qvec) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.aggregate(F.zip_with(c, _vec_lit(qvec), lambda a, b: a * b),
                       F.lit(0.0), lambda acc, x: acc + x)


def norm_expr(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda acc, x: acc + x * x))


def _safe_cos(dot: Column, denom: Column) -> Column:
    """cosine with the zero-norm case pinned to -1: 0/0 = NaN, and NaN
    sorts ABOVE every number in Spark SQL, so an unguarded divide puts a
    zero vector at the top of every descending-cos_sim top-k."""
    return F.when(denom > 0, dot / denom).otherwise(F.lit(-1.0))


def cosine_topk(df: DataFrame, qvec, k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force cosine top-k → (id, cos_sim)."""
    qnorm = float(np.sqrt(np.dot(qvec, qvec)))
    cos = _safe_cos(dot_expr(vec_col, qvec),
                    norm_expr(vec_col) * F.lit(qnorm))
    return (df.select(F.col(id_col), cos.alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k))


# ---------------------------------------------------------------------------
# Random-hyperplane LSH
# ---------------------------------------------------------------------------

def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_expr(vec_col: str, planes: np.ndarray) -> Column:
    """Sign-bit bucket id over n_planes random hyperplanes, computed as a
    chain of JVM dot products (n_planes is small, e.g. 8-16)."""
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        bit = F.when(dot_expr(vec_col, plane) >= 0, F.lit(1 << i)).otherwise(0)
        bucket = bucket + bit
    return bucket


def lsh_index(df: DataFrame, vec_col: str = "embedding",
              n_planes: int = 10, n_tables: int = 4, dim: int | None = None,
              seed: int = 99) -> tuple[DataFrame, list[np.ndarray]]:
    """Adds bucket_0..bucket_{T-1} columns (one per hash table). Persist
    the result (or write it partitioned by a bucket column) as the ANN
    index; returns (indexed_df, planes_per_table)."""
    if dim is None:
        dim = len(df.select(vec_col).first()[0])
    tables = [_hyperplanes(dim, n_planes, seed + t) for t in range(n_tables)]
    out = df
    for t, planes in enumerate(tables):
        out = out.withColumn(f"bucket_{t}", lsh_bucket_expr(vec_col, planes))
    return out, tables


def lsh_cosine_topk(indexed: DataFrame, tables: list[np.ndarray], qvec,
                    k: int = 10, vec_col: str = "embedding",
                    id_col: str = "vec_id") -> DataFrame:
    """ANN top-k: filter to rows sharing any table bucket with the query
    (bucket predicates prune at the scan), exact cosine re-rank."""
    q = np.asarray(qvec, dtype=np.float64)
    cond = None
    for t, planes in enumerate(tables):
        qb = int(sum((1 << i) for i, p in enumerate(planes)
                     if float(np.dot(p, q)) >= 0))
        c = F.col(f"bucket_{t}") == qb
        cond = c if cond is None else (cond | c)
    qnorm = float(np.sqrt(np.dot(q, q)))
    cos = _safe_cos(dot_expr(vec_col, q), norm_expr(vec_col) * F.lit(qnorm))
    return (indexed.where(cond)
            .select(F.col(id_col), cos.alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k))


# ---------------------------------------------------------------------------
# IVF-style coarse quantization
# ---------------------------------------------------------------------------

def ivf_index(df: DataFrame, vec_col: str = "embedding",
              n_cells: int = 16, dim: int | None = None,
              seed: int = 7, sample_rows: int = 256) -> tuple[DataFrame, np.ndarray]:
    """Assign each row to its nearest of n_cells centroids (sampled from
    the data, normalized). Returns (df + cell column, centroids). At scale
    the result is written partitioned by `cell` so probes prune files."""
    sample = np.array(
        [r[0] for r in df.select(vec_col).limit(sample_rows).collect()],
        dtype=np.float64)
    rng = np.random.default_rng(seed)
    picks = rng.choice(len(sample), size=min(n_cells, len(sample)),
                       replace=False)
    cents = sample[picks]
    cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)

    # nearest centroid = argmax over a dot-product ARRAY — linear
    # expression size (a chained when() that re-references the running
    # best doubles the tree per cell: 2^16 Catalyst nodes at 16 cells
    # OOMed the driver during analysis)
    dots = F.array(*[dot_expr(vec_col, cents[i]) / norm_expr(vec_col)
                     for i in range(len(cents))])
    best_cell = (F.array_position(dots, F.array_max(dots)) - 1).cast("int")
    return df.withColumn("cell", best_cell), cents


def ivf_cosine_topk(indexed: DataFrame, centroids: np.ndarray, qvec,
                    k: int = 10, nprobe: int = 4,
                    vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    q = np.asarray(qvec, dtype=np.float64)
    qn = q / np.linalg.norm(q)
    order = np.argsort(-(centroids @ qn))
    probes = [int(c) for c in order[:nprobe]]
    qnorm = float(np.sqrt(np.dot(q, q)))
    cos = _safe_cos(dot_expr(vec_col, q), norm_expr(vec_col) * F.lit(qnorm))
    return (indexed.where(F.col("cell").isin(probes))
            .select(F.col(id_col), cos.alias("cos_sim"))
            .orderBy(F.desc("cos_sim"), F.asc(id_col)).limit(k))


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate detection (the dedup-family member over
# vectors: pairs/groups of docs whose embeddings are near-identical)
# ---------------------------------------------------------------------------

def _pair_cosine() -> Column:
    """cosine(va, vb) over the paired columns produced by the pair joins
    below — one JVM fold, no Python."""
    dot = F.aggregate(F.zip_with("va", "vb", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    return _safe_cos(dot, F.col("na") * F.col("nb"))


def _pair_sides(df: DataFrame, vec_col: str, id_col: str):
    base = df.select(F.col(id_col), F.col(vec_col),
                     norm_expr(vec_col).alias("_n"))
    a = base.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"),
                    F.col("_n").alias("na"))
    b = base.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"),
                    F.col("_n").alias("nb"))
    return a, b


def cosine_pairs_exact(df: DataFrame, threshold: float,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> DataFrame:
    """All (a, b, cos_sim) id pairs with cosine ≥ threshold — the exact
    baseline tier (O(n²) nested-loop join; use cosine_pairs_lsh at
    scale, which this tier exists to verify)."""
    a, b = _pair_sides(df, vec_col, id_col)
    cs = _pair_cosine()
    return (a.join(b, F.col("a") < F.col("b"))
            .select("a", "b", cs.alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))


def cosine_pairs_lsh(df: DataFrame, threshold: float,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     n_planes: int = 8, n_tables: int = 8,
                     seed: int = 99, dim: int | None = None) -> DataFrame:
    """Near-dup pairs at scale: random-hyperplane LSH buckets generate
    candidates (equi-joins on bucket keys — only same-bucket rows meet),
    exact cosine verifies them. Recall grows with n_tables and with the
    threshold (near-identical vectors collide in almost every table);
    tests assert parity with cosine_pairs_exact on planted duplicates."""
    indexed, _tables = lsh_index(df, vec_col, n_planes=n_planes,
                                 n_tables=n_tables, dim=dim, seed=seed)
    cand = None
    for t in range(len(_tables)):
        l = indexed.select(F.col(id_col).alias("a"),
                           F.col(f"bucket_{t}").alias("bk"))
        r = indexed.select(F.col(id_col).alias("b"),
                           F.col(f"bucket_{t}").alias("bk"))
        part = (l.join(r, "bk").where(F.col("a") < F.col("b"))
                .select("a", "b"))
        cand = part if cand is None else cand.unionByName(part)
    cand = cand.dropDuplicates(["a", "b"])
    a, b = _pair_sides(df, vec_col, id_col)
    cs = _pair_cosine()
    return (cand.join(a, "a").join(b, "b")
            .select("a", "b", cs.alias("cos_sim"))
            .where(F.col("cos_sim") >= threshold))


def embedding_dup_groups(df: DataFrame, threshold: float,
                         method: str = "lsh", **kwargs) -> DataFrame:
    """→ (doc_id, group_id): connected components over the near-dup
    pair graph (group = min id), the embedding twin of
    dedup.minhash_lsh_dedup."""
    from .dedup import connected_groups

    fn = cosine_pairs_exact if method == "exact" else cosine_pairs_lsh
    pairs = fn(df, threshold, **kwargs).select("a", "b")
    return connected_groups(pairs)
