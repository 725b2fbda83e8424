"""Block-max pruned top-k serving (the WAND idea, Spark-first).

Classic block-max WAND walks posting lists with a global heap. The
Spark-native equivalent is a two-phase plan over the block-partitioned
index:

  phase 1 (metadata only): read just the per-block metadata columns
  (term, min_doc, max_doc, n_docs, block_max_norm) for the query terms —
  parquet column pruning means the `data` bytes are never touched.
  Driver-side, compute per-block score upper bounds (idf · block_max)
  and derive the set of blocks that can possibly contribute to the
  top-k (exact, not heuristic — see per-shape rules below).

  phase 2: decode ONLY the surviving blocks (pushdown on (term,
  min_doc)) and score exactly through the normal DataFrame path.

Shapes covered exactly:
  * single term: sort blocks by block_max desc; take blocks until the
    k-th best guaranteed score ≥ the best possible score of any
    remaining block.
  * AND of terms: candidate docs must appear in blocks of the rarest
    term; other terms' blocks prune to doc-range overlaps with those.
  * OR of terms: per-doc upper bound = Σ overlapping block maxima;
    select blocks by descending ub until the threshold argument holds.

Anything else (phrases, NEAR, filters) falls back to the exact full
path in query.SearchIndex. Block metadata per query term is ≤ df/128
rows — at 10^12 docs a worst-case head term is ~10^8 blocks, which is
why phase 1 itself stays a Spark job with only the final pruned
block-list collected when small, or pushed down as a range predicate
when not.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame, functions as F

from .postings import BM25_K1, BM25_B
from .query import And, Phrase, SearchIndex, parse_query


def _is_simple(node) -> tuple[bool, list[str], str]:
    """(supported, terms, shape) — shape ∈ {single, and, or}."""
    if isinstance(node, Phrase) and len(node.terms) == 1:
        return True, [node.terms[0]], "single"
    if isinstance(node, And) and all(
            isinstance(c, Phrase) and len(c.terms) == 1 for c in node.children):
        return True, [c.terms[0] for c in node.children], "and"
    from .query import Or
    if isinstance(node, Or) and all(
            isinstance(c, Phrase) and len(c.terms) == 1 for c in node.children):
        return True, [c.terms[0] for c in node.children], "or"
    return False, [], ""


def pruned_topk(index: SearchIndex, query, k: int = 10) -> DataFrame:
    """Top-k with block-max pruning; falls back to index.search for
    unsupported shapes. Results are exactly index.search(query, k)."""
    node = parse_query(query) if isinstance(query, str) else query
    ok, terms, shape = _is_simple(node)
    if not ok:
        return index.search(node, k=k)
    terms = list(dict.fromkeys(terms))

    stats = index.term_stats_for(terms)
    if shape == "and" and any(t not in stats for t in terms):
        return index.spark.createDataFrame([], "doc_id long, score double")
    idf = {t: index.idf(stats.get(t, (0, 0))[0]) for t in terms}

    # -- phase 1: block metadata (data column never read) ------------------
    buckets = index._buckets_for_terms(terms)
    meta = (index._postings
            .where(F.col("bucket").isin(buckets))
            .where(F.col("term").isin(terms))
            .select("term", "min_doc", "max_doc", "n_docs", "block_max_norm")
            .collect())
    if not meta:
        return index.spark.createDataFrame([], "doc_id long, score double")
    by_term: dict[str, list] = {t: [] for t in terms}
    for r in meta:
        by_term[r["term"]].append((r["min_doc"], r["max_doc"],
                                   r["n_docs"], r["block_max_norm"]))

    selected: dict[str, set] = {t: set() for t in terms}

    if shape == "single":
        t = terms[0]
        blocks = sorted(by_term[t], key=lambda b: -b[3])
        have = 0
        ubs = [b[3] for b in blocks]
        for i, b in enumerate(blocks):
            selected[t].add((b[0], b[1]))
            have += b[2]
            next_ub = ubs[i + 1] if i + 1 < len(blocks) else 0.0
            if have >= k and next_ub * idf[t] < _kth_lower_bound_single(
                    blocks[: i + 1], idf[t], k):
                break
    elif shape == "and":
        rare = min(terms, key=lambda t: stats.get(t, (0, 0))[0])
        rare_ranges = [(b[0], b[1]) for b in by_term[rare]]
        selected[rare] = set(rare_ranges)
        rr = sorted(rare_ranges)
        rmins = np.array([a for a, _ in rr], dtype=np.int64)
        rmaxs = np.array([b for _, b in rr], dtype=np.int64)
        for t in terms:
            if t == rare:
                continue
            for (mn, mx, nd, bm) in by_term[t]:
                # overlap with any rare block range?
                j = np.searchsorted(rmins, mx, side="right")
                if j > 0 and rmaxs[:j].max(initial=-1) >= mn:
                    selected[t].add((mn, mx))
    else:  # or — WAND sum-threshold, exact
        # θ = guaranteed k-th best score. Each selected block of one term
        # yields a DISTINCT doc scoring ≥ idf·block_max (blocks of a term
        # partition its docs); across T terms a doc may account for ≤ T
        # such bounds, so the (k·T)-th largest selected bound is a certain
        # k-th-doc lower bound.
        all_blocks = [(idf[t] * b[3], t, b) for t in terms for b in by_term[t]]
        all_blocks.sort(key=lambda x: -x[0])
        T = len(terms)
        selected_ubs: list[float] = []
        remaining_max = {t: 0.0 for t in terms}
        # suffix maxima of unselected ubs per term
        for i, (ub, t, b) in enumerate(all_blocks):
            remaining_max[t] = max(remaining_max[t], ub)
        theta = 0.0
        for ub, t, b in all_blocks:
            # stop when no unselected doc can beat θ: its score ≤ Σ_t
            # max-unselected-ub_t (all remaining blocks have ub ≤ current)
            if len(selected_ubs) >= k * T and sum(remaining_max.values()) < theta:
                break
            selected[t].add((b[0], b[1]))
            selected_ubs.append(ub)
            # recompute t's max unselected ub lazily (list is ub-desc, so
            # it's the next unselected block of t — conservative: keep ub)
            remaining_max[t] = ub
            if len(selected_ubs) >= k * T:
                theta = selected_ubs[k * T - 1]
        # docs with one selected + one unselected block: pull in unselected
        # blocks overlapping any selected range so their sums stay exact
        sel_ranges = sorted({r for t in terms for r in selected[t]})
        if sel_ranges:
            smins = np.array([a for a, _ in sel_ranges], dtype=np.int64)
            smaxs = np.array([b for _, b in sel_ranges], dtype=np.int64)
            run_max = np.maximum.accumulate(smaxs)
            for t in terms:
                for (mn, mx, nd, bm) in by_term[t]:
                    if (mn, mx) in selected[t]:
                        continue
                    j = np.searchsorted(smins, mx, side="right")
                    if j > 0 and run_max[j - 1] >= mn:
                        selected[t].add((mn, mx))

    # -- phase 2: decode only surviving blocks -----------------------------
    cond = None
    n_blocks_total = sum(len(v) for v in by_term.values())
    n_selected = sum(len(v) for v in selected.values())
    for t in terms:
        if not selected[t]:
            continue
        mins = sorted(mn for mn, _ in selected[t])
        c = (F.col("term") == t) & F.col("min_doc").isin(mins)
        cond = c if cond is None else (cond | c)
    if cond is None:
        return index.spark.createDataFrame([], "doc_id long, score double")

    from .query import _DECODED_SCHEMA, _decode_factory
    pruned = (index._postings
              .where(F.col("bucket").isin(buckets))
              .where(F.col("term").isin(terms))
              .where(cond)
              .select("term", "data")
              .mapInPandas(_decode_factory(False), schema=_DECODED_SCHEMA))

    k1, b_ = BM25_K1, BM25_B
    avgdl = index.avgdl
    contrib = None
    for i, t in enumerate(terms):
        tf = F.col("tf").cast("double")
        c = (pruned.where(F.col("term") == t)
             .select("doc_id",
                     (F.lit(idf[t]) * tf * (k1 + 1.0)
                      / (tf + k1 * (1.0 - b_ + b_ * F.col("doc_len")
                                    .cast("double") / avgdl))).alias(f"c{i}")))
        contrib = c if contrib is None else contrib.join(c, "doc_id", "full_outer")
    score = None
    qual = None
    for i in range(len(terms)):
        col = F.coalesce(F.col(f"c{i}"), F.lit(0.0))
        score = col if score is None else score + col
        present = F.col(f"c{i}").isNotNull()
        qual = present if qual is None else (
            (qual & present) if shape == "and" else (qual | present))
    out = (contrib.where(qual).select("doc_id", score.alias("score"))
           .orderBy(F.desc("score"), F.asc("doc_id")).limit(k))
    out._pruning_stats = {"blocks_total": n_blocks_total,  # type: ignore
                          "blocks_decoded": n_selected}
    return out


def _kth_lower_bound_single(blocks, idf: float, k: int) -> float:
    """Guaranteed k-th best score among selected blocks: every block holds
    ≥1 doc scoring idf·block_max (the max is attained), so the k best
    block maxima are certain scores."""
    maxima = sorted((b[3] for b in blocks), reverse=True)
    if len(maxima) < k:
        return 0.0
    return idf * maxima[k - 1]
