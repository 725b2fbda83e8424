#!/usr/bin/env python
"""Interleaved pinned-commit A/B on the QUERY legs (round-6 verdict
order 3): round-5's driver bench came in uniformly 20-35% slower than
round-4 on every comparable leg with only an environmental-drift
argument. This harness settles it the way round 4 settled the build
path (build_ab_result.json): alternate REF-pinned and HEAD runs, fresh
JVM per run, same corpus bytes, each variant querying an index built by
its own code.

Legs (median of the per-run values across rounds):
  engine_single_hot   — SearchIndex.search("search"), hot median-of-3
  engine_fuzzy_cold   — Engine.search fuzzy, first call after warm
  engine_fuzzy_hot    — same, hot median-of-3
  wand_skew_single_exact — unpruned head-term top-k, cold median-of-3

Usage: python scripts/bench_ab_queries.py [--ref 65fac3f] [--rounds 3]
       [--turns 1000000] [--workdir /tmp/ys_ab_queries]
The ref is materialized once with `git worktree add --detach`.
"""

import argparse
import json
import os
import shutil
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

INNER = r'''
import json, os, sys, time
repo = sys.argv[1]; corpus = sys.argv[2]; workdir = sys.argv[3]
cpus = int(sys.argv[4]); turns = int(sys.argv[5]); tag = sys.argv[6]
sys.path.insert(0, repo)
os.environ["PYTHONPATH"] = repo + os.pathsep + os.environ.get("PYTHONPATH", "")
from pyspark.sql import SparkSession, functions as F
spark = (SparkSession.builder.master(f"local[{cpus}]")
         .appName(f"ys-ab-{tag}")
         .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
                 "true")
         .config("spark.driver.memory", "16g")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from yetisearch_spark.build import build_index
from yetisearch_spark.query import SearchIndex
res = {}

# variant-owned indexes (cached across runs via marker files)
index_dir = os.path.join(workdir, f"index_{tag}_{turns}")
if not os.path.exists(os.path.join(index_dir, "_AB_DONE")):
    import shutil as _sh; _sh.rmtree(index_dir, ignore_errors=True)
    build_index(spark, spark.read.parquet(corpus), index_dir,
                input_path=corpus, shuffle_partitions=max(cpus, 8))
    open(os.path.join(index_dir, "_AB_DONE"), "w").write("ok")
skew_corpus = os.path.join(workdir, f"skew_corpus_{turns}")
if not os.path.exists(os.path.join(skew_corpus, "_DONE")):
    import shutil as _sh; _sh.rmtree(skew_corpus, ignore_errors=True)
    spike = F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(5000)) == 0
    rare = (F.element_at(F.split(F.col("conv_id"), "_"), -1)
            .cast("long") < 200)
    (spark.read.parquet(corpus).withColumn(
        "text",
        F.concat(F.col("text"), F.lit(" zzhead"),
                 F.when(spike, F.lit(" zzhead" * 31)).otherwise(F.lit("")),
                 F.when(rare, F.lit(" zzrare")).otherwise(F.lit(""))))
     .write.mode("overwrite").parquet(skew_corpus))
    open(os.path.join(skew_corpus, "_DONE"), "w").write("ok")
skew_dir = os.path.join(workdir, f"skew_index_{tag}_{turns}")
if not os.path.exists(os.path.join(skew_dir, "_AB_DONE")):
    import shutil as _sh; _sh.rmtree(skew_dir, ignore_errors=True)
    build_index(spark, spark.read.parquet(skew_corpus), skew_dir,
                input_path=skew_corpus, block_size=64,
                shuffle_partitions=max(cpus, 8))
    open(os.path.join(skew_dir, "_AB_DONE"), "w").write("ok")

try:
    from yetisearch_spark.query import configure_serving
    configure_serving(spark)
except Exception:
    pass
idx = SearchIndex(spark, index_dir)
if hasattr(idx, "warm"):
    idx.warm()
else:
    idx._docs.count()

# leg 1: engine_single hot
idx.search("search", k=10).collect()
runs = []
for _ in range(3):
    t0 = time.time(); idx.search("search", k=10).collect()
    runs.append(time.time() - t0)
res["engine_single_hot"] = round(sorted(runs)[1], 4)

# leg 2/3: engine fuzzy cold + hot
from yetisearch_spark.engine import Engine, SearchQuery
eng = Engine(spark, {"main": index_dir})
eng.indexes["main"] = idx
if hasattr(eng, "warm"):
    eng.warm("main")
sq = SearchQuery(query="serch dta", fuzzy=True, limit=10, bypass_cache=True)
t0 = time.time(); eng.search("main", sq)
res["engine_fuzzy_cold"] = round(time.time() - t0, 4)
runs = []
for _ in range(5):
    t0 = time.time(); eng.search("main", sq)
    runs.append(time.time() - t0)
res["engine_fuzzy_hot"] = round(sorted(runs)[2], 4)

# leg 4: unpruned skew head-term top-k, cold median-of-3
skew_idx = SearchIndex(spark, skew_dir, cache_postings=False,
                       cache_docs=False)
skew_idx.pruned_gate_blocks = -1     # no-op attr on pre-facade code
skew_idx.term_stats_for(["zzhead", "zzrare"])
runs = []
for _ in range(3):
    t0 = time.time()
    out = skew_idx.search("zzhead", k=10)
    out.collect()
    runs.append(time.time() - t0)
    if hasattr(skew_idx, "release"):
        skew_idx.release(getattr(out, "_ys_handles", []))
        for g in list(getattr(skew_idx, "_handle_groups", [])):
            skew_idx.release(g)
res["wand_skew_single_exact"] = round(sorted(runs)[1], 4)

print("RESULT_JSON:" + json.dumps(res))
spark.stop()
'''


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--ref", default="65fac3f")
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--turns", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get(
        "SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--workdir", default="/tmp/ys_ab_queries")
    args = ap.parse_args()

    ref_dir = f"/tmp/ys_ab_ref_{args.ref}"
    if not os.path.isdir(os.path.join(ref_dir, "yetisearch_spark")):
        shutil.rmtree(ref_dir, ignore_errors=True)
        subprocess.run(["git", "-C", REPO, "worktree", "add", "--detach",
                        ref_dir, args.ref], check=True)

    os.makedirs(args.workdir, exist_ok=True)
    sys.path.insert(0, REPO)
    from yetisearch_spark.corpus import write_corpus_parquet
    corpus = os.path.join(args.workdir, f"corpus_{args.turns}")
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        shutil.rmtree(corpus, ignore_errors=True)
        n = write_corpus_parquet(corpus, args.turns, seed=42)
        open(os.path.join(corpus, "_DONE"), "w").write(str(n))

    inner = os.path.join(args.workdir, "_inner.py")
    with open(inner, "w") as f:
        f.write(INNER)

    variants = [("ref", ref_dir), ("head", REPO)]
    runs: dict[str, list[dict]] = {"ref": [], "head": []}
    for rnd in range(args.rounds):
        for tag, repo in variants:
            t0 = time.time()
            proc = subprocess.run(
                [sys.executable, inner, repo, corpus, args.workdir,
                 str(args.cpus), str(args.turns), tag],
                capture_output=True, text=True)
            line = [l for l in proc.stdout.splitlines()
                    if l.startswith("RESULT_JSON:")]
            if not line:
                print(proc.stdout[-3000:])
                print(proc.stderr[-3000:])
                raise SystemExit(f"{tag} run {rnd} failed")
            r = json.loads(line[0][len("RESULT_JSON:"):])
            runs[tag].append(r)
            print(f"round {rnd} {tag}: {r} ({time.time()-t0:.0f}s)",
                  flush=True)

    legs = sorted(runs["ref"][0])
    summary = {}
    for leg in legs:
        a = sorted(r[leg] for r in runs["ref"])
        b = sorted(r[leg] for r in runs["head"])
        med_a, med_b = a[len(a) // 2], b[len(b) // 2]
        spread = max(
            (max(x) - min(x)) / (x[len(x) // 2] or 1) for x in (a, b))
        summary[leg] = {
            "ref_runs_s": a, "head_runs_s": b,
            "ref_median_s": med_a, "head_median_s": med_b,
            "delta_median_pct": round((med_b - med_a) / med_a * 100, 1),
            "within_leg_spread_pct": round(spread * 100, 1)}
    out = {"what": ("interleaved pinned-commit A/B of the query legs: "
                    f"{args.ref} (round-4 head) vs current HEAD, fresh "
                    "JVM per run, same corpus bytes, each variant on its "
                    "own-built index, alternating legs"),
           "turns": args.turns, "cpus": args.cpus, "rounds": args.rounds,
           "legs": summary}
    print(json.dumps(out, indent=1))
    with open(os.path.join(REPO, "query_ab_result.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
