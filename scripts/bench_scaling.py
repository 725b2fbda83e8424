#!/usr/bin/env python
"""Two-cluster-size scaling evidence (BASELINE.json north_rule).

Runs the identical index build at local[N] and local[4N] (default 8 and
32 cores) on the same on-disk corpus, reports turns/sec at both plus
scaling efficiency = (T_N / T_4N) / 4. Each run is a fresh subprocess
(fresh JVM) so cores are truly isolated.

Usage: python scripts/bench_scaling.py [--turns 1000000] [--cpus 8,32]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUN_TEMPLATE = r'''
import json, os, sys, time
sys.path.insert(0, {repo!r})
os.environ["PYTHONPATH"] = {repo!r} + os.pathsep + os.environ.get("PYTHONPATH", "")
from pyspark.sql import SparkSession
cpus = {cpus}
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .appName(f"ys-scaling-{{cpus}}")
         .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.driver.memory", "24g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
from yetisearch_spark.build import build_index
transcripts = spark.read.parquet({corpus!r})
t0 = time.time()
build_index(spark, transcripts, {index_dir!r}, input_path={corpus!r},
            shuffle_partitions=max(cpus, 8), resume=False)
wall = time.time() - t0
print("RESULT_JSON:" + json.dumps({{"cpus": cpus, "wall_s": wall}}))
spark.stop()
'''


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--turns", type=int, default=1_000_000)
    ap.add_argument("--cpus", default="8,32")
    ap.add_argument("--workdir", default="/tmp/yetisearch_scaling")
    args = ap.parse_args()
    cpu_list = [int(c) for c in args.cpus.split(",")]

    sys.path.insert(0, REPO)
    from yetisearch_spark.corpus import write_corpus_parquet

    corpus = os.path.join(args.workdir, f"corpus_{args.turns}")
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        shutil.rmtree(corpus, ignore_errors=True)
        t0 = time.time()
        n = write_corpus_parquet(corpus, args.turns, seed=42)
        open(os.path.join(corpus, "_DONE"), "w").write(str(n))
        print(f"corpus: {n} turns in {time.time()-t0:.1f}s -> {corpus}")

    results = {}
    for cpus in cpu_list:
        index_dir = os.path.join(args.workdir, f"index_{args.turns}_c{cpus}")
        shutil.rmtree(index_dir, ignore_errors=True)
        code = RUN_TEMPLATE.format(repo=REPO, cpus=cpus, corpus=corpus,
                                   index_dir=index_dir)
        print(f"--- building at local[{cpus}] ...")
        proc = subprocess.run([sys.executable, "-c", code],
                              capture_output=True, text=True)
        out = proc.stdout
        line = [l for l in out.splitlines() if l.startswith("RESULT_JSON:")]
        if not line:
            print(proc.stdout[-3000:])
            print(proc.stderr[-3000:])
            raise SystemExit(f"run at {cpus} cpus failed")
        r = json.loads(line[0][len("RESULT_JSON:"):])
        r["turns_per_sec"] = args.turns / r["wall_s"]
        results[cpus] = r
        print(f"local[{cpus}]: {r['wall_s']:.1f}s = {r['turns_per_sec']:.0f} turns/s")

    if len(cpu_list) == 2:
        lo, hi = sorted(cpu_list)
        speedup = results[lo]["wall_s"] / results[hi]["wall_s"]
        eff = speedup / (hi / lo)
        summary = {
            "turns": args.turns,
            "runs": results,
            "speedup": round(speedup, 3),
            "scaling_efficiency": round(eff, 3),
        }
        print(json.dumps(summary))
        # append into the pairs history (scaling_run_latest.json holds
        # every round's pairs; overwriting it cost two restores already)
        path = os.path.join(REPO, "scaling_run_latest.json")
        try:
            with open(path) as f:
                hist = json.load(f)
            assert isinstance(hist.get("pairs"), list)
        except Exception:
            hist = {"pairs": []}
        hist["pairs"].insert(0, {
            "turns": args.turns,
            "n_cores": lo, "n4_cores": hi,
            "t_n_s": round(results[lo]["wall_s"], 1),
            "t_4n_s": round(results[hi]["wall_s"], 1),
            "tps_n": round(results[lo]["turns_per_sec"]),
            "tps_4n": round(results[hi]["turns_per_sec"]),
            "speedup": round(speedup, 3),
            "efficiency": round(eff, 3),
        })
        with open(path, "w") as f:
            json.dump(hist, f, indent=1)


if __name__ == "__main__":
    main()
