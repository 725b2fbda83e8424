"""Micro-bench: signature kernels/sec, per-row digest loop vs the
batch-vectorized round-5 kernels (no Spark session needed — drives the
pandas batch functions directly).

Usage: python scripts/bench_signatures.py [n_docs]
"""
import sys
import time

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

from yetisearch_spark.dedup import (_MERSENNE, _minhash_params,  # noqa: E402
                                    _stable_hash64)


def old_minhash_batch(texts, num_hashes=128, shingle=5, seed=7):
    """The pre-round-5 per-row kernel (one blake2b per shingle)."""
    a, b = _minhash_params(num_hashes, seed)

    def signature(text):
        t = " ".join((text or "").lower().split())
        if len(t) < shingle:
            t = t + " " * (shingle - len(t))
        views = [t[i:i + shingle] for i in range(len(t) - shingle + 1)]
        hashes = np.array([_stable_hash64(s) for s in set(views)],
                          dtype=np.uint64)
        if hashes.size == 0:
            return [0] * num_hashes
        vals = (hashes[:, None] * a[None, :] + b[None, :]) % _MERSENNE
        return vals.min(axis=0).astype(np.int64).tolist()

    return pd.Series([signature(t) for t in texts])


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    rng = np.random.default_rng(5)
    vocab = [f"tok{i}" for i in range(5000)]
    texts = [" ".join(rng.choice(vocab, size=120)) for _ in range(n)]
    s = pd.Series(texts)

    import pyspark.sql.functions as PF

    import yetisearch_spark.dedup as D
    orig = PF.pandas_udf
    PF.pandas_udf = lambda *a, **k: (lambda f: f)
    try:
        new_kernel = D.make_minhash_udf(num_hashes=128, shingle=5, seed=7)
    finally:
        PF.pandas_udf = orig

    t0 = time.time()
    old_minhash_batch(texts)
    t_old = time.time() - t0
    t0 = time.time()
    new_kernel(s)
    t_new = time.time() - t0
    print({"docs": n,
           "old_sigs_per_sec": round(n / t_old, 1),
           "new_sigs_per_sec": round(n / t_new, 1),
           "speedup": round(t_old / t_new, 1)})


if __name__ == "__main__":
    main()
