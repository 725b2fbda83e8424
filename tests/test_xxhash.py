"""Pure-Python XXH64 must match Spark's xxhash64 bit-for-bit (bucket
pruning depends on it)."""

import random
import string

from pyspark.sql import functions as F

from yetisearch_spark.xxhash64 import bucket_of, spark_xxhash64


def test_matches_spark(spark):
    rng = random.Random(42)
    words = (["", "a", "ab", "abc", "abcd", "data", "café", "日本語",
              "don't", "re-use", "x" * 7, "y" * 8, "z" * 31, "w" * 32,
              "v" * 33, "u" * 100]
             + ["".join(rng.choices(string.ascii_lowercase + "éü'-",
                                    k=rng.randint(1, 60)))
                for _ in range(80)])
    rows = (spark.createDataFrame([(w,) for w in words], "s string")
            .select("s", F.xxhash64("s").alias("h"),
                    F.pmod(F.xxhash64("s"), F.lit(32)).cast("int").alias("b"))
            .collect())
    for r in rows:
        assert spark_xxhash64(r["s"]) == r["h"], r["s"]
        assert bucket_of(r["s"], 32) == r["b"], r["s"]
