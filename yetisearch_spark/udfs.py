"""Vectorized pandas-UDF factories.

NOTE: this module intentionally does NOT use ``from __future__ import
annotations`` — PySpark's pandas-UDF type-hint inference needs real
(non-stringified) annotations to infer the eval type.
"""

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import (ArrayType, IntegerType, StringType,
                               StructField, StructType)

from .analyzer import analyze_batch

POSTING_STRUCT = ArrayType(StructType([
    StructField("term", StringType()),
    StructField("tf", IntegerType()),
    StructField("positions", ArrayType(IntegerType())),
]))


def make_analyze_udf():
    """text column → array<string> of analyzed index terms."""

    @pandas_udf(ArrayType(StringType()))
    def analyze_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(analyze_batch(texts.tolist()), index=texts.index)

    return analyze_udf


def make_postings_udf():
    """tokens array → array<(term, tf, positions)> per row (zero-shuffle
    per-document posting aggregation)."""

    @pandas_udf(POSTING_STRUCT)
    def postings_udf(token_lists: pd.Series) -> pd.Series:
        out = []
        for tokens in token_lists:
            if tokens is None or len(tokens) == 0:
                out.append([])
                continue
            agg = {}
            for pos, t in enumerate(tokens):
                agg.setdefault(t, []).append(pos)
            out.append([(t, len(p), p) for t, p in agg.items()])
        return pd.Series(out, index=token_lists.index)

    return postings_udf
