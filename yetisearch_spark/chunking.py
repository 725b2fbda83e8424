"""Document chunking (reference: src/Index/Indexer.php:270-362,385-445).

Auto-chunking splits long text on sentence boundaries
(``(?<=[.!?])\\s+``), greedily packs sentences into chunks of at most
``chunk_size`` characters and carries a trailing-word overlap of
``chunk_overlap`` characters into the next chunk — byte-for-byte the
reference's chunkContent/getOverlapText algorithm. Pre-chunked ingestion
explodes a caller-provided ``chunks`` array column.

Chunk identity follows the reference: chunk id = ``{id}#chunk{i}`` with
``parent_id``/``chunk_index``/``is_chunk`` metadata and ``route`` set to
the parent id so the A7 dedup-by-route roll-up regroups chunks of one
document (reference: SearchEngine.php:1112-1169 consumes exactly this).

NOTE: this module must not use ``from __future__ import annotations`` —
the pandas UDF needs real type hints (pyspark 4.1 inference).
"""

import re

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType

DEFAULT_CHUNK_SIZE = 1000
DEFAULT_CHUNK_OVERLAP = 100

_SENTENCE_RE = re.compile(r"(?<=[.!?])\s+")


def chunk_text(text, chunk_size=DEFAULT_CHUNK_SIZE,
               overlap=DEFAULT_CHUNK_OVERLAP):
    """Pure-Python twin of the reference chunkContent (Indexer.php:391-427)."""
    if not isinstance(text, str):
        return []
    sentences = [s for s in _SENTENCE_RE.split(text) if s]
    chunks = []
    current = ""
    current_size = 0
    for sentence in sentences:
        ssize = len(sentence)
        if current_size + ssize > chunk_size and current:
            chunks.append(current.strip())
            overlap_text = _overlap_text(current, overlap)
            current = overlap_text + " " + sentence
            current_size = len(current)
        else:
            current += " " + sentence
            current_size += ssize + 1
    if current.strip():
        chunks.append(current.strip())
    return chunks


def _overlap_text(text, overlap_size):
    """Trailing words of ``text`` totalling ≥ overlap_size chars
    (reference getOverlapText, Indexer.php:429-445)."""
    if len(text) <= overlap_size:
        return text
    words = text.split(" ")
    out = []
    size = 0
    for w in reversed(words):
        if size >= overlap_size:
            break
        out.insert(0, w)
        size += len(w) + 1
    return " ".join(out)


def should_chunk(text, chunk_size=DEFAULT_CHUNK_SIZE):
    """Reference shouldChunkContent (Indexer.php:385-389)."""
    return isinstance(text, str) and len(text) > chunk_size


def make_chunk_udf(chunk_size=DEFAULT_CHUNK_SIZE,
                   overlap=DEFAULT_CHUNK_OVERLAP):
    @pandas_udf(ArrayType(StringType()))
    def chunk_udf(texts: pd.Series) -> pd.Series:
        return pd.Series(
            [chunk_text(t, chunk_size, overlap) if should_chunk(t, chunk_size)
             else [t if isinstance(t, str) else ""]
             for t in texts], index=texts.index)
    return chunk_udf


def chunk_documents(df: DataFrame, text_col: str = "text",
                    id_cols=("conv_id", "turn_idx"), *,
                    chunk_size: int = DEFAULT_CHUNK_SIZE,
                    overlap: int = DEFAULT_CHUNK_OVERLAP) -> DataFrame:
    """Explode long documents into chunk rows ready for build_index.

    Output schema: the input columns with ``text_col`` replaced by the
    chunk text, plus parent_id (the original ``{id_cols}`` identity),
    chunk_index, is_chunk, and route = parent_id for chunked docs (None
    for pass-through docs, matching the reference which only tags actual
    chunks). Chunk identity for the index build: conv_id = parent_id,
    turn_idx = chunk_index — unique and stably ordered."""
    parent_id = F.concat_ws("#", *[F.col(c).cast("string") for c in id_cols])
    chunked = (df
               .withColumn("parent_id", parent_id)
               .withColumn("_chunks",
                           make_chunk_udf(chunk_size, overlap)(F.col(text_col)))
               .select("*", F.posexplode("_chunks").alias("chunk_index",
                                                          "_chunk_text"))
               .withColumn("is_chunk", F.size("_chunks") > 1)
               .drop("_chunks", text_col)
               .withColumnRenamed("_chunk_text", text_col)
               .withColumn("route", F.when(F.col("is_chunk"),
                                           F.col("parent_id"))))
    return chunked


def explode_prechunked(df: DataFrame, chunks_col: str = "chunks",
                       text_col: str = "text",
                       id_cols=("conv_id", "turn_idx")) -> DataFrame:
    """Pre-chunked ingestion (reference Indexer.php:270-325): the caller
    supplies an array<string> column of chunks; rows explode into chunk
    docs with the same parent/route metadata as auto-chunking."""
    parent_id = F.concat_ws("#", *[F.col(c).cast("string") for c in id_cols])
    return (df
            .withColumn("parent_id", parent_id)
            .select("*", F.posexplode(chunks_col).alias("chunk_index",
                                                        "_chunk_text"))
            .withColumn("is_chunk", F.lit(True))
            .drop(chunks_col, *( [text_col] if text_col in df.columns else []))
            .withColumnRenamed("_chunk_text", text_col)
            .withColumn("route", F.col("parent_id")))
