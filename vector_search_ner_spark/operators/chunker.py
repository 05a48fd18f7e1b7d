"""Deterministic text chunker — the engine's replacement for the
reference's RecursiveCharacterTextSplitter(chunk_size=300,
chunk_overlap=50) (/root/reference/build_vectorstore.py:50-53,197).

SURVEY §7 hard-point (b): the recursive splitter's hierarchical
separator semantics aren't closed-form; we declare fixed-stride sliding
slices instead (same size/overlap contract, reproducible in ANSI SQL):

    stride   = size - overlap
    n_chunks = 1 + max(0, floor((len - size + stride - 1) / stride))
    chunk_i  = substring(text, i*stride + 1, size)      (i = 0-based)

Pure built-in exprs (sequence + explode = a generator/UDTF shape, no
Python), so chunking 100 TB of text is one narrow JVM map stage (the
per-row sequence/transform evaluates interpreted, but it is O(chunks
per doc), not O(dim × tokens) — see functions/vector.py).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_SIZE = 300
DEFAULT_OVERLAP = 50


def n_chunks_expr(length: Column, size: int, overlap: int) -> Column:
    stride = size - overlap
    extra = F.floor((length - size + stride - 1) / F.lit(stride)).cast("int")
    return (F.lit(1) + F.greatest(F.lit(0), extra)).cast("int")


def chunk_text(
    df: DataFrame,
    text_col: str = "text",
    size: int = DEFAULT_SIZE,
    overlap: int = DEFAULT_OVERLAP,
) -> DataFrame:
    """Explode each row into (…, chunk_index, chunk) rows."""
    stride = size - overlap
    n = n_chunks_expr(F.length(F.col(text_col)), size, overlap)
    idx = F.explode(F.sequence(F.lit(0), n - 1))
    return (
        df.withColumn("chunk_index", idx)
        .withColumn(
            "chunk",
            F.col(text_col).substr(F.col("chunk_index") * stride + 1, F.lit(size)),
        )
    )


def duck_chunk_sql(size: int, overlap: int, table: str = "documents") -> str:
    """DuckDB oracle for chunk_text over `table`(doc_id, text)."""
    stride = size - overlap
    return f"""
SELECT doc_id, CAST(i AS INTEGER) AS chunk_index,
       substring(text, CAST(i AS INTEGER) * {stride} + 1, {size}) AS chunk
FROM (
  SELECT doc_id, text,
         unnest(generate_series(0,
           GREATEST(0, CAST(floor((length(text) - {size} + {stride - 1}) / {stride}.0) AS INTEGER))
         )) AS i
  FROM {table}
)
"""
