"""Context-window document chunking: split each document's token stream
into fixed-size chunks with a configurable overlap — the standard
prepare-for-pretraining / RAG-indexing transform.

Pure ``pyspark.sql.functions`` expressions (split → sequence →
posexplode → slice → array_join): the whole operator stays inside
whole-stage codegen, no Python in the hot path, and it is embarrassingly
parallel — no shuffle at all, every document chunks inside its scan
partition.  At 100 TB this is a map-only pass whose output partitioning
matches the input's.

Deterministic, so a SQL oracle replays it exactly (DuckDB:
regexp_split_to_array + generate_series + list_slice).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def chunk_documents(
    docs: DataFrame,
    text_col: str = "text",
    chunk_tokens: int = 64,
    overlap: int = 16,
) -> DataFrame:
    """Explode each document into overlapping fixed-size token chunks.

    Chunk ``k`` covers tokens ``[k*stride, k*stride + chunk_tokens)``
    with ``stride = chunk_tokens - overlap``; the last chunk starts at
    the final stride position that still introduces new tokens, so every
    token appears in at least one chunk and no chunk is empty.  A
    document shorter than ``chunk_tokens`` yields exactly one chunk.

    Adds ``chunk_id`` (0-based), ``n_chunks``, ``chunk_text`` and
    ``chunk_len`` (token count) next to the input columns.
    """
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    stride = chunk_tokens - overlap
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")
    n_tok = F.size(toks)
    # number of stride positions that introduce new tokens:
    # ceil(max(n_tok - overlap, 1) / stride)
    n_chunks = F.greatest(
        F.ceil((n_tok - F.lit(overlap)).cast("double") / F.lit(stride)),
        F.lit(1),
    ).cast("int")
    with_arr = docs.withColumn("__toks", toks).withColumn("__nc", n_chunks)
    chunk = F.slice(
        F.col("__toks"), F.col("chunk_id") * F.lit(stride) + 1, F.lit(chunk_tokens)
    )
    return (
        with_arr.select(
            "*",
            F.explode(F.sequence(F.lit(0), F.col("__nc") - 1)).alias("chunk_id"),
        )
        .select(
            *[c for c in docs.columns],
            F.col("chunk_id"),
            F.col("__nc").alias("n_chunks"),
            F.array_join(chunk, " ").alias("chunk_text"),
            F.size(chunk).alias("chunk_len"),
        )
    )
