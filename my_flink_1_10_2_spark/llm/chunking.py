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
    token appears in at least one chunk.  A document shorter than
    ``chunk_tokens`` yields exactly one chunk; an empty or
    whitespace-only document yields one chunk with ``chunk_text = ''``
    and ``chunk_len = 0`` (every document survives chunking — filter
    ``chunk_len > 0`` downstream if empties are unwanted).

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


def fim_split(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Fill-in-the-middle (PSM) pretraining transform: deterministically
    split each document's token stream into (prefix, middle, suffix) so
    the trainer can emit ``prefix ⊕ suffix ⊕ middle`` with sentinel
    tokens.  Cut points derive from two salted md5 hashes of the id —
    retry-stable, uniformly distributed, and exactly replayable by a SQL
    oracle (0 <= p1 <= p2 <= n via nested modulos).

    Map-only: no shuffle, no Python; returns the input id with
    (n_tokens, p1, p2, prefix, middle, suffix) as space-joined strings.
    """
    toks = F.filter(F.split(F.col(text_col), r"\s+"), lambda t: t != "")

    def hash_int(salt: str):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt), F.col(id_col).cast("string"))), 1, 15
            ),
            16,
            10,
        ).cast("bigint")

    n = F.size(toks)
    p1 = hash_int("fim1:") % (n + 1)
    with_cuts = docs.select(
        id_col,
        toks.alias("__t"),
        n.alias("n_tokens"),
        p1.alias("p1"),
        (p1 + hash_int("fim2:") % (n - p1 + 1)).alias("p2"),
    )
    return with_cuts.select(
        id_col,
        "n_tokens",
        "p1",
        "p2",
        F.array_join(F.slice("__t", 1, F.col("p1")), " ").alias("prefix"),
        F.array_join(
            F.slice("__t", F.col("p1") + 1, F.col("p2") - F.col("p1")), " "
        ).alias("middle"),
        F.array_join(
            F.slice("__t", F.col("p2") + 1, F.col("n_tokens") - F.col("p2")), " "
        ).alias("suffix"),
    )
