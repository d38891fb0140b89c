"""Okapi BM25 document ranking — the length-normalized keyword scorer a
training-data pipeline uses for query-based corpus curation (pulling
topical subsets out of a web crawl) and for search-style eval sets.
TF-IDF (``queries/llm.py::q_tfidf_top_terms``) weighs terms per
document; BM25 additionally saturates term frequency (``k1``) and
normalizes by document length against the corpus mean (``b``) —
Robertson & Zaragoza, "The probabilistic relevance framework: BM25 and
beyond", FnTIR 2009.  The reference has no ranking operator; this is
part of the pipeline surface the brief adds on top of its relational
core.

Float discipline (what makes the DuckDB oracle exact, not approximate):

  - tf, df, dl, N are exact integers computed by grouped counts;
  - ``avgdl`` is ONE double division of two exact integers — identical
    IEEE result in any engine;
  - ``idf = ln((N - df + 0.5)/(df + 0.5) + 1)`` (the Lucene/ATIRE
    non-negative form) is evaluated by **glibc's log** via an
    Arrow-batched pandas UDF calling ``math.log`` — bitwise identical
    to DuckDB's ``ln`` (both bind libm; the JVM's ``Math.log``
    intrinsic differs by 1 ulp on ~7% of inputs, so engine-side
    ``F.log`` is NOT used).  The UDF runs on the per-term df relation —
    O(|query terms|) rows, never document-sized;
  - the per-(doc, term) score is a fixed parenthesization of IEEE
    mul/div on identical operands — bitwise reproducible;
  - per-doc totals quantize each term score to 1e-6 integer units
    first, so the SUM is exact BIGINT arithmetic, immune to
    partition-order float reassociation.

Round-12 note: an r11 rewrite fused dl/tf into ONE conditional-agg
corpus pass; the driver's bench measured it consistently SLOWER at
sf0.1 (r11: 2.14->3.46 s driver-normalized; r12 interleaved A/B:
old 1.26 s vs new 1.49 s medians) - the |terms| conditional sums
per doc plus the struct explode cost more than the extra tokenize
passes they save, so the dl/tf split below is the keeper.

Scale shape: tokenize → explode → (doc, term) partial-agg shuffle
(map-side combine), a |terms|-row broadcast for df/idf, one broadcast
scalar for (N, avgdl) — the corpus-sized relation shuffles once, on the
(doc_id, term) key.
"""

from __future__ import annotations

import math

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType


def _bm25_idf():
    """idf(term) = ln((N - df + 0.5)/(df + 0.5) + 1.0) via libm log —
    element-wise math.log so any libm-bound engine (DuckDB, Postgres)
    reproduces the exact bits.  Arrow-batched; callers apply it to the
    tiny per-term df relation only.  Built lazily (pandas_udf needs an
    active session)."""

    def kernel(df_: pd.Series, n: pd.Series) -> pd.Series:
        return pd.Series(
            [
                math.log((float(nv) - float(d) + 0.5) / (float(d) + 0.5) + 1.0)
                for d, nv in zip(df_, n)
            ],
            dtype="float64",
        )

    return pandas_udf(kernel, DoubleType())


def tokenize(text_col) -> F.Column:
    """Whitespace tokens of lowercased text, empties dropped — the same
    tokenization as the TF-IDF and text-stats operators so corpus
    statistics agree across the pipeline."""
    return F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")


def bm25_term_scores(
    docs: DataFrame,
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-(document, query-term) BM25 partial scores.

    Returns (id_col, term, tf, dl, score, score_e6) for every document
    containing the term: ``score`` is the exact-IEEE double BM25 term
    contribution, ``score_e6`` its 1e-6 integer quantization (the
    summable form).  Documents with no query term produce no rows.
    """
    if not terms:
        raise ValueError("bm25_term_scores: need at least one query term")
    # A duplicate query term would emit duplicate (doc, term) rows under
    # a conditional-agg formulation and double that term's document
    # frequency; the isin+groupBy(id, term) shape below collapses them,
    # but dedup at entry anyway so the API contract is explicit (first
    # occurrence wins, order kept).
    terms = list(dict.fromkeys(terms))
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("term")
    )
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    tf = (
        toks.where(F.col("term").isin(terms))
        .groupBy(id_col, "term")
        .agg(F.count("*").alias("tf"))
    )
    # N over ALL documents, avgdl over all docs' lengths (docs with no
    # query term still shape the statistics) — one tiny aggregate.
    stats = docs.select(F.count("*").alias("n")).crossJoin(
        dl.agg(F.sum("dl").alias("dl_sum"))
    )
    dfreq = (
        tf.groupBy("term")
        .agg(F.count("*").alias("df"))
        .crossJoin(F.broadcast(stats))
        .withColumn("idf", _bm25_idf()(F.col("df"), F.col("n")))
    )
    avgdl = F.col("dl_sum").cast("double") / F.col("n").cast("double")
    # Fixed parenthesization — the oracle spells the same tree:
    #   tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    tf_d = F.col("tf").cast("double")
    dl_d = F.col("dl").cast("double")
    score = (F.col("idf") * (tf_d * F.lit(k1 + 1.0))) / (
        tf_d + F.lit(k1) * (F.lit(1.0 - b) + (F.lit(b) * dl_d) / avgdl)
    )
    return (
        tf.join(dl, id_col)
        .join(F.broadcast(dfreq), "term")
        .withColumn("score", score)
        .withColumn("score_e6", F.round(F.col("score") * 1e6).cast("bigint"))
        .select(id_col, "term", "tf", "dl", "score", "score_e6")
    )


def bm25_rank(
    docs: DataFrame,
    terms: list[str],
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents for the query ``terms`` by total BM25.

    Totals sum the exact 1e-6 integer term scores (order-independent),
    rank ties break on ``id_col``.  Returns
    (id_col, dl, n_terms_hit, score_e6, rank).

    Plan: the global top-k is ``orderBy().limit(k)`` — Spark's
    TakeOrderedAndProject keeps k rows per partition then merges, so no
    single-task window ever sees the corpus-sized totals relation; the
    rank column is a window over the k surviving rows only.
    """
    from pyspark.sql import Window

    per_term = bm25_term_scores(docs, terms, k1, b, text_col, id_col)
    totals = per_term.groupBy(id_col).agg(
        F.max("dl").alias("dl"),
        F.count("*").alias("n_terms_hit"),
        F.sum("score_e6").alias("score_e6"),
    )
    order = [F.col("score_e6").desc(), F.col(id_col)]
    topk = totals.orderBy(*order).limit(k)
    return topk.withColumn(
        "rank", F.row_number().over(Window.orderBy(*order))
    )
