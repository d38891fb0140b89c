"""Deduplication operators: exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design (the whole point at 100 TB):
  - exact dedup         — one hash-groupBy shuffle on the digest.
  - n-gram Jaccard      — explode shingles → self-join on shingle →
                          pair-count aggregation.  Shuffles are keyed on
                          shingle then (doc1,doc2); no cartesian product.
  - MinHash + LSH       — shingle → k minhashes (one groupBy) → band
                          buckets → join within buckets only.  Candidate
                          set is O(collisions), not O(n²).
  - SimHash             — 64-bit signed-bit signature per doc, bucketed by
                          signature band for near-dup candidate pairs.

Hash functions are built from md5 (identical across engines) so every
step is deterministic and oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on content digest: keep the smallest id per digest
    (one shuffle on the 128-bit digest; ids never collide across groups).
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("digest"))
        .agg(F.min(id_col).alias(id_col), F.count(F.lit(1)).alias("dup_count"))
    )


def shingle_rows(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Exploded (id, shingle) word n-gram rows, duplicates kept.

    posexplode + null-safe ``F.get`` lookups instead of
    transform(sequence, i -> concat_ws(slice(...))): the higher-order
    -function chain is interpreted per element (no codegen) and measured
    ~5× slower than this flat projection at sf0.1.  The repartition fans
    the docs out first — a single parquet file otherwise pins the whole
    hash-heavy downstream to one task; it shuffles only (id, text).
    """
    words = F.split(F.col(text_col) if isinstance(text_col, str) else text_col, r"\s+")
    return (
        _doc_fanout(df, id_col)
        .select(F.col(id_col), words.alias("__w"))
        .select(id_col, F.col("__w"), F.posexplode("__w").alias("__i", "__w0"))
        .where(F.col("__i") <= F.greatest(F.size("__w") - n, F.lit(0)))
        .select(
            F.col(id_col),
            F.concat_ws(
                " ", "__w0", *[F.get("__w", F.col("__i") + k) for k in range(1, n)]
            ).alias("shingle"),
        )
    )


def shingles(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3) -> DataFrame:
    """Distinct word n-gram shingles per document (explode → distinct).

    Output: (id, shingle).  The explode happens JVM-side (Generate node);
    the distinct is one shuffle of O(shingles) rows keyed (id, shingle).
    """
    return shingle_rows(df, text_col, id_col, n).distinct()


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Near-duplicate pairs by exact n-gram Jaccard similarity.

    |A ∩ B| via a self-join on shingle; |A ∪ B| = |A| + |B| − |A ∩ B|.
    Returns (doc1, doc2, jaccard) with doc1 < doc2, jaccard ≥ threshold.
    """
    sh = shingles(df, text_col, id_col, n).cache()
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("sz"))
    a = sh.select(F.col(id_col).alias("doc1"), "shingle")
    b = sh.select(F.col(id_col).alias("doc2"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc1") < F.col("doc2"))
        .groupBy("doc1", "doc2")
        .agg(F.count(F.lit(1)).alias("inter_sz"))
    )
    sa = sizes.select(F.col(id_col).alias("doc1"), F.col("sz").alias("sz1"))
    sb = sizes.select(F.col(id_col).alias("doc2"), F.col("sz").alias("sz2"))
    return (
        inter.join(sa, "doc1")
        .join(sb, "doc2")
        .select(
            "doc1",
            "doc2",
            (F.col("inter_sz") / (F.col("sz1") + F.col("sz2") - F.col("inter_sz"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def containment_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 4,
    threshold_num: int = 8,
    threshold_den: int = 10,
) -> DataFrame:
    """Directed shingle containment pairs: |A ∩ B| / |A| >= num/den over
    distinct word n-gram shingles — the doc-inside-doc case (quotes,
    concatenations, boilerplate wrappers) that symmetric Jaccard
    under-scores when |A| << |B| (Broder's resemblance/containment
    distinction).

    Output: (doc_a, doc_b, inter_sz, sz_a, sz_b) with doc_a contained in
    doc_b; both directions are emitted independently.  Same scale shape
    as :func:`ngram_jaccard_pairs` — shared-shingle equi-join, integer
    cross-multiplied threshold, no cartesian, no floats.
    """
    sh = shingles(df, text_col, id_col, n).cache()
    sz = sh.groupBy(id_col).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    x = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    y = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        x.join(y, "shingle")
        .where(F.col("doc_a") != F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).cast("bigint").alias("inter_sz"))
    )
    sa = sz.select(F.col(id_col).alias("doc_a"), F.col("n").alias("sz_a"))
    sb = sz.select(F.col(id_col).alias("doc_b"), F.col("n").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .where(
            F.lit(threshold_den) * F.col("inter_sz")
            >= F.lit(threshold_num) * F.col("sz_a")
        )
        .select("doc_a", "doc_b", "inter_sz", "sz_a", "sz_b")
    )


def _doc_fanout(df: DataFrame, id_col: str) -> DataFrame:
    """Hash-fan the documents out BEFORE the hash-heavy per-doc work
    (shingle explode, md5 chains).  An explicit partition count is used
    because ``repartition(col)`` without one is AQE-coalescible: on
    small inputs the coalescer folds the exchange to one or two
    partitions and the md5-dominated downstream serializes (measured 10
    tasks end-to-end for the spans query at sf0.1).  The count is
    scale-adaptive — the larger of the session's configured shuffle
    parallelism and the core count — never a local-mode constant."""
    spark = df.sparkSession
    target = max(
        spark.sparkContext.defaultParallelism,
        int(spark.conf.get("spark.sql.shuffle.partitions", "200")),
    )
    return df.repartition(target, F.col(id_col))


def _md5_hash64(col, seed: int):
    """Deterministic 60-bit hash from md5(seed || value) — engine-portable
    (DuckDB computes the identical md5)."""
    hx = F.substring(F.md5(F.concat(F.lit(str(seed) + "|"), col)), 1, 15)
    return F.conv(hx, 16, 10).cast("bigint")


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
) -> DataFrame:
    """MinHash signature per document: sig[i] = min over shingles of
    h_i(shingle).

    Scale design — MAP-ONLY: the per-doc shingle array is built in place
    (same enumeration as :func:`shingle_rows`: one gram per start
    position, short docs yield their single truncated gram), md5 digests
    are computed per GROUP of 4 hashes, and each signature slot is an
    ``array_min`` over the fixed-width hex chunks.  No explode, no
    aggregate operator, no exchange beyond the doc fan-out repartition —
    at 100 TB the signature pass is one scan.  The previous
    explode + groupBy(16 × min(string)) formulation planned a
    SortAggregate pair (var-width min buffers disqualify
    HashAggregate) and measured 1.64 s vs 1.28 s for this at sf0.1.

    min() over the fixed-width lowercase-hex chunks equals min() over
    their numeric values (hex digits order lexicographically ==
    numerically at fixed width), so the hex→bigint conversion stays
    deferred to AFTER the min: num_hashes `conv` calls per DOC, not per
    shingle (per-shingle conv measured 45%% slower end to end).

    Per-task memory bound: the in-row gram array plus its ``groups``
    parallel digest arrays cost ~128+ bytes per shingle per doc (for 16
    hashes) — per-task memory scales with the LONGEST document, where
    the exploded path streamed one shingle per row.  Web-scale corpora
    with multi-million-word outlier documents should cap or segment
    such docs upstream before this pass.

    Output: (id, sig array<bigint>).
    """
    groups = num_hashes // 4
    words = F.split(
        F.col(text_col) if isinstance(text_col, str) else text_col, r"\s+"
    )
    # same row set as the exploded path: null-text docs produce no row
    base = (
        _doc_fanout(df, id_col)
        .select(F.col(id_col), words.alias("__w"))
        .where(F.col("__w").isNotNull())
    )
    n_grams = F.greatest(F.size("__w") - (n - 1), F.lit(1))
    # one shingle per start position; F.get returns NULL past the end and
    # concat_ws skips NULLs — identical gram strings to shingle_rows
    grams = F.transform(
        F.sequence(F.lit(0), n_grams - 1),
        lambda i: F.concat_ws(
            " ", *[F.get(F.col("__w"), i + k) for k in range(n)]
        ),
    )
    cur = base.select(F.col(id_col), grams.alias("__sh"))
    for g in range(groups):
        seed = F.lit(f"{g}|")
        cur = cur.withColumn(
            f"__d{g}",
            F.transform(
                F.col("__sh"),
                (lambda sd: lambda s: F.md5(F.concat(sd, s)))(seed),
            ),
        )
    mins = []
    for i in range(num_hashes):
        g, lo = i // 4, (i % 4) * 8 + 1
        mins.append(
            F.array_min(
                F.transform(
                    F.col(f"__d{g}"),
                    (lambda off: lambda x: F.substring(x, off, 8))(lo),
                )
            )
        )
    return cur.select(
        F.col(id_col),
        F.array(*[F.conv(m, 16, 10).cast("bigint") for m in mins]).alias("sig"),
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 16,
    bands: int = 4,
    threshold: float = 0.5,
) -> DataFrame:
    """MinHash + LSH banding near-dup candidates, verified by estimated
    Jaccard (fraction of matching minhashes).

    Signatures are split into ``bands``; docs sharing any band bucket are
    candidates (join keyed on (band_idx, band_hash) — the LSH trick that
    replaces the O(n²) comparison).  Returns (doc1, doc2, est_jaccard).
    """
    rows = num_hashes // bands
    sig = minhash_signatures(df, text_col, id_col, n, num_hashes).cache()
    band_entries = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(b).alias("band"),
                    F.concat_ws(",", *[F.col("sig")[b * rows + r].cast("string") for r in range(rows)]).alias(
                        "band_key"
                    ),
                )
                for b in range(bands)
            ]
        )
    ).alias("bk")
    banded = sig.select(F.col(id_col), F.col("sig"), band_entries).select(
        F.col(id_col), "sig", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )
    a = banded.select(
        F.col(id_col).alias("doc1"), F.col("sig").alias("sig1"), "band", "band_key"
    )
    b = banded.select(
        F.col(id_col).alias("doc2"), F.col("sig").alias("sig2"), "band", "band_key"
    )
    cand = (
        a.join(b, ["band", "band_key"])
        .filter(F.col("doc1") < F.col("doc2"))
        .select("doc1", "doc2", "sig1", "sig2")
        .distinct()
    )
    est = F.size(
        F.filter(F.zip_with("sig1", "sig2", lambda x, y: x == y), lambda m: m)
    ) / F.lit(float(num_hashes))
    return (
        cand.select("doc1", "doc2", est.alias("est_jaccard"))
        .filter(F.col("est_jaccard") >= threshold)
    )


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 32) -> DataFrame:
    """SimHash signature: per token hash, each bit votes ±1; the signature
    bit is 1 where the vote sum is positive.  Pure HOF arithmetic.

    Output: (id, simhash bigint).
    """
    words = F.array_distinct(F.split(F.col(text_col), r"\s+"))
    hashes = F.transform(words, lambda w: _md5_hash64(w, 0))
    def _voter(b: int):
        # bitwise test, not division: double division loses precision on
        # 60-bit hashes.  NB: the lambda must take exactly (acc, h) —
        # Spark's lambda bridge binds one column per parameter.
        mask = F.lit(1 << b)
        return lambda acc, h: acc + F.when(h.bitwiseAND(mask) != 0, 1).otherwise(-1)

    bit_votes = [
        F.aggregate(hashes, F.lit(0).cast("bigint"), _voter(b)) for b in range(bits)
    ]
    sig = None
    for b, vote in enumerate(bit_votes):
        term = F.when(vote > 0, F.lit(2**b).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
        sig = term if sig is None else sig + term
    return df.select(F.col(id_col), sig.alias("simhash"))


def semantic_neardup_pairs_ivf(
    emb: DataFrame,
    threshold: float,
    n_centroids: int = 8,
    scale: int = 1000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Semantic near-duplicate pairs with IVF blocking — the 100 TB
    path for embedding-cosine dedup: instead of the exact all-blocks
    pair join (queries/graph.py::neardup_pairs, O(n²) arithmetic), the
    corpus is coarse-quantized once (integer-exact assignment, see
    llm/similarity.py::_assign_int) and candidate pairs are generated
    ONLY within a centroid bucket, then kept when exact cosine clears
    ``threshold``.

    Scale shape: one shuffle keyed on centroid, within-bucket self-join
    (sum of b_i² pair arithmetic instead of n²), no driver collect.
    Recall vs the exact operator is the usual IVF trade (cross-bucket
    near-dups are missed) — asserted in tests; the SELECTION itself is
    deterministic, so the whole blocked pipeline grades exactly.

    Output: (src, dst, centroid, cosine) with src < dst.
    """
    from my_flink_1_10_2_spark.llm.similarity import (
        _assign_int,
        int_vec,
        kmeans_centroids_int,
    )

    cents = kmeans_centroids_int(
        emb, n_centroids, iterations=0, scale=scale, id_col=id_col, vec_col=vec_col
    )
    bucketed = _assign_int(
        emb.withColumn("__vi", int_vec(F.col(vec_col), scale)), cents
    ).drop("__vi")
    # Score each bucket with ONE blocked GEMM instead of joining the
    # bucket with itself: the self-join shuffles Σ b_i² candidate ROWS
    # each carrying BOTH full vectors, while the grouped kernel shuffles
    # every vector exactly once and does the same Σ b_i² arithmetic
    # inside BLAS (~3× faster at sf0.1, and the shuffled bytes drop from
    # O(pairs·dim) to O(n·dim)).  Memory is bounded by scoring in
    # 2048-row blocks (never the full m×m matrix); parallelism is one
    # task per centroid — size n_centroids to the cluster, the standard
    # IVF dial.
    import numpy as np
    import pandas as pd

    th = float(threshold)
    block = 2048

    def bucket_pairs(pdf: pd.DataFrame) -> pd.DataFrame:
        ids = pdf[id_col].to_numpy()
        mat = np.stack(pdf[vec_col].to_numpy()).astype("float64")
        norms = np.linalg.norm(mat, axis=1)
        cent = pdf["centroid"].iloc[0]
        out_src, out_dst, out_cos = [], [], []
        m = len(ids)
        for lo in range(0, m, block):
            hi = min(lo + block, m)
            # rows [lo:hi] against all columns > row index
            sims = (mat[lo:hi] @ mat.T) / np.outer(norms[lo:hi], norms)
            for r in range(lo, hi):
                row = sims[r - lo, r + 1 :]
                keep = np.nonzero(row >= th)[0] + r + 1
                if len(keep):
                    out_src.append(np.full(len(keep), ids[r]))
                    out_dst.append(ids[keep])
                    out_cos.append(row[keep - r - 1])
        if not out_src:
            return pd.DataFrame(
                {"src": [], "dst": [], "centroid": [], "cosine": []}
            ).astype({"src": "int64", "dst": "int64", "centroid": "int64",
                      "cosine": "float64"})
        src = np.concatenate(out_src)
        dst = np.concatenate(out_dst)
        cos = np.concatenate(out_cos)
        sw = src > dst  # emit src < dst regardless of bucket row order
        return pd.DataFrame(
            {
                "src": np.where(sw, dst, src),
                "dst": np.where(sw, src, dst),
                "centroid": np.full(len(src), cent, dtype="int64"),
                "cosine": cos,
            }
        )

    return (
        bucketed.select(F.col("centroid"), F.col(id_col), F.col(vec_col))
        .groupBy("centroid")
        .applyInPandas(
            bucket_pairs, "src long, dst long, centroid long, cosine double"
        )
    )


def shingle_rows_pos(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Exploded (id, pos, shingle) word n-gram rows with the 0-based start
    position kept — the positional variant of :func:`shingle_rows` that
    exact-substring dedup needs to map duplicated grams back to token
    spans.  Same flat posexplode + ``F.get`` projection (codegen-friendly,
    no per-element higher-order interpretation); documents shorter than
    ``n`` words produce no rows (matching the oracle's empty range).
    """
    words = F.split(F.col(text_col) if isinstance(text_col, str) else text_col, r"\s+")
    return (
        _doc_fanout(df, id_col)
        .select(F.col(id_col), words.alias("__w"))
        .select(id_col, F.col("__w"), F.posexplode("__w").alias("__i", "__w0"))
        .where(F.col("__i") <= F.size("__w") - n)
        .select(
            F.col(id_col),
            F.col("__i").cast("bigint").alias("pos"),
            F.concat_ws(
                " ", "__w0", *[F.get("__w", F.col("__i") + k) for k in range(1, n)]
            ).alias("shingle"),
        )
    )


def duplicated_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Exact-substring duplicate SPANS at word-n-gram granularity — the
    per-document byte-range output of suffix-array exact dedup
    ("Deduplicating Training Data Makes Language Models Better",
    Lee et al., ACL 2022), re-expressed as a shuffle pipeline:

      1. positional n-grams (one explode, no shuffle beyond the doc fanout)
      2. cross-doc spread on a compact 60-bit md5 gram key — the ONLY
         corpus-wide shuffle, keyed on the 8-byte digest instead of the
         raw gram string (at 100 TB the gram strings dominate shuffle
         volume; a digest key cuts it ~10x; go to the full 128-bit md5 to
         make collisions negligible at that scale — 60 bits keeps the
         oracle replay exact here)
      3. duplicated positions merged into MAXIMAL spans with one per-doc
         window (keyed partitionBy — never a single-partition window):
         positions p < q merge iff q <= p + n (their [p, p+n-1] /
         [q, q+n-1] covers touch or overlap).

    Output: (id, span_start, span_end, span_tokens), one row per maximal
    duplicated span.  Spans are exactly the token ranges an exact-substring
    deduplicator would cut.
    """
    from pyspark.sql.window import Window

    grams = shingle_rows_pos(df, text_col, id_col, n)
    keyed = grams.select(
        F.col(id_col), F.col("pos"), _md5_hash64(F.col("shingle"), 0).alias("__k")
    )
    spread = (
        keyed.select(id_col, "__k")
        .distinct()
        .groupBy("__k")
        .agg(F.count(F.lit(1)).alias("__docs"))
        .where(F.col("__docs") >= min_docs)
        .select("__k")
    )
    # no distinct: (id, pos) is unique by construction (one shingle per
    # position) and `spread` has one row per __k (groupBy output), so the
    # join cannot duplicate — the dedup exchange it planned was a no-op
    # over the corpus-sized hit relation
    hits = keyed.join(spread, "__k").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    flagged = (
        hits.withColumn("__prev", F.lag("pos").over(w))
        .withColumn(
            "__brk",
            F.when(
                F.col("__prev").isNull() | (F.col("pos") - F.col("__prev") > n), 1
            ).otherwise(0),
        )
        .withColumn("__sid", F.sum("__brk").over(w))
    )
    return (
        flagged.groupBy(id_col, "__sid")
        .agg(
            F.min("pos").cast("bigint").alias("span_start"),
            (F.max("pos") + n - 1).cast("bigint").alias("span_end"),
            (F.max("pos") + n - F.min("pos")).cast("bigint").alias("span_tokens"),
        )
        .select(id_col, "span_start", "span_end", "span_tokens")
    )


def duplicated_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 8,
    min_docs: int = 2,
) -> DataFrame:
    """Per-document exact-substring duplicate COVERAGE: how many tokens a
    suffix-array-style exact deduplicator would remove (union of the
    maximal spans from :func:`duplicated_spans`), as an exact integer and
    an exact 1e-6-unit fraction (integer division — bitwise stable under
    any aggregation order).  Documents with no duplicated span are kept
    with covered_tokens = 0 (left join), so the output is a total audit
    of the corpus, not just the offenders.

    Output: (id, n_tokens, covered_tokens, cov_frac_e6).
    """
    spans = duplicated_spans(df, text_col, id_col, n, min_docs)
    cov = spans.groupBy(id_col).agg(
        F.sum("span_tokens").cast("bigint").alias("covered_tokens")
    )
    toks = df.select(
        F.col(id_col),
        F.size(F.split(F.col(text_col), r"\s+")).cast("bigint").alias("n_tokens"),
    )
    return (
        toks.join(cov, id_col, "left")
        .na.fill({"covered_tokens": 0})
        .select(
            F.col(id_col),
            "n_tokens",
            "covered_tokens",
            F.expr(
                "CAST(covered_tokens * 1000000 DIV greatest(n_tokens, 1) AS BIGINT)"
            ).alias("cov_frac_e6"),
        )
    )


def winnowing_fingerprints(
    docs: DataFrame,
    k: int = 4,
    window: int = 5,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003 — the MOSS local fingerprinting scheme): hash every
    word ``k``-gram, slide a ``window`` over consecutive gram hashes,
    and select each window's minimum (rightmost position on ties).
    The guarantee: any shared substring of at least ``k + window - 1``
    tokens between two documents shares at least one selected
    fingerprint — positional robustness that a single whole-document
    rolling hash (text.fingerprint) lacks, with a fingerprint density
    of ~2/(window+1) instead of all-grams.

    Engine-exact selection: gram hashes are 40-bit md5 prefixes packed
    with the (bit-inverted) position into one BIGINT, so the window MIN
    implements min-hash + rightmost-tie in a single integer compare —
    both engines agree bitwise.

    Scale shape: tokenize scan -> per-doc keyed window (partitioned by
    document, never a global window) -> distinct on the packed key ->
    per-doc aggregate.

    Output: (id, n_grams, n_fps, fp_hash_sum) — one row per document
    with at least one full window.
    """
    from pyspark.sql import Window

    toks = F.filter(F.split(F.lower(text_col), r"\s+"), lambda t: t != "")
    grams = (
        docs.select(id_col, toks.alias("__t"))
        .where(F.size("__t") >= k)
        .select(
            id_col,
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.size("__t") - k),
                    lambda i: F.concat_ws(
                        " ", F.slice(F.col("__t"), i + 1, k)
                    ),
                )
            ).alias("pos", "gram"),
        )
    )
    h = F.conv(F.substring(F.md5("gram"), 1, 10), 16, 10).cast("bigint")
    # pack: minimize hash, then prefer the RIGHTMOST position on ties
    key = h * F.lit(1048576) + (F.lit(1048575) - F.col("pos"))
    keyed = grams.select(id_col, F.col("pos"), key.alias("__key"))
    w = (
        Window.partitionBy(id_col)
        .orderBy("pos")
        .rowsBetween(-(window - 1), 0)
    )
    full = F.row_number().over(Window.partitionBy(id_col).orderBy("pos"))
    selected = (
        keyed.select(
            id_col,
            F.min("__key").over(w).alias("__sel"),
            full.alias("__rn"),
        )
        .where(F.col("__rn") >= window)
        .select(id_col, "__sel")
        .distinct()
    )
    n_grams = keyed.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_grams"))
    fps = selected.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_fps"),
        # integer div, NOT float division: packed keys reach 2^60 and a
        # double round-trip would corrupt hashes above 2^53
        F.sum(F.expr("__sel DIV 1048576")).alias("fp_hash_sum"),
    )
    return n_grams.join(fps, id_col).select(
        id_col,
        F.col("n_grams").cast("bigint").alias("n_grams"),
        F.col("n_fps").cast("bigint").alias("n_fps"),
        F.col("fp_hash_sum").cast("bigint").alias("fp_hash_sum"),
    )


def set_similarity_join(
    docs: DataFrame,
    threshold: float = 0.6,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """All-pairs set-similarity self-join with PREFIX FILTERING
    (Chaudhuri/Ganti/Kaushik ICDE 2006; Bayardo/Ma/Srikant WWW 2007's
    all-pairs recipe): find every document pair whose 3-gram shingle-SET Jaccard
    clears ``threshold`` without the O(n²) cross join (shingle sets,
    not unigram sets: the fixture's small vocabulary makes unigram
    Jaccard dense, while the shingle space keeps honest sparsity — the
    same reason MinHash shingles).

    The filter: order every document's distinct shingles by ascending
    global document frequency (rarest first, ties lexicographic); two
    sets with Jaccard >= t MUST share a token within each one's first
    ``|x| - ceil(t·|x|) + 1`` tokens — so candidate pairs are generated
    only through an equi-join on PREFIX tokens, and the rare-first
    order keeps those buckets small.  Exact Jaccard then verifies each
    candidate once (dedup on the pair key first).

    100 TB shape: one DF aggregate (vocabulary-sized) broadcast back,
    per-doc sort of its own distinct tokens (array_sort on a packed
    struct — row-local, no window), prefix explode bounded by
    (1-t)·|x|+1 tokens per doc, one equi-join shuffle keyed on the
    prefix token, then verification on the candidate set whose size the
    prefix filter bounds.  Candidates never materialize the cross
    product.

    Output: (src, dst, jaccard) with src < dst, 9-dp rounded.
    """
    from my_flink_1_10_2_spark.operators.hints import dim

    toks = shingles(docs, text_col, id_col, n=3).select(
        id_col, F.col("shingle").alias("tok")
    )
    df_freq = toks.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    ordered = (
        toks.join(dim(df_freq), "tok")
        .groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("df"), F.col("tok")))
                ),
                lambda s: s["tok"],
            ).alias("toks"),
            F.count(F.lit(1)).alias("sz"),
        )
    )
    # prefix length: |x| - ceil(t*|x|) + 1
    plen = F.col("sz") - F.ceil(F.col("sz") * F.lit(threshold)).cast("bigint") + 1
    prefixes = ordered.select(
        F.col(id_col).alias("pid"),
        "toks",
        "sz",
        F.explode(F.slice("toks", 1, plen)).alias("ptok"),
    )
    a = prefixes.select(
        F.col("pid").alias("src"),
        F.col("toks").alias("a_toks"),
        F.col("sz").alias("a_sz"),
        "ptok",
    )
    b = prefixes.select(
        F.col("pid").alias("dst"),
        F.col("toks").alias("b_toks"),
        F.col("sz").alias("b_sz"),
        "ptok",
    )
    cand = (
        a.join(b, "ptok")
        .where(F.col("src") < F.col("dst"))
        .select("src", "dst", "a_toks", "b_toks", "a_sz", "b_sz")
        .dropDuplicates(["src", "dst"])
    )
    inter = F.size(F.array_intersect("a_toks", "b_toks"))
    jac = inter.cast("double") / (
        F.col("a_sz") + F.col("b_sz") - inter
    )
    return (
        cand.select("src", "dst", jac.alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
        .select("src", "dst", F.round("jaccard", 9).alias("jaccard"))
    )
