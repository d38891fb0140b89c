"""Training-data pipeline queries, second batch: sequence packing,
benchmark-contamination checks, corpus mixture weights, blocklist
filtering, and PII pseudonymization with k-anonymity suppression.

Same discipline as ``pipeline.py``: every operator is deterministic
(content hashes, no RNG), expressed as codegen-friendly DataFrame ops,
and exactly replayable by the DuckDB oracle. Splits reuse
``llm.sampling.bucket_of``'s md5 buckets so the train/test membership
here is byte-identical to ``q_train_test_split``'s.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.llm import dedup as D
from my_flink_1_10_2_spark.llm.sampling import bucket_of
from my_flink_1_10_2_spark.queries import read, register
from my_flink_1_10_2_spark.operators.hints import dim

# DuckDB replay of llm.sampling.bucket_of (seed "" -> prefix "|").
_BUCKET = "(('0x' || substr(md5('|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"
_WORDS = r"str_split_regex(text, '\s+')"

#: context-window length (tokens) for sequence packing.
_CTX = 2048


@register(
    "q_sequence_packing",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, {_BUCKET} % 8 AS shard,
             CAST(len({_WORDS}) AS BIGINT) AS tok
      FROM documents
    ),
    packed AS (
      SELECT shard, doc_id, tok,
             (CAST(sum(tok) OVER (PARTITION BY shard ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING) AS BIGINT) - tok)
               // {_CTX} AS window_id
      FROM d
    )
    SELECT shard, window_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS n_tokens,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(max(doc_id) AS BIGINT) AS last_doc
    FROM packed
    GROUP BY shard, window_id
    ORDER BY shard, window_id
    """,
    category="pipeline",
)
def q_sequence_packing(spark, sf_dir):
    """Concatenate-then-chunk sequence packing (the GPT-style pretraining
    layout): docs stream in deterministic (shard, doc_id) order, the
    token stream is cut into 2048-token context windows, and a doc
    belongs to the window its first token lands in.

    Shards are md5 buckets, so packing is embarrassingly parallel: each
    shard's running sum is an independent window over its own partition
    — at 100 TB the only shuffle is the hash repartition to shards, and
    no shard ever sees another's rows. (True greedy bin-packing is
    order-sequential; concatenate-then-chunk is what large pretraining
    pipelines actually use, precisely because it parallelizes.)"""
    docs = read(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.pmod(bucket_of("doc_id"), F.lit(8)).alias("shard"),
        F.size(F.split("text", r"\s+")).cast("bigint").alias("tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    packed = d.withColumn(
        "window_id",
        F.floor((F.sum("tok").over(w) - F.col("tok")) / F.lit(_CTX)).cast("bigint"),
    )
    return (
        packed.groupBy("shard", "window_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("tok").cast("bigint").alias("n_tokens"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
            F.max("doc_id").cast("bigint").alias("last_doc"),
        )
        .orderBy("shard", "window_id")
    )


@register(
    "q_contamination_check",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, source, {_BUCKET} AS b, {_WORDS} AS words
      FROM documents
    ),
    sh AS (
      SELECT DISTINCT doc_id, b,
             unnest(list_transform(range(1, greatest(len(words)-4, 1)+1),
                                   i -> array_to_string(words[i:i+4], ' '))) AS shingle
      FROM w
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE b >= 90),
    contam AS (
      SELECT DISTINCT doc_id FROM sh
      WHERE b < 80 AND shingle IN (SELECT shingle FROM bench)
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN doc_id IN (SELECT doc_id FROM contam)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           round(sum(CASE WHEN doc_id IN (SELECT doc_id FROM contam)
                          THEN 1.0 ELSE 0.0 END) / count(*), 4) AS contam_rate
    FROM w
    WHERE b < 80
    GROUP BY source
    ORDER BY source
    """,
    category="pipeline",
)
def q_contamination_check(spark, sf_dir):
    """Benchmark contamination scan: which training-split documents share
    a 5-word shingle with the held-out test split (the n-gram-overlap
    decontamination every serious pretraining corpus runs against its
    eval sets).

    The test split is a fixed hash-bucket slice, so its distinct shingle
    set is ~10% of the corpus — small enough to broadcast. The check is
    then a broadcast LEFT SEMI join against the exploded training
    shingles: one corpus scan, no shuffle of the big side, and the
    contaminated-id set folds back onto the per-source report.

    The bucket filters run BELOW the shingle explode (shingles are
    per-document, so filtering docs first is identical): the test branch
    explodes only its ~10%% slice and the train branch only its ~80%%,
    instead of both branches exploding the full corpus and joining a
    bucket column back on."""
    docs = read(spark, sf_dir, "documents")
    b = bucket_of("doc_id")
    meta = docs.select("doc_id", "source", b.alias("b"))
    bench_sh = (
        D.shingles(docs.where(b >= 90), n=5).select("shingle").distinct()
    )
    contam = (
        D.shingles(docs.where(b < 80), n=5)
        .join(dim(bench_sh), "shingle", "left_semi")
        .select("doc_id")
        .distinct()
        .withColumn("is_contam", F.lit(1))
    )
    train = meta.where(F.col("b") < 80)
    return (
        train.join(contam, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_train"),
            F.coalesce(F.sum("is_contam"), F.lit(0))
            .cast("bigint")
            .alias("n_contaminated"),
            F.round(
                F.coalesce(F.sum("is_contam"), F.lit(0)) / F.count(F.lit(1)), 4
            ).alias("contam_rate"),
        )
        .orderBy("source")
    )


@register(
    "q_mixture_weights",
    oracle=f"""
    WITH s AS (
      SELECT source,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len({_WORDS})) AS BIGINT) AS n_tokens
      FROM documents
      GROUP BY source
    )
    SELECT source, n_docs, n_tokens,
           round(n_tokens * 1.0 / sum(n_tokens) OVER (), 6) AS actual_share,
           round((1.0 / count(*) OVER ())
                 / (n_tokens * 1.0 / sum(n_tokens) OVER ()), 4) AS weight
    FROM s
    ORDER BY source
    """,
    category="pipeline",
)
def q_mixture_weights(spark, sf_dir):
    """Domain-mixture sampling weights: each source's actual token share
    vs a uniform target mixture, and the per-source sampling weight
    (target/actual) a weighted data loader would apply to hit the target.

    The corpus collapses to one row per source before any window runs,
    so the unpartitioned share window moves ~20 rows — the 100 TB cost
    is the single groupBy scan."""
    docs = read(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", r"\s+"))).cast("bigint").alias("n_tokens"),
    )
    w = Window.partitionBy()
    actual = F.col("n_tokens") / F.sum("n_tokens").over(w)
    target = F.lit(1.0) / F.count(F.lit(1)).over(w)
    return (
        s.select(
            "source",
            "n_docs",
            "n_tokens",
            F.round(actual, 6).alias("actual_share"),
            F.round(target / actual, 4).alias("weight"),
        )
        .orderBy("source")
    )


@register(
    "q_blocklist_filter",
    oracle=f"""
    WITH d AS (
      SELECT source,
             len(list_filter({_WORDS}, w -> w IN ('key', 'hash', 'slow')))
               * 1.0 / len({_WORDS}) AS density
      FROM documents
    )
    SELECT source,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN density > 0.12 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           round(avg(density), 4) AS avg_density
    FROM d
    GROUP BY source
    ORDER BY source
    """,
    category="pipeline",
)
def q_blocklist_filter(spark, sf_dir):
    """Blocklist-density filter: drop documents whose blocklisted-term
    density exceeds 12%, reported per source (the keyword-based safety /
    boilerplate filter stage of a corpus pipeline).

    The density is a codegen'd array filter over the split words — one
    scan, no UDF, no shuffle beyond the per-source rollup."""
    docs = read(spark, sf_dir, "documents")
    words = F.split("text", r"\s+")
    bad = F.filter(
        words, lambda w: (w == "key") | (w == "hash") | (w == "slow")
    )
    density = F.size(bad) * F.lit(1.0) / F.size(words)
    d = docs.select("source", density.alias("density"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("density") > 0.12, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped"),
            F.round(F.avg("density"), 4).alias("avg_density"),
        )
        .orderBy("source")
    )


@register(
    "q_pii_pseudonymize",
    oracle="""
    WITH p AS (
      SELECT sha256('salt|' || CAST(user_id AS VARCHAR)) AS pseudo_id,
             event_type, value
      FROM events
    )
    SELECT pseudo_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT event_type) AS BIGINT) AS n_types,
           round(sum(value), 4) AS total_value
    FROM p
    GROUP BY pseudo_id
    HAVING count(*) >= 70
    ORDER BY n_events DESC, pseudo_id
    LIMIT 20
    """,
    category="pipeline",
)
def q_pii_pseudonymize(spark, sf_dir):
    """PII pseudonymization + k-anonymity suppression: user ids are
    replaced by a salted SHA-256 (deterministic, so joins across tables
    keyed the same way still line up), and groups smaller than k=70
    events are suppressed before the report leaves the pipeline.

    The hash is a pure codegen expression evaluated at the scan; the
    only shuffle is the per-pseudonym aggregate, and suppression is a
    HAVING over already-aggregated rows."""
    ev = read(spark, sf_dir, "events")
    p = ev.select(
        F.sha2(F.concat(F.lit("salt|"), F.col("user_id").cast("string")), 256).alias(
            "pseudo_id"
        ),
        "event_type",
        "value",
    )
    return (
        p.groupBy("pseudo_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("event_type").alias("n_types"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .where(F.col("n_events") >= 70)
        .orderBy(F.col("n_events").desc(), "pseudo_id")
        .limit(20)
    )


@register(
    "q_zip_with_index",
    oracle="""
    SELECT doc_id, source,
           row_number() OVER (ORDER BY doc_id) - 1 AS idx
    FROM documents
    """,
    category="pipeline",
)
def q_zip_with_index(spark, sf_dir):
    """Contiguous global index over the corpus (ref:
    DataSetUtils.java:55 zipWithIndex) — bucketed two-pass plan, every
    window partition-parallel; the oracle's single global row_number is
    exactly the plan this operator exists to avoid."""
    from my_flink_1_10_2_spark.operators.index import zip_with_index

    docs = read(spark, sf_dir, "documents").select("doc_id", "source")
    return zip_with_index(docs, "doc_id").select("doc_id", "source", "idx")


@register(
    "q_mixture_apply",
    oracle=r"""
    WITH s AS (
      SELECT source,
             CAST(sum(len(list_filter(regexp_split_to_array(text, '\s+'), x -> x <> ''))) AS BIGINT) AS n_tokens
      FROM documents GROUP BY source),
    rates AS (
      SELECT source, n_tokens,
             round(LEAST(1.0,
               ((SELECT CAST(sum(n_tokens) AS DOUBLE) FROM s) / (SELECT count(*) FROM s))
               / CAST(n_tokens AS DOUBLE)), 6) AS rate
      FROM s),
    kept AS (
      SELECT d.source, d.doc_id,
             len(list_filter(regexp_split_to_array(d.text, '\s+'), x -> x <> '')) AS tok
      FROM documents d JOIN rates r ON r.source = d.source
      WHERE (('0x' || substr(md5('mix:' || CAST(d.doc_id AS VARCHAR)), 1, 15))::BIGINT + 1.0)
            / 1152921504606846976.0 <= r.rate)
    SELECT source, CAST(count(*) AS BIGINT) AS n_kept,
           CAST(sum(tok) AS BIGINT) AS kept_tokens
    FROM kept GROUP BY source ORDER BY source
    """,
    category="pipeline",
)
def q_mixture_apply(spark, sf_dir):
    """Apply the domain-mixture weights: downsample each over-represented
    source to the uniform token target with a deterministic md5
    acceptance test (hash01(doc_id) <= rate) — retry-stable and
    exactly replayable, the same consistent-sampling idiom as the
    sampling/KMV operators.

    The rate table is one row per source (broadcast); acceptance is a
    scan-time filter — no shuffle beyond the final per-source rollup.
    Rates are ratios of exact integer token counts rounded to 6dp, so
    both engines compute bit-identical doubles."""
    from my_flink_1_10_2_spark.operators.hints import dim

    docs = read(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
    with_tok = docs.select("doc_id", "source", toks.alias("tok"))
    s = with_tok.groupBy("source").agg(F.sum("tok").cast("bigint").alias("n_tokens"))
    tot = s.agg(
        F.sum("n_tokens").cast("double").alias("__tot"),
        F.count(F.lit(1)).alias("__k"),
    )
    rates = s.join(dim(tot)).select(
        "source",
        F.round(
            F.least(
                F.lit(1.0),
                (F.col("__tot") / F.col("__k")) / F.col("n_tokens").cast("double"),
            ),
            6,
        ).alias("rate"),
    )
    hash01 = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit("mix:"), F.col("doc_id").cast("string"))), 1, 15),
            16,
            10,
        ).cast("double")
        + F.lit(1.0)
    ) / F.lit(float(16**15))
    kept = with_tok.join(dim(rates), "source").where(hash01 <= F.col("rate"))
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_kept"),
            F.sum("tok").cast("bigint").alias("kept_tokens"),
        )
        .orderBy("source")
    )


@register(
    "q_markov_transitions",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM events
    ),
    trans AS (
      SELECT src, dst, CAST(count(*) AS BIGINT) AS n
      FROM seq WHERE dst IS NOT NULL GROUP BY 1, 2
    ),
    tot AS (SELECT src, CAST(sum(n) AS BIGINT) AS n_src FROM trans GROUP BY 1)
    SELECT t.src, t.dst, t.n,
           CAST(t.n AS DOUBLE) / CAST(o.n_src AS DOUBLE) AS p
    FROM trans t JOIN tot o ON o.src = t.src
    """,
    category="pipeline",
)
def q_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix of user event sequences —
    the behavioral-model kernel (next-event prediction priors, funnel
    leak analysis).  Per-user ordering is (ts, event_id) — a total
    order, so the lead() pairing is deterministic; counts are exact and
    each probability is ONE IEEE division of exact integers, graded
    bitwise without rounding.  Plan: one keyed window shuffle on
    user_id, then a 25-row matrix aggregate."""
    from pyspark.sql import Window as W

    events = read(spark, sf_dir, "events")
    seq = events.select(
        "user_id",
        F.col("event_type").alias("src"),
        F.lead("event_type").over(
            W.partitionBy("user_id").orderBy("ts", "event_id")
        ).alias("dst"),
    )
    trans = (
        seq.where(F.col("dst").isNotNull())
        .groupBy("src", "dst")
        .agg(F.count("*").cast("bigint").alias("n"))
    )
    tot = trans.groupBy("src").agg(F.sum("n").cast("bigint").alias("n_src"))
    return trans.join(tot, "src").select(
        "src",
        "dst",
        "n",
        (F.col("n").cast("double") / F.col("n_src").cast("double")).alias("p"),
    )


@register(
    "q_mad_outliers",
    oracle="""
    WITH e AS (
      SELECT event_type, event_id,
             CAST(round(value * 10000) AS BIGINT) AS v
      FROM events
    ),
    med AS (
      SELECT event_type, v AS med FROM (
        SELECT event_type, v,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY v, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM e) WHERE rn = (n + 1) // 2
    ),
    dev AS (
      SELECT e.event_type, e.event_id, e.v, m.med, abs(e.v - m.med) AS d
      FROM e JOIN med m USING (event_type)
    ),
    mad AS (
      SELECT event_type, d AS mad FROM (
        SELECT event_type, d,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY d, event_id) AS rn,
               count(*) OVER (PARTITION BY event_type) AS n
        FROM dev) WHERE rn = (n + 1) // 2
    )
    SELECT d.event_type, m.med, a.mad,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CASE WHEN d.d > 3 * a.mad THEN 1 ELSE 0 END) AS BIGINT)
             AS n_outliers
    FROM dev d JOIN mad a USING (event_type) JOIN med m USING (event_type)
    GROUP BY 1, 2, 3
    """,
    category="pipeline",
)
def q_mad_outliers(spark, sf_dir):
    """Robust outlier detection per event type via MAD (median absolute
    deviation) — the z-score's heavy-tail-safe sibling
    (`q_anomaly_zscore` covers the parametric variant): values in exact
    1e-4 integer units, the LOWER median selected by a deterministic
    (value, event_id) total order (rank (n+1)//2 — replayable, unlike
    interpolation), the MAD the same selection over absolute
    deviations, and the 3-MAD outlier rule an exact integer
    cross-comparison.  Two keyed window passes, one rollup."""
    from pyspark.sql import Window as W

    e = read(spark, sf_dir, "events").select(
        "event_type",
        "event_id",
        F.round(F.col("value") * 10000).cast("bigint").alias("v"),
    )
    w = W.partitionBy("event_type")

    def lower_median(df, col):
        ranked = df.withColumn(
            "__rn", F.row_number().over(w.orderBy(F.col(col), F.col("event_id")))
        ).withColumn("__n", F.count("*").over(w))
        return ranked.where(
            F.col("__rn") == F.expr("(__n + 1) DIV 2")
        ).select("event_type", F.col(col).alias("__m"))

    med = lower_median(e, "v").withColumnRenamed("__m", "med")
    dev = e.join(med, "event_type").withColumn(
        "d", F.abs(F.col("v") - F.col("med"))
    )
    mad = lower_median(dev, "d").withColumnRenamed("__m", "mad")
    return (
        dev.join(mad, "event_type")
        .groupBy("event_type", "med", "mad")
        .agg(
            F.count("*").cast("bigint").alias("n"),
            F.sum(F.when(F.col("d") > 3 * F.col("mad"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_outliers"),
        )
    )


@register(
    "q_source_overlap",
    oracle=r"""
    WITH toks AS (
      SELECT source, doc_id, str_split_regex(text, '\s+') AS w
      FROM documents
    ),
    grams AS (
      -- position range derived from len(w) (same bound family as the
      -- other shingle oracles), raw un-lowered split: exactly
      -- shingle_rows' semantics for any word count / case / whitespace
      SELECT DISTINCT source, md5(s) AS g FROM (
        SELECT source,
               unnest(list_transform(range(1, greatest(len(w) - 7, 1) + 1),
                                     i -> array_to_string(w[i:i+7], ' '))) AS s
        FROM toks)
    ),
    sizes AS (SELECT source, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY 1)
    SELECT a.source AS source_a, b.source AS source_b,
           sa.n AS n_a, sb.n AS n_b,
           CAST(count(*) AS BIGINT) AS n_shared,
           CAST(count(*) * 1000000
                // (sa.n + sb.n - count(*)) AS BIGINT) AS jaccard_e6
    FROM grams a JOIN grams b ON a.g = b.g AND a.source < b.source
    JOIN sizes sa ON sa.source = a.source
    JOIN sizes sb ON sb.source = b.source
    GROUP BY 1, 2, 3, 4
    """,
    category="pipeline",
)
def q_source_overlap(spark, sf_dir):
    """Cross-source content-overlap matrix — the contamination map a
    curation pipeline checks before mixing sources: per ordered source
    pair, the count of distinct word-8-grams present in both plus the
    integer-exact Jaccard (1e-6 units, integer division).  One shingle
    explode, a gram-keyed self-equi-join (pairs exist only where grams
    collide — never a cartesian), exact integers throughout."""
    from my_flink_1_10_2_spark.llm.dedup import shingle_rows

    docs = read(spark, sf_dir, "documents")
    grams = (
        shingle_rows(docs.withColumnRenamed("source", "__src"), "text", "__src", 8)
        .select(F.col("__src").alias("source"), F.md5("shingle").alias("g"))
        .distinct()
    )
    sizes = grams.groupBy("source").agg(F.count("*").cast("bigint").alias("n"))
    a = grams.select(F.col("source").alias("source_a"), "g")
    b = grams.select(F.col("source").alias("source_b"), "g")
    return (
        a.join(b, "g")
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count("*").cast("bigint").alias("n_shared"))
        .join(
            sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a")),
            "source_a",
        )
        .join(
            sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b")),
            "source_b",
        )
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_shared",
            F.expr("CAST(n_shared * 1000000 DIV (n_a + n_b - n_shared) AS BIGINT)")
            .alias("jaccard_e6"),
        )
    )


@register(
    "q_user_event_entropy",
    oracle="""
    WITH c AS (
      SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS c
      FROM events GROUP BY 1, 2
    ),
    tot AS (
      SELECT user_id, CAST(sum(c) AS BIGINT) AS n,
             CAST(count(*) AS BIGINT) AS n_types
      FROM c GROUP BY 1
    ),
    q AS (
      SELECT c.user_id,
             CAST(sum(c.c * CAST(round(ln(CAST(c.c AS DOUBLE))
                                       * 1000000000.0) AS BIGINT))
                  AS BIGINT) AS s
      FROM c GROUP BY 1
    )
    SELECT t.user_id, t.n AS n_events, t.n_types,
           CAST(t.n * CAST(round(ln(CAST(t.n AS DOUBLE)) * 1000000000.0)
                           AS BIGINT) - q.s AS DOUBLE)
             / CAST(t.n AS DOUBLE) / 1000000000.0 AS entropy_nats
    FROM tot t JOIN q USING (user_id)
    """,
    category="pipeline",
)
def q_user_event_entropy(spark, sf_dir):
    """Per-user Shannon entropy of the event-type distribution — the
    behavioral-diversity feature (bots and scripted traffic sit near 0;
    a uniform 5-type user near ln 5).  Float discipline: entropy =
    ln n − (Σ c·ln c)/n with every ln quantized to exact 1e-9 integer
    units through a libm Arrow UDF over the DISTINCT count values (a
    tiny relation — counts repeat massively across users), making the
    per-user weighted sum exact BIGINT arithmetic; the final two
    divisions are a fixed IEEE sequence, graded bitwise."""
    import math

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _ln():
        def kernel(s):
            return pd.Series([math.log(float(v)) for v in s], dtype="float64")

        kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(kernel, DoubleType())

    events = read(spark, sf_dir, "events")
    c = events.groupBy("user_id", "event_type").agg(
        F.count("*").cast("bigint").alias("c")
    )
    tot = c.groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.count("*").cast("bigint").alias("n_types"),
    )
    ln = _ln()
    vals = (
        c.select(F.col("c").alias("v"))
        .unionByName(tot.select(F.col("n").alias("v")))
        .distinct()
        .withColumn(
            "lq", F.round(ln(F.col("v").cast("double")) * 1e9).cast("bigint")
        )
    )
    s = (
        c.join(F.broadcast(vals), c["c"] == vals["v"])
        .groupBy("user_id")
        .agg(F.sum(F.col("c") * F.col("lq")).cast("bigint").alias("s"))
    )
    return (
        tot.join(F.broadcast(vals), tot["n"] == vals["v"])
        .join(s, "user_id")
        .select(
            "user_id",
            F.col("n").alias("n_events"),
            "n_types",
            (
                (F.col("n") * F.col("lq") - F.col("s")).cast("double")
                / F.col("n").cast("double")
                / F.lit(1e9)
            ).alias("entropy_nats"),
        )
    )


@register(
    "q_token_gini",
    oracle=r"""
    WITH lens AS (
      SELECT source, doc_id,
             CAST(len(list_filter(str_split_regex(lower(text), '\s+'),
                                  t -> t != '')) AS BIGINT) AS x
      FROM documents
    ),
    ranked AS (
      SELECT source, x,
             row_number() OVER (PARTITION BY source ORDER BY x, doc_id) AS i
      FROM lens
    ),
    agg AS (
      SELECT source, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(i * x) AS BIGINT) AS six
      FROM ranked GROUP BY 1
    )
    SELECT source, n, sx AS total_tokens,
           CAST(2 * six - (n + 1) * sx AS DOUBLE)
             / CAST(n * sx AS DOUBLE) AS gini
    FROM agg WHERE sx > 0
    """,
    category="pipeline",
)
def q_token_gini(spark, sf_dir):
    """Gini coefficient of per-document token counts within each source
    — the length-concentration signal (a source where a few giant pages
    carry most tokens behaves very differently in sampling than a
    uniform one).  Closed form over the sorted values:
    G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with a deterministic
    (length, doc_id) total order — every sum exact BIGINT, one IEEE
    division, graded bitwise."""
    from pyspark.sql import Window as W

    lens = read(spark, sf_dir, "documents").select(
        "source",
        "doc_id",
        F.size(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).cast("bigint").alias("x"),
    )
    ranked = lens.withColumn(
        "i",
        F.row_number().over(W.partitionBy("source").orderBy("x", "doc_id")),
    )
    agg = ranked.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum(F.col("i") * F.col("x")).cast("bigint").alias("six"),
    )
    return agg.where(F.col("sx") > 0).select(
        "source",
        "n",
        F.col("sx").alias("total_tokens"),
        (
            (2 * F.col("six") - (F.col("n") + 1) * F.col("sx")).cast("double")
            / (F.col("n") * F.col("sx")).cast("double")
        ).alias("gini"),
    )


@register(
    "q_user_burstiness",
    oracle="""
    WITH gaps AS (
      SELECT user_id,
             epoch_us(ts) - lag(epoch_us(ts))
               OVER (PARTITION BY user_id ORDER BY ts, event_id) AS g
      FROM events
    ),
    m AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g) AS BIGINT) AS s,
             CAST(sum(CAST(g AS HUGEINT) * g) AS HUGEINT) AS ss
      FROM gaps WHERE g IS NOT NULL GROUP BY 1
    )
    SELECT user_id, n,
           CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_gap_us,
           (sqrt(CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * n AS DOUBLE))
            - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
           / (sqrt(CAST(n * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
                   / CAST(CAST(n AS HUGEINT) * n AS DOUBLE))
              + CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS burstiness
    FROM m WHERE n >= 2
    """,
    category="pipeline",
)
def q_user_burstiness(spark, sf_dir):
    """Goh–Barabási burstiness of per-user inter-event gaps:
    B = (σ−μ)/(σ+μ) ∈ (−1, 1) — periodic traffic near −1, Poisson at 0,
    bursty humans positive; the temporal fingerprint bot-detection and
    session modeling start from.  Gaps in exact integer microseconds
    over a (ts, event_id) total order; μ and the population σ come from
    exact BIGINT/DECIMAL moment sums (n·ss − s² as the variance
    numerator), then a fixed IEEE sqrt/divide sequence — the raw DOUBLE
    burstiness replays bitwise."""
    from pyspark.sql import Window as W

    events = read(spark, sf_dir, "events")
    te = F.unix_micros(F.col("ts").cast("timestamp"))
    gaps = events.select(
        "user_id",
        (te - F.lag(te).over(W.partitionBy("user_id").orderBy("ts", "event_id"))).alias("g"),
    ).where(F.col("g").isNotNull())
    m = gaps.groupBy("user_id").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("g").cast("bigint").alias("s"),
        F.sum((F.col("g").cast("decimal(38,0)") * F.col("g"))).alias("ss"),
    )
    mean = F.col("s").cast("double") / F.col("n").cast("double")
    var = (
        (F.col("n") * F.col("ss") - F.col("s").cast("decimal(38,0)") * F.col("s"))
        .cast("double")
        / (F.col("n").cast("decimal(38,0)") * F.col("n")).cast("double")
    )
    sigma = F.sqrt(var)
    return m.where(F.col("n") >= 2).select(
        "user_id",
        "n",
        mean.alias("mean_gap_us"),
        ((sigma - mean) / (sigma + mean)).alias("burstiness"),
    )


# 60-bit md5 shuffle key over doc_id with seed "epoch1" — the per-epoch
# deterministic permutation (DuckDB replay below).
_EPOCH_KEY = "('0x' || substr(md5('epoch1|' || CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT"


@register(
    "q_length_bucketed_batches",
    oracle=f"""
    WITH d AS (
      SELECT doc_id,
             CAST(len({_WORDS}) AS BIGINT) AS tok,
             {_EPOCH_KEY} AS ek
      FROM documents
    ),
    b AS (
      SELECT doc_id, tok, tok // 64 AS bucket,
             row_number() OVER (PARTITION BY tok // 64 ORDER BY ek, doc_id) - 1
               AS rnk
      FROM d
    ),
    batched AS (SELECT bucket, rnk // 16 AS batch_id, doc_id, tok FROM b)
    SELECT bucket, batch_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(max(tok) AS BIGINT) AS max_tok,
           CAST(sum(tok) AS BIGINT) AS sum_tok,
           CAST(count(*) * max(tok) - sum(tok) AS BIGINT) AS padding_waste
    FROM batched
    GROUP BY bucket, batch_id
    """,
    category="pipeline",
)
def q_length_bucketed_batches(spark, sf_dir):
    """Length-bucketed dynamic batching with a deterministic per-epoch
    shuffle — the fairseq/T5-style padding-minimization layout: docs are
    bucketed by length (64-token buckets), pseudo-randomly permuted
    INSIDE each bucket by a seeded md5 key (the epoch shuffle — change
    the seed, get the next epoch's order, bitwise reproducible), and cut
    into 16-doc batches; the audit reports each batch's padding waste
    (n*max_len - sum_len), the quantity bucketing exists to minimize.

    Scale shape: one hash shuffle to buckets, one KEYED per-bucket window
    for the permutation rank (never single-partition — bucket count
    grows with max doc length, each bucket's rank is independent), one
    keyed rollup.  No RNG, no collect."""
    docs = read(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        F.size(F.split("text", r"\s+")).cast("bigint").alias("tok"),
        F.conv(
            F.substring(F.md5(F.concat(F.lit("epoch1|"), F.col("doc_id").cast("string"))), 1, 15),
            16, 10,
        ).cast("bigint").alias("ek"),
    ).withColumn("bucket", F.floor(F.col("tok") / 64).cast("bigint"))
    w = Window.partitionBy("bucket").orderBy("ek", "doc_id")
    batched = d.withColumn(
        "batch_id", F.floor((F.row_number().over(w) - 1) / 16).cast("bigint")
    )
    return (
        batched.groupBy("bucket", "batch_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.max("tok").alias("max_tok"),
            F.sum("tok").alias("sum_tok"),
            (F.count(F.lit(1)) * F.max("tok") - F.sum("tok"))
            .cast("bigint")
            .alias("padding_waste"),
        )
        .select(
            "bucket", "batch_id", "n_docs", "max_tok", "sum_tok", "padding_waste"
        )
    )
