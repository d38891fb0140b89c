"""Training-data pipeline queries: deterministic sampling / dataset
splits, vocabulary statistics, n-gram mining, length histograms, and
embedding quantization.

These extend the reference's DataSet sampling utilities
(flink-java/src/main/java/org/apache/flink/api/java/utils/DataSetUtils.java
``sample``/``sampleWithSize``/``zipWithIndex``) into the shapes a large
corpus-preparation pipeline actually runs. All sampling is content-hash
based (md5 buckets) rather than RNG so every query is exactly replayable
by the DuckDB oracle and stable under Spark task retries.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.llm import sampling as SMP
from my_flink_1_10_2_spark.operators.hints import dim
from my_flink_1_10_2_spark.queries import read, register

# DuckDB replay of llm.sampling.bucket_of (seed "" -> prefix "|").
_BUCKET = "(('0x' || substr(md5('|' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100)"
_WORDS = r"str_split_regex(text, '\s+')"


@register(
    "q_sample_uniform_hash",
    oracle=f"""
    SELECT doc_id, lang, source
    FROM documents
    WHERE {_BUCKET} < 10
    """,
    category="pipeline",
)
def q_sample_uniform_hash(spark, sf_dir):
    """Deterministic 10% corpus sample via md5 content buckets.

    Pure codegen filter evaluated at the parquet scan — at 100 TB the
    sample costs one scan, no shuffle, and re-runs reproduce the exact
    same rows (unlike ``df.sample``/RNG, which task retries can change).
    """
    docs = read(spark, sf_dir, "documents")
    return SMP.sample_uniform(docs, "doc_id", 0.10).select("doc_id", "lang", "source")


@register(
    "q_sample_stratified",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_BUCKET} < (CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 40 ELSE 20 END)
    """,
    category="pipeline",
)
def q_sample_stratified(spark, sf_dir):
    """Stratified sampling: 10% of English, 40% of Chinese, 20% of other
    languages — the downsample-the-head / upsample-the-tail move every
    multilingual corpus pipeline makes. One CASE over the stratum column,
    still a single scan-time filter."""
    docs = read(spark, sf_dir, "documents")
    return SMP.sample_stratified(
        docs, "doc_id", "lang", {"en": 0.10, "zh": 0.40}, default=0.20
    ).select("doc_id", "lang")


@register(
    "q_train_test_split",
    oracle=f"""
    SELECT lang,
           CASE WHEN {_BUCKET} < 80 THEN 'train'
                WHEN {_BUCKET} < 90 THEN 'valid'
                ELSE 'test' END AS split,
           count(*) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM documents
    GROUP BY 1, 2
    """,
    category="pipeline",
)
def q_train_test_split(spark, sf_dir):
    """80/10/10 train/valid/test assignment from the doc_id hash bucket,
    summarized per language. Membership is a pure function of the key:
    re-runs and late-arriving rows of the same document always land in
    the same split — the reproducibility property RNG splits lack."""
    docs = read(spark, sf_dir, "documents")
    return (
        SMP.split_assign(docs, "doc_id", train=0.8, valid=0.1)
        .groupBy("lang", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
        )
    )


@register(
    "q_sample_consistent_topn",
    oracle="""
    SELECT doc_id, lang
    FROM documents
    ORDER BY md5('|' || CAST(doc_id AS VARCHAR))
    LIMIT 50
    """,
    category="pipeline",
)
def q_sample_consistent_topn(spark, sf_dir):
    """Stable exactly-N sample: order by md5(key), take the first 50.

    Spark plans this as TakeOrderedAndProject — a per-partition heap of
    50 plus one merge — so the "sort" never materializes; at 100 TB the
    cost is one scan regardless of N ≪ corpus."""
    docs = read(spark, sf_dir, "documents")
    return SMP.consistent_topn(docs, "doc_id", 50).select("doc_id", "lang")


@register(
    "q_vocab_coverage",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_WORDS}) AS token FROM documents
    ),
    counts AS (SELECT token, count(*) AS cnt FROM tok GROUP BY token),
    ranked AS (
      SELECT token, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, token) AS BIGINT) AS rk,
             sum(cnt) OVER () AS total,
             sum(cnt) OVER (ORDER BY cnt DESC, token
                            ROWS UNBOUNDED PRECEDING) AS cum
      FROM counts
    )
    SELECT token, cnt, rk,
           round(cnt / total, 9) AS share,
           round(cum / total, 9) AS cum_share
    FROM ranked
    WHERE rk <= 30
    """,
    category="pipeline",
)
def q_vocab_coverage(spark, sf_dir):
    """Vocabulary building: global token counts, frequency rank, and
    cumulative corpus coverage (the "how many token types cover 95% of
    the corpus" curve). The token count is a two-phase hash aggregate.

    Scale design: only the top 30 survive, so the global rank/cumsum
    window never sees the full type table (10⁸+ rows at 100 TB through
    one task). A salted partition-local top-30 prunes first — every
    global top-30 row is necessarily in its salt bucket's top-30, and
    the pruned prefix is exactly the global prefix, so rank and
    cumulative sums are unchanged. The single-task window then runs
    over ≤ 64×30 rows; the corpus total rides a broadcast scalar."""
    docs = read(spark, sf_dir, "documents")
    tok = docs.select(F.explode(F.split("text", r"\s+")).alias("token"))
    counts = tok.groupBy("token").agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").alias("total"))
    local = Window.partitionBy("__salt").orderBy(F.col("cnt").desc(), "token")
    pruned = (
        counts.withColumn("__salt", F.pmod(F.hash("token"), F.lit(64)))
        .withColumn("__lrk", F.row_number().over(local))
        .where(F.col("__lrk") <= 30)
        .drop("__salt", "__lrk")
    )
    order = Window.orderBy(F.col("cnt").desc(), "token")
    return (
        pruned.withColumn("rk", F.row_number().over(order).cast("bigint"))
        .withColumn("cum", F.sum("cnt").over(order.rowsBetween(Window.unboundedPreceding, 0)))
        .where(F.col("rk") <= 30)
        .join(dim(total))
        .select(
            "token",
            "cnt",
            "rk",
            F.round(F.col("cnt") / F.col("total"), 9).alias("share"),
            F.round(F.col("cum") / F.col("total"), 9).alias("cum_share"),
        )
    )


@register(
    "q_bigram_topk",
    oracle=f"""
    WITH w AS (SELECT {_WORDS} AS toks FROM documents),
    bg AS (
      SELECT unnest(list_transform(range(1, len(toks)),
                                   i -> toks[i] || ' ' || toks[i+1])) AS bigram
      FROM w
    )
    SELECT bigram, count(*) AS cnt
    FROM bg
    GROUP BY bigram
    ORDER BY cnt DESC, bigram
    LIMIT 20
    """,
    category="pipeline",
)
def q_bigram_topk(spark, sf_dir):
    """Top-20 word bigrams across the corpus (phrase-mining / tokenizer
    merge-candidate pass). Bigram generation is an array HOF inside
    codegen; the count is an ordinary two-phase aggregate and the top-20
    a TakeOrderedAndProject, so nothing corpus-sized is ever sorted."""
    docs = read(spark, sf_dir, "documents")
    bg = docs.select(
        F.explode(
            F.expr(
                "CASE WHEN size(split(text, '\\\\s+')) >= 2 THEN "
                "transform(sequence(0, size(split(text, '\\\\s+')) - 2), "
                "i -> concat(split(text, '\\\\s+')[i], ' ', split(text, '\\\\s+')[i+1])) "
                "ELSE array() END"
            )
        ).alias("bigram")
    )
    return (
        bg.groupBy("bigram")
        .agg(F.count("*").alias("cnt"))
        .orderBy(F.col("cnt").desc(), "bigram")
        .limit(20)
    )


@register(
    "q_doc_length_buckets",
    oracle=f"""
    SELECT CASE WHEN n_chars < 100 THEN '0-99'
                WHEN n_chars < 150 THEN '100-149'
                WHEN n_chars < 200 THEN '150-199'
                ELSE '200+' END AS bucket,
           count(*) AS n_docs,
           round(avg(len({_WORDS})), 9) AS avg_tokens,
           CAST(min(n_chars) AS BIGINT) AS min_chars,
           CAST(max(n_chars) AS BIGINT) AS max_chars
    FROM documents
    GROUP BY 1
    """,
    category="pipeline",
)
def q_doc_length_buckets(spark, sf_dir):
    """Document-length histogram with per-bucket token stats — the
    filter-design pass before length-based quality cuts."""
    docs = read(spark, sf_dir, "documents")
    bucket = (
        F.when(F.col("n_chars") < 100, "0-99")
        .when(F.col("n_chars") < 150, "100-149")
        .when(F.col("n_chars") < 200, "150-199")
        .otherwise("200+")
    )
    return (
        docs.groupBy(bucket.alias("bucket"))
        .agg(
            F.count("*").alias("n_docs"),
            F.round(F.avg(F.size(F.split("text", r"\s+"))), 9).alias("avg_tokens"),
            F.min("n_chars").cast("bigint").alias("min_chars"),
            F.max("n_chars").cast("bigint").alias("max_chars"),
        )
    )


@register(
    "q_repetition_ratio",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS} AS words FROM documents),
    sh AS (
      SELECT doc_id,
             unnest(list_transform(range(1, greatest(len(words)-2, 1)+1),
                                   i -> array_to_string(words[i:i+2], ' '))) AS shingle
      FROM w
    ),
    stats AS (
      SELECT doc_id, count(*) AS n_shingles,
             count(DISTINCT shingle) AS n_distinct
      FROM sh GROUP BY doc_id
    )
    SELECT doc_id, n_shingles, n_distinct,
           round(1.0 - n_distinct / n_shingles, 9) AS rep_ratio,
           (1.0 - n_distinct / n_shingles) > 0.5 AS flag_repetitive
    FROM stats
    """,
    category="pipeline",
)
def q_repetition_ratio(spark, sf_dir):
    """Within-document repetition filter (the Gopher/C4-style quality
    signal): fraction of duplicated 3-word shingles per document, with a
    boilerplate flag at >50% repetition.

    The shingle explode is corpus-sized but the aggregate is keyed on
    doc_id — partial distinct-counting happens map-side, so the shuffle
    carries (doc, shingle) pairs once and nothing global is built."""
    from my_flink_1_10_2_spark.llm import dedup as D

    docs = read(spark, sf_dir, "documents")
    sh = D.shingle_rows(docs)
    stats = sh.groupBy("doc_id").agg(
        F.count("*").alias("n_shingles"),
        F.count_distinct("shingle").alias("n_distinct"),
    )
    rep = F.lit(1.0) - F.col("n_distinct") / F.col("n_shingles")
    return stats.select(
        "doc_id",
        "n_shingles",
        "n_distinct",
        F.round(rep, 9).alias("rep_ratio"),
        (rep > 0.5).alias("flag_repetitive"),
    )


@register(
    "q_source_quality_report",
    oracle=f"""
    WITH w AS (
      SELECT source, lang, n_chars, len({_WORDS}) AS n_tokens
      FROM documents
    )
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           round(avg(n_tokens), 9) AS avg_tokens,
           round(quantile_cont(n_tokens, 0.5), 9) AS median_tokens
    FROM w
    GROUP BY source
    """,
    category="pipeline",
)
def q_source_quality_report(spark, sf_dir):
    """Per-source corpus report card: volume, language spread, and token
    length distribution — the crawl-source triage table that decides
    which sources to keep, cap, or drop. Exact median via Spark's native
    percentile aggregate (JVM-side, no Python)."""
    docs = read(spark, sf_dir, "documents")
    w = docs.select(
        "source",
        "lang",
        "n_chars",
        F.size(F.split("text", r"\s+")).alias("n_tokens"),
    )
    return w.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.count_distinct("lang").alias("n_langs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
        F.round(F.avg("n_tokens"), 9).alias("avg_tokens"),
        F.round(F.expr("percentile(n_tokens, 0.5)"), 9).alias("median_tokens"),
    )


@register(
    "q_embedding_quantize",
    oracle="""
    WITH e AS (
      SELECT CAST(label AS BIGINT) AS label,
             list_transform(embedding, x -> x::DOUBLE) AS v
      FROM embeddings
    ),
    s AS (
      SELECT label, v,
             list_max(list_transform(v, x -> abs(x))) AS scale
      FROM e
    ),
    m AS (
      SELECT label,
             list_sum(list_transform(
               v, x -> (x - round(x * 127.0 / scale) * scale / 127.0)
                     * (x - round(x * 127.0 / scale) * scale / 127.0)
             )) / len(v) AS mse
      FROM s
    )
    SELECT label, count(*) AS n_vecs, round(avg(mse) * 1e6, 6) AS avg_mse_ppm
    FROM m
    GROUP BY label
    """,
    category="pipeline",
)
def q_embedding_quantize(spark, sf_dir):
    """Int8 scalar quantization of the embedding column (symmetric,
    per-vector max-abs scale) with per-label reconstruction error.

    The whole kernel is array HOFs inside codegen — quantizing 100 TB of
    embeddings is a single scan-shaped map, and the 4x size reduction is
    what makes the ANN index RAM-resident downstream."""
    emb = read(spark, sf_dir, "embeddings")
    v = F.expr("transform(embedding, x -> cast(x as double))")
    df = emb.select(
        F.col("label").cast("bigint").alias("label"),
        v.alias("v"),
    ).withColumn("scale", F.expr("aggregate(v, cast(0.0 as double), (a, x) -> greatest(a, abs(x)))"))
    df = df.withColumn(
        "mse",
        F.expr(
            "aggregate(v, cast(0.0 as double), (a, x) -> a"
            " + (x - round(x * 127.0 / scale) * scale / 127.0)"
            " * (x - round(x * 127.0 / scale) * scale / 127.0)"
            ") / size(v)"
        ),
    )
    return df.groupBy("label").agg(
        F.count("*").alias("n_vecs"),
        F.round(F.avg("mse") * 1e6, 6).alias("avg_mse_ppm"),
    )


@register(
    "q_funnel_conversion",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id),
    staged AS (
      SELECT user_id,
             CASE
               WHEN t_signup IS NOT NULL AND t_click > t_signup
                    AND t_purchase > t_click THEN 3
               WHEN t_signup IS NOT NULL AND t_click > t_signup THEN 2
               WHEN t_signup IS NOT NULL THEN 1
               ELSE 0 END AS stage
      FROM firsts)
    SELECT stage, CAST(count(*) AS BIGINT) AS n_users
    FROM staged GROUP BY stage
    """,
    category="pipeline",
)
def q_funnel_conversion(spark, sf_dir):
    """Ordered funnel conversion (signup -> click -> purchase by FIRST
    occurrence ordering): one conditional-min aggregate per user, a
    map-side stage classifier, one tiny rollup — the classic
    product-analytics funnel without any self-join (contrast the CEP
    formulation, which matches contiguous per-event patterns)."""
    events = read(spark, sf_dir, "events")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "signup", F.col("ts"))).alias("t_signup"),
        F.min(F.when(F.col("event_type") == "click", F.col("ts"))).alias("t_click"),
        F.min(F.when(F.col("event_type") == "purchase", F.col("ts"))).alias(
            "t_purchase"
        ),
    )
    stage = (
        F.when(
            F.col("t_signup").isNotNull()
            & (F.col("t_click") > F.col("t_signup"))
            & (F.col("t_purchase") > F.col("t_click")),
            3,
        )
        .when(
            F.col("t_signup").isNotNull() & (F.col("t_click") > F.col("t_signup")), 2
        )
        .when(F.col("t_signup").isNotNull(), 1)
        .otherwise(0)
    )
    return (
        firsts.select(stage.alias("stage"))
        .groupBy("stage")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
    )


@register(
    "q_retention_cohorts",
    oracle="""
    WITH activity AS (
      SELECT user_id, date_trunc('week', ts) AS wk FROM events GROUP BY 1, 2),
    cohort AS (
      SELECT user_id, min(wk) AS cohort_wk FROM activity GROUP BY user_id)
    SELECT c.cohort_wk,
           CAST(round(date_diff('day', c.cohort_wk, a.wk) / 7.0) AS BIGINT) AS week_offset,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
    FROM activity a JOIN cohort c ON a.user_id = c.user_id
    GROUP BY 1, 2
    """,
    category="pipeline",
)
def q_retention_cohorts(spark, sf_dir):
    """Weekly retention cohort matrix: cohort = first active week,
    cell (cohort, k) = distinct users active k weeks later.  Two
    user-keyed aggregates + one join back — the standard engagement
    feature table, never a per-user driver loop."""
    events = read(spark, sf_dir, "events")
    activity = events.select(
        "user_id", F.date_trunc("week", "ts").alias("wk")
    ).distinct()
    cohort = activity.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        activity.join(cohort, "user_id")
        .groupBy(
            "cohort_wk",
            F.round(F.datediff("wk", "cohort_wk") / 7.0)
            .cast("bigint")
            .alias("week_offset"),
        )
        .agg(F.countDistinct("user_id").cast("bigint").alias("active_users"))
    )


@register(
    "q_json_props_rollup",
    oracle="""
    SELECT event_type,
           CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_bucket,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum
    FROM events
    GROUP BY 1, 2
    """,
    category="pipeline",
)
def q_json_props_rollup(spark, sf_dir):
    """Semi-structured rollup over the real `props` JSON column:
    extract a field (get_json_object — JVM-side, no Python), bucket and
    aggregate it.  At scale the extraction happens inside the scan
    projection; only the (type, bucket) rollup shuffles."""
    events = read(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return events.groupBy(
        "event_type", (k % 10).alias("k_bucket")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(k).cast("bigint").alias("k_sum"),
    )


@register(
    "q_salted_skew_agg",
    oracle="""
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS v_sum_e4,
           CAST(min(user_id) AS BIGINT) AS min_user,
           CAST(max(user_id) AS BIGINT) AS max_user
    FROM events GROUP BY event_type
    """,
    category="pipeline",
)
def q_salted_skew_agg(spark, sf_dir):
    """Skew-mitigated aggregation graded e2e (ref:
    StreamExecLocalGroupAggregate.scala / SplitAggregateRule.scala made
    explicit): `event_type` has only 5 hot values — the worst reducer
    skew shape — so the salted two-stage plan splits each hot group over
    16 salt reducers before the final merge.  Integer 1e-4 value units
    make the partial/merge sums exact, so the salted result is
    bit-identical to the plain GROUP BY oracle."""
    from my_flink_1_10_2_spark.operators.skew import salted_agg

    events = read(spark, sf_dir, "events").withColumn(
        "v_e4", F.round(F.col("value") * 10000).cast("bigint")
    )
    out = salted_agg(
        events,
        ["event_type"],
        {
            "n": ("count", "*"),
            "v_sum_e4": ("sum", "v_e4"),
            "min_user": ("min", "user_id"),
            "max_user": ("max", "user_id"),
        },
    )
    return out.select(
        "event_type",
        F.col("n").cast("bigint").alias("n"),
        F.col("v_sum_e4").cast("bigint").alias("v_sum_e4"),
        F.col("min_user").cast("bigint").alias("min_user"),
        F.col("max_user").cast("bigint").alias("max_user"),
    )


@register(
    "q_salted_skew_join",
    oracle="""
    WITH dim AS (
      SELECT 'click' AS event_type, 'engagement' AS category UNION ALL
      SELECT 'view', 'engagement' UNION ALL
      SELECT 'purchase', 'revenue' UNION ALL
      SELECT 'signup', 'growth')
    SELECT d.category,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(round(e.value * 10000) AS BIGINT)) AS BIGINT) AS v_sum_e4
    FROM events e JOIN dim d ON e.event_type = d.event_type
    GROUP BY d.category
    """,
    category="pipeline",
)
def q_salted_skew_join(spark, sf_dir):
    """Skew-mitigated join graded e2e: the fact side's 5-value hot key
    is salted (content-hash scatter) and the tiny dimension replicated
    salt ways, so each hot key spreads over 8 reducers — the manual
    fallback when a hot key defeats hash partitioning (ref: DataSet
    JoinHint / custom partitioners).  Must be bit-identical to the
    plain join + rollup."""
    from my_flink_1_10_2_spark.operators.skew import salted_join

    events = read(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 10000).cast("bigint").alias("v_e4")
    )
    dim_rows = spark.createDataFrame(
        [
            ("click", "engagement"),
            ("view", "engagement"),
            ("purchase", "revenue"),
            ("signup", "growth"),
        ],
        "event_type string, category string",
    )
    joined = salted_join(events, dim_rows, on=["event_type"], salt=8)
    return joined.groupBy("category").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("v_e4").cast("bigint").alias("v_sum_e4"),
    )


def _zorder_sql(x: str, y: str, bits: int = 16) -> str:
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


@register(
    "q_zorder_key",
    oracle=f"""
    SELECT o_orderkey, o_custkey,
           CAST({_zorder_sql('o_orderkey', 'o_custkey')} AS BIGINT) AS z
    FROM orders
    ORDER BY z, o_orderkey LIMIT 200
    """,
    category="pipeline",
)
def q_zorder_key(spark, sf_dir):
    """Z-order (Morton) clustering key over two dimensions — the
    multi-dimensional layout key data-lake writers sort by so min/max
    file stats prune on BOTH columns.  Pure bit-interleave arithmetic
    (16 bits each, JVM-side); writing sorted by z is
    `repartitionByRange(z).sortWithinPartitions(z)` downstream."""
    o = read(spark, sf_dir, "orders")
    z = sum(
        [
            (F.shiftright(F.col("o_orderkey"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i)))
            + (F.shiftright(F.col("o_custkey"), i).bitwiseAND(F.lit(1)) * F.lit(1 << (2 * i + 1)))
            for i in range(16)
        ],
        start=F.lit(0),
    ).cast("bigint")
    return (
        o.select("o_orderkey", "o_custkey", z.alias("z"))
        .orderBy("z", "o_orderkey")
        .limit(200)
    )


@register(
    "q_anomaly_zscore",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS s1,
             CAST(sum(CAST(round(value * 10000) AS BIGINT)
                      * CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS s2
      FROM events GROUP BY event_type)
    SELECT e.event_id, e.event_type,
           round((CAST(round(e.value * 10000) AS BIGINT) - CAST(s.s1 AS DOUBLE) / s.n)
                 / sqrt(CAST(s.s2 AS DOUBLE) / s.n
                        - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n)), 6)
             AS z
    FROM events e JOIN s ON e.event_type = s.event_type
    WHERE abs((CAST(round(e.value * 10000) AS BIGINT) - CAST(s.s1 AS DOUBLE) / s.n)
              / sqrt(CAST(s.s2 AS DOUBLE) / s.n
                     - (CAST(s.s1 AS DOUBLE) / s.n) * (CAST(s.s1 AS DOUBLE) / s.n))) > 1.8
    """,
    category="pipeline",
)
def q_anomaly_zscore(spark, sf_dir):
    """Outlier filter: per-type population z-scores with |z| > 1.8
    flagged — the numeric-column cleaning stage.  Mean and variance
    derive from EXACT integer 1e-4 sums (s1, s2 bigints, order-free),
    so the z arithmetic is the identical IEEE expression on both
    engines; one group rollup + one broadcast join back."""
    from my_flink_1_10_2_spark.operators.hints import dim

    events = read(spark, sf_dir, "events").withColumn(
        "v_i", F.round(F.col("value") * 10000).cast("bigint")
    )
    s = events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_i").cast("bigint").alias("s1"),
        F.sum(F.col("v_i") * F.col("v_i")).cast("bigint").alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n")
    var = F.col("s2").cast("double") / F.col("n") - mean * mean
    z = (F.col("v_i") - mean) / F.sqrt(var)
    return (
        events.join(dim(s), "event_type")
        .where(F.abs(z) > 1.8)
        .select("event_id", "event_type", F.round(z, 6).alias("z"))
    )


@register(
    "q_user_feature_table",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
           CAST(count(DISTINCT date_trunc('day', ts)) AS BIGINT) AS days_active,
           CAST(sum(CASE WHEN event_type = 'purchase'
                         THEN CAST(round(value * 10000) AS BIGINT) ELSE 0 END) AS BIGINT)
             AS purchase_v_e4,
           CAST(date_diff('second', min(ts), max(ts)) AS BIGINT) AS span_s
    FROM events GROUP BY user_id
    """,
    category="pipeline",
)
def q_user_feature_table(spark, sf_dir):
    """Per-entity ML feature table: behavioral counts (conditional
    aggregates — the manual pivot), activity breadth (distinct days),
    monetary sum in integer units, and the first-to-last span.  ONE
    grouped pass over the events — the feature-engineering shape that
    replaces N per-feature scans."""
    events = read(spark, sf_dir, "events")
    is_t = lambda t: F.when(F.col("event_type") == t, 1).otherwise(0)  # noqa: E731
    return events.groupBy("user_id").agg(
        F.sum(is_t("click")).cast("bigint").alias("n_click"),
        F.sum(is_t("view")).cast("bigint").alias("n_view"),
        F.sum(is_t("purchase")).cast("bigint").alias("n_purchase"),
        F.countDistinct(F.date_trunc("day", "ts")).cast("bigint").alias("days_active"),
        F.sum(
            F.when(
                F.col("event_type") == "purchase",
                F.round(F.col("value") * 10000).cast("bigint"),
            ).otherwise(F.lit(0))
        )
        .cast("bigint")
        .alias("purchase_v_e4"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts")))
        .cast("bigint")
        .alias("span_s"),
    )


@register(
    "q_hourly_rate_metric",
    oracle="""
    SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS clicks,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS views,
           round(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                 * 1.0 / greatest(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END), 1), 6)
             AS ctr
    FROM events WHERE ts < TIMESTAMP '2024-01-05'
    GROUP BY 1
    """,
    category="pipeline",
)
def q_hourly_rate_metric(spark, sf_dir):
    """Rate metric (CTR) per hour from one conditional-aggregate pass —
    numerator and denominator in the same rollup (never two scans
    joined), exact integer counts, one rounded division."""
    events = read(spark, sf_dir, "events").where(F.col("ts") < "2024-01-05")
    clicks = F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
    views = F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
    return events.groupBy(F.date_trunc("hour", "ts").alias("hr")).agg(
        clicks.cast("bigint").alias("clicks"),
        views.cast("bigint").alias("views"),
        F.round(clicks * 1.0 / F.greatest(views, F.lit(1)), 6).alias("ctr"),
    )
