"""Round-5 operator wave 3: record linkage, exact sparse similarity,
containment dedup, experiment statistics, time-weighted rollups.

Five graded operators a 100 TB curation / analytics pipeline runs that
previously had no coverage:

- fuzzy entity resolution via blocked Levenshtein over the DISTINCT
  name domain (dedup by edit distance without an all-pairs cartesian);
- exact sparse cosine pairs with rare-term candidate generation — the
  prefix-filter shape (Chaudhuri et al., "A Primitive Operator for
  Similarity Joins") that bounds candidates by the df of rare terms;
- directed shingle containment (doc-inside-doc near-dup, the case
  symmetric Jaccard under-scores when |A| << |B|);
- Welch's unequal-variance t-test over exact integer moments — the A/B
  readout an experimentation pipeline computes per metric;
- time-weighted average value per user (the irregular-timeseries mean
  used by IoT/finance rollups, duration-weighted not event-weighted);
- the experimentation suite: two-proportion z-test (conversion),
  Mann-Whitney U with tie correction (nonparametric values), and
  chi-squared independence cells (sample-ratio-mismatch audit);
- correlation: Pearson r over exact integer moments and tie-aware
  Spearman rho via the 2*avg-rank integer protocol;
- operational timeseries: integer-decayed trending counts (1e6 >> age),
  least-squares daily trend slope, CUSUM changepoint (n*y - total
  scaling keeps the cumulative deviation exact BIGINT);
- evaluation operators: retrieval NDCG@10 (literal 1e9/log2 discount
  table — no engine-side transcendental), reciprocal-rank fusion of the
  vector and lexical rankers (integer 1e9/(60+r) weights), and
  per-class precision/recall/F1 for the language-ID heuristic;
- data-quality audits: Benford first-digit excess (string first digit
  of the exact quantized integer, literal log10 table) and PSI value
  drift between month halves (the q_kl quantized-log protocol);
- feature prep + survival: winsorized stats at exact p05/p95 order
  statistics, and the Kaplan-Meier curve as a cumulative INTEGER
  log-survival (quantized ln over risk-set sizes — the product
  becomes an exact BIGINT sum, with real right-censoring);
- Wilson 95% score intervals for daily conversion (small-sample-safe
  CI, DOUBLE-cast z literal — DuckDB's bare decimals fold exactly)
  and information gain per vocabulary word vs the language label
  (feature selection via the quantized-log entropy protocol);
- MRR + recall@10 for the retriever and ROC AUC via the Mann-Whitney
  identity (ties half-credited by the 2*avg-rank integer protocol);
- the ANN recall dashboard (recall@5 of every index family vs exact);
- training-pair construction: hard-negative mining (label filter
  pushed BEFORE the top-k), hash-thinned deterministic negative
  sampling (md5 candidates, no users x items blowup), and the
  md5-bucket train/val/test split audit.

Every aggregate is integer-exact (quantized units) and every float is
produced by one identically-parenthesized IEEE expression in both
engines, so the oracle comparison is bitwise.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.llm.dedup import (
    containment_pairs,
    shingle_rows,
    shingles,
)
from my_flink_1_10_2_spark.queries import read, register

# ---------------------------------------------------------------------------
# Fuzzy entity resolution (blocked Levenshtein)
# ---------------------------------------------------------------------------


@register(
    "q_fuzzy_dedup_levenshtein",
    oracle="""
    WITH names AS (
      SELECT p_name, CAST(count(*) AS BIGINT) AS n_parts,
             str_split(p_name, ' ')[-1] AS noun
      FROM part GROUP BY 1
    )
    SELECT a.p_name AS name_a, b.p_name AS name_b,
           CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS edit_dist,
           a.n_parts AS n_parts_a, b.n_parts AS n_parts_b
    FROM names a JOIN names b ON a.noun = b.noun AND a.p_name < b.p_name
    WHERE levenshtein(a.p_name, b.p_name) BETWEEN 1 AND 3
    ORDER BY 1, 2
    """,
    category="pipeline",
)
def q_fuzzy_dedup_levenshtein(spark, sf_dir):
    """Fuzzy record linkage: near-identical part names by edit distance
    (ref: flink-table runtime string functions are exact-match only —
    fuzzy resolution is the op users bolt on top; Spark and DuckDB both
    ship unit-cost `levenshtein`).

    The 100 TB shape: first collapse the corpus to the DISTINCT name
    domain with part counts (one shuffle, output is domain-sized, not
    corpus-sized), then candidate pairs come from an equi-join on a
    blocking key (the trailing noun token) — never a cartesian.  Edit
    distance runs only on within-block pairs; the blocked self-join of a
    domain-sized relation broadcasts.  Output is the match table a
    merge step would apply: (name_a, name_b, distance, impact counts).
    """
    names = (
        read(spark, sf_dir, "part")
        .groupBy("p_name")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_parts"))
        .withColumn("noun", F.element_at(F.split("p_name", " "), -1))
    )
    a = names.select(
        F.col("p_name").alias("name_a"),
        F.col("n_parts").alias("n_parts_a"),
        "noun",
    )
    b = names.select(
        F.col("p_name").alias("name_b"),
        F.col("n_parts").alias("n_parts_b"),
        "noun",
    )
    return (
        a.join(b, "noun")
        .where(F.col("name_a") < F.col("name_b"))
        .withColumn(
            "edit_dist", F.levenshtein("name_a", "name_b").cast("bigint")
        )
        .where(F.col("edit_dist").between(1, 3))
        .select("name_a", "name_b", "edit_dist", "n_parts_a", "n_parts_b")
        .orderBy("name_a", "name_b")
    )


# ---------------------------------------------------------------------------
# Exact sparse cosine pairs with rare-term candidate generation
# ---------------------------------------------------------------------------

_RARE_DF = 10  # candidate terms must appear in <= this many docs
_COS_NUM = 16  # threshold tau = 0.8: cos >= tau  <=>  25*dot^2 >= 16*n1*n2
_COS_DEN = 25


@register(
    "q_cosine_pairs_rare_term",
    oracle=rf"""
    WITH w AS (SELECT doc_id, str_split_regex(text, '\s+') AS ws FROM documents),
    tok AS (
      SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS i FROM w
    ),
    tf AS (
      SELECT a.doc_id, a.word || ' ' || b.word AS term,
             CAST(count(*) AS BIGINT) AS tf
      FROM tok a JOIN tok b ON b.doc_id = a.doc_id AND b.i = a.i + 1
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    norms AS (
      SELECT doc_id, CAST(sum(tf * tf) AS BIGINT) AS norm2 FROM tf GROUP BY 1
    ),
    cand AS (
      SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
      FROM tf a JOIN tf b ON a.term = b.term AND a.doc_id < b.doc_id
      JOIN dfreq f ON f.term = a.term
      WHERE f.df <= {_RARE_DF}
    ),
    dotp AS (
      SELECT c.d1, c.d2, CAST(sum(x.tf * y.tf) AS BIGINT) AS dot_tt
      FROM cand c
      JOIN tf x ON x.doc_id = c.d1
      JOIN tf y ON y.doc_id = c.d2 AND y.term = x.term
      GROUP BY 1, 2
    )
    SELECT d.d1, d.d2, d.dot_tt, nx.norm2 AS norm1, ny.norm2 AS norm2,
           CAST(CASE WHEN {_COS_DEN} * d.dot_tt * d.dot_tt
                          >= {_COS_NUM} * nx.norm2 * ny.norm2
                     THEN 1 ELSE 0 END AS INT) AS is_neardup
    FROM dotp d
    JOIN norms nx ON nx.doc_id = d.d1
    JOIN norms ny ON ny.doc_id = d.d2
    ORDER BY 1, 2
    """,
    category="pipeline",
)
def q_cosine_pairs_rare_term(spark, sf_dir):
    """Exact sparse cosine similarity pairs with prefix-filter candidate
    generation: candidates must share a RARE bigram (df <= 10), then the
    full tf dot product verifies cosine >= 0.8 by integer
    cross-multiplication (25*dot^2 >= 16*|a|^2*|b|^2 — no float ever).

    Why this scales where all-pairs doesn't: the candidate join runs
    only over rare-term posting lists, so candidate count is bounded by
    sum(df^2) over rare terms — stop-terms never join.  Verification is
    two equi-joins of the small candidate set back to the tf relation.
    The emitted audit row keeps the integer components (dot, norms) so
    the threshold decision is replayable.  tf counts are BIGINT; with
    tf <= 10^3 per (doc, term) the cross-multiplied guard stays well
    inside int64.
    """
    docs = read(spark, sf_dir, "documents")
    tf = (
        shingle_rows(docs, n=2)
        .groupBy("doc_id", F.col("shingle").alias("term"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    )
    tf.cache()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    rare = F.broadcast(dfreq.where(F.col("df") <= _RARE_DF).select("term"))
    norms = tf.groupBy("doc_id").agg(
        F.sum(F.col("tf") * F.col("tf")).cast("bigint").alias("norm2")
    )
    post = tf.join(rare, "term")
    cand = (
        post.select(F.col("doc_id").alias("d1"), "term")
        .join(post.select(F.col("doc_id").alias("d2"), "term"), "term")
        .where(F.col("d1") < F.col("d2"))
        .select("d1", "d2")
        .distinct()
    )
    x = tf.select(F.col("doc_id").alias("d1"), "term", F.col("tf").alias("tf1"))
    y = tf.select(F.col("doc_id").alias("d2"), "term", F.col("tf").alias("tf2"))
    dot = (
        cand.join(x, "d1")
        .join(y, ["d2", "term"])
        .groupBy("d1", "d2")
        .agg(F.sum(F.col("tf1") * F.col("tf2")).cast("bigint").alias("dot_tt"))
    )
    nx = norms.select(F.col("doc_id").alias("d1"), F.col("norm2").alias("norm1"))
    ny = norms.select(F.col("doc_id").alias("d2"), F.col("norm2").alias("norm2"))
    return (
        dot.join(nx, "d1")
        .join(ny, "d2")
        .select(
            "d1",
            "d2",
            "dot_tt",
            "norm1",
            "norm2",
            F.when(
                F.lit(_COS_DEN) * F.col("dot_tt") * F.col("dot_tt")
                >= F.lit(_COS_NUM) * F.col("norm1") * F.col("norm2"),
                F.lit(1),
            )
            .otherwise(F.lit(0))
            .cast("int")
            .alias("is_neardup"),
        )
        .orderBy("d1", "d2")
    )


# ---------------------------------------------------------------------------
# Directed shingle containment (doc-inside-doc)
# ---------------------------------------------------------------------------

_CONTAIN_N = 4  # shingle width
_CONTAIN_NUM = 8  # containment >= 0.8: 10*inter >= 8*|A|
_CONTAIN_DEN = 10


@register(
    "q_shingle_containment",
    oracle=rf"""
    WITH w AS (SELECT doc_id, str_split_regex(text, '\s+') AS words FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(
               range(1, greatest(len(words) - {_CONTAIN_N - 1}, 1) + 1),
               i -> array_to_string(words[i:i + {_CONTAIN_N - 1}], ' '))) AS shingle
      FROM w
    ),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS inter_sz
      FROM sh x JOIN sh y ON x.shingle = y.shingle AND x.doc_id <> y.doc_id
      GROUP BY 1, 2
    )
    SELECT i.doc_a, i.doc_b, i.inter_sz, sa.n AS sz_a, sb.n AS sz_b
    FROM inter i
    JOIN sz sa ON sa.doc_id = i.doc_a
    JOIN sz sb ON sb.doc_id = i.doc_b
    WHERE {_CONTAIN_DEN} * i.inter_sz >= {_CONTAIN_NUM} * sa.n
    ORDER BY 1, 2
    """,
    category="pipeline",
)
def q_shingle_containment(spark, sf_dir):
    """Directed containment near-dup: |A ∩ B| / |A| >= 0.8 over distinct
    4-gram shingles — the doc-inside-doc case (quotes, concatenations,
    boilerplate wrappers) that symmetric Jaccard under-scores when
    |A| << |B| (Broder's resemblance vs containment distinction).

    Same scale shape as the proven Jaccard operator: shared-shingle
    equi-join for the intersection, domain-sized size relation joined
    twice, threshold by integer cross-multiplication.  Directed output:
    (doc_a contained-in doc_b) and (doc_b contained-in doc_a) are
    independent rows.
    """
    docs = read(spark, sf_dir, "documents")
    return containment_pairs(
        docs,
        n=_CONTAIN_N,
        threshold_num=_CONTAIN_NUM,
        threshold_den=_CONTAIN_DEN,
    ).orderBy("doc_a", "doc_b")


# ---------------------------------------------------------------------------
# Welch's t-test (A/B experiment readout)
# ---------------------------------------------------------------------------


@register(
    "q_welch_ttest",
    oracle="""
    WITH g AS (
      SELECT
        CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
        CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
        CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 10000) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_t,
        CAST(sum(CASE WHEN event_type = 'click'
                      THEN CAST(round(value * 10000) AS BIGINT) ELSE 0 END) AS BIGINT) AS s_c,
        CAST(sum(CASE WHEN event_type = 'purchase'
                      THEN CAST(round(value * 10000) AS BIGINT)
                           * CAST(round(value * 10000) AS BIGINT) ELSE 0 END) AS BIGINT) AS q_t,
        CAST(sum(CASE WHEN event_type = 'click'
                      THEN CAST(round(value * 10000) AS BIGINT)
                           * CAST(round(value * 10000) AS BIGINT) ELSE 0 END) AS BIGINT) AS q_c
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    m AS (
      SELECT n_t, n_c, s_t, s_c, q_t, q_c,
             (CAST(q_t AS DOUBLE)
              - (CAST(s_t AS DOUBLE) * CAST(s_t AS DOUBLE)) / CAST(n_t AS DOUBLE))
               / CAST(n_t - 1 AS DOUBLE) AS var_t,
             (CAST(q_c AS DOUBLE)
              - (CAST(s_c AS DOUBLE) * CAST(s_c AS DOUBLE)) / CAST(n_c AS DOUBLE))
               / CAST(n_c - 1 AS DOUBLE) AS var_c
      FROM g
    ),
    s AS (
      SELECT *, var_t / CAST(n_t AS DOUBLE) AS se_t,
             var_c / CAST(n_c AS DOUBLE) AS se_c
      FROM m
    )
    SELECT n_t AS n_treat, n_c AS n_ctrl, s_t AS sum_treat_e4,
           s_c AS sum_ctrl_e4, q_t AS ssq_treat_e8, q_c AS ssq_ctrl_e8,
           (CAST(s_t AS DOUBLE) / CAST(n_t AS DOUBLE)
            - CAST(s_c AS DOUBLE) / CAST(n_c AS DOUBLE))
             / sqrt(se_t + se_c) AS t_stat,
           ((se_t + se_c) * (se_t + se_c))
             / (se_t * se_t / CAST(n_t - 1 AS DOUBLE)
                + se_c * se_c / CAST(n_c - 1 AS DOUBLE)) AS welch_df
    FROM s
    """,
    category="pipeline",
)
def q_welch_ttest(spark, sf_dir):
    """Welch's unequal-variance t-test: purchase vs click event values —
    the per-metric readout an experimentation pipeline emits (treatment
    mean vs control mean, t statistic, Welch–Satterthwaite df).

    Scale/parity design: the corpus collapses to SIX exact BIGINT
    moments (n, sum, sum-of-squares per arm; values quantized to 1e-4
    units — at sf0.1 the squared sums stay < 5e17, inside int64) in one
    map-side-combined aggregate; every float after that is derived from
    the six integers by one identically-parenthesized IEEE expression
    (casts, divisions, sqrt — all correctly rounded), so both engines
    produce the same bits.  No per-row float ever crosses the shuffle.
    """
    v = F.round(F.col("value") * 10000).cast("bigint")
    is_t = F.col("event_type") == "purchase"
    is_c = F.col("event_type") == "click"
    g = (
        read(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "click"))
        .agg(
            F.sum(F.when(is_t, 1).otherwise(0)).cast("bigint").alias("n_t"),
            F.sum(F.when(is_c, 1).otherwise(0)).cast("bigint").alias("n_c"),
            F.sum(F.when(is_t, v).otherwise(0)).cast("bigint").alias("s_t"),
            F.sum(F.when(is_c, v).otherwise(0)).cast("bigint").alias("s_c"),
            F.sum(F.when(is_t, v * v).otherwise(0)).cast("bigint").alias("q_t"),
            F.sum(F.when(is_c, v * v).otherwise(0)).cast("bigint").alias("q_c"),
        )
    )
    d = lambda c: c.cast("double")  # noqa: E731
    var_t = (d(F.col("q_t")) - (d(F.col("s_t")) * d(F.col("s_t"))) / d(F.col("n_t"))) / d(
        F.col("n_t") - 1
    )
    var_c = (d(F.col("q_c")) - (d(F.col("s_c")) * d(F.col("s_c"))) / d(F.col("n_c"))) / d(
        F.col("n_c") - 1
    )
    m = g.withColumn("var_t", var_t).withColumn("var_c", var_c)
    s = m.withColumn("se_t", F.col("var_t") / d(F.col("n_t"))).withColumn(
        "se_c", F.col("var_c") / d(F.col("n_c"))
    )
    se2 = F.col("se_t") + F.col("se_c")
    return s.select(
        F.col("n_t").alias("n_treat"),
        F.col("n_c").alias("n_ctrl"),
        F.col("s_t").alias("sum_treat_e4"),
        F.col("s_c").alias("sum_ctrl_e4"),
        F.col("q_t").alias("ssq_treat_e8"),
        F.col("q_c").alias("ssq_ctrl_e8"),
        (
            (d(F.col("s_t")) / d(F.col("n_t")) - d(F.col("s_c")) / d(F.col("n_c")))
            / F.sqrt(se2)
        ).alias("t_stat"),
        (
            (se2 * se2)
            / (
                F.col("se_t") * F.col("se_t") / d(F.col("n_t") - 1)
                + F.col("se_c") * F.col("se_c") / d(F.col("n_c") - 1)
            )
        ).alias("welch_df"),
    )


# ---------------------------------------------------------------------------
# Time-weighted average (irregular timeseries rollup)
# ---------------------------------------------------------------------------


@register(
    "q_time_weighted_avg",
    oracle="""
    WITH seg AS (
      SELECT user_id,
             CAST(round(value * 100) AS BIGINT) AS v_e2,
             lead(epoch_us(ts)) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) - epoch_us(ts) AS dur_us
      FROM events
    )
    SELECT user_id,
           CAST(count(dur_us) AS BIGINT) AS n_segments,
           CAST(sum(dur_us) AS BIGINT) AS dur_us_total,
           CAST(sum(dur_us * v_e2) AS BIGINT) AS twa_wsum_e2,
           CAST(sum(dur_us * v_e2) AS DOUBLE)
             / CAST(sum(dur_us) AS DOUBLE) AS twa_e2
    FROM seg WHERE dur_us IS NOT NULL
    GROUP BY user_id
    ORDER BY user_id
    """,
    category="pipeline",
)
def q_time_weighted_avg(spark, sf_dir):
    """Time-weighted average value per user: each observation holds
    until the next one, so the mean weights by holding duration, not by
    event count — the standard irregular-timeseries rollup (IoT sensor
    state, position-weighted finance marks).

    One window (LEAD over the per-user event-time order, event_id
    tie-break) computes holding durations JVM-side; the rollup keeps
    exact integers — microsecond durations times 1e-2-quantized values
    stay < 1.3e17 per user for a month of data, inside int64 (a year at
    full value range would move this to DECIMAL(38,0), which Spark sums
    exactly).  The emitted double is one division of two exact int64s —
    bitwise in both engines.  At 100 TB the only shuffle is the window's
    hash partition on user_id, reused by the groupBy.
    """
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seg = (
        read(spark, sf_dir, "events")
        .select(
            "user_id",
            "ts",
            "event_id",
            F.round(F.col("value") * 100).cast("bigint").alias("v_e2"),
        )
        .withColumn(
            "dur_us",
            F.lead(F.unix_micros(F.col("ts").cast("timestamp"))).over(w)
            - F.unix_micros(F.col("ts").cast("timestamp")),
        )
        .where(F.col("dur_us").isNotNull())
    )
    return (
        seg.groupBy("user_id")
        .agg(
            F.count("dur_us").cast("bigint").alias("n_segments"),
            F.sum("dur_us").cast("bigint").alias("dur_us_total"),
            F.sum(F.col("dur_us") * F.col("v_e2"))
            .cast("bigint")
            .alias("twa_wsum_e2"),
            (
                F.sum(F.col("dur_us") * F.col("v_e2")).cast("double")
                / F.sum("dur_us").cast("double")
            ).alias("twa_e2"),
        )
        .orderBy("user_id")
    )


# ---------------------------------------------------------------------------
# Experimentation suite: two-proportion z-test, Mann-Whitney U, chi-squared
# ---------------------------------------------------------------------------


@register(
    "q_proportion_ztest",
    oracle="""
    WITH s AS (
      SELECT CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                  % 2 AS INT) AS variant,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    g AS (
      SELECT
        CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
        CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
        CAST(sum(CASE WHEN variant = 0 THEN hit ELSE 0 END) AS BIGINT) AS x_a,
        CAST(sum(CASE WHEN variant = 1 THEN hit ELSE 0 END) AS BIGINT) AS x_b
      FROM s
    )
    SELECT n_a, n_b, x_a, x_b,
           CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE) AS p_a,
           CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE) AS p_b,
           (CAST(x_a AS DOUBLE) / CAST(n_a AS DOUBLE)
            - CAST(x_b AS DOUBLE) / CAST(n_b AS DOUBLE))
             / sqrt((CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 - CAST(x_a + x_b AS DOUBLE) / CAST(n_a + n_b AS DOUBLE))
                    * (1.0 / CAST(n_a AS DOUBLE) + 1.0 / CAST(n_b AS DOUBLE)))
             AS z_stat
    FROM g
    """,
    category="pipeline",
)
def q_proportion_ztest(spark, sf_dir):
    """Two-proportion z-test: purchase share among purchase/view events,
    split into A/B arms by an md5-derived event hash (the engine-portable
    assignment recipe from q_partition_custom_layout) — the conversion
    readout of an experimentation pipeline.

    Scale/parity: the corpus collapses to FOUR exact BIGINT counts in
    one map-side-combined aggregate; p-hats, pooled rate and the z
    statistic are one identically-parenthesized IEEE expression over
    those integers (divisions + sqrt, all correctly rounded).
    """
    variant = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 2
    ).cast("int")
    hit = F.when(F.col("event_type") == "purchase", 1).otherwise(0)
    g = (
        read(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(variant.alias("variant"), hit.alias("hit"))
        .agg(
            F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_a"),
            F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_b"),
            F.sum(F.when(F.col("variant") == 0, F.col("hit")).otherwise(0))
            .cast("bigint")
            .alias("x_a"),
            F.sum(F.when(F.col("variant") == 1, F.col("hit")).otherwise(0))
            .cast("bigint")
            .alias("x_b"),
        )
    )
    d = lambda c: c.cast("double")  # noqa: E731
    p_a = d(F.col("x_a")) / d(F.col("n_a"))
    p_b = d(F.col("x_b")) / d(F.col("n_b"))
    pool = d(F.col("x_a") + F.col("x_b")) / d(F.col("n_a") + F.col("n_b"))
    return g.select(
        "n_a",
        "n_b",
        "x_a",
        "x_b",
        p_a.alias("p_a"),
        p_b.alias("p_b"),
        (
            (p_a - p_b)
            / F.sqrt(
                pool
                * (F.lit(1.0) - pool)
                * (F.lit(1.0) / d(F.col("n_a")) + F.lit(1.0) / d(F.col("n_b")))
            )
        ).alias("z_stat"),
    )


@register(
    "q_mannwhitney_u",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_t,
             CAST(round(value * 10000) AS BIGINT) AS v
      FROM events WHERE event_type IN ('purchase', 'click')
    ),
    per_v AS (
      SELECT v, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(is_t) AS BIGINT) AS cnt_t
      FROM s GROUP BY v
    ),
    rk AS (
      SELECT v, cnt, cnt_t,
             1 + coalesce(sum(cnt) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rnk
      FROM per_v
    ),
    g AS (
      SELECT
        CAST(sum(cnt_t) AS BIGINT) AS n1,
        CAST(sum(cnt - cnt_t) AS BIGINT) AS n2,
        CAST(sum(cnt_t * (2 * rnk + cnt - 1)) AS BIGINT) AS two_r1,
        CAST(sum(cnt * cnt * cnt - cnt) AS BIGINT) AS tie_t
      FROM rk
    )
    SELECT n1, n2, two_r1, tie_t,
           CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) / 2.0 AS u1,
           (CAST(two_r1 - n1 * (n1 + 1) AS DOUBLE) - CAST(n1 * n2 AS DOUBLE))
             / (2.0 * sqrt((CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) / 12.0)
                           * ((CAST(n1 + n2 AS DOUBLE) + 1.0)
                              - CAST(tie_t AS DOUBLE)
                                / (CAST(n1 + n2 AS DOUBLE)
                                   * (CAST(n1 + n2 AS DOUBLE) - 1.0)))))
             AS z_stat
    FROM g
    """,
    category="pipeline",
)
def q_mannwhitney_u(spark, sf_dir):
    """Mann-Whitney U (Wilcoxon rank-sum) with tie correction: the
    nonparametric purchase-vs-click comparison an experimentation
    pipeline runs when values are skewed and a t-test's normality
    assumption fails.

    Scale design — the rank trick: ranks come from a cumulative count
    over the VALUE DOMAIN (quantized 1e-4 units, one row per distinct
    value), not a corpus-wide window; tied ranks use the integer
    2*avg-rank protocol (2*rank + cnt - 1), and the tie-correction term
    sum(t^3 - t) is exact BIGINT (zero for untied values, so no filter).
    The corpus is touched by ONE groupBy(v); everything after runs on
    the domain-sized relation — and the domain cumulative itself is
    operators/rank.py::global_running (range-partitioned, never an
    unpartitioned window: the value domain is row-granularity at 100 TB).
    U and z are a single IEEE expression over four exact integers —
    bitwise in both engines.
    """
    from my_flink_1_10_2_spark.operators.rank import global_running

    s = (
        read(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "click"))
        .select(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_t"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v"),
        )
    )
    per_v = s.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("is_t").cast("bigint").alias("cnt_t"),
    )
    rk = global_running(per_v, ["v"], [("__cum", "cnt", "sum", False)]).withColumn(
        "rnk", F.lit(1) + F.col("__cum")
    )
    g = rk.agg(
        F.sum("cnt_t").cast("bigint").alias("n1"),
        F.sum(F.col("cnt") - F.col("cnt_t")).cast("bigint").alias("n2"),
        F.sum(
            F.col("cnt_t") * (F.lit(2) * F.col("rnk") + F.col("cnt") - F.lit(1))
        )
        .cast("bigint")
        .alias("two_r1"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt"))
        .cast("bigint")
        .alias("tie_t"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    two_u1 = d(F.col("two_r1") - F.col("n1") * (F.col("n1") + 1))
    n_tot = d(F.col("n1") + F.col("n2"))
    return g.select(
        "n1",
        "n2",
        "two_r1",
        "tie_t",
        (two_u1 / F.lit(2.0)).alias("u1"),
        (
            (two_u1 - d(F.col("n1") * F.col("n2")))
            / (
                F.lit(2.0)
                * F.sqrt(
                    (d(F.col("n1")) * d(F.col("n2")) / F.lit(12.0))
                    * (
                        (n_tot + F.lit(1.0))
                        - d(F.col("tie_t")) / (n_tot * (n_tot - F.lit(1.0)))
                    )
                )
            )
        ).alias("z_stat"),
    )


@register(
    "q_chi2_independence",
    oracle="""
    WITH s AS (
      SELECT event_type,
             CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 15))::BIGINT
                  % 2 AS INT) AS variant
      FROM events
    ),
    cells AS (
      SELECT event_type, variant, CAST(count(*) AS BIGINT) AS observed
      FROM s GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, variant, observed,
             CAST(sum(observed) OVER (PARTITION BY event_type) AS BIGINT) AS row_total,
             CAST(sum(observed) OVER (PARTITION BY variant) AS BIGINT) AS col_total,
             CAST(sum(observed) OVER () AS BIGINT) AS n
      FROM cells
    )
    SELECT event_type, variant, observed, row_total, col_total, n,
           (CAST(observed * n - row_total * col_total AS DOUBLE)
            * CAST(observed * n - row_total * col_total AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(row_total AS DOUBLE)
                * CAST(col_total AS DOUBLE)) AS contribution
    FROM tot
    ORDER BY event_type, variant
    """,
    category="pipeline",
)
def q_chi2_independence(spark, sf_dir):
    """Chi-squared independence cells: event_type x md5-assigned variant
    — the sample-ratio-mismatch / independence audit an experimentation
    pipeline runs before trusting an A/B readout.

    Per-cell output on purpose: each row carries exact BIGINT observed /
    marginal totals plus its chi-squared contribution computed by one
    IEEE expression ((O*n - rt*ct)^2 / (n*rt*ct) — the E-free form, so
    no intermediate float E); the caller sums contributions for the
    statistic.  Emitting cells instead of the scalar keeps the graded
    artifact float-sum-free (double addition is order-dependent) and
    more useful (the offending cell is visible).  One corpus aggregate,
    then window sums over the CELL relation (|types| x 2 rows).
    """
    variant = (
        F.conv(F.substring(F.md5(F.col("event_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 2
    ).cast("int")
    cells = (
        read(spark, sf_dir, "events")
        .select("event_type", variant.alias("variant"))
        .groupBy("event_type", "variant")
        .agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    )
    tot = (
        cells.withColumn(
            "row_total",
            F.sum("observed").over(Window.partitionBy("event_type")).cast("bigint"),
        )
        .withColumn(
            "col_total",
            F.sum("observed").over(Window.partitionBy("variant")).cast("bigint"),
        )
        .withColumn(
            "n", F.sum("observed").over(Window.partitionBy()).cast("bigint")
        )
    )
    num = (
        F.col("observed") * F.col("n") - F.col("row_total") * F.col("col_total")
    ).cast("double")
    return tot.select(
        "event_type",
        "variant",
        "observed",
        "row_total",
        "col_total",
        "n",
        (
            (num * num)
            / (
                F.col("n").cast("double")
                * F.col("row_total").cast("double")
                * F.col("col_total").cast("double")
            )
        ).alias("contribution"),
    ).orderBy("event_type", "variant")


# ---------------------------------------------------------------------------
# Correlation: Pearson r and Spearman rho (tie-aware)
# ---------------------------------------------------------------------------


@register(
    "q_pearson_corr",
    oracle="""
    WITH s AS (
      SELECT CAST(round(value * 100) AS BIGINT) AS x,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS y
      FROM events
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM s
    )
    SELECT n, sx, sy, sxy, sxx, syy,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS pearson_r
    FROM m
    """,
    category="pipeline",
)
def q_pearson_corr(spark, sf_dir):
    """Pearson correlation between the event value (1e-2-quantized) and
    the JSON payload's `k` field — metric-vs-metric correlation, the
    everyday exploratory statistic, with the JSON extraction staying
    JVM-side (get_json_object).

    One map-side-combined aggregate produces six exact BIGINT moments
    (x quantized to cents so sum(x^2) stays inside int64 through sf1);
    r is one IEEE expression over them, with every operand cast to
    DOUBLE BEFORE the n*sxx-style products (those exceed int64 at
    corpus scale — the double product is correctly rounded and
    identical in both engines).
    """
    s = read(spark, sf_dir, "events").select(
        F.round(F.col("value") * 100).cast("bigint").alias("x"),
        F.get_json_object("props", "$.k").cast("bigint").alias("y"),
    )
    m = s.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    return m.select(
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        (
            (d(F.col("n")) * d(F.col("sxy")) - d(F.col("sx")) * d(F.col("sy")))
            / (
                F.sqrt(d(F.col("n")) * d(F.col("sxx")) - d(F.col("sx")) * d(F.col("sx")))
                * F.sqrt(
                    d(F.col("n")) * d(F.col("syy")) - d(F.col("sy")) * d(F.col("sy"))
                )
            )
        ).alias("pearson_r"),
    )


@register(
    "q_spearman_corr",
    oracle="""
    WITH s AS (
      SELECT CAST(round(value * 10000) AS BIGINT) AS v,
             CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
      FROM events
    ),
    xd AS (
      SELECT v, CAST(count(*) AS BIGINT) AS cnt FROM s GROUP BY v
    ),
    xr AS (
      SELECT v, CAST(2 * (1 + coalesce(sum(cnt) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                 + cnt - 1 AS BIGINT) AS rx2
      FROM xd
    ),
    yd AS (
      SELECT k, CAST(count(*) AS BIGINT) AS cnt FROM s GROUP BY k
    ),
    yr AS (
      SELECT k, CAST(2 * (1 + coalesce(sum(cnt) OVER (ORDER BY k
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))
                 + cnt - 1 AS BIGINT) AS ry2
      FROM yd
    ),
    j AS (
      SELECT xr.rx2 AS x, yr.ry2 AS y
      FROM s JOIN xr ON xr.v = s.v JOIN yr ON yr.k = s.k
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(y * y) AS BIGINT) AS syy
      FROM j
    )
    SELECT n, sx, sy, sxy, sxx, syy,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                * sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS spearman_rho
    FROM m
    """,
    category="pipeline",
)
def q_spearman_corr(spark, sf_dir):
    """Spearman rank correlation (tie-aware): Pearson over average
    ranks, using the integer 2*avg-rank protocol from q_mannwhitney_u —
    rho is invariant under the x -> 2x rank scaling, so every moment
    stays exact BIGINT and no fractional rank ever exists.

    Scale design: ranks come from cumulative counts over the two VALUE
    DOMAINS (distinct quantized values / distinct k), joined back to the
    corpus — the k domain is tiny (rides broadcast), the v domain is an
    equi-join.  Both domain cumulatives run through
    operators/rank.py::global_running (the v domain is row-granularity
    at 100 TB — never an unpartitioned window).  One corpus pass for
    the domain counts, one for the
    moments.  The double expression is cast-before-multiply like
    q_pearson_corr (2*avg-rank second moments reach ~1e18 by sf1 —
    int64 holds through the graded scales, DECIMAL(38,0) is the
    full-corpus spelling).
    """
    s = read(spark, sf_dir, "events").select(
        F.round(F.col("value") * 10000).cast("bigint").alias("v"),
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
    )
    from my_flink_1_10_2_spark.operators.rank import global_running

    def _avg2_ranks(domain, key, out):
        cum = global_running(domain, [key], [("__cum", "cnt", "sum", False)])
        return cum.select(
            key,
            (F.lit(2) * (F.lit(1) + F.col("__cum")) + F.col("cnt") - F.lit(1))
            .cast("bigint")
            .alias(out),
        )

    xr = _avg2_ranks(
        s.groupBy("v").agg(F.count(F.lit(1)).cast("bigint").alias("cnt")), "v", "rx2"
    )
    yr = _avg2_ranks(
        s.groupBy("k").agg(F.count(F.lit(1)).cast("bigint").alias("cnt")), "k", "ry2"
    )
    j = s.join(xr, "v").join(F.broadcast(yr), "k").select(
        F.col("rx2").alias("x"), F.col("ry2").alias("y")
    )
    m = j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("bigint").alias("syy"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    return m.select(
        "n",
        "sx",
        "sy",
        "sxy",
        "sxx",
        "syy",
        (
            (d(F.col("n")) * d(F.col("sxy")) - d(F.col("sx")) * d(F.col("sy")))
            / (
                F.sqrt(d(F.col("n")) * d(F.col("sxx")) - d(F.col("sx")) * d(F.col("sx")))
                * F.sqrt(
                    d(F.col("n")) * d(F.col("syy")) - d(F.col("sy")) * d(F.col("sy"))
                )
            )
        ).alias("spearman_rho"),
    )


# ---------------------------------------------------------------------------
# Operational timeseries analytics: decay, trend, changepoint
# ---------------------------------------------------------------------------

_DAY_US = 86_400_000_000


@register(
    "q_decayed_event_counts",
    oracle=f"""
    WITH s AS (
      SELECT event_type,
             epoch_us(ts) // {_DAY_US} AS day
      FROM events
    ),
    m AS (SELECT max(day) AS max_day FROM s)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(1000000 // (CAST(1 AS BIGINT)
                                << least(max_day - day, 62))) AS BIGINT)
             AS decayed_e6
    FROM s, m
    GROUP BY event_type
    ORDER BY event_type
    """,
    category="pipeline",
)
def q_decayed_event_counts(spark, sf_dir):
    """Exponentially decayed event counts (half-life = 1 day): the
    trending-score primitive — recent events count fully, yesterday's at
    half weight.  The decay weight is the INTEGER ``1e6 >> age_days``
    (floor of 1e6 * 2^-age, zero past age 19 — the truncation is the
    quantization, not an approximation knob), so the per-type score is
    an exact BIGINT sum: no pow(), no float accumulation, no libm
    dependence.  One broadcastable one-row max-day relation plus one
    map-side-combined aggregate."""
    # integer day index: DIV semantics (both engines floor for
    # positive operands)
    s = read(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    m = s.agg(F.max("day").alias("max_day"))
    return (
        s.join(F.broadcast(m))
        .select(
            "event_type",
            F.expr(
                "1000000 DIV shiftleft(CAST(1 AS BIGINT), "
                "CAST(least(max_day - day, 62) AS INT))"
            ).alias("w_e6"),
        )
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("w_e6").cast("bigint").alias("decayed_e6"),
        )
        .orderBy("event_type")
    )


@register(
    "q_trend_slope_daily",
    oracle=f"""
    WITH s AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day FROM events
    ),
    base AS (SELECT min(day) AS min_day FROM s),
    daily AS (
      SELECT event_type, CAST(day - min_day AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
      FROM s, base GROUP BY 1, 2
    ),
    m AS (
      SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * y) AS BIGINT) AS sxy,
             CAST(sum(x * x) AS BIGINT) AS sxx
      FROM daily GROUP BY 1
    )
    SELECT event_type, n_days, sx, sy, sxy, sxx,
           (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
            - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope_per_day
    FROM m ORDER BY event_type
    """,
    category="pipeline",
)
def q_trend_slope_daily(spark, sf_dir):
    """Least-squares trend slope of the daily event count per type —
    the metric-drift detector an operations pipeline runs on every
    counter.  Day indexes are anchored to the GLOBAL min day so slopes
    are comparable across types.  The corpus collapses to the daily
    relation (one shuffle), the five regression moments are exact
    BIGINTs, and the slope is one cast-before-multiply IEEE expression
    — same bits in both engines."""
    s = read(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    base = s.agg(F.min("day").alias("min_day"))
    daily = (
        s.join(F.broadcast(base))
        .groupBy("event_type", (F.col("day") - F.col("min_day")).alias("x"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("y"))
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("x").cast("bigint").alias("sx"),
        F.sum("y").cast("bigint").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("bigint").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("bigint").alias("sxx"),
    )
    d = lambda c: c.cast("double")  # noqa: E731
    return m.select(
        "event_type",
        "n_days",
        "sx",
        "sy",
        "sxy",
        "sxx",
        (
            (d(F.col("n_days")) * d(F.col("sxy")) - d(F.col("sx")) * d(F.col("sy")))
            / (
                d(F.col("n_days")) * d(F.col("sxx"))
                - d(F.col("sx")) * d(F.col("sx"))
            )
        ).alias("slope_per_day"),
    ).orderBy("event_type")


@register(
    "q_cusum_changepoint",
    oracle=f"""
    WITH s AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day FROM events
    ),
    daily AS (
      SELECT event_type, day, CAST(count(*) AS BIGINT) AS y
      FROM s GROUP BY 1, 2
    ),
    tot AS (
      SELECT event_type, day, y,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_days,
             CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS total
      FROM daily
    ),
    cs AS (
      SELECT event_type, day, n_days, total,
             CAST(sum(n_days * y - total) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cusum
      FROM tot
    ),
    ranked AS (
      SELECT *, row_number() OVER (
               PARTITION BY event_type ORDER BY abs(cusum) DESC, day) AS rn
      FROM cs
    )
    SELECT event_type, CAST(day AS BIGINT) AS change_day,
           CAST(abs(cusum) AS BIGINT) AS max_abs_cusum, n_days, total
    FROM ranked WHERE rn = 1 ORDER BY event_type
    """,
    category="pipeline",
)
def q_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint candidate per event type: the day where the
    cumulative deviation of daily counts from their mean peaks — the
    standard level-shift detector.  The deviation is pre-scaled by
    n_days (``n*y - total``) so the cumulative sum is an exact BIGINT
    that crosses zero exactly where the float CUSUM would — no float
    exists anywhere in this query.  Windows run over the per-type DAY
    relation (~30 rows per type), never the corpus; ties break to the
    earliest day for determinism."""
    s = read(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    daily = s.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).cast("bigint").alias("y")
    )
    w_type = Window.partitionBy("event_type")
    tot = daily.withColumn(
        "n_days", F.count(F.lit(1)).over(w_type).cast("bigint")
    ).withColumn("total", F.sum("y").over(w_type).cast("bigint"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cs = tot.withColumn(
        "cusum",
        F.sum(F.col("n_days") * F.col("y") - F.col("total")).over(w_cum).cast("bigint"),
    )
    w_rank = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("cusum")).desc(), F.col("day")
    )
    return (
        cs.withColumn("rn", F.row_number().over(w_rank))
        .where(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("day").cast("bigint").alias("change_day"),
            F.abs(F.col("cusum")).cast("bigint").alias("max_abs_cusum"),
            "n_days",
            "total",
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Evaluation operators: NDCG@10, reciprocal-rank fusion, precision/recall/F1
# ---------------------------------------------------------------------------

import math as _math

# Integer NDCG discount table: w_r = round(1e9 / log2(r+1)).  log2 runs
# ONCE here in Python (libm) and the constants are embedded literally in
# BOTH engines — no engine-side transcendental ever (JVM log differs
# from libm by 1 ulp on ~7% of inputs; a literal table can't).
_NDCG_K = 10
_NDCG_W = tuple(round(1e9 / _math.log2(r + 1)) for r in range(1, _NDCG_K + 1))
_NDCG_CUM = tuple(
    sum(_NDCG_W[: r + 1]) for r in range(_NDCG_K)
)  # cumulative ideal DCG prefix sums


@register(
    "q_retrieval_ndcg",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, label AS q_label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_vec
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, q.q_label, e.vec_id, e.label,
             list_cosine_similarity(q.q_vec,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ),
    topk AS (
      SELECT query_id, q_label, vec_id, label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS rnk
      FROM scored QUALIFY rnk <= {_NDCG_K}
    ),
    w(r, w_e9, cumw_e9) AS (VALUES {", ".join(
        f"({r + 1}, {_NDCG_W[r]}, {_NDCG_CUM[r]})" for r in range(_NDCG_K)
    )}),
    dcg AS (
      SELECT t.query_id, t.q_label,
             CAST(sum(CASE WHEN t.label = t.q_label THEN w.w_e9 ELSE 0 END)
                  AS BIGINT) AS dcg_e9,
             CAST(sum(CASE WHEN t.label = t.q_label THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_rel_topk
      FROM topk t JOIN w ON w.r = t.rnk
      GROUP BY 1, 2
    ),
    nrel AS (
      SELECT q.query_id,
             least(CAST(count(*) AS BIGINT), {_NDCG_K}) AS ideal_k
      FROM q JOIN embeddings e
        ON e.label = q.q_label AND e.vec_id <> q.query_id
      GROUP BY 1
    )
    SELECT d.query_id, d.q_label, d.n_rel_topk, d.dcg_e9,
           w.cumw_e9 AS idcg_e9,
           CAST(d.dcg_e9 AS DOUBLE) / CAST(w.cumw_e9 AS DOUBLE) AS ndcg
    FROM dcg d JOIN nrel n ON n.query_id = d.query_id
    JOIN w ON w.r = n.ideal_k
    ORDER BY d.query_id
    """,
    category="pipeline",
)
def q_retrieval_ndcg(spark, sf_dir):
    """NDCG@10 of the exact cosine retriever against label-match
    relevance — the ranking-quality report every retrieval pipeline
    publishes.  The discount table ``round(1e9/log2(r+1))`` is computed
    once in Python and embedded as literals in BOTH engines (no
    engine-side log), so DCG is an exact BIGINT sum; ideal DCG is a
    prefix-sum lookup at min(#relevant, 10); NDCG is one IEEE division.

    Scale shape: the retriever is the proven broadcast-BLAS top-k; the
    eval adds one broadcast join to the 10-row weight table and a
    label-count aggregate — evaluation costs nothing extra at 100 TB.
    """
    from my_flink_1_10_2_spark.llm import similarity as S

    emb = read(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    topk = S.cosine_topk_bruteforce(emb, queries, k=_NDCG_K)
    labels = emb.select("vec_id", "label")
    q_labels = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    w = spark.createDataFrame(
        [(r + 1, _NDCG_W[r], _NDCG_CUM[r]) for r in range(_NDCG_K)],
        "r int, w_e9 long, cumw_e9 long",
    )
    scored = (
        topk.join(labels, "vec_id")
        .join(F.broadcast(q_labels), "query_id")
        .join(F.broadcast(w), F.col("rank") == F.col("r"))
    )
    dcg = scored.groupBy("query_id", "q_label").agg(
        F.sum(F.when(F.col("label") == F.col("q_label"), F.col("w_e9")).otherwise(0))
        .cast("bigint")
        .alias("dcg_e9"),
        F.sum(F.when(F.col("label") == F.col("q_label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_rel_topk"),
    )
    nrel = (
        q_labels.join(
            labels.select(F.col("vec_id").alias("c_id"), F.col("label").alias("q_label")),
            "q_label",
        )
        .where(F.col("c_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.least(F.count(F.lit(1)), F.lit(_NDCG_K)).cast("int").alias("ideal_k"))
    )
    return (
        dcg.join(nrel, "query_id")
        .join(F.broadcast(w), F.col("ideal_k") == F.col("r"))
        .select(
            "query_id",
            "q_label",
            "n_rel_topk",
            "dcg_e9",
            F.col("cumw_e9").alias("idcg_e9"),
            (F.col("dcg_e9").cast("double") / F.col("cumw_e9").cast("double")).alias(
                "ndcg"
            ),
        )
        .orderBy("query_id")
    )


_RRF_K0 = 60  # the standard RRF smoothing constant
_RRF_DEPTH = 20  # per-ranker candidate depth
_RRF_TOP = 10  # fused list size


@register(
    "q_rank_fusion_rrf",
    oracle=rf"""
    WITH q AS (SELECT vec_id AS query_id, label AS q_label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_vec
               FROM embeddings WHERE vec_id < 3),
    scored AS (
      SELECT q.query_id, e.vec_id AS doc_id,
             list_cosine_similarity(q.q_vec,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ),
    vec_ranks AS (
      SELECT query_id, doc_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, doc_id) AS vrank
      FROM scored QUALIFY vrank <= {_RRF_DEPTH}
    ),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(str_split_regex(text, '\s+')) AS shingle
      FROM documents
    ),
    sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM sh GROUP BY 1),
    inter AS (
      SELECT a.doc_id AS query_id, b.doc_id,
             CAST(count(*) AS BIGINT) AS i
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id <> b.doc_id
      WHERE a.doc_id < 3
      GROUP BY 1, 2
    ),
    text_ranks AS (
      SELECT inter.query_id, inter.doc_id,
             row_number() OVER (PARTITION BY inter.query_id ORDER BY
               CAST(i AS DOUBLE) / CAST(sq.n + sd.n - i AS DOUBLE) DESC,
               inter.doc_id) AS trank
      FROM inter
      JOIN sz sq ON sq.doc_id = inter.query_id
      JOIN sz sd ON sd.doc_id = inter.doc_id
      QUALIFY trank <= {_RRF_DEPTH}
    ),
    fused AS (
      SELECT coalesce(v.query_id, t.query_id) AS query_id,
             coalesce(v.doc_id, t.doc_id) AS doc_id,
             CAST(coalesce(v.vrank, 0) AS BIGINT) AS vec_rank,
             CAST(coalesce(t.trank, 0) AS BIGINT) AS text_rank,
             CAST(coalesce(CAST(round(1000000000.0
                    / CAST({_RRF_K0} + v.vrank AS DOUBLE)) AS BIGINT), 0)
                  + coalesce(CAST(round(1000000000.0
                    / CAST({_RRF_K0} + t.trank AS DOUBLE)) AS BIGINT), 0)
                  AS BIGINT) AS rrf_e9
      FROM vec_ranks v
      FULL OUTER JOIN text_ranks t
        ON t.query_id = v.query_id AND t.doc_id = v.doc_id
    )
    SELECT query_id, doc_id, vec_rank, text_rank, rrf_e9,
           CAST(fused_rank AS BIGINT) AS fused_rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY rrf_e9 DESC, doc_id) AS fused_rank
      FROM fused
    ) WHERE fused_rank <= {_RRF_TOP}
    ORDER BY query_id, fused_rank
    """,
    category="pipeline",
)
def q_rank_fusion_rrf(spark, sf_dir):
    """Reciprocal-rank fusion of two retrievers — the standard hybrid-
    search combiner (Cormack et al.): an embedding ranker (exact cosine
    top-20) and a lexical ranker (distinct-unigram Jaccard top-20) are
    fused by ``sum over rankers of round(1e9/(60+rank))`` — the RRF
    weight quantized to integer 1e-9 units, so the fused score is an
    exact BIGINT sum (the division+round is one IEEE expression both
    engines agree on bitwise).  Absent-from-a-ranker is rank 0 weight 0.

    Scale shape: each ranker is a proven pattern (broadcast-BLAS top-k;
    shared-shingle equi-join) truncated to depth 20 per query BEFORE the
    full-outer fusion join, so fusion touches ranker-output-sized
    relations only.
    """
    from my_flink_1_10_2_spark.llm import similarity as S
    from my_flink_1_10_2_spark.llm.dedup import shingles

    emb = read(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 3")
    vec_ranks = (
        S.cosine_topk_bruteforce(emb, queries, k=_RRF_DEPTH)
        .select("query_id", F.col("vec_id").alias("doc_id"), F.col("rank").alias("vrank"))
    )
    docs = read(spark, sf_dir, "documents")
    sh = shingles(docs, n=1)
    sz = sh.groupBy("doc_id").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    qs = sh.where(F.col("doc_id") < 3).select(
        F.col("doc_id").alias("query_id"), "shingle"
    )
    inter = (
        qs.join(sh, "shingle")
        .where(F.col("query_id") != F.col("doc_id"))
        .groupBy("query_id", "doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("i"))
    )
    jacc = (
        inter.join(sz.select(F.col("doc_id").alias("query_id"), F.col("n").alias("nq")), "query_id")
        .join(sz.select("doc_id", F.col("n").alias("nd")), "doc_id")
        .select(
            "query_id",
            "doc_id",
            (
                F.col("i").cast("double")
                / (F.col("nq") + F.col("nd") - F.col("i")).cast("double")
            ).alias("jacc"),
        )
    )
    w_t = Window.partitionBy("query_id").orderBy(F.col("jacc").desc(), F.col("doc_id"))
    text_ranks = (
        jacc.withColumn("trank", F.row_number().over(w_t))
        .where(F.col("trank") <= _RRF_DEPTH)
        .select("query_id", "doc_id", "trank")
    )
    rrf_w = lambda r: F.round(  # noqa: E731
        F.lit(1000000000.0) / (F.lit(_RRF_K0) + F.col(r)).cast("double")
    ).cast("bigint")
    fused = (
        vec_ranks.join(text_ranks, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce(F.col("vrank"), F.lit(0)).cast("bigint").alias("vec_rank"),
            F.coalesce(F.col("trank"), F.lit(0)).cast("bigint").alias("text_rank"),
            (
                F.coalesce(rrf_w("vrank"), F.lit(0))
                + F.coalesce(rrf_w("trank"), F.lit(0))
            )
            .cast("bigint")
            .alias("rrf_e9"),
        )
    )
    w_f = Window.partitionBy("query_id").orderBy(F.col("rrf_e9").desc(), F.col("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w_f).cast("bigint"))
        .where(F.col("fused_rank") <= _RRF_TOP)
        .select("query_id", "doc_id", "vec_rank", "text_rank", "rrf_e9", "fused_rank")
        .orderBy("query_id", "fused_rank")
    )


def _prf_oracle() -> str:
    from my_flink_1_10_2_spark.queries.llm import _lang_case_sql

    return f"""
    WITH pred AS (
      SELECT lang AS labeled, {_lang_case_sql()} AS predicted
      FROM documents
    ),
    cells AS (
      SELECT labeled, predicted, CAST(count(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    ),
    rt AS (SELECT labeled AS cls, CAST(sum(n) AS BIGINT) AS support FROM cells GROUP BY 1),
    ct AS (SELECT predicted AS cls, CAST(sum(n) AS BIGINT) AS predicted_n FROM cells GROUP BY 1),
    tp AS (SELECT labeled AS cls, n AS tp FROM cells WHERE labeled = predicted),
    m AS (
      SELECT coalesce(rt.cls, ct.cls) AS cls,
             CAST(coalesce(tp.tp, 0) AS BIGINT) AS tp,
             CAST(coalesce(ct.predicted_n, 0) - coalesce(tp.tp, 0) AS BIGINT) AS fp,
             CAST(coalesce(rt.support, 0) - coalesce(tp.tp, 0) AS BIGINT) AS fn
      FROM rt FULL OUTER JOIN ct ON ct.cls = rt.cls
      LEFT JOIN tp ON tp.cls = coalesce(rt.cls, ct.cls)
    )
    SELECT cls, tp, fp, fn,
           CASE WHEN tp + fp = 0 THEN NULL
                ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision_,
           CASE WHEN tp + fn = 0 THEN NULL
                ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall_,
           CASE WHEN 2 * tp + fp + fn = 0 THEN NULL
                ELSE CAST(2 * tp AS DOUBLE) / CAST(2 * tp + fp + fn AS DOUBLE)
           END AS f1
    FROM m ORDER BY cls
    """


@register("q_classifier_prf", oracle=_prf_oracle(), category="pipeline")
def q_classifier_prf(spark, sf_dir):
    """Per-class precision / recall / F1 of the stopword-profile
    language-ID heuristic against the labeled `lang` column — the
    metrics table that accompanies every heuristic filter
    (q_langid_confusion emits the matrix; this derives the scores).

    The confusion matrix cells are the only corpus-sized aggregate;
    tp/fp/fn come from matrix marginals (domain-sized joins), and each
    score is ONE IEEE division of exact BIGINTs with a shared
    zero-denominator guard.  F1 uses the 2tp/(2tp+fp+fn) form — a
    single division instead of the nested precision*recall expression,
    so no intermediate float composition.
    """
    from my_flink_1_10_2_spark.llm import text as T

    pred = read(spark, sf_dir, "documents").select(
        F.col("lang").alias("labeled"), T.lang_id("text").alias("predicted")
    )
    cells = pred.groupBy("labeled", "predicted").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    rt = cells.groupBy(F.col("labeled").alias("cls")).agg(
        F.sum("n").cast("bigint").alias("support")
    )
    ct = cells.groupBy(F.col("predicted").alias("cls")).agg(
        F.sum("n").cast("bigint").alias("predicted_n")
    )
    tp = cells.where(F.col("labeled") == F.col("predicted")).select(
        F.col("labeled").alias("cls"), F.col("n").alias("tp")
    )
    m = (
        rt.join(ct, "cls", "full_outer")
        .join(tp, "cls", "left")
        .select(
            "cls",
            F.coalesce("tp", F.lit(0)).cast("bigint").alias("tp"),
            (F.coalesce("predicted_n", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("bigint")
            .alias("fp"),
            (F.coalesce("support", F.lit(0)) - F.coalesce("tp", F.lit(0)))
            .cast("bigint")
            .alias("fn"),
        )
    )
    guard = lambda num, den: F.when(den == 0, F.lit(None)).otherwise(  # noqa: E731
        num.cast("double") / den.cast("double")
    )
    return m.select(
        "cls",
        "tp",
        "fp",
        "fn",
        guard(F.col("tp"), F.col("tp") + F.col("fp")).alias("precision_"),
        guard(F.col("tp"), F.col("tp") + F.col("fn")).alias("recall_"),
        guard(F.lit(2) * F.col("tp"), F.lit(2) * F.col("tp") + F.col("fp") + F.col("fn")).alias(
            "f1"
        ),
    ).orderBy("cls")


# ---------------------------------------------------------------------------
# Data-quality audits: Benford first-digit, PSI value drift
# ---------------------------------------------------------------------------

# Benford expectation log10(1 + 1/d) quantized to 1e-9 — computed once
# in Python, embedded literally in both engines.
_BENFORD_E9 = tuple(round(1e9 * _math.log10(1 + 1 / d)) for d in range(1, 10))


@register(
    "q_benford_digit_audit",
    oracle=f"""
    WITH s AS (
      SELECT CAST(substr(CAST(CAST(round(value * 100) AS BIGINT) AS VARCHAR),
                         1, 1) AS INT) AS digit
      FROM events WHERE round(value * 100) >= 1
    ),
    obs AS (
      SELECT digit, CAST(count(*) AS BIGINT) AS observed,
             CAST(sum(count(*)) OVER () AS BIGINT) AS n
      FROM s GROUP BY 1
    ),
    exp_t(digit, expected_e9) AS (VALUES {", ".join(
        f"({d + 1}, {_BENFORD_E9[d]})" for d in range(9)
    )})
    SELECT e.digit, CAST(coalesce(o.observed, 0) AS BIGINT) AS observed,
           (SELECT max(n) FROM obs) AS n,
           CAST(e.expected_e9 AS BIGINT) AS expected_e9,
           CAST(coalesce(o.observed, 0) * 1000000000
                - (SELECT max(n) FROM obs) * e.expected_e9 AS BIGINT)
             AS excess_e9
    FROM exp_t e LEFT JOIN obs o ON o.digit = e.digit
    ORDER BY e.digit
    """,
    category="pipeline",
)
def q_benford_digit_audit(spark, sf_dir):
    """Benford first-digit audit of the value column — the
    fabrication/quality screen auditors run on any transaction-like
    measure.  The first significant digit comes from the DECIMAL STRING
    of the exact 1e-2-quantized integer (no log10, no float boundary
    risk); the Benford expectation log10(1+1/d) is a literal 1e-9 table
    computed once in Python; the excess is the pure-BIGINT
    ``observed·1e9 − n·expected_e9``.  One aggregate over the corpus,
    everything after runs on 9 rows."""
    v_e2 = F.round(F.col("value") * 100).cast("bigint")
    s = (
        read(spark, sf_dir, "events")
        .select(v_e2.alias("v"))
        .where(F.col("v") >= 1)
        .select(F.substring(F.col("v").cast("string"), 1, 1).cast("int").alias("digit"))
    )
    obs = s.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("observed"))
    n_row = obs.agg(F.sum("observed").cast("bigint").alias("n"))
    exp_t = spark.createDataFrame(
        [(d + 1, _BENFORD_E9[d]) for d in range(9)], "digit int, expected_e9 long"
    )
    return (
        F.broadcast(exp_t)
        .join(obs, "digit", "left")
        .join(F.broadcast(n_row))
        .select(
            "digit",
            F.coalesce("observed", F.lit(0)).cast("bigint").alias("observed"),
            "n",
            F.col("expected_e9").cast("bigint").alias("expected_e9"),
            (
                F.coalesce("observed", F.lit(0)) * F.lit(1000000000)
                - F.col("n") * F.col("expected_e9")
            )
            .cast("bigint")
            .alias("excess_e9"),
        )
        .orderBy("digit")
    )


_PSI_BUCKET_W = 5000  # v_e2 units per bucket (50.00 value units)
_PSI_BUCKETS = 10


@register(
    "q_psi_value_drift",
    oracle=f"""
    WITH s AS (
      SELECT least(CAST(round(value * 100) AS BIGINT) // {_PSI_BUCKET_W},
                   {_PSI_BUCKETS - 1}) AS bucket,
             CASE WHEN epoch_us(ts) // 86400000000
                       - (SELECT min(epoch_us(ts) // 86400000000) FROM events)
                       < 15 THEN 0 ELSE 1 END AS half
      FROM events
    ),
    cells AS (
      SELECT bucket,
             CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS p_cnt,
             CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS q_cnt
      FROM s GROUP BY 1
    ),
    tot AS (
      SELECT bucket, p_cnt, q_cnt,
             CAST(sum(p_cnt) OVER () AS BIGINT) AS p_total,
             CAST(sum(q_cnt) OVER () AS BIGINT) AS q_total
      FROM cells
    ),
    lq AS (
      SELECT v, CAST(round(ln(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS l
      FROM (SELECT DISTINCT p_cnt AS v FROM tot WHERE p_cnt > 0
            UNION SELECT DISTINCT q_cnt FROM tot WHERE q_cnt > 0
            UNION SELECT DISTINCT p_total FROM tot
            UNION SELECT DISTINCT q_total FROM tot)
    )
    SELECT t.bucket, t.p_cnt, t.q_cnt, t.p_total, t.q_total,
           CAST(CASE WHEN t.p_cnt > 0 AND t.q_cnt > 0
                THEN (t.p_cnt * t.q_total - t.q_cnt * t.p_total)
                     * (lp.l + lqt.l - lq2.l - lpt.l)
                ELSE NULL END AS BIGINT) AS psi_num_e6,
           CASE WHEN t.p_cnt > 0 AND t.q_cnt > 0
                THEN CAST((t.p_cnt * t.q_total - t.q_cnt * t.p_total)
                          * (lp.l + lqt.l - lq2.l - lpt.l) AS DOUBLE)
                     / (CAST(t.p_total AS DOUBLE) * CAST(t.q_total AS DOUBLE)
                        * 1000000.0)
                ELSE NULL END AS psi_contrib
    FROM tot t
    LEFT JOIN lq lp ON lp.v = t.p_cnt
    LEFT JOIN lq lq2 ON lq2.v = t.q_cnt
    JOIN lq lpt ON lpt.v = t.p_total
    JOIN lq lqt ON lqt.v = t.q_total
    ORDER BY t.bucket
    """,
    category="pipeline",
)
def q_psi_value_drift(spark, sf_dir):
    """Population Stability Index cells between the month's first and
    second half — THE production drift monitor for any scored feature.
    Per bucket: PSI_i = (p_i/P − q_i/Q)·ln((p_i·Q)/(q_i·P)), emitted as
    the exact integer numerator ``(p_i·Q − q_i·P)·Δln_e6`` (quantized
    1e-6 logs over the DISTINCT count values via the libm Arrow kernel
    — the q_kl_divergence protocol) plus one IEEE division for the
    readable contribution.  Buckets empty on either side surface as
    NULL (the practitioner's epsilon decision), not silently dropped.
    Per-cell rows keep the report float-sum-free; int64 holds through
    sf0.1 (counts·totals ≈ 9e10 × Δln ≤ 1.4e7) — DECIMAL(38,0) is the
    full-corpus spelling."""
    import math

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from my_flink_1_10_2_spark.operators.hints import dim

    def _ln():
        def kernel(s):
            return pd.Series([math.log(float(v)) for v in s], dtype="float64")

        kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(kernel, DoubleType())

    ev = read(spark, sf_dir, "events")
    day = F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000")
    min_day = ev.agg(F.min(day).alias("min_day"))
    # integer bucket division via DIV (plain / would be float)
    s = ev.join(F.broadcast(min_day)).select(
        F.least(
            F.expr(f"CAST(round(value * 100) AS BIGINT) DIV {_PSI_BUCKET_W}"),
            F.lit(_PSI_BUCKETS - 1),
        )
        .cast("bigint")
        .alias("bucket"),
        F.when(day - F.col("min_day") < 15, 0).otherwise(1).alias("half"),
    )
    cells = s.groupBy("bucket").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).cast("bigint").alias("p_cnt"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).cast("bigint").alias("q_cnt"),
    )
    w = Window.partitionBy()
    tot = cells.withColumn("p_total", F.sum("p_cnt").over(w).cast("bigint")).withColumn(
        "q_total", F.sum("q_cnt").over(w).cast("bigint")
    )
    ln = _ln()
    vals = (
        tot.where(F.col("p_cnt") > 0).select(F.col("p_cnt").alias("v"))
        .unionByName(tot.where(F.col("q_cnt") > 0).select(F.col("q_cnt").alias("v")))
        .unionByName(tot.select(F.col("p_total").alias("v")))
        .unionByName(tot.select(F.col("q_total").alias("v")))
        .distinct()
        .withColumn("l", F.round(ln(F.col("v").cast("double")) * 1e6).cast("bigint"))
    )
    j = (
        tot.join(dim(vals.select(F.col("v").alias("p_cnt"), F.col("l").alias("l_p"))), "p_cnt", "left")
        .join(dim(vals.select(F.col("v").alias("q_cnt"), F.col("l").alias("l_q"))), "q_cnt", "left")
        .join(dim(vals.select(F.col("v").alias("p_total"), F.col("l").alias("l_pt"))), "p_total")
        .join(dim(vals.select(F.col("v").alias("q_total"), F.col("l").alias("l_qt"))), "q_total")
    )
    both = (F.col("p_cnt") > 0) & (F.col("q_cnt") > 0)
    num = (F.col("p_cnt") * F.col("q_total") - F.col("q_cnt") * F.col("p_total")) * (
        F.col("l_p") + F.col("l_qt") - F.col("l_q") - F.col("l_pt")
    )
    return j.select(
        "bucket",
        "p_cnt",
        "q_cnt",
        "p_total",
        "q_total",
        F.when(both, num).otherwise(F.lit(None)).cast("bigint").alias("psi_num_e6"),
        F.when(
            both,
            num.cast("double")
            / (
                F.col("p_total").cast("double")
                * F.col("q_total").cast("double")
                * F.lit(1000000.0)
            ),
        )
        .otherwise(F.lit(None))
        .alias("psi_contrib"),
    ).orderBy("bucket")


# ---------------------------------------------------------------------------
# Feature prep + survival: winsorization, Kaplan-Meier
# ---------------------------------------------------------------------------


@register(
    "q_winsorized_stats",
    oracle="""
    WITH s AS (
      SELECT event_type, CAST(round(value * 10000) AS BIGINT) AS v
      FROM events
    ),
    per_v AS (
      SELECT event_type, v, CAST(count(*) AS BIGINT) AS cnt
      FROM s GROUP BY 1, 2
    ),
    cum AS (
      SELECT event_type, v, cnt,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
             CAST(sum(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM per_v
    ),
    cuts AS (
      SELECT event_type, max(n) AS n,
             min(CASE WHEN cum >= (n * 5 + 99) // 100 THEN v END) AS p05,
             min(CASE WHEN cum >= (n * 95 + 99) // 100 THEN v END) AS p95
      FROM cum GROUP BY 1
    )
    SELECT p.event_type, c.n,
           CAST(c.p05 AS BIGINT) AS p05_e4, CAST(c.p95 AS BIGINT) AS p95_e4,
           CAST(sum(CASE WHEN p.v < c.p05 THEN p.cnt ELSE 0 END) AS BIGINT)
             AS n_clip_low,
           CAST(sum(CASE WHEN p.v > c.p95 THEN p.cnt ELSE 0 END) AS BIGINT)
             AS n_clip_high,
           CAST(sum(p.cnt * least(greatest(p.v, c.p05), c.p95)) AS BIGINT)
             AS wsum_e4,
           CAST(sum(p.cnt * least(greatest(p.v, c.p05), c.p95)) AS DOUBLE)
             / CAST(c.n AS DOUBLE) AS wmean_e4
    FROM per_v p JOIN cuts c ON c.event_type = p.event_type
    GROUP BY p.event_type, c.n, c.p05, c.p95
    ORDER BY p.event_type
    """,
    category="pipeline",
)
def q_winsorized_stats(spark, sf_dir):
    """Winsorized statistics per event type: clip values at the exact
    p05/p95 ORDER STATISTICS (k-th smallest, k = ceil(q·n) — discrete,
    no interpolation, so both engines agree on exact integers) and
    report the clipped counts and the winsorized mean — the outlier-
    robust feature-prep step before standardization.

    Scale design: the corpus collapses to the per-(type, value) domain
    relation once; the percentile search is a cumulative-count window
    over THAT relation (the q_weighted_median recipe), and clip stats
    are count-weighted sums over it — the corpus is scanned exactly
    once, values quantized to 1e-4 units."""
    s = read(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 10000).cast("bigint").alias("v")
    )
    per_v = s.groupBy("event_type", "v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = per_v.withColumn("cum", F.sum("cnt").over(w_cum).cast("bigint")).withColumn(
        "n", F.sum("cnt").over(w_all).cast("bigint")
    )
    cuts = cum.groupBy("event_type").agg(
        F.max("n").alias("n"),
        F.expr("min(CASE WHEN cum >= (n * 5 + 99) DIV 100 THEN v END)").alias("p05"),
        F.expr("min(CASE WHEN cum >= (n * 95 + 99) DIV 100 THEN v END)").alias("p95"),
    )
    clipped = F.least(F.greatest(F.col("v"), F.col("p05")), F.col("p95"))
    return (
        per_v.join(cuts, "event_type")
        .groupBy("event_type", "n", "p05", "p95")
        .agg(
            F.sum(F.when(F.col("v") < F.col("p05"), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_clip_low"),
            F.sum(F.when(F.col("v") > F.col("p95"), F.col("cnt")).otherwise(0))
            .cast("bigint")
            .alias("n_clip_high"),
            F.sum(F.col("cnt") * clipped).cast("bigint").alias("wsum_e4"),
            (
                F.sum(F.col("cnt") * clipped).cast("double")
                / F.col("n").cast("double")
            ).alias("wmean_e4"),
        )
        .select(
            "event_type",
            "n",
            F.col("p05").cast("bigint").alias("p05_e4"),
            F.col("p95").cast("bigint").alias("p95_e4"),
            "n_clip_low",
            "n_clip_high",
            "wsum_e4",
            "wmean_e4",
        )
        .orderBy("event_type")
    )


_KM_HORIZON_H = 168  # censor at 7 days
_HOUR_US = 3_600_000_000


@register(
    "q_kaplan_meier",
    oracle=f"""
    WITH u AS (
      SELECT user_id, min(epoch_us(ts)) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT user_id,
             CASE WHEN tp IS NOT NULL
                       AND (tp - t0) // {_HOUR_US} <= {_KM_HORIZON_H}
                  THEN 1 ELSE 0 END AS ev,
             CASE WHEN tp IS NOT NULL
                       AND (tp - t0) // {_HOUR_US} <= {_KM_HORIZON_H}
                  THEN (tp - t0) // {_HOUR_US} ELSE {_KM_HORIZON_H} END AS t
      FROM u
    ),
    grp AS (
      SELECT t, CAST(sum(ev) AS BIGINT) AS d_events,
             CAST(sum(1 - ev) AS BIGINT) AS c_censored
      FROM d GROUP BY 1
    ),
    risk AS (
      SELECT t, d_events, c_censored,
             CAST((SELECT count(*) FROM d)
                  - coalesce(sum(d_events + c_censored) OVER (ORDER BY t
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS n_risk
      FROM grp
    ),
    lq AS (
      SELECT v, CAST(round(ln(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS l
      FROM (SELECT DISTINCT n_risk AS v FROM risk WHERE n_risk > 0
            UNION SELECT DISTINCT n_risk - d_events FROM risk
            WHERE n_risk - d_events > 0)
    ),
    steps AS (
      SELECT r.t, r.n_risk, r.d_events, r.c_censored,
             CASE WHEN r.d_events > 0 THEN ls.l - ln_r.l ELSE 0 END AS step_e6,
             CASE WHEN r.d_events > 0 AND r.n_risk = r.d_events
                  THEN 1 ELSE 0 END AS hit_zero
      FROM risk r
      JOIN lq ln_r ON ln_r.v = r.n_risk
      LEFT JOIN lq ls ON ls.v = r.n_risk - r.d_events
    )
    SELECT t AS t_hours, n_risk, d_events, c_censored,
           CASE WHEN max(hit_zero) OVER (ORDER BY t
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) = 1
                THEN NULL
                ELSE CAST(sum(step_e6) OVER (ORDER BY t
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                     AS BIGINT)
           END AS log_surv_e6
    FROM steps
    WHERE d_events > 0
    ORDER BY t
    """,
    category="pipeline",
)
def q_kaplan_meier(spark, sf_dir):
    """Kaplan-Meier survival curve of time-to-first-purchase (hours from
    each user's first event), censored at the 7-day horizon — the
    estimator behind every retention / time-to-convert curve, with real
    right-censoring (the fixture censors ~3% of users).

    The float-free protocol: S(t) = prod(1 - d_i/n_i) becomes the
    CUMULATIVE INTEGER log ``sum of (ln(n_i - d_i) - ln(n_i))`` in 1e-6
    units — logs quantized once per DISTINCT risk-set size via the libm
    Arrow kernel, so the running product is an exact BIGINT sum and no
    engine-side exp/pow ever runs.  Per event time: risk-set size,
    events, censored, cumulative log-survival.

    Scale shape: one corpus groupBy(user), then everything runs on the
    event-time domain relation (≤ horizon-in-hours rows)."""
    import math

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from my_flink_1_10_2_spark.operators.hints import dim

    def _ln():
        def kernel(s):
            return pd.Series([math.log(float(v)) for v in s], dtype="float64")

        kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(kernel, DoubleType())

    ev = read(spark, sf_dir, "events")
    te = F.unix_micros(F.col("ts").cast("timestamp"))
    u = ev.groupBy("user_id").agg(
        F.min(te).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", te)).alias("tp"),
    )
    hrs = F.expr(f"(tp - t0) DIV {_HOUR_US}")
    is_ev = F.when(
        F.col("tp").isNotNull() & (hrs <= _KM_HORIZON_H), 1
    ).otherwise(0)
    d = u.select(
        is_ev.alias("ev"),
        F.when(is_ev == 1, hrs).otherwise(F.lit(_KM_HORIZON_H)).alias("t"),
    )
    grp = d.groupBy("t").agg(
        F.sum("ev").cast("bigint").alias("d_events"),
        F.sum(F.lit(1) - F.col("ev")).cast("bigint").alias("c_censored"),
    )
    from my_flink_1_10_2_spark.operators.rank import global_running

    n_total = d.count()
    risk = (
        global_running(
            grp.withColumn("__dc", F.col("d_events") + F.col("c_censored")),
            ["t"],
            [("__cumdc", "__dc", "sum", False)],
        )
        .withColumn("n_risk", (F.lit(n_total) - F.col("__cumdc")).cast("bigint"))
        .drop("__dc", "__cumdc")
    )
    ln = _ln()
    vals = (
        risk.where(F.col("n_risk") > 0).select(F.col("n_risk").alias("v"))
        .unionByName(
            risk.where(F.col("n_risk") - F.col("d_events") > 0).select(
                (F.col("n_risk") - F.col("d_events")).alias("v")
            )
        )
        .distinct()
        .withColumn("l", F.round(ln(F.col("v").cast("double")) * 1e6).cast("bigint"))
    )
    steps = (
        risk.join(dim(vals.select(F.col("v").alias("n_risk"), F.col("l").alias("l_n"))), "n_risk")
        .join(
            dim(vals.select(F.col("v").alias("__surv"), F.col("l").alias("l_s"))),
            F.col("__surv") == F.col("n_risk") - F.col("d_events"),
            "left",
        )
        .select(
            "t",
            "n_risk",
            "d_events",
            "c_censored",
            F.when(F.col("d_events") > 0, F.col("l_s") - F.col("l_n"))
            .otherwise(F.lit(0))
            .alias("step_e6"),
            F.when(
                (F.col("d_events") > 0) & (F.col("n_risk") == F.col("d_events")), 1
            )
            .otherwise(0)
            .alias("hit_zero"),
        )
    )
    run = global_running(
        steps,
        ["t"],
        [("__cum_step", "step_e6", "sum", True), ("__hit", "hit_zero", "max", True)],
    )
    return (
        run.withColumn(
            "log_surv_e6",
            # the curve reaches S=0 when the last at-risk subjects all
            # fail: log-survival is NULL (-inf) from that point on —
            # never a silently-skipped step
            F.when(F.col("__hit") == 1, F.lit(None)).otherwise(
                F.col("__cum_step").cast("bigint")
            ),
        )
        .where(F.col("d_events") > 0)
        .drop("hit_zero")
        .select(
            F.col("t").cast("bigint").alias("t_hours"),
            "n_risk",
            "d_events",
            "c_censored",
            "log_surv_e6",
        )
        .orderBy("t_hours")
    )


# ---------------------------------------------------------------------------
# Wilson interval + information gain
# ---------------------------------------------------------------------------

# 95% two-sided z, spelled as an explicit DOUBLE in the oracle: DuckDB
# parses a bare 1.96 as DECIMAL(3,2) and folds 1.96*1.96 to the EXACT
# decimal 3.8416 — one ulp from the double product Spark computes.
_WILSON_Z = "CAST(1.96 AS DOUBLE)"


@register(
    "q_wilson_daily_conversion",
    oracle=f"""
    WITH s AS (
      SELECT epoch_us(ts) // 86400000000 AS day,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS hit
      FROM events
    ),
    g AS (
      SELECT day, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(hit) AS BIGINT) AS x
      FROM s GROUP BY 1
    ),
    m AS (
      SELECT CAST(day AS BIGINT) AS day, n, x,
             CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             {_WILSON_Z} * {_WILSON_Z} AS z2
      FROM g
    )
    SELECT day, n, x, p,
           (p + z2 / (2.0 * CAST(n AS DOUBLE))
            - {_WILSON_Z} * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                + z2 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + z2 / CAST(n AS DOUBLE)) AS wilson_lo,
           (p + z2 / (2.0 * CAST(n AS DOUBLE))
            + {_WILSON_Z} * sqrt(p * (1.0 - p) / CAST(n AS DOUBLE)
                + z2 / (4.0 * CAST(n AS DOUBLE) * CAST(n AS DOUBLE))))
             / (1.0 + z2 / CAST(n AS DOUBLE)) AS wilson_hi
    FROM m ORDER BY day
    """,
    category="pipeline",
)
def q_wilson_daily_conversion(spark, sf_dir):
    """Daily purchase share with the Wilson 95% score interval — the
    small-sample-safe CI every metrics dashboard should use instead of
    the normal approximation (never exits [0,1], works at x=0).

    One corpus aggregate to (day, n, x) exact integers; lo/hi are one
    identically-parenthesized IEEE expression with the z=1.96 literal
    embedded in both engines — bitwise parity, no stats library."""
    s = read(spark, sf_dir, "events").select(
        F.expr("unix_micros(CAST(ts AS TIMESTAMP)) DIV 86400000000").alias("day"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("hit"),
    )
    g = s.groupBy("day").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("hit").cast("bigint").alias("x"),
    )
    z = F.lit(1.96)
    n_d = F.col("n").cast("double")
    p = F.col("x").cast("double") / n_d
    z2 = z * z
    half = z * F.sqrt(p * (F.lit(1.0) - p) / n_d + z2 / (F.lit(4.0) * n_d * n_d))
    denom = F.lit(1.0) + z2 / n_d
    center = p + z2 / (F.lit(2.0) * n_d)
    return g.select(
        F.col("day").cast("bigint").alias("day"),
        "n",
        "x",
        p.alias("p"),
        ((center - half) / denom).alias("wilson_lo"),
        ((center + half) / denom).alias("wilson_hi"),
    ).orderBy("day")


@register(
    "q_information_gain",
    oracle=r"""
    WITH docs_n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
    vocab AS (
      SELECT DISTINCT unnest(str_split_regex(text, '\s+')) AS word
      FROM documents
    ),
    pres AS (
      SELECT v.word, d.lang,
             CASE WHEN len(list_intersect(str_split_regex(d.text, '\s+'),
                                          [v.word])) > 0
                  THEN 1 ELSE 0 END AS has_w
      FROM documents d CROSS JOIN vocab v
    ),
    cells AS (
      SELECT word, lang, has_w, CAST(count(*) AS BIGINT) AS c
      FROM pres GROUP BY 1, 2, 3
    ),
    branch AS (
      SELECT word, has_w, CAST(sum(c) AS BIGINT) AS nb
      FROM cells GROUP BY 1, 2
    ),
    lang_tot AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS cl FROM documents GROUP BY 1
    ),
    lq AS (
      SELECT v, CAST(round(ln(CAST(v AS DOUBLE)) * 1000000.0) AS BIGINT) AS l
      FROM (SELECT DISTINCT c AS v FROM cells WHERE c > 0
            UNION SELECT DISTINCT nb FROM branch WHERE nb > 0
            UNION SELECT DISTINCT cl FROM lang_tot
            UNION SELECT n FROM docs_n)
    ),
    h_label AS (
      -- n*H(lang) in 1e-6 nat units: sum over langs of cl*(ln n - ln cl)
      SELECT CAST(sum(lt.cl * (ln_n.l - ll.l)) AS BIGINT) AS nh
      FROM lang_tot lt
      JOIN lq ll ON ll.v = lt.cl
      CROSS JOIN docs_n JOIN lq ln_n ON ln_n.v = docs_n.n
    ),
    h_cond AS (
      -- n*H(lang | has_w) = sum over branches/langs of c*(ln nb - ln c)
      SELECT c.word, CAST(sum(c.c * (lb.l - lc.l)) AS BIGINT) AS nh_cond
      FROM cells c
      JOIN branch b ON b.word = c.word AND b.has_w = c.has_w
      JOIN lq lb ON lb.v = b.nb
      JOIN lq lc ON lc.v = c.c
      WHERE c.c > 0
      GROUP BY 1
    )
    SELECT h.word,
           CAST(b.nb AS BIGINT) AS n_with,
           CAST((SELECT nh FROM h_label) - h.nh_cond AS BIGINT) AS ig_num_e6
    FROM h_cond h
    JOIN branch b ON b.word = h.word AND b.has_w = 1
    ORDER BY h.word
    """,
    category="pipeline",
)
def q_information_gain(spark, sf_dir):
    """Information gain of each vocabulary word for predicting the
    document language — the classic feature-selection ranking
    (IG(w) = H(lang) − H(lang | presence of w)).

    Float-free: the graded value is n·IG in exact 1e-6 nat integer
    units — n·H terms expand to Σ c·(ln n_branch − ln c), every log
    quantized once per DISTINCT count via the libm Arrow kernel
    (the q_kl protocol).  Presence counts come from the exploded
    (doc, word) relation joined to the vocabulary — at 100 TB the
    presence matrix is |vocab|-bounded per doc, and the per-word
    relations are vocabulary-sized."""
    import math

    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    from my_flink_1_10_2_spark.operators.hints import dim

    def _ln():
        def kernel(s):
            return pd.Series([math.log(float(v)) for v in s], dtype="float64")

        kernel.__annotations__ = {"s": pd.Series, "return": pd.Series}
        return pandas_udf(kernel, DoubleType())

    docs = read(spark, sf_dir, "documents")
    n_total = docs.count()
    dw = docs.select(
        "doc_id", "lang", F.explode(F.split("text", r"\s+")).alias("word")
    ).distinct()
    vocab = dw.select("word").distinct()
    # presence cells: with-word counts from dw; without = lang total - with
    with_c = dw.groupBy("word", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("c1")
    )
    lang_tot = docs.groupBy("lang").agg(F.count(F.lit(1)).cast("bigint").alias("cl"))
    full = (
        vocab.crossJoin(dim(lang_tot))
        .join(with_c, ["word", "lang"], "left")
        .select(
            "word",
            "lang",
            "cl",
            F.coalesce("c1", F.lit(0)).cast("bigint").alias("c1"),
        )
        .withColumn("c0", (F.col("cl") - F.col("c1")).cast("bigint"))
    )
    branch = full.groupBy("word").agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c0").cast("bigint").alias("n0"),
    )
    ln = _ln()
    vals = (
        full.where(F.col("c1") > 0).select(F.col("c1").alias("v"))
        .unionByName(full.where(F.col("c0") > 0).select(F.col("c0").alias("v")))
        .unionByName(branch.where(F.col("n1") > 0).select(F.col("n1").alias("v")))
        .unionByName(branch.where(F.col("n0") > 0).select(F.col("n0").alias("v")))
        .unionByName(lang_tot.select(F.col("cl").alias("v")))
        .unionByName(docs.agg(F.count(F.lit(1)).cast("bigint").alias("v")))
        .distinct()
        .withColumn("l", F.round(ln(F.col("v").cast("double")) * 1e6).cast("bigint"))
    )
    lv = lambda a, b: dim(vals.select(F.col("v").alias(a), F.col("l").alias(b)))  # noqa: E731
    # n*H(lang): sum cl*(ln n - ln cl)
    nh_label = (
        lang_tot.join(lv("cl", "l_cl"), "cl")
        .crossJoin(
            dim(
                docs.agg(F.count(F.lit(1)).cast("bigint").alias("n")).join(
                    lv("n", "l_n"), "n"
                )
            )
        )
        .agg(F.sum(F.col("cl") * (F.col("l_n") - F.col("l_cl"))).cast("bigint").alias("nh"))
    )
    # n*H(lang | w): per word sum over both branches
    j = (
        full.join(dim(branch), "word")
        .join(lv("c1", "l_c1"), "c1", "left")
        .join(lv("c0", "l_c0"), "c0", "left")
        .join(lv("n1", "l_n1"), "n1", "left")
        .join(lv("n0", "l_n0"), "n0", "left")
    )
    term1 = F.when(F.col("c1") > 0, F.col("c1") * (F.col("l_n1") - F.col("l_c1"))).otherwise(0)
    term0 = F.when(F.col("c0") > 0, F.col("c0") * (F.col("l_n0") - F.col("l_c0"))).otherwise(0)
    nh_cond = j.groupBy("word").agg(
        F.max("n1").cast("bigint").alias("n_with"),
        F.sum(term1 + term0).cast("bigint").alias("nh_cond"),
    )
    return (
        nh_cond.crossJoin(F.broadcast(nh_label))
        .select(
            "word",
            "n_with",
            (F.col("nh") - F.col("nh_cond")).cast("bigint").alias("ig_num_e6"),
        )
        .orderBy("word")
    )


@register(
    "q_retrieval_mrr_recall",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, label AS q_label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_vec
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, q.q_label, e.vec_id, e.label,
             list_cosine_similarity(q.q_vec,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id
    ),
    topk AS (
      SELECT query_id, q_label, vec_id, label,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY sim DESC, vec_id) AS rnk
      FROM scored QUALIFY rnk <= {_NDCG_K}
    ),
    agg AS (
      SELECT query_id, q_label,
             CAST(min(CASE WHEN label = q_label THEN rnk END) AS BIGINT)
               AS first_rel_rank,
             CAST(sum(CASE WHEN label = q_label THEN 1 ELSE 0 END) AS BIGINT)
               AS n_rel_topk
      FROM topk GROUP BY 1, 2
    ),
    nrel AS (
      SELECT q.query_id, CAST(count(*) AS BIGINT) AS n_rel_corpus
      FROM q JOIN embeddings e
        ON e.label = q.q_label AND e.vec_id <> q.query_id
      GROUP BY 1
    )
    SELECT a.query_id, a.q_label, a.first_rel_rank, a.n_rel_topk,
           n.n_rel_corpus,
           CAST(coalesce(CAST(round(1000000000.0
                  / CAST(a.first_rel_rank AS DOUBLE)) AS BIGINT), 0) AS BIGINT)
             AS rr_e9,
           CAST(a.n_rel_topk AS DOUBLE)
             / CAST(least(n.n_rel_corpus, {_NDCG_K}) AS DOUBLE) AS recall_at_k
    FROM agg a JOIN nrel n ON n.query_id = a.query_id
    ORDER BY a.query_id
    """,
    category="pipeline",
)
def q_retrieval_mrr_recall(spark, sf_dir):
    """MRR and recall@10 per query for the exact cosine retriever — the
    two metrics that accompany NDCG on every retrieval dashboard.  The
    reciprocal rank is the integer ``round(1e9/first_rel_rank)`` (zero
    when no relevant doc reaches the top 10); recall divides exact
    integers by the achievable maximum min(#relevant, 10).  Same
    broadcast-BLAS top-k as q_retrieval_ndcg — the eval is one
    aggregate over its 100 rows."""
    from my_flink_1_10_2_spark.llm import similarity as S

    emb = read(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    topk = S.cosine_topk_bruteforce(emb, queries, k=_NDCG_K)
    labels = emb.select("vec_id", "label")
    q_labels = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    scored = topk.join(labels, "vec_id").join(F.broadcast(q_labels), "query_id")
    agg = scored.groupBy("query_id", "q_label").agg(
        F.min(F.when(F.col("label") == F.col("q_label"), F.col("rank")))
        .cast("bigint")
        .alias("first_rel_rank"),
        F.sum(F.when(F.col("label") == F.col("q_label"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_rel_topk"),
    )
    nrel = (
        q_labels.join(
            labels.select(F.col("vec_id").alias("c_id"), F.col("label").alias("q_label")),
            "q_label",
        )
        .where(F.col("c_id") != F.col("query_id"))
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_rel_corpus"))
    )
    return (
        agg.join(nrel, "query_id")
        .select(
            "query_id",
            "q_label",
            "first_rel_rank",
            "n_rel_topk",
            "n_rel_corpus",
            F.coalesce(
                F.round(
                    F.lit(1000000000.0) / F.col("first_rel_rank").cast("double")
                ).cast("bigint"),
                F.lit(0),
            )
            .cast("bigint")
            .alias("rr_e9"),
            (
                F.col("n_rel_topk").cast("double")
                / F.least(F.col("n_rel_corpus"), F.lit(_NDCG_K)).cast("double")
            ).alias("recall_at_k"),
        )
        .orderBy("query_id")
    )


@register(
    "q_auc_roc",
    oracle="""
    WITH s AS (
      SELECT CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_pos,
             CAST(round(value * 10000) AS BIGINT) AS v
      FROM events WHERE event_type IN ('purchase', 'view')
    ),
    per_v AS (
      SELECT v, CAST(count(*) AS BIGINT) AS cnt,
             CAST(sum(is_pos) AS BIGINT) AS cnt_p
      FROM s GROUP BY v
    ),
    rk AS (
      SELECT v, cnt, cnt_p,
             1 + coalesce(sum(cnt) OVER (ORDER BY v
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS rnk
      FROM per_v
    ),
    g AS (
      SELECT
        CAST(sum(cnt_p) AS BIGINT) AS n_pos,
        CAST(sum(cnt - cnt_p) AS BIGINT) AS n_neg,
        CAST(sum(cnt_p * (2 * rnk + cnt - 1)) AS BIGINT) AS two_r_pos
      FROM rk
    )
    SELECT n_pos, n_neg, two_r_pos,
           CAST(two_r_pos - n_pos * (n_pos + 1) AS DOUBLE)
             / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n_neg AS DOUBLE)) AS auc
    FROM g
    """,
    category="pipeline",
)
def q_auc_roc(spark, sf_dir):
    """ROC AUC of the value column as a purchase-vs-view classifier
    score — computed THROUGH the Mann-Whitney identity
    AUC = U / (n_pos * n_neg), with ties worth half (the 2*avg-rank
    integer protocol handles that exactly).  Same value-domain rank
    trick as q_mannwhitney_u: one corpus groupBy(v), then
    operators/rank.py::global_running over the domain (range-
    partitioned — never an unpartitioned window), three exact BIGINTs,
    one IEEE division chain."""
    s = (
        read(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .select(
            F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_pos"),
            F.round(F.col("value") * 10000).cast("bigint").alias("v"),
        )
    )
    per_v = s.groupBy("v").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum("is_pos").cast("bigint").alias("cnt_p"),
    )
    from my_flink_1_10_2_spark.operators.rank import global_running

    rk = global_running(per_v, ["v"], [("__cum", "cnt", "sum", False)]).withColumn(
        "rnk", F.lit(1) + F.col("__cum")
    )
    g = rk.agg(
        F.sum("cnt_p").cast("bigint").alias("n_pos"),
        F.sum(F.col("cnt") - F.col("cnt_p")).cast("bigint").alias("n_neg"),
        F.sum(
            F.col("cnt_p") * (F.lit(2) * F.col("rnk") + F.col("cnt") - F.lit(1))
        )
        .cast("bigint")
        .alias("two_r_pos"),
    )
    return g.select(
        "n_pos",
        "n_neg",
        "two_r_pos",
        (
            (F.col("two_r_pos") - F.col("n_pos") * (F.col("n_pos") + 1)).cast("double")
            / (
                F.lit(2.0)
                * F.col("n_pos").cast("double")
                * F.col("n_neg").cast("double")
            )
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# ANN index quality dashboard: recall@5 of every index family vs exact
# ---------------------------------------------------------------------------

_ANN_METHODS = (
    ("lsh", "q_embedding_topk_lsh"),
    ("ivf", "q_embedding_topk_ivf"),
    ("pq", "q_embedding_topk_pq"),
    ("ivfadc", "q_embedding_topk_ivfadc"),
)


def _ann_recall_oracle() -> str:
    from my_flink_1_10_2_spark.queries import REGISTRY

    exact = REGISTRY["q_embedding_topk"].oracle
    parts = [f"exact AS (SELECT query_id, vec_id FROM ({exact}))"]
    hit_rows = []
    for tag, qname in _ANN_METHODS:
        parts.append(
            f"m_{tag} AS (SELECT query_id, vec_id FROM ({REGISTRY[qname].oracle}))"
        )
        hit_rows.append(
            f"SELECT '{tag}' AS method, CAST(count(*) AS BIGINT) AS hits "
            f"FROM m_{tag} JOIN exact USING (query_id, vec_id)"
        )
    return (
        "WITH "
        + ",\n".join(parts)
        + ",\nhits AS (\n"
        + "\nUNION ALL\n".join(hit_rows)
        + "\n),\ntot AS (SELECT CAST(count(*) AS BIGINT) AS total FROM exact)\n"
        + "SELECT method, hits, total,\n"
        + "       CAST(hits AS DOUBLE) / CAST(total AS DOUBLE) AS recall_at_5\n"
        + "FROM hits CROSS JOIN tot ORDER BY method"
    )


@register("q_ann_recall_matrix", oracle=_ann_recall_oracle(), category="pipeline")
def q_ann_recall_matrix(spark, sf_dir):
    """The ANN index quality dashboard: recall@5 of EVERY approximate
    index family (integer-LSH, IVF, PQ/ADC, IVFADC) against the exact
    brute-force top-5 in one graded relation — the report an index
    owner publishes before routing production traffic to an
    approximate path.

    Both sides COMPOSE the already-proven per-index implementations:
    the Spark side re-runs the four registry operators plus the exact
    retriever and joins candidate sets; the oracle nests the four
    bitwise index-replay SQLs as subqueries.  Any future regression in
    any index family trips this row even if the family's own query is
    not in the driver's sample that round."""
    from my_flink_1_10_2_spark.queries import REGISTRY

    exact = (
        REGISTRY["q_embedding_topk"]
        .spark_fn(spark, sf_dir)
        .select("query_id", "vec_id")
        .cache()
    )
    unions = None
    for tag, qname in _ANN_METHODS:
        m = (
            REGISTRY[qname]
            .spark_fn(spark, sf_dir)
            .select(F.lit(tag).alias("method"), "query_id", "vec_id")
        )
        unions = m if unions is None else unions.unionByName(m)
    counted = (
        unions.join(exact, ["query_id", "vec_id"])
        .groupBy("method")
        .agg(F.count(F.lit(1)).cast("bigint").alias("hits"))
    )
    # a method with ZERO hits must still report its row (the oracle's
    # UNION ALL branches always emit one) — anchor on the method list
    methods = spark.createDataFrame(
        [(tag,) for tag, _ in _ANN_METHODS], "method string"
    )
    hits = (
        F.broadcast(methods)
        .join(counted, "method", "left")
        .select("method", F.coalesce("hits", F.lit(0)).cast("bigint").alias("hits"))
    )
    tot = exact.agg(F.count(F.lit(1)).cast("bigint").alias("total"))
    return (
        hits.crossJoin(F.broadcast(tot))
        .select(
            "method",
            "hits",
            "total",
            (F.col("hits").cast("double") / F.col("total").cast("double")).alias(
                "recall_at_5"
            ),
        )
        .orderBy("method")
    )


# ---------------------------------------------------------------------------
# Training-pair construction: hard negatives, sampled negatives, splits
# ---------------------------------------------------------------------------


@register(
    "q_hard_negative_mining",
    oracle="""
    WITH q AS (SELECT vec_id AS query_id, label AS q_label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS q_vec
               FROM embeddings WHERE vec_id < 10),
    scored AS (
      SELECT q.query_id, q.q_label, e.vec_id, e.label,
             list_cosine_similarity(q.q_vec,
               list_transform(e.embedding, x -> CAST(x AS DOUBLE))) AS sim
      FROM embeddings e CROSS JOIN q
      WHERE e.vec_id <> q.query_id AND e.label <> q.q_label
    )
    SELECT query_id, q_label, vec_id, label AS neg_label,
           round(sim, 9) AS sim, CAST(neg_rank AS BIGINT) AS neg_rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY query_id
                                   ORDER BY sim DESC, vec_id) AS neg_rank
      FROM scored
    ) WHERE neg_rank <= 3
    ORDER BY query_id, neg_rank
    """,
    category="pipeline",
)
def q_hard_negative_mining(spark, sf_dir):
    """Hard-negative mining for contrastive training: per query, the 3
    most-similar vectors with a DIFFERENT label — the negatives that
    actually teach the model (random negatives are trivially separable;
    hard ones sit at the decision boundary).

    The label-mismatch predicate is pushed BEFORE the top-k: queries
    are grouped by their label (a label-domain-sized driver loop, ≤10
    groups) and each group retrieves top-3 against the corpus with that
    label excluded — so the partial top-k shrinkage applies and the
    result is EXACTLY the global hardest negatives, not a post-filtered
    approximation that could run dry."""
    from my_flink_1_10_2_spark.llm import similarity as S

    emb = read(spark, sf_dir, "embeddings")
    queries = emb.filter("vec_id < 10")
    q_labels_rows = queries.select("label").distinct().collect()  # label domain
    parts = []
    for row in q_labels_rows:
        lbl = row.label
        grp_q = queries.where(F.col("label") == lbl)
        corpus = emb.where(F.col("label") != lbl)
        parts.append(S.cosine_topk_bruteforce(corpus, grp_q, k=3))
    topk = parts[0]
    for p in parts[1:]:
        topk = topk.unionByName(p)
    labels = emb.select("vec_id", "label")
    q_labels = queries.select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("q_label")
    )
    return (
        topk.join(labels, "vec_id")
        .join(F.broadcast(q_labels), "query_id")
        .select(
            "query_id",
            "q_label",
            "vec_id",
            F.col("label").alias("neg_label"),
            F.round("sim", 9).alias("sim"),
            F.col("rank").cast("bigint").alias("neg_rank"),
        )
        .orderBy("query_id", "neg_rank")
    )


_NEG_BUCKETS = 16  # candidate thinning: ~|parts|/16 candidates per user
_NEG_PER_USER = 2


@register(
    "q_negative_sampling",
    oracle=f"""
    WITH pos AS (
      SELECT DISTINCT o_custkey AS c, l_partkey AS p
      FROM orders JOIN lineitem ON l_orderkey = o_orderkey
    ),
    cust AS (SELECT DISTINCT c FROM pos),
    cand AS (
      SELECT cust.c, part.p_partkey AS p,
             ('0x' || substr(md5(CAST(cust.c AS VARCHAR) || '|'
                                 || CAST(part.p_partkey AS VARCHAR)), 1, 15))::BIGINT
               AS h
      FROM cust CROSS JOIN part
      WHERE ('0x' || substr(md5(CAST(cust.c AS VARCHAR) || '|'
                                || CAST(part.p_partkey AS VARCHAR)), 1, 15))::BIGINT
            % {_NEG_BUCKETS} = 0
    ),
    neg AS (
      SELECT cand.c, cand.p, h FROM cand
      ANTI JOIN pos ON pos.c = cand.c AND pos.p = cand.p
    )
    SELECT c AS custkey, CAST(neg_rank AS BIGINT) AS neg_rank,
           p AS neg_partkey
    FROM (
      SELECT *, row_number() OVER (PARTITION BY c ORDER BY h, p) AS neg_rank
      FROM neg
    ) WHERE neg_rank <= {_NEG_PER_USER}
    ORDER BY custkey, neg_rank
    """,
    category="pipeline",
)
def q_negative_sampling(spark, sf_dir):
    """Deterministic negative sampling for recommender/contrastive
    training: per customer, {_NEG_PER_USER} parts they never bought,
    drawn by md5 ranking inside a HASH-THINNED candidate slice
    (md5(cust|part) % 16 == 0 → ~1/16 of the catalog per user) — the
    scale trick that avoids materializing users × items: candidates are
    catalog/16 per user BEFORE the anti-join against positives, and the
    md5 order makes the draw reproducible in any engine (no RNG).

    The positives relation is the distinct (customer, part) purchase
    set; the catalog rides broadcast (dimension-sized)."""
    from my_flink_1_10_2_spark.operators.hints import dim

    orders = read(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = read(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    pos = (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .select(F.col("o_custkey").alias("c"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    cust = pos.select("c").distinct()
    parts = read(spark, sf_dir, "part").select(F.col("p_partkey").alias("p"))
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("c").cast("string"), F.lit("|"), F.col("p").cast("string"))),
            1,
            15,
        ),
        16,
        10,
    ).cast("bigint")
    cand = (
        cust.crossJoin(dim(parts))
        .withColumn("h", h)
        .where(F.col("h") % _NEG_BUCKETS == 0)
    )
    neg = cand.join(pos, ["c", "p"], "left_anti")
    w = Window.partitionBy("c").orderBy("h", "p")
    return (
        neg.withColumn("neg_rank", F.row_number().over(w).cast("bigint"))
        .where(F.col("neg_rank") <= _NEG_PER_USER)
        .select(
            F.col("c").alias("custkey"),
            "neg_rank",
            F.col("p").alias("neg_partkey"),
        )
        .orderBy("custkey", "neg_rank")
    )


@register(
    "q_dataset_split_assign",
    oracle="""
    WITH s AS (
      SELECT source,
             ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 10
               AS bucket
      FROM documents
    )
    SELECT source,
           CAST(sum(CASE WHEN bucket <= 7 THEN 1 ELSE 0 END) AS BIGINT) AS n_train,
           CAST(sum(CASE WHEN bucket = 8 THEN 1 ELSE 0 END) AS BIGINT) AS n_val,
           CAST(sum(CASE WHEN bucket = 9 THEN 1 ELSE 0 END) AS BIGINT) AS n_test
    FROM s GROUP BY source ORDER BY source
    """,
    category="pipeline",
)
def q_dataset_split_assign(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test assignment by md5(doc_id)
    bucket, reported per source — the split audit a training pipeline
    logs so reruns NEVER leak validation docs into training (hash
    assignment is stable under corpus growth, unlike row-number
    splits).  One projection + one aggregate."""
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        % 10
    )
    return (
        read(spark, sf_dir, "documents")
        .select("source", bucket.alias("bucket"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("bucket") <= 7, 1).otherwise(0))
            .cast("bigint")
            .alias("n_train"),
            F.sum(F.when(F.col("bucket") == 8, 1).otherwise(0))
            .cast("bigint")
            .alias("n_val"),
            F.sum(F.when(F.col("bucket") == 9, 1).otherwise(0))
            .cast("bigint")
            .alias("n_test"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Systems audits: bloom-join prefilter, self-join skew, dedup impact
# ---------------------------------------------------------------------------

_BJ_K, _BJ_M = 4, 8192


def _bloom_prefilter_oracle() -> str:
    def pos(j: int, expr: str) -> str:
        return (
            f"('0x' || substr(md5('b{j}:' || CAST({expr} AS VARCHAR)), 1, 15))"
            f"::BIGINT % {_BJ_M}"
        )

    bits = "\n      UNION\n".join(
        f"      SELECT DISTINCT {pos(j, 'v')} AS bit FROM build"
        for j in range(_BJ_K)
    )
    probes = "\n      UNION ALL\n".join(
        f"      SELECT o_orderkey, o_custkey, {pos(j, 'o_custkey')} AS bit FROM orders"
        for j in range(_BJ_K)
    )
    return f"""
    WITH build AS MATERIALIZED (
      SELECT DISTINCT o_custkey AS v FROM orders
      WHERE o_orderpriority = '1-URGENT'
    ),
    bits AS MATERIALIZED ({bits}
    ),
    probes AS ({probes}
    ),
    verdict AS (
      SELECT p.o_orderkey, p.o_custkey,
             count(*) = sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)
               AS pass
      FROM probes p LEFT JOIN bits b ON b.bit = p.bit
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT v.o_orderkey, v.pass,
             CASE WHEN bu.v IS NOT NULL THEN 1 ELSE 0 END AS is_match
      FROM verdict v LEFT JOIN build bu ON bu.v = v.o_custkey
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probe,
           CAST(sum(CASE WHEN pass THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
           CAST(sum(is_match) AS BIGINT) AS n_true,
           CAST(sum(CASE WHEN pass AND is_match = 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_false_pos,
           CAST(sum(CASE WHEN pass AND is_match = 0 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) - sum(is_match) AS DOUBLE) AS fpr
    FROM truth
    """


@register(
    "q_bloom_join_prefilter", oracle=_bloom_prefilter_oracle(), category="pipeline"
)
def q_bloom_join_prefilter(spark, sf_dir):
    """The bloom-join runtime filter, audited end-to-end: a Bloom
    filter built from the urgent-order customer keys prefilters the
    orders probe side before any shuffle — the optimization the
    reference applies to spilled hash-join partitions
    (flink-runtime/.../hashtable/) and Spark ships as runtime row-group
    filtering.  Graded artifact: probe rows, bloom-passed rows, true
    semi-join matches, false positives, and the realized FPR (one IEEE
    division) — no false negatives is the structural guarantee, so
    n_pass >= n_true always.

    At 100 TB the filter is <= m_bits rows (broadcast by construction)
    and the probe side is touched once; the exact md5 bit arithmetic
    makes the whole audit engine-replayable."""
    from my_flink_1_10_2_spark.operators.sketch import bloom_build, bloom_probe

    orders = read(spark, sf_dir, "orders")
    build = (
        orders.where(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_custkey").alias("v"))
    )
    bloom = bloom_build(build, "v", k_hashes=_BJ_K, m_bits=_BJ_M)
    probe = orders.select("o_orderkey", "o_custkey")
    # bloom_probe verdicts per DISTINCT key; re-expand to probe rows
    verdict = probe.join(
        bloom_probe(
            bloom,
            probe.select("o_custkey").distinct(),
            "o_custkey",
            k_hashes=_BJ_K,
            m_bits=_BJ_M,
        ),
        "o_custkey",
    )
    truth = verdict.join(
        build.distinct().withColumnRenamed("v", "o_custkey").withColumn(
            "__m", F.lit(1)
        ),
        "o_custkey",
        "left",
    ).select(
        "o_orderkey",
        F.col("maybe_present").alias("pass"),
        F.coalesce("__m", F.lit(0)).alias("is_match"),
    )
    return truth.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probe"),
        F.sum(F.when(F.col("pass"), 1).otherwise(0)).cast("bigint").alias("n_pass"),
        F.sum("is_match").cast("bigint").alias("n_true"),
        F.sum(F.when(F.col("pass") & (F.col("is_match") == 0), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_pos"),
        (
            F.sum(F.when(F.col("pass") & (F.col("is_match") == 0), 1).otherwise(0)).cast(
                "double"
            )
            / (F.count(F.lit(1)) - F.sum("is_match")).cast("double")
        ).alias("fpr"),
    )


@register(
    "q_join_skew_report",
    oracle="""
    WITH c AS (
      SELECT user_id, CAST(count(*) AS BIGINT) AS cnt FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(sum(cnt * cnt) AS BIGINT) AS total_pairs FROM c)
    SELECT user_id, cnt, CAST(cnt * cnt AS BIGINT) AS pairs,
           CAST((cnt * cnt * 1000000) // total_pairs AS BIGINT) AS share_e6
    FROM c CROSS JOIN tot
    ORDER BY cnt DESC, user_id
    LIMIT 10
    """,
    category="pipeline",
)
def q_join_skew_report(spark, sf_dir):
    """The pre-self-join skew audit: top keys by their self-join fanout
    cnt^2 with each key's share of the total pair count — the single
    number to check before any sessionization/co-occurrence self-join
    (one hot key can be the entire shuffle).  One corpus aggregate to
    the key-domain relation; the total rides a one-row broadcast; the
    share is integer-floored at 1e-6 so no float division is graded."""
    c = read(spark, sf_dir, "events").groupBy("user_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    tot = c.agg(F.sum(F.col("cnt") * F.col("cnt")).cast("bigint").alias("total_pairs"))
    return (
        c.crossJoin(F.broadcast(tot))
        .select(
            "user_id",
            "cnt",
            (F.col("cnt") * F.col("cnt")).cast("bigint").alias("pairs"),
            F.expr("(cnt * cnt * 1000000) DIV total_pairs")
            .cast("bigint")
            .alias("share_e6"),
        )
        .orderBy(F.col("cnt").desc(), "user_id")
        .limit(10)
    )


@register(
    "q_dedup_impact_report",
    oracle="""
    WITH d AS (
      SELECT doc_id, n_chars, md5(text) AS digest,
             min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
      FROM documents
    )
    SELECT CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT digest) AS BIGINT) AS n_unique,
           CAST(sum(CASE WHEN doc_id <> keeper THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dropped,
           CAST(sum(n_chars) AS BIGINT) AS chars_total,
           CAST(sum(CASE WHEN doc_id <> keeper THEN n_chars ELSE 0 END)
                AS BIGINT) AS chars_dropped,
           CAST(sum(CASE WHEN doc_id <> keeper THEN n_chars ELSE 0 END) AS DOUBLE)
             / CAST(sum(n_chars) AS DOUBLE) AS savings_ratio
    FROM d
    """,
    category="pipeline",
)
def q_dedup_impact_report(spark, sf_dir):
    """The dedup business case in one row: docs, unique digests,
    dropped duplicates, and the exact character mass removed by
    keep-smallest-id exact dedup — the savings number that justifies
    the pipeline stage.  One digest window over the corpus (keyed
    shuffle on the digest), one aggregate; the ratio is one IEEE
    division of exact BIGINTs."""
    w = Window.partitionBy(F.md5("text"))
    d = read(spark, sf_dir, "documents").select(
        "doc_id",
        "n_chars",
        F.md5("text").alias("digest"),
        F.min("doc_id").over(w).alias("keeper"),
    )
    dropped = F.when(F.col("doc_id") != F.col("keeper"), F.col("n_chars")).otherwise(0)
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("digest").cast("bigint").alias("n_unique"),
        F.sum(F.when(F.col("doc_id") != F.col("keeper"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dropped"),
        F.sum("n_chars").cast("bigint").alias("chars_total"),
        F.sum(dropped).cast("bigint").alias("chars_dropped"),
        (F.sum(dropped).cast("double") / F.sum("n_chars").cast("double")).alias(
            "savings_ratio"
        ),
    )


@register(
    "q_freshness_lag_report",
    oracle=f"""
    WITH s AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day FROM events
    ),
    m AS (SELECT max(day) AS global_max FROM s)
    SELECT event_type,
           CAST(max(day) AS BIGINT) AS last_day,
           CAST((SELECT global_max FROM m) - max(day) AS BIGINT) AS lag_days,
           CAST(count(*) AS BIGINT) AS n_events
    FROM s GROUP BY event_type ORDER BY event_type
    """,
    category="pipeline",
)
def q_freshness_lag_report(spark, sf_dir):
    """Per-stream freshness lag: how many days each event type trails
    the newest data in the corpus — the staleness audit a pipeline
    publishes per source before anyone trusts a join across them.
    Deterministic by construction (the reference point is the corpus
    max, never wall-clock).  One aggregate plus a one-row broadcast."""
    s = read(spark, sf_dir, "events").select(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    )
    m = s.agg(F.max("day").alias("global_max"))
    return (
        s.groupBy("event_type")
        .agg(
            F.max("day").cast("bigint").alias("last_day"),
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
        )
        .crossJoin(F.broadcast(m))
        .select(
            "event_type",
            "last_day",
            (F.col("global_max") - F.col("last_day")).cast("bigint").alias("lag_days"),
            "n_events",
        )
        .orderBy("event_type")
    )


@register(
    "q_histogram_log2_values",
    oracle="""
    WITH s AS (
      SELECT length(bin(CAST(round(value * 100) AS BIGINT))) AS bucket
      FROM events WHERE round(value * 100) >= 1
    )
    SELECT CAST(bucket AS BIGINT) AS log2_bucket,
           CAST(count(*) AS BIGINT) AS n
    FROM s GROUP BY 1 ORDER BY 1
    """,
    category="pipeline",
)
def q_histogram_log2_values(spark, sf_dir):
    """Log2-bucket value histogram: bucket = bit length of the exact
    quantized integer (floor(log2 v)+1 — pure integer, no float log, no
    boundary risk), the standard log-scale distribution view for
    heavy-tailed measures.  One projection + one aggregate; both
    engines compute the identical binary string length."""
    v = F.round(F.col("value") * 100).cast("bigint")
    return (
        read(spark, sf_dir, "events")
        .select(v.alias("v"))
        .where(F.col("v") >= 1)
        .select(F.length(F.bin("v")).cast("bigint").alias("log2_bucket"))
        .groupBy("log2_bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .orderBy("log2_bucket")
    )


# ---------------------------------------------------------------------------
# Product analytics: bounce/dwell, funnel latency, Lorenz, spike flags
# ---------------------------------------------------------------------------

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 min


@register(
    "q_session_bounce_dwell",
    oracle=f"""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS te,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id)
                    > {_SESSION_GAP_US}
                  OR lag(epoch_us(ts)) OVER (
                    PARTITION BY user_id ORDER BY ts, event_id) IS NULL
                  THEN 1 ELSE 0 END AS is_start
      FROM events
    ),
    s AS (
      SELECT user_id, te,
             sum(is_start) OVER (PARTITION BY user_id ORDER BY te, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM e
    ),
    sess AS (
      SELECT user_id, sid, min(te) AS t0, max(te) - min(te) AS dwell_us,
             CAST(count(*) AS BIGINT) AS n_ev
      FROM s GROUP BY 1, 2
    )
    SELECT CAST(t0 // {_DAY_US} AS BIGINT) AS day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_ev = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_bounce,
           CAST(sum(dwell_us) AS BIGINT) AS dwell_us_total,
           CAST(sum(dwell_us) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS avg_dwell_us
    FROM sess GROUP BY 1 ORDER BY 1
    """,
    category="pipeline",
)
def q_session_bounce_dwell(spark, sf_dir):
    """Daily bounce rate and dwell time: sessions from the 30-minute
    gap chain (the proven q_session_stats machinery), rolled up by the
    session's START day — sessions, single-event bounces, total and
    average dwell.  The gap chain is one per-user window; sessions and
    the daily rollup are exact integers; avg dwell is one IEEE
    division."""
    te = F.unix_micros(F.col("ts").cast("timestamp"))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = read(spark, sf_dir, "events").select(
        "user_id", "event_id", F.col("ts"), te.alias("te")
    ).withColumn(
        "is_start",
        F.when(
            (F.col("te") - F.lag("te").over(w) > _SESSION_GAP_US)
            | F.lag("te").over(w).isNull(),
            1,
        ).otherwise(0),
    )
    w_cum = Window.partitionBy("user_id").orderBy("te", "event_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    s = e.withColumn("sid", F.sum("is_start").over(w_cum))
    sess = s.groupBy("user_id", "sid").agg(
        F.min("te").alias("t0"),
        (F.max("te") - F.min("te")).alias("dwell_us"),
        F.count(F.lit(1)).cast("bigint").alias("n_ev"),
    )
    return (
        sess.groupBy(F.expr(f"t0 DIV {_DAY_US}").cast("bigint").alias("day"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_sessions"),
            F.sum(F.when(F.col("n_ev") == 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_bounce"),
            F.sum("dwell_us").cast("bigint").alias("dwell_us_total"),
            (
                F.sum("dwell_us").cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("avg_dwell_us"),
        )
        .orderBy("day")
    )


@register(
    "q_funnel_time_percentiles",
    oracle=f"""
    WITH u AS (
      SELECT user_id, min(epoch_us(ts)) AS t0,
             min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
      FROM events GROUP BY 1
    ),
    d AS (
      SELECT (tp - t0) // {_HOUR_US} AS hrs FROM u WHERE tp IS NOT NULL
    ),
    per_v AS (SELECT hrs, CAST(count(*) AS BIGINT) AS cnt FROM d GROUP BY 1),
    cum AS (
      SELECT hrs, cnt,
             CAST(sum(cnt) OVER (ORDER BY hrs
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                  AS BIGINT) AS cum,
             CAST(sum(cnt) OVER () AS BIGINT) AS n
      FROM per_v
    )
    SELECT max(n) AS n_converted,
           CAST(min(CASE WHEN cum >= (n * 25 + 99) // 100 THEN hrs END)
                AS BIGINT) AS p25_hours,
           CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN hrs END)
                AS BIGINT) AS p50_hours,
           CAST(min(CASE WHEN cum >= (n * 75 + 99) // 100 THEN hrs END)
                AS BIGINT) AS p75_hours
    FROM cum
    """,
    category="pipeline",
)
def q_funnel_time_percentiles(spark, sf_dir):
    """Time-to-convert quartiles: hours from each user's first event to
    first purchase, summarized by EXACT order statistics (k-th
    smallest, k = ceil(q·n) — the q_winsorized_stats protocol), the
    latency view that pairs with the Kaplan-Meier curve.  One corpus
    groupBy(user); the percentile search walks the hour-domain
    relation via operators/rank.py::global_running (range-partitioned
    cumulative — never an unpartitioned window), and the grand total
    rides a broadcast scalar aggregate."""
    from my_flink_1_10_2_spark.operators.rank import global_running

    ev = read(spark, sf_dir, "events")
    te = F.unix_micros(F.col("ts").cast("timestamp"))
    u = ev.groupBy("user_id").agg(
        F.min(te).alias("t0"),
        F.min(F.when(F.col("event_type") == "purchase", te)).alias("tp"),
    )
    d = u.where(F.col("tp").isNotNull()).select(
        F.expr(f"(tp - t0) DIV {_HOUR_US}").alias("hrs")
    )
    per_v = d.groupBy("hrs").agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    run = global_running(per_v, ["hrs"], [("__cum", "cnt", "sum", True)])
    # grand total from run's output: rides the checkpoint global_running
    # already pinned, so the corpus is still scanned exactly once
    n_df = run.agg(F.sum("cnt").cast("bigint").alias("n"))
    cum = run.withColumn("cum", F.col("__cum").cast("bigint")).join(
        F.broadcast(n_df)
    )
    return cum.agg(
        F.max("n").alias("n_converted"),
        F.expr("min(CASE WHEN cum >= (n * 25 + 99) DIV 100 THEN hrs END)")
        .cast("bigint")
        .alias("p25_hours"),
        F.expr("min(CASE WHEN cum >= (n * 50 + 99) DIV 100 THEN hrs END)")
        .cast("bigint")
        .alias("p50_hours"),
        F.expr("min(CASE WHEN cum >= (n * 75 + 99) DIV 100 THEN hrs END)")
        .cast("bigint")
        .alias("p75_hours"),
    )


@register(
    "q_lorenz_deciles",
    oracle="""
    WITH u AS (
      SELECT user_id, CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v_e2
      FROM events GROUP BY 1
    ),
    t AS (
      SELECT user_id, v_e2, ntile(10) OVER (ORDER BY v_e2, user_id) AS decile,
             CAST(sum(v_e2) OVER () AS BIGINT) AS grand
      FROM u
    ),
    d AS (
      SELECT decile, CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(v_e2) AS BIGINT) AS value_e2, max(grand) AS grand
      FROM t GROUP BY 1
    )
    SELECT CAST(decile AS BIGINT) AS decile, n_users, value_e2,
           CAST((sum(value_e2) OVER (ORDER BY decile
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 * 1000000) // grand AS BIGINT) AS cum_share_e6
    FROM d ORDER BY decile
    """,
    category="pipeline",
)
def q_lorenz_deciles(spark, sf_dir):
    """The Lorenz curve by user-value deciles — the dashboard companion
    to the graded Gini: users ranked by total value (NTILE(10) under a
    (value, user_id) total order, so both engines agree on every
    boundary), per-decile mass and the cumulative share in integer
    1e-6 units.  The decile assignment is
    operators/rank.py::global_ntile (range-partitioned, never a
    single-task window); the grand total rides a broadcast scalar
    aggregate; the 10-row decile cumulative is a triangular broadcast
    join — zero unpartitioned windows anywhere in the plan."""
    from my_flink_1_10_2_spark.operators.rank import global_ntile

    u = read(spark, sf_dir, "events").groupBy("user_id").agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("v_e2")
    )
    t = global_ntile(u, 10, ["v_e2", "user_id"], "decile")
    d = t.groupBy("decile").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_users"),
        F.sum("v_e2").cast("bigint").alias("value_e2"),
    )
    # grand total = sum over the <= 10 decile masses (no second corpus scan)
    grand = d.agg(F.sum("value_e2").cast("bigint").alias("grand"))
    # cumulative share over the (<= 10-row) decile relation: triangular
    # self-join (b.decile <= a.decile), not an ordered window
    a, b = d.alias("a"), d.alias("b")
    cum = (
        a.join(F.broadcast(b), F.col("b.decile") <= F.col("a.decile"))
        .groupBy(
            F.col("a.decile").alias("decile"),
            F.col("a.n_users").alias("n_users"),
            F.col("a.value_e2").alias("value_e2"),
        )
        .agg(F.sum("b.value_e2").cast("bigint").alias("cum"))
    )
    return (
        cum.join(F.broadcast(grand))
        .select(
            F.col("decile").cast("bigint").alias("decile"),
            "n_users",
            "value_e2",
            F.expr("(cum * 1000000) DIV grand").cast("bigint").alias("cum_share_e6"),
        )
        .orderBy("decile")
    )


@register(
    "q_rate_spike_flags",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, epoch_us(ts) // {_DAY_US} AS day,
             CAST(count(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, day, cnt,
             CAST(sum(cnt) OVER (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS BIGINT)
               AS trail7,
             row_number() OVER (PARTITION BY event_type ORDER BY day) AS rn
      FROM daily
    )
    SELECT event_type, CAST(day AS BIGINT) AS day, cnt, trail7,
           CAST(CASE WHEN 7 * cnt > 2 * trail7 THEN 1 ELSE 0 END AS INT)
             AS spike
    FROM w WHERE rn > 7 ORDER BY event_type, day
    """,
    category="pipeline",
)
def q_rate_spike_flags(spark, sf_dir):
    """Daily rate-spike flags: a day is flagged when its count exceeds
    2x the trailing-7-day average — compared by integer
    cross-multiplication (7·cnt > 2·trail7, no float rate ever).  Days
    without a full 7-row history are excluded (row-based trailing
    window; the day grid is dense in this corpus, and at scale the
    gap-fill operator densifies first).  Windows walk the per-type day
    relation."""
    daily = read(spark, sf_dir, "events").groupBy(
        "event_type",
        F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}").alias("day"),
    ).agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    w_tr = Window.partitionBy("event_type").orderBy("day").rowsBetween(-7, -1)
    w_rn = Window.partitionBy("event_type").orderBy("day")
    return (
        daily.withColumn("trail7", F.sum("cnt").over(w_tr).cast("bigint"))
        .withColumn("rn", F.row_number().over(w_rn))
        .where(F.col("rn") > 7)
        .select(
            "event_type",
            F.col("day").cast("bigint").alias("day"),
            "cnt",
            "trail7",
            F.when(F.lit(7) * F.col("cnt") > F.lit(2) * F.col("trail7"), 1)
            .otherwise(0)
            .cast("int")
            .alias("spike"),
        )
        .orderBy("event_type", "day")
    )


# ---------------------------------------------------------------------------
# Growth analytics: cohort LTV, MDE power, RFM segments, n-gram novelty
# ---------------------------------------------------------------------------

_WEEK_US2 = 7 * _DAY_US


@register(
    "q_cohort_ltv",
    oracle=f"""
    WITH u AS (
      SELECT user_id, min(epoch_us(ts)) // {_WEEK_US2} AS cohort_wk
      FROM events GROUP BY 1
    ),
    e AS (
      SELECT u.cohort_wk,
             epoch_us(ev.ts) // {_WEEK_US2} - u.cohort_wk AS wk_offset,
             CAST(round(ev.value * 100) AS BIGINT) AS v_e2
      FROM events ev JOIN u ON u.user_id = ev.user_id
      WHERE ev.event_type = 'purchase'
    ),
    g AS (
      SELECT cohort_wk, wk_offset, CAST(sum(v_e2) AS BIGINT) AS rev_e2
      FROM e GROUP BY 1, 2
    )
    SELECT CAST(cohort_wk AS BIGINT) AS cohort_wk,
           CAST(wk_offset AS BIGINT) AS wk_offset, rev_e2,
           CAST(sum(rev_e2) OVER (PARTITION BY cohort_wk ORDER BY wk_offset
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS cum_ltv_e2
    FROM g ORDER BY cohort_wk, wk_offset
    """,
    category="pipeline",
)
def q_cohort_ltv(spark, sf_dir):
    """Cohort lifetime-value matrix: purchase revenue by signup-week
    cohort and week offset, with the running cumulative LTV — the
    revenue companion to the graded retention matrix (epoch-week
    anchored, so multi-month corpora stay ordered).  Exact 1e-2
    integers end to end; the cumulative window walks the cohort-week
    domain relation."""
    ev = read(spark, sf_dir, "events")
    te_wk = F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_WEEK_US2}")
    u = ev.groupBy("user_id").agg(F.min(te_wk).alias("cohort_wk"))
    e = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            "user_id",
            te_wk.alias("wk"),
            F.round(F.col("value") * 100).cast("bigint").alias("v_e2"),
        )
        .join(u, "user_id")
        .select(
            "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("wk_offset"), "v_e2"
        )
    )
    g = e.groupBy("cohort_wk", "wk_offset").agg(
        F.sum("v_e2").cast("bigint").alias("rev_e2")
    )
    w = Window.partitionBy("cohort_wk").orderBy("wk_offset").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        g.withColumn("cum_ltv_e2", F.sum("rev_e2").over(w).cast("bigint"))
        .select(
            F.col("cohort_wk").cast("bigint").alias("cohort_wk"),
            F.col("wk_offset").cast("bigint").alias("wk_offset"),
            "rev_e2",
            "cum_ltv_e2",
        )
        .orderBy("cohort_wk", "wk_offset")
    )


@register(
    "q_mde_power",
    oracle="""
    WITH g AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
      FROM events WHERE event_type IN ('purchase', 'view')
    )
    SELECT n, x,
           CAST(x AS DOUBLE) / CAST(n AS DOUBLE) AS p,
           (CAST(1.96 AS DOUBLE) + CAST(0.8416 AS DOUBLE))
             * sqrt(2.0 * (CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                    * (1.0 - CAST(x AS DOUBLE) / CAST(n AS DOUBLE))
                    / (CAST(n AS DOUBLE) / 2.0)) AS mde_abs
    FROM g
    """,
    category="pipeline",
)
def q_mde_power(spark, sf_dir):
    """Minimum detectable effect for a 50/50 split of this corpus at
    alpha=.05 (two-sided) and 80% power — the pre-experiment sizing
    number every A/B platform surfaces next to the z-test.  Two exact
    integers plus one IEEE expression with DOUBLE-cast z literals
    (1.96, 0.8416 — the DuckDB decimal-fold recipe applies)."""
    g = (
        read(spark, sf_dir, "events")
        .where(F.col("event_type").isin("purchase", "view"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.when(F.col("event_type") == "purchase", 1).otherwise(0))
            .cast("bigint")
            .alias("x"),
        )
    )
    d = lambda c: c.cast("double")  # noqa: E731
    p = d(F.col("x")) / d(F.col("n"))
    return g.select(
        "n",
        "x",
        p.alias("p"),
        (
            (F.lit(1.96) + F.lit(0.8416))
            * F.sqrt(
                F.lit(2.0) * p * (F.lit(1.0) - p) / (d(F.col("n")) / F.lit(2.0))
            )
        ).alias("mde_abs"),
    )


@register(
    "q_user_rfm_segments",
    oracle=f"""
    WITH m AS (SELECT max(epoch_us(ts)) // {_DAY_US} AS max_day FROM events),
    u AS (
      SELECT user_id,
             (SELECT max_day FROM m) - max(epoch_us(ts)) // {_DAY_US}
               AS recency_days,
             CAST(count(*) AS BIGINT) AS frequency,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS monetary_e2
      FROM events GROUP BY user_id
    ),
    scored AS (
      SELECT user_id,
             ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
             ntile(5) OVER (ORDER BY frequency, user_id) AS f_score,
             ntile(5) OVER (ORDER BY monetary_e2, user_id) AS m_score
      FROM u
    )
    SELECT CAST(r_score AS BIGINT) AS r_score,
           CAST(f_score AS BIGINT) AS f_score,
           CAST(m_score AS BIGINT) AS m_score,
           CAST(count(*) AS BIGINT) AS n_users
    FROM scored GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
    category="pipeline",
)
def q_user_rfm_segments(spark, sf_dir):
    """RFM segmentation: quintile scores for recency (days since last
    event, HIGHER score = more recent), frequency and monetary value,
    rolled up to segment counts — the classic customer segmentation.
    Every NTILE runs under a deterministic (metric, user_id) total
    order so both engines agree on every quintile boundary; recency is
    anchored to the corpus max day (never wall-clock).  The three
    quintiles are FUSED via operators/rank.py::global_ntile_multi:
    each metric's 4 exact bucket-boundary tuples are located with a
    narrow range-partitioned global rank (bounded side jobs), then all
    three scores are assigned in one literal-comparison pass — the main
    plan carries no rank machinery and no per-metric full-row range
    exchange (previously three sequential global_ntile range exchanges
    + localCheckpoints)."""
    from my_flink_1_10_2_spark.operators.rank import global_ntile_multi

    ev = read(spark, sf_dir, "events")
    day = F.expr(f"unix_micros(CAST(ts AS TIMESTAMP)) DIV {_DAY_US}")
    u = ev.groupBy("user_id").agg(
        F.max(day).alias("last_day"),
        F.count(F.lit(1)).cast("bigint").alias("frequency"),
        F.sum(F.round(F.col("value") * 100).cast("bigint"))
        .cast("bigint")
        .alias("monetary_e2"),
    )
    m = u.agg(F.max("last_day").alias("max_day"))
    u2 = u.crossJoin(F.broadcast(m)).withColumn(
        "recency_days", F.col("max_day") - F.col("last_day")
    )
    scored = global_ntile_multi(
        u2,
        5,
        [
            ("r_score", [("recency_days", False), ("user_id", True)]),
            ("f_score", [("frequency", True), ("user_id", True)]),
            ("m_score", [("monetary_e2", True), ("user_id", True)]),
        ],
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_users"))
        .select(
            F.col("r_score").cast("bigint").alias("r_score"),
            F.col("f_score").cast("bigint").alias("f_score"),
            F.col("m_score").cast("bigint").alias("m_score"),
            "n_users",
        )
        .orderBy("r_score", "f_score", "m_score")
    )


@register(
    "q_ngram_novelty",
    oracle=r"""
    WITH w AS (SELECT doc_id, str_split_regex(text, '\s+') AS words FROM documents),
    sh AS (
      SELECT DISTINCT doc_id,
             unnest(list_transform(range(1, greatest(len(words) - 2, 1) + 1),
                                   i -> array_to_string(words[i:i + 2], ' ')))
               AS shingle
      FROM w
    ),
    first_seen AS (
      SELECT shingle, min(doc_id) AS first_doc FROM sh GROUP BY 1
    )
    SELECT s.doc_id,
           CAST(count(*) AS BIGINT) AS n_shingles,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE) AS novelty
    FROM sh s JOIN first_seen f ON f.shingle = s.shingle
    GROUP BY s.doc_id ORDER BY s.doc_id
    """,
    category="pipeline",
)
def q_ngram_novelty(spark, sf_dir):
    """Per-document n-gram novelty: the fraction of a doc's distinct
    3-gram shingles first seen in THAT doc (by doc_id order) — the
    curation score that separates generative content from recombined
    boilerplate, and the streaming-ingest view of dedup (novelty ~ 0
    means the doc adds nothing).  First-occurrence is one min-aggregate
    over the shingle relation joined back — two shingle-keyed
    shuffles, no per-doc rescans."""
    sh = shingles(read(spark, sf_dir, "documents"), n=3)
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    return (
        sh.join(first, "shingle")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_shingles"),
            F.sum(F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_novel"),
            (
                F.sum(
                    F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
                ).cast("double")
                / F.count(F.lit(1)).cast("double")
            ).alias("novelty"),
        )
        .orderBy("doc_id")
    )


@register(
    "q_leakage_safe_split",
    oracle="""
    WITH clustered AS (
      SELECT doc_id, source, md5(text) AS dup_key
      FROM documents
    ),
    reps AS (
      SELECT dup_key, min(doc_id) AS rep_id,
             CAST(count(*) AS BIGINT) AS cluster_size
      FROM clustered GROUP BY dup_key
    ),
    assigned AS (
      SELECT c.doc_id, c.source, c.dup_key, r.cluster_size,
             CASE WHEN CAST(('0x' || substr(md5(CAST(r.rep_id AS VARCHAR)), 1, 15))::BIGINT
                       AS BIGINT) % 10 <= 7 THEN 'train'
                  WHEN CAST(('0x' || substr(md5(CAST(r.rep_id AS VARCHAR)), 1, 15))::BIGINT
                       AS BIGINT) % 10 = 8 THEN 'val'
                  ELSE 'test' END AS split
      FROM clustered c JOIN reps r USING (dup_key)
    ),
    leaks AS (
      SELECT dup_key FROM assigned
      GROUP BY dup_key HAVING count(DISTINCT split) > 1
    )
    SELECT split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(count(DISTINCT dup_key) AS BIGINT) AS n_clusters,
           CAST(sum(CASE WHEN cluster_size > 1 THEN 1 ELSE 0 END)
                AS BIGINT) AS docs_in_dup_clusters,
           CAST((SELECT count(*) FROM leaks) AS BIGINT) AS cross_split_leaks
    FROM assigned GROUP BY split ORDER BY split
    """,
    category="llm_pipeline",
)
def q_leakage_safe_split(spark, sf_dir):
    """Leakage-safe train/val/test split: duplicate CLUSTERS (exact
    md5-of-text groups — swap in minhash CC for near-dups) are assigned
    to splits as a unit, hashed on the cluster representative, so no
    duplicated document can sit in train while its twin sits in test
    (the contamination mode per-doc hash splits cannot prevent —
    compare q_dataset_split_assign).  The audit reports per-split sizes
    plus the cross-split leak count, which this construction pins to 0
    BY DESIGN.  Shape: one digest shuffle, a group-min, a broadcast-able
    rep join — the exact-dedup kernel reused for split assignment."""
    docs = read(spark, sf_dir, "documents").select(
        "doc_id", "source", F.md5("text").alias("dup_key")
    )
    reps = docs.groupBy("dup_key").agg(
        F.min("doc_id").alias("rep_id"),
        F.count(F.lit(1)).alias("cluster_size"),
    )
    bucket = (
        F.conv(F.substring(F.md5(F.col("rep_id").cast("string")), 1, 15), 16, 10).cast("bigint")
        % 10
    )
    assigned = docs.join(reps, "dup_key").withColumn(
        "split",
        F.when(bucket <= 7, F.lit("train"))
        .when(bucket == 8, F.lit("val"))
        .otherwise(F.lit("test")),
    )
    leaks = (
        assigned.groupBy("dup_key")
        .agg(F.countDistinct("split").alias("n_splits"))
        .where(F.col("n_splits") > 1)
        .agg(F.count(F.lit(1)).alias("leaks"))
    )
    return (
        assigned.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("dup_key").alias("n_clusters"),
            F.sum(F.when(F.col("cluster_size") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("docs_in_dup_clusters"),
        )
        .crossJoin(F.broadcast(leaks))
        .select(
            "split",
            "n_docs",
            "n_clusters",
            "docs_in_dup_clusters",
            F.col("leaks").cast("bigint").alias("cross_split_leaks"),
        )
        .orderBy("split")
    )


@register(
    "q_quality_constraints",
    oracle="""
    WITH t AS (SELECT CAST(count(*) AS BIGINT) AS total FROM orders),
    m AS (
      SELECT CAST(count(o_custkey) AS BIGINT) AS n_ck,
             CAST(min(o_totalprice) AS DOUBLE) AS min_tp,
             CAST(sum(CASE WHEN o_orderstatus IN ('F','O','P')
                           THEN 0 ELSE 1 END) AS BIGINT) AS bad_status,
             CAST(sum(CASE WHEN o_totalprice > 100 THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_gt100
      FROM orders),
    dup AS (
      SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS d FROM (
        SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)),
    dupck AS (
      SELECT CAST(coalesce(sum(n), 0) AS BIGINT) AS d FROM (
        SELECT count(*) AS n FROM orders GROUP BY o_custkey HAVING count(*) > 1)),
    orph AS (
      SELECT CAST(count(*) AS BIGINT) AS o FROM orders
      WHERE o_custkey IS NOT NULL
        AND o_custkey NOT IN (SELECT c_custkey FROM customer))
    SELECT * FROM (
      SELECT 'size>=1' AS "constraint",
             total * 1000000 AS metric_ppm, total >= 1 AS passed
      FROM t
      UNION ALL
      SELECT 'complete(o_custkey)', (n_ck * 1000000) // total, n_ck = total
      FROM m, t
      UNION ALL
      SELECT 'unique(o_orderkey)', ((total - d) * 1000000) // total, d = 0
      FROM dup, t
      UNION ALL
      SELECT 'unique(o_custkey)', ((total - d) * 1000000) // total, d = 0
      FROM dupck, t
      UNION ALL
      SELECT 'min(o_totalprice)>=0',
             CAST(round(min_tp * 1000000) AS BIGINT), min_tp >= 0
      FROM m
      UNION ALL
      SELECT 'containedIn(o_orderstatus)',
             ((total - bad_status) * 1000000) // total, bad_status = 0
      FROM m, t
      UNION ALL
      SELECT 'price_gt_100', (n_gt100 * 1000000) // total,
             (n_gt100 * 1000000) // total >= 900000
      FROM m, t
      UNION ALL
      SELECT 'refIn(o_custkey->customer.c_custkey)',
             ((total - o) * 1000000) // total, o = 0
      FROM orph, t)
    ORDER BY "constraint"
    """,
    category="llm_pipeline",
)
def q_quality_constraints(spark, sf_dir):
    """Declarative data-quality verification (Schelter et al., VLDB
    2018 — the Deequ model): an 8-constraint suite over orders
    (size, completeness, two uniqueness keys — one deliberately
    failing, a min bound, set membership, a predicate ratio, and
    referential containment into customer) evaluated with the paper's
    single-scan property — every scalar metric rides ONE aggregate pass;
    uniqueness adds one keyed agg per key set and the foreign key one
    anti-join.  Metrics are exact integer parts-per-million, so the
    whole report (including the failing row) replays bitwise in SQL."""
    from my_flink_1_10_2_spark.operators.quality import Check

    orders = read(spark, sf_dir, "orders")
    customer = read(spark, sf_dir, "customer")
    return (
        Check(orders)
        .has_size(1)
        .is_complete("o_custkey")
        .is_unique("o_orderkey")
        .is_unique("o_custkey")
        .has_min("o_totalprice", 0)
        .is_contained_in("o_orderstatus", ["F", "O", "P"])
        .satisfies("o_totalprice > 100", "price_gt_100", min_ratio_ppm=900000)
        .is_referenced_in("o_custkey", customer, "c_custkey", "customer")
        .run()
    )


@register(
    "q_ml_pipeline_scaler",
    oracle="""
    WITH e AS (
      SELECT event_type, CAST(round(value * 100) AS BIGINT) AS v FROM events
    ),
    m AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(v AS HUGEINT)) AS s1,
             sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s2
      FROM e
    ),
    f AS (
      SELECT CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean_v,
             sqrt((CAST(n AS DOUBLE) * CAST(s2 AS DOUBLE)
                   - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE))
                  / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS std_v
      FROM m
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN (CAST(v AS DOUBLE) - mean_v) / std_v > 1.0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_hi,
           mean_v, std_v
    FROM e CROSS JOIN f
    GROUP BY event_type, mean_v, std_v
    ORDER BY event_type
    """,
    category="pipeline",
)
def q_ml_pipeline_scaler(spark, sf_dir):
    """The flink-ml pipeline API end-to-end (ref: flink-ml-api/.../core/
    Pipeline.java fit/transform, Estimator/Transformer/Model;
    my_flink_1_10_2_spark/ml.py): a Pipeline of [StandardScaler
    (estimator), Binarizer(z > 1)] is FIT on the event-value column and
    the fitted pipeline of pure transformers scores the corpus; the
    per-type rollup counts events more than one std above the mean.

    Float discipline: the scaler's moments come from exact DECIMAL(38,0)
    integer sums folded with a pinned IEEE chain (mean = double(s1)/
    double(n); var = (n*s2 - s1^2)/n^2 all in doubles), so mean/std —
    and therefore every per-row z and the comparison against the
    binarizer threshold — replay bitwise in the oracle.  Fit is ONE
    two-phase aggregate; transform is a codegen projection; the 100 TB
    cost is one scan + one scalar broadcast."""
    from my_flink_1_10_2_spark.ml import (
        OUTPUT_COL,
        SELECTED_COL,
        THRESHOLD,
        Binarizer,
        Pipeline,
        StandardScaler,
        StandardScalerModel,
    )

    e = read(spark, sf_dir, "events").select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("v")
    )
    pipe = Pipeline([
        StandardScaler().set(SELECTED_COL, "v").set(OUTPUT_COL, "z"),
        Binarizer().set(SELECTED_COL, "z").set(OUTPUT_COL, "hi").set(THRESHOLD, 1.0),
    ])
    fitted = pipe.fit(None, e)
    scaler = fitted.get_stages()[0]
    mean = scaler.get(StandardScalerModel.MEAN)
    std = scaler.get(StandardScalerModel.STD)
    scored = fitted.transform(None, e)
    return (
        scored.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.col("hi").cast("bigint")).cast("bigint").alias("n_hi"),
        )
        .select(
            "event_type",
            "n_events",
            "n_hi",
            F.lit(mean).alias("mean_v"),
            F.lit(std).alias("std_v"),
        )
        .orderBy("event_type")
    )


@register(
    "q_k_anonymity_report",
    oracle="""
    WITH qi AS (
      SELECT lang, source,
             CAST(least(n_chars // 100, 9) AS BIGINT) AS len_bucket
      FROM documents
    ),
    cells AS (
      SELECT lang, source, len_bucket, CAST(count(*) AS BIGINT) AS n_docs
      FROM qi GROUP BY lang, source, len_bucket
    )
    SELECT lang, source, len_bucket, n_docs,
           CAST(CASE WHEN n_docs < 5 THEN 1 ELSE 0 END AS BIGINT) AS suppressed
    FROM cells
    """,
    category="pipeline",
)
def q_k_anonymity_report(spark, sf_dir):
    """k-anonymity audit over the quasi-identifier cell (lang, source,
    length bucket) with k = 5 (Sweeney 2002): any equivalence class
    smaller than k is flagged for suppression — the governance gate a
    corpus release runs before shipping per-document metadata.  One
    partial-aggregated shuffle on the QI tuple; the report is
    cell-cardinality-sized regardless of corpus size."""
    docs = read(spark, sf_dir, "documents")
    qi = docs.select(
        "lang",
        "source",
        F.least(F.floor(F.col("n_chars") / 100), F.lit(9))
        .cast("bigint")
        .alias("len_bucket"),
    )
    cells = qi.groupBy("lang", "source", "len_bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs")
    )
    return cells.select(
        "lang",
        "source",
        "len_bucket",
        "n_docs",
        F.when(F.col("n_docs") < 5, 1).otherwise(0).cast("bigint").alias("suppressed"),
    )


@register(
    "q_rendezvous_assignment",
    oracle="""
    WITH pick AS (
      SELECT doc_id, n_chars, worker FROM (
        SELECT d.doc_id, d.n_chars, w.worker,
               row_number() OVER (
                 PARTITION BY d.doc_id
                 ORDER BY md5(CAST(d.doc_id AS VARCHAR) || '#' || w.worker) DESC,
                          w.worker
               ) AS rn
        FROM documents d,
             unnest(['w0','w1','w2','w3','w4','w5','w6']) AS w(worker)
      ) WHERE rn = 1
    )
    SELECT worker,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS first_doc,
           CAST(sum(n_chars) AS BIGINT) AS total_chars
    FROM pick GROUP BY worker
    """,
    category="pipeline",
)
def q_rendezvous_assignment(spark, sf_dir):
    """Rendezvous / highest-random-weight hashing (Thaler & Ravishankar
    1998): each document goes to the worker with the maximal
    md5(doc#worker) — the assignment scheme whose property consistent
    sharding needs at 100 TB: removing one worker reassigns ONLY that
    worker's documents (minimal disruption), with no ring metadata.
    Expressed as a scan-time greatest-of-7 hash fold (the worker list is
    a literal — no join, no shuffle beyond the final per-worker
    rollup); the oracle replays the same argmax via a window.  The
    balance of the resulting histogram is the graded evidence the hash
    spreads uniformly."""
    docs = read(spark, sf_dir, "documents")
    workers = [f"w{i}" for i in range(7)]
    # greatest-of-N fold: per row, pick the worker with max md5 digest
    # (lexicographic on hex = numeric on the 128-bit value), tie to the
    # smaller worker id via the packed (digest, reversed-id) string
    pairs = F.array(
        *[
            F.struct(
                F.md5(
                    F.concat(F.col("doc_id").cast("string"), F.lit(f"#{w}"))
                ).alias("h"),
                F.lit(w).alias("w"),
            )
            for w in workers
        ]
    )
    best = F.array_sort(
        pairs,
        lambda a, b: F.when(a["h"] > b["h"], -1)
        .when(a["h"] < b["h"], 1)
        .when(a["w"] < b["w"], -1)
        .when(a["w"] > b["w"], 1)
        .otherwise(0),
    )[0]["w"]
    assigned = docs.select("doc_id", "n_chars", best.alias("worker"))
    return assigned.groupBy("worker").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.min("doc_id").cast("bigint").alias("first_doc"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )


@register(
    "q_cdc_chunks",
    oracle=r"""
    WITH toks AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
      FROM documents),
    grams AS (
      SELECT doc_id, len(t) AS n_toks,
             unnest(range(3, len(t))) AS pos,
             list_transform(range(3, len(t)),
                            i -> array_to_string(list_slice(t, i - 1, i + 1), ' ')) AS gs
      FROM toks WHERE len(t) >= 4),
    marks AS (
      SELECT doc_id, n_toks, pos,
             ('0x' || substr(md5(gs[pos - 2]), 1, 8))::BIGINT % 16 AS m
      FROM grams),
    bounds AS (
      SELECT doc_id, n_toks, CAST(count(*) FILTER (m = 0) AS BIGINT) AS n_bounds,
             CAST(coalesce(sum(pos) FILTER (m = 0), 0) AS BIGINT) AS bound_pos_sum
      FROM marks GROUP BY doc_id, n_toks)
    SELECT doc_id,
           CAST(n_toks AS BIGINT) AS n_toks,
           n_bounds + 1 AS n_chunks,
           bound_pos_sum
    FROM bounds
    """,
    category="llm",
)
def q_cdc_chunks(spark, sf_dir):
    """Content-defined chunking at token granularity (the rsync/LBFS/
    FastCDC recipe lifted to text): a chunk boundary falls AFTER token
    position p whenever the hash of the trailing 3-token window at p
    hits 0 mod 16 (expected chunk ~16 tokens) — so an insertion early
    in a document only moves boundaries inside its own chunk, keeping
    every later chunk digest stable.  That edit-locality is what makes
    block-level dedup of near-identical documents work, where
    fixed-stride chunking (q_chunk_documents) re-aligns everything
    after the edit.  Map-only positional-gram hashing (the winnowing
    machinery's idiom), one per-doc aggregate, no windows."""
    docs = read(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    tok = docs.select("doc_id", toks.alias("t")).where(F.size("t") >= 4)
    grams = tok.select(
        "doc_id",
        F.size("t").alias("n_toks"),
        F.posexplode(
            F.transform(
                F.sequence(F.lit(3), F.size("t") - 1),
                lambda i: F.concat_ws(" ", F.slice(F.col("t"), i - 1, 3)),
            )
        ).alias("off", "gram"),
    ).select(
        "doc_id",
        "n_toks",
        (F.col("off") + 3).alias("pos"),
        F.pmod(
            F.conv(F.substring(F.md5("gram"), 1, 8), 16, 10).cast("bigint"),
            F.lit(16),
        ).alias("m"),
    )
    bounds = grams.groupBy("doc_id", "n_toks").agg(
        F.count(F.when(F.col("m") == 0, 1)).cast("bigint").alias("n_bounds"),
        F.coalesce(F.sum(F.when(F.col("m") == 0, F.col("pos"))), F.lit(0))
        .cast("bigint")
        .alias("bound_pos_sum"),
    )
    return bounds.select(
        "doc_id",
        F.col("n_toks").cast("bigint").alias("n_toks"),
        (F.col("n_bounds") + 1).cast("bigint").alias("n_chunks"),
        "bound_pos_sum",
    )


@register(
    "q_char_entropy",
    oracle="""
    WITH chars AS (
      SELECT doc_id, unnest(str_split_regex(text, '')) AS ch
      FROM documents WHERE doc_id % 6 = 0
    ),
    freq AS (
      SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
      FROM chars WHERE ch <> '' GROUP BY doc_id, ch
    ),
    agg AS (
      SELECT doc_id,
             CAST(sum(c) AS BIGINT) AS n,
             CAST(sum(CAST(round(c * ln(CAST(c AS DOUBLE)) * 1000000) AS BIGINT))
                  AS BIGINT) AS s
      FROM freq GROUP BY doc_id
    )
    SELECT doc_id, n AS n_chars_counted,
           round(ln(CAST(n AS DOUBLE)) - (CAST(s AS DOUBLE) / n) / 1000000.0, 6)
             AS entropy_nats
    FROM agg
    """,
    category="llm_text",
)
def q_char_entropy(spark, sf_dir):
    """Shannon character entropy per document (nats) — the classic
    gibberish/boilerplate signal: H = ln(n) - (1/n)·Σ c·ln(c) over the
    per-document character histogram.  Every 6th document is scored.
    Float discipline: each histogram cell contributes one
    1e-6-quantized c·ln(c) term (exact integer counts through an
    identically-shaped IEEE expression), per-doc sums are exact
    bigints, and the final ln(n) subtraction happens once.  Shape: one
    char-explode scan -> per-(doc, char) partial agg -> per-doc agg —
    histogram-sized shuffles, no windows."""
    docs = read(spark, sf_dir, "documents").where(F.col("doc_id") % 6 == 0)
    chars = docs.select(
        "doc_id", F.explode(F.split("text", "")).alias("ch")
    ).where(F.col("ch") != "")
    freq = chars.groupBy("doc_id", "ch").agg(F.count(F.lit(1)).alias("c"))
    agg = freq.groupBy("doc_id").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum(
            F.round(F.col("c") * F.log(F.col("c").cast("double")) * 1e6)
            .cast("bigint")
        )
        .cast("bigint")
        .alias("s"),
    )
    return agg.select(
        "doc_id",
        F.col("n").alias("n_chars_counted"),
        F.round(
            F.log(F.col("n").cast("double"))
            - (F.col("s").cast("double") / F.col("n")) / 1e6,
            6,
        ).alias("entropy_nats"),
    )


@register(
    "q_pmi_collocations",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id,
             list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '') AS t
      FROM documents),
    bg AS (
      SELECT unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
             unnest(list_transform(range(1, len(t)), i -> t[i+1])) AS w2
      FROM tok WHERE len(t) >= 2),
    bgc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bg FROM bg GROUP BY w1, w2),
    lft AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_w1 FROM bgc GROUP BY w1),
    rgt AS (SELECT w2, CAST(sum(c_bg) AS BIGINT) AS c_w2 FROM bgc GROUP BY w2),
    tot AS (SELECT CAST(sum(c_bg) AS BIGINT) AS n FROM bgc),
    pmi AS (
      SELECT bgc.w1, bgc.w2, c_bg,
             CAST(round(ln((CAST(c_bg AS DOUBLE) * n)
                           / (CAST(c_w1 AS DOUBLE) * c_w2)) * 1000000)
                  AS BIGINT) AS pmi_i
      FROM bgc JOIN lft ON lft.w1 = bgc.w1
               JOIN rgt ON rgt.w2 = bgc.w2
               CROSS JOIN tot
      WHERE c_bg >= 5)
    SELECT w1, w2, c_bg, round(pmi_i / 1000000.0, 6) AS pmi
    FROM (SELECT *, row_number() OVER (ORDER BY pmi_i DESC, w1, w2) AS rnk
          FROM pmi)
    WHERE rnk <= 20
    """,
    category="llm_text",
)
def q_pmi_collocations(spark, sf_dir):
    """Pointwise-mutual-information collocation extraction (Church &
    Hanks 1990): the top-20 bigram types (support >= 5) by
    pmi = ln(c(w1,w2)·N / (c(w1,·)·c(·,w2))) — the statistic that finds
    multi-word expressions for tokenizer vocabularies and stop-phrase
    lists.  All counts come off ONE bigram-type relation; pmi quantizes
    once per type to 1e-6 units through an identically-shaped IEEE
    expression, so the ranking (pmi desc, w1, w2) is engine-exact.
    Shape: bigram partial-agg shuffle, two vocabulary-sized margins
    joined back, TakeOrdered(20) — no full sort, no windows."""
    from my_flink_1_10_2_spark.operators.hints import dim

    docs = read(spark, sf_dir, "documents")
    toks = F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
    tok = docs.select(toks.alias("t")).where(F.size("t") >= 2)
    bg = tok.select(
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.size("t") - 2),
                lambda i: F.struct(
                    F.col("t")[i].alias("w1"), F.col("t")[i + 1].alias("w2")
                ),
            )
        ).alias("p")
    ).select("p.w1", "p.w2")
    bgc = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c_bg"))
    lft = bgc.groupBy("w1").agg(F.sum("c_bg").alias("c_w1"))
    rgt = bgc.groupBy("w2").agg(F.sum("c_bg").alias("c_w2"))
    tot = bgc.agg(F.sum("c_bg").alias("n"))
    pmi = (
        bgc.where(F.col("c_bg") >= 5)
        .join(lft, "w1")
        .join(rgt, "w2")
        .join(dim(tot))
        .select(
            "w1",
            "w2",
            F.col("c_bg").cast("bigint").alias("c_bg"),
            F.round(
                F.log(
                    (F.col("c_bg").cast("double") * F.col("n"))
                    / (F.col("c_w1").cast("double") * F.col("c_w2"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("pmi_i"),
        )
    )
    top = pmi.orderBy(F.col("pmi_i").desc(), "w1", "w2").limit(20)
    return top.select(
        "w1", "w2", "c_bg", F.round(F.col("pmi_i") / 1e6, 6).alias("pmi")
    )


@register(
    "q_term_burstiness",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(
        regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
      FROM documents),
    per_doc AS (
      SELECT w, doc_id, CAST(count(*) AS BIGINT) AS c
      FROM tok GROUP BY w, doc_id),
    d AS (SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents),
    stats AS (
      SELECT w,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c) AS BIGINT) AS tot,
             CAST(sum(c * c) AS BIGINT) AS s2
      FROM per_doc GROUP BY w)
    SELECT w AS term, df, tot,
           round((CAST(s2 AS DOUBLE) / n_docs
                  - (CAST(tot AS DOUBLE) / n_docs) * (CAST(tot AS DOUBLE) / n_docs))
                 / (CAST(tot AS DOUBLE) / n_docs), 6) AS vmr
    FROM (SELECT *, row_number() OVER (
            ORDER BY (CAST(s2 AS DOUBLE) / n_docs
                      - (CAST(tot AS DOUBLE) / n_docs) * (CAST(tot AS DOUBLE) / n_docs))
                     / (CAST(tot AS DOUBLE) / n_docs) DESC, w) AS rnk
          FROM stats CROSS JOIN d WHERE df >= 10)
    WHERE rnk <= 30
    """,
    category="llm_text",
)
def q_term_burstiness(spark, sf_dir):
    """Term burstiness via the variance-to-mean ratio (Church & Gale
    1995 — dispersion): content words clump (VMR >> 1), function words
    spread evenly (VMR ~ 1 under Poisson).  Per-term VMR over per-doc
    counts (zeros included through the corpus doc count), top-30 most
    bursty among terms in >= 10 documents.  The inputs are exact
    integer sums (tot, sum of c², df); the VMR expression is shaped
    identically on both engines so the ranking is engine-exact.
    Shape: token scan -> (term, doc) partial agg -> term agg ->
    TakeOrdered(30); margins are vocabulary-sized."""
    from my_flink_1_10_2_spark.operators.hints import dim

    docs = read(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("w"),
    )
    per_doc = tok.groupBy("w", "doc_id").agg(F.count(F.lit(1)).alias("c"))
    d = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    stats = per_doc.groupBy("w").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("tot"),
        F.sum(F.col("c") * F.col("c")).alias("s2"),
    )
    mean = F.col("tot").cast("double") / F.col("n_docs")
    vmr = (F.col("s2").cast("double") / F.col("n_docs") - mean * mean) / mean
    ranked = (
        stats.where(F.col("df") >= 10)
        .join(dim(d))
        .select(
            F.col("w").alias("term"),
            F.col("df").cast("bigint").alias("df"),
            F.col("tot").cast("bigint").alias("tot"),
            vmr.alias("__vmr"),
        )
        .orderBy(F.col("__vmr").desc(), "term")
        .limit(30)
    )
    return ranked.select(
        "term", "df", "tot", F.round("__vmr", 6).alias("vmr")
    )


@register(
    "q_domain_crossentropy",
    oracle=r"""
    WITH tok AS (
      SELECT source, unnest(list_filter(
        regexp_split_to_array(lower(text), '\s+'), x -> x <> '')) AS w
      FROM documents),
    cnt AS (SELECT source, w, CAST(count(*) AS BIGINT) AS c
            FROM tok GROUP BY source, w),
    nsrc AS (SELECT source, CAST(sum(c) AS BIGINT) AS n FROM cnt GROUP BY source),
    vocab AS (SELECT CAST(count(DISTINCT w) AS BIGINT) AS v FROM cnt),
    terms AS (
      SELECT e.source AS eval_source, m.source AS model_source,
             CAST(round(e.c * ln((CAST(coalesce(cm.c, 0) + 1 AS DOUBLE))
                                 / (nm.n + v)) * 1000000) AS BIGINT) AS t_i,
             e.c AS c_e
      FROM cnt e
        CROSS JOIN nsrc m
        LEFT JOIN cnt cm ON cm.source = m.source AND cm.w = e.w
        JOIN nsrc nm ON nm.source = m.source
        CROSS JOIN vocab)
    SELECT model_source, eval_source,
           round(-(CAST(sum(t_i) AS DOUBLE) / sum(c_e)) / 1000000.0, 6)
             AS cross_entropy
    FROM terms GROUP BY model_source, eval_source
    """,
    category="llm_text",
)
def q_domain_crossentropy(spark, sf_dir):
    """Domain-shift matrix: cross-entropy of every source's add-1
    unigram LM evaluated on every other source's token stream —
    CE(m, e) = -(1/N_e)·Σ_w c_e(w)·ln((c_m(w)+1)/(N_m+V)).  The
    diagonal is each domain's own entropy; off-diagonal asymmetries
    are the curation signal (which domains transfer, which are
    outliers) a data-mixing recipe reads before setting weights.
    All model statistics are integer counts off ONE (source, term)
    relation; each (model, eval, term) contribution quantizes once to
    1e-6 units; per-pair sums are exact bigints divided once.
    Shape: token scan -> (source, term) partial agg -> a source-count
    × term-relation broadcast fan-out -> per-pair agg.  The matrix is
    |sources|² regardless of corpus size."""
    from my_flink_1_10_2_spark.operators.hints import dim

    docs = read(spark, sf_dir, "documents")
    tok = docs.select(
        "source",
        F.explode(
            F.filter(F.split(F.lower("text"), r"\s+"), lambda t: t != "")
        ).alias("w"),
    )
    cnt = tok.groupBy("source", "w").agg(F.count(F.lit(1)).alias("c"))
    nsrc = cnt.groupBy("source").agg(F.sum("c").alias("n"))
    vocab = cnt.agg(F.countDistinct("w").alias("v"))
    e = cnt.select(
        F.col("source").alias("eval_source"), "w", F.col("c").alias("c_e")
    )
    m = nsrc.select(F.col("source").alias("model_source"), "n")
    cm = cnt.select(
        F.col("source").alias("model_source"),
        F.col("w").alias("mw"),
        F.col("c").alias("c_m"),
    )
    em = e.join(dim(m))
    terms = (
        em.join(
            cm.withColumnRenamed("model_source", "cm_source"),
            (F.col("cm_source") == em.model_source) & (F.col("mw") == em.w),
            "left",
        )
        .join(dim(vocab))
        .select(
            "eval_source",
            "model_source",
            "c_e",
            F.round(
                F.col("c_e")
                * F.log(
                    (F.coalesce(F.col("c_m"), F.lit(0)) + 1).cast("double")
                    / (F.col("n") + F.col("v"))
                )
                * 1e6
            )
            .cast("bigint")
            .alias("t_i"),
        )
    )
    return terms.groupBy("model_source", "eval_source").agg(
        F.round(
            -(F.sum("t_i").cast("double") / F.sum("c_e")) / 1e6, 6
        ).alias("cross_entropy")
    )


@register(
    "q_referential_integrity_audit",
    oracle="""
    SELECT 'orders.o_custkey->customer' AS fk_edge,
           CAST((SELECT count(*) FROM orders) AS BIGINT) AS n_child_rows,
           CAST((SELECT count(*) FROM orders o
                 WHERE NOT EXISTS (SELECT 1 FROM customer c
                                   WHERE c.c_custkey = o.o_custkey)) AS BIGINT)
             AS n_orphans
    UNION ALL
    SELECT 'lineitem.l_orderkey->orders',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey))
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT count(*) FROM lineitem),
           (SELECT count(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT count(*) FROM customer),
           (SELECT count(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'supplier.s_nationkey->nation',
           (SELECT count(*) FROM supplier),
           (SELECT count(*) FROM supplier s
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = s.s_nationkey))
    """,
    category="pipeline",
)
def q_referential_integrity_audit(spark, sf_dir):
    """Referential-integrity audit across the star schema's FK edges:
    orphaned-child counts per edge via LEFT ANTI joins — the ingest
    gate a pipeline runs before trusting joins (an orphan silently
    drops rows from every inner join downstream).  Each edge is one
    anti-join whose parent side is dimension-sized (broadcast) or
    key-projected; the report is edge-count-sized."""
    edges = [
        ("orders.o_custkey->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem.l_orderkey->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem.l_partkey->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("customer.c_nationkey->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        ("supplier.s_nationkey->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ]
    out = None
    for name, child, ck, parent, pk in edges:
        c = read(spark, sf_dir, child).select(F.col(ck).alias("__k"))
        p = read(spark, sf_dir, parent).select(F.col(pk).alias("__k"))
        orphans = c.join(p, "__k", "left_anti").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orphans")
        )
        total = c.agg(F.count(F.lit(1)).cast("bigint").alias("n_child_rows"))
        row = (
            total.join(orphans)
            .select(
                F.lit(name).alias("fk_edge"), "n_child_rows", "n_orphans"
            )
        )
        out = row if out is None else out.unionAll(row)
    return out


@register(
    "q_benford_price_digits",
    oracle="""
    WITH d AS (
      SELECT CAST(substr(CAST(CAST(floor(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                  AS BIGINT) AS digit
      FROM orders WHERE o_totalprice >= 1
    ),
    obs AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY digit),
    tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM obs)
    SELECT digit, n,
           round(CAST(n AS DOUBLE) / total, 6) AS observed_p,
           round(ln(1.0 + 1.0 / digit) / ln(10.0), 6) AS benford_p
    FROM obs CROSS JOIN tot
    """,
    category="pipeline",
)
def q_benford_price_digits(spark, sf_dir):
    """Benford's-law first-digit audit on order totals — the classic
    fabricated-data screen: naturally-occurring multiplicative amounts
    follow P(d) = log10(1 + 1/d), and a synthetic or truncated column
    shows up as a flat or spiked digit histogram (this fixture's
    uniform-ish prices deliberately FAIL Benford — the audit's point
    is to report the deviation, not to pass).  One scan-time digit
    projection and a 9-row aggregate; both engines round the observed
    and theoretical distributions identically."""
    orders = read(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 1)
    d = orders.select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("digit")
    )
    obs = d.groupBy("digit").agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    from my_flink_1_10_2_spark.operators.hints import dim

    tot = obs.agg(F.sum("n").cast("bigint").alias("total"))
    return obs.join(dim(tot)).select(
        "digit",
        "n",
        F.round(F.col("n").cast("double") / F.col("total"), 6).alias("observed_p"),
        F.round(
            F.log(F.lit(1.0) + F.lit(1.0) / F.col("digit")) / F.log(F.lit(10.0)), 6
        ).alias("benford_p"),
    )


@register(
    "q_frequent_triples",
    oracle="""
    WITH li AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    )
    SELECT a.p AS p1, b.p AS p2, c.p AS p3,
           CAST(count(*) AS BIGINT) AS support
    FROM li a
      JOIN li b ON a.o = b.o AND a.p < b.p
      JOIN li c ON a.o = c.o AND b.p < c.p
    GROUP BY 1, 2, 3
    HAVING count(*) >= 2
    """,
    category="pipeline",
)
def q_frequent_triples(spark, sf_dir):
    """Frequent 3-itemsets over order baskets with A-PRIORI pruning
    (Agrawal & Srikant, VLDB 1994): a triple can only reach support s
    if all three of its pairs do (anti-monotonicity), so the plan
    builds the frequent-PAIR relation first and semi-joins every edge
    of the growing candidate against it before the third basket join —
    the candidate stream is bounded by frequent-pair density instead of
    sum-of-basket-size³.  The pruning is plan-level only: by
    anti-monotonicity the RESULT equals the naive triple count, which
    is exactly what the oracle replays (so the grade certifies the
    pruned plan loses nothing).  One basket relation, hash equi-joins
    keyed on the order, no cartesian."""
    li = (
        read(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    a = li.select(F.col("o"), F.col("p").alias("p1"))
    b = li.select(F.col("o"), F.col("p").alias("p2"))
    c = li.select(F.col("o"), F.col("p").alias("p3"))
    pairs = (
        a.join(b, "o")
        .where(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("s"))
        .where(F.col("s") >= 2)
        .select("p1", "p2")
    )
    l2_12 = pairs
    l2_13 = pairs.select(F.col("p1").alias("q1"), F.col("p2").alias("q3"))
    l2_23 = pairs.select(F.col("p1").alias("r2"), F.col("p2").alias("r3"))
    ab = (
        a.join(b, "o")
        .where(F.col("p1") < F.col("p2"))
        .join(l2_12, ["p1", "p2"], "left_semi")
    )
    abc = (
        ab.join(c, "o")
        .where(F.col("p2") < F.col("p3"))
        .join(
            l2_13,
            (F.col("p1") == F.col("q1")) & (F.col("p3") == F.col("q3")),
            "left_semi",
        )
        .join(
            l2_23,
            (F.col("p2") == F.col("r2")) & (F.col("p3") == F.col("r3")),
            "left_semi",
        )
    )
    return (
        abc.groupBy("p1", "p2", "p3")
        .agg(F.count(F.lit(1)).cast("bigint").alias("support"))
        .where(F.col("support") >= 2)
    )


@register(
    "q_association_rules",
    oracle="""
    WITH li AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT o) AS BIGINT) AS n_orders FROM li),
    itm AS (SELECT p, CAST(count(*) AS BIGINT) AS s FROM li GROUP BY p),
    pair AS (
      SELECT a.p AS p1, b.p AS p2, CAST(count(*) AS BIGINT) AS s_pair
      FROM li a JOIN li b ON a.o = b.o AND a.p <> b.p
      GROUP BY 1, 2 HAVING count(*) >= 2),
    rules AS (
      SELECT p1, p2, s_pair,
             round(CAST(s_pair AS DOUBLE) / i1.s, 6) AS confidence,
             round((CAST(s_pair AS DOUBLE) / i1.s) * n_orders / i2.s, 6) AS lift
      FROM pair JOIN itm i1 ON i1.p = pair.p1
                JOIN itm i2 ON i2.p = pair.p2
                CROSS JOIN n)
    SELECT p1, p2, s_pair, confidence, lift
    FROM (SELECT *, row_number() OVER (
            ORDER BY lift DESC, confidence DESC, p1, p2) AS rnk FROM rules)
    WHERE rnk <= 25
    """,
    category="pipeline",
)
def q_association_rules(spark, sf_dir):
    """Association rules p1 -> p2 from order baskets (Agrawal et al.
    1993): confidence = s(p1,p2)/s(p1), lift = confidence·N/s(p2) —
    ranked by lift, top 25 (ties broken on confidence then keys).
    Directed pairs with support >= 2; all statistics off one distinct
    basket relation; the float confidence/lift expressions are shaped
    identically on both engines so the ranking is exact.  Shape: basket
    self-join keyed on the order, item-margin hash joins, TakeOrdered."""
    from my_flink_1_10_2_spark.operators.hints import dim

    li = (
        read(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
    )
    n = li.agg(F.countDistinct("o").cast("bigint").alias("n_orders"))
    item = li.groupBy("p").agg(F.count(F.lit(1)).cast("bigint").alias("s"))
    a = li.select("o", F.col("p").alias("p1"))
    b = li.select("o", F.col("p").alias("p2"))
    pair = (
        a.join(b, "o")
        .where(F.col("p1") != F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).cast("bigint").alias("s_pair"))
        .where(F.col("s_pair") >= 2)
    )
    i1 = item.select(F.col("p").alias("p1"), F.col("s").alias("s1"))
    i2 = item.select(F.col("p").alias("p2"), F.col("s").alias("s2"))
    conf = F.col("s_pair").cast("double") / F.col("s1")
    lift = conf * F.col("n_orders") / F.col("s2")
    rules = (
        pair.join(i1, "p1")
        .join(i2, "p2")
        .join(dim(n))
        .select(
            "p1", "p2", "s_pair",
            F.round(conf, 6).alias("confidence"),
            F.round(lift, 6).alias("lift"),
        )
    )
    return rules.orderBy(
        F.col("lift").desc(), F.col("confidence").desc(), "p1", "p2"
    ).limit(25)


@register(
    "q_mad_price_outliers",
    oracle="""
    WITH med AS (
      SELECT o_orderpriority,
             quantile_cont(o_totalprice, 0.5) AS med,
             CAST(count(*) AS BIGINT) AS n
      FROM orders GROUP BY o_orderpriority),
    dev AS (
      SELECT o.o_orderpriority, abs(o.o_totalprice - m.med) AS d, m.med, m.n
      FROM orders o JOIN med m ON m.o_orderpriority = o.o_orderpriority),
    mad AS (
      SELECT o_orderpriority, quantile_cont(d, 0.5) AS mad
      FROM dev GROUP BY o_orderpriority)
    SELECT d.o_orderpriority AS priority, d.n,
           round(d.med, 4) AS median_price,
           round(mad.mad, 4) AS mad,
           CAST(count(*) FILTER (d.d > 4.4478 * mad.mad) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad ON mad.o_orderpriority = d.o_orderpriority
    GROUP BY d.o_orderpriority, d.n, d.med, mad.mad
    """,
    category="pipeline",
)
def q_mad_price_outliers(spark, sf_dir):
    """Robust outlier detection via the median absolute deviation
    (Hampel's rule, |x - med| > 3·1.4826·MAD): the screen that survives
    the heavy tails that break z-scores — both the location and scale
    estimates have a 50% breakdown point.  Two exact grouped medians
    (aggregate-buffer percentile, one hash shuffle each — the
    q_group_quantiles shape) and a final per-group count; both engines
    evaluate the identical 4.4478·MAD threshold on raw doubles."""
    orders = read(spark, sf_dir, "orders")
    med = orders.groupBy("o_orderpriority").agg(
        F.percentile("o_totalprice", 0.5).alias("med"),
        F.count(F.lit(1)).cast("bigint").alias("n"),
    )
    dev = orders.join(med, "o_orderpriority").select(
        "o_orderpriority",
        "n",
        "med",
        F.abs(F.col("o_totalprice") - F.col("med")).alias("d"),
    )
    mad = dev.groupBy("o_orderpriority").agg(
        F.percentile("d", 0.5).alias("mad")
    )
    return (
        dev.join(mad, "o_orderpriority")
        .groupBy(
            F.col("o_orderpriority").alias("priority"), "n", "med", "mad"
        )
        .agg(
            F.count(F.when(F.col("d") > F.lit(4.4478) * F.col("mad"), 1))
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "priority",
            "n",
            F.round("med", 4).alias("median_price"),
            F.round("mad", 4).alias("mad"),
            "n_outliers",
        )
    )


@register(
    "q_ks_source_drift",
    oracle="""
    WITH b AS (
      SELECT source, CAST(n_chars // 10 AS BIGINT) AS bkt FROM documents),
    sb AS (SELECT source, bkt, CAST(count(*) AS BIGINT) AS c
           FROM b GROUP BY source, bkt),
    st AS (SELECT source, CAST(sum(c) AS BIGINT) AS ts FROM sb GROUP BY source),
    gb AS (SELECT bkt, CAST(sum(c) AS BIGINT) AS g FROM sb GROUP BY bkt),
    gt AS (SELECT CAST(sum(g) AS BIGINT) AS tg FROM gb),
    grid AS (
      SELECT s.source, gb.bkt, coalesce(sb.c, 0) AS c, gb.g
      FROM (SELECT DISTINCT source FROM sb) s
        CROSS JOIN gb
        LEFT JOIN sb ON sb.source = s.source AND sb.bkt = gb.bkt),
    cum AS (
      SELECT source, bkt,
             sum(c) OVER (PARTITION BY source ORDER BY bkt) AS cs,
             sum(g) OVER (PARTITION BY source ORDER BY bkt) AS cg
      FROM grid),
    diffs AS (
      SELECT cum.source,
             CAST(round(abs(CAST(cs AS DOUBLE) / ts - CAST(cg AS DOUBLE) / tg)
                        * 1000000) AS BIGINT) AS d_i
      FROM cum JOIN st ON st.source = cum.source CROSS JOIN gt)
    SELECT source,
           (SELECT ts FROM st WHERE st.source = diffs.source) AS n_docs,
           round(max(d_i) / 1000000.0, 6) AS ks_stat
    FROM diffs GROUP BY source
    """,
    category="pipeline",
)
def q_ks_source_drift(spark, sf_dir):
    """Kolmogorov-Smirnov drift statistic per source: the max gap
    between each source's document-length ECDF and the whole corpus's,
    evaluated on 10-char buckets — the distribution-shift alarm a
    continuously-ingesting pipeline keeps per provenance stream.
    Every cumulative window runs over the BUCKET-level rollup
    partitioned by source (a few hundred rows per source, never row
    data); per-bucket gaps quantize to 1e-6 before the max so the
    statistic is engine-exact."""
    from pyspark.sql import Window as W

    from my_flink_1_10_2_spark.operators.hints import dim

    docs = read(spark, sf_dir, "documents")
    b = docs.select(
        "source", F.floor(F.col("n_chars") / 10).cast("bigint").alias("bkt")
    )
    sb = b.groupBy("source", "bkt").agg(F.count(F.lit(1)).alias("c"))
    st = sb.groupBy("source").agg(F.sum("c").cast("bigint").alias("ts"))
    gb = sb.groupBy("bkt").agg(F.sum("c").cast("bigint").alias("g"))
    gt = gb.agg(F.sum("g").cast("bigint").alias("tg"))
    grid = (
        sb.select("source").distinct()
        .join(dim(gb))
        .join(sb, ["source", "bkt"], "left")
        .select(
            "source", "bkt", F.coalesce(F.col("c"), F.lit(0)).alias("c"), "g"
        )
    )
    w = W.partitionBy("source").orderBy("bkt")
    cum = grid.select(
        "source",
        F.sum("c").over(w).alias("cs"),
        F.sum("g").over(w).alias("cg"),
    )
    diffs = (
        cum.join(st, "source")
        .join(dim(gt))
        .select(
            "source",
            "ts",
            F.round(
                F.abs(
                    F.col("cs").cast("double") / F.col("ts")
                    - F.col("cg").cast("double") / F.col("tg")
                )
                * 1e6
            )
            .cast("bigint")
            .alias("d_i"),
        )
    )
    return diffs.groupBy("source").agg(
        F.max("ts").alias("n_docs"),
        F.round(F.max("d_i") / 1e6, 6).alias("ks_stat"),
    )


@register(
    "q_out_of_order_profile",
    oracle="""
    WITH e AS (
      SELECT user_id, event_id, epoch_us(ts) AS t,
             epoch_us(ts) + (('0x' || substr(md5('jit|' || CAST(event_id AS VARCHAR)),
                                             1, 8))::BIGINT % 1200) * 1000000 AS arrival
      FROM events),
    lat AS (
      SELECT greatest(
               max(t) OVER (PARTITION BY user_id ORDER BY arrival, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               - t, 0) AS lat_us
      FROM e),
    b AS (
      SELECT least(lat_us // 60000000, 30) AS bucket_min
      FROM lat WHERE lat_us IS NOT NULL)
    SELECT CAST(bucket_min AS BIGINT) AS bucket_min,
           CAST(count(*) AS BIGINT) AS n_events
    FROM b GROUP BY 1
    """,
    category="streaming",
)
def q_out_of_order_profile(spark, sf_dir):
    """Out-of-orderness profile — the measurement that SIZES a
    watermark: replay each key's stream under a deterministic simulated
    network jitter (md5(event_id) % 20 min added to arrival, the
    fixture's event times being perfectly ordered), then histogram each
    event's lateness versus the per-key running-max event time in that
    arrival order, in 1-minute classes capped at 30.  The histogram's
    tail IS the bounded-out-of-orderness delay a
    BoundedOutOfOrdernessTimestampExtractor needs (ref:
    flink-streaming-java .../timestamps/
    BoundedOutOfOrdernessTimestampExtractor.java:30 — the
    `maxOutOfOrderness` parameter users otherwise guess).  The running
    max is a KEYED window (per user), never a global one; each key's
    first arrival (no preceding event) is excluded as undefined."""
    from pyspark.sql import Window as W

    jitter = (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("jit|"), F.col("event_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("bigint"),
            F.lit(1200),
        )
        * F.lit(1000000)
    )
    ev = read(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    ).withColumn("arrival", F.col("t") + jitter)
    w = (
        W.partitionBy("user_id")
        .orderBy("arrival", "event_id")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    lat = ev.select(
        F.greatest(F.max("t").over(w) - F.col("t"), F.lit(0)).alias("lat_us")
    ).where(F.col("lat_us").isNotNull())
    b = lat.select(
        F.least(F.expr("lat_us DIV 60000000"), F.lit(30))
        .cast("bigint")
        .alias("bucket_min")
    )
    return b.groupBy("bucket_min").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
