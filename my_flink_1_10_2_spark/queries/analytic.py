"""OVER / analytic windows, ranking, top-n, dedup, unnest (SURVEY §2.6, §2.8).

Reference: StreamExecOverAggregate.scala:56, BatchExecOverAggregate.scala:72,
FlinkSqlOperatorTable.java:998-1002 (RANK/DENSE_RANK/ROW_NUMBER/LEAD/LAG),
StreamExecRank.scala:53 (top-n), StreamExecDeduplicate.scala:50,
LogicalUnnestRule.scala (UNNEST).
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.rank import dedup_keep_first, dedup_keep_last, top_n
from my_flink_1_10_2_spark.queries import read, register


@register(
    "q_window_rank",
    oracle="""
    SELECT c_custkey, c_mktsegment, c_acctbal,
           rank()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rnk,
           dense_rank() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drnk,
           row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn
    FROM customer
    """,
    category="analytic",
)
def q_window_rank(spark, sf_dir):
    """RANK / DENSE_RANK / ROW_NUMBER over a partition."""
    customer = read(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return customer.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.row_number().over(w).alias("rn"),
    )


@register(
    "q_window_lead_lag",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           lag(o_totalprice)  OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS prev_price,
           lead(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS next_price,
           first_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS first_price,
           last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
    FROM orders
    """,
    category="analytic",
)
def q_window_lead_lag(spark, sf_dir):
    """LEAD/LAG/FIRST_VALUE/LAST_VALUE (ref: FlinkSqlOperatorTable.java:757-763)."""
    orders = read(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(wfull).alias("last_price"),
    )


@register(
    "q_over_rows_running",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_extendedprice,
           round(sum(l_extendedprice) OVER (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 4) AS running_sum,
           round(avg(l_extendedprice) OVER (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS moving_avg4,
           count(*) OVER (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS running_cnt
    FROM lineitem WHERE l_suppkey <= 3
    """,
    category="analytic",
)
def q_over_rows_running(spark, sf_dir):
    """ROWS-frame OVER aggregate — running + sliding
    (ref: RowTimeRowsBoundedPrecedingFunction.java:301)."""
    lineitem = read(spark, sf_dir, "lineitem").filter("l_suppkey <= 3")
    w = Window.partitionBy("l_suppkey").orderBy("l_orderkey", "l_linenumber")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    mov = w.rowsBetween(-3, Window.currentRow)
    return lineitem.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_extendedprice",
        F.round(F.sum("l_extendedprice").over(run), 4).alias("running_sum"),
        F.round(F.avg("l_extendedprice").over(mov), 4).alias("moving_avg4"),
        F.count(F.lit(1)).over(run).alias("running_cnt"),
    )


@register(
    "q_over_range_frame",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice,
           sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
             RANGE BETWEEN 100 PRECEDING AND CURRENT ROW) AS range_sum
    FROM orders WHERE o_custkey <= 30
    """,
    category="analytic",
)
def q_over_range_frame(spark, sf_dir):
    """RANGE-frame OVER aggregate
    (ref: RowTimeRangeBoundedPrecedingFunction.java:289)."""
    orders = read(spark, sf_dir, "orders").filter("o_custkey <= 30")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey").rangeBetween(-100, 0)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.sum("o_totalprice").over(w).alias("range_sum"),
    )


@register(
    "q_topn_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_mktsegment, c_custkey, c_name, c_acctbal,
             row_number() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rownum
      FROM customer
    ) WHERE rownum <= 3
    """,
    category="rank",
)
def q_topn_per_group(spark, sf_dir):
    """Top-N per key via the engine's top_n operator
    (ref: StreamExecRank.scala:53, AppendOnlyTopNFunction.java)."""
    customer = read(spark, sf_dir, "customer")
    return top_n(
        customer.select("c_mktsegment", "c_custkey", "c_name", "c_acctbal"),
        ["c_mktsegment"],
        [F.col("c_acctbal").desc(), F.col("c_custkey")],
        3,
        ascending=True,  # order columns already carry direction
    )


@register(
    "q_dedup_keep_first",
    oracle="""
    SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, event_type, value FROM (
      SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    category="dedup",
)
def q_dedup_keep_first(spark, sf_dir):
    """Keep-first dedup per key by rowtime
    (ref: DeduplicateKeepFirstRowFunction.java:34)."""
    events = read(spark, sf_dir, "events")
    return dedup_keep_first(
        events.select("user_id", "event_id", "ts", "event_type", "value"),
        ["user_id"],
        [F.col("ts"), F.col("event_id")],
    )


@register(
    "q_dedup_keep_last",
    oracle="""
    SELECT user_id, event_id, date_trunc('microseconds', ts) AS ts, event_type, value FROM (
      SELECT user_id, event_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn = 1
    """,
    category="dedup",
)
def q_dedup_keep_last(spark, sf_dir):
    """Keep-last dedup per key (ref: DeduplicateKeepLastRowFunction.java)."""
    events = read(spark, sf_dir, "events")
    return dedup_keep_last(
        events.select("user_id", "event_id", "ts", "event_type", "value"),
        ["user_id"],
        [F.col("ts"), F.col("event_id")],
    )


@register(
    "q_distinct_rows",
    oracle="SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem",
    category="dedup",
)
def q_distinct_rows(spark, sf_dir):
    """DISTINCT = exact dedup over full rows (ref: DataSet.distinct:596)."""
    return read(spark, sf_dir, "lineitem").select("l_returnflag", "l_linestatus").distinct()


@register(
    "q_unnest_explode",
    oracle="""
    SELECT doc_id, unnest(string_split(text, ' ')) AS word
    FROM documents WHERE doc_id <= 20
    """,
    category="correlate",
)
def q_unnest_explode(spark, sf_dir):
    """UNNEST / CROSS JOIN LATERAL TABLE(split(...))
    (ref: LogicalUnnestRule.scala, StreamExecCorrelate.scala).

    `explode` is Spark's native Generate node — stays in the JVM, no UDF.
    """
    docs = read(spark, sf_dir, "documents").filter("doc_id <= 20")
    return docs.select("doc_id", F.explode(F.split(F.col("text"), " ")).alias("word"))


@register(
    "q_count_window",
    oracle="""
    SELECT user_id, w_id, count(*) AS cnt,
           CAST(sum(CAST(round(value * 10000) AS BIGINT)) AS BIGINT) AS sum_v_e4
    FROM (
      SELECT user_id, value,
             CAST(floor((row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1) / 5)
                  AS BIGINT) AS w_id
      FROM events
    ) GROUP BY user_id, w_id
    """,
    category="window",
)
def q_count_window(spark, sf_dir):
    """Count-based tumbling window (ref: KeyedStream.countWindow:643) —
    no Spark native; engine expresses it as row_number bucketing.
    Values graded in integer 1e-4 units (raw double sums are
    ORDER-dependent — at sf0.1 the hash-agg arrival order diverged
    between engines by 5.7e-14; the count_window_slide recipe)."""
    from my_flink_1_10_2_spark.operators.windows import count_tumble_window

    events = read(spark, sf_dir, "events").withColumn(
        "v_e4", F.round(F.col("value") * 10000).cast("bigint")
    )
    bucketed = count_tumble_window(events, ["user_id"], ["ts", "event_id"], 5)
    return bucketed.groupBy("user_id", "w_id").agg(
        F.count(F.lit(1)).alias("cnt"),
        F.sum("v_e4").cast("bigint").alias("sum_v_e4"),
    )


@register(
    "q_percentile_native",
    oracle="""
    SELECT l_linestatus,
           quantile_cont(l_extendedprice, 0.5)  AS p50,
           quantile_cont(l_extendedprice, 0.9)  AS p90,
           quantile_cont(l_extendedprice, 0.99) AS p99
    FROM lineitem
    GROUP BY l_linestatus
    """,
    category="analytic",
)
def q_percentile_native(spark, sf_dir):
    """Exact percentiles via Spark's native `percentile` aggregate —
    the JVM-side counterpart of the q_udaf_median pandas UDAF (same
    linear interpolation as DuckDB quantile_cont). At scale prefer
    `percentile_approx` (KLL-style sketch, bounded memory); the exact
    form is the oracle-checkable variant."""
    l = read(spark, sf_dir, "lineitem")
    return l.groupBy("l_linestatus").agg(
        F.percentile("l_extendedprice", 0.5).alias("p50"),
        F.percentile("l_extendedprice", 0.9).alias("p90"),
        F.percentile("l_extendedprice", 0.99).alias("p99"),
    )


@register(
    "q_table_api_over_window",
    oracle="""
    SELECT o_custkey,
           o_orderkey,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS run_cents,
           CAST(count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderkey
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW
           ) AS BIGINT) AS last3
    FROM orders
    WHERE o_custkey <= 200
    ORDER BY o_custkey, o_orderkey
    """,
    category="analytic",
)
def q_table_api_over_window(spark, sf_dir):
    """The fluent Table-API OVER-window spelling end-to-end (ref:
    Over.java:48, OverWindowedTable; select('agg OVER w')) — running
    integer-cents sum (UNBOUNDED_ROW) and a bounded 3-row count frame,
    both planned as native JVM window functions."""
    from pyspark.sql import functions as F

    from my_flink_1_10_2_spark.operators.windows import UNBOUNDED_ROW, Over
    from my_flink_1_10_2_spark.table import Table

    orders = Table(
        read(spark, sf_dir, "orders")
        .where(F.col("o_custkey") <= 200)
        .withColumn(
            "cents", F.round(F.col("o_totalprice") * 100).cast("bigint")
        )
    )
    run = (
        orders.window(
            Over.partition_by("o_custkey")
            .order_by("o_orderkey")
            .preceding(UNBOUNDED_ROW)
            .alias("w")
        ).select(
            "o_custkey",
            "o_orderkey",
            "sum(cents) OVER w AS run_cents",
        )
    )
    bounded = (
        orders.window(
            Over.partition_by("o_custkey")
            .order_by("o_orderkey")
            .preceding("2.rows")
            .alias("w")
        ).select("o_custkey AS ck", "o_orderkey AS ok", "count(*) OVER w AS last3")
    )
    return (
        run.df.join(
            bounded.df,
            (F.col("o_custkey") == F.col("ck")) & (F.col("o_orderkey") == F.col("ok")),
        )
        .select("o_custkey", "o_orderkey", "run_cents", "last3")
        .orderBy("o_custkey", "o_orderkey")
    )


@register(
    "q_group_quantiles",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(quantile_cont(l_extendedprice, 0.5), 4)  AS p50,
           round(quantile_cont(l_extendedprice, 0.9), 4)  AS p90,
           round(quantile_cont(l_extendedprice, 0.99), 4) AS p99,
           count(*) AS n
    FROM lineitem
    GROUP BY l_returnflag, l_linestatus
    """,
    category="analytic",
)
def q_group_quantiles(spark, sf_dir):
    """Per-group exact percentiles (linear interpolation, the SQL
    PERCENTILE_CONT semantics): one hash shuffle on the group key, the
    per-group sort happens inside the aggregate buffer.  At 100 TB
    prefer percentile_approx (KLL sketch, mergeable, bounded memory) —
    the exact form is the correctness oracle for it."""
    li = read(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag", "l_linestatus").agg(
        F.round(F.percentile("l_extendedprice", 0.5), 4).alias("p50"),
        F.round(F.percentile("l_extendedprice", 0.9), 4).alias("p90"),
        F.round(F.percentile("l_extendedprice", 0.99), 4).alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_sql_topn_per_group",
    oracle="""
    SELECT o_custkey, o_orderkey, o_totalprice FROM (
      SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER (PARTITION BY o_custkey
                                ORDER BY o_totalprice DESC, o_orderkey) AS rn
      FROM orders) WHERE rn <= 2
    """,
    category="rank",
)
def q_sql_topn_per_group(spark, sf_dir):
    """Top-N through the SQL surface — the exact `ROW_NUMBER() <= N`
    pattern the reference's planner recognizes as a Rank node (ref:
    FlinkLogicalRankRule.scala, StreamExecRank.scala); here Catalyst
    plans the same WindowGroupLimit pushdown from the subquery
    spelling."""
    from my_flink_1_10_2_spark.queries import register_views

    register_views(spark, sf_dir, "orders")
    return spark.sql(
        """
        SELECT o_custkey, o_orderkey, o_totalprice FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) AS rn
          FROM orders) WHERE rn <= 2
        """
    )


@register(
    "q_native_pivot",
    oracle="""
    SELECT user_id,
           CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
           CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
           CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
           CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
           CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
    FROM events WHERE user_id % 9 = 0
    GROUP BY user_id
    """,
    category="analytic",
)
def q_native_pivot(spark, sf_dir):
    """Native `.pivot()` with explicit pivot values (the explicit list
    skips the extra distinct-values scan Spark otherwise runs — the
    planning rule to copy at scale).  Catalyst compiles it to the same
    conditional-aggregate Expand the oracle spells out."""
    events = read(spark, sf_dir, "events").where(F.col("user_id") % 9 == 0)
    out = (
        events.groupBy("user_id")
        .pivot("event_type", ["click", "error", "purchase", "signup", "view"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(c), F.lit(0)).cast("bigint").alias(c)
            for c in ["click", "error", "purchase", "signup", "view"]
        ],
    )
