"""Core batch relational queries: scan → Calc (project+filter) → aggregate
→ sort/limit.

Covers SURVEY §2.2 (Calc), §2.3 (group/hash aggregation, distinct
aggregates, GROUPING SETS / ROLLUP / CUBE, min_by/max_by, LISTAGG) — the
surface the reference implements in StreamExecGroupAggregate.scala:55,
BatchExecHashAggregate.scala:43, DecomposeGroupingSetsRule.scala:205,
FlinkSqlOperatorTable.java:885-898.

Scale notes: every aggregation here compiles to partial/final
HashAggregate (map-side combine before the shuffle — the reference's
Local/GlobalGroupAggregate pair, free in Spark); filters and column
pruning reach the parquet scan, so at 100 TB the scan reads only the
referenced columns and row groups.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register
from my_flink_1_10_2_spark.table import Table


@register(
    "q1_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity)                                 AS sum_qty,
           sum(l_extendedprice)                            AS sum_base_price,
           sum(l_extendedprice * (1 - l_discount))         AS sum_disc_price,
           sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)) AS sum_charge,
           avg(l_quantity)                                 AS avg_qty,
           avg(l_extendedprice)                            AS avg_price,
           avg(l_discount)                                 AS avg_disc,
           count(*)                                        AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
    category="aggregation",
)
def q1_pricing_summary(spark, sf_dir):
    """Flagship: TPC-H Q1 pricing summary (SURVEY §7.1).

    scan → filter → project → hash agg → sort, all JVM-side.
    """
    lineitem = Table(read(spark, sf_dir, "lineitem"))
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp_ntz"))
        .group_by("l_returnflag", "l_linestatus")
        .select(
            F.sum("l_quantity").alias("sum_qty"),
            F.sum("l_extendedprice").alias("sum_base_price"),
            F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("sum_disc_price"),
            F.sum(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))
            ).alias("sum_charge"),
            F.avg("l_quantity").alias("avg_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.avg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .order_by("l_returnflag", "l_linestatus")
        .to_df()
    )


@register(
    "q_calc_project_filter",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS net_price,
           upper(l_returnflag)                AS flag_upper,
           CASE WHEN l_quantity > 25 THEN 'bulk' ELSE 'small' END AS qty_class
    FROM lineitem
    WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
    """,
    category="calc",
)
def q_calc_project_filter(spark, sf_dir):
    """Fused project+filter (ref: StreamExecCalc.scala / CalcCodeGenerator.scala).

    Catalyst collapses Project+Filter into one whole-stage-codegen'd stage;
    both predicate columns are pushed to the parquet scan.
    """
    lineitem = Table(read(spark, sf_dir, "lineitem"))
    return (
        lineitem.filter("l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.expr("l_extendedprice * (1 - l_discount)").alias("net_price"),
            F.upper("l_returnflag").alias("flag_upper"),
            F.when(F.col("l_quantity") > 25, "bulk").otherwise("small").alias("qty_class"),
        )
        .to_df()
    )


@register(
    "q_agg_functions",
    oracle="""
    SELECT l_returnflag,
           count(*)                AS cnt,
           count(l_quantity)       AS cnt_nonnull,
           sum(l_quantity)         AS sum_qty,
           avg(l_extendedprice)    AS avg_price,
           min(l_extendedprice)    AS min_price,
           max(l_extendedprice)    AS max_price,
           stddev_samp(l_quantity) AS stddev_qty,
           stddev_pop(l_quantity)  AS stddevp_qty,
           var_samp(l_discount)    AS var_disc,
           var_pop(l_discount)     AS varp_disc
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregation",
)
def q_agg_functions(spark, sf_dir):
    """Full aggregate-function battery (ref: FlinkSqlOperatorTable.java:885-898)."""
    lineitem = Table(read(spark, sf_dir, "lineitem"))
    return (
        lineitem.group_by("l_returnflag")
        .select(
            F.count(F.lit(1)).alias("cnt"),
            F.count("l_quantity").alias("cnt_nonnull"),
            F.sum("l_quantity").alias("sum_qty"),
            F.avg("l_extendedprice").alias("avg_price"),
            F.min("l_extendedprice").alias("min_price"),
            F.max("l_extendedprice").alias("max_price"),
            F.stddev_samp("l_quantity").alias("stddev_qty"),
            F.stddev_pop("l_quantity").alias("stddevp_qty"),
            F.var_samp("l_discount").alias("var_disc"),
            F.var_pop("l_discount").alias("varp_disc"),
        )
        .to_df()
    )


@register(
    "q_distinct_agg",
    oracle="""
    SELECT l_linestatus,
           count(DISTINCT l_partkey)  AS distinct_parts,
           count(DISTINCT l_suppkey)  AS distinct_supps,
           sum(DISTINCT l_quantity)   AS sum_distinct_qty
    FROM lineitem GROUP BY l_linestatus
    """,
    category="aggregation",
)
def q_distinct_agg(spark, sf_dir):
    """DISTINCT aggregates (ref: SplitAggregateRule.scala, SplitAggregateITCase).

    Spark plans the distinct-agg Expand natively; AQE handles the skew the
    reference's split-distinct rule targets.
    """
    lineitem = Table(read(spark, sf_dir, "lineitem"))
    return (
        lineitem.group_by("l_linestatus")
        .select(
            F.count_distinct("l_partkey").alias("distinct_parts"),
            F.count_distinct("l_suppkey").alias("distinct_supps"),
            F.sum_distinct(F.col("l_quantity")).alias("sum_distinct_qty"),
        )
        .to_df()
    )


@register(
    "q_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           sum(l_quantity) AS sum_qty, count(*) AS cnt,
           GROUPING(l_returnflag) AS g_flag, GROUPING(l_linestatus) AS g_status
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
    """,
    category="aggregation",
)
def q_grouping_sets(spark, sf_dir):
    """GROUPING SETS + GROUPING() (ref: DecomposeGroupingSetsRule.scala:205,
    GroupingSetsITCase.scala).  Spark's Expand node is generated natively."""
    read(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty, count(*) AS cnt,
               grouping(l_returnflag) AS g_flag, grouping(l_linestatus) AS g_status
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_returnflag), ())
        """
    )


@register(
    "q_rollup",
    oracle="""
    SELECT l_returnflag, l_linestatus, sum(l_extendedprice) AS sum_price, count(*) AS cnt
    FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
    """,
    category="aggregation",
)
def q_rollup(spark, sf_dir):
    """ROLLUP via the DataFrame API (ref: GroupingSetsITCase.scala)."""
    lineitem = read(spark, sf_dir, "lineitem")
    return lineitem.rollup("l_returnflag", "l_linestatus").agg(
        F.sum("l_extendedprice").alias("sum_price"), F.count(F.lit(1)).alias("cnt")
    )


@register(
    "q_cube",
    oracle="""
    SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
    category="aggregation",
)
def q_cube(spark, sf_dir):
    """CUBE via the DataFrame API."""
    lineitem = read(spark, sf_dir, "lineitem")
    return lineitem.cube("l_returnflag", "l_linestatus").agg(
        F.sum("l_quantity").alias("sum_qty")
    )


@register(
    "q_min_by_max_by",
    oracle="""
    SELECT l_returnflag,
           arg_min(l_orderkey, l_extendedprice + l_orderkey * 1e-9) AS cheapest_order,
           arg_max(l_orderkey, l_extendedprice + l_orderkey * 1e-9) AS priciest_order
    FROM lineitem GROUP BY l_returnflag
    """,
    category="aggregation",
)
def q_min_by_max_by(spark, sf_dir):
    """minBy/maxBy (ref: KeyedStream.java:764-987) = Spark max_by/min_by.

    Ordering value is de-tied with the key so the winner is deterministic.
    """
    lineitem = Table(read(spark, sf_dir, "lineitem"))
    tiebreak = F.col("l_extendedprice") + F.col("l_orderkey") * F.lit(1e-9)
    return (
        lineitem.group_by("l_returnflag")
        .select(
            F.min_by(F.col("l_orderkey"), tiebreak).alias("cheapest_order"),
            F.max_by(F.col("l_orderkey"), tiebreak).alias("priciest_order"),
        )
        .to_df()
    )


@register(
    "q_listagg",
    oracle="""
    SELECT c_mktsegment, string_agg(c_name, ',' ORDER BY c_name) AS names
    FROM customer WHERE c_custkey <= 50 GROUP BY c_mktsegment
    """,
    category="aggregation",
)
def q_listagg(spark, sf_dir):
    """LISTAGG / collect→multiset (ref: FlinkSqlOperatorTable.java:757-768).

    Sorted inside the group so the result is deterministic on both engines.
    """
    customer = Table(read(spark, sf_dir, "customer"))
    return (
        customer.filter("c_custkey <= 50")
        .group_by("c_mktsegment")
        .select(F.array_join(F.array_sort(F.collect_list("c_name")), ",").alias("names"))
        .to_df()
    )


@register(
    "q_sort_limit_offset",
    oracle="""
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 20 OFFSET 5
    """,
    category="sort",
)
def q_sort_limit_offset(spark, sf_dir):
    """ORDER BY + LIMIT/OFFSET (ref: BatchExecSortLimit.scala, Table.java:791,812).

    Catalyst plans TakeOrderedAndProject — no full sort materialization.
    """
    orders = Table(read(spark, sf_dir, "orders"))
    return (
        orders.select("o_orderkey", "o_totalprice")
        .order_by(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .offset(5)
        .limit(20)
        .to_df()
    )


@register(
    "q_full_sort",
    oracle="""
    SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_name DESC
    """,
    category="sort",
)
def q_full_sort(spark, sf_dir):
    """Full parallel sort (ref: BatchExecSort.scala, BinaryExternalSorter.java).

    Spark range-partitions on a sampled key distribution then sorts within
    partitions — the same sample-based strategy the reference hand-rolls.
    """
    return Table(read(spark, sf_dir, "nation")).order_by(F.col("n_name").desc()).to_df()


@register(
    "q_values_literal",
    oracle="""
    SELECT * FROM (VALUES (1, 'a'), (2, 'b'), (3, 'c')) AS t(id, tag)
    """,
    category="scan",
)
def q_values_literal(spark, sf_dir):
    """VALUES literal relation (ref: StreamExecValues.scala, ValuesCodeGenerator.scala)."""
    return spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], "id int, tag string")


@register(
    "q_sql_lateral_table",
    oracle="""
    SELECT doc_id, unnest(str_split_regex(text, '\\s+')) AS word
    FROM documents
    WHERE doc_id < 5
    """,
    category="correlate",
)
def q_sql_lateral_table(spark, sf_dir):
    """Flink SQL correlate spelling — ``CROSS JOIN LATERAL
    TABLE(udtf(x)) AS T(col)`` (ref: CorrelateITCase.scala,
    SqlToRelConverter correlate path) — rewritten by engine.sql to
    Spark's LATERAL VIEW generator form."""
    from my_flink_1_10_2_spark.queries import register_views
    from my_flink_1_10_2_spark.session import TableEnvironment

    register_views(spark, sf_dir, "documents")
    te = TableEnvironment(spark)
    return te.sql(
        "SELECT doc_id, word FROM documents "
        "CROSS JOIN LATERAL TABLE(explode(split(text, '\\\\s+'))) AS T(word) "
        "WHERE doc_id < 5"
    ).df


@register(
    "q_profile_table",
    oracle="""
    SELECT 'o_orderkey' AS col_name, count(*) AS n_rows,
           count(*) - count(o_orderkey) AS n_nulls,
           count(DISTINCT o_orderkey) AS n_distinct,
           CAST(min(o_orderkey) AS VARCHAR) AS min_value,
           CAST(max(o_orderkey) AS VARCHAR) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus),
           CAST(min(o_orderstatus) AS VARCHAR), CAST(max(o_orderstatus) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate),
           CAST(min(o_orderdate) AS VARCHAR), CAST(max(o_orderdate) AS VARCHAR)
    FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority),
           CAST(min(o_orderpriority) AS VARCHAR), CAST(max(o_orderpriority) AS VARCHAR)
    FROM orders
    """,
    category="scan",
)
def q_profile_table(spark, sf_dir):
    """Column statistics profiling (ref: CatalogColumnStatisticsData* —
    nullCount/min/max/ndv feeding the CBO, the ANALYZE TABLE surface).
    One aggregation job for every column (Catalyst plans the
    multi-distinct via Expand), then a driver-free stack unpivot."""
    from my_flink_1_10_2_spark.operators.profile import profile_table

    return profile_table(
        read(spark, sf_dir, "orders"),
        ["o_orderkey", "o_orderstatus", "o_orderdate", "o_orderpriority"],
    )


@register(
    "q_safe_union_evolution",
    oracle="""
    SELECT o_orderkey AS k, CAST(o_totalprice AS DOUBLE) AS price,
           o_orderstatus AS status, CAST(NULL AS VARCHAR) AS priority
    FROM orders WHERE o_orderkey % 2 = 0
    UNION ALL
    SELECT o_orderkey, CAST(CAST(round(o_totalprice) AS BIGINT) AS DOUBLE),
           CAST(NULL AS VARCHAR), o_orderpriority
    FROM orders WHERE o_orderkey % 2 = 1
    """,
    category="setop",
)
def q_safe_union_evolution(spark, sf_dir):
    """Schema-evolution union across drifted snapshots (ref: flink-avro
    schema resolution / Avro type promotion): snapshot A has
    (k, price double, status), snapshot B has (k, price bigint,
    priority).  safe_union name-aligns, widens bigint->double and fills
    the missing column with NULLs — every input stays a plain pruned
    scan."""
    from my_flink_1_10_2_spark.operators.schema_evolution import safe_union

    o = read(spark, sf_dir, "orders")
    snap_a = o.where(F.col("o_orderkey") % 2 == 0).select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("price"),
        F.col("o_orderstatus").alias("status"),
    )
    snap_b = o.where(F.col("o_orderkey") % 2 == 1).select(
        F.col("o_orderkey").alias("k"),
        F.round("o_totalprice").cast("bigint").alias("price"),
        F.col("o_orderpriority").alias("priority"),
    )
    return safe_union(snap_a, snap_b)


@register(
    "q_histogram_equiwidth",
    oracle="""
    WITH b AS (
      SELECT CAST(min(o_totalprice) AS DOUBLE) AS lo,
             CAST(max(o_totalprice) AS DOUBLE) AS hi
      FROM orders)
    SELECT LEAST(CAST(floor((o_totalprice - lo) / ((hi - lo) / 10.0)) AS BIGINT), 9) AS bucket,
           CAST(count(*) AS BIGINT) AS cnt,
           round(min(o_totalprice), 2) AS lo_val,
           round(max(o_totalprice), 2) AS hi_val
    FROM orders, b
    GROUP BY 1 ORDER BY 1
    """,
    category="scan",
)
def q_histogram_equiwidth(spark, sf_dir):
    """Equi-width histogram (10 buckets over [min, max]) — the CBO
    histogram statistic (ref: CatalogColumnStatisticsData histogram
    support) and the profiling companion to q_profile_table.  The
    min/max bounds ride a 1-row broadcast; bucketing is a map-side
    floor, one aggregate — two scans total (bounds + histogram), the
    standard two-pass shape."""
    from my_flink_1_10_2_spark.operators.hints import dim

    o = read(spark, sf_dir, "orders")
    b = o.agg(
        F.min("o_totalprice").cast("double").alias("lo"),
        F.max("o_totalprice").cast("double").alias("hi"),
    )
    bucket = F.least(
        F.floor(
            (F.col("o_totalprice") - F.col("lo")) / ((F.col("hi") - F.col("lo")) / 10.0)
        ).cast("bigint"),
        F.lit(9),
    )
    return (
        o.join(dim(b))
        .groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("cnt"),
            F.round(F.min("o_totalprice"), 2).alias("lo_val"),
            F.round(F.max("o_totalprice"), 2).alias("hi_val"),
        )
        .orderBy("bucket")
    )
