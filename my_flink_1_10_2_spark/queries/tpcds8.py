"""TPC-DS inventory-family query shapes (eighth batch) — the repeats
previously closed by argument ("the driver schema has no inventory
table") now closed by evidence: a weekly inventory snapshot is
SYNTHESIZED with a closed form (one row per part x week, qty_on_hand =
(p_partkey*37 + wk*11) % 100), so both engines materialize the identical
fact table and the true inventory JOIN shapes run for real (reference
gate: flink-end-to-end-tests/flink-tpcds-test/tpcds-tool/query/
query72.sql, query21.sql, query22.sql).

Scale shape: the synthetic inventory is |part| x 52 rows built by a
broadcast cross with a 52-row literal relation (the sanctioned
broadcast-bounded cross) — exactly how a real inventory fact would
arrive as a parquet table; every downstream join is a plain equi-join
on (partkey, week).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register

_INV_SQL = """
    SELECT p_partkey AS inv_partkey, p_brand, p_type,
           CAST(t.wk AS BIGINT) AS wk,
           (p_partkey * 37 + t.wk * 11) % 100 AS inv_qty
    FROM part, range(1, 53) t(wk)
"""


def _inventory(spark, sf_dir):
    """part x weeks 1..52 with the closed-form on-hand quantity."""
    p = read(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_type")
    weeks = spark.range(1, 53).select(F.col("id").alias("wk"))
    return p.join(F.broadcast(weeks)).select(
        F.col("p_partkey").alias("inv_partkey"),
        "p_brand",
        "p_type",
        F.col("wk").cast("bigint").alias("wk"),
        ((F.col("p_partkey") * 37 + F.col("wk") * 11) % 100).alias("inv_qty"),
    )


@register(
    "ds_inventory_stockout",
    oracle=f"""
    WITH inv AS MATERIALIZED ({_INV_SQL}),
    sales AS (
      SELECT l_partkey, CAST(week(l_shipdate) AS BIGINT) AS wk, l_quantity,
             o_orderpriority
      FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      WHERE year(l_shipdate) = 1997
    )
    SELECT i.p_brand, s.wk AS wk,
           CAST(sum(CASE WHEN s.o_orderpriority = '1-URGENT'
                         THEN 1 ELSE 0 END) AS BIGINT) AS promo,
           CAST(sum(CASE WHEN s.o_orderpriority <> '1-URGENT'
                         THEN 1 ELSE 0 END) AS BIGINT) AS no_promo,
           CAST(count(*) AS BIGINT) AS total_cnt
    FROM sales s JOIN inv i ON s.l_partkey = i.inv_partkey AND s.wk = i.wk
    WHERE i.inv_qty < s.l_quantity
    GROUP BY i.p_brand, s.wk
    ORDER BY total_cnt DESC, p_brand, wk
    LIMIT 100
    """,
    category="tpcds",
)
def ds_inventory_stockout(spark, sf_dir):
    """TPC-DS Q72 core: the catalog_sales ⨝ inventory join where the
    on-hand quantity in the SAME week cannot cover the ordered quantity
    (inv_quantity_on_hand < cs_quantity, d1.d_week_seq = d2.d_week_seq),
    counted per brand x week and split by the promo analog
    (o_orderpriority = '1-URGENT' for p_promo_sk IS NOT NULL).  The
    inventory side is the synthesized weekly snapshot — a genuine
    fact-to-fact equi-join on (partkey, week), the shape the original
    exercises."""
    inv = _inventory(spark, sf_dir)
    li = read(spark, sf_dir, "lineitem").where(F.year("l_shipdate") == 1997)
    o = read(spark, sf_dir, "orders")
    sales = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_partkey",
        F.weekofyear("l_shipdate").cast("bigint").alias("wk"),
        "l_quantity",
        "o_orderpriority",
    )
    urgent = (F.col("o_orderpriority") == "1-URGENT").cast("int")
    return (
        sales.join(
            inv,
            (sales.l_partkey == inv.inv_partkey) & (sales.wk == inv.wk),
        )
        .where(F.col("inv_qty") < F.col("l_quantity"))
        .groupBy("p_brand", sales.wk)
        .agg(
            F.sum(urgent).cast("bigint").alias("promo"),
            F.sum(1 - urgent).cast("bigint").alias("no_promo"),
            F.count(F.lit(1)).alias("total_cnt"),
        )
        .orderBy(F.desc("total_cnt"), "p_brand", "wk")
        .limit(100)
    )


@register(
    "ds_inventory_qoh_rollup",
    oracle=f"""
    WITH inv AS MATERIALIZED ({_INV_SQL})
    SELECT COALESCE(p_type, 'ALL')  AS ptype,
           COALESCE(p_brand, 'ALL') AS brand,
           CAST(grouping(p_type) * 2 + grouping(p_brand) AS BIGINT) AS gid,
           CAST(sum(inv_qty) AS BIGINT) AS qty_sum,
           CAST(count(*) AS BIGINT) AS n_snapshots
    FROM inv
    WHERE wk BETWEEN 14 AND 26
    GROUP BY ROLLUP(p_type, p_brand)
    ORDER BY gid, ptype, brand
    LIMIT 200
    """,
    category="tpcds",
)
def ds_inventory_qoh_rollup(spark, sf_dir):
    """TPC-DS Q22 shape: average quantity-on-hand per product hierarchy
    level over a quarter of weekly snapshots, GROUP BY ROLLUP — graded
    as the exact integer (sum, count) pair instead of the float average
    (the division is the reader's, parity is the data's)."""
    inv = _inventory(spark, sf_dir).where(F.col("wk").between(14, 26))
    return (
        inv.rollup("p_type", "p_brand")
        .agg(
            (
                F.grouping("p_type").cast("bigint") * 2
                + F.grouping("p_brand").cast("bigint")
            ).alias("gid"),
            F.sum("inv_qty").cast("bigint").alias("qty_sum"),
            F.count(F.lit(1)).alias("n_snapshots"),
        )
        .select(
            F.coalesce("p_type", F.lit("ALL")).alias("ptype"),
            F.coalesce("p_brand", F.lit("ALL")).alias("brand"),
            "gid",
            "qty_sum",
            "n_snapshots",
        )
        .orderBy("gid", "ptype", "brand")
        .limit(200)
    )


@register(
    "ds_inventory_before_after",
    oracle=f"""
    WITH inv AS MATERIALIZED ({_INV_SQL}),
    wh AS (
      SELECT inv_partkey % 4 AS warehouse, p_brand,
             CAST(sum(CASE WHEN wk < 27 THEN inv_qty ELSE 0 END) AS BIGINT) AS qty_before,
             CAST(sum(CASE WHEN wk >= 27 THEN inv_qty ELSE 0 END) AS BIGINT) AS qty_after
      FROM inv GROUP BY warehouse, p_brand
    )
    SELECT warehouse, p_brand, qty_before, qty_after
    FROM wh
    WHERE qty_before > 0
      AND 3 * qty_after >= 2 * qty_before
      AND 2 * qty_after <= 3 * qty_before
    ORDER BY warehouse, p_brand
    LIMIT 100
    """,
    category="tpcds",
)
def ds_inventory_before_after(spark, sf_dir):
    """TPC-DS Q21 shape: per (warehouse, item-group) inventory mass
    before vs after a pivot date, keeping groups whose after/before
    ratio sits in [2/3, 3/2] — the band test done with exact integer
    cross-multiplication (no float division), warehouse synthesized as
    partkey % 4."""
    inv = _inventory(spark, sf_dir)
    before = F.when(F.col("wk") < 27, F.col("inv_qty")).otherwise(F.lit(0))
    after = F.when(F.col("wk") >= 27, F.col("inv_qty")).otherwise(F.lit(0))
    wh = (
        inv.groupBy(
            (F.col("inv_partkey") % 4).alias("warehouse"), "p_brand"
        )
        .agg(
            F.sum(before).cast("bigint").alias("qty_before"),
            F.sum(after).cast("bigint").alias("qty_after"),
        )
    )
    return (
        wh.where(
            (F.col("qty_before") > 0)
            & (3 * F.col("qty_after") >= 2 * F.col("qty_before"))
            & (2 * F.col("qty_after") <= 3 * F.col("qty_before"))
        )
        .select("warehouse", "p_brand", "qty_before", "qty_after")
        .orderBy("warehouse", "p_brand")
        .limit(100)
    )
