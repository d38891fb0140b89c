"""global_ntile_multi: fused exact NTILE over several total orders
(operators/rank.py) — must agree with global_ntile (and therefore with
SQL NTILE) on every metric, including ties broken by the key column,
descending orders, and N < k empty-bucket sizing."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.operators.rank import global_ntile, global_ntile_multi


def _frame(spark, rows):
    return spark.createDataFrame(rows, "id bigint, a bigint, b double")


def test_multi_matches_single_ntile_per_metric(spark):
    import random

    rnd = random.Random(42)
    rows = [(i, rnd.randint(0, 20), rnd.uniform(0, 5)) for i in range(157)]
    df = _frame(spark, rows)
    fused = global_ntile_multi(
        df,
        5,
        [
            ("na", [("a", True), ("id", True)]),
            ("nb", [("b", False), ("id", True)]),
        ],
    )
    ref = global_ntile(df, 5, ["a", "id"], "na")
    ref = global_ntile(ref, 5, [F.col("b").desc(), F.col("id")], "nb")
    got = {r["id"]: (r["na"], r["nb"]) for r in fused.collect()}
    want = {r["id"]: (r["na"], r["nb"]) for r in ref.collect()}
    assert got == want


def test_multi_bucket_sizes_follow_ntile_spec(spark):
    # N=13, k=5 -> q=2, r=3: buckets sized 3,3,3,2,2
    df = _frame(spark, [(i, i, 0.0) for i in range(13)])
    out = global_ntile_multi(df, 5, [("n", [("a", True), ("id", True)])])
    sizes = {r["n"]: r["c"] for r in out.groupBy("n").agg(F.count("*").alias("c")).collect()}
    assert sizes == {1: 3, 2: 3, 3: 3, 4: 2, 5: 2}


def test_multi_fewer_rows_than_buckets(spark):
    # N=3, k=5: ranks 1..3 -> buckets 1..3, buckets 4-5 empty
    df = _frame(spark, [(i, 10 - i, 0.0) for i in range(3)])
    out = global_ntile_multi(df, 5, [("n", [("a", True), ("id", True)])])
    assert sorted(r["n"] for r in out.collect()) == [1, 2, 3]


def test_multi_all_tied_metric_uses_tiebreak(spark):
    df = _frame(spark, [(i, 7, 0.0) for i in range(10)])
    out = global_ntile_multi(df, 5, [("n", [("a", True), ("id", True)])])
    got = {r["id"]: r["n"] for r in out.collect()}
    assert got == {i: i // 2 + 1 for i in range(10)}


def test_multi_returns_no_window_or_rank_in_main_plan(spark):
    df = _frame(spark, [(i, i % 9, float(i % 4)) for i in range(60)])
    out = global_ntile_multi(df, 4, [("n", [("a", True), ("id", True)])])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "Exchange" not in plan.replace("BroadcastExchange", "")
