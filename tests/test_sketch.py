"""KMV sketch tests (operators/sketch.py) + native HLL cross-check.

The KMV estimate must land within the theoretical error envelope
(~1/sqrt(k)) of the true distinct count, and the production path —
Spark's built-in approx_count_distinct HLL — must agree with both.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from my_flink_1_10_2_spark.operators.sketch import kmv_distinct, kmv_distinct_by
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet")


def test_kmv_within_error_envelope(spark, lineitem):
    true = lineitem.select("l_partkey").distinct().count()
    est = kmv_distinct(lineitem, "l_partkey", k=128).first().estimate
    assert abs(est - true) / true < 3.0 / (128 ** 0.5)  # 3σ ≈ 26%


def test_kmv_exact_below_k(spark):
    df = spark.range(50).select(F.col("id").alias("v"))
    est = kmv_distinct(df, "v", k=128).first().estimate
    assert est == 50.0


def test_kmv_grouped_matches_per_group_truth(spark, lineitem):
    truth = {
        r.l_returnflag: r.n
        for r in lineitem.groupBy("l_returnflag")
        .agg(F.countDistinct("l_suppkey").alias("n"))
        .collect()
    }
    ests = {
        r.l_returnflag: r.estimate
        for r in kmv_distinct_by(lineitem, ["l_returnflag"], "l_suppkey", k=64).collect()
    }
    assert set(ests) == set(truth)
    for flag, n in truth.items():
        assert abs(ests[flag] - n) / n < 3.0 / (64 ** 0.5)


def test_native_hll_agrees(spark, lineitem):
    """Production path: Spark's built-in HLL (approx_count_distinct) —
    the reference's APPROX_COUNT_DISTINCT analog — lands in the same
    envelope."""
    true = lineitem.select("l_partkey").distinct().count()
    hll = lineitem.agg(F.approx_count_distinct("l_partkey", rsd=0.05).alias("e")).first().e
    assert abs(hll - true) / true < 0.15


def test_kmv_prefilter_path_matches_one_pass(spark, monkeypatch):
    """Above the size gate the threshold-prefiltered sketch must produce
    bitwise the same estimate as the one-pass dedup (the k smallest
    distinct hashes are invariant under a filter that keeps them all);
    exercised by forcing the gate to zero."""
    import my_flink_1_10_2_spark.operators.sketch as sk

    df = spark.range(0, 20000).selectExpr("cast(id % 7919 as string) AS v")
    baseline = sk.kmv_distinct(df, "v", k=64).collect()[0].estimate
    monkeypatch.setattr(sk, "_PREFILTER_MIN_ROWS", 1)
    filtered = sk.kmv_distinct(df, "v", k=64).collect()[0].estimate
    assert filtered == baseline

    grouped = spark.range(0, 30000).selectExpr(
        "cast(id % 3 as string) AS g", "cast(id % 4999 as string) AS v"
    )
    monkeypatch.setattr(sk, "_PREFILTER_MIN_ROWS", 10**12)
    base_rows = {
        r.g: r.estimate for r in sk.kmv_distinct_by(grouped, ["g"], "v").collect()
    }
    monkeypatch.setattr(sk, "_PREFILTER_MIN_ROWS", 1)
    filt_rows = {
        r.g: r.estimate for r in sk.kmv_distinct_by(grouped, ["g"], "v").collect()
    }
    assert filt_rows == base_rows


def test_kmv_prefilter_retry_on_starvation(spark, monkeypatch):
    """A heavily-duplicated column defeats the row-count bound (first
    threshold starves the sketch) — the retry must widen and still land
    on the exact same estimate."""
    import my_flink_1_10_2_spark.operators.sketch as sk

    # 50k rows but only ~100 distinct values → duplication factor 500 ≫ 8
    df = spark.range(0, 50000).selectExpr("cast(id % 100 as string) AS v")
    baseline = sk.kmv_distinct(df, "v", k=64).collect()[0].estimate
    monkeypatch.setattr(sk, "_PREFILTER_MIN_ROWS", 1)
    filtered = sk.kmv_distinct(df, "v", k=64).collect()[0].estimate
    assert filtered == baseline


def test_cms_never_undercounts_and_is_tight(spark, lineitem):
    """CMS point estimates dominate the exact counts (one-sided error)
    and, at width 1024 >> #distinct suppliers, are exact for nearly all
    keys."""
    from my_flink_1_10_2_spark.operators.sketch import cms_build, cms_estimate

    cms = cms_build(lineitem, "l_suppkey", depth=4, width=1024)
    keys = lineitem.select(F.col("l_suppkey").alias("k")).distinct()
    est = {
        r.k: r.estimate
        for r in cms_estimate(cms, keys, "k", depth=4, width=1024).collect()
    }
    exact = {
        r.l_suppkey: r.n
        for r in lineitem.groupBy("l_suppkey").agg(F.count("*").alias("n")).collect()
    }
    assert set(est) == set(exact)
    assert all(est[k] >= exact[k] for k in exact)
    exact_frac = sum(est[k] == exact[k] for k in exact) / len(exact)
    assert exact_frac > 0.9, f"too many collisions: {exact_frac}"


def test_cms_absent_key_estimates_near_zero(spark, lineitem):
    """Keys never inserted get min-over-rows of collision mass only —
    bounded by 2N/width w.h.p.; with a left join the empty buckets
    coalesce to 0."""
    from my_flink_1_10_2_spark.operators.sketch import cms_build, cms_estimate

    n = lineitem.count()
    cms = cms_build(lineitem, "l_suppkey", depth=4, width=1024)
    missing = spark.range(10_000_000, 10_000_050).select(F.col("id").alias("k"))
    rows = cms_estimate(cms, missing, "k", depth=4, width=1024).collect()
    assert len(rows) == 50
    assert all(r.estimate <= 4 * n / 1024 for r in rows)


def test_cms_sketch_is_config_bounded(spark, lineitem):
    """The sketch relation never exceeds depth*width rows — the property
    that makes its unconditional broadcast scale-safe."""
    from my_flink_1_10_2_spark.operators.sketch import cms_build

    assert cms_build(lineitem, "l_suppkey", depth=4, width=64).count() <= 4 * 64


def test_hll_estimate_accuracy_and_merge(spark):
    """HLL estimator within the expected error band of the true distinct
    count, and register tables merge by max (sketch of a union =
    cell-wise max of sketches)."""
    from my_flink_1_10_2_spark.operators.sketch import hll_estimate, hll_registers
    from my_flink_1_10_2_spark.queries import read
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    events = read(spark, SF_DIR, "events")
    regs = hll_registers(events, ["event_type"], "user_id", b=6)
    est = {r.event_type: r.estimate
           for r in hll_estimate(regs, ["event_type"], b=6).collect()}
    true = {r.event_type: r.d
            for r in events.groupBy("event_type")
            .agg(F.countDistinct("user_id").alias("d")).collect()}
    for t, d in true.items():
        rel = abs(est[t] - d) / d
        assert rel < 0.35, f"{t}: est {est[t]:.1f} vs true {d} (rel {rel:.2f})"

    # mergeability: registers(union) == max-merge of per-half registers
    a = events.where("event_id % 2 = 0")
    b = events.where("event_id % 2 = 1")
    merged = (
        hll_registers(a, ["event_type"], "user_id", b=6)
        .unionByName(hll_registers(b, ["event_type"], "user_id", b=6))
        .groupBy("event_type", "bucket")
        .agg(F.max("register").alias("register"))
    )
    whole = hll_registers(events, ["event_type"], "user_id", b=6)
    assert merged.exceptAll(whole).count() == 0
    assert whole.exceptAll(merged).count() == 0


def test_hll_rejects_bad_precision(spark):
    import pytest

    from my_flink_1_10_2_spark.operators.sketch import hll_registers

    with pytest.raises(ValueError, match="b must be"):
        hll_registers(spark.range(1), [], "id", b=0)


def test_bloom_no_false_negatives_bounded_fp(spark):
    """Every present key probes true; false-positive rate among absent
    keys stays near the analytic bound."""
    from my_flink_1_10_2_spark.operators.sketch import bloom_build, bloom_probe
    from my_flink_1_10_2_spark.queries import read
    from tests.conftest import SF_DIR
    from pyspark.sql import functions as F

    orders = read(spark, SF_DIR, "orders").select(F.col("o_custkey").alias("v"))
    bloom = bloom_build(orders, "v", k_hashes=4, m_bits=8192)
    # probe every customer plus a synthetic definitely-absent key range
    probes = (
        read(spark, SF_DIR, "customer")
        .select("c_custkey")
        .unionByName(
            spark.range(10_000_000, 10_002_000).select(
                F.col("id").alias("c_custkey")
            )
        )
    )
    got = {r.c_custkey: r.maybe_present
           for r in bloom_probe(bloom, probes, "c_custkey", 4, 8192).collect()}
    present = {r.v for r in orders.distinct().collect()}
    absent = set(got) - present
    assert all(got[k] for k in present & set(got)), "false negative!"
    assert len(absent) >= 2000
    fp = sum(got[k] for k in absent) / len(absent)
    assert fp < 0.15, f"false-positive rate {fp:.3f} far above the bound"


# --- KMV set algebra -------------------------------------------------------


def test_kmv_set_ops_exact_when_under_k(spark):
    from my_flink_1_10_2_spark.operators.sketch import kmv_set_ops

    a = spark.createDataFrame([(i,) for i in range(20)], "v int")
    b = spark.createDataFrame([(i,) for i in range(10, 25)], "v int")
    r = kmv_set_ops(a, "v", b, "v", k=256).collect()[0]
    assert r["est_a"] == 20.0
    assert r["est_b"] == 15.0
    assert r["est_union"] == 25.0
    assert r["est_intersection"] == 10.0
    assert abs(r["jaccard"] - 10 / 25) < 1e-12


def test_kmv_set_ops_estimates_within_tolerance(spark):
    from my_flink_1_10_2_spark.operators.sketch import kmv_set_ops

    n = 2000
    a = spark.createDataFrame([(i,) for i in range(n)], "v int")
    b = spark.createDataFrame([(i,) for i in range(n // 2, n + n // 2)], "v int")
    r = kmv_set_ops(a, "v", b, "v", k=256).collect()[0]
    # KMV relative error ~ 1/sqrt(k-2) ≈ 6.3%; allow 4 sigma
    assert abs(r["est_a"] - n) / n < 0.25
    assert abs(r["est_union"] - 1.5 * n) / (1.5 * n) < 0.25
    assert abs(r["est_intersection"] - n / 2) / (n / 2) < 0.5
    assert 0.15 < r["jaccard"] < 0.55  # true 1/3


def test_kmv_set_ops_disjoint_and_identical(spark):
    from my_flink_1_10_2_spark.operators.sketch import kmv_set_ops

    a = spark.createDataFrame([(i,) for i in range(30)], "v int")
    b = spark.createDataFrame([(i,) for i in range(1000, 1030)], "v int")
    r = kmv_set_ops(a, "v", b, "v", k=128).collect()[0]
    assert r["est_intersection"] == 0.0 and r["jaccard"] == 0.0
    r = kmv_set_ops(a, "v", a, "v", k=128).collect()[0]
    assert r["jaccard"] == 1.0 and r["est_intersection"] == 30.0


def test_kmv_set_ops_never_joins_raw_relations(spark):
    """The plan must reduce each input to a k-row synopsis before any
    cross-sketch operation — no join node may consume a raw scan."""
    from my_flink_1_10_2_spark.operators.sketch import kmv_set_ops

    a = spark.range(1000).selectExpr("id AS v")
    b = spark.range(500, 1500).selectExpr("id AS v")
    plan = kmv_set_ops(a, "v", b, "v", k=64)._jdf.queryExecution().optimizedPlan().toString()
    # The only joins allowed are the two cross-combines of the 1-row
    # aggregate frames; no equi/theta join may touch the raw inputs.
    joins = [ln for ln in plan.splitlines() if "Join" in ln]
    assert len(joins) == 2 and all("Cross" in ln for ln in joins), joins
