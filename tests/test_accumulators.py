"""Accumulators (ref: flink-core accumulators/ — IntCounter, Histogram,
ListAccumulator, AverageAccumulator, extrema; RuntimeContext
.addAccumulator + AccumulatorHelper.toResultMap).  Adds happen on
executors inside shipped functions; the driver reads merged results
after the action — the reference's exact lifecycle.
"""

from __future__ import annotations

import pytest

from my_flink_1_10_2_spark.operators.accumulators import AccumulatorRegistry


def test_counters_from_executors(spark):
    reg = AccumulatorRegistry(spark.sparkContext)
    rows = reg.int_counter("rows")
    total = reg.double_counter("total")

    def work(it):
        for pdf in it:
            rows.add(len(pdf))
            total.add(float(pdf["v"].sum()))
            yield pdf

    df = spark.range(1000).toDF("v").repartition(8)
    df.mapInPandas(work, "v long").count()
    assert rows.get_local_value() == 1000
    assert total.get_local_value() == sum(range(1000))


def test_histogram_and_list(spark):
    reg = AccumulatorRegistry(spark.sparkContext)
    hist = reg.histogram("mod3")
    seen = reg.list_accumulator("partitions")

    def work(idx, it):
        n = 0
        for row in it:
            hist.add(row.id % 3)
            n += 1
        seen.add((idx, n))
        return iter(())

    spark.range(99).rdd.mapPartitionsWithIndex(work).count()
    assert reg.result_map()["mod3"] == {0: 33, 1: 33, 2: 33}
    assert sum(n for _, n in seen.get_local_value()) == 99


def test_average_and_extrema(spark):
    reg = AccumulatorRegistry(spark.sparkContext)
    avg = reg.average("avg")
    mx = reg.maximum("mx")
    mn = reg.minimum("mn")

    def work(it):
        for row in it:
            avg.add(row.id)
            mx.add(row.id)
            mn.add(row.id)
        return iter(())

    spark.range(1, 101).rdd.mapPartitions(work).count()
    assert avg.get_local_value() == pytest.approx(50.5)
    assert mx.get_local_value() == 100
    assert mn.get_local_value() == 1


def test_duplicate_name_rejected(spark):
    reg = AccumulatorRegistry(spark.sparkContext)
    reg.int_counter("x")
    with pytest.raises(ValueError, match="already registered"):
        reg.int_counter("x")
