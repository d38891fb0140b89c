"""Streaming harness tests (SURVEY §5 layer 3): replay the events table in
timestamp order as micro-batches (maxFilesPerTrigger=1) and assert the
streaming operators converge to the batch-computed truth.

This mirrors the reference's harness tests
(flink-table-planner-blink/.../runtime/harness/) where elements +
watermarks are scripted through a single operator.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

from tests.conftest import SF_DIR

EVENTS_SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("ts", TimestampType()),  # watermark requires LTZ (UTC session)
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
        StructField("props", StringType()),
    ]
)

N_BATCHES = 5


@pytest.fixture(scope="module")
def replay_dir(tmp_path_factory):
    """Split events (ts-sorted, ns→µs) into N part files = N micro-batches,
    plus a far-future sentinel row in the last batch so the final
    watermark passes every real window."""
    d = tmp_path_factory.mktemp("events_replay")
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    t = t.set_column(
        t.schema.get_field_index("ts"),
        "ts",
        pc.floor_temporal(t.column("ts").combine_chunks(), unit="microsecond").cast(
            pa.timestamp("us")
        ),
    )
    t = t.sort_by("ts")
    n = t.num_rows
    step = n // N_BATCHES + 1
    for i in range(N_BATCHES):
        chunk = t.slice(i * step, step)
        if i == N_BATCHES - 1:
            max_ts = pc.max(t.column("ts")).as_py()
            sentinel = pa.table(
                {
                    "event_id": pa.array([10**12], pa.int64()),
                    "ts": pa.array([max_ts + __import__("datetime").timedelta(days=30)], pa.timestamp("us")),
                    "user_id": pa.array([999999], pa.int64()),
                    "event_type": pa.array(["__sentinel__"], pa.string()),
                    "value": pa.array([0.0], pa.float64()),
                    "props": pa.array(["{}"], pa.string()),
                }
            )
            chunk = pa.concat_tables([chunk, sentinel])
        path = str(d / f"part-{i:03d}.parquet")
        pq.write_table(chunk, path)
        # pin strictly-increasing mtimes: the file source orders by
        # modification time, and under heavy load consecutive writes can
        # land in the same clock tick — equal mtimes make the replay
        # order arbitrary (observed as one whole batch going "late")
        os.utime(path, (1_600_000_000 + i, 1_600_000_000 + i))
    return str(d)


def _env(spark):
    from my_flink_1_10_2_spark.streaming import StreamExecutionEnvironment

    return StreamExecutionEnvironment(spark)


def _batch_events(spark):
    from my_flink_1_10_2_spark.catalog import read_table

    # LTZ to match the streaming side (watermarks require TIMESTAMP; the
    # UTC session makes NTZ->LTZ value-preserving)
    return read_table(spark, SF_DIR, "events").withColumn("ts", F.col("ts").cast("timestamp"))


def test_streaming_tumble_window_agg(spark, replay_dir):
    """Windowed agg with watermark, append mode: finalized windows match
    the batch computation exactly (ref: WindowOperator.java:100)."""
    env = _env(spark)
    stream = (
        # NB: no pre-agg sentinel filter — Catalyst would push it below the
        # watermark operator and the sentinel would never advance event time
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .with_watermark("ts", "10 minutes")
        .key_by("event_type")
        .tumble("ts", "1 hour")
        .aggregate(
            F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value")
        )
    )
    _, name = stream.to_memory_sink(output_mode="append")
    got = {
        (r.window_start, r.event_type): (r.cnt, round(r.sum_value, 4))
        for r in spark.table(name).collect()
        if r.event_type != "__sentinel__"
    }
    expected_rows = (
        _batch_events(spark)
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt", "sum_value")
        .collect()
    )
    expected = {
        (r.window_start, r.event_type): (r.cnt, round(r.sum_value, 4))
        for r in expected_rows
    }
    assert got == expected


def test_streaming_session_window(spark, replay_dir):
    """Session windows merge across micro-batches exactly as in batch
    (ref: MergingWindowSet.java / session_window)."""
    env = _env(spark)
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .with_watermark("ts", "10 minutes")
        .key_by("user_id")
        .session("ts", "30 minutes")
        .aggregate(F.count(F.lit(1)).alias("cnt"))
    )
    _, name = stream.to_memory_sink(output_mode="append")
    got = {
        (r.user_id, r.window_start, r.window_end): r.cnt
        for r in spark.table(name).collect()
        if r.user_id != 999999
    }
    expected = {
        (r.user_id, r["w"]["start"], r["w"]["end"]): r.cnt
        for r in _batch_events(spark)
        .groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected


def test_streaming_dedup_keep_first(spark, replay_dir):
    """Streaming keep-first dedup: first row per user in replay (=rowtime)
    order equals the batch keep-first operator
    (ref: DeduplicateKeepFirstRowFunction.java:34)."""
    from my_flink_1_10_2_spark.operators.rank import dedup_keep_first

    env = _env(spark)
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter("event_type <> '__sentinel__'")
        .drop_duplicates(["user_id"])
        .select("user_id", "event_id")
    )
    _, name = stream.to_memory_sink(output_mode="append")
    got = {(r.user_id, r.event_id) for r in spark.table(name).collect()}
    expected = {
        (r.user_id, r.event_id)
        for r in dedup_keep_first(
            _batch_events(spark), ["user_id"], [F.col("ts"), F.col("event_id")]
        )
        .select("user_id", "event_id")
        .collect()
    }
    assert got == expected


def test_streaming_interval_join(spark, replay_dir):
    """Stream-stream interval join matches the batch interval join
    (ref: TimeBoundedStreamJoin.java:52)."""
    env = _env(spark)
    clicks = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter("event_type = 'click'")
        .select(
            F.col("event_id").alias("click_id"),
            F.col("user_id"),
            F.col("ts").alias("cts"),
        )
        .with_watermark("cts", "10 minutes")
    )
    purchases = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter("event_type = 'purchase'")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user_id"),
            F.col("ts").alias("pts"),
        )
        .with_watermark("pts", "10 minutes")
    )
    joined = clicks.interval_join(
        purchases,
        key=("user_id", "p_user_id"),
        time=("cts", "pts"),
        lower="0 seconds",
        upper="30 minutes",
    ).select("click_id", "purchase_id")
    _, name = joined.to_memory_sink(output_mode="append")
    got = {(r.click_id, r.purchase_id) for r in spark.table(name).collect()}

    from my_flink_1_10_2_spark.queries import all_queries

    expected_df = all_queries()["q_interval_join"].spark_fn(spark, SF_DIR)
    expected = {(r.click_id, r.purchase_id) for r in expected_df.collect()}
    assert got == expected


def test_streaming_keyed_process_running_count(spark, replay_dir):
    """Keyed ProcessFunction with state (ref: KeyedProcessOperator.java):
    running per-user event count via applyInPandasWithState; the final
    emitted count per user equals the batch count."""
    import pandas as pd

    env = _env(spark)

    out_schema = StructType(
        [StructField("user_id", LongType()), StructField("running_cnt", LongType())]
    )
    state_schema = StructType([StructField("cnt", LongType())])

    def running_count(key, pdf_iter, state):
        total = state.get[0] if state.exists else 0
        for pdf in pdf_iter:
            total += len(pdf)
        state.update((total,))
        yield pd.DataFrame({"user_id": [key[0]], "running_cnt": [total]})

    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter("event_type <> '__sentinel__'")
        .key_by("user_id")
        .process(running_count, state_schema, out_schema)
    )
    _, name = stream.to_memory_sink(output_mode="append")
    # the max running count per user is the final state
    got = {
        (r.user_id, r.max_cnt)
        for r in spark.table(name)
        .groupBy("user_id")
        .agg(F.max("running_cnt").alias("max_cnt"))
        .collect()
    }
    expected = {
        (r.user_id, r.cnt)
        for r in _batch_events(spark)
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    assert got == expected


def test_streaming_lookup_join(spark, replay_dir):
    """Stream-static (lookup/dimension) join (ref: LookupJoinRunner.java):
    enrich events with a small dimension table, broadcast."""
    env = _env(spark)
    dim = spark.createDataFrame(
        [(i, f"user_{i}") for i in range(15)], "user_id long, user_name string"
    )
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter("event_type = 'signup'")
        .lookup_join(dim, "user_id")
        .select("event_id", "user_id", "user_name")
    )
    _, name = stream.to_memory_sink(output_mode="append")
    rows = spark.table(name).collect()
    assert len(rows) > 0
    assert all(r.user_name == f"user_{r.user_id}" for r in rows)


def test_streaming_changelog_flag(spark, replay_dir):
    """Update-mode running agg with the __change retraction convention
    (ref: BaseRow.java:40-47 ACC/RETRACT → upsert changelog)."""
    env = _env(spark)
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter("event_type <> '__sentinel__'")
        .key_by("event_type")
        .aggregate(F.count(F.lit(1)).alias("cnt"))
        .with_change_flag()
    )
    _, name = stream.to_memory_sink(output_mode="update")
    pdf = spark.table(name).toPandas()
    assert set(pdf["__change"]) == {"+U"}
    # last update per key equals batch truth
    final = pdf.groupby("event_type")["cnt"].max()
    expected = {
        r.event_type: r.cnt
        for r in _batch_events(spark).groupBy("event_type").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    for et, cnt in expected.items():
        assert final[et] == cnt, (et, final[et], cnt)


def test_streaming_cep_matches_batch_nfa(spark, replay_dir):
    """Streaming MATCH_RECOGNIZE (tail-buffered NFA across micro-batches)
    must find exactly the matches the batch NFA finds on the same data
    (SKIP TO NEXT ROW, fixed-length pattern ⇒ tail of len-1 rows cannot
    double-emit)."""
    from my_flink_1_10_2_spark.operators.cep import (
        Pattern,
        match_recognize,
        match_recognize_stream,
    )

    pattern = (
        Pattern.begin("a", lambda r, c: True)
        .next("b", lambda r, c: r["value"] < c["a"][-1]["value"])
        .next("c", lambda r, c: r["value"] > c["b"][-1]["value"])
    )
    measures = {
        "user_id": lambda m: int(m["a"][0]["user_id"]),
        "start_id": lambda m: int(m["a"][0]["event_id"]),
        "a_val": lambda m: float(m["a"][0]["value"]),
    }
    out_schema = "user_id long, start_id long, a_val double"

    env = _env(spark)
    stream = env.from_files(replay_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
    cols = ["user_id", "event_id", "ts", "value"]
    result = match_recognize_stream(
        stream.df.where(F.col("event_type") != "__sentinel__").select(*cols),
        partition_by=["user_id"],
        ts_col="ts",
        pattern=pattern,
        measures=measures,
        output_schema=out_schema,
        max_pattern_rows=3,
        after_match="skip_to_next_row",
    )
    q = (
        result.writeStream.format("memory")
        .queryName("cep_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(
        (r.user_id, r.start_id) for r in spark.table("cep_stream").collect()
    )

    batch = match_recognize(
        _batch_events(spark).select(*cols),
        partition_by=["user_id"],
        order_by=["ts", "event_id"],
        pattern=pattern,
        measures=measures,
        output_schema=out_schema,
        after_match="skip_to_next_row",
    )
    want = sorted((r.user_id, r.start_id) for r in batch.collect())
    assert got == want


def test_connected_streams_co_process(spark, replay_dir):
    """ConnectedStreams: two tagged inputs through one keyed stateful
    co-process with shared state (ref: ConnectedStreams.java:1,
    CoProcessFunction). Final per-user counts of each side must equal the
    batch truth."""
    import pandas as pd

    env = _env(spark)
    base = env.from_files(replay_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
    clicks = base.filter(F.col("event_type") == "click")
    purchases = base.filter(F.col("event_type") == "purchase")

    def co_count(key, pdf_iter, state):
        c1, c2 = state.get if state.exists else (0, 0)
        for pdf in pdf_iter:
            c1 += int((pdf["__side"] == 0).sum())
            c2 += int((pdf["__side"] == 1).sum())
        state.update((c1, c2))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_clicks": [c1], "n_purchases": [c2]}
        )

    result = (
        clicks.connect(purchases)
        .key_by("user_id")
        .process(
            co_count,
            state_schema="c1 long, c2 long",
            output_schema="user_id long, n_clicks long, n_purchases long",
        )
    )
    q = (
        result.df.writeStream.format("memory")
        .queryName("co_counts")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    # last emission per user = final running counts
    final = (
        spark.table("co_counts")
        .groupBy("user_id")
        .agg(F.max("n_clicks").alias("n_clicks"), F.max("n_purchases").alias("n_purchases"))
    )
    got = {r.user_id: (r.n_clicks, r.n_purchases) for r in final.collect()}

    batch = _batch_events(spark)
    want_c = {r.user_id: r.c for r in batch.where("event_type = 'click'").groupBy("user_id").agg(F.count("*").alias("c")).collect()}
    want_p = {r.user_id: r.c for r in batch.where("event_type = 'purchase'").groupBy("user_id").agg(F.count("*").alias("c")).collect()}
    for uid, (nc, np_) in got.items():
        assert nc == want_c.get(uid, 0), uid
        assert np_ == want_p.get(uid, 0), uid
    assert set(got) == set(want_c) | set(want_p)


def test_streaming_top_n_converges_to_batch(spark, replay_dir):
    """Streaming incremental Top-N (ref: AppendOnlyTopNFunction.java):
    the latest emitted snapshot per user must equal the batch top-3 by
    value."""
    env = _env(spark)
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
        .filter(F.col("event_type") != "__sentinel__")
        .select("user_id", "event_id", "value")
    )
    result = stream.key_by("user_id").top_n(3, "value", desc=True)
    q = (
        result.df.withColumn("batch_id", F.lit(None).cast("long"))
        .writeStream.format("memory")
        .queryName("topn_stream")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    from pyspark.sql import Window as W

    emitted = spark.table("topn_stream")
    # keep each user's final snapshot: rows from the last emission —
    # identified as the set with the maximal per-user top-1 coverage:
    # simpler: recompute per user the best-3 values ever emitted; the
    # final snapshot must contain exactly the true top-3.
    want = (
        _batch_events(spark)
        .select("user_id", "event_id", "value")
        .withColumn(
            "rank",
            F.row_number().over(
                W.partitionBy("user_id").orderBy(F.col("value").desc(), "event_id")
            ),
        )
        .where("rank <= 3")
    )
    want_sets = {}
    for r in want.collect():
        want_sets.setdefault(r.user_id, set()).add(round(r.value, 6))
    got_sets = {}
    for r in emitted.collect():
        got_sets.setdefault(r.user_id, set()).add(round(r.value, 6))
    # every true top-3 value must have been emitted in some snapshot
    for uid, vals in want_sets.items():
        assert vals <= got_sets.get(uid, set()), uid


def test_streaming_running_sum_matches_batch_over(spark, replay_dir):
    """Streaming OVER (ROWS UNBOUNDED PRECEDING running sum, ref:
    AbstractRowTimeUnboundedPrecedingOver.java): per-row running values
    must equal the batch window function on the same ordered input."""
    from pyspark.sql import Window as W

    env = _env(spark)
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA, max_files_per_trigger=1)
        .filter(F.col("event_type") != "__sentinel__")
        .select("user_id", "event_id", "ts", "value")
    )
    result = stream.key_by("user_id").running_agg("value", "ts", how="sum")
    q = (
        result.df.writeStream.format("memory")
        .queryName("running_sum")
        .outputMode("append")
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {r.event_id: r.running_sum for r in spark.table("running_sum").collect()}

    want_df = (
        _batch_events(spark)
        .select("user_id", "event_id", "ts", "value")
        .withColumn(
            "running_sum",
            F.sum("value").over(
                W.partitionBy("user_id")
                .orderBy("ts", "event_id")
                .rowsBetween(W.unboundedPreceding, W.currentRow)
            ),
        )
    )
    want = {r.event_id: r.running_sum for r in want_df.collect()}
    assert len(got) == len(want)
    import math
    mism = [k for k in want if not math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-6)]
    assert not mism, f"{len(mism)} mismatching running sums, e.g. {mism[:3]}"


@pytest.fixture(scope="module")
def shuffled_replay_dir(tmp_path_factory):
    """Out-of-order replay: rows dealt round-robin by event_id into 4
    files, so later batches carry earlier timestamps (late data)."""
    d = tmp_path_factory.mktemp("events_shuffled")
    t = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    t = t.set_column(
        t.schema.get_field_index("ts"), "ts",
        pc.floor_temporal(t.column("ts").combine_chunks(), unit="microsecond").cast(pa.timestamp("us")),
    )
    for i in range(4):
        mask = pc.equal(pc.bit_wise_and(t.column("event_id").combine_chunks(), 3), i)
        path = str(d / f"part-{i:03d}.parquet")
        pq.write_table(t.filter(mask), path)
        os.utime(path, (1_600_000_000 + i, 1_600_000_000 + i))  # pinned order
    return str(d)


def test_late_data_side_output(spark, shuffled_replay_dir):
    """allowedLateness analog: on_time ∪ late = everything; every late
    row is genuinely behind the high-water mark by > the allowance."""
    env = _env(spark)
    stream = env.from_files(shuffled_replay_dir, EVENTS_SCHEMA, max_files_per_trigger=1)

    on_time_ids, late_rows = [], []
    seen_hwm = []

    def on_time(df, bid):
        on_time_ids.extend(r.event_id for r in df.select("event_id").collect())

    def late(df, bid):
        late_rows.extend((r.event_id, r.ts) for r in df.select("event_id", "ts").collect())

    stream.for_each_batch_with_late_split(
        "ts", allowed_lateness_seconds=3600, on_time_fn=on_time, late_fn=late
    )

    total = spark.read.schema(EVENTS_SCHEMA).parquet(shuffled_replay_dir).count()
    assert len(on_time_ids) + len(late_rows) == total
    assert late_rows, "shuffled replay should produce late rows"
    # batch 0 (event_id % 4 == 0) spans the whole month, so it can never
    # be late; late rows must all come from later batches
    assert all(eid % 4 != 0 for eid, _ts in late_rows)
    assert len(on_time_ids) >= total / 4


def test_broadcast_connected_stream(spark, replay_dir, tmp_path):
    """Broadcast-state pattern (ref: BroadcastConnectedStream.java):
    every data batch sees the latest folded control state."""
    import json

    env = _env(spark)
    stream = env.from_files(replay_dir, EVENTS_SCHEMA, max_files_per_trigger=1)

    # control table: per-event-type multiplier (static here; the fold
    # would merge new control rows if the control side streamed)
    control = spark.createDataFrame(
        [("click", 1.0), ("purchase", 10.0)], "event_type string, weight double"
    )

    def fold(state, ctrl_df):
        state = dict(state)
        for r in ctrl_df.collect():
            state[r.event_type] = r.weight
        return state

    weighted_counts = []

    def process(batch_df, bstate, batch_id):
        rows = batch_df.groupBy("event_type").count().collect()
        total = sum(bstate.get(r.event_type, 0.0) * r["count"] for r in rows)
        weighted_counts.append(total)

    stream.connect_broadcast(control, fold).process(process)

    batch = _batch_events(spark)
    want = (
        batch.where("event_type = 'click'").count() * 1.0
        + batch.where("event_type = 'purchase'").count() * 10.0
    )
    assert abs(sum(weighted_counts) - want) < 1e-6


def test_queryable_state(spark, replay_dir):
    """Queryable-state substitute (ref: KeyedStream.asQueryableState:1005):
    point lookups against the latest per-key streaming aggregate match
    the batch aggregate once the stream drains."""
    env = _env(spark)
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter("event_type <> '__sentinel__'")
        .key_by("user_id")
    )
    handle = stream.as_queryable_state(
        "qstate_counts", F.count("*").alias("cnt"), F.sum("value").alias("total")
    )
    try:
        handle.query.processAllAvailable()
        batch = (
            _batch_events(spark)
            .groupBy("user_id")
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("total"))
            .collect()
        )
        expected = {r.user_id: (r.cnt, float(r.total)) for r in batch}
        assert handle.snapshot().count() == len(expected)
        some = sorted(expected)[:5]
        for uid in some:
            row = handle.get(uid)
            assert row is not None
            assert row.cnt == expected[uid][0]
            assert float(row.total) == pytest.approx(expected[uid][1])
        assert handle.get(-12345) is None
    finally:
        handle.stop()


def test_streaming_count_window_matches_batch(spark, replay_dir):
    """Streaming count windows (ref: KeyedStream.countWindow:643): the
    completed windows emitted across micro-batches equal the batch
    row_number bucketing restricted to full windows."""
    from my_flink_1_10_2_spark.operators.windows import count_tumble_window

    env = _env(spark)
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter("event_type <> '__sentinel__'")
        .key_by("user_id")
        .count_window(5, value_col="value", ts_col="ts")
    )
    _, name = stream.to_memory_sink(output_mode="append")
    got = spark.table(name).collect()
    batch = count_tumble_window(
        _batch_events(spark), ["user_id"], ["ts", "event_id"], 5
    )
    want = (
        batch.groupBy("user_id", "w_id")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .where(F.col("cnt") == 5)
        .collect()
    )
    want_map = {(r.user_id, r.w_id): (r.cnt, r.sum_value) for r in want}
    got_map = {(r.user_id, r.w_id): (r.cnt, r.sum_value) for r in got}
    assert set(got_map) == set(want_map)
    for k, (cnt, sv) in want_map.items():
        assert got_map[k][0] == cnt
        assert got_map[k][1] == pytest.approx(sv)


def test_streaming_tumble_all_window(spark, replay_dir):
    """Non-keyed windowAll aggregate (ref: DataStream.timeWindowAll:579,
    AllWindowedStream.java:1): finalized global windows match batch."""
    env = _env(spark)
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .with_watermark("ts", "10 minutes")
        .tumble_all("ts", "1 hour")
        .aggregate(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
    )
    _, name = stream.to_memory_sink(output_mode="append")
    batch = (
        _batch_events(spark)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("value").alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "cnt", "sum_value")
        .collect()
    )
    expected = {r.window_start: (r.cnt, round(r.sum_value, 4)) for r in batch}
    max_real = max(expected)
    got = {
        r.window_start: (r.cnt, round(r.sum_value, 4))
        for r in spark.table(name).collect()
        if r.window_start <= max_real  # drop the far-future sentinel window
    }
    assert got == expected


def test_count_window_all(spark, replay_dir):
    """Non-keyed count window (ref: DataStream.countWindowAll:612): one
    serial counter over the whole stream; sizes and totals match batch."""
    env = _env(spark)
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter(F.col("event_type") != "__sentinel__")
        .count_window_all(500, "value", "ts")
    )
    _, name = stream.to_memory_sink(output_mode="append")
    rows = spark.table(name).orderBy("w_id").collect()
    n_events = _batch_events(spark).count()
    assert [r.cnt for r in rows] == [500] * (n_events // 500)
    assert set(rows[0].asDict()) == {"w_id", "cnt", "sum_value"}  # key dropped


def test_punctuated_watermarks(spark, replay_dir):
    """Punctuated watermark harness (ref:
    AssignerWithPunctuatedWatermarks.java): only marker rows advance
    event time; rows at or before the last announced watermark are side-
    output as late."""
    env = _env(spark)
    # markers: 'signup' events announce their own ts as the watermark
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter(F.col("event_type") != "__sentinel__")
        .select(
            "*",
            F.when(F.col("event_type") == "signup", F.col("ts")).alias("__wm"),
        )
    )
    seen, late = [], []
    stream.for_each_batch_with_punctuated_watermarks(
        "__wm",
        "ts",
        lambda df, bid: seen.extend(df.collect()),
        lambda df, bid: late.extend(df.collect()),
    )
    total = _batch_events(spark).count()
    assert len(seen) + len(late) == total
    # replay is globally ts-sorted, so nothing is genuinely late: each
    # batch's rows all follow the previous batch's highest marker
    assert len(late) == 0
    # now re-run with one batch replayed out of order to force lateness:
    # a marker in batch k makes batch k+1's older rows late only if the
    # stream regresses — simulate by announcing max ts from batch 0
    seen2, late2 = [], []
    s2 = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter(F.col("event_type") != "__sentinel__")
        .select("*", F.lit("2200-01-01 00:00:00").cast("timestamp").alias("__wm"))
    )
    s2.for_each_batch_with_punctuated_watermarks(
        "__wm",
        "ts",
        lambda df, bid: seen2.extend(df.collect()),
        lambda df, bid: late2.extend(df.collect()),
    )
    # the far-future watermark announced in batch 0 makes every later
    # batch late; batch 0 itself was on time
    assert len(seen2) + len(late2) == total
    assert len(late2) > 0 and len(seen2) > 0


def test_punctuated_assigner_class_api(spark, replay_dir):
    """The reference's CLASS API shape (extractTimestamp +
    checkAndGetNextWatermark as overridable methods) must produce the
    identical split as the column-level harness it lowers onto."""
    from my_flink_1_10_2_spark.streaming.stream import (
        AssignerWithPunctuatedWatermarks,
    )

    class SignupMarkers(AssignerWithPunctuatedWatermarks):
        def extract_timestamp(self, df):
            return F.col("ts")

        def check_and_get_next_watermark(self, df, ts):
            return F.when(F.col("event_type") == "signup", ts)

    env = _env(spark)
    stream = env.from_files(replay_dir, EVENTS_SCHEMA).filter(
        F.col("event_type") != "__sentinel__"
    )
    seen, late = [], []
    stream.assign_punctuated(
        SignupMarkers(),
        lambda df, bid: seen.extend(df.collect()),
        lambda df, bid: late.extend(df.collect()),
    )
    total = _batch_events(spark).count()
    assert len(seen) + len(late) == total
    assert len(late) == 0  # ts-sorted replay: markers never regress
    # base class methods are abstract
    base = AssignerWithPunctuatedWatermarks()
    with pytest.raises(NotImplementedError):
        base.extract_timestamp(stream.df)
    with pytest.raises(NotImplementedError):
        base.check_and_get_next_watermark(stream.df, F.col("ts"))


def test_upsert_materialize_semantics(spark):
    """UpsertStreamTableSink semantics: latest message per key wins and a
    trailing delete removes the key (ref: UpsertStreamTableSink.java)."""
    from my_flink_1_10_2_spark.operators.upsert import (
        apply_upsert_batch,
        upsert_materialize,
    )

    log = spark.createDataFrame(
        [
            (1, 10, "U", "a"),
            (1, 20, "U", "b"),   # key 1 → latest upsert "b"
            (2, 10, "U", "c"),
            (2, 30, "D", None),  # key 2 → deleted
            (3, 5, "D", None),
            (3, 6, "U", "d"),    # delete then re-insert → present
        ],
        "k int, v int, op string, payload string",
    )
    snap = {
        r["k"]: r["payload"]
        for r in upsert_materialize(log, ["k"], "v").collect()
    }
    assert snap == {1: "b", 3: "d"}

    # incremental application batch-by-batch (each batch has at most one
    # message per key) reaches the same snapshot
    state = spark.createDataFrame([], "k int, v int, payload string")
    for cond in ["v <= 5", "v > 5 AND v <= 10", "v > 10"]:
        state = apply_upsert_batch(state, log.where(cond), ["k"])
    got = {r["k"]: r["payload"] for r in state.collect()}
    assert got == {1: "b", 3: "d"}


def test_streaming_count_window_slide_matches_batch(spark, replay_dir):
    """Sliding count window (ref: KeyedStream.countWindow(size, slide)
    KeyedStream.java:653): per-key firings every 2 records over the last
    5 match the batch frame formulation — including early partial
    windows — when replay order equals event-time order."""
    from my_flink_1_10_2_spark.operators.windows import count_slide_window

    env = _env(spark)
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter("event_type <> '__sentinel__'")
        .key_by("user_id")
        .count_window_slide(5, 2, value_col="value", ts_col="ts")
    )
    _, name = stream.to_memory_sink(output_mode="append")
    got = {
        (r.user_id, r.fire_seq): (r.cnt, round(r.sum_value, 4))
        for r in spark.table(name).collect()
    }
    batch = count_slide_window(
        _batch_events(spark), ["user_id"], ["ts", "event_id"], 5, 2, "value"
    )
    want = {
        (r.user_id, r.fire_seq): (r.cnt, round(r.sum_value, 4))
        for r in batch.collect()
    }
    assert got == want


def test_table_diff_roundtrip_with_upsert(spark):
    """table_diff ∘ apply = identity: applying the derived changelog to
    the old snapshot reproduces the new snapshot exactly."""
    from my_flink_1_10_2_spark.operators.upsert import apply_upsert_batch, table_diff

    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "k int, payload string"
    )
    new = spark.createDataFrame(
        [(2, "b"), (3, "C"), (4, "d")], "k int, payload string"
    )
    diff = table_diff(old, new, ["k"])
    got = {(r["k"], r["op"]) for r in diff.collect()}
    assert got == {(1, "D"), (3, "U"), (4, "I")}
    batch = diff.select(
        "k", F.col("new_payload").alias("payload"), "op"
    )
    rebuilt = apply_upsert_batch(old, batch, ["k"])
    assert {(r["k"], r["payload"]) for r in rebuilt.collect()} == {
        (2, "b"), (3, "C"), (4, "d")
    }


def test_upsert_null_op_fails_fast(spark):
    """NULL op messages must raise, not silently vanish through the
    op != 'D' filter (NULL-comparison semantics)."""
    import pytest as _pytest

    from my_flink_1_10_2_spark.operators.upsert import upsert_materialize

    log = spark.createDataFrame(
        [(1, 1, "U", "a"), (1, 2, None, "b")], "k int, v int, op string, p string"
    )
    with _pytest.raises(Exception, match="NULL 'op'"):
        upsert_materialize(log, ["k"], "v").collect()


def test_checkpoint_restart_resumes_exactly_once(spark, tmp_path):
    """Kill a streaming query mid-replay, restart it with the SAME
    checkpoint: the restarted query must resume at the next unprocessed
    file (no reprocessing, no loss) — the checkpoint/exactly-once
    contract (ref: CheckpointCoordinator.java semantics on Spark's
    offset-log/commit-log WAL)."""
    import glob
    import os
    import time

    from pyspark.sql import functions as F

    # 6 single-row files with strictly increasing mtimes
    replay = tmp_path / "replay"
    os.makedirs(replay)
    base = time.time() - 3600
    for i in range(6):
        stage = str(tmp_path / f"stage{i}")
        spark.createDataFrame([(i,)], "v long").coalesce(1).write.mode(
            "overwrite"
        ).parquet(stage)
        (part,) = glob.glob(f"{stage}/part-*.parquet")
        dst = str(replay / f"part-{i:03d}.parquet")
        os.replace(part, dst)
        os.utime(dst, (base + i, base + i))

    from my_flink_1_10_2_spark.sources.streaming import (
        TransactionalForeachBatchSink,
    )

    seen: list[tuple[int, list[int]]] = []
    out_dir = str(tmp_path / "out")
    os.makedirs(out_dir)

    def write_fn(batch_df, batch_id):
        batch_df.write.mode("overwrite").parquet(f"{out_dir}/b{batch_id:03d}")

    txn = TransactionalForeachBatchSink(write_fn, str(tmp_path / "manifest"))

    def make_sink(stop_after: int | None, handle: dict):
        def sink(batch_df, batch_id):
            seen.append((batch_id, [r.v for r in batch_df.collect()]))
            txn(batch_df, batch_id)  # manifest-guarded: replays are skipped
            if stop_after is not None and len(seen) >= stop_after:
                handle["q"].stop()

        return sink

    def run(stop_after=None):
        handle: dict = {}
        q = (
            spark.readStream.schema("v long")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(replay))
            .writeStream.foreachBatch(make_sink(stop_after, handle))
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        handle["q"] = q
        try:
            q.awaitTermination(120)
        except Exception:
            pass  # stop() mid-batch surfaces as a benign stream-stopped error

    run(stop_after=2)  # crash after 2 micro-batches
    assert len(seen) >= 2
    run(stop_after=None)  # restart from the same checkpoint

    # the source WAL resumes (no rewind to zero) but MAY replay the
    # in-flight batch — Spark's documented at-least-once foreachBatch
    # delivery on recovery...
    bids = [b for b, _ in seen]
    assert bids == sorted(bids), f"restart rewound the source: {seen}"
    assert all(v for _b, v in seen), "an input batch was lost"
    # ...and the transactional sink turns that into exactly-once output
    persisted = sorted(
        r.v for r in spark.read.parquet(f"{out_dir}/b*").collect()
    )
    assert persisted == list(range(6)), f"sink not exactly-once: {persisted}"


def test_queryable_state_external_server(spark, replay_dir):
    """Out-of-process queryable state (ref: flink-queryable-state
    KvStateServerImpl/QueryableStateClient): a separate client process
    (urllib over a real TCP socket here) point-queries the running
    job's keyed state by name + key, gets snapshots, and sees clean
    errors for unknown states/keys."""
    import json
    from urllib.error import HTTPError
    from urllib.request import urlopen

    from my_flink_1_10_2_spark.streaming.qs_server import QueryableStateServer

    env = _env(spark)
    stream = (
        env.from_files(replay_dir, EVENTS_SCHEMA)
        .filter("event_type <> '__sentinel__'")
        .key_by("user_id")
    )
    handle = stream.as_queryable_state(
        "qs_net_counts", F.count("*").alias("cnt"), F.sum("value").alias("total")
    )
    server = QueryableStateServer()
    server.register(handle)
    port = server.start()
    try:
        handle.query.processAllAvailable()
        expected = {
            r.user_id: r.cnt
            for r in _batch_events(spark)
            .groupBy("user_id")
            .agg(F.count("*").alias("cnt"))
            .collect()
        }
        base = f"http://127.0.0.1:{port}"
        health = json.load(urlopen(f"{base}/health"))
        assert health["states"] == ["qs_net_counts"]
        uid = sorted(expected)[0]
        row = json.load(urlopen(f"{base}/state/qs_net_counts?user_id={uid}"))
        assert row["cnt"] == expected[uid]
        snapshot = json.load(urlopen(f"{base}/state/qs_net_counts"))
        assert len(snapshot) == len(expected)
        for bad, code in [
            (f"{base}/state/nope", 404),
            (f"{base}/state/qs_net_counts?user_id=-1", 404),
            (f"{base}/state/qs_net_counts?bogus_col=1", 400),
        ]:
            try:
                urlopen(bad)
                raise AssertionError(f"{bad} should have failed")
            except HTTPError as e:
                assert e.code == code
    finally:
        server.stop()
        handle.stop()
