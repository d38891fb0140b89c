"""Invariant tests for the second pipeline batch — properties the SQL
oracle can't express (cross-run stability, partition/permutation laws)."""

from __future__ import annotations

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.llm.sampling import split_assign
from my_flink_1_10_2_spark.operators.index import zip_with_index, zip_with_unique_id
from my_flink_1_10_2_spark.queries import all_queries, read
from tests.conftest import SF_DIR

QUERIES = all_queries()


def test_split_assign_partitions_corpus_exactly(spark):
    docs = read(spark, SF_DIR, "documents")
    split = split_assign(docs, "doc_id")
    counts = {r["split"]: r["n"] for r in
              split.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "valid", "test"}
    assert sum(counts.values()) == docs.count()
    # membership is a pure function of the key: two runs agree row-for-row
    a = {r.doc_id: r.split for r in split.select("doc_id", "split").collect()}
    b = {r.doc_id: r.split for r in
         split_assign(docs, "doc_id").select("doc_id", "split").collect()}
    assert a == b


def test_sequence_packing_conserves_tokens_and_orders_windows(spark):
    out = QUERIES["q_sequence_packing"].spark_fn(spark, SF_DIR).collect()
    docs = read(spark, SF_DIR, "documents")
    total_tokens = docs.select(
        F.sum(F.size(F.split("text", r"\s+"))).alias("t")
    ).collect()[0]["t"]
    assert sum(r.n_tokens for r in out) == total_tokens
    by_shard: dict[int, list] = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.window_id)
        # windows are contiguous from 0 and doc ranges never interleave
        assert rows[0].window_id == 0
        assert [r.window_id for r in rows] == list(range(len(rows)))
        for prev, cur in zip(rows, rows[1:]):
            assert prev.last_doc < cur.first_doc


def test_zip_with_index_is_an_ordered_permutation(spark):
    docs = read(spark, SF_DIR, "documents").select("doc_id")
    rows = zip_with_index(docs, "doc_id").collect()
    n = len(rows)
    assert sorted(r.idx for r in rows) == list(range(n))
    by_key = sorted(rows, key=lambda r: r.doc_id)
    assert [r.idx for r in by_key] == list(range(n))


def test_zip_with_unique_id_is_unique(spark):
    docs = read(spark, SF_DIR, "documents").select("doc_id")
    rows = zip_with_unique_id(docs).collect()
    assert len({r.uid for r in rows}) == len(rows)


def test_contamination_bounded_by_train_counts(spark):
    out = QUERIES["q_contamination_check"].spark_fn(spark, SF_DIR).collect()
    assert out, "expected per-source rows"
    for r in out:
        assert 0 <= r.n_contaminated <= r.n_train
        assert abs(r.contam_rate - round(r.n_contaminated / r.n_train, 4)) < 1e-9


def test_pii_pseudonymize_suppresses_small_groups(spark):
    out = QUERIES["q_pii_pseudonymize"].spark_fn(spark, SF_DIR).collect()
    assert out
    for r in out:
        assert r.n_events >= 70  # k-anonymity threshold
        assert len(r.pseudo_id) == 64 and set(r.pseudo_id) <= set("0123456789abcdef")


def test_profile_table_null_and_ndv_semantics(spark):
    """NULLs counted in n_nulls, excluded from n_distinct (ndv), min/max
    rendered as strings (ref: CatalogColumnStatisticsData holders)."""
    from my_flink_1_10_2_spark.operators.profile import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, None), (2, "b"), (None, "a")], "x int, s string"
    )
    out = {r["col_name"]: r for r in profile_table(df).collect()}
    assert out["x"]["n_rows"] == 4 and out["x"]["n_nulls"] == 1
    assert out["x"]["n_distinct"] == 2
    assert out["x"]["min_value"] == "1" and out["x"]["max_value"] == "2"
    assert out["s"]["n_nulls"] == 1 and out["s"]["n_distinct"] == 2


def test_safe_union_widening_and_nulls(spark):
    from my_flink_1_10_2_spark.operators.schema_evolution import safe_union
    import pytest as _pytest

    a = spark.createDataFrame([(1, 10)], "k int, v int")
    b = spark.createDataFrame([(2, 2.5, "x")], "k bigint, v double, extra string")
    out = safe_union(a, b)
    assert [f.dataType.simpleString() for f in out.schema.fields] == [
        "bigint", "double", "string",
    ]
    rows = {r["k"]: (r["v"], r["extra"]) for r in out.collect()}
    assert rows == {1: (10.0, None), 2: (2.5, "x")}
    # incompatible non-numeric conflict raises, no silent stringification
    c = spark.createDataFrame([("s",)], "v string")
    with _pytest.raises(ValueError):
        safe_union(a, c)


def test_global_rank_matches_row_number_no_single_partition(spark):
    from my_flink_1_10_2_spark.operators.rank import global_rank
    from pyspark.sql import Window, functions as F

    df = spark.range(0, 5000).withColumn("v", (F.col("id") * 37) % 1009)
    got = global_rank(df, [F.col("v").desc(), F.col("id")], "rk")
    want = df.withColumn(
        "rk",
        F.row_number()
        .over(Window.orderBy(F.col("v").desc(), F.col("id")))
        .cast("bigint"),
    )
    assert got.orderBy("rk").collect() == want.orderBy("rk").collect()
    txt = got._jdf.queryExecution().executedPlan().toString()
    # the row-data window runs partition-local inside the checkpointed
    # stage; the visible plan must have NO single-partition window and
    # (since round 12) NO join at all — the prefix offsets are folded on
    # the driver and attached as a pid-indexed array literal, so the
    # returned plan is a pure projection over the checkpoint scan
    from my_flink_1_10_2_spark import plans

    assert plans.single_partition_windows(got) == []
    assert "BroadcastNestedLoopJoin" not in txt
    assert "Join" not in txt, txt


def test_compaction_collapses_files_preserves_rows(spark, tmp_path):
    from my_flink_1_10_2_spark.operators.compaction import compact_parquet_dir
    import glob

    from pyspark.sql import functions as F

    df = spark.range(0, 20000).withColumn("v", F.col("id") % 97)
    frag = str(tmp_path / "frag")
    df.repartition(50).write.parquet(frag)
    assert len(glob.glob(f"{frag}/part-*.parquet")) == 50
    out_dir = str(tmp_path / "out")
    out = compact_parquet_dir(spark, frag, out_dir, sort_within_by=["id"])
    assert len(glob.glob(f"{out_dir}/part-*.parquet")) == 1  # tiny data → 1 file
    assert out.count() == 20000
    assert out.agg(F.sum("v")).first()[0] == df.agg(F.sum("v")).first()[0]


def test_compaction_guards(spark, tmp_path):
    """Loud failures instead of silent degradation: in-place overwrite,
    missing source, and parquet-free source all raise."""
    import pytest

    from pyspark.sql import functions as F
    from my_flink_1_10_2_spark.operators.compaction import compact_parquet_dir

    frag = str(tmp_path / "frag")
    spark.range(0, 100).withColumn("v", F.col("id")).write.parquet(frag)
    with pytest.raises(ValueError, match="dst_dir must differ"):
        compact_parquet_dir(spark, frag, frag)
    with pytest.raises(FileNotFoundError, match="does not exist"):
        compact_parquet_dir(spark, str(tmp_path / "nope"), str(tmp_path / "o1"))
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no .parquet files"):
        compact_parquet_dir(spark, str(empty), str(tmp_path / "o2"))


def test_global_ntile_matches_sql_ntile_all_remainders(spark):
    """global_ntile's closed-form integer bucketing must equal SQL NTILE
    for every N mod k shape (uneven buckets, N < k, exact multiples)."""
    from pyspark.sql import Window, functions as F

    from my_flink_1_10_2_spark.operators.rank import global_ntile

    for n, k in [(1, 4), (3, 4), (12, 4), (97, 5), (1000, 7)]:
        df = spark.range(0, n).withColumn("v", (F.col("id") * 37) % 101)
        want = {
            r.id: r.b
            for r in df.withColumn(
                "b", F.ntile(k).over(Window.orderBy("v", "id"))
            ).collect()
        }
        got = {
            r.id: r.b
            for r in global_ntile(df, k, ["v", "id"], "b").collect()
        }
        assert got == want, (n, k)


def test_global_running_matches_window_frames(spark):
    """global_running (sum incl/excl, max incl/excl) must equal the
    unpartitioned rows-frame windows it replaces — including the NULL
    empty-frame-to-0 coalescing for sums and NULL-first-row for max."""
    from pyspark.sql import Window, functions as F

    from my_flink_1_10_2_spark.operators.rank import global_running

    df = spark.range(0, 700).select(
        F.col("id"),
        ((F.col("id") * 131) % 47 - 23).alias("v"),
    )
    w_i = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, 0)
    w_e = Window.orderBy("id").rowsBetween(Window.unboundedPreceding, -1)
    want = df.select(
        "id",
        F.sum("v").over(w_i).alias("si"),
        F.coalesce(F.sum("v").over(w_e), F.lit(0)).alias("se"),
        F.max("v").over(w_i).alias("mi"),
        F.max("v").over(w_e).alias("me"),
    )
    got = global_running(
        df,
        ["id"],
        [
            ("si", "v", "sum", True),
            ("se", "v", "sum", False),
            ("mi", "v", "max", True),
            ("me", "v", "max", False),
        ],
    ).select("id", "si", "se", "mi", "me")
    a = {r.id: (r.si, r.se, r.mi, r.me) for r in want.collect()}
    b = {r.id: (r.si, r.se, r.mi, r.me) for r in got.collect()}
    assert a == b


def test_merkle_manifest_detects_mutations(spark):
    """The root digest must change under: a flipped byte, a dropped row,
    and a shard-boundary move; and must be stable across re-runs."""
    from pyspark.sql import functions as F

    from my_flink_1_10_2_spark.operators.integrity import merkle_manifest
    from my_flink_1_10_2_spark.queries import read
    from tests.conftest import SF_DIR

    docs = read(spark, SF_DIR, "documents")
    cols = ["doc_id", "lang", "n_chars", "text"]
    base = merkle_manifest(docs, "doc_id", cols, rows_per_shard=20).collect()
    assert len({r.root_digest for r in base}) == 1, "root must be global"
    root = base[0].root_digest
    assert sum(r.n_rows for r in base) == docs.count()
    # deterministic across re-runs
    again = merkle_manifest(docs, "doc_id", cols, rows_per_shard=20).collect()
    assert again[0].root_digest == root
    # flipped byte in ONE row -> different root, only that shard's digest moves
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.concat(F.col("text"), F.lit("X")))
        .otherwise(F.col("text")),
    )
    mut = merkle_manifest(mutated, "doc_id", cols, rows_per_shard=20).collect()
    assert mut[0].root_digest != root
    changed = [
        m.shard_id
        for m, b in zip(sorted(mut, key=lambda r: r.shard_id),
                        sorted(base, key=lambda r: r.shard_id))
        if m.shard_digest != b.shard_digest
    ]
    assert len(changed) == 1
    # dropped row -> different root
    dropped = merkle_manifest(
        docs.where(F.col("doc_id") != 3), "doc_id", cols, rows_per_shard=20
    ).collect()
    assert dropped[0].root_digest != root
    # different shard geometry -> different root (order-sensitive fold)
    other = merkle_manifest(docs, "doc_id", cols, rows_per_shard=25).collect()
    assert other[0].root_digest != root
