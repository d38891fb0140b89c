"""LATERAL TABLE rewrite edge cases (round-2 ADVICE): deep paren
nesting, alias without column list, and clear errors for unsupported
spellings instead of Spark parse failures."""

from __future__ import annotations

import pytest

from my_flink_1_10_2_spark.sql import rewrite_flink_sql


def test_two_level_nested_args():
    q = rewrite_flink_sql(
        "SELECT a, w FROM t CROSS JOIN LATERAL TABLE("
        "explode(split(regexp_replace(s, 'a', 'b'), ' '))) AS T(w)"
    )
    assert "LATERAL VIEW explode(split(regexp_replace(s, 'a', 'b'), ' ')) T AS w" in q
    assert "LATERAL TABLE" not in q.upper()


def test_alias_without_column_list():
    q = rewrite_flink_sql(
        "SELECT a FROM t, LATERAL TABLE(explode(arr)) AS T"
    )
    assert "LATERAL VIEW explode(arr) T" in q
    # and without AS
    q2 = rewrite_flink_sql(
        "SELECT a FROM t, LATERAL TABLE(explode(arr)) T WHERE a > 1"
    )
    assert "LATERAL VIEW explode(arr) T" in q2
    assert "WHERE a > 1" in q2


def test_multiple_laterals_in_one_query():
    q = rewrite_flink_sql(
        "SELECT * FROM t, LATERAL TABLE(explode(xs)) AS A(x), "
        "LATERAL TABLE(explode(ys)) AS B(y)"
    )
    assert "LATERAL VIEW explode(xs) A AS x" in q
    assert "LATERAL VIEW explode(ys) B AS y" in q


def test_unsupported_spelling_raises_clearly():
    # missing alias entirely (next token is a keyword)
    with pytest.raises(ValueError, match="LATERAL TABLE"):
        rewrite_flink_sql(
            "SELECT a FROM t, LATERAL TABLE(explode(arr)) WHERE a > 1"
        )
    # not a udtf call inside TABLE(...)
    with pytest.raises(ValueError, match="LATERAL TABLE"):
        rewrite_flink_sql("SELECT a FROM t, LATERAL TABLE(42) AS T(x)")
    # leading comma/CROSS JOIN missing -> leftover LATERAL TABLE detected
    with pytest.raises(ValueError, match="LATERAL TABLE"):
        rewrite_flink_sql(
            "SELECT a FROM t JOIN LATERAL TABLE(explode(arr)) AS T(x) ON TRUE"
        )


def test_existing_spellings_still_rewrite():
    q = rewrite_flink_sql(
        "SELECT a, w FROM t CROSS JOIN LATERAL TABLE(explode(split(s, ' '))) AS T(w)"
    )
    assert "LATERAL VIEW explode(split(s, ' ')) T AS w" in q
    q2 = rewrite_flink_sql(
        "SELECT a, k, v FROM t, LATERAL TABLE(json_tuple(js, 'k', 'v')) AS J(k, v)"
    )
    assert "LATERAL VIEW json_tuple(js, 'k', 'v') J AS k, v" in q2
    assert rewrite_flink_sql("SELECT 1") == "SELECT 1"
