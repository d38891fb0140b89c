"""`FOR SYSTEM_TIME AS OF` SQL surface → as-of join compilation.

The reference parses temporal joins in SQL (`JOIN Rates FOR SYSTEM_TIME
AS OF o.rowtime AS r ON r.ccy = o.ccy`) and plans them through
StreamExecTemporalJoin.scala:51 / TemporalRowTimeJoinOperator.java:71;
the build side's version time + primary key come from the versioned
table's DDL metadata. Here: :meth:`TableEnvironment.create_versioned_view`
records that metadata, and this module compiles the canonical single
temporal-join query shape onto operators/joins.py::asof_join (one
shuffle by key — see that docstring for the 100 TB plan shape).

Supported shape (the reference's canonical usage; anything else raises):

    SELECT <cols> FROM <probe> [AS] <p>
    JOIN <versioned> FOR SYSTEM_TIME AS OF <p>.<ts> [AS] <b>
    ON <b>.<bk> = <p>.<pk> [WHERE ...]
"""

from __future__ import annotations

import re

_TEMPORAL_RE = re.compile(
    r"SELECT\s+(?P<sel>.+?)\s+FROM\s+(?P<probe>\w+)(?:\s+AS)?\s+(?P<p>\w+)\s+"
    r"JOIN\s+(?P<build>\w+)\s+FOR\s+SYSTEM_TIME\s+AS\s+OF\s+"
    r"(?P<pt>\w+)\.(?P<ts>\w+)(?:\s+AS)?\s+(?P<b>\w+)\s+"
    r"ON\s+(?P<lhs>\w+)\.(?P<lk>\w+)\s*=\s*(?P<rhs>\w+)\.(?P<rk>\w+)"
    r"(?P<rest>\s+WHERE\s+.+)?\s*$",
    flags=re.IGNORECASE | re.DOTALL,
)


def contains_temporal_join(query: str) -> bool:
    return re.search(r"FOR\s+SYSTEM_TIME\s+AS\s+OF", query, re.IGNORECASE) is not None


def compile_temporal_join(spark, query: str, versioned: dict[str, tuple[str, str]]):
    """Compile the supported temporal-join shape into a DataFrame.

    `versioned` maps view name → (time_attr, primary_key) as registered
    by ``create_versioned_view`` (the DDL metadata analog)."""
    from my_flink_1_10_2_spark.operators.joins import asof_join

    m = _TEMPORAL_RE.match(query.strip())
    if not m:
        raise ValueError(
            "unsupported FOR SYSTEM_TIME AS OF shape; expected "
            "SELECT ... FROM probe p JOIN build FOR SYSTEM_TIME AS OF p.ts AS b "
            "ON b.k = p.k [WHERE ...]"
        )
    g = m.groupdict()
    if g["build"] not in versioned:
        raise ValueError(
            f"table {g['build']!r} is not a versioned view — register it with "
            "create_versioned_view(name, table, time_attr, primary_key)"
        )
    if g["pt"].lower() != g["p"].lower():
        raise ValueError("AS OF time attribute must come from the probe side")
    build_ts, build_pk = versioned[g["build"]]
    # ON may be written either direction
    if g["lhs"].lower() == g["b"].lower() and g["rhs"].lower() == g["p"].lower():
        bk, pk = g["lk"], g["rk"]
    elif g["lhs"].lower() == g["p"].lower() and g["rhs"].lower() == g["b"].lower():
        pk, bk = g["lk"], g["rk"]
    else:
        raise ValueError("ON clause must equate a probe column with a build column")
    if bk.lower() != build_pk.lower():
        raise ValueError(
            f"ON key {bk!r} must be the versioned view's primary key {build_pk!r}"
        )

    joined = asof_join(
        spark.table(g["probe"]),
        spark.table(g["build"]),
        key=(pk, build_pk),
        time=(g["ts"], build_ts),
    )
    # The as-of output carries unqualified probe columns + build value
    # columns; strip the aliases from the select list and re-plan it.
    sel = re.sub(rf"\b({g['p']}|{g['b']})\.", "", g["sel"], flags=re.IGNORECASE)
    rest = re.sub(
        rf"\b({g['p']}|{g['b']})\.", "", g["rest"] or "", flags=re.IGNORECASE
    )
    joined.createOrReplaceTempView("__temporal_join__")
    return spark.sql(f"SELECT {sel} FROM __temporal_join__{rest}")
