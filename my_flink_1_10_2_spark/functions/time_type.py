"""TIME(p) type shim — Flink's time-of-day type on Spark.

Spark has no TIME type (SURVEY §1.2); the reference's TimeType (ref:
flink-table/flink-table-common/src/main/java/org/apache/flink/table/
types/logical/TimeType.java, and the LocalTime conversions in
flink-core/.../typeutils/base/LocalTimeSerializer.java) is carried as
its canonical integer encoding — MILLIS OF DAY (the same physical
encoding Flink uses internally) — with the TIME function surface
expressed as plain JVM integer/date arithmetic:

- :func:`to_time` / :func:`time_lit`  — 'HH:MM:SS[.fff]' → millis-of-day
- :func:`time_of_day`                 — TIMESTAMP → millis-of-day
- :func:`time_hour` / :func:`time_minute` / :func:`time_second` /
  :func:`time_millis`                 — field extraction (HOUR(t) etc.)
- :func:`time_format`                 — millis-of-day → 'HH:mm:ss'

Everything is a Catalyst column expression (no Python row path), and
every function is exact integer arithmetic — oracle-gradeable bitwise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MILLIS_PER_DAY = 86_400_000


def time_lit(s: str) -> int:
    """'HH:MM:SS[.fff]' → millis-of-day (driver-side literal helper,
    the analog of a TIME 'xx:xx:xx' SQL literal)."""
    hh, mm, rest = s.split(":")
    if "." in rest:
        ss, frac = rest.split(".")
        ms = int(frac.ljust(3, "0")[:3])
    else:
        ss, ms = rest, 0
    h, m, sec = int(hh), int(mm), int(ss)
    if not (0 <= h < 24 and 0 <= m < 60 and 0 <= sec < 60):
        raise ValueError(f"invalid TIME literal {s!r}")
    return ((h * 60 + m) * 60 + sec) * 1000 + ms


def to_time(col) -> Column:
    """Cast a 'HH:MM:SS[.fff]' string column to millis-of-day (the
    STRING → TIME cast)."""
    c = F.col(col) if isinstance(col, str) else col
    parts = F.split(c, ":")
    seconds_and_frac = parts.getItem(2)
    whole = F.split(seconds_and_frac, r"\.").getItem(0).cast("bigint")
    frac = F.when(
        seconds_and_frac.contains("."),
        F.rpad(F.split(seconds_and_frac, r"\.").getItem(1), 3, "0").substr(1, 3),
    ).otherwise("0").cast("bigint")
    return (
        (parts.getItem(0).cast("bigint") * 60 + parts.getItem(1).cast("bigint"))
        * 60
        + whole
    ) * 1000 + frac


def time_of_day(ts_col) -> Column:
    """TIMESTAMP → TIME (millis-of-day) — the CAST(ts AS TIME) path.
    Built from field extraction, so it is exact for both TIMESTAMP and
    TIMESTAMP_NTZ inputs."""
    c = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return (
        (F.hour(c).cast("bigint") * 60 + F.minute(c).cast("bigint")) * 60
        + F.second(c).cast("bigint")
    ) * 1000 + F.date_format(c, "SSS").cast("bigint")


def time_hour(t) -> Column:
    c = F.col(t) if isinstance(t, str) else t
    return (c.cast("bigint") / 3_600_000).cast("bigint")


def time_minute(t) -> Column:
    c = F.col(t) if isinstance(t, str) else t
    return ((c.cast("bigint") / 60_000) % 60).cast("bigint")


def time_second(t) -> Column:
    c = F.col(t) if isinstance(t, str) else t
    return ((c.cast("bigint") / 1000) % 60).cast("bigint")


def time_millis(t) -> Column:
    c = F.col(t) if isinstance(t, str) else t
    return (c.cast("bigint") % 1000).cast("bigint")


def time_format(t) -> Column:
    """millis-of-day → 'HH:mm:ss' (the TIME → STRING cast)."""
    return F.concat_ws(
        ":",
        F.lpad(time_hour(t).cast("string"), 2, "0"),
        F.lpad(time_minute(t).cast("string"), 2, "0"),
        F.lpad(time_second(t).cast("string"), 2, "0"),
    )
