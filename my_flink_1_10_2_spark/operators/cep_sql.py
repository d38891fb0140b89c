"""MATCH_RECOGNIZE SQL → NFA compiler (SURVEY §2.10 CEP SQL surface).

The reference parses MATCH_RECOGNIZE with Calcite and codegens an NFA
(ref: StreamExecMatch.scala:69, MatchCodeGenerator.scala, SQL tests
MatchRecognizeITCase.scala). Spark has no MATCH_RECOGNIZE; this module
compiles a practical subset onto :mod:`operators/cep`'s backtracking
NFA, so reference SQL runs verbatim through ``TableEnvironment.sql``.

Supported subset (strict contiguity, the reference's `next` semantics):

    SELECT * FROM <table> MATCH_RECOGNIZE (
      PARTITION BY col [, col]
      ORDER BY col [, col]
      MEASURES <expr> AS name [, ...]
      [ONE ROW PER MATCH]
      [AFTER MATCH SKIP PAST LAST ROW | SKIP TO NEXT ROW
       | SKIP TO FIRST var | SKIP TO LAST var]
      PATTERN (A B+ C? D{n} E{n,} F{n,m} [reluctant: +? *? ?? {n,m}?] ...)
        [WITHIN INTERVAL '<n>' <unit>]
      DEFINE VAR AS <cond> [AND <cond>]... [, VAR AS ...]
    )

where <cond> is  ``VAR.col <op> rhs`` with op ∈ {<,<=,>,>=,=,<>} and
rhs ∈ {numeric/string literal, VAR2.col, PREV(VAR.col),
FIRST(VAR2.col), LAST(VAR2.col)}; measures are ``VAR.col``,
``FIRST(VAR.col)``, ``LAST(VAR.col)`` or a bare partition column.
Variables without a DEFINE entry match any row (standard semantics).

PREV(x.col) refers to the input row immediately before the candidate —
under strict contiguity that is exactly the last row matched so far,
which is how it's evaluated here.
"""

from __future__ import annotations

import re
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

from my_flink_1_10_2_spark.operators.cep import Pattern, Step, match_recognize

_OPS: dict[str, Callable] = {
    "<": lambda a, b: a < b,
    "<=": lambda a, b: a <= b,
    ">": lambda a, b: a > b,
    ">=": lambda a, b: a >= b,
    "=": lambda a, b: a == b,
    "<>": lambda a, b: a != b,
}


def contains_match_recognize(query: str) -> bool:
    return re.search(r"\bMATCH_RECOGNIZE\s*\(", query, re.IGNORECASE) is not None


def _extract_block(query: str) -> tuple[str, str]:
    """Returns (table_name, body inside MATCH_RECOGNIZE(...))."""
    m = re.search(
        r"FROM\s+([\w.]+)\s+MATCH_RECOGNIZE\s*\(", query, re.IGNORECASE
    )
    if not m:
        raise ValueError("unsupported MATCH_RECOGNIZE query shape; expected "
                         "SELECT * FROM <table> MATCH_RECOGNIZE (...)")
    start = m.end()
    depth = 1
    i = start
    while i < len(query) and depth:
        if query[i] == "(":
            depth += 1
        elif query[i] == ")":
            depth -= 1
        i += 1
    return m.group(1), query[start : i - 1]


def _clause(body: str, name: str, stop: list[str]) -> str | None:
    stops = "|".join(stop + ["$"])
    m = re.search(rf"{name}\s+(.*?)(?=\s*(?:{stops}))", body,
                  re.IGNORECASE | re.DOTALL)
    return m.group(1).strip() if m else None


_CLAUSES = ["PARTITION\\s+BY", "ORDER\\s+BY", "MEASURES", "ONE\\s+ROW",
            "AFTER\\s+MATCH", "PATTERN", "WITHIN", "DEFINE"]


def _last_matched(ctx: dict, var_order: list[str]):
    """The most recently matched row across all variables (strict
    contiguity ⇒ this is the input row before the candidate)."""
    for name in reversed(var_order):
        if ctx.get(name):
            return ctx[name][-1]
    return None


def _rhs_resolver(rhs: str, var_order: list[str]):
    rhs = rhs.strip()
    nav = re.fullmatch(r"(PREV|FIRST|LAST)\s*\(\s*(\w+)\.(\w+)\s*\)",
                       rhs, re.IGNORECASE)
    if nav:
        fn, var, col = nav.group(1).upper(), nav.group(2), nav.group(3)
        if fn == "PREV":
            return lambda row, ctx: (
                (_last_matched(ctx, var_order) or {}).get(col)
                if _last_matched(ctx, var_order) is not None else None
            )
        if fn == "FIRST":
            return lambda row, ctx: ctx[var][0][col] if ctx.get(var) else None
        return lambda row, ctx: ctx[var][-1][col] if ctx.get(var) else None
    ref = re.fullmatch(r"(\w+)\.(\w+)", rhs)
    if ref:
        var, col = ref.group(1), ref.group(2)
        return lambda row, ctx: ctx[var][-1][col] if ctx.get(var) else None
    if re.fullmatch(r"'[^']*'", rhs):
        val = rhs[1:-1]
        return lambda row, ctx: val
    val = float(rhs) if "." in rhs or "e" in rhs.lower() else int(rhs)
    return lambda row, ctx: val


def _compile_condition(cond: str, this_var: str, var_order: list[str]):
    """One `VAR.col op rhs` conjunct → predicate(row, ctx) -> bool."""
    m = re.fullmatch(
        r"(\w+)\.(\w+)\s*(<=|>=|<>|<|>|=)\s*(.+)", cond.strip(), re.DOTALL
    )
    if not m:
        raise ValueError(f"unsupported DEFINE condition: {cond!r}")
    var, col, op, rhs = m.groups()
    if var != this_var:
        raise ValueError(
            f"DEFINE for {this_var} must reference {this_var}.col on the "
            f"left side, got {var}.{col}"
        )
    get_rhs = _rhs_resolver(rhs, var_order)
    cmp = _OPS[op]

    def predicate(row, ctx):
        rv = get_rhs(row, ctx)
        if rv is None:
            return False
        return bool(cmp(row[col], rv))

    return predicate


def _and_all(preds):
    if len(preds) == 1:
        return preds[0]
    return lambda row, ctx: all(p(row, ctx) for p in preds)


def _split_top_level(s: str, sep: str) -> list[str]:
    parts, depth, cur = [], 0, []
    i = 0
    while i < len(s):
        if s[i] == "(":
            depth += 1
        elif s[i] == ")":
            depth -= 1
        if depth == 0 and s[i : i + len(sep)].upper() == sep and (
            sep != "," or True
        ):
            parts.append("".join(cur))
            cur = []
            i += len(sep)
            continue
        cur.append(s[i])
        i += 1
    parts.append("".join(cur))
    return [p.strip() for p in parts if p.strip()]


def _measure_fn(expr: str, partition_by: list[str], var_order: list[str]):
    expr = expr.strip()
    nav = re.fullmatch(r"(FIRST|LAST)\s*\(\s*(\w+)\.(\w+)\s*\)", expr,
                       re.IGNORECASE)
    if nav:
        fn, var, col = nav.group(1).upper(), nav.group(2), nav.group(3)
        if fn == "FIRST":
            return col, lambda mtch: mtch[var][0][col] if mtch.get(var) else None
        return col, lambda mtch: mtch[var][-1][col] if mtch.get(var) else None
    ref = re.fullmatch(r"(\w+)\.(\w+)", expr)
    if ref:
        # bare VAR.col in ONE ROW PER MATCH is (RUNNING) LAST per the SQL
        # standard and the reference (MatchCodeGenerator.scala) — differs
        # from FIRST whenever VAR carries a + or * quantifier
        var, col = ref.group(1), ref.group(2)
        return col, lambda mtch: mtch[var][-1][col] if mtch.get(var) else None
    if expr in partition_by:  # bare partition column: same for every row
        col = expr

        def from_any(mtch):
            for rows in mtch.values():
                if rows:
                    return rows[0][col]
            return None

        return col, from_any
    raise ValueError(f"unsupported MEASURES expression: {expr!r}")


def compile_match_recognize(spark: SparkSession, query: str) -> DataFrame:
    table, body = _extract_block(query)
    df = spark.table(table)
    dtypes = dict(df.dtypes)

    part = _clause(body, r"PARTITION\s+BY", _CLAUSES) or ""
    order = _clause(body, r"ORDER\s+BY", _CLAUSES) or ""
    measures_raw = _clause(body, "MEASURES", _CLAUSES) or ""
    after_clause = _clause(body, r"AFTER\s+MATCH", _CLAUSES) or "SKIP PAST LAST ROW"
    pattern_raw = _clause(body, "PATTERN", _CLAUSES) or ""
    within_raw = _clause(body, "WITHIN", _CLAUSES)
    define_raw = _clause(body, "DEFINE", _CLAUSES) or ""

    partition_by = [c.strip() for c in part.split(",") if c.strip()]
    order_by = [c.strip() for c in order.split(",") if c.strip()]

    # AFTER MATCH SKIP {PAST LAST ROW | TO NEXT ROW | TO FIRST v | TO LAST v}
    # (ref: AfterMatchSkipStrategy.java; SQL spellings exercised by
    # MatchRecognizeITCase.scala)
    skip_to = re.search(
        r"SKIP\s+TO\s+(FIRST|LAST)\s+(\w+)", after_clause, re.IGNORECASE
    )
    if skip_to:
        after = (f"skip_to_{skip_to.group(1).lower()}", skip_to.group(2))
    elif "NEXT ROW" in after_clause.upper():
        after = "skip_to_next_row"
    else:
        after = "skip_past_last_row"

    # PATTERN (...) WITHIN INTERVAL '<n>' <unit>  (ref: Pattern.within /
    # MATCH_RECOGNIZE WITHIN in the reference's SQL surface)
    within_td = None
    if within_raw is not None:
        wm = re.fullmatch(
            r"INTERVAL\s+'([\d.]+)'\s+(\w+)", within_raw.strip(), re.IGNORECASE
        )
        if not wm:
            raise ValueError(f"unsupported WITHIN clause: {within_raw!r}")
        import pandas as pd

        within_td = pd.Timedelta(f"{wm.group(1)} {wm.group(2).lower()}")

    pat = re.sub(r"[()]", " ", pattern_raw)
    tokens = pat.split()
    var_order = []
    steps: list[Step] = []
    # quantifiers: + * ? {n} {n,} {n,m}, each optionally reluctant with a
    # trailing ? (ref: Quantifier.java; SQL spellings per
    # MatchRecognizeITCase.scala `{n}` tests)
    token_re = re.compile(r"(\w+)(\{\d+(?:,\d*)?\}\??|[+*]\??|\?\??|)")
    defines: dict[str, list[str]] = {}
    for item in _split_top_level(define_raw, ","):
        dm = re.match(r"(\w+)\s+AS\s+(.*)", item, re.IGNORECASE | re.DOTALL)
        if not dm:
            raise ValueError(f"unsupported DEFINE entry: {item!r}")
        defines[dm.group(1)] = re.split(r"\s+AND\s+", dm.group(2),
                                        flags=re.IGNORECASE)

    for tok in tokens:
        tm = token_re.fullmatch(tok)
        if not tm:
            raise ValueError(f"unsupported PATTERN token: {tok!r}")
        var, quant = tm.group(1), tm.group(2) or "1"
        var_order.append(var)
        if var in defines:
            preds = [_compile_condition(c, var, var_order[:]) for c in defines[var]]
            pred = _and_all(preds)
        else:
            pred = lambda row, ctx: True  # noqa: E731 — undefined var matches all
        steps.append(Step(var, pred, quant))

    measures = {}
    schema_parts = []
    for col in partition_by:
        measures[col] = (lambda c: lambda m: _first_any(m, c))(col)
        schema_parts.append(f"{col} {dtypes[col]}")
    for item in _split_top_level(measures_raw, ","):
        mm = re.match(r"(.*)\s+AS\s+(\w+)\s*$", item, re.IGNORECASE | re.DOTALL)
        if not mm:
            raise ValueError(f"MEASURES entries need AS aliases: {item!r}")
        src_col, fn = _measure_fn(mm.group(1), partition_by, var_order)
        name = mm.group(2)
        measures[name] = fn
        schema_parts.append(f"{name} {dtypes.get(src_col, 'double')}")

    return match_recognize(
        df,
        partition_by=partition_by,
        order_by=order_by,
        pattern=Pattern(steps, within_td),
        measures=measures,
        output_schema=", ".join(schema_parts),
        after_match=after,
    )


def _first_any(mtch: dict, col: str):
    for rows in mtch.values():
        if rows:
            return rows[0][col]
    return None
