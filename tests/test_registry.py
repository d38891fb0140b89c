"""Registry consistency: the driver grades queries() order and runs
oracle_sql() verbatim — typos here fail silently, so pin them."""

from __future__ import annotations

import re

from my_flink_1_10_2_spark.queries import REGISTRY, _FLAGSHIP_ORDER, all_queries

TABLES = {
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
}


def test_flagship_order_names_all_exist():
    from my_flink_1_10_2_spark.queries import _driver_graded_names

    qs = all_queries()
    missing = [n for n in _FLAGSHIP_ORDER if n not in qs]
    assert not missing, f"_FLAGSHIP_ORDER references unknown queries: {missing}"
    # auto-rotation contract: every never-driver-graded query sorts
    # before every graded one (the driver samples a prefix, so each
    # round grades first-time rows), and _FLAGSHIP_ORDER's relative
    # order is preserved within each group
    graded = _driver_graded_names()
    names = list(qs)
    if graded and any(n not in graded for n in names):
        last_fresh = max(i for i, n in enumerate(names) if n not in graded)
        first_seen = min(
            (i for i, n in enumerate(names) if n in graded), default=len(names)
        )
        assert last_fresh < first_seen, "fresh queries must precede graded ones"
    flag_pos = {n: i for i, n in enumerate(_FLAGSHIP_ORDER)}
    for group in (
        [n for n in names if n in flag_pos and n not in graded],
        [n for n in names if n in flag_pos and n in graded],
    ):
        assert group == sorted(group, key=flag_pos.__getitem__)


def test_every_query_has_doc_and_category():
    for name, q in all_queries().items():
        assert q.doc.strip(), f"{name} has no docstring"
        assert q.category, f"{name} has no category"


def test_oracles_reference_only_registered_tables():
    ident = re.compile(r"\b(?:FROM|JOIN)\s+([a-z_][a-z0-9_]*)", re.IGNORECASE)
    for name, q in all_queries().items():
        if not q.oracle:
            continue
        for tbl in ident.findall(q.oracle):
            # CTE names and derived aliases are lowercase identifiers too —
            # only flag identifiers that LOOK like base tables but aren't.
            if tbl.endswith("item") or tbl in {
                "regions", "nations", "customers", "suppliers", "parts",
                "order", "event", "document", "embedding",
            }:
                assert tbl in TABLES, f"{name} oracle reads unknown table {tbl!r}"
