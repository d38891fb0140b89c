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
    qs = all_queries()
    missing = [n for n in _FLAGSHIP_ORDER if n not in qs]
    assert not missing, f"_FLAGSHIP_ORDER references unknown queries: {missing}"
    # flagships really are first, in order
    assert list(qs)[: len(_FLAGSHIP_ORDER)] == list(_FLAGSHIP_ORDER)


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
