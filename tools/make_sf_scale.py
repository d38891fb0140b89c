"""Synthesize a larger scale factor from an existing fixture directory by
replicating the scaling tables with disjoint key ranges — for MEMORY-SHAPE
and PLAN spot-checks above the driver-provided scales (sf1 = 10x sf0.1).

Not an oracle fixture: distributions are replica-periodic, so results are
NOT comparable to DuckDB replays of TPC-H-like semantics — use it only to
catch size-dependent plan flips (broadcast-threshold crossings, AQE skew
splits, spill pathology) before they bite at real scale.

Key discipline mirrors TPC-H's dbgen: region/nation are fixed-size dims;
customer/supplier/part/orders/lineitem/events/documents/embeddings scale
linearly.  Each replica i shifts every entity key by i * (1 + max_key of
the source), so uniqueness and the join graph (FKs point inside the same
replica) are preserved and per-key group sizes stay constant while key
cardinality grows 10x — the shape that matters for shuffles and hash
tables.

Usage: python tools/make_sf_scale.py [--src /root/testdata/sf0.1]
                                     [--dst .sfscale/sf1] [--factor 10]
"""
import argparse
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)

from pyspark.sql import functions as F  # noqa: E402

from my_flink_1_10_2_spark.session import get_spark  # noqa: E402

# table -> columns to shift: {col: keyspace} where tables sharing a
# keyspace shift by the same stride (FK consistency inside a replica)
SCALED = {
    "customer": {"c_custkey": "cust"},
    "supplier": {"s_suppkey": "supp"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "order", "o_custkey": "cust"},
    "lineitem": {"l_orderkey": "order", "l_partkey": "part", "l_suppkey": "supp"},
    "events": {"event_id": "event", "user_id": "user"},
    "documents": {"doc_id": "doc"},
    "embeddings": {"vec_id": "doc"},
}
FIXED = ["region", "nation"]
# keyspace -> (table, column) that defines its stride
STRIDE_SOURCE = {
    "cust": ("customer", "c_custkey"),
    "supp": ("supplier", "s_suppkey"),
    "part": ("part", "p_partkey"),
    "order": ("orders", "o_orderkey"),
    "event": ("events", "event_id"),
    "user": ("events", "user_id"),
    "doc": ("documents", "doc_id"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default=os.path.join(_REPO, ".sfscale", "sf1"))
    ap.add_argument("--factor", type=int, default=10)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated table subset (default: all); fixed dims are "
        "copied only when listed",
    )
    args = ap.parse_args()
    only = set(args.tables.split(",")) if args.tables else None

    spark = get_spark(app_name="make-sf-scale")
    spark.sparkContext.setLogLevel("ERROR")
    # raw reads (ns-timestamp columns stay bigint and round-trip verbatim)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    os.makedirs(args.dst, exist_ok=True)

    needed_ks = {
        ks
        for t, shifts in SCALED.items()
        if only is None or t in only
        for ks in shifts.values()
    }
    strides = {
        ks: 1 + spark.read.parquet(os.path.join(args.src, f"{t}.parquet"))
        .agg(F.max(c)).first()[0]
        for ks, (t, c) in STRIDE_SOURCE.items()
        if ks in needed_ks
    }
    print(f"# strides: {strides}", file=sys.stderr)

    for t in (f for f in FIXED if only is None or f in only):
        df = spark.read.parquet(os.path.join(args.src, f"{t}.parquet"))
        df.write.mode("overwrite").parquet(os.path.join(args.dst, f"{t}.parquet"))
        print(f"# {t}: copied (fixed-size dim)", file=sys.stderr)

    replicas = spark.range(args.factor).select(F.col("id").alias("__rep"))
    for t, shifts in SCALED.items():
        if only is not None and t not in only:
            continue
        src = spark.read.parquet(os.path.join(args.src, f"{t}.parquet"))
        out = src.crossJoin(F.broadcast(replicas))
        for col, ks in shifts.items():
            out = out.withColumn(
                col, (F.col(col) + F.col("__rep") * F.lit(strides[ks])).cast(
                    dict(src.dtypes)[col]
                )
            )
        out.drop("__rep").write.mode("overwrite").parquet(
            os.path.join(args.dst, f"{t}.parquet")
        )
        print(f"# {t}: x{args.factor}", file=sys.stderr)
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
