"""Shard-proportionality check for the I/O-roundtrip container queries
(round-9 verdict item 8).

The export containers (WebDataset / TFRecord / Arrow IPC / npy / WET /
jsonl.zst) shard by contiguous global rank with a fixed samples-per-
shard, so their scale risk is NOT plan flips (the sf1 spot-check covers
those) but shard-count scaling: at 10-30x the rows there must be
10-30x the shards (one task per shard both directions), and the only
driver-side materialization is the O(shards) manifest — so driver RSS
must grow by at most the manifest, never by the payload.

For each query at each scale dir this records: wall sec, result rows
(== shards for the per-shard-audit queries), and driver RSS delta.  It
then asserts rows scale linearly with the documents row count (exact,
since shards = ceil(n/samples_per_shard)) and that driver RSS growth
between consecutive scales stays under a fixed ceiling.

Usage: python tools/io_shard_scale_check.py [--dirs sf0.1:sf1:sf3]
"""

import argparse
import json
import math
import os
import resource
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)

from my_flink_1_10_2_spark.queries import all_queries  # noqa: E402
from my_flink_1_10_2_spark.session import get_spark  # noqa: E402

# query -> (input table, samples_per_shard): every audit result is one
# row per shard with shards = ceil(table_rows / samples_per_shard)
ROUNDTRIPS = {
    "q_webdataset_roundtrip": ("documents", 100),
    "q_tfrecord_roundtrip": ("documents", 100),
    "q_arrow_ipc_roundtrip": ("documents", 120),
    "q_npy_shard_roundtrip": ("embeddings", 50),
    "q_wet_shard_roundtrip": ("documents", 150),
    "q_jsonl_zst_roundtrip": ("documents", 180),
}

RSS_CEILING_MB = 512  # max allowed driver RSS growth per 10x scale step


def _rss_mb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1024.0


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--dirs",
        default="/root/testdata/sf0.1:.sfscale/sf1:.sfscale/sf3",
        help="colon-separated scale dirs, ascending size",
    )
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset of the roundtrip queries "
        "(default: all six)",
    )
    args = ap.parse_args()
    roundtrips = dict(ROUNDTRIPS)
    if args.queries:
        keep = set(args.queries.split(","))
        unknown = keep - roundtrips.keys()
        if unknown:
            print(f"unknown queries: {sorted(unknown)}", file=sys.stderr)
            sys.exit(2)
        roundtrips = {k: v for k, v in roundtrips.items() if k in keep}
    dirs = [d for d in args.dirs.split(":") if os.path.isdir(d)]
    if len(dirs) < 2:
        print(f"need >=2 existing scale dirs, got {dirs}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()

    # per-dir input row counts (drive the expected shard counts)
    n_rows: dict[tuple[str, str], int] = {}
    for d in dirs:
        for t in {t for t, _ in roundtrips.values()}:
            n_rows[d, t] = spark.read.parquet(
                os.path.join(d, f"{t}.parquet")
            ).count()

    failures = []
    per_q: dict[str, dict[str, dict]] = {}
    for name, (table, per_shard) in roundtrips.items():
        per_q[name] = {}
        for d in dirs:
            rss0 = _rss_mb()
            t0 = time.time()
            rows = qs[name].spark_fn(spark, d).count()
            rec = {
                "wall_sec": round(time.time() - t0, 2),
                "result_rows": rows,
                "rss_delta_mb": round(_rss_mb() - rss0, 1),
            }
            per_q[name][d] = rec
            print(json.dumps({"query": name, "dir": d, **rec}), flush=True)
            want = math.ceil(n_rows[d, table] / per_shard)
            if rows != want:
                failures.append(
                    f"{name}@{d}: {rows} shards, want {want} "
                    f"(= ceil({n_rows[d, table]}/{per_shard}))"
                )
        # RSS growth between consecutive scales
        for lo, hi in zip(dirs, dirs[1:]):
            grow = per_q[name][hi]["rss_delta_mb"]
            if grow > RSS_CEILING_MB:
                failures.append(
                    f"{name}@{hi}: driver RSS grew {grow} MB in one run "
                    f"(ceiling {RSS_CEILING_MB})"
                )

    any_table = next(iter({t for t, _ in roundtrips.values()}))
    summary = {
        "dirs": {d: n_rows[d, any_table] for d in dirs},
        "queries": len(roundtrips),
        "failures": failures,
    }
    print(json.dumps(summary))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
