"""Scale check for the round-10 external-file split readers: build a
large multi-member .warc.gz and a large seekable .jsonl.zst, then read
each through its byte-range/frame-range parallel Spark path and assert:

  * task count matches the split math (file_size/split_bytes, resp.
    n_frames/frames_per_task) — the one-huge-file wall is actually gone;
  * row counts and content aggregates equal the ground truth;
  * wall time is reported per split size so the scan-validation overhead
    of the WARC magic scan is visible (it must stay a small fraction).

Usage: python tools/split_read_scale_check.py [--records 100000]
"""

import argparse
import json
import os
import sys
import tempfile
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.chdir(_REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--records", type=int, default=100_000)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import random

    from my_flink_1_10_2_spark.session import get_spark
    from my_flink_1_10_2_spark.sources.jsonl_zst import (
        read_jsonl_zst_seekable,
        write_jsonl_zst_seekable,
    )
    from my_flink_1_10_2_spark.sources.warc import (
        _gzip_member,
        encode_warc_record,
        read_warc_gz,
    )

    spark = get_spark(master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    rng = random.Random(1010)
    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        # ---- WARC.gz: n records, mixed sizes, one file -------------------
        wp = os.path.join(tmp, "big.warc.gz")
        t0 = time.time()
        with open(wp, "wb") as fh:
            for i in range(args.records):
                body = rng.randbytes(rng.randint(64, 2048))
                fh.write(_gzip_member(encode_warc_record(
                    "conversion",
                    f"{i:08d}-0000-0000-0000-000000000000",
                    "2026-01-01T00:00:00Z",
                    body,
                )))
        wsize = os.path.getsize(wp)
        out["warc_write_sec"] = round(time.time() - t0, 2)
        out["warc_bytes"] = wsize
        for split_mb in (8, 32):
            sb = split_mb << 20
            want_tasks = -(-wsize // sb)
            t0 = time.time()
            df = read_warc_gz(spark, wp, split_bytes=sb)
            n_parts = df.rdd.getNumPartitions()
            n_rows = df.count()
            wall = round(time.time() - t0, 2)
            ok = n_parts == want_tasks and n_rows == args.records
            out[f"warc_split_{split_mb}mb"] = {
                "tasks": n_parts, "want_tasks": want_tasks,
                "rows": n_rows, "wall_sec": wall, "ok": ok,
            }
            print(json.dumps({"leg": f"warc_{split_mb}mb",
                              **out[f"warc_split_{split_mb}mb"]}), flush=True)

        # ---- seekable .jsonl.zst ----------------------------------------
        jp = os.path.join(tmp, "big.jsonl.zst")
        t0 = time.time()

        def lines():
            for i in range(args.records):
                yield (
                    ('{"doc_id":%d,"score":%.2f,"lang":"l%d"}\n'
                     % (i, i * 0.25, i % 5)).encode()
                )

        n_frames, raw = write_jsonl_zst_seekable(lines(), jp, lines_per_frame=500)
        out["zst_write_sec"] = round(time.time() - t0, 2)
        out["zst_frames"] = n_frames
        out["zst_bytes"] = os.path.getsize(jp)
        for fpt in (4, 16):
            want_tasks = -(-n_frames // fpt)
            t0 = time.time()
            df = read_jsonl_zst_seekable(
                spark, jp, {"doc_id": "long", "score": "double", "lang": "string"},
                frames_per_task=fpt,
            )
            n_parts = df.rdd.getNumPartitions()
            agg = df.groupBy().sum("doc_id").first()[0]
            wall = round(time.time() - t0, 2)
            want_sum = args.records * (args.records - 1) // 2
            ok = n_parts == want_tasks and agg == want_sum
            out[f"zst_frames_per_task_{fpt}"] = {
                "tasks": n_parts, "want_tasks": want_tasks,
                "docid_sum_ok": agg == want_sum, "wall_sec": wall, "ok": ok,
            }
            print(json.dumps({"leg": f"zst_fpt{fpt}",
                              **out[f"zst_frames_per_task_{fpt}"]}), flush=True)

        # ---- Avro single container (the r9/r10 headline reader) ----------
        from my_flink_1_10_2_spark.sources import avro_py
        from my_flink_1_10_2_spark.sources.batch import read_avro

        apath = os.path.join(tmp, "big.avro")
        schema = {
            "type": "record", "name": "r",
            "fields": [{"name": "id", "type": "long"},
                       {"name": "payload", "type": "bytes"}],
        }
        t0 = time.time()
        avro_py.write_container(
            apath, schema,
            ({"id": i, "payload": rng.randbytes(rng.randint(32, 512))}
             for i in range(args.records)),
            codec="deflate", sync_interval=200,
        )
        asize = os.path.getsize(apath)
        out["avro_write_sec"] = round(time.time() - t0, 2)
        out["avro_bytes"] = asize
        for split_mb in (4, 16):
            sb = split_mb << 20
            want_tasks = -(-asize // sb)
            t0 = time.time()
            df = read_avro(spark, apath, split_bytes=sb)
            n_parts = df.rdd.getNumPartitions()
            row = df.groupBy().agg({"id": "sum", "*": "count"}).first()
            wall = round(time.time() - t0, 2)
            n_rows, id_sum = row["count(1)"], row["sum(id)"]
            want_sum = args.records * (args.records - 1) // 2
            ok = (n_parts == want_tasks and n_rows == args.records
                  and id_sum == want_sum)
            out[f"avro_split_{split_mb}mb"] = {
                "tasks": n_parts, "want_tasks": want_tasks,
                "rows": int(n_rows), "id_sum_ok": id_sum == want_sum,
                "wall_sec": wall, "ok": ok,
            }
            print(json.dumps({"leg": f"avro_{split_mb}mb",
                              **out[f"avro_split_{split_mb}mb"]}), flush=True)

    failures = [k for k, v in out.items()
                if isinstance(v, dict) and not v["ok"]]
    print(json.dumps({"summary": out, "failures": failures}))
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
