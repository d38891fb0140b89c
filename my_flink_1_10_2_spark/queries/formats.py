"""Driver-graded queries for the file-format surface (SURVEY §2.1).

Reference: flink-formats/flink-avro/ (AvroInputFormat.java,
AvroOutputFormat.java).  The query proves the full write → read → query
cycle through the Avro container format produces bit-identical answers
to querying the original parquet — i.e. the format layer is lossless
for the engine's row model (longs, strings, nullable columns).
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from my_flink_1_10_2_spark.queries import read, register


@register(
    "q_avro_roundtrip",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           count(DISTINCT lang) AS n_langs,
           CAST(sum(n_chars) AS BIGINT) AS total_chars,
           min(doc_id) AS first_doc
    FROM documents
    GROUP BY source
    ORDER BY source
    """,
    category="formats",
)
def q_avro_roundtrip(spark, sf_dir):
    """Avro container write → distributed read → aggregate (ref:
    flink-formats/flink-avro/AvroOutputFormat.java, AvroInputFormat.java).

    `write_avro`/`read_avro` use Spark's avro datasource when the jar is
    on the classpath and otherwise the pure-Python spec codec
    (`sources/avro_py.py`, deflate blocks, one container per partition /
    one read task per file).  The aggregate over the roundtripped copy
    must match the oracle's aggregate over the original parquet exactly
    — integer sums only, so the equality is bitwise.
    """
    from my_flink_1_10_2_spark.sources.batch import read_avro, write_avro

    docs = read(spark, sf_dir, "documents").select(
        "doc_id", "lang", "source", "n_chars"
    )
    work = tempfile.mkdtemp(prefix="fl_avro_q_")
    try:
        path = os.path.join(work, "documents_avro")
        write_avro(docs.repartition(4), path)
        back = read_avro(spark, path)
        result = (
            back.groupBy("source")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("lang").alias("n_langs"),
                F.sum("n_chars").alias("total_chars"),
                F.min("doc_id").alias("first_doc"),
            )
            .orderBy("source")
        )
        return spark.createDataFrame(result.collect(), result.schema)
    finally:
        shutil.rmtree(work, ignore_errors=True)
