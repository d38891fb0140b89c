"""Line-level dedup / boilerplate removal (pipeline brief: the C4 /
Gopher / RefinedWeb preprocessing step — drop lines that repeat across
the corpus more than a threshold, e.g. navigation chrome, cookie
banners, boilerplate headers; then reassemble documents).

Scale design: one explode (doc → lines with position), one hash-keyed
group-count over the corpus' distinct lines, one shuffle join back on
the line hash, and a per-document ordered reassembly — every stage is a
plain hash shuffle on bounded keys, no window over the full corpus, no
driver materialization.  The count table is keyed by a 64-bit xxhash of
the line so the shuffle carries 8-byte keys, not full line text.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_lines(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", delimiter: str = "\n"
) -> DataFrame:
    """(id, pos, line) — one row per line, position-preserving."""
    return docs.select(
        F.col(id_col),
        F.posexplode(F.split(F.col(text_col), delimiter)).alias("pos", "line"),
    )


def line_frequencies(lines: DataFrame) -> DataFrame:
    """Corpus-wide occurrence count per distinct line, keyed by a 64-bit
    line hash (8-byte shuffle keys at 100 TB, not full text)."""
    return (
        lines.select(F.xxhash64("line").alias("line_h"))
        .groupBy("line_h")
        .agg(F.count(F.lit(1)).alias("n_occurrences"))
    )


def line_dedup(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = "\n",
    max_occurrences: int = 1,
) -> DataFrame:
    """Remove every line occurring more than ``max_occurrences`` times
    across the corpus, keep each document's surviving lines in order.

    Output: (id_col, text_col cleaned, n_lines_kept, n_lines_dropped).
    Documents whose lines are all boilerplate survive with empty text —
    pair with a quality filter to drop them, as the reference pipelines
    do.
    """
    lines = explode_lines(docs, text_col, id_col, delimiter)
    freq = line_frequencies(lines)
    tagged = lines.withColumn("line_h", F.xxhash64("line")).join(freq, "line_h")
    rebuilt = (
        tagged.groupBy(id_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                F.col("n_occurrences") <= max_occurrences,
                                F.struct(F.col("pos"), F.col("line")),
                            )
                        )
                    ),
                    lambda s: s.getField("line"),
                ),
                delimiter,
            ).alias(text_col),
            F.sum(
                (F.col("n_occurrences") <= max_occurrences).cast("long")
            ).alias("n_lines_kept"),
            F.sum(
                (F.col("n_occurrences") > max_occurrences).cast("long")
            ).alias("n_lines_dropped"),
        )
    )
    return rebuilt
