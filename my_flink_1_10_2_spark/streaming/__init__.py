"""Streaming layer: DataStream-like API on Structured Streaming.

Mirrors the reference's streaming surface (SURVEY §2.5, §2.10):
watermarks, event-time windows, keyed state, dedup, interval joins,
retraction-aware output modes — re-expressed on Spark's micro-batch
engine (the reference's own MiniBatch optimization is Spark's native
execution model).
"""

from my_flink_1_10_2_spark.streaming.stream import Stream, StreamExecutionEnvironment

__all__ = ["Stream", "StreamExecutionEnvironment"]
