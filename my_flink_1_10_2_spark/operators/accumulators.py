"""Accumulators / counters (ref: flink-core/src/main/java/org/apache/
flink/api/common/accumulators/ — IntCounter.java, LongCounter.java,
DoubleCounter.java, AverageAccumulator.java, Histogram.java,
ListAccumulator.java, IntMaximum/Minimum.java ...; registered through
RuntimeContext.addAccumulator and collected into the
JobExecutionResult by AccumulatorHelper.java).

Spark's accumulators are the exact analog: add-only on executors,
merged per task completion, readable on the driver.  Handles returned
here capture a PySpark ``Accumulator`` in their closure, so a user
function shipped into ``mapInPandas`` / ``foreachPartition`` /
``Table.map_with_broadcast`` can ``.add(...)`` from any worker, and the
driver reads the merged value after the action — the same lifecycle as
the reference's rich-function accumulators.

Scale note: accumulator traffic is O(tasks × accumulator size), never
O(rows); keep Histogram/ListAccumulator payloads bounded (the reference
carries the same caveat — SerializedListAccumulator.java warns about
result size).
"""

from __future__ import annotations

from pyspark import AccumulatorParam, SparkContext


class _DictSumParam(AccumulatorParam):
    """Histogram.java: value → count map, merged by per-key addition."""

    def zero(self, value):
        return {}

    def addInPlace(self, v1, v2):
        for k, n in v2.items():
            v1[k] = v1.get(k, 0) + n
        return v1


class _ListParam(AccumulatorParam):
    """ListAccumulator.java: concatenation merge."""

    def zero(self, value):
        return []

    def addInPlace(self, v1, v2):
        v1.extend(v2)
        return v1


class _PairSumParam(AccumulatorParam):
    """AverageAccumulator.java: (sum, count) pairs."""

    def zero(self, value):
        return (0.0, 0)

    def addInPlace(self, v1, v2):
        return (v1[0] + v2[0], v1[1] + v2[1])


class _ExtremumParam(AccumulatorParam):
    """IntMaximum/Minimum.java family."""

    def __init__(self, op, identity):
        self._op = op
        self._identity = identity

    def zero(self, value):
        return self._identity

    def addInPlace(self, v1, v2):
        return self._op(v1, v2)


class _Counter:
    """IntCounter/LongCounter/DoubleCounter (add + get)."""

    def __init__(self, acc):
        self._acc = acc

    def add(self, v) -> None:
        self._acc.add(v)

    def get_local_value(self):
        return self._acc.value


class _Histogram(_Counter):
    def add(self, value, count: int = 1) -> None:
        self._acc.add({value: count})


class _ListAccumulator(_Counter):
    def add(self, v) -> None:
        self._acc.add([v])


class _Average(_Counter):
    def add(self, v) -> None:
        self._acc.add((float(v), 1))

    def get_local_value(self) -> float:
        s, n = self._acc.value
        return s / n if n else 0.0


class AccumulatorRegistry:
    """Per-job accumulator namespace (ref: RuntimeContext.addAccumulator
    RuntimeContext.java:146 + AccumulatorHelper.toResultMap)."""

    def __init__(self, sc: SparkContext):
        self._sc = sc
        self._accs: dict[str, _Counter] = {}

    def _register(self, name: str, handle: _Counter) -> _Counter:
        if name in self._accs:
            raise ValueError(f"accumulator {name!r} already registered")
        self._accs[name] = handle
        return handle

    def int_counter(self, name: str) -> _Counter:
        return self._register(name, _Counter(self._sc.accumulator(0)))

    long_counter = int_counter  # Python ints are arbitrary precision

    def double_counter(self, name: str) -> _Counter:
        return self._register(name, _Counter(self._sc.accumulator(0.0)))

    def histogram(self, name: str) -> _Histogram:
        return self._register(name, _Histogram(self._sc.accumulator({}, _DictSumParam())))

    def list_accumulator(self, name: str) -> _ListAccumulator:
        return self._register(name, _ListAccumulator(self._sc.accumulator([], _ListParam())))

    def average(self, name: str) -> _Average:
        return self._register(name, _Average(self._sc.accumulator((0.0, 0), _PairSumParam())))

    def maximum(self, name: str) -> _Counter:
        return self._register(
            name, _Counter(self._sc.accumulator(float("-inf"), _ExtremumParam(max, float("-inf"))))
        )

    def minimum(self, name: str) -> _Counter:
        return self._register(
            name, _Counter(self._sc.accumulator(float("inf"), _ExtremumParam(min, float("inf"))))
        )

    def result_map(self) -> dict[str, object]:
        """AccumulatorHelper.toResultMap: every registered accumulator's
        merged value."""
        return {name: h.get_local_value() for name, h in self._accs.items()}
