"""The ``udf`` decorator + ``ScalarFunction`` base (ref:
flink-python/pyflink/table/udf.py:197 ``udf(f, input_types,
result_type)``, :75 ``ScalarFunction.eval``).

The reference executes Python UDFs row-at-a-time through a Beam
sidecar; here they compile to **pandas UDFs** by default (Arrow-batched
— the 10-100× path) with ``udf_type="general"`` available for
functions whose logic is genuinely per-row.  Either kind is usable in
the Table API (`table.select(my_udf("col"))`) and registrable for SQL
via ``TableEnvironment.execute_sql("CREATE FUNCTION ...")`` or
``spark.udf.register``.
"""

from __future__ import annotations

from pyspark.sql import functions as F


class ScalarFunction:
    """ref: udf.py:75 — subclass and implement ``eval``; pass the
    instance to :func:`udf`."""

    def eval(self, *args):
        raise NotImplementedError

    def open(self, function_context=None) -> None:  # lifecycle parity
        pass

    def close(self) -> None:
        pass


def udf(f=None, input_types=None, result_type=None, deterministic=None,
        name=None, udf_type: str = "pandas"):
    """ref: udf.py:197.  Returns a callable usable in Table.select.

    - ``udf_type="pandas"`` (default): ``f`` receives pandas Series and
      must return a Series (vectorized — use this unless impossible).
    - ``udf_type="general"``: ``f`` receives scalars per row (the
      reference's semantics, slow path — Arrow still batches transfer).
    """

    def build(fn):
        target = fn
        if isinstance(fn, ScalarFunction):
            fn.open()
            target = fn.eval
        rt = result_type if result_type is not None else "string"
        if udf_type == "pandas":
            wrapped = F.pandas_udf(rt)(target)
        elif udf_type == "general":
            wrapped = F.udf(target, rt)
        else:
            raise ValueError(f"udf_type must be 'pandas' or 'general', got {udf_type!r}")
        if deterministic is False:
            wrapped = wrapped.asNondeterministic()
        return wrapped

    if f is None:
        return build  # decorator-with-arguments form
    return build(f)
