"""PyFlink-1.10 module aliases — run a reference-shaped program verbatim.

``install_pyflink_aliases()`` registers ``pyflink``-named module aliases
in ``sys.modules`` mapping the PyFlink 1.10 import surface (ref:
flink-python/pyflink/{dataset,datastream,table}/__init__.py) onto this
engine's classes, so a migrating user's program text — ``from
pyflink.table import BatchTableEnvironment, TableConfig`` and the rest —
imports and runs unchanged.  Nothing is installed unless the caller asks
(and never over a real PyFlink installation unless ``force=True``).

The Flink-1.10 API differences the aliases adapt:

- ``BatchTableEnvironment.create(env, table_config)`` /
  ``StreamTableEnvironment.create(env[, settings])`` take the
  (Stream)ExecutionEnvironment first — adapted onto
  ``TableEnvironment.create``.
- ``Table.insert_into("sink")`` carries no environment — tables returned
  through the alias environment are wrapped so ``insert_into`` binds the
  creating environment (the reference resolves the sink through the
  table's bound env the same way).
"""

from __future__ import annotations

import sys
import types


class _BoundTable:
    """Thin proxy binding a Table to its environment so the PyFlink
    ``insert_into(path)`` signature works; every chained call that
    returns a Table/GroupedTable stays wrapped."""

    def __init__(self, inner, env):
        object.__setattr__(self, "_inner", inner)
        object.__setattr__(self, "_env", env)

    def insert_into(self, table_path: str):
        return self._inner.insert_into(self._env, table_path)

    def __getattr__(self, name):
        attr = getattr(self._inner, name)
        if not callable(attr):
            return attr
        env = self._env

        def call(*args, **kwargs):
            out = attr(*args, **kwargs)
            return _wrap(out, env)

        return call


def _wrap(value, env):
    from my_flink_1_10_2_spark.operators.windows import (
        GroupWindowedTable,
        OverWindowedTable,
        WindowGroupedTable,
    )
    from my_flink_1_10_2_spark.table import GroupedTable, Table

    if isinstance(
        value,
        (Table, GroupedTable, GroupWindowedTable, WindowGroupedTable,
         OverWindowedTable),
    ):
        return _BoundTable(value, env)
    return value


class _AliasedTableEnvironment:
    """Wraps TableEnvironment: delegates everything, rewraps returned
    tables, and accepts the 1.10 ``create(env[, config_or_settings])``
    calling conventions."""

    def __init__(self, env):
        self._env = env

    @classmethod
    def create(cls, first=None, second=None, **kwargs):
        from my_flink_1_10_2_spark.config import EnvironmentSettings, TableConfig
        from my_flink_1_10_2_spark.session import TableEnvironment

        settings = None
        config = None
        spark = None
        for arg in (first, second):
            if arg is None:
                continue
            if isinstance(arg, EnvironmentSettings):
                settings = arg
            elif isinstance(arg, TableConfig):
                config = arg
            else:  # (Stream)ExecutionEnvironment — reuse its session
                spark = getattr(arg, "spark", None)
        env = TableEnvironment.create(
            environment_settings=settings, table_config=config, spark=spark,
            **kwargs,
        )
        return cls(env)

    def __getattr__(self, name):
        attr = getattr(self._env, name)
        if not callable(attr):
            return attr
        env = self._env

        def call(*args, **kwargs):
            # unwrap proxied tables passed back in (e.g. insert_into)
            args = tuple(
                a._inner if isinstance(a, _BoundTable) else a for a in args
            )
            out = attr(*args, **kwargs)
            return _wrap(out, env)

        return call


def _module(name: str, **attrs) -> types.ModuleType:
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def install_pyflink_aliases(force: bool = False) -> None:
    """Register the ``pyflink.*`` alias modules.  Refuses to shadow a
    real PyFlink installation unless ``force=True``."""
    if not force and "pyflink" in sys.modules:
        if getattr(sys.modules["pyflink"], "__spark_graft_alias__", False):
            return  # already installed — idempotent no-op (a second
            # find_spec pass would crash on the spec-less alias module)
        raise RuntimeError(
            "a real pyflink module is already imported; pass force=True "
            "to shadow it"
        )
    import importlib.util

    if not force and importlib.util.find_spec("pyflink") is not None:
        raise RuntimeError(
            "a real PyFlink installation exists on this interpreter; "
            "pass force=True to shadow it"
        )

    from my_flink_1_10_2_spark.config import EnvironmentSettings, TableConfig
    from my_flink_1_10_2_spark.descriptors import (
        Csv,
        FileSystem,
        Json,
        Kafka,
        OldCsv,
        Rowtime,
        Schema,
    )
    from my_flink_1_10_2_spark.environment import ExecutionEnvironment
    from my_flink_1_10_2_spark.functions.udf_api import ScalarFunction, udf
    from my_flink_1_10_2_spark.operators.windows import Over, Session, Slide, Tumble
    from my_flink_1_10_2_spark.streaming import StreamExecutionEnvironment
    from my_flink_1_10_2_spark.table import Table
    from my_flink_1_10_2_spark.types import DataTypes

    class BatchTableEnvironment(_AliasedTableEnvironment):
        pass

    class StreamTableEnvironment(_AliasedTableEnvironment):
        pass

    root = _module("pyflink")
    root.__spark_graft_alias__ = True
    _module("pyflink.dataset", ExecutionEnvironment=ExecutionEnvironment)
    _module(
        "pyflink.datastream",
        StreamExecutionEnvironment=StreamExecutionEnvironment,
    )
    table_mod = _module(
        "pyflink.table",
        TableConfig=TableConfig,
        EnvironmentSettings=EnvironmentSettings,
        BatchTableEnvironment=BatchTableEnvironment,
        StreamTableEnvironment=StreamTableEnvironment,
        DataTypes=DataTypes,
        Table=Table,
    )
    _module("pyflink.table.udf", udf=udf, ScalarFunction=ScalarFunction)
    _module(
        "pyflink.table.descriptors",
        Schema=Schema,
        OldCsv=OldCsv,
        Csv=Csv,
        Json=Json,
        FileSystem=FileSystem,
        Kafka=Kafka,
        Rowtime=Rowtime,
    )
    _module(
        "pyflink.table.window",
        Tumble=Tumble,
        Slide=Slide,
        Session=Session,
        Over=Over,
    )
    root.dataset = sys.modules["pyflink.dataset"]
    root.datastream = sys.modules["pyflink.datastream"]
    root.table = table_mod


def uninstall_pyflink_aliases() -> None:
    # decide ONCE off the root marker — checking inside the loop would
    # stop removing submodules after the root itself is deleted
    if not getattr(sys.modules.get("pyflink"), "__spark_graft_alias__", False):
        return
    for name in [m for m in sys.modules if m == "pyflink" or m.startswith("pyflink.")]:
        del sys.modules[name]
