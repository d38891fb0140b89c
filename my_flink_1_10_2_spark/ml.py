"""flink-ml pipeline / params API (ref: flink-ml-parent/flink-ml-api/
src/main/java/org/apache/flink/ml/api/core/{Pipeline,Estimator,
Transformer,Model,PipelineStage}.java and api/misc/param/{Params,
ParamInfo,ParamInfoFactory,WithParams}.java; lib counterpart
flink-ml-lib/.../pipeline/{EstimatorBase,TransformerBase,ModelBase}.java,
common/MLEnvironment.java, MLEnvironmentFactory.java).

In 1.10 flink-ml is a parameter-plumbing + pipeline-composition skeleton
with no shipped algorithms — this module reproduces that surface
Spark-first, with the same contracts:

- ``Params``: typed key-value store with JSON round-trip, merge, clone;
  ``ParamInfo`` carries name/aliases/default/optional/validator.
- ``PipelineStage`` subclasses (``Estimator``/``Transformer``/``Model``)
  persist as {stageClassName, stageJson} and restore by class path.
- ``Pipeline``: linear stage chain that is itself an Estimator,
  Transformer AND Model; ``fit`` trains every estimator up to the last
  one (transforming the training table through each fitted model, ref
  Pipeline.java#fit) and returns a pipeline of pure transformers;
  ``transform`` refuses when an estimator is still unfitted.
- ``MLEnvironment`` / ``MLEnvironmentFactory``: id-keyed execution
  contexts (ref HasMLEnvironmentId default 0).

Tables: stages accept this repo's ``Table`` (table.py) or a raw Spark
DataFrame and return the same kind — the t_env parameter mirrors the
reference signature ``fit(TableEnvironment, Table)``.

Two concrete Spark-backed stages ship as the executable proof (the
reference's own tests use trivial stages the same way): a standard-
scaler estimator (two-phase JVM aggregate -> broadcast model) and a
binarizer transformer (codegen expression) — both distributed, no
Python in the row path.
"""

from __future__ import annotations

import importlib
import json
from typing import Any, Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# params (ref: flink-ml-api .../misc/param/ParamInfo.java, Params.java)
# ---------------------------------------------------------------------------


class ParamInfo:
    """Definition of a parameter: name, aliases, description, optional
    flag, default (ref ParamInfo.java; ParamInfoFactory's builder is the
    keyword surface here)."""

    def __init__(
        self,
        name: str,
        description: str = "",
        *,
        aliases: tuple[str, ...] = (),
        has_default: bool = False,
        default: Any = None,
        optional: bool = True,
        validator: Callable[[Any], bool] | None = None,
    ):
        self.name = name
        self.aliases = tuple(aliases)
        self.description = description
        self.has_default = has_default
        self.default = default
        self.optional = optional
        self.validator = validator

    def __repr__(self) -> str:  # pragma: no cover
        return f"ParamInfo({self.name!r})"


class Params:
    """Typed map from ParamInfo to value with JSON round-trip (ref
    Params.java: get honors aliases and defaults, set validates, toJson
    stores each value JSON-encoded under the param name)."""

    def __init__(self) -> None:
        self._m: dict[str, Any] = {}

    def size(self) -> int:
        return len(self._m)

    def is_empty(self) -> bool:
        return not self._m

    def clear(self) -> None:
        self._m.clear()

    def set(self, info: ParamInfo, value: Any) -> "Params":
        if info.validator is not None and not info.validator(value):
            raise ValueError(
                f"Setting {info.name} as a invalid value:{value}"
            )
        self._m[info.name] = value
        return self

    def get(self, info: ParamInfo) -> Any:
        for key in (info.name, *info.aliases):
            if key in self._m:
                return self._m[key]
        if info.has_default:
            return info.default
        if info.optional:
            return None
        raise KeyError(
            f"Cannot find default value for optional=False parameter {info.name}"
        )

    def contains(self, info: ParamInfo) -> bool:
        return any(k in self._m for k in (info.name, *info.aliases))

    def remove(self, info: ParamInfo) -> None:
        self._m.pop(info.name, None)
        for a in info.aliases:
            self._m.pop(a, None)

    def merge(self, other: "Params | None") -> "Params":
        if other is not None:
            self._m.update(other._m)
        return self

    def clone(self) -> "Params":
        out = Params()
        out._m = dict(self._m)
        return out

    # ref Params.java#toJson: {name: json-encoded value}
    def to_json(self) -> str:
        return json.dumps(
            {k: json.dumps(v) for k, v in self._m.items()}, sort_keys=True
        )

    def load_json(self, s: str) -> None:
        self._m = {k: json.loads(v) for k, v in json.loads(s).items()}

    @staticmethod
    def from_json(s: str) -> "Params":
        p = Params()
        p.load_json(s)
        return p


class WithParams:
    """Mixin giving a stage its Params handle plus typed get/set (ref
    WithParams.java)."""

    def get_params(self) -> Params:
        if not hasattr(self, "_params"):
            self._params = Params()
        return self._params

    def set(self, info: ParamInfo, value: Any):
        self.get_params().set(info, value)
        return self

    def get(self, info: ParamInfo) -> Any:
        return self.get_params().get(info)


# ---------------------------------------------------------------------------
# pipeline stages (ref: flink-ml-api .../core/*.java)
# ---------------------------------------------------------------------------


def _to_df(table) -> DataFrame:
    return table.to_df() if hasattr(table, "to_df") else table


def _like(table, df: DataFrame):
    if hasattr(table, "to_df"):
        return type(table)(df)
    return df


class PipelineStage(WithParams):
    """Base stage: params-backed JSON persistence (ref
    PipelineStage.java toJson/loadJson persist the Params)."""

    def __init__(self, params: Params | None = None):
        self._params = params.clone() if params is not None else Params()

    def to_json(self) -> str:
        return self.get_params().to_json()

    def load_json(self, s: str) -> None:
        self.get_params().load_json(s)


class Transformer(PipelineStage):
    """A stage that maps a table to a table (ref Transformer.java)."""

    def transform(self, t_env, table):
        raise NotImplementedError


class Model(Transformer):
    """A transformer produced by fitting an estimator (ref Model.java)."""


class Estimator(PipelineStage):
    """A stage fit on a table to produce a Model (ref Estimator.java)."""

    def fit(self, t_env, table) -> Model:
        raise NotImplementedError


def _stage_class_name(stage: PipelineStage) -> str:
    cls = type(stage)
    return f"{cls.__module__}.{cls.__qualname__}"


def _load_stage(class_name: str, stage_json: str) -> PipelineStage:
    mod, _, qual = class_name.rpartition(".")
    obj: Any = importlib.import_module(mod)
    for part in qual.split("."):
        obj = getattr(obj, part)
    stage = obj()
    stage.load_json(stage_json)
    return stage


class Pipeline(Estimator, Model):  # Model already extends Transformer
    """Linear chain of stages; Estimator, Transformer and Model at once
    (ref Pipeline.java — fit/transform/appendStage/needFit semantics and
    the {stageClassName, stageJson} persistence format)."""

    def __init__(self, stages_or_json=None):
        super().__init__()
        self._stages: list[PipelineStage] = []
        self._last_estimator_index = -1
        if isinstance(stages_or_json, str):
            self.load_json(stages_or_json)
        elif stages_or_json is not None:
            for s in stages_or_json:
                self.append_stage(s)

    @staticmethod
    def _stage_needs_fit(stage: PipelineStage) -> bool:
        if isinstance(stage, Pipeline):
            return stage.need_fit()
        return isinstance(stage, Estimator)

    def append_stage(self, stage: PipelineStage) -> "Pipeline":
        if self._stage_needs_fit(stage):
            self._last_estimator_index = len(self._stages)
        elif not isinstance(stage, Transformer):
            raise RuntimeError(
                "All PipelineStages should be Estimator or Transformer, got:"
                + type(stage).__name__
            )
        self._stages.append(stage)
        return self

    def get_stages(self) -> tuple[PipelineStage, ...]:
        return tuple(self._stages)

    def need_fit(self) -> bool:
        return self._last_estimator_index >= 0

    def fit(self, t_env, table) -> "Pipeline":
        out: list[PipelineStage] = []
        for i, s in enumerate(self._stages):
            if i <= self._last_estimator_index:
                if self._stage_needs_fit(s):
                    t: Transformer = s.fit(t_env, table)  # type: ignore[union-attr]
                else:
                    t = s  # type: ignore[assignment]
                out.append(t)
                table = t.transform(t_env, table)
            else:
                out.append(s)
        return Pipeline(out)

    def transform(self, t_env, table):
        if self.need_fit():
            raise RuntimeError("Pipeline contains Estimator, need to fit first.")
        for s in self._stages:
            table = s.transform(t_env, table)  # type: ignore[union-attr]
        return table

    def to_json(self) -> str:
        return json.dumps(
            [
                {"stageClassName": _stage_class_name(s), "stageJson": s.to_json()}
                for s in self._stages
            ]
        )

    def load_json(self, s: str) -> None:
        self._stages, self._last_estimator_index = [], -1
        for entry in json.loads(s):
            self.append_stage(
                _load_stage(entry["stageClassName"], entry["stageJson"])
            )


# ---------------------------------------------------------------------------
# MLEnvironment (ref: flink-ml-lib .../common/MLEnvironment.java,
# MLEnvironmentFactory.java — id-keyed contexts, default id 0)
# ---------------------------------------------------------------------------


class MLEnvironment:
    def __init__(self, t_env=None):
        self.t_env = t_env

    def get_table_environment(self):
        if self.t_env is None:
            from my_flink_1_10_2_spark.session import TableEnvironment

            self.t_env = TableEnvironment()
        return self.t_env


class MLEnvironmentFactory:
    DEFAULT_ML_ENVIRONMENT_ID = 0
    _envs: dict[int, MLEnvironment] = {}
    _next = 1

    @classmethod
    def get(cls, env_id: int = 0) -> MLEnvironment:
        if env_id not in cls._envs:
            if env_id != cls.DEFAULT_ML_ENVIRONMENT_ID:
                raise ValueError(
                    f"Cannot find MLEnvironment for MLEnvironmentId {env_id}."
                    " Did you get the MLEnvironmentId by calling"
                    " get_new_ml_environment_id?"
                )
            cls._envs[env_id] = MLEnvironment()
        return cls._envs[env_id]

    @classmethod
    def get_default(cls) -> MLEnvironment:
        return cls.get(cls.DEFAULT_ML_ENVIRONMENT_ID)

    @classmethod
    def get_new_ml_environment_id(cls) -> int:
        env_id = cls._next
        cls._next += 1
        cls._envs[env_id] = MLEnvironment()
        return env_id

    @classmethod
    def register_ml_environment(cls, env: MLEnvironment) -> int:
        env_id = cls._next
        cls._next += 1
        cls._envs[env_id] = env
        return env_id

    @classmethod
    def remove(cls, env_id: int) -> MLEnvironment | None:
        if env_id == cls.DEFAULT_ML_ENVIRONMENT_ID:
            return cls._envs.get(env_id)  # default env is never removed
        return cls._envs.pop(env_id, None)


# ---------------------------------------------------------------------------
# shared param infos (ref: flink-ml-lib .../params/shared/colname/*.java)
# ---------------------------------------------------------------------------

SELECTED_COL = ParamInfo("selectedCol", "name of the selected column", optional=False)
OUTPUT_COL = ParamInfo("outputCol", "name of the output column", optional=False)
RESERVED_COLS = ParamInfo(
    "reservedCols", "names of the columns to keep", has_default=True, default=None
)
THRESHOLD = ParamInfo(
    "threshold", "binarize threshold", has_default=True, default=0.0
)
WITH_MEAN = ParamInfo("withMean", "center to zero mean", has_default=True, default=True)
WITH_STD = ParamInfo("withStd", "scale to unit std", has_default=True, default=True)
ML_ENVIRONMENT_ID = ParamInfo(
    "MLEnvironmentId", "ID of the ML environment", has_default=True, default=0
)


# ---------------------------------------------------------------------------
# concrete Spark-backed stages — the executable proof of the API
# ---------------------------------------------------------------------------


class Binarizer(Transformer):
    """value > threshold -> 1.0 else 0.0, as a pure codegen expression
    (the canonical trivial Transformer; params: selectedCol, outputCol,
    threshold)."""

    def transform(self, t_env, table):
        df = _to_df(table)
        col = self.get(SELECTED_COL)
        out = self.get(OUTPUT_COL) or col
        thr = float(self.get(THRESHOLD))
        return _like(
            table,
            df.withColumn(
                out,
                F.when(F.col(col).cast("double") > F.lit(thr), 1.0).otherwise(0.0),
            ),
        )


class StandardScalerModel(Model):
    """(x - mean) / std with the fitted moments as params, so the model
    JSON-round-trips like any stage; transform is one JVM projection."""

    MEAN = ParamInfo("mean", "fitted mean", has_default=True, default=0.0)
    STD = ParamInfo("std", "fitted std", has_default=True, default=1.0)

    def transform(self, t_env, table):
        df = _to_df(table)
        col = self.get(SELECTED_COL)
        out = self.get(OUTPUT_COL) or col
        mean = float(self.get(self.MEAN)) if self.get(WITH_MEAN) else 0.0
        std = float(self.get(self.STD)) if self.get(WITH_STD) else 1.0
        expr = (F.col(col).cast("double") - F.lit(mean)) / F.lit(std if std else 1.0)
        return _like(table, df.withColumn(out, expr))


class StandardScaler(Estimator):
    """Fit = one two-phase aggregate; the model carries the scalars.

    Float discipline: over INTEGRAL columns the moments come from exact
    DECIMAL(38,0) sums folded with a fixed IEEE chain —
    ``m = double(s1)/double(n)``,
    ``var = (double(n)*double(s2) - double(s1)^2) / double(n)^2`` —
    so the fitted mean/std are BITWISE reproducible across engines and
    partitionings (the repo's oracle protocol; a plain double
    avg/stddev would be partial-aggregation-order dependent).  Float
    columns fall back to avg/stddev_pop (documented non-bitwise)."""

    def fit(self, t_env, table) -> StandardScalerModel:
        import math

        df = _to_df(table)
        col = self.get(SELECTED_COL)
        dtype = dict(df.dtypes)[col]
        model = StandardScalerModel(self.get_params())
        if dtype in ("tinyint", "smallint", "int", "bigint"):
            c = F.col(col).cast("decimal(38,0)")
            row = df.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(c).alias("s1"),
                F.sum((c * c).cast("decimal(38,0)")).alias("s2"),
            ).first()
            n, s1, s2 = int(row["n"]), int(row["s1"]), int(row["s2"])
            mean = float(s1) / float(n)
            var = (float(n) * float(s2) - float(s1) * float(s1)) / (
                float(n) * float(n)
            )
            std = math.sqrt(var)
        else:
            row = df.agg(
                F.avg(F.col(col).cast("double")).alias("m"),
                F.stddev_pop(F.col(col).cast("double")).alias("s"),
            ).first()
            mean, std = float(row["m"]), float(row["s"])
        model.set(StandardScalerModel.MEAN, mean)
        model.set(StandardScalerModel.STD, std)
        return model
