"""flink-ml pipeline/params API (my_flink_1_10_2_spark/ml.py) — behaviors
mirrored from the reference's own tests (ref: flink-ml-api/src/test/java/
org/apache/flink/ml/api/{core/PipelineTest.java, misc/ParamsTest.java})
plus the Spark-backed concrete stages."""

from __future__ import annotations

import math

import pytest

from my_flink_1_10_2_spark.ml import (
    OUTPUT_COL,
    SELECTED_COL,
    THRESHOLD,
    Binarizer,
    Estimator,
    MLEnvironmentFactory,
    Model,
    ParamInfo,
    Params,
    Pipeline,
    StandardScaler,
    StandardScalerModel,
    Transformer,
)


# -- Params (ref ParamsTest.java) -------------------------------------------


def test_params_set_get_default_alias_remove():
    k = ParamInfo("k", has_default=True, default=7)
    alias = ParamInfo("key", aliases=("k",))
    required = ParamInfo("req", optional=False)
    p = Params()
    assert p.get(k) == 7  # default
    p.set(k, 3)
    assert p.get(k) == 3 and p.size() == 1 and p.contains(k)
    assert p.get(alias) == 3  # alias resolution
    with pytest.raises(KeyError):
        p.get(required)  # non-optional without default raises
    p.remove(k)
    assert p.is_empty()


def test_params_validator_and_json_roundtrip():
    pos = ParamInfo("n", validator=lambda v: v > 0)
    p = Params()
    with pytest.raises(ValueError, match="invalid value"):
        p.set(pos, -1)
    p.set(pos, 5)
    p.set(ParamInfo("name"), "abc")
    q = Params.from_json(p.to_json())
    assert q.get(pos) == 5 and q.get(ParamInfo("name")) == "abc"
    merged = Params().merge(q)
    assert merged.size() == 2
    c = q.clone()
    c.clear()
    assert q.size() == 2 and c.is_empty()


# -- Pipeline mechanics (ref PipelineTest.java) ------------------------------


class _Suffix(Transformer):
    """Appends params['sfx'] to a marker list — order-observable."""

    SFX = ParamInfo("sfx", has_default=True, default="?")

    def transform(self, t_env, table):
        return table + [self.get(self.SFX)]


class _Learn(Estimator):
    """fit() records the training input length into its model."""

    def fit(self, t_env, table):
        m = _Learned()
        m.set(ParamInfo("seen"), len(table))
        return m


class _Learned(Model):
    def transform(self, t_env, table):
        return table + [("seen", self.get(ParamInfo("seen")))]


def test_pipeline_fit_transform_order_and_need_fit():
    p = Pipeline()
    p.append_stage(_Suffix().set(_Suffix.SFX, "a"))
    p.append_stage(_Learn())
    p.append_stage(_Suffix().set(_Suffix.SFX, "b"))
    assert p.need_fit()
    with pytest.raises(RuntimeError, match="need to fit first"):
        p.transform(None, [])
    fitted = p.fit(None, [1, 2, 3])
    assert not fitted.need_fit()
    out = fitted.transform(None, [0])
    # the estimator saw the table AFTER the first transformer (4 rows)
    assert out == [0, "a", ("seen", 4), "b"]


def test_pipeline_without_estimator_is_a_transformer():
    p = Pipeline([_Suffix().set(_Suffix.SFX, "x")])
    assert not p.need_fit()
    assert p.fit(None, []) is not p  # fit returns a copy (ref contract)
    assert p.transform(None, []) == ["x"]


def test_pipeline_rejects_non_stage():
    class NotAStage:  # neither Estimator nor Transformer
        pass

    with pytest.raises(RuntimeError, match="should be Estimator or Transformer"):
        Pipeline().append_stage(NotAStage())


def test_nested_pipeline_needing_fit_counts_as_estimator():
    inner = Pipeline([_Learn()])
    outer = Pipeline([inner])
    assert outer.need_fit()
    fitted = outer.fit(None, [1])
    assert fitted.transform(None, []) == [("seen", 1)]


def test_pipeline_json_roundtrip_restores_stages_and_params():
    p = Pipeline([
        Binarizer().set(SELECTED_COL, "v").set(OUTPUT_COL, "b").set(THRESHOLD, 2.5),
    ])
    q = Pipeline(p.to_json())
    (stage,) = q.get_stages()
    assert isinstance(stage, Binarizer)
    assert stage.get(THRESHOLD) == 2.5 and stage.get(SELECTED_COL) == "v"
    assert q.to_json() == p.to_json()


def test_ml_environment_factory_ids():
    default = MLEnvironmentFactory.get_default()
    assert MLEnvironmentFactory.get(0) is default
    new_id = MLEnvironmentFactory.get_new_ml_environment_id()
    assert MLEnvironmentFactory.get(new_id) is not default
    MLEnvironmentFactory.remove(new_id)
    with pytest.raises(ValueError, match="Cannot find MLEnvironment"):
        MLEnvironmentFactory.get(new_id)


# -- Spark-backed stages ------------------------------------------------------


def test_standard_scaler_pipeline_over_spark_table(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 11)], "v bigint")
    pipe = Pipeline([
        StandardScaler().set(SELECTED_COL, "v").set(OUTPUT_COL, "z"),
        Binarizer().set(SELECTED_COL, "z").set(OUTPUT_COL, "hi").set(THRESHOLD, 0.0),
    ])
    fitted = pipe.fit(None, df)
    out = {r.v: (r.z, r.hi) for r in fitted.transform(None, df).collect()}
    mean, std = 5.5, math.sqrt(8.25)  # population moments of 1..10
    for v, (z, hi) in out.items():
        assert z == pytest.approx((v - mean) / std, rel=1e-12)
        assert hi == (1.0 if z > 0 else 0.0)
    # the fitted scaler model carries bitwise-reproducible scalars
    scaler = fitted.get_stages()[0]
    assert isinstance(scaler, StandardScalerModel)
    assert scaler.get(StandardScalerModel.MEAN) == mean


def test_fitted_pipeline_json_roundtrip_transforms_identically(spark):
    df = spark.createDataFrame([(i,) for i in range(20)], "v bigint")
    pipe = Pipeline([StandardScaler().set(SELECTED_COL, "v").set(OUTPUT_COL, "z")])
    fitted = pipe.fit(None, df)
    restored = Pipeline(fitted.to_json())
    a = [r.z for r in fitted.transform(None, df).orderBy("v").collect()]
    b = [r.z for r in restored.transform(None, df).orderBy("v").collect()]
    assert a == b  # bitwise: persisted params reproduce the projection
