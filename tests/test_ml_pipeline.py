"""Spark ML Pipeline integration: the adapter stages must compose in
pyspark.ml.Pipeline with VectorAssembler, round-trip predictions, and
persist through the ML writer protocol (reference
ml/GeneralizedKMeans.scala:178 + python wrapper kmeans.py:211-330)."""

import os
import sys

import pytest
from pyspark.ml import Pipeline, PipelineModel
from pyspark.ml.feature import VectorAssembler
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from generalized_kmeans_clustering_spark.ml import (
    GeneralizedKMeans, GeneralizedKMeansModel,
)


@pytest.fixture(scope="module")
def scalar_df(spark):
    rows = [(float(i % 4) * 10 + j * 0.1, float((i * 7) % 5), float(i % 3))
            for i in range(60) for j in range(1)]
    return spark.createDataFrame(rows, "x double, y double, z double")


def test_pipeline_fit_transform(scalar_df):
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=["x", "y", "z"], outputCol="features"),
        GeneralizedKMeans(k=4, maxIter=5, seed=7),
    ])
    model = pipe.fit(scalar_df)
    assert isinstance(model, PipelineModel)
    out = model.transform(scalar_df)
    assert "prediction" in out.columns
    preds = out.select("prediction").distinct().count()
    assert 1 <= preds <= 4
    assert out.count() == scalar_df.count()


def test_estimator_params_and_copy(scalar_df):
    est = GeneralizedKMeans(k=3, divergence="kl", maxIter=4, seed=1)
    assert est.getK() == 3
    assert est.getDivergence() == "kl"
    est2 = est.copy()
    assert est2.getK() == 3
    est.setK(5)
    assert est.getK() == 5 and est2.getK() == 3


def test_model_surface(scalar_df):
    assembled = VectorAssembler(
        inputCols=["x", "y", "z"], outputCol="features"
    ).transform(scalar_df)
    model = GeneralizedKMeans(k=3, maxIter=5, seed=3)._fit(assembled)
    assert isinstance(model, GeneralizedKMeansModel)
    assert model.clusterCenters.shape == (3, 3)
    assert model.computeCost(assembled) >= 0.0
    assert 0 <= model.predict([1.0, 2.0, 0.0]) < 3
    assert model.summary.iterations >= 1


def test_model_ml_persistence(scalar_df, tmp_path, spark):
    assembled = VectorAssembler(
        inputCols=["x", "y", "z"], outputCol="features"
    ).transform(scalar_df)
    model = GeneralizedKMeans(k=3, maxIter=5, seed=3)._fit(assembled)
    path = str(tmp_path / "mlmodel")
    model.write().save(path)
    loaded = GeneralizedKMeansModel.read().load(path)
    assert loaded.clusterCenters.tolist() == model.clusterCenters.tolist()
    a = model.transform(assembled).select("prediction").collect()
    b = loaded.transform(assembled).select("prediction").collect()
    assert a == b


def test_divergence_pipeline(scalar_df):
    # positive features for KL
    df = scalar_df.select(
        (F.col("x") + 1.0).alias("x"), (F.col("y") + 1.0).alias("y"),
        (F.col("z") + 1.0).alias("z"),
    )
    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=["x", "y", "z"], outputCol="features"),
        GeneralizedKMeans(k=2, divergence="kl", maxIter=3, seed=5),
    ])
    out = pipe.fit(df).transform(df)
    assert out.where(F.col("prediction").isNull()).count() == 0


def test_feature_transformer_stage(scalar_df, tmp_path):
    """FeatureTransformer composes in a Pipeline ahead of the estimator
    and round-trips through the ML params writer."""
    import numpy as np
    from pyspark.ml import Pipeline
    from pyspark.ml.feature import VectorAssembler

    from generalized_kmeans_clustering_spark.ml import (
        FeatureTransformer, GeneralizedKMeans,
    )

    pipe = Pipeline(stages=[
        VectorAssembler(inputCols=["x", "y"], outputCol="raw"),
        FeatureTransformer(transformName="kl", inputCol="raw",
                           outputCol="features"),
        GeneralizedKMeans(k=2, divergence="kl", maxIter=3, seed=0,
                          initMode="random"),
    ])
    model = pipe.fit(scalar_df)
    out = model.transform(scalar_df)
    assert "prediction" in out.columns
    assert out.count() == scalar_df.count()

    # transformed column matches the numpy twin
    ft = FeatureTransformer(transformName="log1p", inputCol="raw",
                            outputCol="t")
    va = VectorAssembler(inputCols=["x", "y"], outputCol="raw")
    rows = ft.transform(va.transform(scalar_df)).select("raw", "t").collect()
    for r in rows[:5]:
        assert np.allclose(np.array(r["t"]), np.log1p(np.array(r["raw"])))

    # params persistence round-trip
    p = str(tmp_path / "ft_stage")
    ft.write().overwrite().save(p)
    back = FeatureTransformer.load(p)
    assert back.getTransformName() == "log1p"
    assert back.getOrDefault(back.outputCol) == "t"
