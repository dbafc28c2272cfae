"""Persistence round-trips: save → load → identical transforms
(reference ml/PersistenceSuite / ExtendedPersistenceSuite model)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark import (
    GeneralizedKMeans, GeneralizedKMeansModel, SoftKMeans, BregmanMixture,
    RobustKMeans, SparseKMeans,
)
from generalized_kmeans_clustering_spark.persistence import load_model
from generalized_kmeans_clustering_spark.streaming.streaming_kmeans import (
    StreamingKMeansModel,
)


@pytest.fixture(scope="module")
def blobs(spark):
    rng = np.random.default_rng(131)
    pts = np.concatenate([
        rng.normal([0, 0], 0.4, (60, 2)), rng.normal([7, 7], 0.4, (60, 2)),
    ])
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    return df.cache()


def _same_transform(spark, m1, m2, df, cols=("prediction",)):
    a = m1.transform(df).select(*cols).collect()
    b = m2.transform(df).select(*cols).collect()
    assert a == b


def test_base_model_roundtrip(spark, blobs, tmp_path):
    path = str(tmp_path / "base")
    m = GeneralizedKMeans(k=2, seed=11, max_iter=10, divergence="kl").fit(
        blobs.select(F.transform("features", lambda v: F.abs(v) + 0.1)
                     .alias("features"))
    )
    m.save(spark, path)
    m2 = load_model(spark, path)
    assert type(m2) is GeneralizedKMeansModel
    assert np.allclose(m.centers, m2.centers)
    assert m2.kernel_name == "kl"
    df_pos = blobs.select(
        F.transform("features", lambda v: F.abs(v) + 0.1).alias("features")
    )
    _same_transform(spark, m, m2, df_pos)


def test_corrupted_checksum_rejected(spark, blobs, tmp_path):
    import json, os

    path = str(tmp_path / "bad")
    m = GeneralizedKMeans(k=2, seed=11, max_iter=5).fit(blobs)
    m.save(spark, path)
    meta = json.load(open(os.path.join(path, "metadata.json")))
    meta["checksums"]["centers_sha256"] = "0" * 64
    json.dump(meta, open(os.path.join(path, "metadata.json"), "w"))
    with pytest.raises(IOError):
        load_model(spark, path)


def test_soft_model_roundtrip(spark, blobs, tmp_path):
    path = str(tmp_path / "soft")
    m = SoftKMeans(k=2, beta=2.5, min_membership=0.01, seed=13,
                   max_iter=8).fit(blobs)
    m.save(spark, path)
    m2 = load_model(spark, path)
    assert m2.beta == 2.5
    assert m2.min_membership == 0.01
    _same_transform(spark, m, m2, blobs, cols=("prediction", "probability"))
    assert np.allclose(m.predict_soft([1.0, 1.0]), m2.predict_soft([1.0, 1.0]))


def test_mixture_model_roundtrip(spark, blobs, tmp_path):
    path = str(tmp_path / "mix")
    m = BregmanMixture(k=2, seed=17, max_iter=10).fit(blobs)
    m.save(spark, path)
    m2 = load_model(spark, path)
    assert np.allclose(m.weights, m2.weights)
    assert m2.log_likelihood == pytest.approx(m.log_likelihood)
    _same_transform(spark, m, m2, blobs, cols=("prediction", "probability"))


def test_robust_model_roundtrip(spark, blobs, tmp_path):
    path = str(tmp_path / "rob")
    m = RobustKMeans(k=2, outlier_mode="trim", outlier_fraction=0.1,
                     seed=19, max_iter=8).fit(blobs)
    m.save(spark, path)
    m2 = load_model(spark, path)
    assert m2.outlier_threshold == pytest.approx(m.outlier_threshold)
    _same_transform(spark, m, m2, blobs,
                    cols=("prediction", "outlier_score", "is_outlier"))


def test_sparse_model_roundtrip(spark, tmp_path):
    rows = [([0, 2], [5.0, 1.0]), ([1, 3], [4.0, 2.0]),
            ([0, 1], [0.5, 0.2]), ([2, 3], [0.1, 0.3])] * 10
    df = spark.createDataFrame(rows, "indices array<int>, values array<double>")
    m = SparseKMeans(k=2, dim=4, seed=23, max_iter=5,
                     sparse_mode="force").fit(df)
    path = str(tmp_path / "sparse")
    m.save(spark, path)
    m2 = load_model(spark, path)
    assert m2.indices_col == "indices"
    _same_transform(spark, m, m2, df)


def test_streaming_model_roundtrip(spark, blobs, tmp_path):
    path = str(tmp_path / "stream")
    m = StreamingKMeansModel(
        centers=np.array([[0.0, 0.0], [7.0, 7.0]]),
        weights=np.array([10.0, 20.0]), decay_factor=0.9,
    )
    m.update(blobs)
    m.save(spark, path)
    m2 = load_model(spark, path)
    assert np.allclose(m.weights, m2.weights)
    assert m2.decay_factor == 0.9
    _same_transform(spark, m, m2, blobs)
