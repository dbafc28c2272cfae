"""Tests for StreamingKMeans: decay math, dying split, foreachBatch."""

import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.streaming.streaming_kmeans import (
    StreamingKMeans, StreamingKMeansModel,
)


def _mkdf(spark, pts):
    return spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )


def test_update_moves_centers_toward_batch(spark):
    m = StreamingKMeansModel(
        centers=np.array([[0.0, 0.0], [10.0, 10.0]]),
        weights=np.array([10.0, 10.0]),
    )
    rng = np.random.default_rng(101)
    batch = rng.normal([0.0, 0.0], 0.1, (20, 2)) + [1.0, 0.0]
    m.update(_mkdf(spark, batch))
    # cluster 0 pulled toward [1,0] by weight ratio 20/(10+20)
    assert m.centers[0][0] == pytest.approx(20.0 / 30.0, abs=0.1)
    assert m.weights[0] == pytest.approx(30.0)
    assert m.weights[1] == pytest.approx(10.0)  # untouched, no decay=1.0


def test_decay_factor_forgets_history(spark):
    m_nodecay = StreamingKMeansModel(
        centers=np.array([[0.0, 0.0]]), weights=np.array([100.0]),
        decay_factor=1.0,
    )
    m_decay = StreamingKMeansModel(
        centers=np.array([[0.0, 0.0]]), weights=np.array([100.0]),
        decay_factor=0.1,
    )
    batch = np.full((10, 2), 5.0)
    df = _mkdf(spark, batch)
    m_nodecay.update(df)
    m_decay.update(df)
    # decayed model forgets the 100-point prior faster → moves further
    assert m_decay.centers[0][0] > m_nodecay.centers[0][0]
    assert m_decay.centers[0][0] == pytest.approx(5.0 * 10 / 20.0, abs=0.01)


def test_half_life_sets_decay():
    est = StreamingKMeans(k=2, half_life=2.0)
    assert est.decay_factor == pytest.approx(0.5 ** 0.5)


def test_dying_cluster_split(spark):
    m = StreamingKMeansModel(
        centers=np.array([[0.0, 0.0], [50.0, 50.0]]),
        weights=np.array([1000.0, 1e-7]),
    )
    batch = np.random.default_rng(5).normal([0, 0], 0.1, (5, 2))
    m.update(_mkdf(spark, batch))
    # dead cluster re-seeded near the heavy one, weights split
    assert m.weights[0] == pytest.approx(m.weights[1])
    assert np.linalg.norm(m.centers[1] - [0, 0]) < 1.0


def test_fit_then_streaming_updater(spark, tmp_path):
    rng = np.random.default_rng(103)
    warm = np.concatenate([
        rng.normal([0, 0], 0.3, (40, 2)), rng.normal([8, 8], 0.3, (40, 2)),
    ])
    model = StreamingKMeans(k=2, seed=7, max_iter=10).fit(_mkdf(spark, warm))
    c0 = model.centers.copy()

    # stream: parquet-file source, two files of drifted data
    src = str(tmp_path / "stream_src")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(src, exist_ok=True)
    drift = np.concatenate([
        rng.normal([1.0, 0.0], 0.3, (50, 2)),
        rng.normal([9.0, 8.0], 0.3, (50, 2)),
    ])
    _mkdf(spark, drift).write.mode("overwrite").parquet(src)
    stream = (
        spark.readStream.schema("features array<double>").parquet(src)
    )
    updater = model.create_streaming_updater(checkpoint_dir=ckpt)
    q = updater.update_on(stream, trigger={"availableNow": True})
    q.awaitTermination(120)
    assert model.num_batches >= 1
    # centers drifted toward the new means
    moved = np.abs(model.centers - c0).sum()
    assert moved > 0.1
    # snapshot written and loadable
    m2 = StreamingKMeansModel.read_snapshot(spark, ckpt)
    assert np.allclose(m2.centers, model.centers)
    assert np.allclose(m2.weights, model.weights)


def test_transform_inherits_model_surface(spark):
    m = StreamingKMeansModel(
        centers=np.array([[0.0, 0.0], [10.0, 10.0]]),
        weights=np.array([1.0, 1.0]),
    )
    df = _mkdf(spark, [[0.1, 0.1], [9.9, 9.9]])
    out = m.transform(df).select("prediction").collect()
    assert [r["prediction"] for r in out] == [0, 1]
