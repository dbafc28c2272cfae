"""Per-violation-type domain validation messages (reference
util/DivergenceDomainValidator.scala:35-120) and elkan pruning
telemetry (AcceleratedSEAssignment.scala:199-232 accumulators)."""

import math
import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from generalized_kmeans_clustering_spark import GeneralizedKMeans


def _df(spark, rows):
    return spark.createDataFrame(
        [(list(map(float, r)),) for r in rows], "features array<double>"
    )


def test_kl_negative_message(spark):
    df = _df(spark, [[1.0, 2.0], [-0.5, 1.0], [3.0, 4.0]])
    with pytest.raises(ValueError) as e:
        GeneralizedKMeans(k=2, divergence="kl", max_iter=1).fit(df)
    msg = str(e.value)
    assert "negative" in msg and "non-negative" in msg and "kl" in msg


def test_is_zero_and_negative_messages(spark):
    df = _df(spark, [[1.0, 0.0], [-1.0, 2.0], [3.0, 4.0]])
    with pytest.raises(ValueError) as e:
        GeneralizedKMeans(k=2, divergence="itakuraSaito", max_iter=1).fit(df)
    msg = str(e.value)
    assert "zero" in msg and "negative" in msg
    assert "epsilon" in msg or "smoothing" in msg


def test_logistic_out_of_interval_message(spark):
    df = _df(spark, [[0.5, 0.5], [1.5, 0.2], [0.1, 0.9]])
    with pytest.raises(ValueError) as e:
        GeneralizedKMeans(k=2, divergence="logistic", max_iter=1).fit(df)
    assert "out_of_interval" in str(e.value)
    assert "[0, 1]" in str(e.value)


def test_nan_message_any_divergence(spark):
    df = _df(spark, [[1.0, 2.0], [float("nan"), 1.0], [3.0, 4.0]])
    with pytest.raises(ValueError) as e:
        GeneralizedKMeans(k=2, divergence="squaredEuclidean", max_iter=1).fit(df)
    assert "nan" in str(e.value)


def test_valid_data_passes_all(spark):
    df = _df(spark, [[0.5, 0.5], [0.1, 0.9], [0.9, 0.2], [0.3, 0.8]])
    for div in ("squaredEuclidean", "kl", "logistic"):
        m = GeneralizedKMeans(k=2, divergence=div, max_iter=2, seed=1).fit(df)
        assert m.k == 2


def test_elkan_pruning_telemetry(spark):
    rows = [
        [float(c * 20 + i % 3), float(c * 20 + (i * 7) % 5)]
        for c in range(4) for i in range(50)
    ]
    df = _df(spark, rows)
    m = GeneralizedKMeans(
        k=4, max_iter=8, seed=3, assignment_strategy="elkan",
    ).fit(df)
    s = m.summary
    # one pruning count per bound-adjustment step (= iterations − 1
    # when converged on the last step, otherwise iterations)
    assert len(s.pruned_history) >= max(s.iterations - 1, 1)
    assert all(p >= 0 for p in s.pruned_history)
    # tight blobs converge fast → later iterations should prune rows
    assert max(s.pruned_history) > 0
    assert not math.isnan(s.pruning_rate)
    assert 0.0 <= s.pruning_rate <= 1.0


def test_exact_plan_has_no_pruning_history(spark):
    df = _df(spark, [[1.0, 1.0], [2.0, 2.0], [10.0, 10.0], [11.0, 11.0]])
    m = GeneralizedKMeans(k=2, max_iter=3, seed=1).fit(df)
    assert m.summary.pruned_history == []
    assert math.isnan(m.summary.pruning_rate)
