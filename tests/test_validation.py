"""Composable validators (reference ml/df/Validator.scala)."""

import warnings

import pytest

from generalized_kmeans_clustering_spark import validation as V
from generalized_kmeans_clustering_spark.errors import ValidationError


@pytest.fixture(scope="module")
def good(spark):
    return spark.createDataFrame(
        [(1, [1.0, 2.0], 1.0), (2, [3.0, 4.0], 2.0)],
        "id long, features array<double>, weight double",
    )


@pytest.fixture(scope="module")
def bad(spark):
    nan, inf = float("nan"), float("inf")
    return spark.createDataFrame(
        [(1, [1.0, nan], 1.0),          # NaN element
         (2, [inf, 2.0], -3.0),         # Inf element, negative weight
         (3, None, 0.5),                # null features
         (4, [1.0, 2.0, 3.0], 0.0),     # wrong dim, zero weight
         (5, [1.0, 2.0], 1.0)],         # clean row
        "id long, features array<double>, weight double",
    )


def test_clean_frame_passes_everything(spark, good):
    v = (V.features("features", expected_dim=2) & V.weight("weight")
         & V.not_empty())
    res = v.validate(good)
    assert res.is_valid
    assert res.message == "Validation passed"
    res.get_or_throw()  # no raise


def test_each_violation_detected_with_samples(spark, bad):
    res = V.no_nan("features").validate(bad)
    assert not res.is_valid
    assert res.violations[0].violation_type == "nan"
    assert [r["id"] for r in res.violations[0].sample_rows] == [1]

    res = V.FiniteValidator("features").validate(bad)
    assert [r["id"] for r in res.violations[0].sample_rows] == [2]

    res = V.not_null("features").validate(bad)
    assert [r["id"] for r in res.violations[0].sample_rows] == [3]

    res = V.consistent_dimension("features", expected_dim=2).validate(bad)
    assert [r["id"] for r in res.violations[0].sample_rows] == [4]

    res = V.positive("weight").validate(bad)
    assert [r["id"] for r in res.violations[0].sample_rows] == [2]
    res = V.positive("weight", strict=True).validate(bad)
    assert {r["id"] for r in res.violations[0].sample_rows} == {2, 4}


def test_combination_collects_all_violations(spark, bad):
    v = V.features("features", expected_dim=2) & V.weight("weight")
    res = v.validate(bad)
    assert not res.is_valid
    types = {x.violation_type for x in res.violations}
    assert {"nan", "infinite", "null", "dimension_mismatch",
            "negative"} <= types
    assert "Validation failed with" in res.message
    with pytest.raises(ValidationError):
        res.get_or_throw()


def test_consistent_dimension_infers_reference_dim(spark, bad):
    # first non-null row is 2-dim -> row 4 (3-dim) flagged
    res = V.consistent_dimension("features").validate(bad)
    assert not res.is_valid
    assert [r["id"] for r in res.violations[0].sample_rows] == [4]


def test_not_empty(spark, good):
    assert V.not_empty().validate(good).is_valid
    empty = good.where("id < 0")
    res = V.not_empty().validate(empty)
    assert not res.is_valid
    assert res.violations[0].violation_type == "empty"


def test_kernel_compatibility(spark, good, bad):
    assert V.kernel_compatibility("se", "features").validate(bad).is_valid
    assert V.kernel_compatibility("kl", "features").validate(good).is_valid
    pos = spark.createDataFrame([([0.0, 1.0],)], "features array<double>")
    res = V.kernel_compatibility("itakura-saito", "features").validate(pos)
    assert not res.is_valid  # strict positivity: zero rejected


def test_names_compose(spark):
    v = V.no_nan("f") & V.positive("w")
    assert v.name == "noNaN(f) and positive(w)"


def test_numeric_guards():
    import numpy as np

    from generalized_kmeans_clustering_spark.errors import (
        InvalidFeatures, InvalidWeight,
    )
    from generalized_kmeans_clustering_spark.functions import guards as G

    G.check_finite([1.0, 2.0], "ctx")
    with pytest.raises(InvalidFeatures, match="NaN at index 1"):
        G.check_finite([1.0, float("nan")], "ctx")
    with pytest.raises(InvalidFeatures, match="Inf at index 0"):
        G.check_finite([float("inf"), 2.0], "ctx")

    G.check_positive([0.0, 1.0], "ctx")  # -eps tolerance admits zero
    with pytest.raises(InvalidFeatures, match="negative value"):
        G.check_positive([1.0, -0.5], "ctx")

    G.check_probability([0.2, 0.8], "ctx")
    with pytest.raises(InvalidFeatures, match="outside"):
        G.check_probability([0.2, 1.0], "ctx")

    G.check_weight(1.5, "ctx")
    for w in (0.0, -1.0, float("nan"), float("inf")):
        with pytest.raises(InvalidWeight):
            G.check_weight(w, "ctx")

    assert list(G.safe_add([1.0, 2.0], [3.0, 4.0], "ctx")) == [4.0, 6.0]
    with pytest.raises(InvalidFeatures, match="dimensions must match"):
        G.safe_add([1.0], [1.0, 2.0], "ctx")
    big = 1e308
    # the guard layer must not itself emit numpy RuntimeWarnings while
    # detecting the overflow it exists to report
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        with pytest.raises(InvalidFeatures,
                           match="Overflow in vector addition"):
            G.safe_add([big], [big], "ctx")
        assert list(G.safe_scale([2.0, 3.0], 2.0, "ctx")) == [4.0, 6.0]
        with pytest.raises(InvalidFeatures, match="Overflow in scalar"):
            G.safe_scale([big], 10.0, "ctx")
    # preview truncates long vectors
    try:
        G.check_finite([float("nan")] + [0.0] * 20, "ctx")
    except InvalidFeatures as e:
        assert "...]" in str(e)
