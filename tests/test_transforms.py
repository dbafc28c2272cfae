"""Feature transforms (functions/transforms.py; ref FeatureTransform.scala)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.functions import transforms as T


@pytest.fixture(scope="module")
def df(spark):
    rows = [([1.0, 2.0, 3.0],), ([0.0, 5.0, 0.5],), ([10.0, 0.1, 4.0],)]
    return spark.createDataFrame(rows, "features array<double>").cache()


ALL = [
    T.identity(), T.log1p(), T.epsilon_shift(1e-6),
    T.normalize_l2(), T.normalize_l1(),
    T.standard_scale([1.0, 2.0, 3.0], [2.0, 1.0, 0.5]),
    T.for_kl(), T.for_spherical(),
]


@pytest.mark.parametrize("t", ALL, ids=[t.name for t in ALL])
def test_expression_matches_numpy_twin(spark, df, t):
    rows = t.apply(df, "features", "out").select("features", "out").collect()
    for r in rows:
        expect = t.apply_np(np.array(r["features"]))
        assert np.allclose(np.array(r["out"]), expect, rtol=1e-12)


def test_inverse_center_roundtrips():
    c = np.array([0.5, 2.0, 7.0])
    for t in (T.log1p(), T.epsilon_shift(0.25),
              T.standard_scale([1.0, 2.0, 3.0], [2.0, 1.0, 0.5]),
              T.for_kl(0.25)):
        assert np.allclose(t.inverse_center(t.apply_np(c)), c, rtol=1e-9)


def test_compatibility_rules_mirror_reference():
    assert T.log1p().compatible_with("kl")
    assert T.log1p().compatible_with("squaredEuclidean")
    assert not T.log1p().compatible_with("itakuraSaito")
    assert T.epsilon_shift().compatible_with("itakuraSaito")
    assert not T.epsilon_shift().compatible_with("squaredEuclidean")
    assert T.normalize_l2().compatible_with("cosine")
    assert not T.normalize_l2().compatible_with("kl")
    assert T.normalize_l1().compatible_with("kl")
    # composition requires both
    assert T.for_kl().compatible_with("kl")
    assert not T.for_kl().compatible_with("itakuraSaito")  # log1p not ok


def test_validate_compatibility_with_kernels():
    from generalized_kmeans_clustering_spark.functions.kernels import (
        get_kernel,
    )

    # SE accepts anything
    T.validate_compatibility(get_kernel("se"), T.log1p())
    T.validate_compatibility(get_kernel("se"), T.identity())
    # spherical requires L2 normalization (possibly at the end of a chain)
    T.validate_compatibility(get_kernel("spherical"), T.normalize_l2())
    T.validate_compatibility(
        get_kernel("spherical"), T.log1p().and_then(T.normalize_l2())
    )
    with pytest.raises(ValueError, match="incompatible with kernel"):
        T.validate_compatibility(get_kernel("spherical"), T.identity())
    # KL accepts its recommended chain, rejects plain L2 normalization
    T.validate_compatibility(get_kernel("kl"), T.for_kl())
    with pytest.raises(ValueError, match="incompatible with kernel"):
        T.validate_compatibility(get_kernel("kl"), T.normalize_l2())


def test_recommended_transform():
    from generalized_kmeans_clustering_spark.functions.kernels import (
        get_kernel,
    )

    assert "log1p" in T.recommended_transform(get_kernel("kl")).name
    assert T.recommended_transform(get_kernel("cosine")).name == "normalize_l2"
    assert T.recommended_transform(get_kernel("se")).name == "identity"


def test_from_string():
    assert T.from_string("identity").name == "identity"
    assert T.from_string("L2").name == "normalize_l2"
    assert "epsilon_shift" in T.from_string("epsilon-shift").name
    assert "log1p" in T.from_string("kl").name
    with pytest.raises(ValueError, match="unknown transform"):
        T.from_string("bogus")


def test_transformed_fit_clusters_sensibly(spark, df):
    """for_kl-transformed features feed a KL fit without domain errors."""
    from generalized_kmeans_clustering_spark import GeneralizedKMeans

    t = T.for_kl(1e-6)
    out = t.apply(df, "features", "tf").select(F.col("tf").alias("features"))
    m = GeneralizedKMeans(k=2, divergence="kl", max_iter=3, seed=0,
                          init_mode="random").fit(out)
    assert m.centers.shape == (2, 3)
