"""Determinism: same seed → identical results; different seeds differ.

Mirrors the reference's ``ml/DeterminismSuite.scala:61-296`` across the
estimator families.
"""

import numpy as np
import pytest

from generalized_kmeans_clustering_spark import (
    GeneralizedKMeans, SoftKMeans, BregmanMixture, DPMeans, BisectingKMeans,
    CoresetKMeans, MiniBatchKMeans, BalancedKMeans,
)


@pytest.fixture(scope="module")
def data(spark):
    rng = np.random.default_rng(141)
    pts = np.concatenate([
        rng.normal([0, 0], 0.6, (80, 2)),
        rng.normal([6, 0], 0.6, (80, 2)),
        rng.normal([3, 5], 0.6, (80, 2)),
    ])
    df = spark.createDataFrame(
        [([float(a), float(b)],) for a, b in pts], "features array<double>"
    )
    return df.cache()


ESTIMATORS = [
    ("gkm", lambda s: GeneralizedKMeans(k=3, seed=s, max_iter=8)),
    ("gkm_kl", lambda s: GeneralizedKMeans(
        k=3, divergence="kl", seed=s, max_iter=8)),
    ("soft", lambda s: SoftKMeans(k=3, seed=s, max_iter=6)),
    ("mixture", lambda s: BregmanMixture(k=3, seed=s, max_iter=6)),
    ("dpmeans", lambda s: DPMeans(lam=8.0, seed=s, max_iter=8)),
    ("bisecting", lambda s: BisectingKMeans(k=3, seed=s, max_iter=6)),
    ("coreset", lambda s: CoresetKMeans(k=3, seed=s, coreset_size=100,
                                        max_iter=6)),
    ("minibatch", lambda s: MiniBatchKMeans(k=3, seed=s, batch_size=64,
                                            max_iter=10)),
    ("balanced", lambda s: BalancedKMeans(k=3, seed=s, max_iter=6)),
]


@pytest.mark.parametrize("name,factory", ESTIMATORS,
                         ids=[e[0] for e in ESTIMATORS])
def test_same_seed_identical(spark, data, name, factory):
    df = data
    if name == "gkm_kl":
        from pyspark.sql import functions as F

        df = data.select(
            F.transform("features", lambda v: F.abs(v) + 0.1).alias("features")
        )
    m1 = factory(42).fit(df)
    m2 = factory(42).fit(df)
    assert np.allclose(m1.centers, m2.centers, atol=1e-12), name


def test_different_seeds_differ(spark, data):
    m1 = GeneralizedKMeans(k=3, seed=1, init_mode="random", max_iter=1).fit(data)
    m2 = GeneralizedKMeans(k=3, seed=2, init_mode="random", max_iter=1).fit(data)
    assert not np.allclose(m1.centers, m2.centers)


def test_robust_exact_trim_bitwise_repeatable(spark, data):
    """exact_quantile parity mode must produce BIT-IDENTICAL cluster
    memberships across repeated fits: centers snap to a 1e-6 decimal
    grid each iteration, so float partial-sum reorder drift can never
    flip a point sitting on the trim boundary (the r4 driver-gate
    flake)."""
    from generalized_kmeans_clustering_spark.robust import RobustKMeans

    init = [[0.0, 0.0], [6.0, 0.0], [3.0, 5.0]]

    def counts():
        m = RobustKMeans(k=3, outlier_mode="trim", outlier_fraction=0.1,
                         max_iter=4, tol=0.0, initial_centers=init,
                         exact_quantile=True).fit(data)
        out = m.transform(data)
        rows = (out.groupBy("prediction")
                .agg(F.count(F.lit(1)).alias("n"),
                     F.sum(F.col("is_outlier").cast("int")).alias("o"))
                .orderBy("prediction").collect())
        return [(r["prediction"], r["n"], r["o"]) for r in rows], m.centers

    from pyspark.sql import functions as F

    base_counts, base_centers = counts()
    for _ in range(2):
        c, cen = counts()
        assert c == base_counts
        assert np.array_equal(cen, base_centers)
