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
