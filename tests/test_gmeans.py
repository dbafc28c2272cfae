"""G-means (Hamerly & Elkan 2003): AD split statistic + the grow-k
loop (gmeans.py)."""

import numpy as np
import pytest

from generalized_kmeans_clustering_spark.gmeans import (
    AD_CRITICAL_0001,
    GMeans,
    ad_split_statistic,
)


def _df(spark, xs):
    return spark.createDataFrame(
        [([float(x), 0.0],) for x in xs], "features array<double>")


def test_ad_statistic_separates_bimodal_from_normal(spark):
    rng = np.random.default_rng(5)
    bi = _df(spark, np.concatenate([rng.normal(-5, 1, 400),
                                    rng.normal(5, 1, 400)]))
    st = ad_split_statistic(bi, [-5.0, 0.0], [5.0, 0.0]).collect()[0]
    assert st["n"] == 800 and st["ad_stat"] > AD_CRITICAL_0001
    no = _df(spark, rng.normal(0, 1, 800))
    st2 = ad_split_statistic(no, [-1.0, 0.0], [1.0, 0.0]).collect()[0]
    assert st2["ad_stat"] < AD_CRITICAL_0001


def test_ad_statistic_matches_reference_formula(spark):
    """Distributed A*² equals the textbook numpy computation (same
    Abramowitz–Stegun Φ) to float precision."""
    import math

    rng = np.random.default_rng(11)
    xs = rng.normal(2.0, 3.0, 257)
    got = ad_split_statistic(
        _df(spark, xs), [1.0, 0.0], [3.0, 0.0]).collect()[0]

    def phi(z):
        x = abs(z) / math.sqrt(2.0)
        t = 1.0 / (1.0 + 0.3275911 * x)
        poly = t * (0.254829592 + t * (-0.284496736 + t * (
            1.421413741 + t * (-1.453152027 + t * 1.061405429))))
        pos = 0.5 * (1.0 + (1.0 - poly * math.exp(-x * x)))
        p = pos if z >= 0 else 1.0 - pos
        return min(max(p, 1e-15), 1.0 - 1e-15)

    # projection onto v = c1 - c2 = [-2, 0] scaled by |v|^2
    pr = np.sort(xs * -2.0 / 4.0)
    z = (pr - pr.mean()) / pr.std(ddof=1)
    n = len(z)
    s = sum((2 * (i + 1) - 1) * math.log(phi(z[i]))
            + (2 * (n - (i + 1)) + 1) * math.log(1 - phi(z[i]))
            for i in range(n))
    a2 = -n - s / n
    expected = a2 * (1 + 4.0 / n - 25.0 / n ** 2)
    assert abs(got["ad_stat"] - expected) < 1e-9
    assert got["n"] == n


def test_ad_statistic_degenerate_clusters_null(spark):
    tiny = _df(spark, [1.0, 2.0, 3.0])  # n < 8
    assert ad_split_statistic(
        tiny, [0.0, 0.0], [1.0, 0.0]).collect()[0]["ad_stat"] is None
    with pytest.raises(ValueError, match="identical"):
        ad_split_statistic(tiny, [1.0, 0.0], [1.0, 0.0])


def test_gmeans_finds_three_gaussians_and_keeps_one(spark):
    rng = np.random.default_rng(5)
    rows = []
    for mu in ([0, 0], [10, 0], [0, 10]):
        rows += [([float(x) for x in v],)
                 for v in rng.normal(mu, 0.5, (300, 2))]
    df = spark.createDataFrame(rows, "features array<double>")
    m = GMeans(k_max=8, seed=1).fit(df)
    assert m.k == 3
    assert m.params["k_history"][-1] == 3
    one = spark.createDataFrame(
        [([float(x) for x in v],) for v in rng.normal(0, 1, (600, 2))],
        "features array<double>")
    assert GMeans(k_max=8, seed=1).fit(one).k == 1


def test_gmeans_respects_k_max_and_transforms(spark):
    rng = np.random.default_rng(9)
    rows = []
    for mu in ([0, 0], [8, 0], [0, 8], [8, 8]):
        rows += [([float(x) for x in v],)
                 for v in rng.normal(mu, 0.4, (150, 2))]
    df = spark.createDataFrame(rows, "features array<double>")
    m = GMeans(k_max=2, seed=3).fit(df)
    assert m.k <= 2
    out = m.transform(df)
    assert out.select("prediction").distinct().count() == m.k
    with pytest.raises(ValueError, match="k_max"):
        GMeans(k_max=0)
