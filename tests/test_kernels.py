"""Kernel accuracy tests, modeled on the reference's
BregmanKernelAccuracySuite (SURVEY.md §5.1): closed-form values,
D(x,x)=0, D>=0, grad∘inv_grad≈identity, numpy twin == Column expression.
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from generalized_kmeans_clustering_spark.functions.kernels import (
    get_kernel, KERNELS, array_lit,
)

DENSE_KERNELS = ["squaredEuclidean", "kl", "itakuraSaito", "generalizedI",
                 "logistic", "l1", "spherical"]


def eval_pairwise(spark, kernel, x, mu):
    df = spark.range(1).select(
        kernel.pairwise(array_lit(x), array_lit(mu)).alias("d")
    )
    return df.collect()[0]["d"]


def test_se_closed_form(spark):
    k = get_kernel("squaredEuclidean")
    # ½((1-4)² + (2-6)²) = ½(9+16) = 12.5
    assert eval_pairwise(spark, k, [1.0, 2.0], [4.0, 6.0]) == pytest.approx(12.5)


def test_l1_closed_form(spark):
    k = get_kernel("l1")
    assert eval_pairwise(spark, k, [1.0, 2.0], [4.0, 6.0]) == pytest.approx(7.0)


def test_kl_closed_form(spark):
    k = get_kernel("kl")
    x, mu = [0.5, 0.5], [0.25, 0.75]
    expected = sum((a + 1e-10) * (np.log(a + 1e-10) - np.log(b + 1e-10))
                   for a, b in zip(x, mu))
    assert eval_pairwise(spark, k, x, mu) == pytest.approx(expected, rel=1e-12)


def test_cosine_orthogonal(spark):
    k = get_kernel("spherical")
    assert eval_pairwise(spark, k, [1.0, 0.0], [0.0, 1.0]) == pytest.approx(1.0, abs=1e-6)
    assert eval_pairwise(spark, k, [2.0, 0.0], [5.0, 0.0]) == pytest.approx(0.0, abs=1e-6)


@pytest.mark.parametrize("name", DENSE_KERNELS)
def test_self_divergence_zero_and_nonneg(spark, name):
    k = get_kernel(name)
    rng = np.random.RandomState(7)
    x = (rng.uniform(0.05, 0.95, 4)).tolist()
    y = (rng.uniform(0.05, 0.95, 4)).tolist()
    assert eval_pairwise(spark, k, x, x) == pytest.approx(0.0, abs=1e-8)
    assert eval_pairwise(spark, k, x, y) >= -1e-12


@pytest.mark.parametrize("name", ["squaredEuclidean", "kl", "itakuraSaito",
                                  "generalizedI", "logistic"])
def test_grad_invgrad_identity(name):
    k = get_kernel(name)
    rng = np.random.RandomState(3)
    X = rng.uniform(0.1, 0.9, (5, 4))
    back = k.inv_grad_np(k.grad_np(X))
    np.testing.assert_allclose(back, X, rtol=1e-7, atol=1e-7)


@pytest.mark.parametrize("name", DENSE_KERNELS)
def test_numpy_twin_matches_expression(spark, name):
    k = get_kernel(name)
    rng = np.random.RandomState(11)
    X = rng.uniform(0.1, 0.9, (6, 3))
    C = rng.uniform(0.1, 0.9, (2, 3))
    D = k.div_np(X.copy(), C.copy())
    for i in range(len(X)):
        for j in range(len(C)):
            got = eval_pairwise(spark, k, X[i].tolist(), C[j].tolist())
            assert got == pytest.approx(D[i, j], rel=1e-6, abs=1e-9), (name, i, j)


def test_grad_expression_matches_numpy(spark):
    for name in ["squaredEuclidean", "kl", "itakuraSaito", "generalizedI", "logistic"]:
        k = get_kernel(name)
        x = [0.3, 0.6, 0.9]
        row = spark.range(1).select(k.grad(array_lit(x)).alias("g")).collect()[0]
        np.testing.assert_allclose(
            np.array(row["g"]), k.grad_np(np.array(x)), rtol=1e-9,
            err_msg=name,
        )


def test_registry_aliases():
    assert type(get_kernel("SE")).__name__ == "SquaredEuclideanKernel"
    assert type(get_kernel("manhattan")).__name__ == "L1Kernel"
    assert type(get_kernel("cosine")).__name__ == "SphericalKernel"
    with pytest.raises(ValueError):
        get_kernel("nope")
