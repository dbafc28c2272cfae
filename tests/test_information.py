"""Information-theoretic helper tests against closed forms."""

import math

import numpy as np
import pytest

from generalized_kmeans_clustering_spark.functions.information import (
    entropy, joint_entropy, conditional_entropy, mutual_information,
    js_divergence, column_mutual_information,
)


def test_entropy_closed_forms():
    assert entropy([0.5, 0.5]) == pytest.approx(math.log(2))
    assert entropy([1.0, 0.0]) == pytest.approx(0.0)
    assert entropy([0.25] * 4) == pytest.approx(math.log(4))


def test_mutual_information_identities():
    # independent: I = 0
    P_ind = np.outer([0.3, 0.7], [0.6, 0.4])
    assert mutual_information(P_ind) == pytest.approx(0.0, abs=1e-12)
    # perfectly dependent: I = H(X)
    P_dep = np.diag([0.5, 0.5])
    assert mutual_information(P_dep) == pytest.approx(math.log(2))
    # chain rule: I = H(Y) - H(Y|X)
    P = np.array([[0.3, 0.1], [0.2, 0.4]])
    hy = entropy(P.sum(axis=0))
    assert mutual_information(P) == pytest.approx(hy - conditional_entropy(P))
    assert joint_entropy(P) == pytest.approx(
        entropy(P.sum(axis=1)) + conditional_entropy(P)
    )


def test_js_divergence_bounds():
    assert js_divergence([1, 0], [0, 1]) == pytest.approx(math.log(2))
    assert js_divergence([0.5, 0.5], [0.5, 0.5]) == pytest.approx(0.0)
    # symmetry
    p, q = [0.8, 0.2], [0.3, 0.7]
    assert js_divergence(p, q) == pytest.approx(js_divergence(q, p))


def test_column_mutual_information(spark):
    # y == x → I = H(X) = ln 2; y independent → I ≈ 0
    rows = [(i % 2, i % 2, (i // 2) % 2) for i in range(400)]
    df = spark.createDataFrame(rows, "x int, y_dep int, y_ind int")
    assert column_mutual_information(df, "x", "y_dep") == pytest.approx(
        math.log(2), rel=1e-9
    )
    assert column_mutual_information(df, "x", "y_ind") == pytest.approx(
        0.0, abs=1e-9
    )
