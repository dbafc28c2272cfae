"""Information-theoretic helpers (reference ``df/MutualInformation.scala:34-300``).

numpy forms operate on joint/marginal probability arrays (driver-side,
small); :func:`column_mutual_information` builds the joint histogram of
two DataFrame columns with ONE distributed groupBy-count (the only
data-scale pass, same shape as InformationBottleneck's histogram).
All quantities in nats.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "entropy", "joint_entropy", "conditional_entropy",
    "mutual_information", "js_divergence", "column_mutual_information",
]


def _norm(p: np.ndarray) -> np.ndarray:
    p = np.asarray(p, dtype=np.float64)
    return p / max(p.sum(), 1e-300)


def entropy(p) -> float:
    """H(p) = −Σ p ln p."""
    p = _norm(p)
    nz = p[p > 0]
    return float(-(nz * np.log(nz)).sum())


def joint_entropy(P) -> float:
    return entropy(np.asarray(P).ravel())


def conditional_entropy(P) -> float:
    """H(Y|X) from a joint matrix P[x, y] = H(X,Y) − H(X)."""
    P = _norm(P)
    return joint_entropy(P) - entropy(P.sum(axis=1))


def mutual_information(P) -> float:
    """I(X;Y) from a joint probability matrix P[x, y]."""
    P = _norm(P)
    px = P.sum(axis=1, keepdims=True)
    py = P.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(P > 0, P / (px @ py), 1.0)
        return float((P * np.log(ratio)).sum())


def js_divergence(p, q) -> float:
    """Jensen–Shannon divergence (symmetric, bounded by ln 2)."""
    p, q = _norm(p), _norm(q)
    m = 0.5 * (p + q)

    def _kl(a, b):
        nz = a > 0
        return float((a[nz] * (np.log(a[nz]) - np.log(b[nz]))).sum())

    return 0.5 * _kl(p, m) + 0.5 * _kl(q, m)


def column_mutual_information(df: DataFrame, x_col: str, y_col: str) -> float:
    """I(X;Y) between two (discrete-valued) columns.

    One groupBy(x, y).count() — the joint support comes back to the
    driver (must be small: categorical columns, bins, cluster ids).
    """
    hist = df.groupBy(x_col, y_col).agg(F.count(F.lit(1)).alias("n")).collect()
    xs = sorted({r[x_col] for r in hist}, key=repr)
    ys = sorted({r[y_col] for r in hist}, key=repr)
    xi = {v: i for i, v in enumerate(xs)}
    yi = {v: i for i, v in enumerate(ys)}
    P = np.zeros((len(xs), len(ys)))
    for r in hist:
        P[xi[r[x_col]], yi[r[y_col]]] = r["n"]
    return mutual_information(P)
