"""Soft (Boltzmann) assignments as Catalyst expressions.

Re-expression of ``df/SoftAssignments.scala:26-56``: membership
probabilities P(c|x) ∝ exp(−β·D(x,μ_c)), numerically stabilized by
subtracting the min distance (log-sum-exp trick on the distance
scale), floored at ``min_membership`` and renormalized.

The computation is staged through intermediate columns
(distances → min → unnormalized → total → probabilities) so each
expensive array expression is evaluated exactly once per row —
building it as one nested Column would inline the distance array into
every consumer (Catalyst inlines expression trees per reference;
CollapseProject keeps multi-referenced non-trivial projections
separate). No shuffle, no Python.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.kernels import Kernel
from .assignment import distances_column

__all__ = ["soft_assign", "soft_membership_column"]


def soft_assign(
    df: DataFrame,
    kernel: Kernel,
    centers: Sequence[Sequence[float]],
    features_col: str,
    beta: float = 1.0,
    min_membership: float = 0.0,
    probability_col: str = "probability",
) -> DataFrame:
    """Attach an array<double> membership-probability column."""
    b = float(beta)
    df = df.withColumn("_sa_d", distances_column(kernel, F.col(features_col), centers))
    df = df.withColumn("_sa_dmin", F.array_min("_sa_d"))
    df = df.withColumn(
        "_sa_raw",
        F.transform("_sa_d", lambda d: F.exp(-b * (d - F.col("_sa_dmin")))),
    )
    df = df.withColumn(
        "_sa_tot", F.aggregate("_sa_raw", F.lit(0.0), lambda a, v: a + v)
    )
    probs = F.transform("_sa_raw", lambda v: v / F.col("_sa_tot"))
    if min_membership > 0:
        df = df.withColumn(
            "_sa_fl",
            F.transform(probs, lambda p: F.greatest(p, F.lit(float(min_membership)))),
        )
        df = df.withColumn(
            "_sa_ftot", F.aggregate("_sa_fl", F.lit(0.0), lambda a, v: a + v)
        )
        probs = F.transform("_sa_fl", lambda p: p / F.col("_sa_ftot"))
        out = df.withColumn(probability_col, probs)
        return out.drop("_sa_d", "_sa_dmin", "_sa_raw", "_sa_tot", "_sa_fl", "_sa_ftot")
    out = df.withColumn(probability_col, probs)
    return out.drop("_sa_d", "_sa_dmin", "_sa_raw", "_sa_tot")


def soft_membership_column(
    kernel: Kernel,
    features: Column,
    centers: Sequence[Sequence[float]],
    beta: float = 1.0,
    min_membership: float = 0.0,
) -> Column:
    """Single-Column variant (self-contained expression). Prefer
    ``soft_assign`` on hot paths — this form inlines the distance array
    into several sub-expressions."""
    b = float(beta)
    dists = distances_column(kernel, features, centers)
    dmin = F.array_min(dists)
    raw = F.transform(dists, lambda d: F.exp(-b * (d - dmin)))
    total = F.aggregate(raw, F.lit(0.0), lambda a, v: a + v)
    probs = F.transform(raw, lambda v: v / total)
    if min_membership > 0:
        floored = F.transform(probs, lambda p: F.greatest(p, F.lit(float(min_membership))))
        ftotal = F.aggregate(floored, F.lit(0.0), lambda a, v: a + v)
        probs = F.transform(floored, lambda p: p / ftotal)
    return probs
