"""XMeans: automatic k selection by information criterion.

Re-expression of ``XMeans.scala:143-233`` (scoring :248-271): fit
GeneralizedKMeans for each k in [min_k, max_k] over the cached input,
compute a Gaussian log-likelihood from the clustering cost
(Pelleg–Moore), and keep the k minimizing BIC/AIC; stop early when the
criterion stops improving by ``improvement_threshold``.

Spark shape: a driver loop of full fits over one cached DataFrame —
each fit is the shared Lloyd engine (one job/iteration). Model count
is (max_k − min_k + 1), data passes scale accordingly; the input is
cached once up front.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame

from .kmeans import GeneralizedKMeans, GeneralizedKMeansModel

__all__ = ["XMeans"]


def _gaussian_loglik(n: int, k: int, d: int, wcss: float, sizes) -> float:
    """Pelleg–Moore spherical-Gaussian log-likelihood of a k-clustering.

    ``wcss`` is Σ ½‖x−μ‖² (our SE divergence), so the classic
    Σ‖x−μ‖² = 2·wcss. Matches ``XMeans.scala:248-271``'s shape.
    """
    if n <= k:
        return float("-inf")
    var = 2.0 * wcss / (d * max(n - k, 1))
    if var <= 0:
        var = 1e-12
    ll = 0.0
    for nc in sizes:
        if nc > 0:
            ll += nc * math.log(nc / n)
    ll -= 0.5 * n * d * math.log(2.0 * math.pi * var)
    ll -= 0.5 * (n - k) * d
    return ll


class XMeans:
    """Scan k ∈ [min_k, max_k], score by BIC (default) or AIC."""

    _algorithm = "XMeans"

    def __init__(
        self,
        min_k: int = 2,
        max_k: int = 8,
        criterion: str = "bic",
        improvement_threshold: float = 0.0,
        divergence: str = "squaredEuclidean",
        max_iter: int = 20,
        tol: float = 1e-4,
        seed: int = 0,
        features_col: str = "features",
        prediction_col: str = "prediction",
        distance_col: str | None = None,
        **fit_kwargs,
    ):
        if min_k < 1 or max_k < min_k:
            raise ValueError("need 1 <= min_k <= max_k")
        if criterion not in ("bic", "aic"):
            raise ValueError("criterion must be 'bic' or 'aic'")
        self.min_k = min_k
        self.max_k = max_k
        self.criterion = criterion
        self.improvement_threshold = improvement_threshold
        self.divergence = divergence
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.distance_col = distance_col
        self.fit_kwargs = fit_kwargs

    def fit(self, df: DataFrame) -> GeneralizedKMeansModel:
        cache_here = df.storageLevel.useMemory is False
        work = df.cache() if cache_here else df
        try:
            n = work.count()
            best = None
            best_score = float("-inf")
            scores: list[float] = []
            for k in range(self.min_k, self.max_k + 1):
                est = GeneralizedKMeans(
                    k=k, divergence=self.divergence, max_iter=self.max_iter,
                    tol=self.tol, seed=self.seed,
                    features_col=self.features_col,
                    prediction_col=self.prediction_col,
                    distance_col=self.distance_col, **self.fit_kwargs,
                )
                model = est.fit(work)
                wcss = model.compute_cost(work)
                d = model.dim
                sizes = model.summary.cluster_sizes
                ll = _gaussian_loglik(n, model.k, d, wcss, sizes)
                p = model.k * d + 1  # free params (SURVEY §2.5 XMeans row)
                score = (
                    ll - 0.5 * p * math.log(max(n, 2))
                    if self.criterion == "bic"
                    else ll - p
                )
                scores.append(score)
                if score > best_score:
                    improvement = score - best_score
                    best_score = score
                    best = model
                    best.params["xmeansScore"] = score
                elif best is not None and (
                    best_score - score
                ) > abs(self.improvement_threshold) and k > self.min_k + 1:
                    break  # criterion clearly degrading — stop scanning
            best.params.update(
                {"criterion": self.criterion, "minK": self.min_k,
                 "maxK": self.max_k, "scores": scores}
            )
            best.summary.algorithm = self._algorithm
            return best
        finally:
            if cache_here:
                work.unpersist()
