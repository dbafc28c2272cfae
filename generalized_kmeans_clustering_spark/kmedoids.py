"""KMedoids (PAM BUILD+SWAP) and CLARA sampling.

Re-expression of ``KMedoids.scala:97-250`` (BUILD :156-228) and
``CLARA.scala:10-166``. Like the reference, PAM runs on COLLECTED data
— an O(n²) driver algorithm with a documented scale ceiling (the
reference warns too). CLARA is the scalable front: PAM on
``num_samples`` random subsets of ``sample_size`` rows, keeping the
medoid set with the lowest FULL-data cost — the full-data cost scan is
a distributed expression aggregation, so only the PAM subsets ever
leave the executors.
"""

from __future__ import annotations

import logging

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import get_kernel
from .kmeans import GeneralizedKMeansModel, _ensure_array_features
from .operators.assignment import distances_column
from .summary import TrainingSummary

__all__ = ["KMedoids", "CLARA"]

log = logging.getLogger(__name__)

_PAM_WARN_ROWS = 10_000  # reference warns >10k (KMedoids O(n²))


def _distance_matrix(X: np.ndarray, distance: str) -> np.ndarray:
    if distance in ("euclidean", "l2"):
        x2 = (X ** 2).sum(axis=1)
        return np.sqrt(np.maximum(x2[:, None] - 2 * X @ X.T + x2[None, :], 0.0))
    if distance in ("manhattan", "l1"):
        return np.abs(X[:, None, :] - X[None, :, :]).sum(axis=2)
    if distance == "cosine":
        n = np.linalg.norm(X, axis=1, keepdims=True) + 1e-12
        Xn = X / n
        return 1.0 - Xn @ Xn.T
    raise ValueError(f"unknown distanceFunction '{distance}'")


def pam(X: np.ndarray, k: int, distance: str = "euclidean",
        max_iter: int = 100, seed: int = 0) -> tuple[np.ndarray, float]:
    """Classic PAM: greedy BUILD then first-improvement SWAP.

    Returns (medoid_indices, total_cost). Reference
    ``KMedoids.scala:156-250``.
    """
    n = len(X)
    if k >= n:
        return np.arange(n), 0.0
    D = _distance_matrix(X, distance)
    # BUILD: first medoid minimizes total distance; then greedy adds
    medoids = [int(D.sum(axis=1).argmin())]
    dmin = D[:, medoids[0]].copy()
    for _ in range(1, k):
        # gain of adding j: Σ max(0, dmin − D[:, j])
        gains = np.maximum(dmin[:, None] - D, 0.0).sum(axis=0)
        gains[medoids] = -1.0
        j = int(gains.argmax())
        medoids.append(j)
        dmin = np.minimum(dmin, D[:, j])
    # SWAP: replace (m, h) while total cost improves
    medoids = np.array(medoids)
    for _ in range(max_iter):
        Dm = D[:, medoids]
        assign = Dm.argmin(axis=1)
        cost = Dm[np.arange(n), assign].sum()
        best_delta, best_swap = 0.0, None
        non_medoids = np.setdiff1d(np.arange(n), medoids)
        for mi in range(k):
            others = np.delete(medoids, mi)
            d_other = D[:, others].min(axis=1) if len(others) else np.full(n, np.inf)
            for h in non_medoids:
                new_cost = np.minimum(d_other, D[:, h]).sum()
                delta = new_cost - cost
                if delta < best_delta - 1e-12:
                    best_delta, best_swap = delta, (mi, h)
        if best_swap is None:
            break
        medoids[best_swap[0]] = best_swap[1]
    Dm = D[:, medoids]
    cost = Dm[np.arange(n), Dm.argmin(axis=1)].sum()
    return medoids, float(cost)


class KMedoids:
    """PAM on collected data (documented O(n²) driver ceiling)."""

    _algorithm = "KMedoids"

    def __init__(
        self,
        k: int = 2,
        distance_function: str = "euclidean",
        max_iter: int = 100,
        seed: int = 0,
        features_col: str = "features",
        prediction_col: str = "prediction",
        distance_col: str | None = None,
    ):
        self.k = k
        self.distance_function = distance_function
        self.max_iter = max_iter
        self.seed = seed
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.distance_col = distance_col

    def fit(self, df: DataFrame) -> GeneralizedKMeansModel:
        from time import time

        t0 = time()
        df = _ensure_array_features(df, self.features_col)
        rows = df.select(self.features_col).collect()
        if len(rows) > _PAM_WARN_ROWS:
            log.warning(
                "KMedoids collects %d rows (O(n²) driver work); "
                "use CLARA for larger data", len(rows),
            )
        X = np.asarray([r[self.features_col] for r in rows], dtype=np.float64)
        medoids, cost = pam(
            X, self.k, self.distance_function, self.max_iter, self.seed
        )
        centers = X[medoids]
        kern_name = {
            "euclidean": "squaredEuclidean", "l2": "squaredEuclidean",
            "manhattan": "l1", "l1": "l1", "cosine": "spherical",
        }[self.distance_function]
        D = _distance_matrix(X, self.distance_function)[:, medoids]
        sizes = np.bincount(D.argmin(axis=1), minlength=self.k).tolist()
        summary = TrainingSummary(
            algorithm=self._algorithm, k=self.k, dim=centers.shape[1],
            divergence=self.distance_function, iterations=1, converged=True,
            distortion_history=[cost], movement_history=[],
            cluster_sizes=sizes, elapsed_sec=time() - t0,
        )
        return GeneralizedKMeansModel(
            centers=centers, kernel_name=kern_name,
            features_col=self.features_col, prediction_col=self.prediction_col,
            distance_col=self.distance_col, summary=summary,
            params={"k": self.k, "distanceFunction": self.distance_function,
                    "medoidIndices": [int(m) for m in medoids],
                    "seed": self.seed},
        )


class CLARA(KMedoids):
    """PAM on samples; keep the medoid set with the best FULL-data cost
    (distributed cost scan). Reference ``CLARA.scala:80-166``."""

    _algorithm = "CLARA"

    def __init__(
        self,
        k: int = 2,
        num_samples: int = 5,
        sample_size: int | None = None,
        distance_function: str = "euclidean",
        max_iter: int = 100,
        seed: int = 0,
        features_col: str = "features",
        prediction_col: str = "prediction",
        distance_col: str | None = None,
        sampling: str = "random",
        hash_col: str | None = None,
    ):
        super().__init__(
            k=k, distance_function=distance_function, max_iter=max_iter,
            seed=seed, features_col=features_col,
            prediction_col=prediction_col, distance_col=distance_col,
        )
        if sampling not in ("random", "hash"):
            raise ValueError("sampling: random | hash")
        if sampling == "hash" and not hash_col:
            raise ValueError("sampling='hash' needs hash_col")
        self.num_samples = num_samples
        self.sample_size = sample_size
        # 'hash' draws sample s as the first sample_size rows of the
        # disjoint slice pmod(hash_col, num_samples) == s in hash order —
        # deterministic and partition-order-independent, unlike
        # Bernoulli sample+limit (reproducible across runs and engines)
        self.sampling = sampling
        self.hash_col = hash_col

    def _full_cost(self, df: DataFrame, medoid_vecs: np.ndarray) -> float:
        """Distributed Σ min distance to the candidate medoids."""
        kern_name = {
            "euclidean": "squaredEuclidean", "l2": "squaredEuclidean",
            "manhattan": "l1", "l1": "l1", "cosine": "spherical",
        }[self.distance_function]
        kernel = get_kernel(kern_name)
        feats = F.col(self.features_col)
        if kernel.pre_normalize:
            feats = kernel.normalize(feats)
        dists = distances_column(kernel, feats, medoid_vecs.tolist())
        d = F.array_min(dists)
        if kern_name == "squaredEuclidean":
            d = F.sqrt(2.0 * d)  # PAM cost uses plain euclidean
        row = df.select(F.sum(d).alias("c")).collect()[0]
        return float(row["c"] or 0.0)

    def fit(self, df: DataFrame) -> GeneralizedKMeansModel:
        from time import time

        t0 = time()
        df = _ensure_array_features(df, self.features_col)
        sel = [self.features_col] + (
            [self.hash_col] if self.sampling == "hash" else []
        )
        work = df.select(*sel)
        cache_here = work.storageLevel.useMemory is False
        if cache_here:
            work = work.cache()
        try:
            n = work.count()
            size = self.sample_size or min(n, max(40 + 2 * self.k, 500))
            frac = min(1.0, size * 1.3 / max(n, 1))
            best_cost, best_medoid_vecs = float("inf"), None
            for s in range(self.num_samples):
                if self.sampling == "hash":
                    sample = (
                        work.where(
                            F.pmod(F.col(self.hash_col),
                                   F.lit(self.num_samples)) == s
                        )
                        .orderBy(self.hash_col).limit(size).collect()
                    )
                else:
                    sample = (
                        work.sample(fraction=frac, seed=self.seed + s)
                        .limit(size).collect()
                    )
                Xs = np.asarray(
                    [r[self.features_col] for r in sample], dtype=np.float64
                )
                if len(Xs) < self.k:
                    continue
                medoids, _ = pam(
                    Xs, self.k, self.distance_function, self.max_iter,
                    self.seed + s,
                )
                cost = self._full_cost(work, Xs[medoids])
                if cost < best_cost:
                    best_cost, best_medoid_vecs = cost, Xs[medoids]
        finally:
            if cache_here:
                work.unpersist()
        if best_medoid_vecs is None:
            raise ValueError("CLARA found no valid sample with >= k rows")
        kern_name = {
            "euclidean": "squaredEuclidean", "l2": "squaredEuclidean",
            "manhattan": "l1", "l1": "l1", "cosine": "spherical",
        }[self.distance_function]
        summary = TrainingSummary(
            algorithm=self._algorithm, k=self.k,
            dim=best_medoid_vecs.shape[1],
            divergence=self.distance_function, iterations=self.num_samples,
            converged=True, distortion_history=[best_cost],
            movement_history=[], cluster_sizes=[],
            elapsed_sec=time() - t0,
        )
        return GeneralizedKMeansModel(
            centers=best_medoid_vecs, kernel_name=kern_name,
            features_col=self.features_col, prediction_col=self.prediction_col,
            distance_col=self.distance_col, summary=summary,
            params={"k": self.k, "numSamples": self.num_samples,
                    "sampleSize": size,
                    "distanceFunction": self.distance_function,
                    "fullDataCost": best_cost, "seed": self.seed},
        )
