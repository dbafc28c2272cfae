"""BalancedKMeans: cluster-size-constrained Lloyd's.

Re-expression of ``BalancedKMeans.scala:162-330`` (soft :385-425,
hard :427-500):

- ``soft`` mode (distributed, the 100 TB path): each iteration runs a
  normal assignment, measures cluster sizes (k numbers), then a second
  assignment pass whose distances are inflated for oversized clusters —
  d'_j = d_j·(1 + penalty·overflow_j) with
  overflow_j = max(0, size_j/target − 1). Both passes are map-only
  expression projections; the size vector rides into the plan as a
  k-element literal.
- ``hard`` mode (driver ceiling, like the reference): greedy
  capacity-constrained assignment over the collected points sorted by
  best-distance (documented O(n·k) driver cost; warns above a bound).
"""

from __future__ import annotations

import logging

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import get_kernel
from .kmeans import GeneralizedKMeansModel, _ensure_array_features, _validate_domain
from .operators.assignment import distances_column
from .operators.initialization import initialize
from .operators.update import cluster_stats, centers_from_stats
from .summary import TrainingSummary

__all__ = ["BalancedKMeans"]

log = logging.getLogger(__name__)

_HARD_MODE_WARN_ROWS = 1_000_000


class BalancedKMeans:
    _algorithm = "BalancedKMeans"

    def __init__(
        self,
        k: int = 2,
        divergence: str = "squaredEuclidean",
        balance_mode: str = "soft",  # soft | hard
        balance_penalty: float = 1.0,
        min_cluster_size: int = 0,
        max_cluster_size: int | None = None,
        max_iter: int = 20,
        tol: float = 1e-4,
        seed: int = 0,
        smoothing: float = 1e-10,
        init_mode: str = "k-means||",
        features_col: str = "features",
        prediction_col: str = "prediction",
        distance_col: str | None = None,
        initial_centers=None,
    ):
        if balance_mode not in ("soft", "hard"):
            raise ValueError("balance_mode: soft | hard")
        self.k = k
        self.divergence = divergence
        self.balance_mode = balance_mode
        self.balance_penalty = float(balance_penalty)
        self.min_cluster_size = min_cluster_size
        self.max_cluster_size = max_cluster_size
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.smoothing = smoothing
        self.init_mode = init_mode
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.distance_col = distance_col
        self.initial_centers = initial_centers

    def _penalized_assign(self, work, kernel, centers, sizes, target):
        """Second-pass assignment with size-inflated distances."""
        overflow = [
            max(0.0, s / target - 1.0) if target > 0 else 0.0 for s in sizes
        ]
        fac = F.array(*[
            F.lit(1.0 + self.balance_penalty * o) for o in overflow
        ])
        base = distances_column(kernel, F.col(self.features_col), centers.tolist())
        adj = F.zip_with(base, fac, lambda d_, f_: d_ * f_)
        out = work.withColumn("_ad", adj)
        out = out.withColumn(
            "_cluster",
            (F.expr("array_position(_ad, array_min(_ad))") - 1).cast("int"),
        )
        # keep the TRUE (unpenalized) distance for stats/cost
        out = out.withColumn(
            "_dist",
            F.element_at(base, F.col("_cluster") + 1),
        )
        return out.drop("_ad")

    def fit(self, df: DataFrame) -> GeneralizedKMeansModel:
        from time import time

        t0 = time()
        kernel = get_kernel(self.divergence, smoothing=self.smoothing)
        df = _ensure_array_features(df, self.features_col)
        if kernel.pre_normalize:
            df = df.withColumn(
                self.features_col, kernel.normalize(F.col(self.features_col))
            )
        _validate_domain(df, kernel, self.features_col)
        work = df.select(self.features_col)
        cache_here = work.storageLevel.useMemory is False
        if cache_here:
            work = work.cache()
        try:
            n = work.count()
            if self.initial_centers is not None:
                centers = np.asarray(self.initial_centers, dtype=np.float64)
                if kernel.pre_normalize:
                    centers = kernel.normalize_np(centers)
            else:
                centers = initialize(
                    work, self.k, kernel, self.features_col, self.seed,
                    self.init_mode, 2,
                )
            k, d = centers.shape
            target = n / k

            if self.balance_mode == "hard":
                return self._fit_hard(work, kernel, centers, n, t0)

            sizes = [target] * k  # no penalty on the first pass
            dist_hist: list[float] = []
            move_hist: list[float] = []
            converged = False
            iterations = 0
            for it in range(self.max_iter):
                assigned = self._penalized_assign(
                    work, kernel, centers, sizes, target
                )
                stats = cluster_stats(assigned, kernel, d, self.features_col, None)
                new_centers, cost, sizes, empty = centers_from_stats(
                    stats, kernel, k, centers
                )
                mv = float(np.sqrt(((centers - new_centers) ** 2).sum(axis=1)).max())
                centers = new_centers
                dist_hist.append(float(cost))
                move_hist.append(mv)
                iterations = it + 1
                if mv <= self.tol:
                    converged = True
                    break
        finally:
            if cache_here:
                work.unpersist()

        summary = TrainingSummary(
            algorithm=self._algorithm, k=k, dim=d, divergence=kernel.name,
            iterations=iterations, converged=converged,
            distortion_history=dist_hist, movement_history=move_hist,
            cluster_sizes=[int(s) for s in sizes], elapsed_sec=time() - t0,
        )
        return GeneralizedKMeansModel(
            centers=centers, kernel_name=kernel.name, smoothing=self.smoothing,
            features_col=self.features_col, prediction_col=self.prediction_col,
            distance_col=self.distance_col, summary=summary,
            params={"k": self.k, "divergence": self.divergence,
                    "balanceMode": self.balance_mode,
                    "balancePenalty": self.balance_penalty,
                    "maxIter": self.max_iter, "seed": self.seed},
        )

    def _fit_hard(self, work, kernel, centers, n, t0) -> GeneralizedKMeansModel:
        """Greedy capacity-constrained assignment on collected points
        (reference hard mode, ``BalancedKMeans.scala:427-500``)."""
        from time import time

        if n > _HARD_MODE_WARN_ROWS:
            log.warning(
                "BalancedKMeans hard mode collects all %d rows to the driver; "
                "use balance_mode='soft' at scale", n,
            )
        k, d = centers.shape
        cap = self.max_cluster_size or int(np.ceil(n / k))
        X = np.asarray(
            [r[self.features_col] for r in work.collect()], dtype=np.float64
        )
        labels = np.full(len(X), -1, dtype=int)
        for _ in range(self.max_iter):
            D = kernel.div_np(X, centers)
            order = np.argsort(D.min(axis=1))  # most-confident points first
            counts = np.zeros(k, dtype=int)
            labels = np.full(len(X), -1, dtype=int)
            for i in order:
                for j in np.argsort(D[i]):
                    if counts[j] < cap:
                        labels[i] = j
                        counts[j] += 1
                        break
            new_centers = centers.copy()
            for j in range(k):
                mask = labels == j
                if mask.any():
                    new_centers[j] = kernel.finalize_center(
                        kernel.grad_np(X[mask]).mean(axis=0)
                    )
            mv = float(np.sqrt(((centers - new_centers) ** 2).sum(axis=1)).max())
            centers = new_centers
            if mv <= self.tol:
                break
        sizes = np.bincount(labels[labels >= 0], minlength=k).tolist()
        summary = TrainingSummary(
            algorithm=self._algorithm, k=k, dim=d, divergence=kernel.name,
            iterations=self.max_iter, converged=True,
            distortion_history=[], movement_history=[],
            cluster_sizes=sizes, elapsed_sec=time() - t0,
        )
        return GeneralizedKMeansModel(
            centers=centers, kernel_name=kernel.name, smoothing=self.smoothing,
            features_col=self.features_col, prediction_col=self.prediction_col,
            distance_col=self.distance_col, summary=summary,
            params={"k": self.k, "balanceMode": "hard",
                    "maxClusterSize": cap, "seed": self.seed},
        )
