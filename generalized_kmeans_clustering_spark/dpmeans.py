"""DPMeans: nonparametric clustering with a birth threshold λ.

Re-expression of ``DPMeans.scala:240-366``: assign each point to its
nearest center; if the farthest point with distance > λ exists (and
k < max_k), it becomes a NEW cluster center — one birth per
iteration; Lloyd center updates run on the iterations where no birth
happened (the "stable" iterations). Convergence = center movement ≤
tol with no pending births.

Spark shape per iteration: one assignment projection + either
(a) a top-1 ``orderBy(desc(dist)).limit(1)`` (a distributed TakeOrdered
— no full sort) on birth iterations, or (b) the shared one-pass
cluster-stats aggregation on stable iterations.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import get_kernel
from .kmeans import GeneralizedKMeansModel, _ensure_array_features, _validate_domain
from .operators.assignment import auto_assigner
from .operators.update import cluster_stats, centers_from_stats
from .summary import TrainingSummary

__all__ = ["DPMeans"]


class DPMeans:
    """λ-threshold Dirichlet-process-style k-means."""

    _algorithm = "DPMeans"

    def __init__(
        self,
        lam: float = 1.0,
        max_k: int = 50,
        divergence: str = "squaredEuclidean",
        max_iter: int = 20,
        tol: float = 1e-4,
        seed: int = 0,
        smoothing: float = 1e-10,
        features_col: str = "features",
        prediction_col: str = "prediction",
        distance_col: str | None = None,
        weight_col: str | None = None,
    ):
        if lam <= 0:
            raise ValueError("lambda must be > 0")
        self.lam = float(lam)
        self.max_k = max_k
        self.divergence = divergence
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.smoothing = smoothing
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.distance_col = distance_col
        self.weight_col = weight_col

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
        work = df.select(
            *([self.features_col] + ([self.weight_col] if self.weight_col else []))
        )
        cache_here = work.storageLevel.useMemory is False
        if cache_here:
            work = work.cache()
        try:
            d = len(work.select(self.features_col).first()[0])
            # first center: Bregman centroid of all points
            grad = kernel.grad(F.col(self.features_col))
            n = work.count()
            row = work.agg(
                *[F.sum(F.element_at(grad, i + 1)).alias(f"g{i}") for i in range(d)]
            ).collect()[0]
            centers = np.asarray(
                [kernel.finalize_center(
                    np.array([float(row[f"g{i}"]) for i in range(d)]) / max(n, 1)
                )],
                dtype=np.float64,
            )
            from .events import (ConvergenceDetected, IterationTracker,
                                 SummarySink, TrainingCompleted, WarningEvent)

            sink = SummarySink()
            sizes: list[int] = [n]
            dist_hist: list[float] = []
            move_hist: list[float] = []
            converged = False
            iterations = 0

            for it in range(self.max_iter):
                tracker = IterationTracker(sink, it)
                k = len(centers)
                # size-ladder only (no kernel → no pruned rung): k can
                # cross PRUNED_AUTO_MIN_K mid-run as centers are born,
                # and the Arrow pruned path's ulp-level summation order
                # differs from the expression plan the SQL oracle
                # replays — keep λ-means bit-deterministic vs its twin
                assigner = auto_assigner(k, d, "auto")
                assigned = assigner.assign(
                    work, kernel, centers.tolist(), self.features_col
                )
                born = False
                if k < self.max_k:
                    far = (
                        assigned.where(F.col("_dist") > self.lam)
                        .orderBy(F.desc("_dist"))
                        .limit(1)
                        .select(F.col(self.features_col).alias("f"))
                        .collect()
                    )
                    if far:
                        centers = np.vstack(
                            [centers, np.asarray(far[0]["f"], dtype=np.float64)]
                        )
                        born = True
                iterations = it + 1
                if born:
                    move_hist.append(float("inf"))
                    sink.record(WarningEvent(
                        iteration=it,
                        message=f"birthed center {len(centers) - 1} "
                                f"(point farther than lambda={self.lam})",
                        severity="low"))
                    tracker.complete(cost=float("nan"),
                                     center_movement=float("inf"))
                    continue
                # stable iteration: Lloyd update via the shared stats pass
                stats = cluster_stats(
                    assigned, kernel, d, self.features_col, self.weight_col
                )
                new_centers, cost, sizes, empty = centers_from_stats(
                    stats, kernel, k, centers
                )
                if empty:  # drop empties (λ births re-create as needed)
                    keep = [i for i in range(k) if i not in set(empty)]
                    new_centers = new_centers[keep]
                    centers = centers[keep]
                    sizes = [sizes[i] for i in keep]
                    k = len(new_centers)
                mv = (
                    float(np.sqrt(((centers - new_centers) ** 2).sum(axis=1)).max())
                    if centers.shape == new_centers.shape else float("inf")
                )
                centers = new_centers
                dist_hist.append(float(cost))
                move_hist.append(mv)
                tracker.complete(cost=float(cost), center_movement=mv)
                if mv <= self.tol:
                    converged = True
                    sink.record(ConvergenceDetected(
                        iteration=it, reason="center_movement_below_tol"))
                    break
        finally:
            if cache_here:
                work.unpersist()

        sink.record(TrainingCompleted(
            total_iterations=iterations,
            final_cost=dist_hist[-1] if dist_hist else float("nan"),
            total_duration=int((time() - t0) * 1000)))
        summary = TrainingSummary(
            algorithm=self._algorithm, k=len(centers), dim=centers.shape[1],
            divergence=kernel.name, iterations=iterations, converged=converged,
            distortion_history=dist_hist, movement_history=move_hist,
            cluster_sizes=list(sizes), elapsed_sec=time() - t0,
            events=sink.get_events(),
        )
        return GeneralizedKMeansModel(
            centers=centers, kernel_name=kernel.name, smoothing=self.smoothing,
            features_col=self.features_col, prediction_col=self.prediction_col,
            distance_col=self.distance_col, summary=summary,
            params={"lambda": self.lam, "maxK": self.max_k,
                    "divergence": self.divergence, "maxIter": self.max_iter,
                    "tol": self.tol, "seed": self.seed},
        )
