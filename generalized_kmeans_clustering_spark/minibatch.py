"""MiniBatchKMeans: incremental centers over sampled batches.

Re-expression of ``MiniBatchKMeans.scala:152-330``: per iteration draw
a small random batch (``df.sample`` — executor-side, then the ≤
batch_size rows are collected, which is fine by construction), update
centers with per-center learning rate η = 1/count_c (Sculley 2010),
early-stop after ``max_no_improvement`` iterations without smoothed
batch-cost improvement; low-mass centers are reassigned to random
batch points when their count falls below ``reassignment_ratio`` ×
max count.

Spark shape: per iteration ONE sample+collect job over the cached
input; all center math is driver-side numpy on the batch. Designed for
cheap approximate clustering of huge inputs — batch cost is
independent of n.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import get_kernel
from .kmeans import GeneralizedKMeansModel, _ensure_array_features, _validate_domain
from .operators.initialization import initialize
from .summary import TrainingSummary

__all__ = ["MiniBatchKMeans"]


class MiniBatchKMeans:
    _algorithm = "MiniBatchKMeans"

    def __init__(
        self,
        k: int = 2,
        divergence: str = "squaredEuclidean",
        batch_size: int = 1024,
        max_iter: int = 100,
        max_no_improvement: int = 10,
        reassignment_ratio: float = 0.01,
        tol: float = 0.0,
        seed: int = 0,
        smoothing: float = 1e-10,
        init_mode: str = "random",
        features_col: str = "features",
        prediction_col: str = "prediction",
        distance_col: str | None = None,
        initial_centers=None,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.divergence = divergence
        self.batch_size = batch_size
        self.max_iter = max_iter
        self.max_no_improvement = max_no_improvement
        self.reassignment_ratio = reassignment_ratio
        self.tol = tol
        self.seed = seed
        self.smoothing = smoothing
        self.init_mode = init_mode
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.distance_col = distance_col
        self.initial_centers = initial_centers

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
            frac = min(1.0, self.batch_size * 1.25 / max(n, 1))
            if self.initial_centers is not None:
                centers = np.asarray(self.initial_centers, dtype=np.float64)
                if kernel.pre_normalize:
                    centers = kernel.normalize_np(centers)
            else:
                centers = initialize(
                    work, self.k, kernel, self.features_col, self.seed,
                    self.init_mode, 2,
                )
            k = len(centers)
            from .events import (ConvergenceDetected, IterationTracker,
                                 SummarySink, TrainingCompleted)

            sink = SummarySink()
            counts = np.zeros(k)
            rng = np.random.RandomState(self.seed)
            cost_hist: list[float] = []
            best_smooth = float("inf")
            stall = 0
            iterations = 0
            converged = False

            for it in range(self.max_iter):
                tracker = IterationTracker(sink, it)
                batch_rows = (
                    work.sample(fraction=frac, seed=self.seed + it)
                    .limit(self.batch_size).collect()
                )
                if not batch_rows:
                    continue
                X = np.asarray(
                    [r[self.features_col] for r in batch_rows], dtype=np.float64
                )
                D = kernel.div_np(X, centers)
                lab = D.argmin(axis=1)
                cost = float(D[np.arange(len(lab)), lab].mean())
                cost_hist.append(cost)
                # per-point incremental update in gradient space
                old = centers.copy()
                gradc = kernel.grad_np(centers.copy())
                for x, c in zip(X, lab):
                    counts[c] += 1
                    eta = 1.0 / counts[c]
                    gradc[c] = (1 - eta) * gradc[c] + eta * kernel.grad_np(
                        x[None, :]
                    )[0]
                centers = np.vstack(
                    [kernel.finalize_center(gradc[j]) for j in range(k)]
                )
                # reassign starving centers to random batch points
                if self.reassignment_ratio > 0 and counts.max() > 0:
                    starving = counts < self.reassignment_ratio * counts.max()
                    for j in np.where(starving)[0]:
                        if rng.rand() < 0.5 and len(X):
                            centers[j] = X[rng.randint(len(X))]
                            counts[j] = 0
                iterations = it + 1
                mv = float(np.sqrt(((old - centers) ** 2).sum(axis=1)).max())
                tracker.complete(cost=cost, center_movement=mv)
                smooth = float(np.mean(cost_hist[-5:]))
                if smooth < best_smooth - self.tol * max(best_smooth, 1e-12):
                    best_smooth = smooth
                    stall = 0
                else:
                    stall += 1
                    if stall >= self.max_no_improvement:
                        converged = True
                        sink.record(ConvergenceDetected(
                            iteration=it, reason="no_improvement"))
                        break
                if self.tol > 0 and mv <= self.tol:
                    converged = True
                    sink.record(ConvergenceDetected(
                        iteration=it, reason="center_movement_below_tol"))
                    break
        finally:
            if cache_here:
                work.unpersist()

        sink.record(TrainingCompleted(
            total_iterations=iterations,
            final_cost=cost_hist[-1] if cost_hist else float("nan"),
            total_duration=int((time() - t0) * 1000)))
        summary = TrainingSummary(
            algorithm=self._algorithm, k=k, dim=centers.shape[1],
            divergence=kernel.name, iterations=iterations, converged=converged,
            distortion_history=cost_hist, movement_history=[],
            cluster_sizes=[], elapsed_sec=time() - t0,
            events=sink.get_events(),
        )
        return GeneralizedKMeansModel(
            centers=centers, kernel_name=kernel.name, smoothing=self.smoothing,
            features_col=self.features_col, prediction_col=self.prediction_col,
            distance_col=self.distance_col, summary=summary,
            params={"k": self.k, "divergence": self.divergence,
                    "batchSize": self.batch_size, "maxIter": self.max_iter,
                    "maxNoImprovement": self.max_no_improvement,
                    "reassignmentRatio": self.reassignment_ratio,
                    "seed": self.seed},
        )
