"""RobustKMeans: outlier-aware Lloyd's.

Re-expression of ``RobustKMeans.scala:170-290`` +
``df/OutlierDetection.scala:48-376``. Three outlier modes per
iteration, all expressed as one extra distributed quantile/filter on
the assigned frame — never a collect:

- ``trim``: drop the top ``outlier_fraction`` of points by distance
  (global quantile via ``percentile_approx``) before the center
  update (TrimmedCenterUpdate, ``OutlierDetection.scala:183-240``);
- ``threshold``: drop points with distance > ``outlier_threshold``;
- ``mestimator``: Huber down-weighting w(x) = min(1, δ/r(x)) with
  r = √(2D) (M-estimator, ``OutlierDetection.scala:242-307``) — no
  points dropped, influence bounded.

The fitted model carries the final distance threshold so ``transform``
can emit ``outlier_score`` (= distance) and ``is_outlier`` columns
(``RobustKMeans.scala:398-470``).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import get_kernel
from .kmeans import GeneralizedKMeansModel, _ensure_array_features, _validate_domain
from .operators.assignment import auto_assigner
from .operators.initialization import initialize
from .operators.update import cluster_stats, centers_from_stats
from .summary import TrainingSummary

__all__ = ["RobustKMeans", "RobustKMeansModel"]


class RobustKMeans:
    _algorithm = "RobustKMeans"

    def __init__(
        self,
        k: int = 2,
        divergence: str = "squaredEuclidean",
        outlier_mode: str = "trim",  # trim | threshold | mestimator
        outlier_fraction: float = 0.05,
        outlier_threshold: float = float("inf"),
        huber_delta: float = 1.35,
        max_iter: int = 20,
        tol: float = 1e-4,
        seed: int = 0,
        smoothing: float = 1e-10,
        init_mode: str = "k-means||",
        features_col: str = "features",
        prediction_col: str = "prediction",
        distance_col: str | None = None,
        outlier_score_col: str = "outlier_score",
        is_outlier_col: str = "is_outlier",
        initial_centers=None,
        exact_quantile: bool = False,
    ):
        if outlier_mode not in ("trim", "threshold", "mestimator"):
            raise ValueError("outlier_mode: trim | threshold | mestimator")
        if not (0.0 <= outlier_fraction < 1.0):
            raise ValueError("outlier_fraction in [0, 1)")
        self.k = k
        self.divergence = divergence
        self.outlier_mode = outlier_mode
        self.outlier_fraction = outlier_fraction
        self.outlier_threshold = outlier_threshold
        self.huber_delta = huber_delta
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.smoothing = smoothing
        self.init_mode = init_mode
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.distance_col = distance_col
        self.outlier_score_col = outlier_score_col
        self.is_outlier_col = is_outlier_col
        self.initial_centers = initial_centers
        # exact order-statistic trim threshold (the ceil(q·n)-th smallest
        # distance via a distributed TakeOrdered) instead of
        # percentile_approx — engine-agnostic exact semantics for parity
        # checks; default stays approx for 100 TB runs.
        # In this mode centers are also snapped to a fixed 1e-6 decimal
        # grid after every update: float aggregation drift (partial-merge
        # order varies run-to-run under AQE) is ~1e-13 per coordinate
        # here, so rounding makes each iteration's centers — and hence
        # every distance, the trim threshold, and the kept SET —
        # bit-reproducible across runs and engines. Without the snap, a
        # point sitting exactly on the trim boundary can flip between
        # runs and compound over iterations.
        self.exact_quantile = exact_quantile

    def fit(self, df: DataFrame) -> "RobustKMeansModel":
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
            threshold = float(self.outlier_threshold)
            dist_hist: list[float] = []
            move_hist: list[float] = []
            sizes: list[int] = []
            converged = False
            iterations = 0

            for it in range(self.max_iter):
                assigner = auto_assigner(k, d, "auto", kernel=kernel)
                assigned = assigner.assign(
                    work, kernel, centers.tolist(), self.features_col
                )
                weight_col = None
                if self.outlier_mode == "trim" and self.outlier_fraction > 0:
                    q = 1.0 - self.outlier_fraction
                    if self.exact_quantile:
                        import math

                        n = assigned.count()
                        pos = max(int(math.ceil(q * n)), 1)
                        threshold = float(
                            assigned.select("_dist").orderBy("_dist")
                            .limit(pos).agg(F.max("_dist").alias("q"))
                            .collect()[0]["q"]
                        )
                    else:
                        threshold = float(
                            assigned.select(
                                F.percentile_approx("_dist", q, 10_000)
                                .alias("q")
                            ).collect()[0]["q"]
                        )
                    inliers = assigned.where(F.col("_dist") <= threshold)
                elif self.outlier_mode == "threshold":
                    inliers = assigned.where(F.col("_dist") <= threshold)
                else:  # mestimator: Huber weights, keep all rows
                    r = F.sqrt(2.0 * F.col("_dist")) + F.lit(1e-12)
                    inliers = assigned.withColumn(
                        "_hw",
                        F.least(F.lit(1.0), F.lit(self.huber_delta) / r),
                    )
                    weight_col = "_hw"

                stats = cluster_stats(
                    inliers, kernel, d, self.features_col, weight_col
                )
                new_centers, cost, sizes, empty = centers_from_stats(
                    stats, kernel, k, centers
                )
                if self.exact_quantile:
                    # parity mode: snap to the decimal grid (see
                    # __init__) — floor(x·1e6 + 0.5)/1e6 is the same
                    # IEEE arithmetic in numpy and any SQL engine,
                    # unlike round()'s engine-specific tie-breaking
                    new_centers = np.floor(new_centers * 1e6 + 0.5) / 1e6
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
            cluster_sizes=sizes, elapsed_sec=time() - t0,
        )
        return RobustKMeansModel(
            centers=centers, kernel_name=kernel.name, smoothing=self.smoothing,
            features_col=self.features_col, prediction_col=self.prediction_col,
            distance_col=self.distance_col, outlier_threshold=threshold,
            outlier_score_col=self.outlier_score_col,
            is_outlier_col=self.is_outlier_col, summary=summary,
            params={"k": self.k, "divergence": self.divergence,
                    "outlierMode": self.outlier_mode,
                    "outlierFraction": self.outlier_fraction,
                    "outlierThreshold": threshold,
                    "maxIter": self.max_iter, "seed": self.seed},
        )


class RobustKMeansModel(GeneralizedKMeansModel):
    """transform adds outlier_score (= min distance) and is_outlier."""

    def __init__(self, centers, kernel_name, smoothing=1e-10,
                 features_col="features", prediction_col="prediction",
                 distance_col=None, outlier_threshold=float("inf"),
                 outlier_score_col="outlier_score", is_outlier_col="is_outlier",
                 summary=None, params=None):
        super().__init__(
            centers, kernel_name, smoothing=smoothing,
            features_col=features_col, prediction_col=prediction_col,
            distance_col=distance_col or "_rk_dist", summary=summary,
            params=params,
        )
        self._user_distance_col = distance_col
        self.outlier_threshold = outlier_threshold
        self.outlier_score_col = outlier_score_col
        self.is_outlier_col = is_outlier_col

    def _extra_metadata(self) -> dict:
        return {"outlierThreshold": self.outlier_threshold,
                "outlierScoreCol": self.outlier_score_col,
                "isOutlierCol": self.is_outlier_col,
                "userDistanceCol": self._user_distance_col}

    @classmethod
    def _construct_loaded(cls, centers, weights, meta):
        ex = meta.get("extra", {})
        return cls(
            centers=centers, kernel_name=meta["divergence"],
            smoothing=meta.get("smoothing", 1e-10),
            features_col=meta.get("featuresCol", "features"),
            prediction_col=meta.get("predictionCol", "prediction"),
            distance_col=ex.get("userDistanceCol"),
            outlier_threshold=ex.get("outlierThreshold", float("inf")),
            outlier_score_col=ex.get("outlierScoreCol", "outlier_score"),
            is_outlier_col=ex.get("isOutlierCol", "is_outlier"),
            params=meta.get("paramMap", {}),
        )

    def transform(self, df: DataFrame) -> DataFrame:
        out = super().transform(df)
        dcol = self.distance_col
        out = out.withColumn(self.outlier_score_col, F.col(dcol))
        out = out.withColumn(
            self.is_outlier_col,
            F.col(dcol) > F.lit(float(self.outlier_threshold)),
        )
        if not self._user_distance_col:
            out = out.drop(dcol)
        return out
