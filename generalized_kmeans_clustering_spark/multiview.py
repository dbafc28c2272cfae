"""MultiViewKMeans: joint clustering over several feature views.

Re-expression of ``MultiViewKMeans.scala:223-330``: each view is
(features_col, divergence, weight); the joint assignment minimizes
Σ_v w_v·D_v(x_v, μ_v,c) and each view keeps its own center matrix
updated with its own divergence's Bregman centroid.

Spark shape per iteration: the combined distance array is the
element-wise weighted sum of the per-view expression distance arrays —
still ONE map-only projection — followed by ONE groupBy(cluster)
aggregation computing every view's gradient sums together (k rows out).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import Kernel, get_kernel
from .kmeans import _ensure_array_features, _validate_domain
from .operators.assignment import distances_column
from .operators.initialization import initialize
from .summary import TrainingSummary

__all__ = ["MultiViewKMeans", "MultiViewKMeansModel", "View"]


@dataclass
class View:
    features_col: str
    divergence: str = "squaredEuclidean"
    weight: float = 1.0


class MultiViewKMeans:
    _algorithm = "MultiViewKMeans"

    def __init__(
        self,
        k: int = 2,
        views: list | None = None,
        combine_strategy: str = "weighted_sum",  # weighted_sum | max | min
        normalize_weights: bool = True,
        max_iter: int = 20,
        tol: float = 1e-4,
        seed: int = 0,
        smoothing: float = 1e-10,
        prediction_col: str = "prediction",
        distance_col: str | None = None,
    ):
        if not views:
            raise ValueError("need at least one View(features_col, divergence, weight)")
        if combine_strategy not in ("weighted_sum", "max", "min"):
            raise ValueError("combine_strategy: weighted_sum | max | min")
        self.k = k
        self.views = [
            v if isinstance(v, View) else View(*v) for v in views
        ]
        self.combine_strategy = combine_strategy
        self.normalize_weights = normalize_weights
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.smoothing = smoothing
        self.prediction_col = prediction_col
        self.distance_col = distance_col

    def fit(self, df: DataFrame) -> "MultiViewKMeansModel":
        from time import time

        t0 = time()
        kernels: list[Kernel] = [
            get_kernel(v.divergence, smoothing=self.smoothing) for v in self.views
        ]
        weights = np.array([v.weight for v in self.views], dtype=np.float64)
        if self.normalize_weights and weights.sum() > 0:
            weights = weights / weights.sum()
        for v, kern in zip(self.views, kernels):
            df = _ensure_array_features(df, v.features_col)
            if kern.pre_normalize:
                df = df.withColumn(
                    v.features_col, kern.normalize(F.col(v.features_col))
                )
            _validate_domain(df, kern, v.features_col)
        work = df.select(*[v.features_col for v in self.views])
        cache_here = work.storageLevel.useMemory is False
        if cache_here:
            work = work.cache()
        try:
            # initialize each view's centers independently (same seed order)
            centers = [
                initialize(
                    work, self.k, kern, v.features_col, self.seed, "k-means||", 2
                )
                for v, kern in zip(self.views, kernels)
            ]
            dims = [c.shape[1] for c in centers]
            k = self.k
            dist_hist: list[float] = []
            move_hist: list[float] = []
            sizes: list[int] = []
            converged = False
            iterations = 0

            def _merge(a, b):
                if self.combine_strategy == "max":
                    return F.zip_with(a, b, lambda x, y: F.greatest(x, y))
                if self.combine_strategy == "min":
                    return F.zip_with(a, b, lambda x, y: F.least(x, y))
                return F.zip_with(a, b, lambda x, y: x + y)

            for it in range(self.max_iter):
                combined = None
                for w, v, kern, C in zip(weights, self.views, kernels, centers):
                    dv = distances_column(
                        kern, F.col(v.features_col), C.tolist()
                    )
                    term = F.transform(dv, lambda x: x * float(w))
                    combined = term if combined is None else _merge(
                        combined, term
                    )
                staged = work.withColumn("_cd", combined)
                staged = staged.withColumn(
                    "_cluster",
                    (F.expr("array_position(_cd, array_min(_cd))") - 1).cast("int"),
                ).withColumn("_dist", F.array_min("_cd")).drop("_cd")

                aggs = [
                    F.count(F.lit(1)).alias("n"),
                    F.sum("_dist").alias("cost"),
                ]
                for vi, (v, kern, dref) in enumerate(
                    zip(self.views, kernels, dims)
                ):
                    g = kern.grad(F.col(v.features_col))
                    aggs += [
                        F.sum(F.element_at(g, i + 1)).alias(f"v{vi}_g{i}")
                        for i in range(dref)
                    ]
                rows = staged.groupBy("_cluster").agg(*aggs).collect()
                new_centers = [C.copy() for C in centers]
                sizes = [0] * k
                cost = 0.0
                for r in rows:
                    c = int(r["_cluster"])
                    sizes[c] = int(r["n"])
                    cost += float(r["cost"] or 0.0)
                    if r["n"] > 0:
                        for vi, kern in enumerate(kernels):
                            gsum = np.array(
                                [float(r[f"v{vi}_g{i}"] or 0.0)
                                 for i in range(dims[vi])]
                            )
                            new_centers[vi][c] = kern.finalize_center(
                                gsum / r["n"]
                            )
                mv = max(
                    float(np.sqrt(((old - new) ** 2).sum(axis=1)).max())
                    for old, new in zip(centers, new_centers)
                )
                centers = new_centers
                dist_hist.append(cost)
                move_hist.append(mv)
                iterations = it + 1
                if mv <= self.tol:
                    converged = True
                    break
        finally:
            if cache_here:
                work.unpersist()

        summary = TrainingSummary(
            algorithm=self._algorithm, k=k, dim=int(sum(dims)),
            divergence="+".join(kern.name for kern in kernels),
            iterations=iterations, converged=converged,
            distortion_history=dist_hist, movement_history=move_hist,
            cluster_sizes=sizes, elapsed_sec=time() - t0,
        )
        return MultiViewKMeansModel(
            views=self.views, kernels=kernels, centers=centers,
            weights=weights, combine_strategy=self.combine_strategy,
            prediction_col=self.prediction_col,
            distance_col=self.distance_col, summary=summary,
        )


class MultiViewKMeansModel:
    def __init__(self, views, kernels, centers, weights,
                 combine_strategy="weighted_sum",
                 prediction_col="prediction", distance_col=None, summary=None):
        self.combine_strategy = combine_strategy
        self.views = views
        self.kernels = kernels
        self.centers = [np.asarray(c, dtype=np.float64) for c in centers]
        self.weights = np.asarray(weights, dtype=np.float64)
        self.prediction_col = prediction_col
        self.distance_col = distance_col
        self.summary = summary

    @property
    def k(self) -> int:
        return len(self.centers[0])

    def transform(self, df: DataFrame) -> DataFrame:
        for v, kern in zip(self.views, self.kernels):
            df = _ensure_array_features(df, v.features_col)
        def _merge(a, b):
            if self.combine_strategy == "max":
                return F.zip_with(a, b, lambda x, y: F.greatest(x, y))
            if self.combine_strategy == "min":
                return F.zip_with(a, b, lambda x, y: F.least(x, y))
            return F.zip_with(a, b, lambda x, y: x + y)

        combined = None
        for w, v, kern, C in zip(
            self.weights, self.views, self.kernels, self.centers
        ):
            feats = F.col(v.features_col)
            if kern.pre_normalize:
                feats = kern.normalize(feats)
            dv = distances_column(kern, feats, C.tolist())
            term = F.transform(dv, lambda x: x * float(w))
            combined = term if combined is None else _merge(combined, term)
        out = df.withColumn("_mv_d", combined)
        out = out.withColumn(
            self.prediction_col,
            (F.expr("array_position(_mv_d, array_min(_mv_d))") - 1).cast("int"),
        )
        if self.distance_col:
            out = out.withColumn(self.distance_col, F.array_min("_mv_d"))
        return out.drop("_mv_d")
