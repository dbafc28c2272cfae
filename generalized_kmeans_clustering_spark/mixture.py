"""BregmanMixture: full EM over Bregman-exponential-family components.

Re-expression of ``BregmanMixtureModel.scala:150-236`` +
``df/EMIterator.scala:113-358``: soft-max responsibilities
γ(c|x) ∝ π_c·exp(−D(x,μ_c)) with log-sum-exp stabilization, component
weights π updated from responsibility masses (optional symmetric
Dirichlet regularization α), centers = responsibility-weighted Bregman
centroids, convergence on mean log-likelihood improvement.

Spark shape: ONE global aggregation per EM iteration — responsibilities
and the per-component weighted gradient sums are pure Catalyst array
expressions; the agg returns k·(d+1)+1 doubles to the driver. No
explode, no shuffle of data rows, no Python.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import get_kernel
from .kmeans import GeneralizedKMeansModel, _ensure_array_features, _validate_domain
from .operators.assignment import distances_column
from .operators.initialization import initialize
from .summary import TrainingSummary

__all__ = ["BregmanMixture", "BregmanMixtureModel"]


class BregmanMixture:
    """EM mixture of Bregman components (soft clustering with weights)."""

    _algorithm = "BregmanMixture"

    def __init__(
        self,
        k: int = 2,
        divergence: str = "squaredEuclidean",
        max_iter: int = 50,
        tol: float = 1e-6,
        seed: int = 0,
        regularization: float = 0.0,
        smoothing: float = 1e-10,
        init_mode: str = "k-means||",
        features_col: str = "features",
        prediction_col: str = "prediction",
        probability_col: str = "probability",
        weight_col: str | None = None,
        initial_centers=None,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        if regularization < 0:
            raise ValueError("regularization must be >= 0")
        self.k = k
        self.divergence = divergence
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.regularization = float(regularization)
        self.smoothing = smoothing
        self.init_mode = init_mode
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.probability_col = probability_col
        self.weight_col = weight_col
        self.initial_centers = initial_centers

    def fit(self, df: DataFrame) -> "BregmanMixtureModel":
        from time import time

        from .events import (ConvergenceDetected, InitializationCompleted,
                             IterationTracker, SummarySink,
                             TrainingCompleted)

        sink = SummarySink()
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
            _it0 = time()
            if self.initial_centers is not None:
                centers = np.asarray(self.initial_centers, dtype=np.float64)
                if kernel.pre_normalize:
                    centers = kernel.normalize_np(centers)
                _init_method = "provided"
            else:
                centers = initialize(
                    work, self.k, kernel, self.features_col, self.seed,
                    self.init_mode, 2,
                )
                _init_method = self.init_mode
            sink.record(InitializationCompleted(
                method=_init_method, duration=int((time() - _it0) * 1000)))
            k, d = centers.shape
            pi = np.full(k, 1.0 / k)
            w = F.col(self.weight_col) if self.weight_col else F.lit(1.0)
            grad = kernel.grad(F.col(self.features_col))
            ll_hist: list[float] = []
            converged = False
            iterations = 0

            mv_hist: list[float] = []
            for it in range(self.max_iter):
                tracker = IterationTracker(sink, it)
                # s_j = D(x,μ_j) − ln π_j ; γ_j = softmax(−s_j);
                # row loglik = ln Σ_j exp(−s_j)  (log-sum-exp on −s)
                dists = distances_column(
                    kernel, F.col(self.features_col), centers.tolist()
                )
                lnpi = F.array(*[F.lit(float(np.log(max(p, 1e-300)))) for p in pi])
                staged = work.withColumn(
                    "_s", F.zip_with(dists, lnpi, lambda dj, lp: dj - lp)
                )
                staged = staged.withColumn("_m", F.array_min("_s"))
                staged = staged.withColumn(
                    "_e", F.transform("_s", lambda s: F.exp(F.col("_m") - s))
                )
                staged = staged.withColumn(
                    "_z", F.aggregate("_e", F.lit(0.0), lambda a, v: a + v)
                )
                staged = staged.withColumn(
                    "_g", F.transform("_e", lambda e: e / F.col("_z"))
                )
                row_ll = -F.col("_m") + F.log("_z")
                aggs = [F.sum(w * row_ll).alias("ll"), F.sum(w).alias("wtot")]
                aggs += [
                    F.sum(w * F.element_at("_g", j + 1)).alias(f"r{j}")
                    for j in range(k)
                ]
                aggs += [
                    F.sum(
                        w * F.element_at("_g", j + 1) * F.element_at(grad, i + 1)
                    ).alias(f"g{j}_{i}")
                    for j in range(k) for i in range(d)
                ]
                res = staged.agg(*aggs).collect()[0]
                wtot = float(res["wtot"] or 0.0)
                ll = float(res["ll"] or 0.0) / max(wtot, 1e-300)
                r = np.array([float(res[f"r{j}"] or 0.0) for j in range(k)])
                G = np.array(
                    [[float(res[f"g{j}_{i}"] or 0.0) for i in range(d)]
                     for j in range(k)]
                )
                # M-step
                alpha = self.regularization
                pi = (r + alpha) / (wtot + alpha * k)
                pi = np.maximum(pi, 1e-300)
                pi = pi / pi.sum()
                old_centers = centers.copy()
                for j in range(k):
                    if r[j] > 0:
                        centers[j] = kernel.finalize_center(G[j] / r[j])
                mv = float(np.sqrt(((old_centers - centers) ** 2)
                                   .sum(axis=1)).max())
                ll_hist.append(ll)
                mv_hist.append(mv)
                iterations = it + 1
                # event cost = neg mean loglik (the decreasing objective)
                tracker.complete(cost=-ll, center_movement=mv)
                if len(ll_hist) >= 2 and abs(ll_hist[-1] - ll_hist[-2]) <= self.tol * max(
                    abs(ll_hist[-2]), 1e-12
                ):
                    converged = True
                    sink.record(ConvergenceDetected(
                        iteration=it, reason="loglik_delta_below_tol"))
                    break
        finally:
            if cache_here:
                work.unpersist()

        sink.record(TrainingCompleted(
            total_iterations=iterations,
            final_cost=-ll_hist[-1] if ll_hist else float("nan"),
            total_duration=int((time() - t0) * 1000)))
        summary = TrainingSummary(
            algorithm=self._algorithm, k=k, dim=d, divergence=kernel.name,
            iterations=iterations, converged=converged,
            distortion_history=[-x for x in ll_hist],  # neg-loglik, decreasing
            movement_history=mv_hist, cluster_sizes=[],
            elapsed_sec=time() - t0, events=sink.get_events(),
        )
        return BregmanMixtureModel(
            centers=centers, weights=pi, kernel_name=kernel.name,
            smoothing=self.smoothing, features_col=self.features_col,
            prediction_col=self.prediction_col,
            probability_col=self.probability_col,
            log_likelihood=ll_hist[-1] if ll_hist else float("nan"),
            summary=summary,
            params={"k": self.k, "divergence": self.divergence,
                    "maxIter": self.max_iter, "tol": self.tol,
                    "seed": self.seed, "regularization": self.regularization},
        )


class BregmanMixtureModel(GeneralizedKMeansModel):
    """Mixture model: π + centers; transform adds MAP component and
    responsibility probabilities."""

    def __init__(self, centers, weights, kernel_name, smoothing=1e-10,
                 features_col="features", prediction_col="prediction",
                 probability_col="probability", log_likelihood=float("nan"),
                 summary=None, params=None):
        super().__init__(
            centers, kernel_name, smoothing=smoothing,
            features_col=features_col, prediction_col=prediction_col,
            summary=summary, params=params,
        )
        self.weights = np.asarray(weights, dtype=np.float64)
        self.probability_col = probability_col
        self.log_likelihood = log_likelihood

    def _extra_metadata(self) -> dict:
        return {"probabilityCol": self.probability_col,
                "logLikelihood": self.log_likelihood}

    def _center_weights(self):
        return [float(w) for w in self.weights]

    @classmethod
    def _construct_loaded(cls, centers, weights, meta):
        ex = meta.get("extra", {})
        return cls(
            centers=centers, weights=weights,
            kernel_name=meta["divergence"],
            smoothing=meta.get("smoothing", 1e-10),
            features_col=meta.get("featuresCol", "features"),
            prediction_col=meta.get("predictionCol", "prediction"),
            probability_col=ex.get("probabilityCol", "probability"),
            log_likelihood=ex.get("logLikelihood", float("nan")),
            params=meta.get("paramMap", {}),
        )

    def _resp_col(self, feats):
        kernel = self._kernel()
        dists = distances_column(kernel, feats, self.centers.tolist())
        lnpi = F.array(*[F.lit(float(np.log(max(p, 1e-300)))) for p in self.weights])
        s = F.zip_with(dists, lnpi, lambda dj, lp: dj - lp)
        m = F.array_min(s)
        e = F.transform(s, lambda v: F.exp(m - v))
        z = F.aggregate(e, F.lit(0.0), lambda a, v: a + v)
        return F.transform(e, lambda v: v / z)

    def transform(self, df: DataFrame) -> DataFrame:
        df = _ensure_array_features(df, self.features_col)
        kernel = self._kernel()
        feats = F.col(self.features_col)
        if kernel.pre_normalize:
            feats = kernel.normalize(feats)
        probs = self._resp_col(feats)
        out = df.withColumn(self.probability_col, probs)
        return out.withColumn(
            self.prediction_col,
            (F.expr(f"array_position({self.probability_col}, "
                    f"array_max({self.probability_col}))") - 1).cast("int"),
        )

    def predict_soft(self, vector) -> np.ndarray:
        kernel = self._kernel()
        x = np.asarray(vector, dtype=np.float64)[None, :]
        s = kernel.div_np(x, self.centers)[0] - np.log(self.weights)
        e = np.exp(s.min() - s)
        return e / e.sum()

    def avg_log_likelihood(self, df: DataFrame) -> float:
        df = _ensure_array_features(df, self.features_col)
        kernel = self._kernel()
        feats = F.col(self.features_col)
        if kernel.pre_normalize:
            feats = kernel.normalize(feats)
        dists = distances_column(kernel, feats, self.centers.tolist())
        lnpi = F.array(*[F.lit(float(np.log(max(p, 1e-300)))) for p in self.weights])
        s = F.zip_with(dists, lnpi, lambda dj, lp: dj - lp)
        m = F.array_min(s)
        z = F.aggregate(
            F.transform(s, lambda v: F.exp(m - v)), F.lit(0.0), lambda a, v: a + v
        )
        row = df.select(F.avg(-m + F.log(z)).alias("ll")).collect()[0]
        return float(row["ll"])
