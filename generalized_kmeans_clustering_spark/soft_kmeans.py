"""SoftKMeans (fuzzy c-means with Bregman divergences).

Re-expression of the reference estimator ``SoftKMeans.scala:179-281``:
E-step Boltzmann memberships P(c|x) ∝ exp(−β·D(x,μ_c))
(``df/SoftAssignments.scala:26-56``), M-step membership-weighted
Bregman centroid, convergence on relative soft-cost change.

Spark shape: ONE aggregation job per iteration. The E-step membership
array and the per-component weighted gradient sums are folded into a
single global ``agg`` with k·(d+1)+1 columns (map-side combined, k·d
doubles to the driver) — no explode, no shuffle of data rows, no
Python. For very wide k·d the M-step falls back to a posexplode
aggregation keyed by component.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import Kernel
from .kmeans import GeneralizedKMeansModel, _ensure_array_features, _validate_domain
from .operators.assignment import distances_column
from .operators.initialization import initialize
from .operators.soft import soft_assign, soft_membership_column
from .summary import TrainingSummary

__all__ = ["SoftKMeans", "SoftKMeansModel"]

_AGG_COL_LIMIT = 4096  # k·d beyond which the M-step uses posexplode


class SoftKMeans:
    """Fuzzy k-means: every point belongs to every cluster with
    Boltzmann weight; β → ∞ recovers hard k-means."""

    _algorithm = "SoftKMeans"

    def __init__(
        self,
        k: int = 2,
        divergence: str = "squaredEuclidean",
        beta: float = 1.0,
        min_membership: float = 0.0,
        max_iter: int = 20,
        tol: float = 1e-4,
        seed: int = 0,
        init_mode: str = "k-means||",
        init_steps: int = 2,
        smoothing: float = 1e-10,
        features_col: str = "features",
        prediction_col: str = "prediction",
        probability_col: str = "probability",
        weight_col: str | None = None,
        initial_centers=None,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.divergence = divergence
        self.beta = float(beta)
        self.min_membership = float(min_membership)
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.init_mode = init_mode
        self.init_steps = init_steps
        self.smoothing = smoothing
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.probability_col = probability_col
        self.weight_col = weight_col
        self.initial_centers = initial_centers

    def _kernel(self) -> Kernel:
        from .functions.kernels import get_kernel

        return get_kernel(self.divergence, smoothing=self.smoothing)

    def fit(self, df: DataFrame) -> "SoftKMeansModel":
        from time import time

        from .events import (ConvergenceDetected, InitializationCompleted,
                             IterationTracker, SummarySink,
                             TrainingCompleted)

        sink = SummarySink()
        t0 = time()
        kernel = self._kernel()
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
                    self.init_mode, self.init_steps,
                )
                _init_method = self.init_mode
            sink.record(InitializationCompleted(
                method=_init_method, duration=int((time() - _it0) * 1000)))
            k, d = centers.shape
            w = F.col(self.weight_col) if self.weight_col else F.lit(1.0)
            grad = kernel.grad(F.col(self.features_col))
            cost_hist: list[float] = []
            converged = False
            iterations = 0

            mv_hist: list[float] = []
            for it in range(self.max_iter):
                tracker = IterationTracker(sink, it)
                # stage the distance array ONCE; memberships and the
                # cost terms both read it (soft_assign would recompute
                # the k divergences for the cost column otherwise)
                b = self.beta
                staged = work.withColumn(
                    "_d", distances_column(kernel, F.col(self.features_col),
                                           centers.tolist())
                )
                staged = staged.withColumn("_dmin", F.array_min("_d"))
                staged = staged.withColumn(
                    "_raw",
                    F.transform("_d", lambda dj: F.exp(-b * (dj - F.col("_dmin")))),
                )
                staged = staged.withColumn(
                    "_tot", F.aggregate("_raw", F.lit(0.0), lambda a, v: a + v)
                )
                probs = F.transform("_raw", lambda v: v / F.col("_tot"))
                if self.min_membership > 0:
                    staged = staged.withColumn(
                        "_fl",
                        F.transform(
                            probs,
                            lambda p: F.greatest(
                                p, F.lit(float(self.min_membership))
                            ),
                        ),
                    )
                    staged = staged.withColumn(
                        "_ftot",
                        F.aggregate("_fl", F.lit(0.0), lambda a, v: a + v),
                    )
                    probs = F.transform("_fl", lambda p: p / F.col("_ftot"))
                staged = staged.withColumn("_p", probs)
                if k * d <= _AGG_COL_LIMIT:
                    aggs = [
                        F.sum(
                            w * F.element_at("_p", j + 1) * F.element_at("_d", j + 1)
                        ).alias(f"cost{j}")
                        for j in range(k)
                    ]
                    aggs += [
                        F.sum(w * F.element_at("_p", j + 1)).alias(f"w{j}")
                        for j in range(k)
                    ]
                    aggs += [
                        F.sum(
                            w * F.element_at("_p", j + 1) * F.element_at(grad, i + 1)
                        ).alias(f"g{j}_{i}")
                        for j in range(k)
                        for i in range(d)
                    ]
                    row = staged.agg(*aggs).collect()[0]
                    wsum = np.array([float(row[f"w{j}"] or 0.0) for j in range(k)])
                    gsum = np.array(
                        [[float(row[f"g{j}_{i}"] or 0.0) for i in range(d)]
                         for j in range(k)]
                    )
                    cost = float(sum(float(row[f"cost{j}"] or 0.0) for j in range(k)))
                else:
                    ex = staged.select(
                        w.alias("_w"),
                        F.posexplode("_p").alias("_j", "_pj"),
                        grad.alias("_g"),
                        F.col("_d").alias("_dd"),
                    ).select(
                        "_j",
                        (F.col("_w") * F.col("_pj")).alias("_wp"),
                        (F.col("_w") * F.col("_pj")
                         * F.element_at("_dd", F.col("_j") + 1)).alias("_c"),
                        F.zip_with(
                            "_g",
                            F.array_repeat(F.col("_wp"), d),
                            lambda g, wp: g * wp,
                        ).alias("_wg"),
                    )
                    rows = ex.groupBy("_j").agg(
                        F.sum("_wp").alias("w"),
                        F.sum("_c").alias("cost"),
                        *[F.sum(F.element_at("_wg", i + 1)).alias(f"g{i}")
                          for i in range(d)],
                    ).collect()
                    wsum = np.zeros(k)
                    gsum = np.zeros((k, d))
                    cost = 0.0
                    for r in rows:
                        j = int(r["_j"])
                        wsum[j] = float(r["w"] or 0.0)
                        gsum[j] = [float(r[f"g{i}"] or 0.0) for i in range(d)]
                        cost += float(r["cost"] or 0.0)

                new_centers = centers.copy()
                for j in range(k):
                    if wsum[j] > 0:
                        new_centers[j] = kernel.finalize_center(gsum[j] / wsum[j])
                mv = float(np.sqrt(((centers - new_centers) ** 2)
                                   .sum(axis=1)).max())
                centers = new_centers
                cost_hist.append(cost)
                mv_hist.append(mv)
                iterations = it + 1
                tracker.complete(cost=float(cost), center_movement=mv)
                if len(cost_hist) >= 2:
                    prev = cost_hist[-2]
                    if abs(prev - cost) <= self.tol * max(abs(prev), 1e-12):
                        converged = True
                        sink.record(ConvergenceDetected(
                            iteration=it, reason="cost_delta_below_tol"))
                        break
        finally:
            if cache_here:
                work.unpersist()

        sink.record(TrainingCompleted(
            total_iterations=iterations,
            final_cost=cost_hist[-1] if cost_hist else float("nan"),
            total_duration=int((time() - t0) * 1000)))
        summary = TrainingSummary(
            algorithm=self._algorithm,
            k=k, dim=d, divergence=kernel.name,
            iterations=iterations, converged=converged,
            distortion_history=cost_hist, movement_history=mv_hist,
            cluster_sizes=[], elapsed_sec=time() - t0,
            events=sink.get_events(),
        )
        return SoftKMeansModel(
            centers=centers, kernel_name=kernel.name, smoothing=self.smoothing,
            beta=self.beta, min_membership=self.min_membership,
            features_col=self.features_col, prediction_col=self.prediction_col,
            probability_col=self.probability_col, summary=summary,
            params={"k": self.k, "divergence": self.divergence,
                    "beta": self.beta, "minMembership": self.min_membership,
                    "maxIter": self.max_iter, "tol": self.tol, "seed": self.seed},
        )


class SoftKMeansModel(GeneralizedKMeansModel):
    """Hard predictions + membership probability column
    (``SoftKMeansModel.scala:61-160``)."""

    def __init__(self, centers, kernel_name, smoothing=1e-10, beta=1.0,
                 min_membership=0.0, features_col="features",
                 prediction_col="prediction", probability_col="probability",
                 summary=None, params=None):
        super().__init__(
            centers, kernel_name, smoothing=smoothing,
            features_col=features_col, prediction_col=prediction_col,
            summary=summary, params=params,
        )
        self.beta = beta
        self.min_membership = min_membership
        self.probability_col = probability_col

    def transform(self, df: DataFrame) -> DataFrame:
        out = super().transform(df)
        kernel = self._kernel()
        feats = F.col(self.features_col)
        if kernel.pre_normalize:
            feats = kernel.normalize(feats)
        return out.withColumn(
            self.probability_col,
            soft_membership_column(
                kernel, feats, self.centers.tolist(),
                beta=self.beta, min_membership=self.min_membership,
            ),
        )

    def _extra_metadata(self) -> dict:
        return {"beta": self.beta, "minMembership": self.min_membership,
                "probabilityCol": self.probability_col}

    @classmethod
    def _construct_loaded(cls, centers, weights, meta):
        ex = meta.get("extra", {})
        return cls(
            centers=centers, kernel_name=meta["divergence"],
            smoothing=meta.get("smoothing", 1e-10),
            beta=ex.get("beta", 1.0),
            min_membership=ex.get("minMembership", 0.0),
            features_col=meta.get("featuresCol", "features"),
            prediction_col=meta.get("predictionCol", "prediction"),
            probability_col=ex.get("probabilityCol", "probability"),
            params=meta.get("paramMap", {}),
        )

    def predict_soft(self, vector) -> np.ndarray:
        kernel = self._kernel()
        x = np.asarray(vector, dtype=np.float64)[None, :]
        dist = kernel.div_np(x, self.centers)[0]
        raw = np.exp(-self.beta * (dist - dist.min()))
        p = raw / raw.sum()
        if self.min_membership > 0:
            p = np.maximum(p, self.min_membership)
            p = p / p.sum()
        return p

    def effective_num_clusters(self, df: DataFrame) -> float:
        """exp(mean membership entropy) (``SoftKMeansModel.scala:141-160``)."""
        out = self.transform(df)
        ent = F.aggregate(
            F.col(self.probability_col),
            F.lit(0.0),
            lambda acc, p: acc - F.when(p > 0, p * F.log(p)).otherwise(0.0),
        )
        row = out.select(F.avg(ent).alias("h")).collect()[0]
        return float(np.exp(row["h"] or 0.0))
