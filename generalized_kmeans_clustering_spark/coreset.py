"""CoresetKMeans: sensitivity-sampled weighted coreset, then weighted fit.

Re-expression of ``CoresetKMeans.scala:138-300`` (coreset build at
:222-262) — notably the reference implements this one with pure
DataFrame expressions already, and so do we:

1. a rough center set (random init, size k) gives every point a
   distance d(x) = min_c D(x, c) — one map-only projection;
2. sensitivity s(x) blends distance mass and uniform mass
   (``sensitivity_strategy``: uniform | distance | density | hybrid —
   density uses the reference's inverse-normalized-distance proxy,
   k-NN-free);
3. inclusion probability p(x) = clamp(coreset_size·s(x),
   min_sampling_prob, 1); Bernoulli sample with ``rand(seed)``;
   weight = 1/p capped at ``max_weight`` — an unbiased estimator of
   the full-data cost;
4. weighted GeneralizedKMeans fit on the ≈coreset_size rows;
5. optional ``refinement_iterations`` full-data Lloyd iterations from
   the coreset solution.

Scale: steps 1–3 are a single map-only pass (no shuffle, no collect);
the expensive iterations run on the tiny weighted coreset.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import get_kernel
from .kmeans import GeneralizedKMeans, GeneralizedKMeansModel, \
    _ensure_array_features, _validate_domain
from .operators.assignment import distances_column
from .operators.initialization import random_init
from .summary import TrainingSummary

__all__ = ["CoresetKMeans"]


class CoresetKMeans:
    _algorithm = "CoresetKMeans"

    def __init__(
        self,
        k: int = 2,
        divergence: str = "squaredEuclidean",
        coreset_size: int = 10_000,
        sensitivity_strategy: str = "hybrid",  # uniform | distance | hybrid
        enable_refinement: bool = False,
        refinement_iterations: int = 2,
        min_sampling_prob: float = 1e-6,
        max_weight: float = 1e6,
        max_iter: int = 20,
        tol: float = 1e-4,
        seed: int = 0,
        smoothing: float = 1e-10,
        features_col: str = "features",
        prediction_col: str = "prediction",
        distance_col: str | None = None,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        if sensitivity_strategy not in ("uniform", "distance", "density",
                                        "hybrid"):
            raise ValueError(
                "sensitivity_strategy: uniform | distance | density | hybrid"
            )
        self.k = k
        self.divergence = divergence
        self.coreset_size = coreset_size
        self.sensitivity_strategy = sensitivity_strategy
        self.enable_refinement = enable_refinement
        self.refinement_iterations = refinement_iterations
        self.min_sampling_prob = min_sampling_prob
        self.max_weight = max_weight
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.smoothing = smoothing
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.distance_col = distance_col

    def sensitivities(self, df: DataFrame,
                      rough_centers=None) -> DataFrame:
        """Attach the deterministic sampling state: ``_cs_sens``
        (normalized sensitivity) and ``_cs_p`` (clamped inclusion
        probability). ``rough_centers`` overrides the seeded random
        pilot set — with fixed centers the whole computation is
        deterministic and cross-engine checkable; the Bernoulli draw
        itself lives only in :meth:`build_coreset`.
        """
        kernel = get_kernel(self.divergence, smoothing=self.smoothing)
        df = _ensure_array_features(df, self.features_col)
        if kernel.pre_normalize:
            df = df.withColumn(
                self.features_col, kernel.normalize(F.col(self.features_col))
            )
        n = df.count()
        if rough_centers is not None:
            import numpy as np

            rough = np.asarray(rough_centers, dtype=np.float64)
            if kernel.pre_normalize:
                rough = kernel.normalize_np(rough)
        else:
            rough = random_init(
                df.select(self.features_col), min(self.k, max(n, 1)),
                self.features_col, self.seed + 7,
            )
        dmin = F.array_min(
            distances_column(kernel, F.col(self.features_col), rough.tolist())
        )
        row = df.select(
            F.sum(dmin).alias("s"), F.max(dmin).alias("m")
        ).collect()[0]
        total = float(row["s"] or 0.0)
        dmax = float(row["m"] or 0.0)

        if self.sensitivity_strategy == "uniform" or total <= 0:
            sens = F.lit(1.0 / max(n, 1))
        elif self.sensitivity_strategy == "distance":
            sens = dmin / F.lit(total)
        elif self.sensitivity_strategy == "density":
            # k-NN-free density proxy (``CoresetKMeans.scala:328-337``):
            # normalized rough-center distance s_d = d/max(d) ∈ [0,1],
            # raw = 1 + 1/(s_d + 0.1) — large where the rough centers
            # are close (locally dense sampled regions); normalized to
            # a distribution with one extra scalar aggregate.
            sd = dmin / F.lit(dmax if dmax > 0 else 1.0)
            raw = F.lit(1.0) + F.lit(1.0) / (sd + F.lit(0.1))
            raw_total = float(
                df.select(
                    F.sum(
                        F.lit(1.0)
                        + F.lit(1.0)
                        / (dmin / F.lit(dmax if dmax > 0 else 1.0) + F.lit(0.1))
                    ).alias("t")
                ).collect()[0]["t"] or 0.0
            )
            sens = raw / F.lit(raw_total if raw_total > 0 else 1.0)
        else:  # hybrid: half distance mass, half uniform mass
            sens = 0.5 * dmin / F.lit(total) + F.lit(0.5 / max(n, 1))

        prob = F.least(
            F.lit(1.0),
            F.greatest(
                F.lit(float(self.min_sampling_prob)),
                F.lit(float(self.coreset_size)) * sens,
            ),
        )
        return df.withColumn("_cs_sens", sens).withColumn("_cs_p", prob)

    def build_coreset(self, df: DataFrame,
                      rough_centers=None) -> DataFrame:
        """(features, _cs_weight) Bernoulli-sampled weighted coreset."""
        out = (
            self.sensitivities(df, rough_centers)
            .where(F.rand(self.seed) < F.col("_cs_p"))
            .withColumn(
                "_cs_weight",
                F.least(F.lit(float(self.max_weight)), 1.0 / F.col("_cs_p")),
            )
            .drop("_cs_p", "_cs_sens")
        )
        return out

    def fit(self, df: DataFrame) -> GeneralizedKMeansModel:
        from time import time

        t0 = time()
        kernel = get_kernel(self.divergence, smoothing=self.smoothing)
        df = _ensure_array_features(df, self.features_col)
        _validate_domain(df, kernel, self.features_col)
        coreset = self.build_coreset(df).cache()
        try:
            model = GeneralizedKMeans(
                k=self.k, divergence=self.divergence, max_iter=self.max_iter,
                tol=self.tol, seed=self.seed, smoothing=self.smoothing,
                features_col=self.features_col,
                prediction_col=self.prediction_col,
                distance_col=self.distance_col, weight_col="_cs_weight",
            ).fit(coreset)
            n_core = sum(model.summary.cluster_sizes)
            if self.enable_refinement and self.refinement_iterations > 0:
                model = GeneralizedKMeans(
                    k=model.k, divergence=self.divergence,
                    max_iter=self.refinement_iterations, tol=self.tol,
                    seed=self.seed, smoothing=self.smoothing,
                    features_col=self.features_col,
                    prediction_col=self.prediction_col,
                    distance_col=self.distance_col,
                    initial_centers=model.centers.tolist(),
                ).fit(df)
        finally:
            coreset.unpersist()
        model.summary.algorithm = self._algorithm
        model.summary.elapsed_sec = time() - t0
        model.params.update(
            {"coresetSize": self.coreset_size,
             "sensitivityStrategy": self.sensitivity_strategy,
             "coresetRows": int(n_core),
             "enableRefinement": self.enable_refinement}
        )
        return model
