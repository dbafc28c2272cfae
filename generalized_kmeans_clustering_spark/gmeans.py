"""G-means: learn k by statistical hypothesis testing.

Parity extension of the model-selection family (reference analog:
``XMeans.scala`` picks k by BIC/AIC — ``xmeans.py``; G-means is the
other classic answer): Hamerly & Elkan, "Learning the k in k-means",
NIPS 2003. Each cluster is split in two and the split is KEPT only if
the cluster's points, projected onto the child-center axis, fail an
Anderson–Darling normality test — "a cluster that does not look
Gaussian needs to be more than one cluster".

Spark-first decomposition:

- the projection, standardization, ranking, and the AD sum are ONE
  window + ONE aggregation per round over all tested clusters
  (:func:`ad_split_statistic` — fully distributed, no driver data);
- the per-cluster 2-means refits reuse the engine's own
  :class:`~.kmeans.GeneralizedKMeans` with the deterministic
  ``meanspread`` child seeds (the bisecting convention);
- Φ(z) is the Abramowitz–Stegun 7.1.26 closed form (max abs error
  1.5e-7) instead of a native erf — deliberately: the SAME arithmetic
  is expressible in any SQL engine, which is what lets the DuckDB
  oracle replay the statistic bitwise.

Scale notes: the AD window sorts each tested cluster's projections —
per-cluster sort shuffle, so a mega-cluster lands in one task's sort
(spill-backed); ``sample_cap`` bounds the tested rows per cluster via
a deterministic hash sample (the statistic is defined on samples —
Hamerly & Elkan themselves subsample). Everything else is the
bisecting loop's cost model.
"""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .functions.kernels import get_kernel
from .kmeans import (
    GeneralizedKMeans,
    GeneralizedKMeansModel,
    _ensure_array_features,
)
from .operators.assignment import distances_column

__all__ = ["GMeans", "ad_split_statistic", "AD_CRITICAL_0001"]

#: Anderson–Darling A*² critical value at significance 0.0001 — the
#: strict level Hamerly & Elkan recommend (Table 1 of the paper):
#: splits must be strongly supported or k inflates on noise.
AD_CRITICAL_0001 = 1.8692


def _phi(z):
    """Standard normal CDF via Abramowitz–Stegun 7.1.26 (|err| <
    1.5e-7) — closed-form arithmetic reproducible in any engine."""
    x = F.abs(z) / F.lit(math.sqrt(2.0))
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * x)
    poly = t * (F.lit(0.254829592) + t * (F.lit(-0.284496736) + t * (
        F.lit(1.421413741) + t * (F.lit(-1.453152027)
                                  + t * F.lit(1.061405429)))))
    erf = F.lit(1.0) - poly * F.exp(-x * x)
    pos = F.lit(0.5) * (F.lit(1.0) + erf)
    return F.when(z >= 0, pos).otherwise(F.lit(1.0) - pos)


def _clamp01(p):
    eps = F.lit(1e-15)
    return F.least(F.greatest(p, eps), F.lit(1.0) - eps)


def ad_split_statistic(
    df: DataFrame,
    c1,
    c2,
    features_col: str = "features",
    cluster_col: str | None = None,
) -> DataFrame:
    """Anderson–Darling A*² of each cluster's points projected onto
    the child-center axis ``v = c1 − c2`` → ``(cluster?, n, ad_stat)``.

    The G-means split test: standardize the projections (sample mean /
    sample std), rank them per cluster, and fold the standard AD sum

    ``A² = −n − (1/n) Σᵢ [(2i−1)·ln Φ(zᵢ) + (2(n−i)+1)·ln(1−Φ(zᵢ))]``

    with the small-sample correction ``A*² = A²(1 + 4/n − 25/n²)``.
    One window (per-cluster sort) + one aggregation; no driver data.
    ``ad_stat`` is NULL for degenerate clusters (n < 8 or zero
    projection variance) — callers treat those as "do not split".
    """
    v = np.asarray(c1, dtype=float) - np.asarray(c2, dtype=float)
    nrm = float(v @ v)
    if nrm <= 0:
        raise ValueError("ad_split_statistic: identical child centers")
    feats = F.col(features_col).cast("array<double>")
    proj = F.aggregate(
        F.zip_with(feats, F.array(*[F.lit(float(x)) for x in v]),
                   lambda a, b: a * b),
        F.lit(0.0), lambda acc, x: acc + x,
    ) / F.lit(nrm)
    key = F.col(cluster_col) if cluster_col else F.lit(0)
    staged = df.select(key.alias("_gc"), proj.alias("_p"))
    wc = Window.partitionBy("_gc")
    wo = wc.orderBy("_p")
    z = (F.col("_p") - F.avg("_p").over(wc)) / F.stddev_samp("_p").over(wc)
    ranked = staged.select(
        "_gc",
        F.count(F.lit(1)).over(wc).alias("_n"),
        F.row_number().over(wo).alias("_i"),
        z.alias("_z"),
    )
    term = (
        (2 * F.col("_i") - 1) * F.log(_clamp01(_phi(F.col("_z"))))
        + (2 * (F.col("_n") - F.col("_i")) + 1)
        * F.log(_clamp01(F.lit(1.0) - _phi(F.col("_z"))))
    )
    out = (
        ranked.groupBy("_gc")
        .agg(F.max("_n").alias("n"), F.sum(term).alias("_s"))
        .withColumn(
            "_a2",
            -F.col("n") - F.col("_s") / F.col("n"),
        )
        .withColumn(
            "ad_stat",
            F.when(
                F.col("n") >= 8,
                F.col("_a2") * (F.lit(1.0) + F.lit(4.0) / F.col("n")
                                - F.lit(25.0) / (F.col("n") * F.col("n"))),
            ),
        )
        .select(
            F.col("_gc").alias(cluster_col or "cluster"),
            F.col("n").cast("bigint").alias("n"),
            "ad_stat",
        )
    )
    return out


class GMeans:
    """Grow k from 1 by AD-tested splits (squared-Euclidean only —
    the normality hypothesis is a Euclidean statement).

    Per round: every active cluster gets a deterministic
    ``meanspread``-seeded 2-means refit (engine fit, k=2), its points'
    AD statistic along the child axis is computed distributively, and
    clusters with ``A*² > critical`` keep their split while the rest
    freeze. Stops when nothing splits or ``k_max`` is reached. With
    ``sample_cap`` the test (not the refit) runs on a deterministic
    hash sample per cluster."""

    _algorithm = "GMeans"

    def __init__(
        self,
        k_max: int = 16,
        critical: float = AD_CRITICAL_0001,
        max_iter: int = 10,
        tol: float = 1e-4,
        seed: int = 0,
        sample_cap: int = 100_000,
        features_col: str = "features",
        prediction_col: str = "prediction",
        distance_col: str | None = None,
    ):
        if k_max < 1:
            raise ValueError("k_max must be >= 1")
        self.k_max = k_max
        self.critical = float(critical)
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.sample_cap = int(sample_cap)
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.distance_col = distance_col

    def fit(self, df: DataFrame) -> GeneralizedKMeansModel:
        kernel = get_kernel("squaredEuclidean")
        df = _ensure_array_features(df, self.features_col)
        work = df.select(self.features_col).withColumn(
            "_gk", F.lit(0)).cache()
        n_total = work.count()
        d = len(work.select(self.features_col).first()[0])
        feats = F.col(self.features_col)
        row = work.agg(*[
            F.avg(F.element_at(feats, i + 1)).alias(f"m{i}")
            for i in range(d)
        ]).collect()[0]
        centers: dict[int, np.ndarray] = {
            0: np.array([float(row[f"m{i}"]) for i in range(d)])}
        active = {0}
        history: list[int] = [1]
        while active and len(centers) < self.k_max:
            frozen_now: set[int] = set()
            split_now: dict[int, tuple] = {}
            for cid in sorted(active):
                sub = work.where(F.col("_gk") == cid)
                stats = sub.agg(
                    F.count(F.lit(1)).alias("n"),
                    *[F.avg(F.element_at(feats, i + 1)).alias(f"m{i}")
                      for i in range(d)],
                    *[F.stddev_pop(F.element_at(feats, i + 1))
                      .alias(f"s{i}") for i in range(d)],
                ).collect()[0]
                n = int(stats["n"])
                if n < 8:
                    frozen_now.add(cid)
                    continue
                mu = np.array([float(stats[f"m{i}"]) for i in range(d)])
                sd = np.array([float(stats[f"s{i}"] or 0.0)
                               for i in range(d)])
                if not sd.any():
                    frozen_now.add(cid)  # zero-variance cluster
                    continue
                sub_model = GeneralizedKMeans(
                    k=2, divergence="squaredEuclidean",
                    max_iter=self.max_iter, tol=self.tol,
                    seed=self.seed + 31 * cid,
                    features_col=self.features_col,
                    empty_cluster_strategy="drop",
                    initial_centers=[mu - 0.5 * sd, mu + 0.5 * sd],
                ).fit(sub)
                if sub_model.k < 2:
                    frozen_now.add(cid)
                    continue
                c0, c1 = sub_model.centers[0], sub_model.centers[1]
                tested = sub
                if n > self.sample_cap:
                    keep = int(1_000_000 * self.sample_cap / n) + 1
                    tested = sub.withColumn(
                        "_h", F.pmod(F.xxhash64(
                            feats.cast("string"),
                            F.lit(self.seed + cid)), F.lit(1_000_000)),
                    ).where(F.col("_h") < keep).drop("_h")
                ad = ad_split_statistic(
                    tested, c0, c1, features_col=self.features_col
                ).collect()[0]["ad_stat"]
                if ad is not None and float(ad) > self.critical:
                    split_now[cid] = (c0, c1)
                else:
                    frozen_now.add(cid)
            active -= frozen_now
            if not split_now:
                break
            for cid, (c0, c1) in split_now.items():
                if len(centers) >= self.k_max:
                    active.discard(cid)
                    continue
                new_id = max(centers) + 1
                pair = [c0.tolist(), c1.tolist()]
                dists = distances_column(kernel, feats, pair)
                child = F.when(
                    F.element_at(dists, 1) <= F.element_at(dists, 2),
                    F.lit(cid)).otherwise(F.lit(new_id))
                work = work.withColumn(
                    "_gk",
                    F.when(F.col("_gk") == cid, child)
                    .otherwise(F.col("_gk")))
                centers[cid] = c0
                centers[new_id] = c1
                active.add(new_id)
            work = work.localCheckpoint(eager=True)
            history.append(len(centers))
        ordered = [centers[cid] for cid in sorted(centers)]
        work.unpersist()
        model = GeneralizedKMeansModel(
            centers=np.asarray(ordered), kernel_name="squaredEuclidean",
            features_col=self.features_col,
            prediction_col=self.prediction_col,
            distance_col=self.distance_col,
            params={"algorithm": "GMeans", "k_max": self.k_max,
                    "critical": self.critical, "seed": self.seed,
                    "k_history": history},
        )
        return model
