"""BisectingKMeans: top-down hierarchical splitting.

Re-expression of ``BisectingKMeans.scala:136-300``: start with one
cluster; repeatedly run a k=2 Lloyd fit on the (filtered) largest
divisible cluster and reassign ONLY the touched rows with a
conditional column rewrite — no global reshuffle per split
(``README.md:519-526``).

Spark shape: the cluster id lives in a persisted column. Each split is
(filter → small k=2 fit → conditional ``when()`` rewrite of the id
column). We ``localCheckpoint`` the working frame every few splits so
the accumulated ``when`` lineage stays constant-depth — at 100 TB the
rewrite is map-only and the only aggregations are per-split
``groupBy(cluster).count()`` with k result rows.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import get_kernel
from .kmeans import GeneralizedKMeans, GeneralizedKMeansModel, \
    _ensure_array_features, _validate_domain
from .operators.assignment import distances_column
from .summary import TrainingSummary

__all__ = ["BisectingKMeans"]

_CHECKPOINT_EVERY = 4  # splits between lineage truncations


class BisectingKMeans:
    """Bisecting k-means over any supported Bregman divergence."""

    _algorithm = "BisectingKMeans"

    def __init__(
        self,
        k: int = 4,
        divergence: str = "squaredEuclidean",
        max_iter: int = 20,
        min_divisible_cluster_size: float = 1.0,
        tol: float = 1e-4,
        seed: int = 0,
        smoothing: float = 1e-10,
        features_col: str = "features",
        prediction_col: str = "prediction",
        distance_col: str | None = None,
        sub_init: str = "k-means||",
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        if sub_init not in ("k-means||", "random", "meanspread"):
            raise ValueError("sub_init: k-means|| | random | meanspread")
        self.k = k
        self.divergence = divergence
        self.max_iter = max_iter
        # >=1 → absolute minimum size; <1 → fraction of total rows
        self.min_divisible_cluster_size = min_divisible_cluster_size
        self.tol = tol
        self.seed = seed
        self.smoothing = smoothing
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.distance_col = distance_col
        # child-center initialization for each k=2 sub-fit: the seeded
        # engine init (default), or the fully deterministic
        # 'meanspread' (cluster mean ± ½·per-dim std — one aggregate,
        # no sampling; SQL-expressible, used by the oracle entry query)
        self.sub_init = sub_init

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

        work = df.select(self.features_col).withColumn("_bk", F.lit(0)).cache()
        n_total = work.count()
        min_size = (
            self.min_divisible_cluster_size
            if self.min_divisible_cluster_size >= 1
            else self.min_divisible_cluster_size * n_total
        )
        min_size = max(min_size, 2.0)

        # cluster 0 center = Bregman centroid of everything
        d = len(work.select(self.features_col).first()[0])
        grad = kernel.grad(F.col(self.features_col))
        row = work.agg(
            *[F.sum(F.element_at(grad, i + 1)).alias(f"g{i}") for i in range(d)]
        ).collect()[0]
        centers: dict[int, np.ndarray] = {
            0: kernel.finalize_center(
                np.array([float(row[f"g{i}"]) for i in range(d)]) / max(n_total, 1)
            )
        }
        from .events import (IterationTracker, SummarySink,
                             TrainingCompleted, WarningEvent)

        sink = SummarySink()
        sizes: dict[int, int] = {0: n_total}
        not_divisible: set[int] = set()
        splits = 0

        while len(centers) < self.k:
            candidates = [
                (cid, sz) for cid, sz in sizes.items()
                if sz >= min_size and cid not in not_divisible
            ]
            if not candidates:
                break
            cid = max(candidates, key=lambda t: (t[1], -t[0]))[0]
            # one "iteration" of the bisecting log = one split attempt
            tracker = IterationTracker(sink, splits)
            sub = work.where(F.col("_bk") == cid)
            sub_kw: dict = {"init_mode": "random"} if self.sub_init == "random" else {}
            if self.sub_init == "meanspread":
                # deterministic child seeds: cluster mean ± ½·per-dim
                # population std — one k-row aggregate, no sampling.
                feats = F.col(self.features_col)
                stats = sub.agg(
                    *[F.avg(F.element_at(feats, i + 1)).alias(f"m{i}") for i in range(d)],
                    *[F.stddev_pop(F.element_at(feats, i + 1)).alias(f"s{i}")
                      for i in range(d)],
                ).collect()[0]
                mu = np.array([float(stats[f"m{i}"]) for i in range(d)])
                sd = np.array([float(stats[f"s{i}"] or 0.0) for i in range(d)])
                sub_kw = {"initial_centers": [mu - 0.5 * sd, mu + 0.5 * sd]}
            sub_model = GeneralizedKMeans(
                k=2, divergence=self.divergence, max_iter=self.max_iter,
                tol=self.tol, seed=self.seed + 31 * cid,
                smoothing=self.smoothing, features_col=self.features_col,
                empty_cluster_strategy="drop", **sub_kw,
            ).fit(sub)
            if sub_model.k < 2:
                not_divisible.add(cid)
                sink.record(WarningEvent(
                    iteration=splits,
                    message=f"cluster {cid} not divisible (sub-fit "
                            "collapsed to one center)", severity="low"))
                continue
            c0, c1 = sub_model.centers[0], sub_model.centers[1]
            new_id = max(centers) + 1
            # conditional rewrite: touched rows re-pick between the two children
            pair = [c0.tolist(), c1.tolist()]
            dists = distances_column(kernel, F.col(self.features_col), pair)
            child = F.when(
                F.element_at(dists, 1) <= F.element_at(dists, 2), F.lit(cid)
            ).otherwise(F.lit(new_id))
            work = work.withColumn(
                "_bk",
                F.when(F.col("_bk") == cid, child).otherwise(F.col("_bk")),
            )
            splits += 1
            if splits % _CHECKPOINT_EVERY == 0:
                work = work.localCheckpoint(eager=True)
            counts = {
                int(r["_bk"]): int(r["n"])
                for r in work.groupBy("_bk").agg(F.count(F.lit(1)).alias("n")).collect()
            }
            n0, n1 = counts.get(cid, 0), counts.get(new_id, 0)
            if n0 == 0 or n1 == 0:
                # degenerate split: undo and mark not divisible
                work = work.withColumn(
                    "_bk",
                    F.when(F.col("_bk") == new_id, F.lit(cid)).otherwise(F.col("_bk")),
                )
                not_divisible.add(cid)
                sink.record(WarningEvent(
                    iteration=splits - 1,
                    message=f"degenerate split of cluster {cid} undone "
                            "(one empty child)", severity="low"))
                continue
            centers[cid] = c0
            centers[new_id] = c1
            sizes = counts
            tracker.complete(
                cost=float(sub_model.summary.final_distortion),
                center_movement=float("nan"))

        # compact ids to 0..k-1 in insertion order
        order = sorted(centers)
        final = np.asarray([centers[c] for c in order], dtype=np.float64)
        final_sizes = [int(sizes.get(c, 0)) for c in order]
        work.unpersist()

        sink.record(TrainingCompleted(
            total_iterations=splits, final_cost=float("nan"),
            total_duration=int((time() - t0) * 1000)))
        summary = TrainingSummary(
            algorithm=self._algorithm, k=len(final), dim=final.shape[1],
            divergence=kernel.name, iterations=splits, converged=True,
            distortion_history=[], movement_history=[],
            cluster_sizes=final_sizes, elapsed_sec=time() - t0,
            events=sink.get_events(),
        )
        return GeneralizedKMeansModel(
            centers=final, kernel_name=kernel.name, smoothing=self.smoothing,
            features_col=self.features_col, prediction_col=self.prediction_col,
            distance_col=self.distance_col, summary=summary,
            params={"k": self.k, "divergence": self.divergence,
                    "maxIter": self.max_iter,
                    "minDivisibleClusterSize": self.min_divisible_cluster_size,
                    "seed": self.seed},
        )
