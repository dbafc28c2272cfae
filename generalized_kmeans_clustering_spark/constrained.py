"""ConstrainedKMeans: must-link / cannot-link semi-supervised Lloyd's.

Re-expression of ``ConstrainedKMeans.scala:157-270`` +
``df/Constraints.scala:27-260``: must-link components are closed
transitively with union-find on the driver (constraint pairs are tiny
relative to data); then

- ``soft`` mode (distributed): the argmin distance of a CONSTRAINED
  point is penalized by ``constraint_weight`` for every must-link
  partner previously assigned elsewhere and every cannot-link partner
  previously assigned to the same cluster. Partner assignments come
  from the previous iteration, broadcast-joined onto the (few)
  constrained rows — unconstrained rows take the plain expression path
  untouched.
- ``hard`` mode (driver ceiling, like the reference): sequential greedy
  assignment over collected points honoring constraints strictly.

Union-find: ``Constraints.scala``'s ``ConstraintSet`` with path
compression, reimplemented in plain Python.
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

__all__ = ["ConstrainedKMeans", "ConstraintSet"]

log = logging.getLogger(__name__)

_HARD_MODE_WARN_ROWS = 1_000_000


class ConstraintSet:
    """Must-link union-find + cannot-link pair set with validation."""

    def __init__(self, must_link=(), cannot_link=()):
        self.parent: dict = {}
        self.must_link = [tuple(p) for p in must_link]
        self.cannot_link = {frozenset(p) for p in cannot_link}
        for a, b in self.must_link:
            self._union(a, b)
        # a cannot-link inside one must-link component is unsatisfiable
        for pair in self.cannot_link:
            a, b = tuple(pair)
            if self.find(a) == self.find(b):
                raise ValueError(
                    f"contradictory constraints: {a} and {b} are must-linked "
                    "and cannot-linked"
                )

    def find(self, x):
        root = x
        while self.parent.get(root, root) != root:
            root = self.parent[root]
        while self.parent.get(x, x) != x:  # path compression
            self.parent[x], x = root, self.parent[x]
        return root

    def _union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.parent[ra] = rb

    def constrained_ids(self):
        ids = set(self.parent)
        for pair in self.cannot_link:
            ids |= set(pair)
        for a, b in self.must_link:
            ids.add(a)
            ids.add(b)
        return ids


class ConstrainedKMeans:
    _algorithm = "ConstrainedKMeans"

    def __init__(
        self,
        k: int = 2,
        divergence: str = "squaredEuclidean",
        must_link_pairs=(),
        cannot_link_pairs=(),
        constraint_mode: str = "soft",  # soft | hard
        constraint_weight: float = 1.0,
        id_col: str = "id",
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
        if constraint_mode not in ("soft", "hard"):
            raise ValueError("constraint_mode: soft | hard")
        self.k = k
        self.divergence = divergence
        self.constraints = ConstraintSet(must_link_pairs, cannot_link_pairs)
        self.constraint_mode = constraint_mode
        self.constraint_weight = float(constraint_weight)
        self.id_col = id_col
        self.max_iter = max_iter
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
        work = df.select(self.id_col, self.features_col)
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
            if self.constraint_mode == "hard":
                return self._fit_hard(work, kernel, centers, t0)
            return self._fit_soft(work, kernel, centers, t0)
        finally:
            if cache_here:
                work.unpersist()

    # ---------------------------------------------------------------- soft
    def _fit_soft(self, work, kernel, centers, t0) -> GeneralizedKMeansModel:
        """Distributed argmin for the unconstrained mass + a driver-side
        sequential resolve over the (few) constrained points.

        Exactly equivalent to the reference's incremental soft pass
        (``ConstrainedKMeans.scala:286-322``): penalty terms only ever
        reference constrained partners, and unconstrained points are
        order-independent pure argmins — so restricting the sequential
        sweep to constrained rows changes nothing.
        """
        from time import time

        k, d = centers.shape
        cs = self.constraints
        cids = cs.constrained_ids()
        spark = work.sparkSession
        dist_hist: list[float] = []
        move_hist: list[float] = []
        sizes: list[int] = []
        converged = False
        iterations = 0

        ml_partners: dict = {}
        for a, b in cs.must_link:
            ml_partners.setdefault(a, set()).add(b)
            ml_partners.setdefault(b, set()).add(a)
        cl_partners: dict = {}
        for pair in cs.cannot_link:
            a, b = tuple(pair)
            cl_partners.setdefault(a, set()).add(b)
            cl_partners.setdefault(b, set()).add(a)

        for it in range(self.max_iter):
            base = distances_column(
                kernel, F.col(self.features_col), centers.tolist()
            )
            staged = work.withColumn("_ds", base)
            staged = staged.withColumn(
                "_cluster",
                (F.expr("array_position(_ds, array_min(_ds))") - 1).cast("int"),
            )
            if cids:
                crows = staged.where(
                    F.col(self.id_col).isin([*cids])
                ).select(self.id_col, "_ds").collect()
                dvec = {r[self.id_col]: np.asarray(r["_ds"]) for r in crows}
                # sequential sweep, most-confident first (stable order)
                order = sorted(
                    dvec, key=lambda i: (float(dvec[i].min()), str(i))
                )
                resolved: dict = {}
                for i in order:
                    pen = np.zeros(k)
                    for p in ml_partners.get(i, ()):
                        if p in resolved:
                            pen += self.constraint_weight
                            pen[resolved[p]] -= self.constraint_weight
                    for p in cl_partners.get(i, ()):
                        if p in resolved:
                            pen[resolved[p]] += self.constraint_weight
                    resolved[i] = int(np.argmin(dvec[i] + pen))
                ov_df = spark.createDataFrame(
                    [(i, c) for i, c in resolved.items()],
                    f"{self.id_col} long, _ov int",
                )
                staged = staged.join(F.broadcast(ov_df), self.id_col, "left")
                staged = staged.withColumn(
                    "_cluster", F.coalesce(F.col("_ov"), F.col("_cluster"))
                ).drop("_ov")
            staged = staged.withColumn(
                "_dist", F.element_at("_ds", F.col("_cluster") + 1)
            ).drop("_ds")

            stats = cluster_stats(staged, kernel, d, self.features_col, None)
            new_centers, cost, sizes, empty = centers_from_stats(
                stats, kernel, k, centers
            )
            mv = float(np.sqrt(((centers - new_centers) ** 2).sum(axis=1)).max())
            centers = new_centers
            dist_hist.append(float(cost))
            move_hist.append(mv)
            iterations = it + 1
            if mv <= self.tol and it > 0:
                converged = True
                break

        summary = TrainingSummary(
            algorithm=self._algorithm, k=k, dim=d, divergence=kernel.name,
            iterations=iterations, converged=converged,
            distortion_history=dist_hist, movement_history=move_hist,
            cluster_sizes=sizes, elapsed_sec=time() - t0,
        )
        return GeneralizedKMeansModel(
            centers=centers, kernel_name=kernel.name, smoothing=self.smoothing,
            features_col=self.features_col, prediction_col=self.prediction_col,
            distance_col=self.distance_col, summary=summary,
            params={"k": self.k, "constraintMode": "soft",
                    "constraintWeight": self.constraint_weight,
                    "numMustLink": len(self.constraints.must_link),
                    "numCannotLink": len(self.constraints.cannot_link),
                    "seed": self.seed},
        )

    # ---------------------------------------------------------------- hard
    def _fit_hard(self, work, kernel, centers, t0) -> GeneralizedKMeansModel:
        """Strict sequential assignment on collected points (reference
        driver-side path, ``ConstrainedKMeans.scala:157-270``)."""
        from time import time

        rows = work.collect()
        if len(rows) > _HARD_MODE_WARN_ROWS:
            log.warning(
                "ConstrainedKMeans hard mode collects %d rows; "
                "use constraint_mode='soft' at scale", len(rows),
            )
        ids = [r[self.id_col] for r in rows]
        X = np.asarray([r[self.features_col] for r in rows], dtype=np.float64)
        cs = self.constraints
        k, d = centers.shape
        comp_of = {i: cs.find(i) for i in ids}
        labels = np.full(len(X), -1, dtype=int)

        for _ in range(self.max_iter):
            D = kernel.div_np(X, centers)
            labels[:] = -1
            comp_cluster: dict = {}
            cl_by_id: dict = {}
            for idx in np.argsort(D.min(axis=1)):
                i = ids[idx]
                comp = comp_of[i]
                forbidden = set()
                for pair in cs.cannot_link:
                    a, b = tuple(pair)
                    other = b if a == i else (a if b == i else None)
                    if other is not None and other in cl_by_id:
                        forbidden.add(cl_by_id[other])
                if comp in comp_cluster and comp_cluster[comp] not in forbidden:
                    labels[idx] = comp_cluster[comp]
                else:
                    for j in np.argsort(D[idx]):
                        if j not in forbidden:
                            labels[idx] = int(j)
                            break
                    if labels[idx] < 0:
                        labels[idx] = int(np.argmin(D[idx]))
                    comp_cluster[comp] = labels[idx]
                cl_by_id[i] = labels[idx]
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
            params={"k": self.k, "constraintMode": "hard", "seed": self.seed},
        )
