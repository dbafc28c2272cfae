"""SparseKMeans: k-means on sparse vectors without densifying.

Re-expression of ``SparseKMeans.scala:137-230`` +
``kernels/SparseBregmanKernel.scala:46-356``. The reference walks
SparseVector non-zeros in JVM UDFs; this build keeps the whole sparse
path in Catalyst expressions over an explicit COO row layout
(``indices array<int>``, ``values array<double>``, dim) — Spark SQL
arrays are dense, so the sparse layout is its own schema rather than a
VectorUDT black box (SURVEY §2.1 sparse row):

- assignment (SE): D(x,μ) = ½(‖x‖² − 2·x·μ + ‖μ‖²) where the sparse
  dot x·μ = Σᵢ valuesᵢ·μ[indicesᵢ] is a ``zip_with`` +
  ``element_at`` fold against the center literal — work is O(nnz·k)
  per row, never O(d·k), with no Python;
- spherical: rows L2-normalized once (expression), then the same dot;
- update: ``posexplode(indices, values)`` → ``groupBy(cluster, dim)``
  sums — the shuffle carries only non-zero (cluster, dim) cells, so
  driver traffic is k × (distinct non-zero dims), not k × d.

Sparsity estimation from a ≤1000-row sample picks dense vs sparse
automatically (``sparse_mode='auto'``); KL/IS/etc. fall back to the
dense engine (their smoothing term makes zeros non-zero anyway).
"""

from __future__ import annotations

import logging

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import get_kernel
from .kmeans import GeneralizedKMeans, GeneralizedKMeansModel
from .summary import TrainingSummary

__all__ = ["SparseKMeans", "sparse_se_distances", "densify"]

log = logging.getLogger(__name__)


def sparse_se_distances(indices, values, centers: np.ndarray):
    """array<double> of ½‖x−μ_j‖² for sparse x against dense centers."""
    x2 = F.aggregate(values, F.lit(0.0), lambda a, v: a + v * v)
    c2 = [float((c * c).sum()) for c in centers]
    dists = []
    for j, c in enumerate(centers):
        clit = F.array(*[F.lit(float(v)) for v in c])
        dot = F.aggregate(
            F.zip_with(indices, values,
                       lambda i, v: v * F.element_at(clit, i + 1)),
            F.lit(0.0), lambda a, v: a + v,
        )
        dists.append(0.5 * (x2 - 2.0 * dot + F.lit(c2[j])))
    return F.array(*dists)


def densify(df: DataFrame, indices_col: str, values_col: str, dim: int,
            out_col: str = "features") -> DataFrame:
    """COO row → dense array<double> (for the dense fallback path)."""
    zero = F.array_repeat(F.lit(0.0), dim)
    # scatter: for each position p in 0..d-1, sum values where index==p
    # (expression-only; cost O(d·nnz) per row — only used at small d)
    dense = F.transform(
        zero,
        lambda _, p: F.coalesce(
            F.aggregate(
                F.zip_with(
                    F.col(indices_col), F.col(values_col),
                    lambda i, v: F.when(i == p, v).otherwise(0.0),
                ),
                F.lit(0.0), lambda a, v: a + v,
            ),
            F.lit(0.0),
        ),
    )
    return df.withColumn(out_col, dense)


class SparseKMeans:
    """Auto dense/sparse k-means over COO rows (indices, values)."""

    _algorithm = "SparseKMeans"

    def __init__(
        self,
        k: int = 2,
        dim: int | None = None,
        divergence: str = "squaredEuclidean",
        sparse_mode: str = "auto",  # auto | force | dense
        sparse_threshold: float = 0.3,
        max_iter: int = 20,
        tol: float = 1e-4,
        seed: int = 0,
        indices_col: str = "indices",
        values_col: str = "values",
        prediction_col: str = "prediction",
    ):
        if sparse_mode not in ("auto", "force", "dense"):
            raise ValueError("sparse_mode: auto | force | dense")
        kern_key = divergence.lower().replace("-", "").replace("_", "")
        if sparse_mode == "force" and kern_key not in (
            "squaredeuclidean", "se", "euclidean", "l2", "spherical", "cosine",
        ):
            raise ValueError(
                f"divergence '{divergence}' has no sparse path; "
                "use squaredEuclidean or spherical"
            )
        self.k = k
        self.dim = dim
        self.divergence = divergence
        self.sparse_mode = sparse_mode
        self.sparse_threshold = sparse_threshold
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.indices_col = indices_col
        self.values_col = values_col
        self.prediction_col = prediction_col

    def _estimate_sparsity(self, df: DataFrame, dim: int) -> float:
        """Mean nnz/d over a ≤1000-row sample
        (``SparseKMeans.scala:141-148``)."""
        row = (
            df.select(F.size(self.values_col).alias("nnz")).limit(1000)
            .agg(F.avg("nnz").alias("m")).collect()[0]
        )
        return float(row["m"] or 0.0) / max(dim, 1)


    def fit(self, df: DataFrame) -> GeneralizedKMeansModel:
        from time import time

        t0 = time()
        dim = self.dim
        if dim is None:
            dim = int(
                df.select(F.max(F.array_max(self.indices_col)).alias("m"))
                .collect()[0]["m"]
            ) + 1
        density = self._estimate_sparsity(df, dim)
        kern_key = self.divergence.lower().replace("-", "").replace("_", "")
        sparse_capable = kern_key in (
            "squaredeuclidean", "se", "euclidean", "l2", "spherical", "cosine",
        )
        use_sparse = (
            self.sparse_mode == "force"
            or (
                self.sparse_mode == "auto"
                and sparse_capable
                and density <= self.sparse_threshold
            )
        )
        if not use_sparse:
            if self.sparse_mode == "force" and not sparse_capable:
                raise ValueError(
                    f"divergence '{self.divergence}' has no sparse path; "
                    "use squaredEuclidean or spherical"
                )
            log.info("SparseKMeans: dense fallback (density=%.3f)", density)
            dense = densify(df, self.indices_col, self.values_col, dim)
            model = GeneralizedKMeans(
                k=self.k, divergence=self.divergence, max_iter=self.max_iter,
                tol=self.tol, seed=self.seed, features_col="features",
                prediction_col=self.prediction_col,
            ).fit(dense)
            model.summary.algorithm = self._algorithm
            model.params.update({"sparseMode": "dense", "density": density})
            return model

        spherical = kern_key in ("spherical", "cosine")
        work = df.select(self.indices_col, self.values_col)
        if spherical:
            norm = F.sqrt(
                F.aggregate(F.col(self.values_col), F.lit(0.0),
                            lambda a, v: a + v * v)
            ) + 1e-10
            work = work.withColumn(
                self.values_col,
                F.transform(F.col(self.values_col), lambda v: v / norm),
            )
        cache_here = work.storageLevel.useMemory is False
        if cache_here:
            work = work.cache()
        try:
            # init: hash-stable distinct sample rows, densified on driver
            # (distinct first — identical rows share a hash, so ordering
            # alone would fill the limit with copies of one row)
            rows = (
                work.distinct()
                .withColumn(
                    "_h",
                    F.xxhash64(F.col(self.indices_col),
                               F.col(self.values_col), F.lit(self.seed)),
                ).orderBy("_h").limit(self.k * 3).collect()
            )
            centers = np.zeros((self.k, dim))
            seen = 0
            used = set()
            for r in rows:
                key = (tuple(r[self.indices_col]), tuple(r[self.values_col]))
                if key in used:
                    continue
                used.add(key)
                for i, v in zip(r[self.indices_col], r[self.values_col]):
                    centers[seen, int(i)] = float(v)
                seen += 1
                if seen == self.k:
                    break
            if seen < self.k:
                raise ValueError(f"k={self.k} but only {seen} distinct rows")

            dist_hist: list[float] = []
            move_hist: list[float] = []
            sizes = [0] * self.k
            converged = False
            iterations = 0
            for it in range(self.max_iter):
                dists = sparse_se_distances(
                    F.col(self.indices_col), F.col(self.values_col), centers
                )
                assigned = work.withColumn("_ds", dists)
                assigned = assigned.withColumn(
                    "_cluster",
                    (F.expr("array_position(_ds, array_min(_ds))") - 1)
                    .cast("int"),
                ).withColumn("_dist", F.array_min("_ds")).drop("_ds")
                # one small agg for counts+cost, one exploded agg for sums
                crow = assigned.groupBy("_cluster").agg(
                    F.count(F.lit(1)).alias("n"), F.sum("_dist").alias("cost")
                ).collect()
                cells = (
                    assigned.select(
                        "_cluster",
                        F.explode(
                            F.arrays_zip(
                                F.col(self.indices_col).alias("i"),
                                F.col(self.values_col).alias("v"),
                            )
                        ).alias("cell"),
                    )
                    .groupBy("_cluster", F.col("cell.i").alias("dim"))
                    .agg(F.sum("cell.v").alias("s"))
                    .collect()
                )
                counts = {int(r["_cluster"]): int(r["n"]) for r in crow}
                cost = sum(float(r["cost"] or 0.0) for r in crow)
                new_centers = np.zeros_like(centers)
                for r in cells:
                    c = int(r["_cluster"])
                    if counts.get(c, 0) > 0:
                        new_centers[c, int(r["dim"])] = (
                            float(r["s"]) / counts[c]
                        )
                for c in range(self.k):
                    if counts.get(c, 0) == 0:
                        new_centers[c] = centers[c]  # keep empty
                    elif spherical:
                        n = np.linalg.norm(new_centers[c])
                        if n > 0:
                            new_centers[c] = new_centers[c] / n
                sizes = [counts.get(c, 0) for c in range(self.k)]
                mv = float(
                    np.sqrt(((centers - new_centers) ** 2).sum(axis=1)).max()
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
            algorithm=self._algorithm, k=self.k, dim=dim,
            divergence="spherical" if spherical else "squaredEuclidean",
            iterations=iterations, converged=converged,
            distortion_history=dist_hist, movement_history=move_hist,
            cluster_sizes=sizes, elapsed_sec=time() - t0,
        )
        model = SparseKMeansModel(
            centers=centers,
            kernel_name="spherical" if spherical else "squaredEuclidean",
            indices_col=self.indices_col, values_col=self.values_col,
            prediction_col=self.prediction_col, summary=summary,
            params={"k": self.k, "sparseMode": "sparse", "density": density,
                    "dim": dim, "seed": self.seed},
        )
        return model


class SparseKMeansModel(GeneralizedKMeansModel):
    """Sparse transform: expression argmin over COO rows."""

    def __init__(self, centers, kernel_name, indices_col="indices",
                 values_col="values", prediction_col="prediction",
                 summary=None, params=None):
        super().__init__(
            centers, kernel_name, prediction_col=prediction_col,
            summary=summary, params=params,
        )
        self.indices_col = indices_col
        self.values_col = values_col

    def _extra_metadata(self) -> dict:
        return {"indicesCol": self.indices_col, "valuesCol": self.values_col}

    @classmethod
    def _construct_loaded(cls, centers, weights, meta):
        ex = meta.get("extra", {})
        return cls(
            centers=centers, kernel_name=meta["divergence"],
            indices_col=ex.get("indicesCol", "indices"),
            values_col=ex.get("valuesCol", "values"),
            prediction_col=meta.get("predictionCol", "prediction"),
            params=meta.get("paramMap", {}),
        )

    def transform(self, df: DataFrame) -> DataFrame:
        vals = F.col(self.values_col)
        if self.kernel_name == "spherical":
            norm = F.sqrt(
                F.aggregate(vals, F.lit(0.0), lambda a, v: a + v * v)
            ) + 1e-10
            vals = F.transform(vals, lambda v: v / norm)
        dists = sparse_se_distances(F.col(self.indices_col), vals, self.centers)
        out = df.withColumn("_ds", dists)
        return out.withColumn(
            self.prediction_col,
            (F.expr("array_position(_ds, array_min(_ds))") - 1).cast("int"),
        ).drop("_ds")
