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
- KL (additive smoothing, same formula as the dense kernel): the
  zero-entry contribution ε(ln ε − ln(μᵢ+ε)) depends only on the
  center, so it collapses into a per-center constant; the fold walks
  non-zeros only and corrects each touched dimension. Update =
  inv_grad of the mean gradient with the implicit-zero gradient
  (ln ε + 1) weighted in analytically;
- L1: per-center constant Σ|μ| + O(nnz) correction fold; update =
  exact zero-aware per-(cluster, dim) lower median (implicit zeros
  ranked between negative and positive cells);
- update (SE/spherical): ``posexplode(indices, values)`` →
  ``groupBy(cluster, dim)`` sums — the shuffle carries only non-zero
  (cluster, dim) cells, so driver traffic is k × (distinct non-zero
  dims), not k × d.

Sparsity estimation from a ≤1000-row sample picks dense vs sparse
automatically (``sparse_mode='auto'``); divergences without a sparse
path (IS, generalized-I, logistic) fall back to the dense engine.
"""

from __future__ import annotations

import logging

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.kernels import get_kernel
from .kmeans import GeneralizedKMeans, GeneralizedKMeansModel
from .summary import TrainingSummary

__all__ = ["SparseKMeans", "sparse_se_distances", "sparse_kl_distances",
           "sparse_l1_distances", "densify"]

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


def sparse_kl_distances(indices, values, centers: np.ndarray,
                        eps: float = 1e-10):
    """array<double> of D_KL(x, μ_j) = Σᵢ (xᵢ+ε)(ln(xᵢ+ε) − ln(μᵢ+ε))
    for sparse x — identical arithmetic to the dense
    ``KLDivergenceKernel`` (additive smoothing), but O(nnz) per row:

    zero entries contribute ε·(ln ε − ln(μᵢ+ε)), which depends only on
    the center — folded into a per-center constant K_j (computed
    driver-side from the k×d centers, never touching data); the
    expression fold over non-zeros then *corrects* each touched
    dimension from its zero-contribution to its true value. Mirrors the
    index-walk of ``kernels/SparseBregmanKernel.scala:124-205`` with
    this engine's smoothing convention.
    """
    lne = float(np.log(eps))
    dists = []
    for c in centers:
        lnq = np.log(np.asarray(c, dtype=np.float64) + eps)
        kj = float((eps * (lne - lnq)).sum())
        lnq_lit = F.array(*[F.lit(float(v)) for v in lnq])
        fold = F.aggregate(
            F.zip_with(
                indices, values,
                lambda i, v: (v + eps)
                * (F.log(v + eps) - F.element_at(lnq_lit, i + 1))
                - eps * (F.lit(lne) - F.element_at(lnq_lit, i + 1)),
            ),
            F.lit(0.0), lambda a, t: a + t,
        )
        dists.append(F.lit(kj) + fold)
    return F.array(*dists)


def sparse_l1_distances(indices, values, centers: np.ndarray):
    """array<double> of Σᵢ|xᵢ−μᵢ| for sparse x: per-center constant
    C_j = Σ|μ_j| plus an O(nnz) fold of (|xᵢ−μᵢ| − |μᵢ|) — the
    merge-walk of ``kernels/SparseBregmanKernel.scala:216-265``
    expressed against dense center literals."""
    dists = []
    for c in centers:
        cj = float(np.abs(np.asarray(c, dtype=np.float64)).sum())
        clit = F.array(*[F.lit(float(v)) for v in c])
        fold = F.aggregate(
            F.zip_with(
                indices, values,
                lambda i, v: F.abs(v - F.element_at(clit, i + 1))
                - F.abs(F.element_at(clit, i + 1)),
            ),
            F.lit(0.0), lambda a, t: a + t,
        )
        dists.append(F.lit(cj) + fold)
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


_SPARSE_CAPABLE = (
    "squaredeuclidean", "se", "euclidean", "l2", "spherical", "cosine",
    "kl", "kullbackleibler", "relativeentropy", "l1", "manhattan",
)


class SparseKMeans:
    """Auto dense/sparse k-means over COO rows (indices, values).

    Sparse index-walk paths (never densify): SE, spherical, KL
    (additive-smoothing, bit-matching the dense kernel) and L1
    (zero-aware exact median update). Other divergences fall back to
    the dense engine.
    """

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
        smoothing: float = 1e-10,
        indices_col: str = "indices",
        values_col: str = "values",
        prediction_col: str = "prediction",
    ):
        if sparse_mode not in ("auto", "force", "dense"):
            raise ValueError("sparse_mode: auto | force | dense")
        kern_key = divergence.lower().replace("-", "").replace("_", "")
        if sparse_mode == "force" and kern_key not in _SPARSE_CAPABLE:
            raise ValueError(
                f"divergence '{divergence}' has no sparse path; "
                "use squaredEuclidean, spherical, kl or l1"
            )
        self.k = k
        self.dim = dim
        self.divergence = divergence
        self.sparse_mode = sparse_mode
        self.sparse_threshold = sparse_threshold
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.smoothing = smoothing
        self.indices_col = indices_col
        self.values_col = values_col
        self.prediction_col = prediction_col

    def _kl_update(self, cells: DataFrame, counts: dict, eps: float) -> np.ndarray:
        """KL Bregman centroid from non-zero cells only.

        grad = ln(v+ε)+1; implicit zeros contribute the constant
        ln ε + 1, so per (cluster, dim):
        mean = (Σ_nnz grad + (n_c − nnz)·(ln ε + 1)) / n_c and the
        centroid is inv_grad = exp(mean − 1) — identical to the dense
        engine's update with zeros materialized.
        """
        g0 = float(np.log(eps)) + 1.0
        rows = cells.groupBy("_cluster", "dim").agg(
            F.sum(F.log(F.col("v") + eps) + 1.0).alias("sg"),
            F.count(F.lit(1)).alias("cnt"),
        ).collect()
        # untouched dims: mean grad = g0 → center = exp(g0 − 1) = ε
        new = np.full((self.k, self._dim), eps, dtype=np.float64)
        for r in rows:
            c = int(r["_cluster"])
            n_c = counts.get(c, 0)
            if n_c > 0:
                mean = (float(r["sg"]) + (n_c - int(r["cnt"])) * g0) / n_c
                new[c, int(r["dim"])] = float(np.exp(mean - 1.0))
        return new

    def _l1_update(self, cells: DataFrame, counts: dict, spark) -> np.ndarray:
        """Exact zero-aware per-(cluster, dim) lower median.

        Implicit zeros rank between negative and positive cells: the
        cumulative count of cells ≤ v is (rank among non-zeros) plus
        (#zeros when v ≥ 0). Median = smallest candidate whose
        cumulative count reaches n_c/2 — candidates are the non-zero
        cells plus 0 itself (qualifying when #negatives + #zeros
        reaches half). Dims with no non-zero cells stay 0.
        """
        from pyspark.sql.window import Window

        cdf = spark.createDataFrame(
            [(int(c), int(n)) for c, n in counts.items()], "_cluster int, nc long"
        )
        w_ord = (
            Window.partitionBy("_cluster", "dim").orderBy("v")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        w_all = Window.partitionBy("_cluster", "dim")
        scored = (
            cells.join(F.broadcast(cdf), "_cluster")
            .withColumn("cum", F.count(F.lit(1)).over(w_ord))
            .withColumn("cnt", F.count(F.lit(1)).over(w_all))
            .withColumn(
                "neg",
                F.sum(F.when(F.col("v") < 0, 1).otherwise(0)).over(w_all),
            )
            .withColumn("z", F.col("nc") - F.col("cnt"))
            .withColumn(
                "adj",
                F.col("cum")
                + F.when(F.col("v") >= 0, F.col("z")).otherwise(F.lit(0)),
            )
        )
        med = (
            scored.where(F.col("adj") >= F.col("nc") / 2.0)
            .groupBy("_cluster", "dim")
            .agg(
                F.min("v").alias("cand"),
                F.first((F.col("neg") + F.col("z")) >= F.col("nc") / 2.0)
                .alias("zq"),
            )
            .collect()
        )
        new = np.zeros((self.k, self._dim), dtype=np.float64)
        for r in med:
            c = int(r["_cluster"])
            if counts.get(c, 0) > 0:
                cand = float(r["cand"])
                new[c, int(r["dim"])] = min(cand, 0.0) if r["zq"] else cand
        return new

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
        sparse_capable = kern_key in _SPARSE_CAPABLE
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
                    "use squaredEuclidean, spherical, kl or l1"
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
        family = (
            "spherical" if spherical
            else "kl" if kern_key in ("kl", "kullbackleibler", "relativeentropy")
            else "l1" if kern_key in ("l1", "manhattan")
            else "se"
        )
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
            self._dim = dim
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
            eps = self.smoothing
            for it in range(self.max_iter):
                if family == "kl":
                    dists = sparse_kl_distances(
                        F.col(self.indices_col), F.col(self.values_col),
                        centers, eps,
                    )
                elif family == "l1":
                    dists = sparse_l1_distances(
                        F.col(self.indices_col), F.col(self.values_col), centers
                    )
                else:
                    dists = sparse_se_distances(
                        F.col(self.indices_col), F.col(self.values_col), centers
                    )
                assigned = work.withColumn("_ds", dists)
                assigned = assigned.withColumn(
                    "_cluster",
                    (F.expr("array_position(_ds, array_min(_ds))") - 1)
                    .cast("int"),
                ).withColumn("_dist", F.array_min("_ds")).drop("_ds")
                # one small agg for counts+cost, one exploded agg over the
                # non-zero (cluster, dim) cells for the center update
                crow = assigned.groupBy("_cluster").agg(
                    F.count(F.lit(1)).alias("n"), F.sum("_dist").alias("cost")
                ).collect()
                counts = {int(r["_cluster"]): int(r["n"]) for r in crow}
                cost = sum(float(r["cost"] or 0.0) for r in crow)
                cell_src = assigned.select(
                    "_cluster",
                    F.explode(
                        F.arrays_zip(
                            F.col(self.indices_col).alias("i"),
                            F.col(self.values_col).alias("v"),
                        )
                    ).alias("cell"),
                ).select(
                    "_cluster", F.col("cell.i").alias("dim"),
                    F.col("cell.v").alias("v"),
                )
                if family == "kl":
                    new_centers = self._kl_update(cell_src, counts, eps)
                elif family == "l1":
                    new_centers = self._l1_update(
                        cell_src, counts, assigned.sparkSession
                    )
                else:
                    cells = cell_src.groupBy("_cluster", "dim").agg(
                        F.sum("v").alias("s")
                    ).collect()
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

        kernel_name = {
            "se": "squaredEuclidean", "spherical": "spherical",
            "kl": "kl", "l1": "l1",
        }[family]
        summary = TrainingSummary(
            algorithm=self._algorithm, k=self.k, dim=dim,
            divergence=kernel_name,
            iterations=iterations, converged=converged,
            distortion_history=dist_hist, movement_history=move_hist,
            cluster_sizes=sizes, elapsed_sec=time() - t0,
        )
        model = SparseKMeansModel(
            centers=centers, kernel_name=kernel_name,
            smoothing=self.smoothing,
            indices_col=self.indices_col, values_col=self.values_col,
            prediction_col=self.prediction_col, summary=summary,
            params={"k": self.k, "sparseMode": "sparse", "density": density,
                    "dim": dim, "seed": self.seed},
        )
        return model


class SparseKMeansModel(GeneralizedKMeansModel):
    """Sparse transform: expression argmin over COO rows."""

    def __init__(self, centers, kernel_name, smoothing=1e-10,
                 indices_col="indices", values_col="values",
                 prediction_col="prediction", summary=None, params=None):
        super().__init__(
            centers, kernel_name, smoothing=smoothing,
            prediction_col=prediction_col, summary=summary, params=params,
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
        if self.kernel_name == "kl":
            dists = sparse_kl_distances(
                F.col(self.indices_col), vals, self.centers, self.smoothing
            )
        elif self.kernel_name == "l1":
            dists = sparse_l1_distances(
                F.col(self.indices_col), vals, self.centers
            )
        else:
            dists = sparse_se_distances(
                F.col(self.indices_col), vals, self.centers
            )
        out = df.withColumn("_ds", dists)
        return out.withColumn(
            self.prediction_col,
            (F.expr("array_position(_ds, array_min(_ds))") - 1).cast("int"),
        ).drop("_ds")
