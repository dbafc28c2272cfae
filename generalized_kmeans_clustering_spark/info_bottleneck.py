"""InformationBottleneck: compress X keeping information about Y.

Re-expression of ``InformationBottleneck.scala:202-420`` +
``df/MutualInformation.scala:34-300``: discretize X (hash-bin the
feature vector into ``num_bins``), take Y from ``relevance_col``,
build the joint histogram p(x, y) — ONE distributed
``groupBy(xbin, y).count()`` (the only data-scale pass) — then run
Blahut–Arimoto alternating updates of p(t|x), p(t), p(y|t) on the
(num_bins × |Y|) driver matrices; report I(X;T) and I(T;Y).

``transform`` maps rows to their bin's argmax cluster via a broadcast
join on the bin id — distributed scoring.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .kmeans import _ensure_array_features
from .summary import TrainingSummary

__all__ = ["InformationBottleneck", "InformationBottleneckModel"]


def _xbin_col(features_col: str, num_bins: int):
    """Deterministic hash-bin of the feature array."""
    return F.pmod(F.xxhash64(F.col(features_col).cast("array<double>")),
                  F.lit(num_bins)).cast("int")


def _mutual_information(P: np.ndarray) -> float:
    """I from a joint probability matrix (nats)."""
    P = P / max(P.sum(), 1e-300)
    px = P.sum(axis=1, keepdims=True)
    py = P.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        ratio = np.where(P > 0, P / (px @ py), 1.0)
        return float((P * np.log(ratio)).sum())


class InformationBottleneck:
    _algorithm = "InformationBottleneck"

    def __init__(
        self,
        k: int = 2,
        beta: float = 5.0,
        num_bins: int = 256,
        relevance_col: str = "label",
        max_iter: int = 100,
        tol: float = 1e-6,
        seed: int = 0,
        features_col: str = "features",
        prediction_col: str = "prediction",
        bin_col: str | None = None,
        initial_pt_x=None,
    ):
        """``bin_col`` supplies a pre-discretized integer bin in
        [0, num_bins) instead of the xxhash64 feature binning — for
        user-defined discretizations and cross-engine checks.
        ``initial_pt_x`` (num_bins × k row-stochastic array) overrides
        the seeded Dirichlet init for reproducible runs."""
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.beta = float(beta)
        self.num_bins = num_bins
        self.relevance_col = relevance_col
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.bin_col = bin_col
        self.initial_pt_x = initial_pt_x

    def fit(self, df: DataFrame) -> "InformationBottleneckModel":
        from time import time

        t0 = time()
        if self.bin_col is not None:
            xb = F.col(self.bin_col).cast("int")
        else:
            df = _ensure_array_features(df, self.features_col)
            xb = _xbin_col(self.features_col, self.num_bins)
        hist = (
            df.select(
                xb.alias("_xb"),
                F.col(self.relevance_col).alias("_y"),
            )
            .groupBy("_xb", "_y").agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        y_vals = sorted({r["_y"] for r in hist})
        y_idx = {y: i for i, y in enumerate(y_vals)}
        nx, ny = self.num_bins, len(y_vals)
        Pxy = np.zeros((nx, ny))
        for r in hist:
            b = int(r["_xb"])
            if not 0 <= b < nx:
                raise ValueError(
                    f"bin_col '{self.bin_col}' value {b} outside "
                    f"[0, num_bins={nx}); pre-bucket the column or raise "
                    "num_bins"
                )
            Pxy[b, y_idx[r["_y"]]] = r["n"]
        total = Pxy.sum()
        Pxy /= max(total, 1e-300)
        px = Pxy.sum(axis=1)
        occupied = px > 0
        with np.errstate(divide="ignore", invalid="ignore"):
            Py_x = np.where(px[:, None] > 0, Pxy / px[:, None], 1.0 / ny)

        if self.initial_pt_x is not None:
            Pt_x = np.asarray(self.initial_pt_x, dtype=np.float64)
            if Pt_x.shape != (nx, self.k):
                raise ValueError(
                    f"initial_pt_x must be ({nx}, {self.k}), "
                    f"got {Pt_x.shape}"
                )
            Pt_x = Pt_x / Pt_x.sum(axis=1, keepdims=True)
        else:
            rng = np.random.RandomState(self.seed)
            Pt_x = rng.dirichlet(np.ones(self.k), size=nx)  # p(t|x)
        prev_obj = None
        iterations = 0
        converged = False
        for it in range(self.max_iter):
            pt = px @ Pt_x                               # p(t)
            pt = np.maximum(pt, 1e-300)
            Pyt = (Pt_x * px[:, None]).T @ Py_x          # p(t) p(y|t)
            Py_t = Pyt / pt[:, None]
            Py_t = np.maximum(Py_t, 1e-300)
            # KL(p(y|x) || p(y|t)) for every (x, t)
            with np.errstate(divide="ignore", invalid="ignore"):
                lg = np.where(Py_x[:, None, :] > 0,
                              np.log(np.maximum(Py_x[:, None, :], 1e-300))
                              - np.log(Py_t[None, :, :]), 0.0)
                KL = (Py_x[:, None, :] * lg).sum(axis=2)
            logits = np.log(pt)[None, :] - self.beta * KL
            logits -= logits.max(axis=1, keepdims=True)
            Pt_x = np.exp(logits)
            Pt_x /= Pt_x.sum(axis=1, keepdims=True)
            # objective: I(X;T) − β·I(T;Y)
            Pxt = Pt_x * px[:, None]
            i_xt = _mutual_information(Pxt)
            i_ty = _mutual_information((Pt_x * px[:, None]).T @ Py_x)
            obj = i_xt - self.beta * i_ty
            iterations = it + 1
            if prev_obj is not None and abs(prev_obj - obj) <= self.tol * max(
                abs(prev_obj), 1e-12
            ):
                converged = True
                break
            prev_obj = obj

        bin_cluster = Pt_x.argmax(axis=1)
        bin_cluster[~occupied] = 0
        summary = TrainingSummary(
            algorithm=self._algorithm, k=self.k, dim=nx,
            divergence=f"ib:beta={self.beta}", iterations=iterations,
            converged=converged, distortion_history=[], movement_history=[],
            cluster_sizes=np.bincount(
                bin_cluster[occupied], minlength=self.k
            ).tolist(),
            elapsed_sec=time() - t0,
        )
        return InformationBottleneckModel(
            bin_cluster=bin_cluster, num_bins=self.num_bins,
            i_xt=i_xt, i_ty=i_ty, beta=self.beta,
            features_col=self.features_col,
            prediction_col=self.prediction_col, summary=summary,
            params={"k": self.k, "beta": self.beta,
                    "numBins": self.num_bins,
                    "relevanceCol": self.relevance_col, "seed": self.seed},
        )


class InformationBottleneckModel:
    def __init__(self, bin_cluster, num_bins, i_xt, i_ty, beta,
                 features_col="features", prediction_col="prediction",
                 summary=None, params=None):
        self.bin_cluster = np.asarray(bin_cluster, dtype=int)
        self.num_bins = num_bins
        self.i_xt = float(i_xt)
        self.i_ty = float(i_ty)
        self.beta = beta
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.summary = summary
        self.params = params or {}

    @property
    def k(self) -> int:
        return int(self.bin_cluster.max()) + 1

    def transform(self, df: DataFrame) -> DataFrame:
        """Distributed: hash-bin then broadcast-map bin → cluster."""
        df = _ensure_array_features(df, self.features_col)
        spark = df.sparkSession
        mapping = spark.createDataFrame(
            [(int(b), int(c)) for b, c in enumerate(self.bin_cluster)],
            "_xb int, _ib_cluster int",
        )
        out = df.withColumn("_xb", _xbin_col(self.features_col, self.num_bins))
        out = out.join(F.broadcast(mapping), "_xb", "left")
        return out.withColumn(
            self.prediction_col, F.coalesce(F.col("_ib_cluster"), F.lit(0))
        ).drop("_xb", "_ib_cluster")
