"""TimeSeriesKMeans: elastic-distance clustering of 1-D sequences.

Re-expression of ``TimeSeriesKMeans.scala:209-345``: series collected
to the driver (documented ceiling, like the reference), distances via
DTW / SoftDTW / GAK / DerivativeDTW, centers via DBA barycenter
averaging (mean for SoftDTW). ``transform`` is an Arrow-vectorized
pandas_udf argmin against the k center sequences — distributed, so
scoring a 100 TB series table is map-only even though training is
bounded.
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.sequence import dba_barycenter, get_sequence_distance
from .kmeans import _ensure_array_features
from .summary import TrainingSummary

__all__ = ["TimeSeriesKMeans", "TimeSeriesKMeansModel"]

log = logging.getLogger(__name__)

_WARN_ROWS = 5_000


class TimeSeriesKMeans:
    _algorithm = "TimeSeriesKMeans"

    def __init__(
        self,
        k: int = 2,
        kernel_type: str = "dtw",  # dtw | softdtw | gak | ddtw
        window: int | None = None,
        gamma: float = 1.0,
        sigma: float = 1.0,
        dba_iter: int = 5,
        max_iter: int = 10,
        seed: int = 0,
        features_col: str = "features",
        prediction_col: str = "prediction",
    ):
        self.k = k
        self.kernel_type = kernel_type
        self.window = window
        self.gamma = gamma
        self.sigma = sigma
        self.dba_iter = dba_iter
        self.max_iter = max_iter
        self.seed = seed
        self.features_col = features_col
        self.prediction_col = prediction_col

    def _dist_fn(self):
        return get_sequence_distance(
            self.kernel_type, window=self.window, gamma=self.gamma,
            sigma=self.sigma,
        )

    def fit(self, df: DataFrame) -> "TimeSeriesKMeansModel":
        from time import time

        t0 = time()
        df = _ensure_array_features(df, self.features_col)
        rows = df.select(self.features_col).collect()
        n = len(rows)
        if n > _WARN_ROWS:
            log.warning(
                "TimeSeriesKMeans collects %d series (O(n·k·L²) driver "
                "work per iteration)", n,
            )
        S = [np.asarray(r[self.features_col], dtype=np.float64) for r in rows]
        dist = self._dist_fn()
        rng = np.random.RandomState(self.seed)
        centers = [S[i].copy() for i in rng.choice(n, self.k, replace=False)]
        labels = np.zeros(n, dtype=int)
        hist: list[float] = []
        converged = False
        iterations = 0
        for it in range(self.max_iter):
            D = np.array([[dist(s, c) for c in centers] for s in S])
            new_labels = D.argmin(axis=1)
            cost = float(D[np.arange(n), new_labels].sum())
            hist.append(cost)
            changed = int((new_labels != labels).sum()) if it else n
            labels = new_labels
            iterations = it + 1
            for c in range(self.k):
                members = [S[i] for i in np.where(labels == c)[0]]
                if not members:
                    continue
                if self.kernel_type in ("dtw", "ddtw", "gak"):
                    centers[c] = dba_barycenter(
                        members, init=centers[c], iters=self.dba_iter,
                        window=self.window,
                    )
                else:  # softdtw: arithmetic mean of equal-length series
                    L = min(len(m) for m in members)
                    centers[c] = np.mean([m[:L] for m in members], axis=0)
            if it > 0 and changed == 0:
                converged = True
                break
        sizes = np.bincount(labels, minlength=self.k).tolist()
        summary = TrainingSummary(
            algorithm=self._algorithm, k=self.k,
            dim=max(len(c) for c in centers),
            divergence=f"sequence:{self.kernel_type}",
            iterations=iterations, converged=converged,
            distortion_history=hist, movement_history=[],
            cluster_sizes=sizes, elapsed_sec=time() - t0,
        )
        model = TimeSeriesKMeansModel(
            centers=centers, kernel_type=self.kernel_type,
            window=self.window, gamma=self.gamma, sigma=self.sigma,
            features_col=self.features_col,
            prediction_col=self.prediction_col, summary=summary,
            params={"k": self.k, "kernelType": self.kernel_type,
                    "window": self.window, "gamma": self.gamma,
                    "sigma": self.sigma, "dbaIter": self.dba_iter,
                    "seed": self.seed},
        )
        model.training_labels = labels
        return model


class TimeSeriesKMeansModel:
    def __init__(self, centers, kernel_type, window=None, gamma=1.0, sigma=1.0,
                 features_col="features", prediction_col="prediction",
                 summary=None, params=None):
        self.centers = [np.asarray(c, dtype=np.float64) for c in centers]
        self.kernel_type = kernel_type
        self.window = window
        self.gamma = gamma
        self.sigma = sigma
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.summary = summary
        self.params = params or {}

    @property
    def k(self) -> int:
        return len(self.centers)

    def predict(self, series) -> int:
        dist = get_sequence_distance(
            self.kernel_type, window=self.window, gamma=self.gamma,
            sigma=self.sigma,
        )
        s = np.asarray(series, dtype=np.float64)
        return int(np.argmin([dist(s, c) for c in self.centers]))

    def transform(self, df: DataFrame) -> DataFrame:
        """Distributed scoring: DTW against the k centers in an
        Arrow-vectorized pandas_udf (centers ride in the closure)."""
        from pyspark.sql.functions import pandas_udf

        df = _ensure_array_features(df, self.features_col)
        centers = self.centers
        kind, window, gamma, sigma = (
            self.kernel_type, self.window, self.gamma, self.sigma,
        )

        @pandas_udf("int")
        def _pred(feats: pd.Series) -> pd.Series:
            from generalized_kmeans_clustering_spark.functions.sequence import (
                get_sequence_distance as _gsd,
            )

            fn = _gsd(kind, window=window, gamma=gamma, sigma=sigma)
            out = []
            for s in feats:
                a = np.asarray(s, dtype=np.float64)
                out.append(int(np.argmin([fn(a, c) for c in centers])))
            return pd.Series(out, dtype="int32")

        return df.withColumn(self.prediction_col, _pred(F.col(self.features_col)))
