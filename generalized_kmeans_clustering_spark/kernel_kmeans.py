"""KernelKMeans: Lloyd's in Mercer-kernel feature space.

Re-expression of ``KernelKMeans.scala:177-290``: cluster in the
implicit feature space φ where
‖φ(x) − μ_c‖² = k(x,x) − 2/|C| Σ_{j∈C} k(x,j) + 1/|C|² Σ_{i,j∈C} k(i,j).
The Gram matrix is O(n²) on COLLECTED data — the reference warns above
10k rows (``KernelKMeans.scala:191``) and so do we.

The fitted model keeps the (small) training matrix + final assignment
so ``transform`` can place new points via the same kernel trick
(k(y,x_j) row against the stored training set).
"""

from __future__ import annotations

import logging

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .functions.mercer import get_mercer_kernel
from .kmeans import _ensure_array_features
from .summary import TrainingSummary

__all__ = ["KernelKMeans", "KernelKMeansModel"]

log = logging.getLogger(__name__)

_WARN_ROWS = 10_000


class KernelKMeans:
    _algorithm = "KernelKMeans"

    def __init__(
        self,
        k: int = 2,
        kernel_type: str = "rbf",
        gamma: float | None = None,
        degree: int = 3,
        coef0: float = 1.0,
        max_iter: int = 20,
        tol: float = 1e-4,
        seed: int = 0,
        features_col: str = "features",
        prediction_col: str = "prediction",
        initial_label_col: str | None = None,
    ):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = k
        self.kernel_type = kernel_type
        self.gamma = gamma
        self.degree = degree
        self.coef0 = coef0
        self.max_iter = max_iter
        self.tol = tol
        self.seed = seed
        self.features_col = features_col
        self.prediction_col = prediction_col
        # warm start: take initial cluster labels (ints in [0, k)) from
        # this column instead of the seeded random partition — makes runs
        # reproducible across engines and lets callers chain refinements
        self.initial_label_col = initial_label_col

    def _mercer(self):
        return get_mercer_kernel(
            self.kernel_type, gamma=self.gamma, degree=self.degree,
            coef0=self.coef0,
        )

    def fit(self, df: DataFrame) -> "KernelKMeansModel":
        from time import time

        t0 = time()
        df = _ensure_array_features(df, self.features_col)
        sel = [self.features_col] + (
            [self.initial_label_col] if self.initial_label_col else []
        )
        rows = df.select(*sel).collect()
        n = len(rows)
        if n > _WARN_ROWS:
            log.warning(
                "KernelKMeans collects %d rows and builds an O(n²) Gram "
                "matrix; consider SpectralClustering with Nyström", n,
            )
        X = np.asarray([r[self.features_col] for r in rows], dtype=np.float64)
        mercer = self._mercer()
        K = mercer.gram(X)
        diag = np.diag(K).copy()
        if self.initial_label_col:
            labels = np.asarray(
                [int(r[self.initial_label_col]) % self.k for r in rows],
                dtype=np.int64,
            )
        else:
            rng = np.random.RandomState(self.seed)
            labels = rng.randint(0, self.k, size=n)
        hist: list[float] = []
        converged = False
        iterations = 0
        for it in range(self.max_iter):
            # per-cluster terms of the kernel distance
            D = np.tile(diag[:, None], (1, self.k))
            for c in range(self.k):
                mask = labels == c
                m = int(mask.sum())
                if m == 0:
                    D[:, c] = np.inf
                    continue
                Kc = K[:, mask]
                D[:, c] += -2.0 * Kc.sum(axis=1) / m + K[np.ix_(mask, mask)].sum() / (m * m)
            new_labels = D.argmin(axis=1)
            cost = float(D[np.arange(n), new_labels].sum())
            hist.append(cost)
            changed = int((new_labels != labels).sum())
            labels = new_labels
            iterations = it + 1
            if changed == 0 or (
                len(hist) >= 2 and abs(hist[-2] - hist[-1]) <= self.tol * max(abs(hist[-2]), 1e-12)
            ):
                converged = True
                break
        sizes = np.bincount(labels, minlength=self.k).tolist()
        summary = TrainingSummary(
            algorithm=self._algorithm, k=self.k, dim=X.shape[1],
            divergence=f"kernel:{self.kernel_type}", iterations=iterations,
            converged=converged, distortion_history=hist,
            movement_history=[], cluster_sizes=sizes,
            elapsed_sec=time() - t0,
        )
        return KernelKMeansModel(
            X_train=X, labels=labels, mercer=mercer, k=self.k,
            features_col=self.features_col, prediction_col=self.prediction_col,
            summary=summary,
            params={"k": self.k, "kernelType": self.kernel_type,
                    "gamma": self.gamma, "degree": self.degree,
                    "coef0": self.coef0, "seed": self.seed},
        )


class KernelKMeansModel:
    """Assignment of new points by the kernel trick against the stored
    training set (bounded n by construction)."""

    def __init__(self, X_train, labels, mercer, k, features_col="features",
                 prediction_col="prediction", summary=None, params=None):
        self.X_train = np.asarray(X_train, dtype=np.float64)
        self.labels = np.asarray(labels, dtype=int)
        self.mercer = mercer
        self.k = k
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.summary = summary
        self.params = params or {}
        # precompute per-cluster constants: 1/|C|² ΣΣ k(i,j)
        self._cluster_masks = [self.labels == c for c in range(k)]
        K_tr = mercer.gram(self.X_train)
        self._const = np.zeros(k)
        for c, mask in enumerate(self._cluster_masks):
            m = int(mask.sum())
            self._const[c] = (
                K_tr[np.ix_(mask, mask)].sum() / (m * m) if m else np.inf
            )

    def predict_np(self, Y: np.ndarray) -> np.ndarray:
        Kyx = self.mercer.gram(np.atleast_2d(Y), self.X_train)
        D = np.zeros((len(Kyx), self.k))
        for c, mask in enumerate(self._cluster_masks):
            m = int(mask.sum())
            if m == 0:
                D[:, c] = np.inf
                continue
            D[:, c] = -2.0 * Kyx[:, mask].sum(axis=1) / m + self._const[c]
        return D.argmin(axis=1)

    def transform(self, df: DataFrame) -> DataFrame:
        """Arrow-vectorized kernel-trick assignment (the train matrix
        rides in the closure — one copy per executor)."""
        from pyspark.sql.functions import pandas_udf

        df = _ensure_array_features(df, self.features_col)
        model = self

        @pandas_udf("int")
        def _pred(feats: pd.Series) -> pd.Series:
            if len(feats) == 0:
                return pd.Series([], dtype="int32")
            Y = np.asarray(feats.tolist(), dtype=np.float64)
            return pd.Series(model.predict_np(Y).astype(np.int32))

        return df.withColumn(self.prediction_col, _pred(F.col(self.features_col)))
