"""AgglomerativeBregman: bottom-up hierarchical clustering.

Re-expression of ``AgglomerativeBregman.scala:173-280``: pairwise
Bregman divergence matrix (symmetrized for asymmetric divergences),
iterative merge of the closest pair with Lance–Williams linkage
updates (single / complete / average / ward), dendrogram recorded as
``MergeStep`` tuples, cut at ``num_clusters`` or
``distance_threshold``.

O(n²) memory / O(n³) worst-case driver algorithm on COLLECTED data —
the reference warns above 10k rows (``AgglomerativeBregman.scala:190``)
and so do we. The fitted model exposes per-cluster Bregman centroids,
so ``transform`` scales normally (map-only expression argmin).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass

import numpy as np
from pyspark.sql import DataFrame

from .functions.kernels import get_kernel
from .kmeans import GeneralizedKMeansModel, _ensure_array_features
from .summary import TrainingSummary

__all__ = ["AgglomerativeBregman", "MergeStep"]

log = logging.getLogger(__name__)

_WARN_ROWS = 10_000


@dataclass
class MergeStep:
    step: int
    cluster_a: int
    cluster_b: int
    distance: float
    size: int


class AgglomerativeBregman:
    _algorithm = "AgglomerativeBregman"

    def __init__(
        self,
        num_clusters: int = 2,
        distance_threshold: float | None = None,
        linkage: str = "average",  # single | complete | average | ward
        divergence: str = "squaredEuclidean",
        smoothing: float = 1e-10,
        features_col: str = "features",
        prediction_col: str = "prediction",
        distance_col: str | None = None,
    ):
        if linkage not in ("single", "complete", "average", "ward"):
            raise ValueError("linkage: single | complete | average | ward")
        if linkage == "ward" and divergence not in (
            "squaredEuclidean", "se", "euclidean", "l2"
        ):
            raise ValueError("ward linkage requires squaredEuclidean")
        self.num_clusters = num_clusters
        self.distance_threshold = distance_threshold
        self.linkage = linkage
        self.divergence = divergence
        self.smoothing = smoothing
        self.features_col = features_col
        self.prediction_col = prediction_col
        self.distance_col = distance_col

    def fit(self, df: DataFrame) -> GeneralizedKMeansModel:
        from time import time

        t0 = time()
        kernel = get_kernel(self.divergence, smoothing=self.smoothing)
        df = _ensure_array_features(df, self.features_col)
        rows = df.select(self.features_col).collect()
        n = len(rows)
        if n > _WARN_ROWS:
            log.warning(
                "AgglomerativeBregman collects %d rows (O(n²) driver memory)",
                n,
            )
        X = np.asarray([r[self.features_col] for r in rows], dtype=np.float64)
        if kernel.pre_normalize:
            X = kernel.normalize_np(X)
        D = kernel.div_np(X, X)
        D = 0.5 * (D + D.T)  # symmetrize asymmetric divergences
        np.fill_diagonal(D, np.inf)

        active = list(range(n))
        sizes = np.ones(n)
        labels = np.arange(n)
        merges: list[MergeStep] = []
        target = max(1, self.num_clusters)
        step = 0

        while len(active) > target:
            sub = np.ix_(active, active)
            Ds = D[sub]
            flat = int(np.argmin(Ds))
            ai, bj = divmod(flat, len(active))
            dist = float(Ds[ai, bj])
            if (
                self.distance_threshold is not None
                and dist > self.distance_threshold
            ):
                break
            a, b = active[ai], active[bj]
            if a > b:
                a, b = b, a
            na, nb = sizes[a], sizes[b]
            # Lance–Williams update of d(a∪b, k) for every other active k
            for kk in active:
                if kk in (a, b):
                    continue
                dak, dbk = D[a, kk], D[b, kk]
                if self.linkage == "single":
                    nd = min(dak, dbk)
                elif self.linkage == "complete":
                    nd = max(dak, dbk)
                elif self.linkage == "average":
                    nd = (na * dak + nb * dbk) / (na + nb)
                else:  # ward
                    nk = sizes[kk]
                    nd = (
                        (na + nk) * dak + (nb + nk) * dbk - nk * D[a, b]
                    ) / (na + nb + nk)
                D[a, kk] = D[kk, a] = nd
            sizes[a] = na + nb
            labels[labels == b] = a
            active.remove(b)
            step += 1
            merges.append(MergeStep(step, int(a), int(b), dist, int(sizes[a])))

        # relabel to 0..k-1 (stable by first occurrence)
        uniq = {}
        final = np.empty(n, dtype=int)
        for i, lbl in enumerate(labels):
            if lbl not in uniq:
                uniq[lbl] = len(uniq)
            final[i] = uniq[lbl]
        k = len(uniq)
        centers = np.vstack([
            kernel.finalize_center(
                kernel.grad_np(X[final == c]).mean(axis=0)
            )
            for c in range(k)
        ])
        cluster_sizes = np.bincount(final, minlength=k).tolist()

        summary = TrainingSummary(
            algorithm=self._algorithm, k=k, dim=X.shape[1],
            divergence=kernel.name, iterations=step, converged=True,
            distortion_history=[m.distance for m in merges],
            movement_history=[], cluster_sizes=cluster_sizes,
            elapsed_sec=time() - t0,
        )
        model = GeneralizedKMeansModel(
            centers=centers, kernel_name=kernel.name, smoothing=self.smoothing,
            features_col=self.features_col, prediction_col=self.prediction_col,
            distance_col=self.distance_col, summary=summary,
            params={"numClusters": self.num_clusters,
                    "distanceThreshold": self.distance_threshold,
                    "linkage": self.linkage, "divergence": self.divergence},
        )
        model.merge_steps = merges
        model.training_labels = final
        return model
